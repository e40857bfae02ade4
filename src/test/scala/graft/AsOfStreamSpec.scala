package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{AsOfEvent, AsOfStream}

/** Streaming as-of join: per-user latest-view state joins clicks across
  * micro-batches; within-batch ordering matches the batch operator's
  * (ts, views-first, event_id) tie-breaks.
  */
class AsOfStreamSpec extends SparkSpec {

  import spark.implicits._

  test("clicks join the latest preceding view, with state across batches") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[AsOfEvent]
    val q = AsOfStream.asOfJoin(stream.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("asof_stream")
      .start()
    try {
      // batch 1: user 1 view then click (same batch, ts order); a click
      // with NO preceding view for user 2 must not emit
      stream.addData(
        AsOfEvent(1, 1000L, 1L, "view", 1.5),
        AsOfEvent(2, 3000L, 1L, "click", 0.0),
        AsOfEvent(3, 2000L, 2L, "click", 0.0)
      )
      q.processAllAvailable()
      // batch 2: click for user 1 joins the batch-1 view (state carried);
      // a newer view replaces state
      stream.addData(
        AsOfEvent(4, 9000L, 1L, "click", 0.0),
        AsOfEvent(5, 10000L, 1L, "view", 2.5)
      )
      q.processAllAvailable()
      // batch 3: equal-timestamp view counts as preceding (views sort
      // first at the same ts, like the batch operator)
      stream.addData(
        AsOfEvent(6, 10000L, 1L, "click", 0.0),
        AsOfEvent(7, 500L, 2L, "view", 9.0),
        AsOfEvent(8, 800L, 2L, "click", 0.0)
      )
      q.processAllAvailable()
      val rows = spark.table("asof_stream")
        .as[graft.streaming.AsOfMatch]
        .collect()
        .sortBy(_.eventId)
        .toSeq
      assert(rows.map(r => (r.eventId, r.viewId, r.gapUs, r.viewValue)) == Seq(
        (2L, 1L, 2000L, 1.5),  // same-batch join
        (4L, 1L, 8000L, 1.5),  // state across batches
        (6L, 5L, 0L, 2.5),     // equal-ts view precedes click; newer view won state
        (8L, 7L, 300L, 9.0)    // user isolation: user 2 joins its own view
      ), s"got $rows")
    } finally q.stop()
  }

  test("left-outer enrich emits unmatched clicks with the NoView sentinel") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[AsOfEvent]
    val q = AsOfStream.asOfJoin(stream.toDS(), emitUnmatched = true)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("asof_outer_stream")
      .start()
    try {
      // user 2's click has no preceding view → sentinel row, SAME batch
      // (no watermark wait: the decision is made at click time)
      stream.addData(
        AsOfEvent(1, 1000L, 1L, "view", 1.5),
        AsOfEvent(2, 3000L, 1L, "click", 0.0),
        AsOfEvent(3, 2000L, 2L, "click", 0.0)
      )
      q.processAllAvailable()
      // a later view for user 2 must NOT retro-emit anything for click 3,
      // and the next click joins normally
      stream.addData(
        AsOfEvent(4, 5000L, 2L, "view", 7.0),
        AsOfEvent(5, 6000L, 2L, "click", 0.0)
      )
      q.processAllAvailable()
      val rows = spark.table("asof_outer_stream")
        .as[graft.streaming.AsOfMatch]
        .collect()
        .sortBy(_.eventId)
        .toSeq
      assert(rows.map(r => (r.eventId, r.viewId, r.gapUs, r.viewValue)) == Seq(
        (2L, 1L, 2000L, 1.5),
        (3L, AsOfStream.NoView, AsOfStream.NoView, 0.0), // unmatched, exactly once
        (5L, 4L, 1000L, 7.0)
      ), s"got $rows")
    } finally q.stop()
  }
}
