package graft

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventTime

object WindowProbe {
  val rows = new ConcurrentLinkedQueue[(Timestamp, String, Long)]()
  def drain(): Seq[(Timestamp, String, Long)] =
    Iterator.continually(rows.poll()).takeWhile(_ != null).toSeq
  def clear(): Unit = rows.clear()
}

/** Event-time windows + watermark: finalized windows emit in append mode;
  * data later than the watermark is dropped.
  */
class EventTimeSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming dedup drops duplicate ids within the watermark horizon") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val out = new ConcurrentLinkedQueue[java.lang.Long]()
    val deduped = EventTime.dedupStream(
      stream.toDF().toDF("ts", "id"),
      eventTimeCol = "ts",
      watermarkDelay = "10 minutes",
      idCols = Seq("id")
    )
    val q = deduped.writeStream
      .outputMode("append")
      .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
        d.collect().foreach(r => out.add(r.getLong(1)))
        ()
      }
      .start()
    try {
      stream.addData(Seq((ts(0), 1L), (ts(0), 2L), (ts(0), 1L)))
      q.processAllAvailable()
      stream.addData(Seq((ts(1), 2L), (ts(1), 3L))) // 2 is a dup across batches
      q.processAllAvailable()
      val got = Iterator.continually(out.poll()).takeWhile(_ != null).map(_.longValue).toSeq
      // 1,2 from batch one; 3 from batch two; the cross-batch dup of 2 dropped
      assert(got.sorted == Seq(1L, 2L, 3L), s"got $got")
    } finally q.stop()
  }

  test("tumbling windows finalize when the watermark passes and drop late data") {
    WindowProbe.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val windowed = EventTime.tumblingAgg(
      stream.toDF().toDF("ts", "kind"),
      eventTimeCol = "ts",
      windowDuration = "5 minutes",
      watermarkDelay = "1 minute",
      keys = Seq(col("kind")),
      aggs = Seq(count(lit(1)).as("cnt"))
    )
    val q = windowed.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
        d.select(col("window.start"), col("kind"), col("cnt")).collect().foreach { r =>
          WindowProbe.rows.add((r.getTimestamp(0), r.getString(1), r.getLong(2)))
        }
        ()
      }
      .start()
    try {
      stream.addData(Seq((ts(0), "a"), (ts(1), "a"), (ts(2), "b")))
      q.processAllAvailable()
      assert(WindowProbe.drain().isEmpty) // window [10:00,10:05) not finalized yet

      // advance the watermark past 10:05 (+1 min delay) → window finalizes
      stream.addData(Seq((ts(7), "a")))
      q.processAllAvailable()
      stream.addData(Seq((ts(8), "a"))) // one more batch so append emits
      q.processAllAvailable()
      val emitted = WindowProbe.drain()
      val first = emitted.filter(_._1 == ts(0))
      assert(first.map(t => t._2 -> t._3).toMap == Map("a" -> 2L, "b" -> 1L), s"got $emitted")

      // a very late row for the finalized window is dropped
      stream.addData(Seq((ts(1), "a")))
      q.processAllAvailable()
      assert(WindowProbe.drain().forall(_._1 != ts(0)))
    } finally q.stop()
  }

  test("sliding windows count each event in every overlapping window") {
    WindowProbe.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val windowed = EventTime.slidingAgg(
      stream.toDF().toDF("ts", "kind"),
      eventTimeCol = "ts",
      windowDuration = "10 minutes",
      slideDuration = "5 minutes",
      watermarkDelay = "1 minute",
      keys = Seq(col("kind")),
      aggs = Seq(count(lit(1)).as("cnt"))
    )
    val q = windowed.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
        d.select(col("window.start"), col("kind"), col("cnt")).collect().foreach { r =>
          WindowProbe.rows.add((r.getTimestamp(0), r.getString(1), r.getLong(2)))
        }
        ()
      }
      .start()
    try {
      // 10:02 belongs to [09:55,10:05) and [10:00,10:10)
      stream.addData(Seq((ts(2), "a")))
      q.processAllAvailable()
      // advance the watermark past 10:10 + delay so both windows finalize
      stream.addData(Seq((ts(12), "a")))
      q.processAllAvailable()
      stream.addData(Seq((ts(13), "a")))
      q.processAllAvailable()
      val emitted = WindowProbe.drain().filter(t => t._1 == Timestamp.valueOf("2024-01-01 09:55:00") || t._1 == ts(0))
      assert(
        emitted.map(t => t._1 -> t._3).toMap ==
          Map(Timestamp.valueOf("2024-01-01 09:55:00") -> 1L, ts(0) -> 1L),
        s"got $emitted"
      )
    } finally q.stop()
  }

  test("streaming windowed approx-distinct sketch equals the batch sketch") {
    // HLL++ register-merge is a max — order-independent — so the streaming
    // estimate over incremental micro-batches is IDENTICAL to the batch
    // estimate over the same rows: the mergeable-sketch property (q99/q100)
    // carried into Structured Streaming. State per (window, key) is one
    // fixed-size sketch, never a distinct-values set — the unbounded-
    // cardinality streaming distinct-count architecture.
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val agg = stream
      .toDF()
      .toDF("ts", "kind", "uid")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "5 minutes"), col("kind"))
      .agg(approx_count_distinct(col("uid"), 0.02).as("approx_users"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hll_stream")
      .start()
    try {
      val batch1 = Seq((ts(0), "a", 1L), (ts(1), "a", 2L), (ts(2), "b", 1L), (ts(3), "a", 1L))
      val batch2 = Seq((ts(4), "a", 3L), (ts(4), "b", 9L), (ts(6), "a", 1L))
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
      val streamed = spark
        .table("hll_stream")
        .select(col("window.start"), col("kind"), col("approx_users"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      val batch = (batch1 ++ batch2)
        .toDF("ts", "kind", "uid")
        .groupBy(window(col("ts"), "5 minutes"), col("kind"))
        .agg(approx_count_distinct(col("uid"), 0.02).as("approx_users"))
        .select(col("window.start"), col("kind"), col("approx_users"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      // sanity: the [10:00,10:05) 'a' window saw uids {1,2,3}
      assert(streamed.exists { case (w, k, n) => w == ts(0) && k == "a" && n == 3L })
    } finally q.stop()
  }

  test("streaming count-min sketch merged per micro-batch equals the batch sketch") {
    // CMS counters ADD under merge (mergeInPlace sums the counter matrix),
    // so per-micro-batch sketches merged incrementally are BIT-IDENTICAL
    // to one batch sketch over the union — q109's heavy-hitter
    // architecture carried into streaming: the driver holds one ~100 KB
    // sketch however long the stream runs, and every estimate it serves
    // mid-stream is exactly what a batch rebuild would say. Same seed on
    // both sides (hash functions must agree for counter-level equality).
    import org.apache.spark.util.sketch.CountMinSketch
    import java.io.ByteArrayInputStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[String]
    val sketchOf = "count_min_sketch(tok, 0.001d, 0.99d, 42)"
    @volatile var merged: CountMinSketch = null
    val q = stream
      .toDF()
      .toDF("tok")
      .writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val bytes = df.agg(expr(sketchOf)).head().getAs[Array[Byte]](0)
        val sk = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
        if (merged == null) merged = sk else merged.mergeInPlace(sk)
        (): Unit
      }
      .start()
    try {
      val batch1 = Seq("spark", "data", "spark", "join", "data", "spark")
      val batch2 = Seq("data", "window", "spark", "window", "join")
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
      val batchBytes = (batch1 ++ batch2)
        .toDF("tok")
        .agg(expr(sketchOf))
        .head()
        .getAs[Array[Byte]](0)
      val batchSk = CountMinSketch.readFrom(new ByteArrayInputStream(batchBytes))
      assert(merged.totalCount() == batchSk.totalCount())
      Seq("spark", "data", "join", "window", "absent").foreach { w =>
        assert(
          merged.estimateCount(w) == batchSk.estimateCount(w),
          s"streaming and batch CMS disagree on '$w'"
        )
      }
      // and the estimates are exact here (11 items, far under sketch width)
      assert(merged.estimateCount("spark") == 4L && merged.estimateCount("absent") == 0L)
    } finally q.stop()
  }

  test("session windows close after the gap and group by key") {
    WindowProbe.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val sessions = EventTime.sessionAgg(
      stream.toDF().toDF("ts", "kind"),
      eventTimeCol = "ts",
      gapDuration = "5 minutes",
      watermarkDelay = "1 minute",
      keys = Seq(col("kind")),
      aggs = Seq(count(lit(1)).as("cnt"))
    )
    val q = sessions.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
        d.select(col("session_window.start"), col("kind"), col("cnt")).collect().foreach { r =>
          WindowProbe.rows.add((r.getTimestamp(0), r.getString(1), r.getLong(2)))
        }
        ()
      }
      .start()
    try {
      // two events 2 min apart (one session), then a 18-min gap (new session)
      stream.addData(Seq((ts(0), "a"), (ts(2), "a")))
      q.processAllAvailable()
      stream.addData(Seq((ts(20), "a"))) // watermark jumps past session end
      q.processAllAvailable()
      stream.addData(Seq((ts(21), "a")))
      q.processAllAvailable()
      val emitted = WindowProbe.drain()
      assert(emitted.contains((ts(0), "a", 2L)), s"first session missing: $emitted")
      assert(!emitted.exists(_._1 == ts(20)), s"open session emitted early: $emitted")
    } finally q.stop()
  }
}
