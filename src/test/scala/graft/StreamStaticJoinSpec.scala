package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.plans.{AsOf, Interval}

/** Stream-static enrichment through the NATIVE join execs: a streaming
  * left side as-of/interval joined to a STATIC right side is stateless
  * per left row (each row matches independently against an immutable
  * table), so per-micro-batch execution of the batch execs is exactly
  * correct — no watermark, no state store, and the cumulative streamed
  * result must equal one batch run over the union of all micro-batches.
  * This is the "enrich events with the latest reference-data version at
  * event time" shape (dimension snapshots, price books, config epochs).
  * The stream-SIDE stateful as-of (growing right side) is AsOfStream;
  * this spec pins the static-right fast path.
  */
class StreamStaticJoinSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static as-of enrich == batch over the union of micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val right = (1L to 40L).map(i => (i % 5, i * 3, i)).toDF("rk", "rt", "rv")
    val stream = MemoryStream[(Long, Long)]
    val joined = AsOf.asofJoin(
      stream.toDS().toDF("k", "t"),
      right,
      Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rv"),
      outer = true
    )
    assert(joined.isStreaming, "as-of over a streaming left must stay streaming")
    val q = joined.writeStream.outputMode("append").format("memory").queryName("ss_asof").start()
    try {
      stream.addData((1L to 30L).map(i => (i % 5, i * 4)))
      q.processAllAvailable()
      stream.addData((31L to 60L).map(i => (i % 5, i * 4)))
      q.processAllAvailable()
      // MULTISET comparison (sorted row strings): a Set would collapse the
      // exact failure mode this spec exists to rule out — duplicate
      // emission of a match across micro-batch replans
      val got = spark.table("ss_asof").collect().map(_.toSeq.toString).sorted.toSeq
      val expected = AsOf
        .asofJoin(
          (1L to 60L).map(i => (i % 5, i * 4)).toDF("k", "t"),
          right, Seq("k"), Seq("rk"), "t", "rt",
          rightTieBreak = Seq("rv"), outer = true)
        .collect().map(_.toSeq.toString).sorted.toSeq
      assert(got == expected, s"stream=${got.size} rows, batch=${expected.size} rows; first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
      assert(expected.nonEmpty)
    } finally q.stop()
  }

  test("stream-static BACKWARD as-of (next-event vs static schedule) == batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the backward merge is stateless per left row against an IMMUTABLE
    // right table by the same argument as forward: "earliest static
    // rt >= t" never changes across micro-batches — the "match each
    // event to the next scheduled maintenance window" shape
    val right = (1L to 40L).map(i => (i % 5, i * 3, i)).toDF("rk", "rt", "rv")
    val stream = MemoryStream[(Long, Long)]
    val joined = AsOf.asofNextJoin(
      stream.toDS().toDF("k", "t"), right,
      Seq("k"), Seq("rk"), "t", "rt", rightTieBreak = Seq("rv"), outer = true)
    assert(joined.isStreaming)
    val q = joined.writeStream.outputMode("append").format("memory").queryName("ss_next").start()
    try {
      stream.addData((1L to 30L).map(i => (i % 5, i * 4)))
      q.processAllAvailable()
      stream.addData((31L to 60L).map(i => (i % 5, i * 4)))
      q.processAllAvailable()
      val got = spark.table("ss_next").collect().map(_.toSeq.toString).sorted.toSeq
      val expected = AsOf
        .asofNextJoin(
          (1L to 60L).map(i => (i % 5, i * 4)).toDF("k", "t"),
          right, Seq("k"), Seq("rk"), "t", "rt",
          rightTieBreak = Seq("rv"), outer = true)
        .collect().map(_.toSeq.toString).sorted.toSeq
      assert(got == expected && expected.nonEmpty,
        s"stream=${got.size} rows, batch=${expected.size} rows")
    } finally q.stop()
  }

  test("stream-static interval SEMI/ANTI == batch (streaming purge against static windows)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // static tombstone windows; streaming points kept (semi: inside some
    // window) or purged through (anti: outside every window) — stateless
    // per left row, so per-micro-batch execution is exact
    val wins = (1L to 20L).map(i => (i % 3, i * 5, i * 5 + 12)).toDF("rk", "s", "e")
    def run(mode: String): (Seq[String], Seq[String]) = {
      val stream = MemoryStream[(Long, Long)]
      def join(df: org.apache.spark.sql.DataFrame) =
        if (mode == "semi") Interval.intervalSemiJoin(df, wins, Seq("k"), Seq("rk"), "t", "s", "e")
        else Interval.intervalAntiJoin(df, wins, Seq("k"), Seq("rk"), "t", "s", "e")
      val joined = join(stream.toDS().toDF("k", "t"))
      assert(joined.isStreaming, s"$mode over a streaming left must stay streaming")
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(s"ss_ival_$mode").start()
      try {
        stream.addData((1L to 40L).map(i => (i % 3, i * 4)))
        q.processAllAvailable()
        stream.addData((41L to 80L).map(i => (i % 3, i * 4)))
        q.processAllAvailable()
        val got = spark.table(s"ss_ival_$mode").collect().map(_.toSeq.toString).sorted.toSeq
        val expected = join((1L to 80L).map(i => (i % 3, i * 4)).toDF("k", "t"))
          .collect().map(_.toSeq.toString).sorted.toSeq
        (got, expected)
      } finally q.stop()
    }
    val (semiGot, semiExp) = run("semi")
    assert(semiGot == semiExp && semiExp.nonEmpty, s"semi: stream=${semiGot.size} vs batch=${semiExp.size}")
    val (antiGot, antiExp) = run("anti")
    assert(antiGot == antiExp && antiExp.nonEmpty, s"anti: stream=${antiGot.size} vs batch=${antiExp.size}")
    // the two modes partition each micro-batch's rows exactly
    assert(semiGot.size + antiGot.size == 80)
  }

  test("stream-static EXISTS modes == batch and split into the semi/anti sets") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the flagged-EXISTS cells of both lattices are stateless per left
    // row against an immutable right by the same argument as semi/anti
    // (the boolean is a property of (left row, static table) alone), so
    // per-micro-batch execution is exact — one streamed pass yields both
    // the covered and the uncovered set via the flag
    val wins = (1L to 20L).map(i => (i % 3, i * 5, i * 5 + 12)).toDF("rk", "s", "e")
    val ivStream = MemoryStream[(Long, Long)]
    val ivJoined = Interval.intervalExistsJoin(
      ivStream.toDS().toDF("k", "t"), wins, Seq("k"), Seq("rk"), "t", "s", "e")
    assert(ivJoined.isStreaming, "interval exists over a streaming left must stay streaming")
    val q1 = ivJoined.writeStream.outputMode("append").format("memory")
      .queryName("ss_ival_exists").start()
    try {
      ivStream.addData((1L to 40L).map(i => (i % 3, i * 4)))
      q1.processAllAvailable()
      ivStream.addData((41L to 80L).map(i => (i % 3, i * 4)))
      q1.processAllAvailable()
      val got = spark.table("ss_ival_exists").collect().map(_.toSeq.toString).sorted.toSeq
      val batchDf = (1L to 80L).map(i => (i % 3, i * 4)).toDF("k", "t")
      val expected = Interval.intervalExistsJoin(
        batchDf, wins, Seq("k"), Seq("rk"), "t", "s", "e")
        .collect().map(_.toSeq.toString).sorted.toSeq
      assert(got == expected && expected.nonEmpty,
        s"interval exists: stream=${got.size} vs batch=${expected.size}")
      // every streamed point exactly once, flag splitting onto semi/anti
      assert(got.size == 80)
      val streamedMatched = spark.table("ss_ival_exists")
        .filter(col("matched")).drop("matched")
        .collect().map(_.toSeq.toString).sorted.toSeq
      val semi = Interval.intervalSemiJoin(batchDf, wins, Seq("k"), Seq("rk"), "t", "s", "e")
        .collect().map(_.toSeq.toString).sorted.toSeq
      assert(streamedMatched == semi)
    } finally q1.stop()
    // as-of exists (forward): "has a static version at or before t"
    val vers = (1L to 40L).map(i => (i % 5, i * 3, i)).toDF("rk", "rt", "rv")
    val aStream = MemoryStream[(Long, Long)]
    val aJoined = AsOf.asofExistsJoin(
      aStream.toDS().toDF("k", "t"), vers, Seq("k"), Seq("rk"), "t", "rt")
    assert(aJoined.isStreaming, "as-of exists over a streaming left must stay streaming")
    val q2 = aJoined.writeStream.outputMode("append").format("memory")
      .queryName("ss_asof_exists").start()
    try {
      aStream.addData((1L to 30L).map(i => (i % 5, i * 4)))
      q2.processAllAvailable()
      aStream.addData((31L to 60L).map(i => (i % 5, i * 4)))
      q2.processAllAvailable()
      val got = spark.table("ss_asof_exists").collect().map(_.toSeq.toString).sorted.toSeq
      val expected = AsOf.asofExistsJoin(
        (1L to 60L).map(i => (i % 5, i * 4)).toDF("k", "t"),
        vers, Seq("k"), Seq("rk"), "t", "rt")
        .collect().map(_.toSeq.toString).sorted.toSeq
      assert(got == expected && expected.nonEmpty,
        s"as-of exists: stream=${got.size} vs batch=${expected.size}")
      assert(got.size == 60)
    } finally q2.stop()
  }

  test("stream-static interval enrich == batch over the union of micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ivals = (1L to 30L).map(i => (i % 4, i * 2, i * 2 + 9, i)).toDF("rk", "s", "e", "rv")
    val stream = MemoryStream[(Long, Long)]
    val joined = Interval.intervalJoin(
      stream.toDS().toDF("k", "t"),
      ivals,
      Seq("k"), Seq("rk"), "t", "s", "e"
    )
    assert(joined.isStreaming)
    val q = joined.writeStream.outputMode("append").format("memory").queryName("ss_ival").start()
    try {
      stream.addData((1L to 25L).map(i => (i % 4, i * 3)))
      q.processAllAvailable()
      stream.addData((26L to 50L).map(i => (i % 4, i * 3)))
      q.processAllAvailable()
      val got = spark.table("ss_ival").collect().map(_.toSeq.toString).sorted.toSeq
      val expected = Interval
        .intervalJoin(
          (1L to 50L).map(i => (i % 4, i * 3)).toDF("k", "t"),
          ivals, Seq("k"), Seq("rk"), "t", "s", "e")
        .collect().map(_.toSeq.toString).sorted.toSeq
      assert(got == expected && expected.nonEmpty, s"stream=${got.size} rows vs batch=${expected.size} rows")
    } finally q.stop()
  }

  test("unsound stream-static shapes are refused loudly at plan time") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val staticPts = Seq((1L, 5L)).toDF("k", "t")
    val staticIvs = Seq((1L, 0L, 10L)).toDF("rk", "s", "e")
    val staticVers = Seq((1L, 3L, 7L)).toDF("rk", "rt", "rv")
    val streamDf = MemoryStream[(Long, Long)].toDS().toDF("k", "t")
    val streamIvs = MemoryStream[(Long, Long, Long)].toDS().toDF("rk", "s", "e")

    // as-of: streaming RIGHT (versions) — per-batch latest is superseded later
    val asofEx = intercept[IllegalArgumentException] {
      AsOf.asofJoin(staticPts, streamDf.select(col("k").as("rk"),
        col("t").as("rt")), Seq("k"), Seq("rk"), "t", "rt")
    }
    assert(asofEx.getMessage.contains("streaming"), asofEx.getMessage)

    // interval FULL OUTER with a streaming side — the static side's
    // unmatched rows would re-emit every micro-batch
    val foEx = intercept[IllegalArgumentException] {
      Interval.intervalFullOuterJoin(streamDf, staticIvs,
        Seq("k"), Seq("rk"), "t", "s", "e")
    }
    assert(foEx.getMessage.contains("FULL OUTER"), foEx.getMessage)

    // interval with a streaming RIGHT in a left-deciding mode — "covered
    // by some interval" quantifies across batches
    val semiEx = intercept[IllegalArgumentException] {
      Interval.intervalSemiJoin(staticPts, streamIvs,
        Seq("k"), Seq("rk"), "t", "s", "e")
    }
    assert(semiEx.getMessage.contains("inner mode"), semiEx.getMessage)
    // suppress unused warnings for the static versions frame kept for
    // symmetry with the as-of case
    assert(staticVers.columns.length == 3)
  }
}
