package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.model.Message
import graft.streaming.{EmittedBatch, KeyedBatcher}

object EmitProbe {
  val emitted = new ConcurrentLinkedQueue[(String, String, String, Seq[Int])]()
  def drain(): Seq[(String, String, String, Seq[Int])] =
    Iterator.continually(emitted.poll()).takeWhile(_ != null).toSeq
  def clear(): Unit = emitted.clear()
}

/** String-rendered probe for the encoded-state specs (payloads are case
  * classes there, rendered to stable strings at emit time).
  */
object EmitProbeS {
  val emitted = new ConcurrentLinkedQueue[(String, Seq[String])]()
  def drain(): Seq[(String, Seq[String])] =
    Iterator.continually(emitted.poll()).takeWhile(_ != null).toSeq
  def clear(): Unit = emitted.clear()
}

/** The evolution pair: V2 is V1 plus an added nullable field — the exact
  * payload change [[KeyedBatcher.encoded]]'s row-encoded state exists to
  * survive across a checkpoint restart.
  */
case class PayV1(s: String)
case class PayV2(s: String, n: Option[Long] = None)

/** Streaming-state batching: size batches within and across micro-batches,
  * timeout flush of open batches (batcher_stage.ex:80-89,106-257).
  *
  * NOTE: queries with ProcessingTimeTimeout state always "require another
  * batch" (the timer may fire), so `processAllAvailable()` never quiesces —
  * these specs poll the probe with a deadline instead.
  */
class KeyedBatcherSpec extends SparkSpec {

  import spark.implicits._

  private def awaitEmitted(
      atLeast: Int,
      timeoutMs: Long = 20000
  ): Seq[(String, String, String, Seq[Int])] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var got = Seq.empty[(String, String, String, Seq[Int])]
    while (got.size < atLeast && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      got = got ++ EmitProbe.drain()
    }
    got
  }

  test("size batches across micro-batches; timeout flushes the remainder") {
    EmitProbe.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Message[Int]]
    val batches = KeyedBatcher(stream.toDS(), batchSize = 10, batchTimeoutMs = 300)
    val query = batches.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[Int]], _: Long) =>
        ds.collect().foreach { b =>
          EmitProbe.emitted.add((b.batcher, b.batchKey, b.trigger, b.messages.map(_.data)))
        }
        ()
      }
      .start()
    try {
      // 15 messages: one full size-10 batch emits; 5 buffer until the
      // processing-time timer fires, then flush with trigger "timeout".
      stream.addData((1 to 15).map(i => Message(i, metadata = Map("seq" -> i.toString))))
      val got = awaitEmitted(atLeast = 2)
      assert(got.size == 2, s"expected size+timeout batches, got $got")
      assert(got.head._3 == "size")
      assert(got.head._4 == (1 to 10))
      assert(got(1)._3 == "timeout")
      assert(got(1)._4 == (11 to 15))
    } finally query.stop()
  }

  test("timeout clock starts at batch OPEN: a steady trickle cannot defer the flush forever") {
    // Regression (self-review r12): the timer was re-armed a full
    // batchTimeoutMs on every data-carrying micro-batch, so messages
    // trickling faster than the timeout deferred the flush until the
    // size trigger — unbounded latency for the batch's FIRST message.
    // The reference starts the clock when the batch opens
    // (batcher_stage.ex:80-89). With a 600 ms timeout and a ~200 ms
    // trickle (size trigger far away), the open batch must flush on
    // timeout WHILE the trickle continues: at least two timeout batches
    // across the run, none holding all the messages.
    EmitProbe.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Message[Int]]
    val batches = KeyedBatcher(stream.toDS(), batchSize = 100, batchTimeoutMs = 600)
    val query = batches.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[Int]], _: Long) =>
        ds.collect().foreach { b =>
          EmitProbe.emitted.add((b.batcher, b.batchKey, b.trigger, b.messages.map(_.data)))
        }
        ()
      }
      .start()
    try {
      // warm the query first: the FIRST micro-batch pays seconds of
      // codegen/state-store init and would swallow the whole trickle
      // into one batch, making the assertion vacuous on a cold JVM
      stream.addData(Message(0, metadata = Map("seq" -> "0")))
      awaitEmitted(atLeast = 1)
      EmitProbe.clear()
      (1 to 14).foreach { i =>
        stream.addData(Message(i, metadata = Map("seq" -> i.toString)))
        Thread.sleep(250)
      }
      val got = awaitEmitted(atLeast = 2)
      assert(got.forall(_._3 == "timeout"), s"expected timeout flushes, got $got")
      assert(got.size >= 2, s"trickle deferred the timeout to one terminal flush: $got")
      assert(got.head._4.size < 14, s"first flush held the whole trickle: ${got.head}")
      // nothing lost, nothing duplicated, arrival order preserved
      assert(got.flatMap(_._4) == got.flatMap(_._4).sorted)
    } finally query.stop()
  }

  test("custom splitter accumulator spans micro-batches") {
    EmitProbe.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Message[Int]]
    // emit when cumulative weight reaches 10
    val sp = graft.config.BatchSplitter[Int](0L, (m, acc) => {
      val next = acc + m.data
      (next >= 10, next)
    })
    val batches = KeyedBatcher(stream.toDS(), batchTimeoutMs = 600000, splitter = Some(sp))
    val query = batches.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[Int]], _: Long) =>
        ds.collect().foreach { b =>
          EmitProbe.emitted.add((b.batcher, b.batchKey, b.trigger, b.messages.map(_.data)))
        }
        ()
      }
      .start()
    try {
      // 4+4=8 < 10: buffered across the micro-batch boundary with acc=8
      // (poll, don't processAllAvailable: timeout-state queries never quiesce)
      stream.addData(Seq(Message(4, metadata = Map("seq" -> "1")), Message(4, metadata = Map("seq" -> "2"))))
      Thread.sleep(1500)
      assert(EmitProbe.drain().isEmpty)
      // +3 → 11 ≥ 10: the accumulated state (not just this batch) emits
      stream.addData(Seq(Message(3, metadata = Map("seq" -> "3"))))
      val out = awaitEmitted(atLeast = 1)
      assert(out.map(_._3) == Seq("size"))
      assert(out.head._4 == Seq(4, 4, 3))
    } finally query.stop()
  }

  test("open-batch state survives a query restart via checkpoint") {
    EmitProbe.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val stream = MemoryStream[Message[Int]]

    def startQuery() = KeyedBatcher(stream.toDS(), batchSize = 10, batchTimeoutMs = 600000).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[Int]], _: Long) =>
        ds.collect().foreach { b =>
          EmitProbe.emitted.add((b.batcher, b.batchKey, b.trigger, b.messages.map(_.data)))
        }
        ()
      }
      .start()

    val q1 = startQuery()
    try {
      stream.addData((1 to 7).map(i => Message(i, metadata = Map("seq" -> i.toString))))
      Thread.sleep(2000) // let the micro-batch buffer the 7 into state
      assert(EmitProbe.drain().isEmpty)
    } finally q1.stop()

    // crash/restart analog (topology.ex:506-557 → checkpoint recovery):
    // the recovered state still holds 1..7
    val q2 = startQuery()
    try {
      stream.addData((8 to 12).map(i => Message(i, metadata = Map("seq" -> i.toString))))
      val out = awaitEmitted(atLeast = 1)
      assert(out.map(_._3) == Seq("size"))
      assert(out.head._4 == (1 to 10), s"state lost across restart: ${out.head._4}")
    } finally q2.stop()
  }

  test("statePartitions binds the batcher's stateful width without touching the session") {
    EmitProbe.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Message[Int]]
    val sessionWidth = spark.conf.get("spark.sql.shuffle.partitions")
    val query = KeyedBatcher(stream.toDS(), batchSize = 2, batchTimeoutMs = 600000,
      statePartitions = Some(2)).writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[Int]], _: Long) =>
        ds.collect().foreach { b =>
          EmitProbe.emitted.add((b.batcher, b.batchKey, b.trigger, b.messages.map(_.data)))
        }
        ()
      }
      .start()
    try {
      stream.addData(Seq(Message(1, metadata = Map("seq" -> "1")), Message(2, metadata = Map("seq" -> "2"))))
      assert(awaitEmitted(atLeast = 1).nonEmpty)
      // progress events trail the foreachBatch callback (and idle events
      // carry no stateOperators) — poll the recent ring for the
      // data-carrying batch
      def widths() = query.recentProgress.flatMap(_.stateOperators).map(_.numShufflePartitions)
      val deadline = System.currentTimeMillis() + 20000
      while (widths().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(widths().nonEmpty && widths().max == 2L,
        s"batcher state width not bound to the operator parameter: ${widths().toSeq}")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == sessionWidth)
    } finally query.stop()
  }

  test("legacy (buffer, acc) checkpoint blobs migrate instead of ClassCastException") {
    // The state blob grew a third field (absolute deadline) with the
    // trickle-starvation fix; a checkpoint written before that commit must
    // restore with the clock restarted at recovery, not crash the query.
    def javaSer(o: AnyRef): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close(); bos.toByteArray
    }
    val msgs = Vector(Message(7, metadata = Map("seq" -> "1")))
    val legacy = javaSer((msgs, 42L)) // pre-deadline Tuple2 shape
    val (buf, acc, deadline) = KeyedBatcher.deserialize[Int](legacy, fallbackDeadline = 9999L)
    assert(buf.map(_.data) == Seq(7))
    assert(acc == 42L)
    assert(deadline == 9999L, "migrated open batch must restart its clock at the fallback")
    // current shape round-trips unchanged
    val cur = javaSer((msgs, 42L, 123L))
    assert(KeyedBatcher.deserialize[Int](cur, fallbackDeadline = 0L) == ((msgs, 42L, 123L)))
    // anything else fails loudly with the shape named
    val bad = intercept[IllegalStateException](KeyedBatcher.deserialize[Int](javaSer("junk"), 0L))
    assert(bad.getMessage.contains("state shape"))
  }

  test("encoded: same size/timeout semantics on row-encoded state (shared foldGroup core)") {
    EmitProbeS.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Message[PayV1]]
    val batches = KeyedBatcher.encoded(stream.toDS(), batchSize = 10, batchTimeoutMs = 300)
    val query = batches.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[PayV1]], _: Long) =>
        ds.collect().foreach { b =>
          EmitProbeS.emitted.add((b.trigger, b.messages.map(_.data.s)))
        }
        ()
      }
      .start()
    try {
      stream.addData((1 to 15).map(i => Message(PayV1(s"m$i"), metadata = Map("seq" -> i.toString))))
      val deadline = System.currentTimeMillis() + 20000
      var got = Seq.empty[(String, Seq[String])]
      while (got.size < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); got = got ++ EmitProbeS.drain()
      }
      assert(got.size == 2, s"expected size+timeout batches, got $got")
      assert(got.head._1 == "size" && got.head._2 == (1 to 10).map(i => s"m$i"))
      assert(got(1)._1 == "timeout" && got(1)._2 == (11 to 15).map(i => s"m$i"))
    } finally query.stop()
  }

  test("encoded: ADDING a payload field between checkpoint and resume still drains the open batch") {
    // The upgrade apply()'s Java-ser state cannot make: state written with
    // Message[PayV1] is read back by a query compiled against
    // Message[PayV2] (one added nullable field) — Avro-encoded state
    // evolves the schema, old rows null-fill the new field, and the
    // buffered batch drains. With the blob backend this restart dies on
    // serialVersionUID mismatch ("keep A binary-stable or drain").
    EmitProbeS.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-evolve").toString

    val s1 = MemoryStream[Message[PayV1]]
    val q1 = KeyedBatcher.encoded(s1.toDS(), batchSize = 10, batchTimeoutMs = 600000).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[PayV1]], _: Long) =>
        ds.collect().foreach(b => EmitProbeS.emitted.add((b.trigger, b.messages.map(_.data.s))))
        ()
      }
      .start()
    try {
      s1.addData((1 to 7).map(i => Message(PayV1(s"m$i"), metadata = Map("seq" -> i.toString))))
      // wait until a committed micro-batch has actually CONSUMED the 7
      // (cold RocksDB+Avro startup can exceed seconds; stopping earlier
      // kills batch 0 mid-flight and checkpoints nothing)
      val deadline = System.currentTimeMillis() + 60000
      def consumed(): Long = q1.recentProgress.map(_.numInputRows).sum
      while (consumed() < 7 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(consumed() >= 7, "first query never buffered the batch into state")
      Thread.sleep(500) // let the commit finish before stop
      assert(EmitProbeS.drain().isEmpty)
    } finally q1.stop()

    // "deploy": the payload class gained a field; resume the SAME checkpoint.
    // The new-typed MemoryStream needs a placeholder block 0 — the
    // checkpoint already committed the old stream's block 0, so the
    // restarted query resumes reading at block 1 (offset alignment, not
    // an engine concern)
    val s2 = MemoryStream[Message[PayV2]]
    s2.addData(Seq.empty[Message[PayV2]])
    val q2 = KeyedBatcher.encoded(s2.toDS(), batchSize = 10, batchTimeoutMs = 600000).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[PayV2]], _: Long) =>
        ds.collect().foreach(b =>
          EmitProbeS.emitted.add((b.trigger, b.messages.map(m => s"${m.data.s}/${m.data.n}"))))
        ()
      }
      .start()
    try {
      s2.addData((8 to 10).map(i =>
        Message(PayV2(s"m$i", Some(i.toLong)), metadata = Map("seq" -> i.toString))))
      val deadline = System.currentTimeMillis() + 30000
      var got = Seq.empty[(String, Seq[String])]
      while (got.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); got = got ++ EmitProbeS.drain()
      }
      assert(got.map(_._1) == Seq("size"), s"open batch did not drain after evolution: $got")
      assert(got.head._2 ==
        (1 to 7).map(i => s"m$i/None") ++ (8 to 10).map(i => s"m$i/Some($i)"),
        s"evolved payloads wrong: ${got.head._2}")
    } finally q2.stop()
  }

  test("encoded: the open-batch state is INSPECTABLE via StateInspect stateVarName") {
    // The ops loop closes over the new variant too: a stuck/overgrown
    // encoded batcher's checkpoint answers "which (batcher, batchKey)
    // holds the open buffer, and how big" offline — TWS stores are
    // addressed by state VARIABLE name ("open"), not store name.
    EmitProbeS.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-enc-inspect").toString
    val s1 = MemoryStream[Message[PayV1]]
    val q1 = KeyedBatcher.encoded(s1.toDS(), batchSize = 100, batchTimeoutMs = 600000).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[PayV1]], _: Long) =>
        ds.collect().foreach(b => EmitProbeS.emitted.add((b.trigger, b.messages.map(_.data.s))))
        ()
      }
      .start()
    try {
      s1.addData((1 to 5).map(i =>
        Message(PayV1(s"m$i"), metadata = Map("seq" -> i.toString), batchKey = "hot")))
      val deadline = System.currentTimeMillis() + 60000
      def consumed(): Long = q1.recentProgress.map(_.numInputRows).sum
      while (consumed() < 5 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(consumed() >= 5)
      Thread.sleep(500)
    } finally q1.stop()
    val rows = graft.streaming.StateInspect
      .stateRows(spark, checkpoint, stateVarName = Some("open")).collect()
    assert(rows.length == 1, s"expected the one open group, got ${rows.toSeq}")
    val key = rows.head.getStruct(rows.head.fieldIndex("key"))
    assert(key.toSeq.contains("hot"), s"group key not visible: $key")
    val hot = graft.streaming.StateInspect
      .hotKeys(spark, checkpoint, stateVarName = Some("open"), topK = 1).collect()
    assert(hot.length == 1 && hot.head.getAs[Long]("state_rows") == 1L)
    assert(hot.head.getAs[Long]("state_bytes_est") > 0L)
  }

  test("incremental: same size/timeout semantics on list state (shared foldGroup core)") {
    EmitProbeS.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Message[PayV1]]
    val batches = KeyedBatcher.incremental(stream.toDS(), batchSize = 10, batchTimeoutMs = 300)
    val query = batches.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[PayV1]], _: Long) =>
        ds.collect().foreach { b =>
          EmitProbeS.emitted.add((b.trigger, b.messages.map(_.data.s)))
        }
        ()
      }
      .start()
    try {
      stream.addData((1 to 15).map(i => Message(PayV1(s"m$i"), metadata = Map("seq" -> i.toString))))
      val deadline = System.currentTimeMillis() + 20000
      var got = Seq.empty[(String, Seq[String])]
      while (got.size < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); got = got ++ EmitProbeS.drain()
      }
      assert(got.size == 2, s"expected size+timeout batches, got $got")
      assert(got.head._1 == "size" && got.head._2 == (1 to 10).map(i => s"m$i"))
      assert(got(1)._1 == "timeout" && got(1)._2 == (11 to 15).map(i => s"m$i"))
    } finally query.stop()
  }

  test("incremental == encoded: deterministic differential across keys, flush modes, and wave splits") {
    // Same message sequence (3 batch keys, interleaved, flush messages,
    // size boundaries straddling waves) through BOTH transformWithState
    // backends with an unreachable timeout — emitted batches must be
    // identical per key, in order, trigger included. The append fast
    // path must be invisible in the output.
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val msgs = (1 to 60).map { i =>
      Message(
        PayV1(s"m$i"),
        metadata = Map("seq" -> i.toString),
        batchKey = s"k${i % 3}",
        batchMode = if (i % 17 == 0) graft.model.BatchMode.Flush else graft.model.BatchMode.Bulk)
    }
    def run(
        mk: org.apache.spark.sql.Dataset[Message[PayV1]] => org.apache.spark.sql.Dataset[EmittedBatch[PayV1]]
    ): Seq[(String, String, Seq[String])] = {
      val out = new ConcurrentLinkedQueue[(String, String, Seq[String])]()
      val s = MemoryStream[Message[PayV1]]
      val q = mk(s.toDS()).writeStream
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(50))
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[PayV1]], _: Long) =>
          ds.collect().foreach(b => out.add((b.batchKey, b.trigger, b.messages.map(_.data.s))))
          ()
        }
        .start()
      try {
        msgs.grouped(20).foreach { wave =>
          s.addData(wave)
          val target = out.size // just ensure progress; emissions counted below
          val deadline = System.currentTimeMillis() + 20000
          while (q.recentProgress.map(_.numInputRows).sum <
            msgs.indexOf(wave.last) + 1 && System.currentTimeMillis() < deadline)
            Thread.sleep(50)
          assert(target >= 0)
        }
        Thread.sleep(500)
      } finally q.stop()
      Iterator.continually(out.poll()).takeWhile(_ != null).toSeq
        .sortBy(b => (b._1, b._3.head.drop(1).toInt))
    }
    val enc = run(ds => KeyedBatcher.encoded(ds, batchSize = 7, batchTimeoutMs = 600000))
    val inc = run(ds => KeyedBatcher.incremental(ds, batchSize = 7, batchTimeoutMs = 600000))
    assert(enc.nonEmpty, "differential is vacuous — nothing emitted")
    assert(inc == enc, s"backends diverged:\nencoded=$enc\nincremental=$inc")
  }

  test("incremental: buffered rows are per-message list state, inspectable and restart-drainable") {
    // One open group of 6 messages: StateInspect over stateVarName "buf"
    // must see SIX rows (one per buffered message — the inspectability
    // the blob/row backends cannot give), and a RESTART against the same
    // checkpoint must drain the buffer intact on timeout.
    EmitProbeS.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-inc-inspect").toString
    val s1 = MemoryStream[Message[PayV1]]
    val q1 = KeyedBatcher.incremental(s1.toDS(), batchSize = 100, batchTimeoutMs = 600000)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[PayV1]], _: Long) =>
        ds.collect().foreach(b => EmitProbeS.emitted.add((b.trigger, b.messages.map(_.data.s))))
        ()
      }
      .start()
    try {
      // two waves — the second rides the append FAST PATH (no emission)
      s1.addData((1 to 4).map(i =>
        Message(PayV1(s"m$i"), metadata = Map("seq" -> i.toString), batchKey = "hot")))
      val deadline = System.currentTimeMillis() + 60000
      def consumed(): Long = q1.recentProgress.map(_.numInputRows).sum
      while (consumed() < 4 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      s1.addData((5 to 6).map(i =>
        Message(PayV1(s"m$i"), metadata = Map("seq" -> i.toString), batchKey = "hot")))
      while (consumed() < 6 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(consumed() >= 6)
      Thread.sleep(500)
    } finally q1.stop()
    val rows = graft.streaming.StateInspect
      .stateRows(spark, checkpoint, stateVarName = Some("buf")).collect()
    assert(rows.length == 6, s"expected one state row per buffered message, got ${rows.length}")
    val hot = graft.streaming.StateInspect
      .hotKeys(spark, checkpoint, stateVarName = Some("buf"), topK = 1, rankBy = "rows").collect()
    assert(hot.length == 1 && hot.head.getAs[Long]("state_rows") == 6L)
    // restart with batchSize 7: one more message tips the recovered
    // 6-message buffer over the size trigger — the checkpointed list
    // state must drain in order (placeholder blocks align the offsets)
    EmitProbeS.clear()
    val s2 = MemoryStream[Message[PayV1]]
    s2.addData(Seq.empty[Message[PayV1]])
    s2.addData(Seq.empty[Message[PayV1]])
    val q2 = KeyedBatcher.incremental(s2.toDS(), batchSize = 7, batchTimeoutMs = 600000)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[PayV1]], _: Long) =>
        ds.collect().foreach(b => EmitProbeS.emitted.add((b.trigger, b.messages.map(_.data.s))))
        ()
      }
      .start()
    try {
      s2.addData(Seq(Message(PayV1("m7"), metadata = Map("seq" -> "7"), batchKey = "hot")))
      val deadline = System.currentTimeMillis() + 60000
      var got = Seq.empty[(String, Seq[String])]
      while (got.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); got = got ++ EmitProbeS.drain()
      }
      assert(got.nonEmpty, "restart did not drain the list-state buffer")
      assert(got.head._1 == "size" && got.head._2 == (1 to 7).map(i => s"m$i"),
        s"buffer content/order lost across restart: $got")
    } finally q2.stop()
  }

  test("hotKeys byte estimate tracks ACTUAL checkpoint state-file growth for binary-blob values") {
    // Java-ser KeyedBatcher state is one binary field per open group —
    // the value shape a JSON-length estimate inflates by 4/3 (base64)
    // plus framing. The physical estimator charges the blob's exact
    // octet length, so the estimate's DELTA between a narrow-payload run
    // and a wide-payload run must track the checkpoint state dir's
    // actual on-disk growth, and the wide key must top the ranking.
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def du(dir: String): Long = {
      val p = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(p)) 0L
      else {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
    }
    def run(checkpoint: String, wideA: Boolean): Unit = {
      val s = MemoryStream[Message[String]]
      val q = KeyedBatcher(s.toDS(), batchSize = 100, batchTimeoutMs = 600000).writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.ProcessingTime(100))
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[String]], _: Long) =>
          ds.collect() // consume every partition (commit validation); nothing emits here
          ()
        }
        .start()
      try {
        // INCOMPRESSIBLE wide payloads (deterministic random alnum): the
        // provider LZ4-compresses its delta files, so a repeated-char
        // payload would vanish on disk and the growth comparison below
        // would measure the codec, not the state
        val rnd = new scala.util.Random(7)
        def blob(n: Int): String = {
          val alnum = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')
          Iterator.fill(n)(alnum(rnd.nextInt(alnum.length))).mkString
        }
        s.addData(
          (1 to 3).map(i => Message(blob(if (wideA) 40000 else 16),
            metadata = Map("seq" -> i.toString), batchKey = "a")) ++
            (1 to 3).map(i => Message(blob(16),
              metadata = Map("seq" -> i.toString), batchKey = "b")))
        val deadline = System.currentTimeMillis() + 60000
        def consumed(): Long = q.recentProgress.map(_.numInputRows).sum
        while (consumed() < 6 && System.currentTimeMillis() < deadline) Thread.sleep(100)
        assert(consumed() >= 6)
        Thread.sleep(300)
      } finally q.stop()
    }
    def estSum(checkpoint: String): Long = graft.streaming.StateInspect
      .hotKeys(spark, checkpoint, topK = 10)
      .agg(org.apache.spark.sql.functions.sum("state_bytes_est")).head().getLong(0)
    val ckNarrow = java.nio.file.Files.createTempDirectory("graft-bytes-narrow").toString
    val ckWide = java.nio.file.Files.createTempDirectory("graft-bytes-wide").toString
    run(ckNarrow, wideA = false)
    run(ckWide, wideA = true)
    // ranking: the wide key tops the bytes ranking, not just the row count
    val top = graft.streaming.StateInspect.hotKeys(spark, ckWide, topK = 2).collect()
    assert(top.length == 2 && top.head.getAs[String]("_2") == "a",
      s"wide-blob key must rank first by bytes: ${top.toSeq}")
    assert(top.head.getAs[Long]("state_rows") == top(1).getAs[Long]("state_rows"),
      "precondition: both keys hold ONE open group — only bytes separate them")
    // growth attribution: estimate delta vs actual state-file growth
    // (identical runs except the payload width, so per-run provider
    // overhead cancels in the delta)
    val dEst = estSum(ckWide) - estSum(ckNarrow)
    val dDu = du(s"$ckWide/state") - du(s"$ckNarrow/state")
    assert(dEst > 50000, s"estimate delta must see the ~120 KB payload, got $dEst")
    assert(dDu > 0, s"state files must actually have grown, got $dDu")
    val ratio = dEst.toDouble / dDu.toDouble
    assert(ratio > 0.5 && ratio < 2.0,
      s"estimate delta ($dEst) must track actual state-file growth ($dDu), ratio $ratio")
  }

  test("flush-mode message flushes its open batch immediately") {
    EmitProbe.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Message[Int]]
    val batches = KeyedBatcher(stream.toDS(), batchSize = 100, batchTimeoutMs = 600000)
    val query = batches.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[Int]], _: Long) =>
        ds.collect().foreach { b =>
          EmitProbe.emitted.add((b.batcher, b.batchKey, b.trigger, b.messages.map(_.data)))
        }
        ()
      }
      .start()
    try {
      stream.addData(Seq(Message(1, metadata = Map("seq" -> "1")), Message(2, metadata = Map("seq" -> "2"))))
      Thread.sleep(1000)
      assert(EmitProbe.drain().isEmpty) // buffered: far from size, long timeout
      stream.addData(Seq(Message(3, metadata = Map("seq" -> "3"), batchMode = "flush")))
      val out = awaitEmitted(atLeast = 1)
      assert(out.map(_._3) == Seq("flush"))
      assert(out.head._4 == Seq(1, 2, 3))
    } finally query.stop()
  }

  // batcher_stage.ex:178-179 — the batch is delivered AT the flush message;
  // later arrivals in the same trigger open a new batch.
  test("messages after a flush message in the same trigger start a new batch") {
    EmitProbe.clear()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Message[Int]]
    val batches = KeyedBatcher(stream.toDS(), batchSize = 100, batchTimeoutMs = 600000)
    val query = batches.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmittedBatch[Int]], _: Long) =>
        ds.collect().foreach { b =>
          EmitProbe.emitted.add((b.batcher, b.batchKey, b.trigger, b.messages.map(_.data)))
        }
        ()
      }
      .start()
    try {
      stream.addData(
        Seq(
          Message(1, metadata = Map("seq" -> "1")),
          Message(2, metadata = Map("seq" -> "2"), batchMode = "flush"),
          Message(3, metadata = Map("seq" -> "3"))
        )
      )
      val out = awaitEmitted(atLeast = 1)
      assert(out == Seq(("default", "default", "flush", Seq(1, 2))), s"flush boundary leaked: $out")
      // 3 is buffered in a fresh batch; a later flush delivers it
      stream.addData(Seq(Message(4, metadata = Map("seq" -> "4"), batchMode = "flush")))
      val next = awaitEmitted(atLeast = 1)
      assert(next == Seq(("default", "default", "flush", Seq(3, 4))), s"new batch wrong: $next")
    } finally query.stop()
  }
}
