package graft

import java.util.concurrent.ConcurrentLinkedQueue
import graft.core.RateLimiter
import graft.sources.QueueSource

object QueueProbe {
  val rows = new ConcurrentLinkedQueue[(Long, String)]()
  def drain(): Seq[(Long, String)] =
    Iterator.continually(rows.poll()).takeWhile(_ != null).toSeq
  def clear(): Unit = rows.clear()
}

/** Per-value attempt counter for the requeue test (executor-shared JVM). */
object RequeueProbe {
  val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def clear(): Unit = attempts.clear()
}

/** DSv2 queue source: rate-limited admission at latestOffset, ack on
  * commit — exact Broadway producer semantics at the Spark source boundary.
  */
class QueueSourceSpec extends SparkSpec {

  test("admission is rate-limited per interval and commits drive acks in order") {
    QueueProbe.clear()
    val rl = new RateLimiter(3, 600000) // 3 messages per (long) interval
    val q = QueueSource.create("spec-q1", Some(rl))
    try {
      q.push((1 to 10).map(i => s"m$i"): _*)
      val df = spark.readStream
        .format("graft.sources.QueueSourceProvider")
        .option("queue", "spec-q1")
        .load()
      val query = df.writeStream
        .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
          d.collect().foreach(r => QueueProbe.rows.add((r.getLong(0), r.getString(1))))
          ()
        }
        .start()
      try {
        query.processAllAvailable()
        val first = QueueProbe.drain()
        assert(first.map(_._2) == Seq("m1", "m2", "m3"), s"admission over budget: $first")
        assert(q.admittedOffset == 3)

        // replenish the budget → the rest flows; constructing the next
        // batch commits the previous range (deferred source.commit)
        rl.update(Some(100), None, reset = true)
        query.processAllAvailable()
        val rest = QueueProbe.drain()
        assert(rest.map(_._2) == (4 to 10).map(i => s"m$i"))
        assert(q.committedOffset >= 3)
        assert(q.acks.flatten.take(3) == Seq("m1", "m2", "m3"))

        // one more batch commits the m4..m10 range
        q.push("m11")
        query.processAllAvailable()
        assert(q.committedOffset >= 10)
        assert(q.acks.flatten.take(10) == (1 to 10).map(i => s"m$i"))
      } finally query.stop()
    } finally {
      rl.shutdown()
      QueueSource.remove("spec-q1")
    }
  }

  // acknowledger.ex:44-59 — configure validates the options; the queue
  // acknowledger honors requeue=true by pushing the failed value back.
  test("configure_ack requeue: a transiently-failed message is redelivered") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.config.{BatcherConfig, PipelineConfig}
    import graft.core.Pipeline
    import graft.model.Message
    import graft.sources.QueueAcknowledger
    RequeueProbe.clear()
    val q = QueueSource.create("spec-q3", None)
    try {
      q.push("good-1", "bad-2", "good-3")
      val messages = spark.readStream
        .format("graft.sources.QueueSourceProvider")
        .option("queue", "spec-q3")
        .load()
        .select(col("offset"), col("value"))
        .as[(Long, String)]
        .map { case (off, v) => Message(v, metadata = Map("seq" -> off.toString)) }
      val cfg = PipelineConfig[String](
        name = "requeue",
        handleMessage = m => {
          val n = RequeueProbe.attempts.merge(m.data, 1, (a, b) => a + b).intValue()
          // first attempt at a bad value TRANSFORMS the data, then fails
          // transiently asking for redelivery — the requeued copy must be
          // the original payload, not the transformed one
          if (m.data.startsWith("bad") && n == 1)
            m.updateData(_.toUpperCase).configureAck(Map("requeue" -> "true")).failed("transient")
          else m
        },
        batchers = Seq(BatcherConfig[String]("default", batchSize = 10))
      )
      val running = Pipeline.start(spark, messages, cfg, QueueAcknowledger("spec-q3"))
      try {
        running.processAllAvailable()
        // the requeued copy was pushed and a later trigger processed it
        assert(RequeueProbe.attempts.get("bad-2") == 2, s"attempts=${RequeueProbe.attempts}")
        assert(RequeueProbe.attempts.get("good-1") == 1)
        assert(q.size == 4, s"queue should hold original 3 + 1 requeued copy, size=${q.size}")
        // the redelivered payload is the ORIGINAL, not the uppercased data
        assert(q.originalValue(3L).contains("bad-2"), s"requeued=${q.originalValue(3L)}")
        assert(!RequeueProbe.attempts.containsKey("BAD-2"), "transformed data leaked into the queue")
      } finally running.stop()
    } finally {
      QueueSource.remove("spec-q3")
      RequeueProbe.clear()
    }
  }

  test("configure rejects unsupported ack options") {
    import graft.sources.QueueAcknowledger
    val ex = intercept[IllegalArgumentException] {
      QueueAcknowledger("any").configure("ref", Map("visibility_timeout" -> "30"))
    }
    assert(ex.getMessage.contains("visibility_timeout"))
  }

  test("onAck callback receives each committed range") {
    QueueProbe.clear()
    val q = QueueSource.create("spec-q2", None)
    val seen = new ConcurrentLinkedQueue[Seq[String]]()
    q.onAck = vals => { seen.add(vals); () }
    try {
      q.push("a", "b")
      val df = spark.readStream
        .format("graft.sources.QueueSourceProvider")
        .option("queue", "spec-q2")
        .load()
      val query = df.writeStream
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try {
        query.processAllAvailable()
        q.push("c")
        query.processAllAvailable()
        q.push("d") // next batch construction commits the "c" range
        query.processAllAvailable()
        val acked = Iterator.continually(seen.poll()).takeWhile(_ != null).toSeq
        assert(acked.flatten == Seq("a", "b", "c"))
        assert(acked.size == 2) // one ack per committed micro-batch range
      } finally query.stop()
    } finally QueueSource.remove("spec-q2")
  }
}
