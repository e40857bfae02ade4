package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import graft.ack.{AckCollector, CallerAcknowledger}
import graft.config.{BatcherConfig, PipelineConfig}
import graft.core.Pipeline
import graft.model.{BatchInfo, Message}
import graft.sources.QueueSource

object E2EProbe {
  val batches = new ConcurrentLinkedQueue[(String, Seq[String])]()
  def drain(): Seq[(String, Seq[String])] =
    Iterator.continually(batches.poll()).takeWhile(_ != null).toSeq
  def clear(): Unit = batches.clear()
}

/** The full composition a Broadway user would run: external queue source
  * (DSv2, offset-committed) → transformer → handleMessage routing →
  * batcher grouping → handleBatch → acks. One pipeline, every §2 stage.
  */
class EndToEndSpec extends SparkSpec {

  import spark.implicits._

  test("queue → transform → route → batch → ack, with source offsets committed") {
    E2EProbe.clear()
    val q = QueueSource.create("e2e-q", None)
    val collectorId = "e2e-collector"
    try {
      q.push((1 to 20).map(i => s"item-$i"): _*)

      // Source + transformer (the producer :transformer hook): value →
      // Message, arrival order carried from the source offset.
      val raw = spark.readStream
        .format("graft.sources.QueueSourceProvider")
        .option("queue", "e2e-q")
        .load()
      val messages = raw
        .select(col("offset"), col("value"))
        .as[(Long, String)]
        .map { case (off, v) => Message(v, metadata = Map("seq" -> off.toString)) }

      val cfg = PipelineConfig[String](
        name = "e2e",
        handleMessage = m => {
          val n = m.data.stripPrefix("item-").toInt
          if (n % 10 == 0) m.failed("div10")
          else m.putBatcher(if (n % 2 == 0) "evens" else "odds")
        },
        handleBatch = (name: String, msgs: Seq[Message[String]], _: BatchInfo) => {
          E2EProbe.batches.add((name, msgs.map(_.data)))
          msgs
        },
        batchers = Seq(BatcherConfig[String]("evens", batchSize = 5), BatcherConfig[String]("odds", batchSize = 5))
      )
      val running = Pipeline.start(spark, messages, cfg, CallerAcknowledger(collectorId))
      try {
        running.processAllAvailable()
        val acks = AckCollector.drain(collectorId)
        val ok = acks.flatMap(_.successful).map(_.data.asInstanceOf[String])
        val failed = acks.flatMap(_.failed).map(_.data.asInstanceOf[String])
        assert(ok.size == 18 && failed.toSet == Set("item-10", "item-20"))

        val byRoute = E2EProbe.drain().groupBy(_._1)
        assert(byRoute.keySet == Set("evens", "odds"))
        assert(byRoute("evens").flatMap(_._2).forall(_.stripPrefix("item-").toInt % 2 == 0))
        assert(byRoute("odds").flatMap(_._2).forall(_.stripPrefix("item-").toInt % 2 == 1))
        // per-key arrival order held through the shuffle
        byRoute.values.flatten.foreach { case (_, data) =>
          val nums = data.map(_.stripPrefix("item-").toInt)
          assert(nums == nums.sorted, s"out of order: $nums")
        }

        // the source admitted everything; commit trails by one trigger
        assert(q.admittedOffset == 20)
        q.push("item-21") // next batch commits the prior range
        running.processAllAvailable()
        assert(q.committedOffset >= 20)
      } finally running.stop()
    } finally {
      QueueSource.remove("e2e-q")
      AckCollector.clear(collectorId)
    }
  }
}
