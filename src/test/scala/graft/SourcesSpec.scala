package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Sources

object FileProbe {
  val rows = new AtomicLong(0)
  val batches = new AtomicLong(0)
}

/** Source adapters: drop-directory file stream with per-trigger admission —
  * the producer/back-pressure surface of SURVEY §2.1 (demand window ≈
  * maxFilesPerTrigger), plus lifecycle hooks.
  */
class SourcesSpec extends SparkSpec {

  test("fileStream ingests a drop directory with per-trigger file admission") {
    FileProbe.rows.set(0)
    FileProbe.batches.set(0)
    val dir = Files.createTempDirectory("graft-src")
    val src = Paths.get("/root/testdata/sf0.001/nation.parquet")
    Files.copy(src, dir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, dir.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val df = Sources.fileStream(
      spark,
      "parquet",
      dir.toString,
      schemaFrom = Some(src.toString),
      maxFilesPerTrigger = Some(1)
    )
    val q = df.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
        FileProbe.rows.addAndGet(d.count())
        FileProbe.batches.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination(60000)
    assert(FileProbe.rows.get() == 50, s"expected 2x25 nation rows, got ${FileProbe.rows.get()}")
    // admission: 1 file per trigger → at least 2 micro-batches
    assert(FileProbe.batches.get() >= 2)
  }

  // options.ex:98-128 → maxOffsetsPerTrigger: the kafka adapter's reader
  // config, asserted without a broker (integration-shape test).
  test("kafka adapter maps RateLimiting to maxOffsetsPerTrigger") {
    import graft.config.RateLimiting
    val opts = Sources.kafkaOptions(
      bootstrapServers = "broker1:9092,broker2:9092",
      topics = "events,clicks",
      rateLimiting = Some(RateLimiting(allowedMessages = 5000, intervalMs = 1000))
    )
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "events,clicks")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("maxOffsetsPerTrigger") == "5000")

    val unlimited = Sources.kafkaOptions("b:9092", "t", rateLimiting = None)
    assert(!unlimited.contains("maxOffsetsPerTrigger"))
    assert(unlimited("startingOffsets") == "earliest")
  }

  test("prepareForStart and prepareForDraining hooks fire in order") {
    import graft.config.PipelineConfig
    import graft.testkit.TestPipeline
    import spark.implicits._
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    val cfg = PipelineConfig[Int](
      name = "hooks",
      prepareForStart = () => { events += "start"; () },
      prepareForDraining = () => { events += "drain"; () }
    )
    val tp = new TestPipeline(spark, cfg)
    tp.testMessage(1)
    tp.processAllAvailable()
    tp.stop()
    assert(events.toList == List("start", "drain"))
  }
}
