package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import graft.config.RateLimiting
import graft.model.Message

/** Source adapters (SURVEY.md §2.1): the Spark realization of Broadway
  * producers. Demand-based back-pressure is inherent in the micro-batch
  * pull model; the reference's rate limiting maps to per-trigger admission
  * options (`maxFilesPerTrigger` / `maxOffsetsPerTrigger` /
  * `rowsPerSecond`) — the analog of `allowed_messages` per interval
  * (/root/reference/lib/broadway/options.ex:98-128) enforced at the source
  * instead of a shared counter.
  *
  * The official Broadway connectors (SQS/Kafka/PubSub/RabbitMQ —
  * /root/reference/guides/examples/introduction.md:18-23) map to Spark's
  * built-in kafka source plus file-based sources for queue-style drop
  * directories; `MemoryStream` (testkit) is the DummyProducer analog.
  */
object Sources {

  /** Streaming Parquet/JSON/CSV drop-directory source with per-trigger file
    * admission (the producer demand window).
    */
  def fileStream(
      spark: SparkSession,
      format: String,
      path: String,
      schemaFrom: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None
  ): DataFrame = {
    var r = spark.readStream.format(format)
    schemaFrom.foreach(p => r = r.schema(spark.read.format(format).load(p).schema))
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
    r.load(path)
  }

  /** Reader options for the kafka source — separated from the reader build
    * so the RateLimiting → maxOffsetsPerTrigger mapping is unit-testable
    * without a broker. `allowed_messages` becomes the per-trigger offset
    * cap: the TRIGGER is the admission window here, so `intervalMs` is
    * honored by pairing this with a matching processing-time trigger.
    * Exact wall-clock interval enforcement independent of the trigger
    * cadence needs the shared-RateLimiter admission path (see QueueSource's
    * rate-limited latestOffset).
    */
  def kafkaOptions(
      bootstrapServers: String,
      topics: String,
      rateLimiting: Option[RateLimiting] = None,
      startingOffsets: String = "earliest"
  ): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics,
      "startingOffsets" -> startingOffsets
    )
    base ++ rateLimiting.map(rl => "maxOffsetsPerTrigger" -> rl.allowedMessages.toString)
  }

  /** Kafka source with offset admission per trigger — rate limiting at the
    * source (maxOffsetsPerTrigger ≈ allowed_messages per trigger interval).
    */
  def kafka(
      spark: SparkSession,
      bootstrapServers: String,
      topics: String,
      rateLimiting: Option[RateLimiting] = None,
      startingOffsets: String = "earliest"
  ): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaOptions(bootstrapServers, topics, rateLimiting, startingOffsets))
      .load()

  /** Synthetic rate source (load/soak testing). */
  def rate(spark: SparkSession, rowsPerSecond: Long): DataFrame =
    spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond).load()

  /** The producer `:transformer` hook (options.ex:73-85,
    * producer_stage.ex:267-291): lift raw events into Message envelopes
    * right after the source.
    */
  def transform[A, B](ds: Dataset[A], f: A => Message[B])(implicit
      enc: Encoder[Message[B]]
  ): Dataset[Message[B]] = ds.map(f)

  /** Default transformer: wrap payloads unchanged. */
  def messages[A](ds: Dataset[A])(implicit enc: Encoder[Message[A]]): Dataset[Message[A]] =
    ds.map((a: A) => Message(a))
}
