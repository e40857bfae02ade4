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
  /** How the consumer attaches to Kafka — the three mutually exclusive
    * subscription modes of the Spark Kafka source. `Subscribe` follows a
    * comma-separated topic list (the common case), `SubscribePattern` a
    * topic regex (new matching topics picked up at runtime), `Assign` an
    * explicit partition map (`{"topic":[0,1]}`) for pipelines that pin
    * partitions, e.g. to keep per-partition ordering aligned with an
    * upstream `partition_by`.
    */
  sealed trait KafkaSubscription { def optionKey: String; def optionValue: String }
  final case class Subscribe(topics: String) extends KafkaSubscription {
    val optionKey = "subscribe"; val optionValue = topics
  }
  final case class SubscribePattern(pattern: String) extends KafkaSubscription {
    val optionKey = "subscribePattern"; val optionValue = pattern
  }
  final case class Assign(partitionsJson: String) extends KafkaSubscription {
    val optionKey = "assign"; val optionValue = partitionsJson
  }

  def kafkaOptions(
      bootstrapServers: String,
      subscription: KafkaSubscription,
      rateLimiting: Option[RateLimiting],
      startingOffsets: String,
      failOnDataLoss: Boolean
  ): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      subscription.optionKey -> subscription.optionValue,
      "startingOffsets" -> startingOffsets,
      // true by default — Spark's own fail-loud default, stated
      // explicitly. Records lost at the SOURCE (retention-pruned offsets)
      // never enter the pipeline, so they cannot dead-letter; silently
      // skipping them would violate the "must not silently disappear"
      // ingest contract. Pass false only when a deliberate skip-forward
      // is wanted.
      "failOnDataLoss" -> failOnDataLoss.toString
    )
    base ++ rateLimiting.map(rl => "maxOffsetsPerTrigger" -> rl.allowedMessages.toString)
  }

  /** Topic-list convenience overload (the historical signature). */
  def kafkaOptions(
      bootstrapServers: String,
      topics: String,
      rateLimiting: Option[RateLimiting] = None,
      startingOffsets: String = "earliest"
  ): Map[String, String] =
    kafkaOptions(bootstrapServers, Subscribe(topics), rateLimiting, startingOffsets, failOnDataLoss = true)

  /** Kafka source with offset admission per trigger — rate limiting at the
    * source (maxOffsetsPerTrigger ≈ allowed_messages per trigger interval).
    */
  def kafka(
      spark: SparkSession,
      bootstrapServers: String,
      subscription: KafkaSubscription,
      rateLimiting: Option[RateLimiting] = None,
      startingOffsets: String = "earliest",
      failOnDataLoss: Boolean = true
  ): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaOptions(bootstrapServers, subscription, rateLimiting, startingOffsets, failOnDataLoss))
      .load()

  /** Topic-list convenience overloads (the historical signature — Scala
    * allows default arguments on only ONE overload, so the short arities
    * are spelled out to keep `kafka(spark, servers, topics)` compiling).
    */
  def kafka(
      spark: SparkSession,
      bootstrapServers: String,
      topics: String,
      rateLimiting: Option[RateLimiting],
      startingOffsets: String
  ): DataFrame =
    kafka(spark, bootstrapServers, Subscribe(topics), rateLimiting, startingOffsets)

  def kafka(
      spark: SparkSession,
      bootstrapServers: String,
      topics: String,
      rateLimiting: Option[RateLimiting]
  ): DataFrame =
    kafka(spark, bootstrapServers, Subscribe(topics), rateLimiting)

  def kafka(spark: SparkSession, bootstrapServers: String, topics: String): DataFrame =
    kafka(spark, bootstrapServers, Subscribe(topics))

  /** Synthetic rate source (load/soak testing). */
  def rate(spark: SparkSession, rowsPerSecond: Long): DataFrame =
    spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond).load()

  /** JSONL (one JSON object per line — the training-data interchange
    * format) with corrupt-line containment: a malformed line must not fail
    * a 100 TB ingest NOR silently disappear, it routes to the dead-letter
    * flow (E10) like any other failed message. Implemented as text-read +
    * `from_json` rather than the json datasource's PERMISSIVE mode:
    * `from_json` yields a null struct on parse failure, which filters
    * cleanly (the datasource's `_corrupt_record` column can't be filtered
    * without a cache since Spark 2.3), and the same expression works on
    * `readStream.text` unchanged. Returns (parsed rows, dead letters with
    * the offending raw line).
    */
  def jsonl(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType
  ): (DataFrame, DataFrame) =
    splitJsonl(spark.read.text(path))(schema)

  /** Streaming twin over a text drop-directory. */
  def jsonlStream(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Option[Int] = None
  ): (DataFrame, DataFrame) = {
    var r = spark.readStream.format("text")
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
    splitJsonl(r.load(path))(schema)
  }

  /** Shared parse+route: works on any single-column text frame, batch or
    * streaming. Blank lines are dropped (JSONL padding, not data loss).
    * Corrupt detection uses `columnNameOfCorruptRecord` — a null struct is
    * NOT a reliable signal (`from_json` yields a struct of nulls for
    * partially-parseable lines), the corrupt column is.
    */
  def splitJsonl(lines: DataFrame)(schema: org.apache.spark.sql.types.StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_json, length, trim}
    val corruptCol = "_corrupt_record"
    val withCorrupt = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    val parsed = lines
      .filter(length(trim(col("value"))) > 0)
      .select(
        from_json(col("value"), withCorrupt, Map("columnNameOfCorruptRecord" -> corruptCol)).as("rec"),
        col("value")
      )
    (
      parsed
        .filter(col("rec").isNotNull && col(s"rec.$corruptCol").isNull)
        .select(schema.fieldNames.map(f => col(s"rec.$f")): _*),
      parsed
        .filter(col("rec").isNull || col(s"rec.$corruptCol").isNotNull)
        .select(col("value").as("dead_letter"))
    )
  }

  /** CSV ingest with the same corrupt-line containment contract as
    * `jsonl`: parse headerless CSV lines against an explicit schema,
    * route unparseable lines (type mismatches, truncated rows) to a
    * dead-letter frame instead of silently nulling them. Built on
    * `from_csv` over a text scan — not the csv datasource — so ONE parse
    * expression serves batch and streaming and the dead letters carry the
    * raw offending line (the datasource's `_corrupt_record` needs a cache
    * to be filterable since Spark 2.3).
    */
  def csv(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType
  ): (DataFrame, DataFrame) =
    splitCsv(spark.read.text(path))(schema)

  /** Streaming twin over a text drop-directory. */
  def csvStream(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Option[Int] = None
  ): (DataFrame, DataFrame) = {
    var r = spark.readStream.format("text")
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
    splitCsv(r.load(path))(schema)
  }

  /** Shared CSV parse+route (batch or streaming). PERMISSIVE mode with
    * `columnNameOfCorruptRecord` marks rows whose fields fail the schema's
    * types; blank lines are dropped as padding.
    *
    * Records must be SINGLE-LINE: parsing is line-at-a-time (text scan +
    * `from_csv`), so a quoted field containing an embedded newline is
    * split across lines and each fragment lands in the dead-letter frame
    * even though the multi-line record would be valid CSV to a
    * whole-file parser. This is the price of splittable, offset-addressed
    * ingestion (a 100 TB CSV can only be read in parallel if records
    * never cross line boundaries); feeds with embedded newlines need the
    * csv datasource with `multiLine=true` (one task per file) instead.
    */
  def splitCsv(lines: DataFrame)(schema: org.apache.spark.sql.types.StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_csv, length, trim}
    val corruptCol = "_corrupt_record"
    val withCorrupt = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    val parsed = lines
      .filter(length(trim(col("value"))) > 0)
      .select(
        from_csv(
          col("value"),
          withCorrupt,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)
        ).as("rec"),
        col("value")
      )
    (
      parsed
        .filter(col("rec").isNotNull && col(s"rec.$corruptCol").isNull)
        .select(schema.fieldNames.map(f => col(s"rec.$f")): _*),
      parsed
        .filter(col("rec").isNull || col(s"rec.$corruptCol").isNotNull)
        .select(col("value").as("dead_letter"))
    )
  }

  /** ORC scan — the columnar alternative to parquet with the same
    * pushdown/pruning contract (predicate pushdown + column pruning reach
    * the ORC reader; SourcesSpec asserts the plan). Write side:
    * `df.write.orc(path)` — no wrapper needed.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

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
