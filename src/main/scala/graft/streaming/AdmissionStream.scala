package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of q113's incremental-ingest admission — the loop where
  * HISTORY GROWS: each micro-batch of documents gates against the archive
  * PLUS everything admitted in earlier batches, and the admitted batch's
  * grams append to that archive, so a near-copy arriving later is
  * rejected by a document admitted minutes before. `foreachBatch` is the
  * honest production shape here: admission is a join against a mutable
  * archive side, which no stateful-operator formulation expresses (the
  * join key is the gram; the verdict aggregates per document — two
  * different keys).
  *
  * Exactly-once under replay: both writes are hive-partitioned by
  * `ingest_batch` with dynamic partition overwrite, so a replayed batch
  * OVERWRITES its own partition instead of double-appending, and the
  * history read filters to `ingest_batch < batchId` so a replay never
  * sees its own partial output (which would make every doc self-hit and
  * flip its verdict).
  *
  * At 100 TB the per-batch cost is the increment's grams joined against
  * the gram-keyed archive: q113's bloom pre-filter applies verbatim
  * inside the batch function (build once over the archive, refresh every
  * N batches); it is omitted here only because the archive side of the
  * spec corpus is small.
  */
object AdmissionStream {

  /** Distinct 8-gram rows (doc_id, g) of a documents frame. */
  def gramsOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      explode(graft.ops.DedupOps.ngrams(graft.ops.TextOps.tokens(col("text")), 8)).as("g")
    )

  /** Winnowing-fingerprint rows (doc_id, g): the MOSS-selected ~2/(w+1)
    * subset of the 4-gram hashes (position-free component, as strings so
    * either extractor feeds the same history schema). Same admission
    * semantics at ~1/3 the history size — the guarantee (any shared
    * 8-token run shares a fingerprint) matches gramsOf's 8-gram witness
    * exactly, which is what makes the swap sound.
    */
  def winnowFeaturesOf(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        explode(
          transform(
            graft.functions.TextFunctions
              .winnowKeys(graft.ops.TextOps.tokens(col("text")), 4, 5),
            x => shiftright(x, 24).cast("string")
          )
        ).as("g")
      )
      .distinct()

  /** Seed the history dir from the static archive. */
  def seedHistory(
      docs: DataFrame,
      historyDir: String,
      features: DataFrame => DataFrame = gramsOf
  ): Unit =
    features(docs)
      .select(col("g"))
      .withColumn("ingest_batch", lit(-1L))
      .write
      .partitionBy("ingest_batch")
      .mode("append")
      .parquet(historyDir)

  /** Start the admission loop. Verdicts (doc_id, n_grams, hit_grams,
    * admitted, ingest_batch) land in `verdictDir`; admitted documents'
    * grams append to `historyDir`. A document with fewer than 8 tokens
    * has no grams and is admitted (no duplication evidence) — the batch
    * q113 simply omits such docs from its report.
    */
  def start(
      spark: SparkSession,
      docsStream: DataFrame,
      historyDir: String,
      verdictDir: String,
      features: DataFrame => DataFrame = gramsOf
  ): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val g = features(batch).persist()
        val hist = spark.read
          .parquet(historyDir)
          .filter(col("ingest_batch") < batchId)
          .select(col("g"))
          .distinct()
        val totals = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
        val hits = g
          .join(hist, Seq("g"), "left_semi")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("hit_grams"))
        val verdicts = batch
          .select(col("doc_id"))
          .join(totals, Seq("doc_id"), "left")
          .join(hits, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("n_grams"), lit(0L)).as("n_grams"),
            coalesce(col("hit_grams"), lit(0L)).as("hit_grams")
          )
          .withColumn("admitted", col("hit_grams") * 2 < col("n_grams") || col("n_grams") === 0L)
          .persist()
        verdicts.count() // materialize BEFORE the history partition mutates
        verdicts
          .withColumn("ingest_batch", lit(batchId))
          .write
          .partitionBy("ingest_batch")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(verdictDir)
        g.join(verdicts.filter(col("admitted")).select(col("doc_id")), Seq("doc_id"))
          .select(col("g"))
          .withColumn("ingest_batch", lit(batchId))
          .write
          .partitionBy("ingest_batch")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(historyDir)
        g.unpersist()
        verdicts.unpersist()
        ()
      }
      .start()
}
