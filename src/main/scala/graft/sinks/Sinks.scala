package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._

/** Sink helpers (the `handle_batch` → storage leg of SURVEY §2.3/§2.6):
  * routed per-batcher writers and an idempotent-by-batchId pattern that
  * turns Structured Streaming's at-least-once side effects into effective
  * exactly-once (re-running a failed micro-batch overwrites its own
  * directory instead of duplicating output — the delivery stance discussed
  * at broadway.ex:28-30 mapped to Spark's recovery model).
  */
object Sinks {

  /** Write one micro-batch idempotently: output lands under
    * `<root>/batch_id=<id>/`, so a retried batch replaces itself.
    */
  def idempotentParquet(df: DataFrame, root: String, batchId: Long): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/batch_id=$batchId")

  /** Split a routed micro-batch by its `batcher` column and write each
    * route to its own directory — the multi-sink fan-out of put_batcher
    * (one pass per route; routes are few and the filter is pushed down).
    */
  def routedParquet(
      df: DataFrame,
      routes: Seq[String],
      rootFor: String => String,
      batchId: Long
  ): Unit =
    routes.foreach { route =>
      idempotentParquet(df.filter(col("batcher") === route), rootFor(route), batchId)
    }

  /** Dead-letter writer: failure rows with reason, for replay/audit. */
  def deadLetterParquet(failed: DataFrame, root: String, batchId: Long): Unit =
    idempotentParquet(failed, root, batchId)
}
