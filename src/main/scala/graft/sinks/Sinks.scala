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

  /** Compact a parquet directory toward `targetBytes` per output file —
    * the small-file housekeeping pass every micro-batch sink eventually
    * needs: thousands of trigger-sized files turn the NEXT reader's scan
    * into a metadata storm (one footer read + task per tiny file). Sizing
    * reads the actual on-disk bytes from the file index (no data pass),
    * then one shuffle-free coalesce rewrites the data. Returns the output
    * file count. Note coalesce (not repartition): compaction must not pay
    * a full shuffle; the trade-off is partition-count reduction only,
    * which is exactly what compaction is.
    */
  def compactParquet(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      targetBytes: Long = 128L * 1024 * 1024
  ): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val hfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration
    )
    val dst = new org.apache.hadoop.fs.Path(dir)
    // size from the file index — no data pass
    val bytes = hfs.getContentSummary(dst).getLength
    val parts = (bytes.toDouble / targetBytes).ceil.toInt.max(1)
    val tmp = s"$dir.compacting"
    spark.read.parquet(dir).coalesce(parts).write.mode(SaveMode.Overwrite).parquet(tmp)
    // swap: the rewrite is atomic-per-directory (rename), so a crashed
    // compaction leaves the original intact
    hfs.delete(dst, true)
    hfs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    parts
  }
}
