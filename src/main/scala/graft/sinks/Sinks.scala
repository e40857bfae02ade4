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

  /** Publish a micro-batch ATOMICALLY: data files land under an unlisted
    * staging path, then one manifest rename makes the whole batch visible.
    * `idempotentParquet` makes replays safe for a reader that arrives
    * AFTER recovery; this closes the remaining window — a reader
    * concurrent with the write (or with a crash mid-write) must never see
    * a partial batch. Readers go through [[readManifested]], which lists
    * manifests and reads exactly the files each names; a crashed batch
    * (data written, manifest never renamed) is invisible, and its replay
    * overwrites the same staging directory then publishes the same
    * manifest path — effectively-once end to end on top of Spark's
    * at-least-once recovery, with no lock and no reader coordination.
    * A re-publish of an already-manifested batch is a no-op (the replayed
    * data is byte-equivalent by determinism of the micro-batch).
    */
  def manifestedParquet(df: DataFrame, root: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val hfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration
    )
    val manifest = new org.apache.hadoop.fs.Path(s"$root/_manifests/batch-$batchId")
    if (hfs.exists(manifest)) return // already published — replay is a no-op
    val dataDir = s"$root/data/batch_id=$batchId"
    df.write.mode(SaveMode.Overwrite).parquet(dataDir)
    val files = hfs
      .globStatus(new org.apache.hadoop.fs.Path(s"$dataDir/*.parquet"))
      .map(_.getPath.toString)
      .sorted
    val tmp = new org.apache.hadoop.fs.Path(s"$root/_manifests/.batch-$batchId.tmp")
    val out = hfs.create(tmp, true)
    try out.write(files.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    hfs.mkdirs(manifest.getParent)
    if (!hfs.rename(tmp, manifest)) {
      // lost a publish race (another attempt of the same batch won): the
      // surviving manifest names equivalent files — drop ours
      hfs.delete(tmp, false)
      ()
    }
  }

  /** Read everything published through [[manifestedParquet]]: the union of
    * the files every manifest names. Unmanifested data (a crashed or
    * in-flight batch) is invisible by construction. The manifest listing
    * is driver-side metadata (one small file per batch); the data read is
    * a normal parquet scan over the named files.
    */
  def readManifested(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame = {
    val hfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration
    )
    val dir = new org.apache.hadoop.fs.Path(s"$root/_manifests")
    val files: Seq[String] =
      if (!hfs.exists(dir)) Seq.empty
      else
        hfs
          .listStatus(dir)
          .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
          .toSeq
          .flatMap { st =>
            val in = hfs.open(st.getPath)
            try
              scala.io.Source
                .fromInputStream(in, "UTF-8")
                .getLines()
                .filter(_.nonEmpty)
                .toVector
            finally in.close()
          }
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }
}
