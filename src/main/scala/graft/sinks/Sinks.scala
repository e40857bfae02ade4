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
    val tmp = new org.apache.hadoop.fs.Path(s"$dir.compacting")
    val old = new org.apache.hadoop.fs.Path(s"$dir.precompact")
    // Crash recovery BEFORE anything else (self-review r12: the original
    // delete-then-rename swap had a window where the data existed only
    // under `.compacting`, contradicting the crash-safety claim): a
    // missing dst with `.precompact` present is a crash between the two
    // renames — restore the original, deterministic and loss-free. A
    // stale `.compacting`/`.precompact` beside an intact dst is a crash
    // before/after the swap respectively — drop the leftover.
    if (!hfs.exists(dst) && hfs.exists(old)) hfs.rename(old, dst)
    if (hfs.exists(tmp)) hfs.delete(tmp, true)
    if (hfs.exists(old)) hfs.delete(old, true)
    // size from the file index — no data pass
    val bytes = hfs.getContentSummary(dst).getLength
    val parts = (bytes.toDouble / targetBytes).ceil.toInt.max(1)
    spark.read.parquet(dir).coalesce(parts).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // two-rename swap: the unprotected window is only BETWEEN the
    // renames (metadata ops, no data rewrite inside it) and the recovery
    // preamble above heals it; every other crash point leaves dst intact
    hfs.rename(dst, old)
    hfs.rename(tmp, dst)
    hfs.delete(old, true)
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
    * A re-publish of an already-manifested batch is a no-op.
    *
    * Concurrency: each ATTEMPT writes to its own staging directory
    * (`data/batch-<id>-<attempt>`), so an overlapping zombie attempt of
    * the same batch can never clobber the files a just-renamed manifest
    * points at — the loser of the manifest rename deletes only its own
    * staging directory. A crashed attempt leaves an unreferenced staging
    * dir behind (invisible to readers); [[vacuumUnmanifested]] reclaims
    * them while no writer is active.
    */
  def manifestedParquet(df: DataFrame, root: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val hfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration
    )
    val manifest = new org.apache.hadoop.fs.Path(s"$root/_manifests/batch-$batchId")
    if (hfs.exists(manifest)) return // already published — replay is a no-op
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$root/data/batch-$batchId-$attempt"
    df.write.mode(SaveMode.Overwrite).parquet(dataDir)
    val files = hfs
      .globStatus(new org.apache.hadoop.fs.Path(s"$dataDir/*.parquet"))
      .map(_.getPath.toString)
      .sorted
    val tmp = new org.apache.hadoop.fs.Path(s"$root/_manifests/.batch-$batchId-$attempt.tmp")
    val out = hfs.create(tmp, true)
    try out.write(files.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    hfs.mkdirs(manifest.getParent)
    val published =
      !hfs.exists(manifest) && hfs.rename(tmp, manifest)
    if (!published) {
      // lost the publish race (another attempt of the same batch renamed
      // first): the winner's manifest names the winner's OWN staging files,
      // untouched by us — drop our staging dir and temp manifest entirely
      hfs.delete(tmp, false)
      hfs.delete(new org.apache.hadoop.fs.Path(dataDir), true)
      ()
    }
  }

  /** Delete staging directories no manifest references — the garbage a
    * crashed or race-losing attempt leaves behind. Safe only while no
    * writer is active on `root` (an in-flight attempt's staging dir is
    * indistinguishable from a crashed one's). Returns the reclaimed count.
    */
  def vacuumUnmanifested(spark: org.apache.spark.sql.SparkSession, root: String): Int = {
    val hfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration
    )
    val dataRoot = new org.apache.hadoop.fs.Path(s"$root/data")
    if (!hfs.exists(dataRoot)) return 0
    val referenced: Set[String] = manifestFiles(hfs, root)
      .map(f => new org.apache.hadoop.fs.Path(f).getParent.toUri.getPath)
      .toSet
    val orphans = hfs
      .listStatus(dataRoot)
      .filter(_.isDirectory)
      .filterNot(st => referenced.contains(st.getPath.toUri.getPath))
    orphans.foreach(st => hfs.delete(st.getPath, true))
    orphans.length
  }

  /** Read everything published through [[manifestedParquet]]: the union of
    * the files every manifest names. Unmanifested data (a crashed or
    * in-flight batch) is invisible by construction. The manifest listing
    * is driver-side metadata (one small file per batch); the data read is
    * a normal parquet scan over the named files. Pass `schema` so a reader
    * that starts BEFORE the first publish gets an empty frame with the
    * right columns instead of the column-less `emptyDataFrame` (without
    * it, `select`/`filter` on the pre-first-batch result would fail to
    * resolve).
    */
  def readManifested(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None
  ): DataFrame = {
    val hfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration
    )
    val files = manifestFiles(hfs, root)
    if (files.nonEmpty) spark.read.parquet(files: _*)
    else
      schema match {
        case Some(sc) =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
        case None => spark.emptyDataFrame
      }
  }

  /** Every data file the manifests under `root` name (driver-side metadata). */
  private def manifestFiles(
      hfs: org.apache.hadoop.fs.FileSystem,
      root: String
  ): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/_manifests")
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
  }
}
