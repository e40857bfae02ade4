package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed-table layout — the co-located-join idiom for fact-fact joins
  * at scale (SURVEY §2.9 E11 scale note): write both sides bucketed and
  * sorted by the join key and the sort-merge join needs NO Exchange and
  * NO per-query Sort — the shuffle is paid once at write time and
  * amortized over every subsequent join/aggregation on that key. At
  * 100 TB this is the difference between re-shuffling the fact table per
  * query and a scan-side merge join.
  *
  * Broadway's analog is the static partition dispatch that pins a key to
  * a stage process for its lifetime (`partition_by`,
  * /root/reference/lib/broadway.ex:524-607) — here the "pinning" is the
  * on-disk bucket layout.
  */
object Bucketing {

  /** Write `df` as an external Parquet table bucketed AND sorted by
    * `key` into `buckets` files per partition, registered as `name` at
    * `path`. Callers joining two tables bucketed with the SAME key and
    * bucket count get an exchange-free sort-merge join (guarded by
    * BucketingSpec).
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, name: String, path: String): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)

  /** Hive-style partitioned Parquet layout (`path/col=value/...`): an
    * equality/IN filter on the partition column prunes whole directories
    * at PLANNING time — zero I/O for excluded partitions, the first lever
    * against a 100 TB scan when queries routinely slice on a low-
    * cardinality column (source, date, lang). Complements bucketing:
    * partition on the slice column, bucket within on the join key.
    * PartitionPruningSpec guards that the pruned scan reads only matching
    * partitions (`PartitionFilters` in the scan, partition count drop).
    */
  /** `hotValueSalt` bounds the hot-value failure mode of the small-files
    * fix: repartitioning on the partition column alone lands EVERY row of
    * one value on a single task, so a hot value serializes its write and
    * can OOM/straggle at 100 TB. With salt > 1 each value spreads across
    * up to `salt` writer tasks, keyed by a hash of the ROW CONTENT —
    * deterministic (no rand() in the plan) and, crucially, independent of
    * the incoming layout: a spark_partition_id-derived salt collapses to
    * 1-2 values exactly when the input is already clustered by the
    * partition column (read back from a previous partitionBy write),
    * which is when the spread is needed most. Fully-identical duplicate
    * rows still co-locate (same content hash) — acceptable, duplicates
    * are pathological at this layer. Trades ≤ `salt` files per value for
    * parallelism. `maxRecordsPerFile` > 0 additionally caps row count
    * per emitted file (Spark's own writer option), the knob for bounding
    * file size when row width is known.
    */
  def writePartitioned(
      df: DataFrame,
      partitionCol: String,
      path: String,
      hotValueSalt: Int = 1,
      maxRecordsPerFile: Long = 0L
  ): Unit = {
    // repartition on the partition column first: a naive partitionBy from
    // a hash-distributed frame emits one file per (task × partition value)
    // — the small-files explosion q239_partition_file_planner audits
    // (ingest tasks × values files instead of ceil(bytes/target)). After
    // the shuffle each partition value is owned by one task (or `salt`
    // tasks), so the write produces one (or ≤ salt) file(s) per value.
    require(hotValueSalt >= 1, s"hotValueSalt must be >= 1, got $hotValueSalt")
    import org.apache.spark.sql.functions.{hash, lit, pmod, struct, to_json}
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    // hash() rejects MapType (anywhere in the type tree) since Spark 3.0
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType    => false
      case a: ArrayType  => hashable(a.elementType)
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case _             => true
    }
    val keyed =
      if (hotValueSalt == 1) df.repartition(col(partitionCol))
      else {
        // backtick-quoted df.col so dotted/odd top-level names resolve as
        // literal names, not struct paths
        val hashCols = df.schema.fields
          .filter(f => hashable(f.dataType))
          .map(f => df.col("`" + f.name.replace("`", "``") + "`"))
        val saltKey =
          if (hashCols.nonEmpty) pmod(hash(hashCols: _*), lit(hotValueSalt))
          else {
            // degenerate all-map schema (hash() rejects MapType): hash the
            // JSON rendering instead — still CONTENT-derived, so the salt
            // stays deterministic under partial stage recomputation. A
            // monotonically_increasing_id fallback here would re-key rows
            // after a fetch-failure retry (the id encodes the retry's
            // partition layout — the SPARK-23207 class of duplicated/lost
            // output, which Spark fixed only for round-robin). Like the
            // main path above, fully-identical duplicate rows co-locate
            // (same content hash) — determinism over spread, the
            // documented trade of this layer.
            val allCols = df.schema.fields.toIndexedSeq
              .map(f => df.col("`" + f.name.replace("`", "``") + "`"))
            pmod(hash(to_json(struct(allCols: _*))), lit(hotValueSalt))
          }
        df.repartition(col(partitionCol), saltKey)
      }
    keyed.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)
  }

  /** Range-sorted Parquet layout for row-group skipping: globally sort by
    * `sortCol` before writing so each row group's min/max statistics span
    * a narrow key range, and a pushed-down range/equality predicate lets
    * the Parquet reader skip whole row groups without decoding them —
    * data skipping INSIDE files, one granularity below partition pruning
    * (partition prune → row-group skip → page skip is the 100 TB read
    * path; an unsorted layout leaves every row group spanning the full
    * key range, so identical statistics machinery skips nothing).
    * `rowGroupBytes` caps parquet.block.size so skipping granularity is
    * testable at small scale; production leaves the 128 MB default.
    */
  def writeSorted(df: DataFrame, sortCol: String, path: String, rowGroupBytes: Long = 128L << 20): Unit =
    df.orderBy(sortCol)
      .write
      .mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)

  /** Z-order (Morton-interleaved) layout for TWO-dimensional row-group
    * skipping: `writeSorted` gives narrow min/max statistics on ONE
    * column and shreds every other; interleaving the bits of two 8-bit
    * quantized keys and range-sorting by the interleave makes each row
    * group cover a small RECTANGLE of the (a, b) value space, so a range
    * predicate on EITHER column prunes most groups (the multi-dimensional
    * clustering used by Delta/Iceberg OPTIMIZE ZORDER). Quantization is
    * linear against a one-pass min/max (two driver-held scalars —
    * metadata, not data); skewed columns would use rank quantiles
    * instead, the interleave algebra is unchanged. The z-key is pure
    * integer Column algebra (shift/or/and — codegen'd, map-only) and is
    * dropped before the write: only the payload columns and their
    * now-clustered statistics reach disk.
    */
  def writeZOrder(
      df: DataFrame,
      colA: String,
      colB: String,
      path: String,
      rowGroupBytes: Long = 128L << 20
  ): Unit = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    val r = df
      .agg(
        min(col(colA).cast("double")).as("loA"),
        max(col(colA).cast("double")).as("hiA"),
        min(col(colB).cast("double")).as("loB"),
        max(col(colB).cast("double")).as("hiB")
      )
      .head()
    def q8(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0)
      else
        least(lit(255), floor((c.cast("double") - lit(lo)) * 256.0 / (hi - lo)).cast("int"))
    // spread 8 bits to the even bit positions (standard Morton dilation)
    def spread(c: Column): Column = {
      val x1 = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0f0f))
      val x2 = x1.bitwiseOR(shiftleft(x1, 2)).bitwiseAND(lit(0x3333))
      x2.bitwiseOR(shiftleft(x2, 1)).bitwiseAND(lit(0x5555))
    }
    val z = spread(q8(col(colA), r.getDouble(0), r.getDouble(1)))
      .bitwiseOR(shiftleft(spread(q8(col(colB), r.getDouble(2), r.getDouble(3))), 1))
    df.withColumn("__zorder", z)
      .orderBy(col("__zorder"))
      .drop("__zorder")
      .write
      .mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }
}
