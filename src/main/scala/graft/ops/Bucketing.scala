package graft.ops

import org.apache.spark.sql.DataFrame

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
  def writePartitioned(df: DataFrame, partitionCol: String, path: String): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

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
}
