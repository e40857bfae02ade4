package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.QueryRegistry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operators live in `graft.ops.QueryRegistry` as (Spark impl, DuckDB
  * oracle SQL) pairs derived from one list so the two maps cannot drift.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the star-join revenue rollup (broadcast dims + shuffle fact join).
    */
  def entry(spark: SparkSession): DataFrame =
    QueryRegistry.byName("q04_region_nation_revenue").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get the weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    QueryRegistry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
