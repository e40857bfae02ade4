package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{Bucketing, Tables}

/** Bucketed co-located joins: both fact tables written bucketed+sorted on
  * the join key must sort-merge join with NO Exchange and NO Sort in the
  * plan — the write-once/join-many layout that replaces a per-query fact
  * shuffle at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("joins on co-bucketed tables have no exchange and no per-query sort") {
    val tmp = Files.createTempDirectory("graft-bucketed").toFile.getAbsolutePath
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path: broadcast would hide the exchange question
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_quantity")),
        "l_orderkey", 4, "graft_li_bkt", s"$tmp/li"
      )
      Bucketing.writeBucketed(
        Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_totalprice")),
        "o_orderkey", 4, "graft_ord_bkt", s"$tmp/ord"
      )
      val joined = spark.table("graft_li_bkt")
        .join(spark.table("graft_ord_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("price"))
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("price"))
      assert(
        joined.orderBy("l_orderkey").collect().toSeq ==
          expected.orderBy("l_orderkey").collect().toSeq,
        "bucketed join result diverges from the plain join"
      )
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      val joinSection = p.split("HashAggregate")(0)
      assert(!p.contains("Exchange hashpartitioning(l_orderkey"),
        s"join re-shuffled the bucketed left side:\n$p")
      assert(!p.contains("Exchange hashpartitioning(o_orderkey"),
        s"join re-shuffled the bucketed right side:\n$p")
      assert(!joinSection.contains("Sort "),
        s"join re-sorted a bucket-sorted side:\n$p")
      // the bucket layout also serves the downstream aggregation: grouping
      // on the bucket key needs no further exchange either
      assert("Exchange".r.findAllIn(p).isEmpty,
        s"aggregation on the bucket key still exchanged:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_li_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bkt")
    }
  }

  test("partitioned layout prunes non-matching partitions at planning time") {
    val dir = Files.createTempDirectory("graft_part").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "n_chars")
    Bucketing.writePartitioned(docs, "source", dir)
    val read = spark.read.parquet(dir).filter(col("source") === "src3")
    val rows = read.collect()
    // semantic: exactly the src3 slice survives
    val expected = docs.filter(col("source") === "src3").count()
    assert(rows.length.toLong == expected && rows.forall(_.getAs[String]("source") == "src3"))
    // plan: the source predicate is a PARTITION filter (directory pruning,
    // zero I/O on other partitions), not a post-scan data filter
    val p = read.queryExecution.executedPlan.toString
    val pfIdx = p.indexOf("PartitionFilters:")
    assert(pfIdx >= 0, s"no PartitionFilters section in scan:\n$p")
    val pf = p.substring(pfIdx, p.indexOf(']', pfIdx) max (pfIdx + 1))
    assert(pf.contains("src3"), s"source predicate not pushed to partition pruning:\n$p")
  }
}
