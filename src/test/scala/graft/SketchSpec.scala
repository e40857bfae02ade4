package graft

import org.apache.spark.sql.functions._
import graft.ops.Tables

/** Sketch operators (SURVEY §4 "TypedImperativeAggregate only if we add
  * HLL-style sketches"): Spark's built-in HyperLogLog++ and quantile-sketch
  * aggregates ARE the 100 TB path for distinct counts and percentiles —
  * fixed-size state, map-side combinable, mergeable across partitions —
  * where the exact forms (q10's distinct, q73's exact percentiles) pay a
  * full shuffle of the key set. Sketches are approximate, so they are NOT
  * cross-engine hash-matchable (DuckDB's approx_count_distinct uses a
  * different HLL seed/width); the correctness contract pinned here is the
  * error bound against the exact answer on real data.
  */
class SketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) stays within its rsd contract on real keys") {
    val li = Tables.lineitem(spark, sfDir)
    val r = li
      .agg(
        countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.05).as("approx")
      )
      .first()
    val exact = r.getLong(0)
    val approx = r.getLong(1)
    val relErr = math.abs(approx - exact).toDouble / exact
    // 0.05 is one standard deviation of the estimate; 3σ is the sane gate
    assert(relErr < 0.15, s"HLL relative error $relErr (exact=$exact approx=$approx)")
  }

  test("HLL sketches merge across groups like partial aggregates") {
    val li = Tables.lineitem(spark, sfDir)
    // grouped sketches vs one global sketch: grouping must not break the
    // estimate (this is what map-side partial merge relies on)
    val global = li.agg(approx_count_distinct(col("l_partkey"), 0.05)).first().getLong(0)
    val exact = li.agg(countDistinct(col("l_partkey"))).first().getLong(0)
    val perFlag = li
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.05).as("d"))
      .collect()
    // every group's distinct parts ≤ global distinct parts (within 3σ slack)
    perFlag.foreach { row =>
      assert(row.getLong(1) <= (exact * 1.15).toLong, s"group sketch exceeds corpus: $row")
    }
    assert(math.abs(global - exact).toDouble / exact < 0.15)
  }

  test("approx_percentile lands within rank tolerance of the exact quantile") {
    val li = Tables.lineitem(spark, sfDir).select(col("l_extendedprice").as("v"))
    val n = li.count()
    val accuracy = 1000 // rank error ≤ n / accuracy
    val Array(approx50, approx95) = li
      .agg(percentile_approx(col("v"), array(lit(0.5), lit(0.95)), lit(accuracy)).as("p"))
      .first()
      .getSeq[Double](0)
      .toArray
    def rankOf(value: Double): Long = li.filter(col("v") <= value).count()
    val tol = (n / accuracy) + 1
    assert(math.abs(rankOf(approx50) - n / 2) <= tol, s"p50 rank off by >$tol")
    assert(math.abs(rankOf(approx95) - (n * 0.95).toLong) <= tol, s"p95 rank off by >$tol")
  }
}
