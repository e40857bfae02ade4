package graft

import org.apache.spark.sql.Row
import graft.ops.QueryRegistry
import graft.streaming.MixStream

/** Mathematical invariants of the audit/sampling operator family
  * (q153–q165): properties that must hold on ANY input, checked on the
  * real sf0.001 tables (value-level correctness vs the DuckDB oracle is
  * gated separately at sf0.01 by tools/check.py).
  */
class AuditOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String): Array[Row] =
    QueryRegistry.byName(name).fn(spark, sfDir).collect()

  test("TVD is zero on identical mixes, scale-invariant, and maximal on disjoint ones") {
    val a = Map("x" -> 3L, "y" -> 7L)
    assert(MixStream.tvdBp(a, a) == 0L)
    // counts at a different SCALE but the same shares → still zero
    assert(MixStream.tvdBp(a, a.map { case (k, v) => k -> v * 1000L }) == 0L)
    // disjoint supports → exactly 10^4 basis points
    assert(MixStream.tvdBp(Map("x" -> 5L), Map("y" -> 9L)) == 10000L)
    // bounds + empty-side convention
    assert(MixStream.tvdBp(Map("x" -> 1L), Map("x" -> 2L, "y" -> 2L)) == 5000L)
    assert(MixStream.tvdBp(Map.empty, a) == 0L)
    val b = Map("x" -> 9L, "z" -> 1L)
    val t = MixStream.tvdBp(a, b)
    assert(t > 0L && t < 10000L)
  }

  test("equi-depth deciles differ by at most one row and partition the input exactly") {
    for (name <- Seq("q156_equidepth_hist", "q162_score_calibration")) {
      val rows = run(name)
      assert(rows.length == 10, s"$name: expected 10 deciles")
      val cntField =
        if (rows.head.schema.fieldNames.contains("cnt")) "cnt" else "n_docs"
      val cnts = rows.map(_.getAs[Long](cntField))
      // the (rk-1)*10 div n binning puts either floor(n/10) or ceil(n/10)
      // rows in every bin
      assert(cnts.max - cnts.min <= 1L, s"$name: bins $cnts not equi-depth")
    }
  }

  test("equi-depth bins are ordered and non-overlapping on their value edges") {
    val rows = run("q156_equidepth_hist")
    val edges = rows.map(r => (r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents")))
    edges.foreach { case (lo, hi) => assert(lo <= hi) }
    edges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "decile edges overlap")
      case _                         => ()
    }
  }

  test("triangle census satisfies the wedge bound and closes cliques") {
    val r = run("q153_dup_graph_triangles").head
    val wedges = r.getAs[Long]("wedges")
    val tri = r.getAs[Long]("triangles")
    // every triangle closes exactly 3 wedges — 3·tri can never exceed wedges
    assert(3L * tri <= wedges)
    assert(r.getAs[Long]("global_cc_bp") <= 10000L)
  }

  test("Gini of per-user activity sits in [0, 10^4) and the raw fraction reproduces it") {
    val r = run("q161_activity_gini").head
    val bp = r.getAs[Long]("gini_bp")
    assert(bp >= 0L && bp < 10000L)
    assert(r.getAs[Long]("gini_num") * 10000L / r.getAs[Long]("gini_den") == bp)
  }

  test("stratified sample apportions the exact budget and never over-fills a stratum") {
    val rows = run("q165_stratified_sample")
    val byLang = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toLong).toMap
    val counts = graft.ops.Tables
      .documents(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("lang"))
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val total = counts.values.sum
    // budget K=100 > sf0.001's corpus → every stratum is fully taken and
    // the sample is the whole corpus; at K <= N the total is exactly K
    val expectedTotal = math.min(100L, total)
    assert(rows.length.toLong == expectedTotal || total > 100L && rows.length == 100)
    byLang.foreach { case (lang, n) =>
      assert(n <= counts(lang), s"stratum $lang over-filled: $n > ${counts(lang)}")
    }
    // ranks are contiguous from 1 within each stratum
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val rks = rs.map(_.getAs[Long]("rk")).sorted
      assert(rks.zipWithIndex.forall { case (rk, i) => rk == i + 1L })
    }
  }

  test("similarity histogram buckets sit at or above the 0.8 gate") {
    run("q163_pair_similarity_hist").foreach { r =>
      val b = r.getAs[Long]("bucket")
      // jaccard >= 0.8 → round(j·10⁴) div 250 >= 31 (7750-7999 rounds up
      // into 8000 only at the boundary; the gate itself floors at 32 for
      // any pair whose 4-decimal jaccard is >= 0.8000)
      assert(b >= 32L && b <= 40L, s"bucket $b outside the gated range")
      assert(r.getAs[Long]("lo_bp") == b * 250L)
      assert(r.getAs[Long]("hi_bp") == b * 250L + 249L)
    }
  }

  test("cluster evidence coverage never exceeds full and edges land in clusters") {
    run("q167_cluster_evidence").foreach { r =>
      val implied = r.getAs[Long]("implied_pairs")
      val verified = r.getAs[Long]("verified_pairs")
      assert(r.getAs[Long]("sz") >= 2L, "a cluster needs at least two members")
      assert(verified >= 1L, "a cluster with no verified edge cannot exist")
      assert(verified <= implied, "more verified pairs than member pairs")
      assert(r.getAs[Long]("coverage_bp") <= 10000L)
    }
  }

  test("derivative rates are bounded and counted docs never exceed the source's docs") {
    run("q168_derivative_rate").foreach { r =>
      assert(r.getAs[Long]("derivative_docs") <= r.getAs[Long]("docs"))
      assert(r.getAs[Long]("derivative_bp") <= 10000L)
    }
  }

  test("token-mass quantiles cross their targets exactly and grow with q") {
    val rows = run("q172_token_mass_quantiles").sortBy(_.getAs[Long]("pq"))
    assert(rows.map(_.getAs[Long]("pq")).toSeq == Seq(50L, 90L))
    rows.foreach { r =>
      // first-crossing contract: cumulative mass reaches the target AT
      // this row and was below it on the previous row
      assert(r.getAs[Long]("mass_cum") >= r.getAs[Long]("mass_target"))
      assert(
        r.getAs[Long]("mass_cum") - r.getAs[Long]("threshold_tokens") <
          r.getAs[Long]("mass_target")
      )
    }
    val Array(p50, p90) = rows
    assert(p50.getAs[Long]("threshold_tokens") <= p90.getAs[Long]("threshold_tokens"))
    assert(p50.getAs[Long]("docs_cum") <= p90.getAs[Long]("docs_cum"))
  }

  test("per-type Fano factors are non-negative with consistent raw fractions") {
    run("q164_burstiness").foreach { r =>
      assert(r.getAs[Long]("var_num") >= 0L)
      assert(r.getAs[Long]("var_den") > 0L)
      assert(
        r.getAs[Long]("var_num") * 100L / r.getAs[Long]("var_den") ==
          r.getAs[Long]("fano_centi")
      )
    }
  }
}
