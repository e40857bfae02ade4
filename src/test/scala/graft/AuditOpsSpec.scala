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

  test("globalRanks excludes NULL values so rank ties can't diverge from the oracle") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = Seq(
      (1L, Option(30L)),
      (2L, Option.empty[Long]), // Spark sorts NULLs first, DuckDB last — must be excluded
      (3L, Option(10L)),
      (4L, Option(20L)),
      (5L, Option.empty[Long])
    ).toDF("doc_id", "v")
    val got = graft.ops.QualityOps
      .globalRanks(base, "v", "rk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(got == Map(3L -> 1L, 4L -> 2L, 1L -> 3L), s"got $got")
  }

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

  test("winnowing density sits inside the theoretical [2/w·10⁴, 10⁴] band") {
    run("q175_winnowing").foreach { r =>
      val d = r.getAs[Long]("density_bp")
      assert(d >= 2000L && d <= 10000L, s"density $d outside [2000, 10000]")
      assert(r.getAs[Long]("total_fps") <= r.getAs[Long]("total_grams"))
    }
  }

  test("chi-square statistic is non-negative with a consistent dof") {
    val Array(r) = run("q176_chi2_independence")
    assert(r.getAs[Long]("chi2_x10000") >= 0L)
    assert(
      r.getAs[Long]("dof") ==
        (r.getAs[Long]("n_sources") - 1L) * (r.getAs[Long]("n_langs") - 1L)
    )
  }

  test("dup weights conserve cluster mass and only downweight clustered docs") {
    val rows = run("q177_dup_weights")
    val docs = rows.map(_.getAs[Long]("docs")).sum
    val mass = rows.map(_.getAs[Long]("weight_mass_bp")).sum
    assert(mass <= docs * 10000L, "weight mass exceeds one-per-doc")
    val clustered = graft.ops.DedupOps.dedupClusters(spark, sfDir, 0.8).count()
    assert(rows.map(_.getAs[Long]("downweighted_docs")).sum == clustered)
  }

  test("k-anonymity violations are monotone in k and never exceed the table") {
    val rows = run("q178_k_anonymity").sortBy(_.getAs[Int]("k"))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("violating_classes") <= b.getAs[Long]("violating_classes"))
        assert(a.getAs[Long]("exposed_rows") <= b.getAs[Long]("exposed_rows"))
      case _ =>
    }
    rows.foreach(r => assert(r.getAs[Long]("exposed_rows") <= r.getAs[Long]("rows_total")))
  }

  test("benford shares sum to one corpus and deviations are consistent") {
    val rows = run("q179_benford")
    val bpSum = rows.map(_.getAs[Long]("obs_bp")).sum
    assert(bpSum > 10000L - 9 && bpSum <= 10000L, s"obs_bp sum $bpSum") // floor loss < 1bp/digit
    rows.foreach { r =>
      assert(
        r.getAs[Long]("dev_bp") ==
          math.abs(r.getAs[Long]("obs_bp") - r.getAs[Long]("benford_bp"))
      )
    }
  }

  test("spearman rho and kappa live in [-10⁴, 10⁴] over full-corpus counts") {
    val Array(sp) = run("q182_spearman")
    val docCount = graft.ops.Tables.documents(spark, sfDir).count()
    assert(sp.getAs[Long]("n") == docCount)
    val rho = sp.getAs[Long]("rho_bp")
    assert(rho >= -10000L && rho <= 10000L, s"rho $rho")
    val Array(kp) = run("q183_rater_kappa")
    val n = Seq("n11", "n10", "n01", "n00").map(kp.getAs[Long]).sum
    assert(n == docCount)
    val kappa = kp.getAs[Long]("kappa_bp")
    assert(kappa >= -10000L && kappa <= 10000L, s"kappa $kappa")
    val po = kp.getAs[Long]("po_bp")
    assert(po >= 0L && po <= 10000L)
  }

  test("winnow pairs verify at threshold with canonical orientation") {
    run("q181_winnow_pairs").foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.5)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("hard negatives are wrong-label, ranked 1..k with non-increasing scores") {
    val byAnchor = run("q184_hard_negatives").groupBy(_.getAs[Long]("query_id"))
    byAnchor.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
      sorted.foreach(r => assert(r.getAs[Int]("n_label") != r.getAs[Int]("q_label")))
      val scores = sorted.map(_.getAs[Long]("qscore")).toSeq
      assert(scores == scores.sorted.reverse, s"scores not non-increasing: $scores")
    }
  }

  test("CUSUM excursions are non-negative and bounded by the per-doc deviation budget") {
    run("q188_cusum_drift").foreach { r =>
      val docs = r.getAs[Long]("docs")
      val up = r.getAs[Long]("max_up_cusum")
      val down = r.getAs[Long]("max_down_cusum")
      assert(up >= 0L && down >= 0L)
      // each doc deviates at most ±5000 from the 5000 target, so no
      // excursion (a sum of consecutive deviations) can exceed docs·5000
      assert(up <= docs * 5000L && down <= docs * 5000L)
      assert(math.abs(r.getAs[Long]("net_drift")) <= docs * 5000L)
    }
  }

  test("dup-affinity shares are consistent and the lift reproduces from raw counts") {
    val Array(r) = run("q189_dup_affinity")
    assert(r.getAs[Long]("same_pairs") <= r.getAs[Long]("pairs"))
    val obs = r.getAs[Long]("obs_same_bp")
    val exp = r.getAs[Long]("expected_same_bp")
    assert(obs >= 0L && obs <= 10000L && exp >= 0L && exp <= 10000L)
    if (r.getAs[Long]("pairs") > 0 && exp > 0)
      assert(r.getAs[Long]("lift_bp") == obs * 10000L / exp)
  }

  test("ablation manifest conserves token mass and shares") {
    val rows = run("q186_ablation_manifest")
    val total = rows.map(_.getAs[Long]("tokens")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("tokens_without") == total - r.getAs[Long]("tokens"))
      assert(r.getAs[Long]("max_shift_bp") >= 0L, "removing a source cannot shrink another's share")
    }
    val shareSum = rows.map(_.getAs[Long]("share_bp")).sum
    assert(shareSum > 10000L - rows.length && shareSum <= 10000L)
  }

  test("recency decay is bounded by full-weight mass and dominated by the newest day") {
    run("q187_recency_decay").foreach { r =>
      val full = r.getAs[Long]("events") * (1L << 30)
      assert(r.getAs[Long]("decayed_mass") <= full)
      assert(r.getAs[Long]("decayed_mass") >= r.getAs[Long]("newest_day_events") * (1L << 30))
    }
  }

  test("lexical-embedding consistency means are bounded cosines over real pair counts") {
    val Array(r) = run("q191_lexical_embedding_consistency")
    for (c <- Seq("dup_mean_cos_bp", "ctrl_mean_cos_bp")) {
      val v = r.getAs[Long](c)
      assert(v >= -10000L && v <= 10000L, s"$c = $v outside cosine bounds")
    }
    assert(r.getAs[Long]("ctrl_pairs") > 0L)
    assert(
      r.getAs[Long]("separation_bp") ==
        r.getAs[Long]("dup_mean_cos_bp") - r.getAs[Long]("ctrl_mean_cos_bp")
    )
  }

  test("syndication flow decomposes q151's cross-source pair mass with direction") {
    val directed = run("q190_syndication_flow")
    val undirected = run("q151_source_overlap")
      .filter(r => r.getAs[String]("source_lo") != r.getAs[String]("source_hi"))
      .map(r => (r.getAs[String]("source_lo"), r.getAs[String]("source_hi")) -> r.getAs[Long]("pairs"))
      .toMap
    val regrouped = directed
      .map { r =>
        val (a, b) = (r.getAs[String]("origin_source"), r.getAs[String]("derived_source"))
        (if (a < b) (a, b) else (b, a)) -> r.getAs[Long]("pairs")
      }
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(regrouped == undirected, "directed flow does not re-aggregate to the unordered matrix")
  }

  test("dup-gap buckets are true power-of-two ranges partitioning the pair set") {
    val rows = run("q192_dup_gap_histogram")
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val lo = 1L << (b - 1)
      val hi = (1L << b) - 1L
      assert(r.getAs[Long]("min_gap") >= lo && r.getAs[Long]("max_gap") <= hi,
        s"bucket $b holds gaps outside [$lo, $hi]")
      assert(r.getAs[Long]("same_source_pairs") <= r.getAs[Long]("pairs"))
    }
    val total = graft.ops.DedupOps.lshPairs(spark, sfDir, 0.8).count()
    assert(rows.map(_.getAs[Long]("pairs")).sum == total, "histogram does not partition the pairs")
  }

  test("gate funnel is monotone: each stage passes a subset of the previous") {
    run("q193_gate_funnel").foreach { r =>
      val d = r.getAs[Long]("docs")
      val l = r.getAs[Long]("pass_length")
      val s2 = r.getAs[Long]("pass_stopword")
      val c = r.getAs[Long]("pass_classifier")
      assert(d >= l && l >= s2 && s2 >= c && c >= 0L, s"non-monotone funnel: $d/$l/$s2/$c")
      assert(r.getAs[Long]("survival_bp") == c * 10000L / d)
    }
  }

  test("attribution never exceeds purchases and lags are non-negative") {
    val rows = run("q195_attribution")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("attributed") <= r.getAs[Long]("purchases"))
      assert(r.getAs[Long]("lag_seconds") >= 0L)
      assert(r.getAs[Long]("attributed_rev_cents") >= 0L)
    }
    assert(rows.map(_.getAs[Long]("attributed")).sum > 0L, "no purchase ever attributed — vacuous")
  }

  test("joint decile grid partitions the corpus with balanced marginals") {
    val rows = run("q196_joint_deciles")
    val total = graft.ops.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("docs")).sum == total)
    for (axis <- Seq("len_decile", "q_decile")) {
      val marginal = rows.groupBy(_.getAs[Long](axis)).map { case (_, rs) => rs.map(_.getAs[Long]("docs")).sum }
      assert(marginal.max - marginal.min <= 1L, s"$axis marginal imbalance: $marginal")
    }
  }

  test("session concurrency is a valid step function: non-negative, closing to zero") {
    val rows = run("q197_concurrency") // already ordered by hour_bucket
    rows.foreach(r => assert(r.getAs[Long]("concurrent") >= 0L, "negative concurrency"))
    assert(rows.last.getAs[Long]("concurrent") == 0L, "sessions did not all close")
    val opened = rows.map(_.getAs[Long]("delta")).filter(_ > 0).sum
    assert(opened > 0L, "no sessions opened — vacuous")
    assert(rows.map(_.getAs[Long]("delta")).sum == 0L, "unbalanced open/close deltas")
  }

  test("tokenizer fertility is at least one subword per word everywhere") {
    run("q185_tokenizer_fertility").foreach { r =>
      assert(r.getAs[Long]("fertility_centi") >= 100L)
      assert(r.getAs[Long]("subwords") >= r.getAs[Long]("words"))
    }
  }

  test("RRF fusion scores recompute from the reported ranks and every doc was ranked") {
    val rows = run("q209_hybrid_rrf")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lex, sem) = (r.getAs[Long]("lex_rank"), r.getAs[Long]("sem_rank"))
      // a fused doc must come from at least one system's top-20
      assert(lex > 0L || sem > 0L)
      assert(lex <= 20L && sem <= 20L)
      val expect =
        (if (lex > 0L) 1000000L / (60L + lex) else 0L) +
          (if (sem > 0L) 1000000L / (60L + sem) else 0L)
      assert(r.getAs[Long]("rrf") == expect, s"rrf mismatch on $r")
    }
    // fused order is non-increasing in rrf
    val rrfs = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("rrf"))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
  }

  test("source dispersion equals the brute-force mean pairwise squared distance") {
    import org.apache.spark.sql.functions._
    // definitional check of the centroid identity on the real vectors
    val e = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .select(
        col("vec_id"),
        expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000d) as bigint))")
          .as("qv")
      )
      .join(
        spark.read
          .parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").as("vec_id"), col("source")),
        "vec_id"
      )
      .collect()
      .map(r => (r.getAs[String]("source"), r.getSeq[Long](1).toArray))
    val expected = e
      .groupBy(_._1)
      .collect { case (src, vs) if vs.length >= 2 =>
        val pairSum = (for {
          i <- vs.indices; j <- vs.indices if i != j
        } yield vs(i)._2.zip(vs(j)._2).map { case (a, b) => val d = a - b; d * d }.sum).sum
        src -> pairSum / (vs.length.toLong * (vs.length - 1))
      }
    val got = run("q210_source_dispersion")
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("dispersion"))
      .toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("HLL pair overlap never exceeds either vocabulary and stays within its bound") {
    val rows = run("q221_hll_overlap")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (va, vb, inter) =
        (r.getAs[Long]("vocab_a"), r.getAs[Long]("vocab_b"), r.getAs[Long]("exact_overlap"))
      assert(inter >= 1L && inter <= math.min(va, vb), s"overlap out of range: $r")
      assert(r.getAs[Boolean]("within_bound"), s"sketch estimate broke its bound: $r")
    }
  }

  test("funnel SLA counts are nested: within-deadline <= converted <= clickers") {
    val rows = run("q223_funnel_deadline")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c, cv, cv1) =
        (r.getAs[Long]("clickers"), r.getAs[Long]("converted"), r.getAs[Long]("converted_1h"))
      assert(cv1 <= cv && cv <= c, s"funnel nesting violated: $r")
      assert(r.getAs[Long]("sla_bp") >= 0L && r.getAs[Long]("sla_bp") <= 10000L)
    }
  }
}
