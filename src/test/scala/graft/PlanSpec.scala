package graft

import graft.ops.QueryRegistry

/** Physical-plan shape assertions — the properties that matter at 100 TB
  * (filter pushdown to the scan, column pruning, broadcast dim joins,
  * map-side partial aggregation) must not silently regress.
  */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    QueryRegistry.byName(name).fn(spark, sfDir).queryExecution.executedPlan.toString

  test("q02 pushes predicates into the parquet scan and prunes columns") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"), "no pushdown section in scan")
    assert(p.contains("l_discount"), "discount filter not pushed")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_returnflag"), "reads a column the query never touches")
  }

  test("q04 star join broadcasts every dimension") {
    val p = plan("q04_region_nation_revenue")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, found $broadcasts")
  }

  test("q01 aggregates partially before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_"), "no map-side partial aggregation")
  }

  test("q32 candidate generation is an equi-join on the band signature") {
    val p = plan("q32_minhash_lsh_pairs")
    assert(p.contains("bsig"), "band-signature join key missing from plan")
    assert(
      p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
      "candidate join is not an equi-join"
    )
  }

  test("q32 materializes the shingle/signature pass instead of rescanning") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val df = QueryRegistry.byName("q32_minhash_lsh_pairs").fn(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    val fileScans = opt.collect { case l: LogicalRelation => l }.size
    val cacheScans = opt.collect { case m: InMemoryRelation => m }.size
    // the outermost persisted pass (verified pairs) subsumes the nested
    // shingle/signature caches in the logical view — what must hold is
    // that NOTHING outside a cached pass rescans the source
    assert(cacheScans >= 1, s"expected a cached pass, found $cacheScans:\n$opt")
    assert(fileScans == 0, s"documents still scanned $fileScans times outside the cached pass:\n$opt")
  }

  test("q133 GroupTopK aggregates partially: k-row partials shuffle, not the fact table") {
    val df = QueryRegistry.byName("q133_agg_topk").fn(spark, sfDir)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate; the partial
    // (graft_top_k) stage must appear below the shuffle and the final
    // above it — i.e. two stages naming the aggregate
    val stages = "graft_top_k".r.findAllIn(p).size
    assert(
      p.contains("ObjectHashAggregate") && stages >= 2,
      s"expected partial+final graft_top_k ObjectHashAggregate stages:\n$p"
    )
    // and no rank window anywhere — the point of the aggregate form
    assert(!p.contains("Window"), s"rank window crept back into the top-k plan:\n$p")
  }

  test("q137 concentration profile: per-source top-100 via GroupTopK, no rank window") {
    val df = QueryRegistry.byName("q137_mass_concentration").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the token-TYPE table is unbounded at scale: its per-source head
    // must come from the fixed-state aggregate (partial+final), never a
    // partition-wide sort or rank window
    val stages = "graft_top_k".r.findAllIn(p).size
    assert(p.contains("ObjectHashAggregate") && stages >= 2,
      s"expected partial+final graft_top_k stages:\n$p")
    assert(!p.contains("Window"), s"rank window over the type table:\n$p")
  }

  test("q42 near-dup has no nested-loop join, no corpus broadcast, narrow dedup") {
    val df = QueryRegistry.byName("q42_embedding_neardup").fn(spark, sfDir)
    df.collect() // finalize AQE so the asserted plan is the executed one
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), s"quadratic nested-loop join in plan:\n$p")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
    // dedup must run AFTER the cosine verification (survivors only, a
    // map-side-combined HashAggregate on the verified rows) — a distinct
    // BEFORE verification would shuffle the near-all-pairs candidate set,
    // the pipeline's widest intermediate at a low gate threshold
    val dedupStages = "HashAggregate\\(keys=\\[vec_a[#0-9L]*, vec_b[#0-9L]*".r.findAllIn(p).size
    assert(dedupStages >= 2, s"expected partial+final survivor dedup:\n$p")
    val aggIdx = p.indexOf("HashAggregate")
    val candJoinIdx = p.lastIndexOf("BroadcastHashJoin")
    assert(aggIdx >= 0 && candJoinIdx > aggIdx,
      s"the dedup aggregate must sit ABOVE the joins (dedup after verify):\n$p")
    assert(!p.contains("FirstEqualBand") && !p.contains("first_equal_band"),
      s"signature payload crept back into the candidate join:\n$p")
  }

  test("q27 top-trigram is map-only: no aggregate, no join, single sort exchange") {
    val df = QueryRegistry.byName("q27_top_trigram").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("HashAggregate") && !p.contains("Join"), s"per-row op regressed to shuffling:\n$p")
  }

  test("q37 contamination checks the corpus against a BROADCAST benchmark gram set") {
    val df = QueryRegistry.byName("q37_contamination").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"benchmark set not broadcast semi-joined:\n$p")
  }

  test("q19 as-of join is one user_id shuffle, no range join") {
    val df = QueryRegistry.byName("q19_asof_join").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of should be union+window, found a join:\n$p")
    // AQE prints the pre-adaptive plan again under "== Initial Plan ==" —
    // count exchanges in the executed (final) section only
    val finalPlan = p.split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(shuffles == 1, s"expected exactly one hash shuffle (user_id), found $shuffles:\n$p")
  }

  test("q35 inverted-index join reuses the persisted gram pass, no cartesian") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val df = QueryRegistry.byName("q35_ngram_jaccard").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case l: LogicalRelation => l }.isEmpty, "documents re-scanned outside the cached pass")
    assert(opt.collect { case m: InMemoryRelation => m }.size >= 2, "gram pass not shared via cache")
  }

  test("q46 IVF probe join is equi on the centroid id with broadcast small sides") {
    val df = QueryRegistry.byName("q46_ivf_ann").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian in plan:\n$p")
    assert(p.contains("BroadcastExchange"), "centroid/probe side not broadcast")
    assert(
      p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
      "cell-membership join is not an equi-join"
    )
  }

  test("q40 broadcasts the query side, not the corpus") {
    val p = plan("q40_cosine_topk")
    assert(p.contains("Broadcast"), "query side not broadcast")
  }

  test("q70 curation composition stays equi-join with pruned scans") {
    val df = QueryRegistry.byName("q70_curation").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
    assert(p.contains("ReadSchema"), "no scan schema section")
    assert(!p.contains("props"), "reads an events/documents column the query never touches")
  }

  /** AQE plan strings repeat the pre-adaptive plan under "== Initial
    * Plan ==" — operator counts must only see the final section.
    */
  private def finalPlan(p: String): String = p.split("== Initial Plan ==")(0)

  test("q78 correlated subqueries decorrelate into brand-keyed aggregates") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val df = QueryRegistry.byName("q78_brand_premium").fn(spark, sfDir)
    df.collect()
    // decorrelation must produce standalone aggregate subtrees joined back,
    // never a per-probe-row re-scan (correlated execution) or a cartesian
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collectWithSubqueries { case a: Aggregate => a }.nonEmpty,
      "no aggregate subtree - subquery not decorrelated")
    assert(opt.collectWithSubqueries { case j: Join => j }.nonEmpty,
      "no join-back of the decorrelated aggregate")
    val scans = opt.collectWithSubqueries { case l: LogicalRelation => l }.size
    assert(scans <= 3, s"expected <=3 part scans (probe + 2 decorrelated aggs), found $scans")
  }

  test("q77 grouping sets run as ONE expanded aggregate, not per-set scans") {
    val df = QueryRegistry.byName("q77_grouping_sets").fn(spark, sfDir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 orders scan for all grouping sets, found $scans")
    assert(p.contains("Expand"), "grouping sets did not compile to an Expand")
    assert(p.contains("partial_"), "no map-side partial aggregation after Expand")
  }

  test("q81 commonness broadcasts the vocabulary lookup") {
    val df = QueryRegistry.byName("q81_commonness").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "vocabulary lookup is not a broadcast join")
    assert(!p.contains("SortMergeJoin"), "corpus token stream shuffled by the frequency lookup")
  }

  test("q82 decorrelated small-lot filter reuses the partkey exchange") {
    val df = QueryRegistry.byName("q82_small_lot_revenue").fn(spark, sfDir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
    // the per-part aggregate and the join-back shuffle on the same key —
    // the build side must reuse the probe's exchange, not re-shuffle
    assert(p.contains("ReusedExchange") || "Exchange hashpartitioning\\(l_partkey".r.findAllIn(p).size <= 2,
      s"stats join re-shuffles the fact table:\n$p")
  }

  test("q83 EXISTS/NOT EXISTS decorrelate to semi + anti joins on the order key") {
    val df = QueryRegistry.byName("q83_returned_no_bulk").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not become an anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
  }

  test("q84 range join is bucketed equi, never a nested loop") {
    val df = QueryRegistry.byName("q84_session_range_join").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join fell back to a quadratic plan:\n$p")
    assert(p.contains("bucket"), "hour-bucket join key missing from plan")
  }

  test("q86 bloom filter prunes the probe scan below the join") {
    val df = QueryRegistry.byName("q86_bloom_prejoin").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom pre-filter missing from the probe side:\n$p")
    // the pre-filter must sit in the lineitem scan stage (before the join),
    // not above it — i.e. a Filter containing might_contain below the join
    val joinIdx = p.indexOf("Join")
    val bloomIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      "bloom filter not below the join in the plan tree (plan prints top-down)")
  }

  test("q91 global rank range-partitions the data; only metadata hits one task") {
    val df = QueryRegistry.byName("q91_global_rank").fn(spark, sfDir)
    val rows = df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("rangepartitioning"), s"no range partitioning in plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"offset join is not broadcast:\n$p")
    // the single-partition window must see per-partition COUNTS (metadata),
    // never the data itself: the window's input carries the cnt column
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0 && p.substring(winIdx).contains("cnt"),
      "offset window does not operate on the per-partition counts")
    // semantic: ranks are exactly 1..n
    val ranks = rows.map(_.getAs[Long]("rank")).sorted
    assert(ranks.head == 1L && ranks.last == ranks.length.toLong,
      s"ranks not contiguous: ${ranks.head}..${ranks.last} over ${ranks.length} rows")
  }

  test("q93 scans the fact table once: global total re-aggregates the cached groups") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val df = QueryRegistry.byName("q93_important_parts").fn(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    val fileScans = opt.collectWithSubqueries { case l: LogicalRelation => l }.size
    val cacheScans = opt.collectWithSubqueries { case m: InMemoryRelation => m }.size
    assert(cacheScans >= 1, s"per-part groups not cached:\n$opt")
    assert(fileScans == 0, s"lineitem scanned $fileScans times outside the cached groups:\n$opt")
  }

  test("q106 window-dedup materializes the window frame once; owner join is an equi-join") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val df = QueryRegistry.byName("q106_window_dedup").fn(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    val cacheScans = opt.collectWithSubqueries { case m: InMemoryRelation => m }.size
    val fileScans = opt.collectWithSubqueries { case l: LogicalRelation => l }.size
    // both the owner aggregate and the join probe read the cached window
    // frame — documents itself is tokenized/exploded exactly once
    assert(cacheScans >= 2, s"window frame not shared via cache:\n$opt")
    assert(fileScans == 0, s"documents re-scanned $fileScans times outside the cache:\n$opt")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q107 cdc-upsert derives all changeset branches from one cached base scan") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val df = QueryRegistry.byName("q107_cdc_upsert").fn(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collectWithSubqueries { case m: InMemoryRelation => m }.size >= 3)
    assert(
      opt.collectWithSubqueries { case l: LogicalRelation => l }.isEmpty,
      s"orders re-scanned outside the cached base:\n$opt"
    )
  }

  test("q112 purge is a broadcast join: the corpus side never shuffles") {
    val df = QueryRegistry.byName("q112_purge_audit").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"deletion list not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"purge join shuffled the corpus:\n$p")
  }

  test("q94 collocation lookups broadcast; corpus never re-shuffles for them") {
    val df = QueryRegistry.byName("q94_collocations").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 2, s"expected >=2 broadcast df-lookup joins, found $broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token-df lookup shuffled the gram stream:\n$p")
  }

  test("q113 incremental admission: bloom prunes incoming grams below the exact semi-join") {
    val df = QueryRegistry.byName("q113_incremental_admission").fn(spark, sfDir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(p.contains("might_contain"), s"bloom pre-filter missing from the incoming side:\n$p")
    // the bloom filter must sit BELOW the exact gram semi-join (plan prints
    // top-down): grams that miss the bloom never enter the join shuffle
    val semiIdx = p.indexOf("LeftSemi")
    val bloomIdx = p.indexOf("might_contain")
    assert(semiIdx >= 0, s"no semi join in plan:\n$p")
    assert(bloomIdx > semiIdx, "bloom filter not below the semi join in the plan tree")
  }

  test("q114 semdedup: the pair search is an equi-join on the cluster id") {
    val df = QueryRegistry.byName("q114_semdedup").fn(spark, sfDir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    // exactly ONE nested loop — the 4-centroid broadcast assignment pass;
    // the quadratic-looking dup search must key on cent_id instead
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj == 1, s"expected exactly 1 scalar-broadcast loop (centroids), found $bnlj:\n$p")
    assert(
      p.split("\n").exists(l => l.contains("Join") && !l.contains("NestedLoop") && l.contains("cent_id")),
      s"dup-pair join is not keyed on cent_id:\n$p"
    )
  }

  test("q115 vocab growth aggregates first-seen partially before the token shuffle") {
    val p = finalPlan(plan("q115_vocab_growth"))
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"no map-side partial min on the token aggregate:\n$p")
    // the running-sum window must sit over the bucket rollup (metadata),
    // never the exploded corpus: its input carries the new_types count
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0 && p.substring(winIdx).contains("new_types"),
      "cumulative window does not operate on the bucket rollup")
  }

  test("q116 column profile reads the corpus once (multi-distinct via Expand, no join)") {
    val p = finalPlan(plan("q116_column_profile"))
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 file scan, found $scans:\n$p")
    assert(p.contains("Expand"), s"multi-distinct aggregate did not plan an Expand:\n$p")
    assert(!p.contains("Join"), s"profile pass must not join:\n$p")
  }

  test("q117 epoch drift is one conditional-aggregation scan, no self-join") {
    val p = finalPlan(plan("q117_epoch_drift"))
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 file scan, found $scans:\n$p")
    assert(!p.contains("Join"), s"drift compare must not self-join:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial sum"),
      s"no map-side partial aggregation:\n$p")
  }

  test("q119 skew report: p99 is range-partitioned; no global rank window") {
    val df = QueryRegistry.byName("q119_skew_report").fn(spark, sfDir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    // the per-key count table is unbounded at scale: its global p99 rank
    // must come from repartitionByRange + per-partition offsets (the q135
    // trick), never a single-task `row_number() OVER (ORDER BY ...)`
    assert(p.contains("rangepartitioning"),
      s"expected range-partitioned rank recovery:\n$p")
    // the only Window allowed is the 32-row pid-offset prefix sum
    val winIdx = p.indexOf("Window")
    assert(winIdx < 0 || p.substring(winIdx).contains("pid"),
      s"a global rank window over the key table crept back:\n$p")
  }

  test("q121 outlier audit: per-flag ranks are range-partitioned, no corpus-sorting window") {
    val df = QueryRegistry.byName("q121_price_outliers").fn(spark, sfDir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    // 3 return flags → a Window.partitionBy(flag) would sort the whole
    // fact table in 3 tasks; the rank must instead be recovered from
    // repartitionByRange + per-partition offsets
    assert(p.contains("rangepartitioning"), s"expected range-partitioned rank recovery:\n$p")
    // any Window present may only touch the (pid, flag) metadata frame
    val winIdx = p.indexOf("Window")
    assert(winIdx < 0 || p.substring(winIdx).contains("pid"),
      s"a per-flag rank window over the fact table crept back:\n$p")
  }

  test("q148 join fanout never joins fact rows: both inputs pre-aggregate to counts") {
    val p = finalPlan(plan("q148_join_fanout"))
    // at test scale the count tables broadcast; at 100 TB AQE picks SMJ —
    // either way it must be an EQUI join whose inputs are aggregates
    val joinIdx = Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
      .map(p.indexOf).max
    assert(joinIdx >= 0, s"expected an equi count-join:\n$p")
    // the join's inputs must both be per-key count aggregates — the whole
    // point is predicting the fact join's size WITHOUT paying its width
    assert("HashAggregate".r.findAllIn(p.substring(joinIdx)).size >= 2,
      s"join inputs are not pre-aggregated per-key counts:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q149 histogram plans two aggregates and no sort over fact rows") {
    val df = QueryRegistry.byName("q149_value_histogram").fn(spark, sfDir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    // bin assignment is map-only onto a 20-row hash aggregate; the only
    // Sort permitted is the final 20-row bin ordering, never the fact scan
    val sortIdx = p.indexOf("Sort ")
    if (sortIdx >= 0) {
      val below = p.substring(sortIdx)
      assert(below.contains("HashAggregate"),
        s"the sort must sit above the 20-row bin aggregate, not the fact scan:\n$p")
    }
    assert(p.contains("HashAggregate"), s"bin rollup must be a hash aggregate:\n$p")
    assert(!p.contains("Window"), s"no window belongs in a histogram:\n$p")
  }

  test("q152 embedding drift is one conditional pass: no self-join, no window") {
    val df = QueryRegistry.byName("q152_embedding_drift").fn(spark, sfDir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    // both epochs aggregate out of ONE corpus pass (the q117 shape) — an
    // epoch self-join or a rank window would re-shuffle the exploded dims
    assert(!p.contains("Join"), s"epoch comparison regressed to a self-join:\n$p")
    assert(!p.contains("Window"), s"no window belongs in the drift rollup:\n$p")
    assert(p.contains("partial_sum"), s"dim aggregate lost map-side combine:\n$p")
  }

  test("q120 fk audit pre-aggregates both sides before ONE full-outer join") {
    val p = finalPlan(plan("q120_fk_audit"))
    assert(p.contains("FullOuter"), s"no full-outer join:\n$p")
    // both join inputs are aggregates (per-key counts), so the join's
    // width is |keys|, not |facts|
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge full outer:\n$p")
    val below = p.substring(joinIdx)
    assert("HashAggregate".r.findAllIn(below).size >= 2,
      s"join inputs are not pre-aggregated:\n$p")
  }

  test("q213 sole-blame decorrelates to one semi- and one anti-join, no re-scan loop") {
    val p = finalPlan(plan("q213_sole_blame"))
    assert(p.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not become an anti join:\n$p")
    assert(
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"correlated subqueries degenerated to a nested loop:\n$p"
    )
  }

  test("q217 IVM joins two aggregates — the merge is delta-sized, never fact-sized") {
    val p = finalPlan(plan("q217_ivm_counts"))
    assert(p.contains("FullOuter"), s"no full-outer merge:\n$p")
    val joinIdx = math.max(p.indexOf("SortMergeJoin"), p.indexOf("ShuffledHashJoin"))
    assert(joinIdx >= 0, s"expected a shuffled full outer:\n$p")
    val below = p.substring(joinIdx)
    assert(
      "HashAggregate".r.findAllIn(below).size >= 2,
      s"join inputs are not pre-aggregated views:\n$p"
    )
  }

  test("registry-wide: unpartitioned windows only ever see metadata-sized input") {
    // `WindowExec` with no partition spec moves its whole input to ONE
    // task — acceptable ONLY for metadata frames (range-partition offset
    // tables, TakeOrdered presentation ranks: tens of rows), never for
    // anything corpus- or keyspace-sized. Walks every registered query's
    // EXECUTED plan (through AQE query stages, reused exchanges, and
    // cached subplans) and bounds each unpartitioned window's actual
    // input row count.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val MaxMetadataRows = 1000
    def unpartitionedWindows(p: SparkPlan): Seq[WindowExec] = {
      val buf = scala.collection.mutable.ArrayBuffer[WindowExec]()
      def walk(n: SparkPlan): Unit = {
        n match {
          case w: WindowExec if w.partitionSpec.isEmpty => buf += w
          case _                                        => ()
        }
        n.children.foreach(walk)
        n.subqueries.foreach(walk)
        n match {
          case a: AdaptiveSparkPlanExec  => walk(a.executedPlan)
          case q: QueryStageExec         => walk(q.plan)
          case r: ReusedExchangeExec     => walk(r.child)
          case c: InMemoryTableScanExec  => walk(c.relation.cachedPlan)
          case _                         => ()
        }
      }
      walk(p)
      buf.toSeq
    }
    QueryRegistry.all.foreach { q =>
      val df = q.fn(spark, sfDir)
      df.collect()
      unpartitionedWindows(df.queryExecution.executedPlan).foreach { w =>
        val rows = w.child.executeTake(MaxMetadataRows + 1).length
        assert(
          rows <= MaxMetadataRows,
          s"${q.name}: an unpartitioned window reads >$MaxMetadataRows rows " +
            s"(single-task sort of non-metadata input):\n$w"
        )
      }
      graft.ops.Caches.invalidate()
    }
  }

  test("registry-wide: no cartesian products; nested-loop joins only for scalar broadcasts") {
    // BNLJ is legitimate ONLY as "broadcast a literally-tiny side (≤10
    // query vectors / centroids / a 1-row global total) against the
    // corpus" — a map-side loop, linear in the corpus. Any OTHER nested
    // loop (or any cartesian) is quadratic-at-scale and fails here.
    val scalarBroadcastCross = Set(
      "q40_cosine_topk", // 5 query vectors
      "q45_hybrid_search", // 1 query vector
      "q46_ivf_ann", // 8 centroids / 3 probes
      "q48_kmeans_refine", // 8 centroid (sum, cnt) pairs
      "q49_mmr_rerank", // 3 query vectors
      "q90_quantized_topk", // 5 query vectors
      "q93_important_parts", // 1-row global total
      "q94_collocations", // 1-row doc-count total
      "q95_label_centroids", // ≤10 label centroids
      "q108_kmeans_fp_init", // ≤4 chosen seeds
      "q110_temperature_mix", // 1-row weight-normalization total
      "q114_semdedup", // 4 broadcast centroids (assignment pass)
      "q123_epoch_plan", // 1-row weight-normalization total
      "q140_pq_recall", // 3 broadcast query vectors (exact-distance side)
      "q141_dsir_weights", // 1-row global token total × 64-row bucket stats
      "q166_class_separability", // ≤10 label-centroid metadata rows × same, label_a < label_b pair join
      "q172_token_mass_quantiles", // 2-row quantile-target frame broadcast against the stamped corpus
      "q173_ks_length_drift", // distinct-length metadata grid broadcast against |sources| rows
      "q176_chi2_independence", // 1-row grand-total broadcast against the cell table
      "q179_benford", // 1-row grand-total broadcast against the 9-row digit histogram
      "q184_hard_negatives", // 5 anchor vectors broadcast, label-disequality condition
      "q186_ablation_manifest", // 1-row global stats broadcast against |sources| rows
      "q187_recency_decay", // 1-row newest-day anchor broadcast against the fact scan
      "q189_dup_affinity", // two 1-row stats frames crossed
      "q191_lexical_embedding_consistency", // dup-stats × ctrl-stats, both 1-row
      "q209_hybrid_rrf", // 1 query-vector row broadcast against the embedding scan
      "q221_hll_overlap", // |sources| sketch metadata rows, src_a < src_b pair join
      "q222_rolling_distinct", // |days| calendar rows range-joined to daily sketches/user-days
      "q205_multiprobe_recall", // 5 anchor vectors broadcast (exact top-10 ground-truth side)
      "q208_ivf_recall_curve", // 8 centroids + 3 anchors broadcast (assignment + ground truth)
      "q228_dow_seasonality", // 1-row grand-total broadcast against the 7-row weekday profile
      "q229_budget_fill", // 1-row token-budget scalar broadcast against the stamped corpus
      "q231_tvd_drift", // |types|-row totals × 24-row hour grid (both broadcast metadata)
      "q232_layout_skipping", // 1-row table-count scalar broadcast against rank/file metadata
      "q234_selectivity_audit", // 3-row predicate frame + 1-row count broadcast against scan/histogram
      "q235_zorder_locality", // 1-row min/max-stats scalar broadcast against the key-normalization pass
      "q236_encoding_planner", // three 1-row stats frames (run counts, boundaries, distincts) crossed
      "q237_partial_agg_audit", // 1-row max-orderkey scalar broadcast against the fact scan
      "q238_join_strategy_planner", // 1-row fact-bytes scalar crossed with 6 dim-stats rows
      "q239_partition_file_planner", // 1-row max-orderkey scalar broadcast against the fact scan
      "q240_bucket_count_planner" // 1-row bucket-plan scalar broadcast against the fact scan
    )
    QueryRegistry.all.foreach { q =>
      val p = q.fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a CartesianProduct")
      if (!scalarBroadcastCross(q.name))
        assert(
          !p.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans a BroadcastNestedLoopJoin outside the scalar-broadcast whitelist"
        )
    }
  }

  test("q01 whole-stage codegen covers the aggregate") {
    val df = QueryRegistry.byName("q01_pricing_summary").fn(spark, sfDir)
    df.collect() // AQE only materializes codegen stages in the final plan of THIS queryExecution
    val codegen = df.queryExecution.executedPlan.toString
    assert(
      codegen.contains("*(") || codegen.contains("WholeStageCodegen"),
      s"no WholeStageCodegen stage markers in final plan:\n$codegen"
    )
  }

  test("AQE splits a skewed sort-merge join at runtime (the no-salting escape hatch)") {
    // q87 is the EXPLICIT salting path; this pins the implicit one the
    // scale notes lean on — AQE detecting a hot key's oversized shuffle
    // partition and splitting it (skew=true on the SMJ) without any query
    // rewrite. Thresholds are lowered so the 150k-row hot key qualifies
    // at test scale; production uses the defaults.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import org.apache.spark.sql.functions._
      val left = spark
        .range(300000)
        .select(when(col("id") < 250000, 0L).otherwise(col("id")).as("k"), col("id").as("v"))
      val right = spark
        .range(2000)
        .select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // action on THIS DataFrame (count() builds a new QueryExecution and
      // the adaptive plan would stay isFinalPlan=false — the NOTES gotcha)
      // hot key 0: 250k left rows × 1 right row; left tail keys ≥ 250k miss
      assert(joined.collect().length == 250000)
      val p = joined.queryExecution.executedPlan.toString
      assert(
        p.contains("skew=true"),
        s"AQE did not mark the skewed join (no skew=true in final plan):\n${p.take(4000)}"
      )
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
