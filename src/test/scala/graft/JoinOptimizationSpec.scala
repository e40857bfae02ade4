package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan}
import org.apache.spark.sql.functions._
import graft.plans.{AsOf, AsOfJoinPlan, Interval, IntervalJoinPlan}

/** [[graft.plans.CustomJoinOptimization]]: predicate pushdown and column
  * pruning through the custom join nodes — the plan-shape guarantees
  * (filters reach the Parquet scan, unused columns leave ReadSchema) AND
  * the soundness boundaries (right-side pushdown through an as-of join
  * would select a different "latest" row, so it must NOT happen).
  */
class JoinOptimizationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def clicksAndViews = {
    val ev = graft.ops.Tables
      .events(spark, sf)
      .filter(col("event_type").isin("view", "click"))
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev
      .filter(col("event_type") === "view")
      .select(
        col("event_id").as("view_id"),
        col("user_id").as("v_user"),
        col("ts").as("vts"),
        col("value").as("view_value")
      )
    (clicks, views)
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    // AdaptiveSparkPlanExec does not expose its inner plan as children, so
    // a plain collect() sees no scans — unwrap it (and nested reused
    // subqueries) explicitly; guard non-emptiness so no assertion is
    // vacuous on a future wrapper change
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          unwrap(a.inputPlan)
        case s: FileSourceScanExec => Seq(s)
        case other                 => other.children.flatMap(unwrap)
      }
    val found = unwrap(df.queryExecution.executedPlan)
    assert(found.nonEmpty, s"no FileSourceScanExec found:\n${df.queryExecution.executedPlan}")
    found
  }

  private def filterAboveCustomJoin(p: LogicalPlan): Boolean = p.exists {
    case LFilter(_, _: AsOfJoinPlan)     => true
    case LFilter(_, _: IntervalJoinPlan) => true
    case _                               => false
  }

  test("as-of join: left-only predicate is pushed below the join into the scan") {
    val (clicks, views) = clicksAndViews
    val joined = AsOf
      .asofJoin(clicks, views, Seq("user_id"), Seq("v_user"), "ts", "vts",
        rightTieBreak = Seq("view_id"))
      .filter(col("user_id") < 100L)
    // plan: no Filter remains above the custom node...
    assert(
      !filterAboveCustomJoin(joined.queryExecution.optimizedPlan),
      s"left-only filter not pushed:\n${joined.queryExecution.optimizedPlan}"
    )
    // ...and the predicate reached the left scan as a data filter (the
    // PushedFilters metadata STRING truncates at maxMetadataStringLength,
    // so assert on the scan's bound dataFilters expressions instead)
    assert(
      scans(joined).exists(_.dataFilters.exists(_.toString.contains("< 100"))),
      s"predicate did not reach the scan's dataFilters:\n${joined.queryExecution.executedPlan}"
    )
    // semantics: identical to pre-filtering the left side by hand
    val expected = AsOf
      .asofJoin(clicks.filter(col("user_id") < 100L), views, Seq("user_id"), Seq("v_user"),
        "ts", "vts", rightTieBreak = Seq("view_id"))
      .collect()
      .map(_.toSeq)
      .toSet
    assert(joined.collect().map(_.toSeq).toSet == expected)
    assert(expected.nonEmpty, "fixture produced no rows — test would be vacuous")
  }

  test("as-of join: right-side predicate is NOT pushed (it would change which row is latest)") {
    import spark.implicits._
    val left = Seq((1L, 30L)).toDF("k", "t")
    val right = Seq((1L, 10L, 0L), (1L, 20L, -1L)).toDF("rk", "rt", "v")
    val joined = AsOf
      .asofJoin(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .filter(col("v") >= 0L)
    // the latest right row at t=30 is (rt=20, v=-1): the filter above the
    // join must reject the match — a pushed-down filter would instead
    // match (rt=10, v=0) and wrongly emit a row
    assert(joined.count() == 0L, s"right-side predicate was unsoundly pushed:\n${joined.queryExecution.optimizedPlan}")
    assert(
      filterAboveCustomJoin(joined.queryExecution.optimizedPlan),
      s"expected the right-side filter to stay above the as-of join:\n${joined.queryExecution.optimizedPlan}"
    )
  }

  test("interval join (inner): predicates on both sides push below the join") {
    import spark.implicits._
    val points = (1L to 50L).map(i => (i % 5, i, i * 2)).toDF("k", "t", "pv")
    val ivals = (1L to 20L).map(i => (i % 5, i, i + 10, i * 3)).toDF("rk", "s", "e", "rv")
    val joined = Interval
      .intervalJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
      .filter(col("pv") > 10L && col("rv") > 6L)
    assert(
      !filterAboveCustomJoin(joined.queryExecution.optimizedPlan),
      s"inner interval-join filters not pushed:\n${joined.queryExecution.optimizedPlan}"
    )
    // inner semantics: pre-filtering the inputs is equivalent
    val expected = Interval
      .intervalJoin(
        points.filter(col("pv") > 10L),
        ivals.filter(col("rv") > 6L),
        Seq("k"), Seq("rk"), "t", "s", "e")
      .collect()
      .map(_.toSeq)
      .toSet
    assert(joined.collect().map(_.toSeq).toSet == expected && expected.nonEmpty)
  }

  test("interval join (outer): right-side predicate stays above the join") {
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("k", "t")
    val ivals = Seq((1L, 1L, 10L, 0L)).toDF("rk", "s", "e", "rv")
    val joined = Interval
      .intervalJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e", outer = true)
      .filter(col("rv") > 0L)
    // the only covering interval has rv=0: filter above the join rejects
    // the row; pushing it below would leave the left point unmatched and
    // null-extend it into the output instead
    assert(joined.count() == 0L, s"outer right-side predicate unsoundly pushed:\n${joined.queryExecution.optimizedPlan}")
  }

  test("interval join (full outer): non-demotable predicates never move through the join") {
    import spark.implicits._
    import graft.plans.IntervalJoinMode
    val points = Seq((1L, 5L, 1L), (1L, 50L, 2L)).toDF("k", "t", "pv")
    val ivals = Seq((1L, 1L, 10L, 0L), (1L, 40L, 60L, 7L)).toDF("rk", "s", "e", "rv")
    // null-TOLERANT left-only predicate (coalesce passes null-extended
    // rows): demotion must not fire, and pushing the predicate below
    // would delete the pv=1 point from the left child, resurfacing its
    // matched interval (rv=0) as a spurious null-extended row — so the
    // filter must stay above a still-FullOuter node
    val leftPred = Interval
      .intervalFullOuterJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
      .filter(coalesce(col("pv"), lit(99L)) > 1L)
    assert(
      leftPred.queryExecution.optimizedPlan.collect { case j: IntervalJoinPlan => j.mode } ==
        Seq(IntervalJoinMode.FullOuter),
      s"null-tolerant predicate demoted the mode:\n${leftPred.queryExecution.optimizedPlan}"
    )
    assert(
      filterAboveCustomJoin(leftPred.queryExecution.optimizedPlan),
      s"left-only predicate moved through a FULL OUTER interval join:\n${leftPred.queryExecution.optimizedPlan}"
    )
    assert(
      leftPred.select(col("pv"), col("rv")).collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                   if (r.isNullAt(1)) -1L else r.getLong(1))).toSet ==
        Set((2L, 7L)), // a wrongly-pushed filter would ADD (-1, 0): the
      // pv=1 point would vanish from the left child and its matched
      // interval (rv=0) would resurface null-extended
      "full-outer left-predicate semantics broken"
    )
    // right-only null-tolerant predicate: selects BOTH the (1, 0) match
    // and every unmatched point's null-extension — if it were pushed into
    // the right child, the rv=7 interval would vanish and pv=2 would
    // null-extend into the output with rv null, which coalesce maps to 0
    // ≠ the correct (2, 7) pairing; must stay above, mode intact
    val rightPred = Interval
      .intervalFullOuterJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
      .filter(coalesce(col("rv"), lit(0L)) === 0L)
    assert(
      rightPred.queryExecution.optimizedPlan.collect { case j: IntervalJoinPlan => j.mode } ==
        Seq(IntervalJoinMode.FullOuter)
    )
    assert(
      filterAboveCustomJoin(rightPred.queryExecution.optimizedPlan),
      s"right-only predicate moved through a FULL OUTER interval join:\n${rightPred.queryExecution.optimizedPlan}"
    )
    assert(
      rightPred.select(col("pv"), col("rv")).collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                   if (r.isNullAt(1)) -1L else r.getLong(1))).toSet ==
        Set((1L, 0L)),
      "full-outer right-predicate semantics broken"
    )
  }

  test("mode demotion: null-intolerant filters strip dead preservation, then push") {
    import spark.implicits._
    import graft.plans.IntervalJoinMode
    val points = Seq((1L, 5L, 1L), (1L, 50L, 2L), (1L, 500L, 3L)).toDF("k", "t", "pv")
    val ivals = Seq((1L, 1L, 10L, 0L), (1L, 40L, 60L, 7L), (1L, 900L, 950L, 9L))
      .toDF("rk", "s", "e", "rv")
    def modesOf(df: DataFrame): Seq[IntervalJoinMode] =
      df.queryExecution.optimizedPlan.collect { case j: IntervalJoinPlan => j.mode }

    // FULL OUTER + left-only null-intolerant conjunct: unmatched-interval
    // rows (null left) can't pass -> Outer, and the Outer rules then PUSH
    // the predicate below the join (no Filter above survives)
    val toOuter = Interval
      .intervalFullOuterJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
      .filter(col("pv") > 1L)
    assert(modesOf(toOuter) == Seq(IntervalJoinMode.Outer), s"got ${modesOf(toOuter)}")
    assert(!filterAboveCustomJoin(toOuter.queryExecution.optimizedPlan),
      s"demoted filter not pushed:\n${toOuter.queryExecution.optimizedPlan}")
    assert(toOuter.select(col("pv"), col("rv")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet ==
      Set((2L, 7L), (3L, -1L)), "FullOuter->Outer semantics broken")

    // FULL OUTER + null-intolerant conjuncts on BOTH sides -> Inner, both pushed
    val toInner = Interval
      .intervalFullOuterJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
      .filter(col("pv") > 1L && col("rv") >= 0L)
    assert(modesOf(toInner) == Seq(IntervalJoinMode.Inner), s"got ${modesOf(toInner)}")
    assert(!filterAboveCustomJoin(toInner.queryExecution.optimizedPlan))
    assert(toInner.select(col("pv"), col("rv")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((2L, 7L)))

    // null-TOLERANT predicates must NOT demote: IS NULL passes the
    // null-extended rows — they are exactly what it selects
    val keepFull = Interval
      .intervalFullOuterJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
      .filter(col("rv").isNull)
    assert(modesOf(keepFull) == Seq(IntervalJoinMode.FullOuter), s"got ${modesOf(keepFull)}")
    assert(keepFull.select(col("pv")).collect().map(_.getLong(0)).toSet == Set(3L),
      "IS NULL over full outer must keep the uncovered point")

    // OUTER + right-only null-intolerant conjunct -> Inner, pushed right
    val outerToInner = Interval
      .intervalJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e", outer = true)
      .filter(col("rv") > 0L)
    assert(modesOf(outerToInner) == Seq(IntervalJoinMode.Inner), s"got ${modesOf(outerToInner)}")
    assert(!filterAboveCustomJoin(outerToInner.queryExecution.optimizedPlan))
    // point 3 (t=500) matches nothing — its outer null-extension dies on
    // rv > 0, which is exactly why the demotion to Inner is sound
    assert(outerToInner.select(col("pv"), col("rv")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((2L, 7L)))

    // as-of OUTER + right-only null-intolerant conjunct -> inner; the
    // filter stays ABOVE (as-of never pushes right predicates — they
    // would change which row is latest) but the dead null-extension goes
    val (clicks, views) = clicksAndViews
    val asofDemoted = AsOf
      .asofJoin(clicks, views, Seq("user_id"), Seq("v_user"), "ts", "vts",
        rightTieBreak = Seq("view_id"), outer = true)
      .filter(col("view_value") >= 0.0)
    val asofOuter = asofDemoted.queryExecution.optimizedPlan.collect {
      case a: AsOfJoinPlan => a.outer
    }
    assert(asofOuter == Seq(false), s"as-of outer not demoted: $asofOuter")
    val asofExpected = AsOf
      .asofJoin(clicks, views, Seq("user_id"), Seq("v_user"), "ts", "vts",
        rightTieBreak = Seq("view_id"), outer = false)
      .filter(col("view_value") >= 0.0)
      .collect().map(_.toSeq).toSet
    assert(asofDemoted.collect().map(_.toSeq).toSet == asofExpected && asofExpected.nonEmpty)
  }

  private def rightChildFilters(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan
      .collect {
        case a: AsOfJoinPlan     => a.right
        case i: IntervalJoinPlan => i.right
      }
      .flatMap(_.collect { case LFilter(c, _) => c.toString })

  test("as-of join: key and upper-time-bound predicates transfer to the right side") {
    val (clicks, views) = clicksAndViews
    // sf0.001 events span 2024-01-01 .. 2024-01-30; mid-month keeps rows
    val cutoff = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    val joined = AsOf
      .asofJoin(clicks, views, Seq("user_id"), Seq("v_user"), "ts", "vts",
        rightTieBreak = Seq("view_id"))
      .filter(col("user_id") < 100L && col("ts") <= lit(cutoff))
    val rf = rightChildFilters(joined)
    assert(
      rf.exists(c => c.contains("v_user") && c.contains("< 100")),
      s"key predicate not transferred to the right child: $rf\n${joined.queryExecution.optimizedPlan}"
    )
    assert(
      rf.exists(_.contains("vts")),
      s"time upper bound not transferred to the right child: $rf\n${joined.queryExecution.optimizedPlan}"
    )
    // soundness baseline: transfers must not change results vs pushing
    // only the left side by hand and leaving the right side untouched
    val expected = AsOf
      .asofJoin(
        clicks.filter(col("user_id") < 100L && col("ts") <= lit(cutoff)),
        views, Seq("user_id"), Seq("v_user"), "ts", "vts",
        rightTieBreak = Seq("view_id"))
      .collect()
      .map(_.toSeq)
      .toSet
    assert(joined.collect().map(_.toSeq).toSet == expected)
    assert(expected.nonEmpty, "fixture produced no rows — test would be vacuous")
  }

  test("BACKWARD as-of: upper time bounds stay on the left; lower bounds transfer") {
    import spark.implicits._
    val pts = (1L to 300L).map(i => (i % 5, i, i * 2)).toDF("k", "t", "pv")
    val nxt = (1L to 300L).map(i => (i % 5, i + 3, i * 3)).toDF("rk", "rt", "rv")
    // a LEFT upper bound above a backward join: matches need rt >= t, so
    // `t <= 50` implies NOTHING that caps rt — a transferred rt <= 50
    // would delete valid next-event matches (e.g. t=50 → next rt=53).
    val upper = AsOf
      .asofNextJoin(pts, nxt, Seq("k"), Seq("rk"), "t", "rt")
      .filter(col("t") <= 50L)
    val upperExpected = AsOf
      .asofNextJoin(pts.filter(col("t") <= 50L), nxt, Seq("k"), Seq("rk"), "t", "rt")
      .collect().map(_.toSeq).toSet
    assert(upper.collect().map(_.toSeq).toSet == upperExpected)
    assert(upperExpected.exists(r => r(4).asInstanceOf[Long] > 50L),
      s"fixture has no boundary-straddling match — transfer bug would be invisible: $upperExpected")
    val upperRf = rightChildFilters(upper)
    assert(!upperRf.exists(_.contains("rt#")) || !upperRf.exists(_.contains("<=")),
      s"an upper bound leaked onto the backward join's right side: $upperRf")
    // ...and a LOWER bound does transfer (matches need rt >= t >= 100)
    val lower = AsOf
      .asofNextJoin(pts, nxt, Seq("k"), Seq("rk"), "t", "rt")
      .filter(col("t") >= 100L)
    val lowerRf = rightChildFilters(lower)
    assert(lowerRf.exists(c => c.contains("rt") && c.contains(">=")),
      s"lower bound not transferred below the backward join: $lowerRf\n${lower.queryExecution.optimizedPlan}")
    val lowerExpected = AsOf
      .asofNextJoin(pts.filter(col("t") >= 100L), nxt, Seq("k"), Seq("rk"), "t", "rt")
      .collect().map(_.toSeq).toSet
    assert(lower.collect().map(_.toSeq).toSet == lowerExpected && lowerExpected.nonEmpty)
  }

  test("interval join: left-time bounds prune the right side's start and end") {
    import spark.implicits._
    val points = (1L to 50L).map(i => (i % 5, i)).toDF("k", "t")
    val ivals = (1L to 20L).map(i => (i % 5, i, i + 10)).toDF("rk", "s", "e")
    val joined = Interval
      .intervalJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
      .filter(col("t") >= 15L && col("t") < 40L)
    val rf = rightChildFilters(joined)
    assert(
      rf.exists(c => c.contains("e#") && (c.contains(">= 15") || c.contains("> 14"))),
      s"lower bound not transferred to the interval end: $rf\n${joined.queryExecution.optimizedPlan}"
    )
    assert(
      rf.exists(c => c.contains("s#") && c.contains("< 40")),
      s"upper bound not transferred to the interval start: $rf\n${joined.queryExecution.optimizedPlan}"
    )
    val expected = Interval
      .intervalJoin(points.filter(col("t") >= 15L && col("t") < 40L), ivals,
        Seq("k"), Seq("rk"), "t", "s", "e")
      .collect()
      .map(_.toSeq)
      .toSet
    assert(joined.collect().map(_.toSeq).toSet == expected && expected.nonEmpty)
  }

  test("randomized differential: filtered custom joins equal driver brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    (1 to 4).foreach { round =>
      // ---- interval join under a mixed filter --------------------------
      val lRows = Seq.fill(200)((rnd.nextInt(8).toLong, rnd.nextInt(100).toLong, rnd.nextInt(50).toLong))
      val rRows = Seq.fill(150) {
        val s = rnd.nextInt(100)
        (rnd.nextInt(8).toLong, s.toLong, (s + rnd.nextInt(20)).toLong, rnd.nextInt(50).toLong)
      }
      val lo = rnd.nextInt(50).toLong
      val hi = (lo + 1 + rnd.nextInt(50)).toLong
      val ij = Interval
        .intervalJoin(lRows.toDF("k", "t", "pv"), rRows.toDF("rk", "s", "e", "rv"),
          Seq("k"), Seq("rk"), "t", "s", "e")
        .filter(col("t") >= lo && col("t") < hi && col("pv") % 3 =!= 0 && col("rv") % 2 === 0)
      val ijExpected = (for {
        (k, t, pv) <- lRows
        (rk, s, e, rv) <- rRows
        if k == rk && s <= t && t <= e && t >= lo && t < hi && pv % 3 != 0 && rv % 2 == 0
      } yield (k, t, pv, rk, s, e, rv)).sorted
      val ijGot = ij.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .toSeq
        .sorted
      assert(ijGot == ijExpected, s"interval differential diverged (round $round, lo=$lo hi=$hi)")

      // ---- as-of join under left predicates + a right predicate --------
      // unique rt per (key) by construction so "latest" needs no tie-break
      val aRight = rRows.zipWithIndex.map { case ((rk, _, _, rv), i) => (rk, (i * 8 + rk).toLong, rv) }
      val cut = rnd.nextInt(1200).toLong
      val aj = AsOf
        .asofJoin(lRows.map { case (k, t, pv) => (k, t * 13, pv) }.toDF("k", "t", "pv"),
          aRight.toDF("rk", "rt", "rv"),
          Seq("k"), Seq("rk"), "t", "rt")
        .filter(col("t") <= cut && col("pv") % 2 === 0L && col("rv") % 3 =!= 1L)
      val ajExpected = (for {
        (k, t0, pv) <- lRows
        t = t0 * 13
        if t <= cut && pv % 2 == 0
        cands = aRight.filter { case (rk, rt, _) => rk == k && rt <= t }
        if cands.nonEmpty
        (rk, rt, rv) = cands.maxBy(_._2)
        if rv % 3 != 1 // right predicate applies to the MATCHED row only
      } yield (k, t, pv, rk, rt, rv)).sorted
      val ajGot = aj.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toSeq
        .sorted
      assert(ajGot == ajExpected, s"as-of differential diverged (round $round, cut=$cut)")
      assert(ijExpected.nonEmpty || ajExpected.nonEmpty, "both fixtures empty — vacuous round")
    }
  }

  test("column pruning: unused right columns leave the scan's read schema") {
    val (clicks, views) = clicksAndViews
    val narrow = AsOf
      .asofJoin(clicks, views, Seq("user_id"), Seq("v_user"), "ts", "vts",
        rightTieBreak = Seq("view_id"))
      .select(col("event_id"), col("view_id"))
    // `view_value` (events.value) is referenced by nothing: after pruning
    // (this rule) + ColumnPruning (Catalyst folds the inserted Project
    // into the scan), NO parquet scan should still read `value`
    val reading = scans(narrow).filter(_.schema.fieldNames.contains("value"))
    assert(
      reading.isEmpty,
      s"unused column still read by ${reading.size} scan(s):\n${narrow.queryExecution.executedPlan}"
    )
    assert(narrow.collect().nonEmpty, "pruned plan must still produce rows")
  }

  test("column pruning composes with outer null-extension") {
    val (clicks, views) = clicksAndViews
    val narrow = AsOf
      .asofJoin(clicks, views, Seq("user_id"), Seq("v_user"), "ts", "vts",
        rightTieBreak = Seq("view_id"), outer = true)
      .select(col("event_id"), col("view_id"))
    val reading = scans(narrow).filter(_.schema.fieldNames.contains("value"))
    assert(reading.isEmpty, s"outer pruning left `value` in ${reading.size} scan(s)")
    val rows = narrow.collect()
    // null-extension must survive the pruned right child (the node's
    // output nullability adjustment, not the child's, carries it)
    assert(rows.exists(_.isNullAt(1)), "expected at least one unmatched (null view_id) click")
    assert(rows.exists(!_.isNullAt(1)), "expected at least one matched click")
  }

  test("interval semi/anti: left predicates push below, transfers prune the right side") {
    import spark.implicits._
    val points = (1L to 200L).map(i => (i % 5, i, i * 2)).toDF("k", "t", "pv")
    // SPARSE width-1 windows so both the covered (semi) and uncovered
    // (anti) populations are nonempty under the test's time slice
    val ivals = (1L to 80L).map(i => (i % 5, i * 3, i * 3 + 1, i * 7)).toDF("rk", "s", "e", "rv")
    Seq(
      () => graft.plans.Interval.intervalSemiJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e"),
      () => graft.plans.Interval.intervalAntiJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
    ).foreach { mk =>
      val joined = mk().filter(col("k") < 3L && col("t") >= 20L && col("t") < 60L)
      val opt = joined.queryExecution.optimizedPlan
      // every conjunct references only left columns (semi/anti expose no
      // others) — all must push below the node...
      assert(!filterAboveCustomJoin(opt), s"semi/anti left filter not pushed:\n$opt")
      // ...and the key + time-bound transfers must land on the right child
      val rf = opt.collect { case i: IntervalJoinPlan => i.right }
        .flatMap(_.collect { case LFilter(c, _) => c.toString })
      assert(rf.exists(c => c.contains("rk") && c.contains("< 3")),
        s"key transfer missing on the right child: $rf\n$opt")
      assert(rf.exists(_.contains("s#")) && rf.exists(_.contains("e#")),
        s"time-bound transfers missing on the right child: $rf\n$opt")
      assert(joined.collect().map(_.toSeq).toSet.nonEmpty, "vacuous fixture")
    }
    // soundness differential: the optimized semi/anti equals pre-filtering
    // the LEFT input by hand with the right side untouched
    val pre = points.filter(col("k") < 3L && col("t") >= 20L && col("t") < 60L)
    val semiOpt = graft.plans.Interval
      .intervalSemiJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
      .filter(col("k") < 3L && col("t") >= 20L && col("t") < 60L)
      .collect().map(_.toSeq).toSet
    val semiPre = graft.plans.Interval
      .intervalSemiJoin(pre, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
      .collect().map(_.toSeq).toSet
    assert(semiOpt == semiPre && semiPre.nonEmpty, "semi pushdown changed results")
    val antiOpt = graft.plans.Interval
      .intervalAntiJoin(points, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
      .filter(col("k") < 3L && col("t") >= 20L && col("t") < 60L)
      .collect().map(_.toSeq).toSet
    val antiPre = graft.plans.Interval
      .intervalAntiJoin(pre, ivals, Seq("k"), Seq("rk"), "t", "s", "e")
      .collect().map(_.toSeq).toSet
    assert(antiOpt == antiPre && antiPre.nonEmpty, "anti pushdown changed results")
  }

  test("stats: custom join nodes report sane sizes, not the product-of-children default") {
    import spark.implicits._
    val pts = (1L to 4000L).map(i => (i % 7, i, i * 2)).toDF("k", "t", "pv")
    val ivs = (1L to 4000L).map(i => (i % 7, i, i + 12, i * 3)).toDF("rk", "s", "e", "rv")

    val aj = AsOf.asofJoin(pts, ivs, Seq("k"), Seq("rk"), "t", "s")
    val aNode = aj.queryExecution.optimizedPlan.collectFirst { case a: AsOfJoinPlan => a }.get
    val aProduct = aNode.left.stats.sizeInBytes * aNode.right.stats.sizeInBytes
    // one output row per left row widened by the right payload: strictly
    // between the left's own size and (a tiny multiple of) the sum —
    // nowhere near the product the default visitor would assign
    assert(aNode.stats.sizeInBytes >= aNode.left.stats.sizeInBytes)
    assert(aNode.stats.sizeInBytes < aProduct / 100,
      s"as-of stats look like the product default: ${aNode.stats.sizeInBytes} vs product $aProduct")
    assert(aNode.maxRows.contains(4000L), s"as-of maxRows: ${aNode.maxRows}")

    val ij = Interval.intervalJoin(pts, ivs, Seq("k"), Seq("rk"), "t", "s", "e")
    val iNode = ij.queryExecution.optimizedPlan.collectFirst { case i: IntervalJoinPlan => i }.get
    val iSum = iNode.left.stats.sizeInBytes + iNode.right.stats.sizeInBytes
    val iProduct = iNode.left.stats.sizeInBytes * iNode.right.stats.sizeInBytes
    // pair-emitting modes: sum × fan-out headroom (default 8), clamped by
    // the product — conservative against dense overlap without recreating
    // the product-default fiction
    assert(iNode.stats.sizeInBytes == (iSum * 8).min(iProduct).max(1),
      s"interval stats: ${iNode.stats.sizeInBytes} (sum=$iSum, product=$iProduct)")
    assert(iNode.stats.sizeInBytes < iProduct / 100,
      s"interval stats look like the product default: ${iNode.stats.sizeInBytes}")
    // the headroom factor is a session knob for known-dense axes
    spark.conf.set(IntervalJoinPlan.StatsFanoutKey, "50")
    try {
      val ij2 = Interval.intervalJoin(pts, ivs, Seq("k"), Seq("rk"), "t", "s", "e")
      val iNode2 =
        ij2.queryExecution.optimizedPlan.collectFirst { case i: IntervalJoinPlan => i }.get
      assert(iNode2.stats.sizeInBytes == (iSum * 50).min(iProduct).max(1),
        s"factor=50 stats: ${iNode2.stats.sizeInBytes}")
    } finally spark.conf.unset(IntervalJoinPlan.StatsFanoutKey)
    // malformed factor fails loud, naming the conf key
    spark.conf.set(IntervalJoinPlan.StatsFanoutKey, "eight")
    try {
      val ex = intercept[IllegalArgumentException] {
        Interval.intervalJoin(pts, ivs, Seq("k"), Seq("rk"), "t", "s", "e")
          .queryExecution.optimizedPlan.stats
      }
      assert(ex.getMessage.contains(IntervalJoinPlan.StatsFanoutKey), ex.getMessage)
    } finally spark.conf.unset(IntervalJoinPlan.StatsFanoutKey)
  }

  test("stats: a parent join over a small as-of result plans as BroadcastHashJoin") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // as-of inputs ~100 KB each: the product default (~10 GB) would bar
    // the as-of output from broadcast forever; the real estimate (~200 KB)
    // sails under the 10 MB threshold
    val pts = (1L to 4000L).map(i => (i % 97, i, i * 2)).toDF("k", "t", "pv")
    val quotes = (1L to 4000L).map(i => (i % 97, i, i * 3)).toDF("rk", "rt", "rv")
    val aj = AsOf.asofJoin(pts, quotes, Seq("k"), Seq("rk"), "t", "rt")
    // big probe side: over the broadcast threshold so IT cannot broadcast
    val probe = spark.range(2L * 1000 * 1000).selectExpr("id", "id % 97 AS pk")
    val joined = probe.join(aj, col("pk") === col("k"))
    val bhj = joined.queryExecution.sparkPlan.collect { case b: BroadcastHashJoinExec => b }
    assert(
      bhj.nonEmpty,
      s"parent join over the as-of result did not broadcast:\n${joined.queryExecution.sparkPlan}"
    )
    val builtAsOf = bhj.exists { b =>
      val built = b.buildSide match {
        case BuildLeft  => b.left
        case BuildRight => b.right
      }
      built.exists(_.isInstanceOf[graft.plans.AsOfJoinExec])
    }
    assert(builtAsOf, s"the as-of side was not the broadcast side:\n${joined.queryExecution.sparkPlan}")
    assert(joined.count() > 0L)
  }

  test("column pruning fires through a residual (unpushable) filter above the join") {
    val (clicks, _) = clicksAndViews
    // views carries an EXTRA column (`view_props` ← events.props) that the
    // query never references; the filter on `view_value` cannot push
    // through an as-of join (it would change which row is latest), so it
    // stays above the node — and without the Filter-aware pruning cases
    // it would also block pruning, leaving `props` in the scan forever
    val views = graft.ops.Tables
      .events(spark, sf)
      .filter(col("event_type") === "view")
      .select(
        col("event_id").as("view_id"),
        col("user_id").as("v_user"),
        col("ts").as("vts"),
        col("value").as("view_value"),
        col("props").as("view_props")
      )
    val narrow = AsOf
      .asofJoin(clicks, views, Seq("user_id"), Seq("v_user"), "ts", "vts",
        rightTieBreak = Seq("view_id"))
      .filter(col("view_value") >= 0.0)
      .select(col("event_id"), col("view_id"))
    assert(
      filterAboveCustomJoin(narrow.queryExecution.optimizedPlan),
      s"fixture invalid: right-side filter should be unpushable\n${narrow.queryExecution.optimizedPlan}"
    )
    // the filter's own column must survive pruning...
    assert(
      scans(narrow).exists(_.schema.fieldNames.contains("value")),
      s"pruning dropped the residual filter's input:\n${narrow.queryExecution.executedPlan}"
    )
    // ...but the unreferenced column must leave every ReadSchema
    val extra = scans(narrow).filter(_.schema.fieldNames.contains("props"))
    assert(
      extra.isEmpty,
      s"residual filter blocked pruning in ${extra.size} scan(s):\n${narrow.queryExecution.executedPlan}"
    )
    assert(narrow.collect().nonEmpty, "pruned+filtered plan must still produce rows")
  }

  test("column pruning: aggregate directly above the join narrows both sides") {
    val (clicks, views) = clicksAndViews
    val agg = AsOf
      .asofJoin(clicks, views, Seq("user_id"), Seq("v_user"), "ts", "vts",
        rightTieBreak = Seq("view_id"))
      .groupBy(col("user_id"))
      .agg(count(col("view_id")).as("n"))
    val reading = scans(agg).filter(_.schema.fieldNames.contains("value"))
    assert(
      reading.isEmpty,
      s"aggregate pruning left `value` in ${reading.size} scan(s):\n${agg.queryExecution.executedPlan}"
    )
    assert(agg.collect().nonEmpty)
  }
}
