package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  And,
  Ascending,
  Attribute,
  AttributeReference,
  Descending,
  EqualTo,
  Expression,
  GreaterThan,
  GreaterThanOrEqual,
  If,
  LessThan,
  LessThanOrEqual,
  Literal,
  NullsFirst,
  NullsLast,
  PredicateHelper,
  RowNumber,
  RowOrdering,
  SortOrder,
  WindowExpression
}
import org.apache.spark.sql.catalyst.plans.{ExistenceJoin, FullOuter, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Rewrites eligible equi-key + range inner joins to the native sweep-line
  * [[IntervalJoinPlan]] — plain SQL/DataFrame users get the interval exec
  * without calling the `Interval.intervalJoin` API:
  *
  * {{{
  *   SELECT ... FROM events e JOIN sessions s
  *   ON e.user_id = s.user_id AND e.ts BETWEEN s.start_ts AND s.end_ts
  * }}}
  *
  * Spark plans this shape as a sort-merge join on the equi keys ONLY: the
  * whole key group buffers and the range conjuncts filter after the match
  * — points × intervals work and a group-sized buffer on a hot key. The
  * sweep-line exec holds only the ACTIVE intervals (memory = overlap
  * degree) and does O(input + output) work, measured 20× on a hot key
  * with a gap that grows quadratically in group size.
  *
  * LeftSemi/LeftAnti joins of the same shape — the `EXISTS` /
  * `NOT EXISTS (SELECT … WHERE k = rk AND t BETWEEN s AND e)` idioms —
  * rewrite to the node's existence modes ([[IntervalJoinMode.Semi]] /
  * [[IntervalJoinMode.Anti]]): same sweep, emit each covered (or
  * uncovered) point once, left columns only.
  *
  * Semantics preserved exactly — the rewrite fires only when every piece
  * matches the exec's contract:
  *  - INNER / LeftOuter / RightOuter / LeftSemi / LeftAnti / Existence
  *    join, non-streaming, all condition conjuncts deterministic.
  *    Outer shapes rewrite only when the POINTS are the preserved side
  *    (LeftOuter: points left; RightOuter: points right, sides swap);
  *    Existence is the `WHERE p OR EXISTS(…)` flag-producing shape.
  *    Residual-conjunct admissibility is mode-specific — each mode
  *    branch states its rule and why;
  *  - ≥ 1 `EqualTo` conjunct strictly across the sides (never
  *    null-safe `<=>`: the exec, like SQL equality, never matches NULLs);
  *  - one side expression bracketed INCLUSIVELY by two expressions of the
  *    other side (`rs <= lt AND lt <= re`, i.e. `BETWEEN`); strict `<`/`>`
  *    bounds don't rewrite (the exec is inclusive-only);
  *  - the time/bound type is orderable and non-floating (floating
  *    comparisons vs orderings agree in Spark's NaN convention, but the
  *    conservative guard costs nothing real — time axes are temporal or
  *    integral);
  *  - leftover conjuncts become a `Filter` above the node (sound above an
  *    inner join; `CustomJoinOptimization` then pushes what it can).
  *
  * Cost guard: if either input's estimated size fits the broadcast
  * threshold, the join is left for Spark's BroadcastHashJoin — a
  * broadcast probe of a tiny interval table beats co-partitioning both
  * sides. Disable entirely with `spark.graft.rangeJoinRewrite.enabled`.
  *
  * When the points are on the LEFT the node is used directly; when on the
  * RIGHT, sides swap and a `Project` restores the original column order.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.rangeJoinRewrite.enabled"

  private def orderableNonFloating(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => false
    case other                  => RowOrdering.isOrderable(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    // lenient parse: this runs on EVERY query's optimization, so a typo'd
    // conf value must disable the rewrite, not fail the session's queries
    if (!conf.getConfString(EnabledKey, "true").trim.equalsIgnoreCase("true")) plan
    else
      plan.transform {
        // an explicit join-strategy hint (BROADCAST/MERGE/SHUFFLE_HASH/…)
        // outranks stats in Spark's planner, so it must outrank this
        // rewrite too — a user who hinted a side knows something the size
        // estimate doesn't, and the session-wide kill switch is too blunt
        // an escape for one query. LeftSemi/LeftAnti are the EXISTS /
        // NOT EXISTS containment idioms ("keep points covered by some
        // interval" / "purge points inside any tombstone window") — the
        // same hot-key SMJ buffering, fixed by the same sweep-line node
        // in its existence modes. (NOT IN arrives as a null-aware OR
        // condition whose disjunct structure yields no equi conjunct, so
        // it falls through untouched — only NOT EXISTS shapes rewrite.)
        case j @ Join(
              _,
              _,
              Inner | LeftSemi | LeftAnti | LeftOuter | RightOuter | FullOuter |
              _: ExistenceJoin,
              Some(cond),
              hint)
            if !j.isStreaming &&
              hint.leftHint.forall(_.strategy.isEmpty) &&
              hint.rightHint.forall(_.strategy.isEmpty) =>
          rewrite(j, cond).getOrElse(j)

        // the hand-written "latest/next within a horizon" SQL idiom:
        //   SELECT … FROM (SELECT …, row_number() OVER (PARTITION BY <left
        //   cols> ORDER BY rt DESC[, tb DESC…]) rk FROM l [LEFT] JOIN r ON
        //   keys AND rt <= t AND rt >= t - h) WHERE rk = 1
        // Spark plans the inner query as a full pair-emitting join feeding
        // a window over EVERY match; the as-of merge reduces each left row
        // to its single best match FIRST (O(1) carried state), leaving the
        // kept window a ≤|left|-row arbiter instead of an |matches|-row
        // sort. See rewriteWindowTop1 for the exact soundness argument.
        case f @ Filter(_, _: Window) =>
          rewriteWindowTop1(f).getOrElse(f)
      }

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val (left, right) = (j.left, j.right)
    // cost guard: leave broadcast-sized sides to BroadcastHashJoin — but
    // only when JoinSelection can actually BUILD that side for this join
    // type (its own canBuildBroadcastRight/Left rules): the right builds
    // for Inner/LeftOuter/LeftSemi/LeftAnti/Existence, the left only for
    // Inner/RightOuter, and FullOuter builds neither. A small side Spark
    // cannot build is no reason to stand down — the query would land on
    // the key-only SMJ with per-group buffering, the exact plan this
    // rewrite replaces.
    val threshold = conf.autoBroadcastJoinThreshold
    val bhjServesIt = threshold >= 0 && {
      val rightBuildable = j.joinType match {
        case Inner | LeftOuter | LeftSemi | LeftAnti | _: ExistenceJoin => true
        case _                                                          => false
      }
      val leftBuildable = j.joinType match {
        case Inner | RightOuter => true
        case _                  => false
      }
      (rightBuildable && right.stats.sizeInBytes <= threshold) ||
      (leftBuildable && left.stats.sizeInBytes <= threshold)
    }
    if (bhjServesIt) return None

    val conjuncts = splitConjunctivePredicates(cond)
    if (!conjuncts.forall(_.deterministic)) return None

    def onLeft(e: Expression) = e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def onRight(e: Expression) = e.references.nonEmpty && e.references.subsetOf(right.outputSet)

    // equi keys oriented (leftExpr, rightExpr), with the original conjunct
    val equis: Seq[(Expression, Expression, Expression)] = conjuncts.collect {
      case e @ EqualTo(a, b) if onLeft(a) && onRight(b) && RowOrdering.isOrderable(a.dataType) =>
        (a, b, e)
      case e @ EqualTo(a, b) if onRight(a) && onLeft(b) && RowOrdering.isOrderable(a.dataType) =>
        (b, a, e)
    }
    if (equis.isEmpty) return None

    // inclusive bounds normalized to (smaller, larger, original conjunct)
    val bounds: Seq[(Expression, Expression, Expression)] = conjuncts.collect {
      case e @ LessThanOrEqual(a, b)    => (a, b, e)
      case e @ GreaterThanOrEqual(a, b) => (b, a, e)
    }

    // orientation 1: points LEFT — rs <= lt AND lt <= re
    val direct = (for {
      lo @ (s, t1, _) <- bounds if onRight(s) && onLeft(t1)
      up @ (t2, e, _) <- bounds if onLeft(t2) && onRight(e)
      if t1.semanticEquals(t2) && orderableNonFloating(t1.dataType)
    } yield (lo, up)).headOption

    // orientation 2: points RIGHT — ls <= rt AND rt <= le
    lazy val flipped = (for {
      lo @ (s, t1, _) <- bounds if onLeft(s) && onRight(t1)
      up @ (t2, e, _) <- bounds if onRight(t2) && onLeft(e)
      if t1.semanticEquals(t2) && orderableNonFloating(t1.dataType)
    } yield (lo, up)).headOption

    // single INCLUSIVE lower bound, right-side expr ≤ left-side expr —
    // the half-open "∃ right row at or before t" shape the FORWARD as-of
    // existence family answers with O(1) carried state (only meaningful
    // when no BETWEEN pair matched)
    lazy val singleLower = bounds.collectFirst {
      case b @ (s, t, _)
          if onRight(s) && onLeft(t) && orderableNonFloating(t.dataType) => b
    }
    // ...and the mirror: left-side expr ≤ right-side expr — "∃ right row
    // at or AFTER t", the BACKWARD (next-event) merge
    lazy val singleUpper = bounds.collectFirst {
      case b @ (t, s, _)
          if onLeft(t) && onRight(s) && orderableNonFloating(t.dataType) => b
    }

    j.joinType match {
      case Inner =>
        (direct, flipped) match {
          case (Some((lo, up)), _) =>
            val used = (equis.map(_._3) :+ lo._3 :+ up._3).toSet
            val residual = conjuncts.filterNot(used.contains)
            val node = IntervalJoinPlan(
              left,
              right,
              leftKeys = equis.map(_._1),
              rightKeys = equis.map(_._2),
              leftTime = lo._2,
              rightStart = lo._1,
              rightEnd = up._2,
              mode = IntervalJoinMode.Inner
            )
            Some(residual.reduceOption(And).map(Filter(_, node)).getOrElse(node))
          case (None, Some((lo, up))) =>
            val used = (equis.map(_._3) :+ lo._3 :+ up._3).toSet
            val residual = conjuncts.filterNot(used.contains)
            val node = IntervalJoinPlan(
              right,
              left,
              leftKeys = equis.map(_._2),
              rightKeys = equis.map(_._1),
              leftTime = lo._2,
              rightStart = lo._1,
              rightEnd = up._2,
              mode = IntervalJoinMode.Inner
            )
            // restore the original (left ++ right) column order
            val reordered = Project(j.output, node)
            Some(residual.reduceOption(And).map(Filter(_, reordered)).getOrElse(reordered))
          case _ => None
        }

      case LeftSemi | LeftAnti =>
        // existence modes emit LEFT rows only, so only the points-on-left
        // orientation can rewrite ("intervals containing some point" is a
        // different operator). Residual conjuncts are constrained by the
        // quantifier: a right-only residual filters the EXISTS domain, so
        // it pushes into the right child for both modes; a left-only
        // residual c_l factors out of EXISTS (semi: Filter above) but NOT
        // out of NOT EXISTS — an anti join KEEPS rows failing c_l
        // (¬∃r: c_l ∧ m is true when ¬c_l), so anti with a left residual
        // does not rewrite; any cross-side residual blocks both.
        direct match {
          case Some((lo, up)) =>
            val used = (equis.map(_._3) :+ lo._3 :+ up._3).toSet
            val residual = conjuncts.filterNot(used.contains)
            val (resLeft, afterLeft) = residual.partition(onLeft)
            val (resRight, resMixed) = afterLeft.partition(onRight)
            if (resMixed.nonEmpty) return None
            if (j.joinType == LeftAnti && resLeft.nonEmpty) return None
            val newRight = resRight.reduceOption(And).map(Filter(_, right)).getOrElse(right)
            val node = IntervalJoinPlan(
              left,
              newRight,
              leftKeys = equis.map(_._1),
              rightKeys = equis.map(_._2),
              leftTime = lo._2,
              rightStart = lo._1,
              rightEnd = up._2,
              mode =
                if (j.joinType == LeftSemi) IntervalJoinMode.Semi else IntervalJoinMode.Anti
            )
            Some(resLeft.reduceOption(And).map(Filter(_, node)).getOrElse(node))
          case None =>
            // single-bound EXISTS / NOT EXISTS: `rk = k AND rt <= t`
            // ("has a same-key right row at or before t" — the forward
            // merge) or `rk = k AND rt >= t` (at or AFTER — the backward
            // merge). Spark plans both as a key-only SMJ buffering whole
            // right key groups; the as-of merge answers them with O(1)
            // carried state. Residuals follow the same quantifier rules
            // as the BETWEEN family above.
            def asofArm(bound: Option[(Expression, Expression, Expression)],
                fwd: Boolean): Option[LogicalPlan] = bound.flatMap { lo =>
              val (rTime, lTime) = if (fwd) (lo._1, lo._2) else (lo._2, lo._1)
              val used = (equis.map(_._3) :+ lo._3).toSet
              val residual = conjuncts.filterNot(used.contains)
              val (resLeft, afterLeft) = residual.partition(onLeft)
              val (resRight, resMixed) = afterLeft.partition(onRight)
              if (resMixed.nonEmpty) return None
              if (j.joinType == LeftAnti && resLeft.nonEmpty) return None
              val newRight =
                resRight.reduceOption(And).map(Filter(_, right)).getOrElse(right)
              val node = AsOfJoinPlan(
                left,
                newRight,
                leftKeys = equis.map(_._1),
                rightKeys = equis.map(_._2),
                leftTime = lTime,
                rightTime = rTime,
                rightTieBreak = Nil,
                mode =
                  if (j.joinType == LeftSemi) AsOfJoinMode.Semi else AsOfJoinMode.Anti,
                forward = fwd
              )
              Some(resLeft.reduceOption(And).map(Filter(_, node)).getOrElse(node))
            }
            asofArm(singleLower, fwd = true).orElse(asofArm(singleUpper, fwd = false))
        }

      case LeftOuter =>
        // points-on-left only (a right-outer points join would null-extend
        // INTERVALS, a different operator). ON-condition residuals under
        // outer semantics: a right-only residual moves into the right
        // child (a right row failing it can't match; unmatched lefts
        // still null-extend) — but a LEFT-only (or mixed) residual cannot
        // leave the condition: a left row failing it must still appear
        // null-extended, which no Filter placement expresses. Rewrite
        // only when every residual is right-only.
        direct match {
          case Some((lo, up)) =>
            val used = (equis.map(_._3) :+ lo._3 :+ up._3).toSet
            val residual = conjuncts.filterNot(used.contains)
            if (!residual.forall(onRight)) return None
            val newRight = residual.reduceOption(And).map(Filter(_, right)).getOrElse(right)
            Some(IntervalJoinPlan(
              left,
              newRight,
              leftKeys = equis.map(_._1),
              rightKeys = equis.map(_._2),
              leftTime = lo._2,
              rightStart = lo._1,
              rightEnd = up._2,
              mode = IntervalJoinMode.Outer
            ))
          case None => None
        }

      case RightOuter =>
        // the PRESERVED side is the right, so only the points-on-right
        // (flipped) orientation is the points-outer shape — after the
        // swap the preserved points become the node's left and the
        // INTERVAL side null-extends, exactly Outer mode. (Points-on-left
        // right-outer would null-extend intervals, a different operator —
        // it never rewrites.) Residuals mirror LeftOuter with the sides
        // exchanged: only interval-side (left-child) residuals can move
        // into the interval child; a points-side residual cannot leave
        // the condition. A Project restores the original column order.
        flipped match {
          case Some((lo, up)) =>
            val used = (equis.map(_._3) :+ lo._3 :+ up._3).toSet
            val residual = conjuncts.filterNot(used.contains)
            if (!residual.forall(onLeft)) return None
            val newLeft = residual.reduceOption(And).map(Filter(_, left)).getOrElse(left)
            val node = IntervalJoinPlan(
              right,
              newLeft,
              leftKeys = equis.map(_._2),
              rightKeys = equis.map(_._1),
              leftTime = lo._2,
              rightStart = lo._1,
              rightEnd = up._2,
              mode = IntervalJoinMode.Outer
            )
            Some(Project(j.output, node))
          case None => None
        }

      case FullOuter =>
        // BOTH sides are preserved, so no residual conjunct can leave the
        // condition in ANY direction: a residual is part of the match
        // predicate, and a row failing it on either side must still
        // appear null-extended — no Filter placement (above, or inside
        // either child) expresses that. Rewrite only the pure
        // equi+BETWEEN shape. Either orientation works (full outer is
        // symmetric): points-left uses the node directly; points-right
        // swaps the sides, with a Project restoring the original column
        // order (both sides null-extend, so nullability already matches
        // j.output).
        (direct, flipped) match {
          case (Some((lo, up)), _) =>
            val used = (equis.map(_._3) :+ lo._3 :+ up._3).toSet
            if (conjuncts.exists(c => !used.contains(c))) return None
            Some(IntervalJoinPlan(
              left,
              right,
              leftKeys = equis.map(_._1),
              rightKeys = equis.map(_._2),
              leftTime = lo._2,
              rightStart = lo._1,
              rightEnd = up._2,
              mode = IntervalJoinMode.FullOuter
            ))
          case (None, Some((lo, up))) =>
            val used = (equis.map(_._3) :+ lo._3 :+ up._3).toSet
            if (conjuncts.exists(c => !used.contains(c))) return None
            val node = IntervalJoinPlan(
              right,
              left,
              leftKeys = equis.map(_._2),
              rightKeys = equis.map(_._1),
              leftTime = lo._2,
              rightStart = lo._1,
              rightEnd = up._2,
              mode = IntervalJoinMode.FullOuter
            )
            Some(Project(j.output, node))
          case _ => None
        }

      case ExistenceJoin(attr) =>
        // the EXISTS-in-a-disjunction shape: RewritePredicateSubquery
        // plans `WHERE p OR EXISTS(SELECT … WHERE k = rk AND t BETWEEN s
        // AND e)` as an ExistenceJoin emitting every left row plus a
        // boolean flag — executed like a semi probe, with the same SMJ
        // key-group buffering the existence sweep mode fixes. Residuals
        // follow Semi's quantifier rule for the right (a right-only
        // residual filters the EXISTS domain, so it pushes into the
        // right child), but a LEFT-only residual blocks here where Semi
        // factors it out: every left row is PRESERVED — there is no
        // Filter above to discharge `c_l`, and no placement expresses
        // `exists = c_l ∧ ∃r: m` for rows that fail `c_l`.
        direct match {
          case Some((lo, up)) =>
            val used = (equis.map(_._3) :+ lo._3 :+ up._3).toSet
            val residual = conjuncts.filterNot(used.contains)
            if (!residual.forall(onRight)) return None
            val newRight = residual.reduceOption(And).map(Filter(_, right)).getOrElse(right)
            Some(IntervalJoinPlan(
              left,
              newRight,
              leftKeys = equis.map(_._1),
              rightKeys = equis.map(_._2),
              leftTime = lo._2,
              rightStart = lo._1,
              rightEnd = up._2,
              mode = IntervalJoinMode.Existence(attr)
            ))
          case None =>
            // single-bound flagged EXISTS → the as-of Existence mode
            // (forward for `rt <= t`, backward for `rt >= t`); residual
            // rules as above (left-only blocks — every left row is
            // preserved, nothing above discharges it)
            def existArm(bound: Option[(Expression, Expression, Expression)],
                fwd: Boolean): Option[LogicalPlan] = bound.flatMap { lo =>
              val (rTime, lTime) = if (fwd) (lo._1, lo._2) else (lo._2, lo._1)
              val used = (equis.map(_._3) :+ lo._3).toSet
              val residual = conjuncts.filterNot(used.contains)
              if (!residual.forall(onRight)) return None
              val newRight =
                residual.reduceOption(And).map(Filter(_, right)).getOrElse(right)
              Some(AsOfJoinPlan(
                left,
                newRight,
                leftKeys = equis.map(_._1),
                rightKeys = equis.map(_._2),
                leftTime = lTime,
                rightTime = rTime,
                rightTieBreak = Nil,
                mode = AsOfJoinMode.Existence(attr),
                forward = fwd
              ))
            }
            existArm(singleLower, fwd = true).orElse(existArm(singleUpper, fwd = false))
        }

      case _ => None
    }
  }

  /** Rewrite the top-1-per-group window-over-join idiom by REDUCING the
    * join under the window to the as-of merge, keeping the window + filter
    * on top as the final arbiter.
    *
    * Soundness (exact, for ANY partition granularity): with the ORDER BY
    * referencing only right-side columns, the rank-1 row of a partition is
    * some (l, r̂) where r̂ is the ordering-max over the partition's
    * matches; r̂ ∈ matches(l) and r̂ dominates all of matches(l) ⊆
    * partition, so r̂ is ALSO l's per-row best — i.e. the group max
    * survives the per-left-row reduction, and rows the reduction drops
    * (non-best matches of each left row) can never be rank 1. The window
    * stays, so partition granularity, null ordering, and rank-tie
    * arbitration behave exactly as before — just over ≤ |left| rows
    * instead of every match. The reduction must agree with the ordering on
    * WHICH row is each left row's best, hence the preconditions: uniform
    * sort direction with default null placement (DESC ⇒ the as-of forward
    * max-by-(time, tiebreak…) pick; ASC ⇒ the backward min-by), order
    * head = the bounded right-side time, tail = the node's tie-breaks.
    *
    * The horizon (two-sided bound) rides ABOVE the as-of node: the
    * anchored best (latest rt ≤ b) is in [a, b] iff ANY match is — all
    * other matches are older still — so Inner filters `rt ≥ a` and
    * LeftOuter null-extends via a projection (a left row whose best fails
    * the horizon must surface null-extended, exactly as the original
    * outer join with zero in-horizon matches).
    *
    * Shape handled: Filter(rk = 1 ∧ …, Window([row_number() AS rk], P ⊆
    * left, O ⊆ right, [WindowGroupLimit] ([Project-of-attributes])
    * Join(Inner | LeftOuter, keys ∧ bound(s)))) — WindowGroupLimit (Spark's
    * own top-k pruning, subsumed by the reduction) and an attribute-only
    * pruning Project are transparent.
    */
  private def rewriteWindowTop1(f: Filter): Option[LogicalPlan] = {
    val w = f.child.asInstanceOf[Window]

    // exactly one window expression: row_number as `rk`
    val rk: Attribute = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => a.toAttribute
      case _                                                   => return None
    }
    // the filter must pin rk to exactly 1 (rank-2+ rows of the original
    // window may not exist after the reduction, so any looser bound is
    // unsound); other conjuncts must not touch rk (they survive verbatim)
    def isOne(e: Expression) = e match {
      case Literal(1, _) => true
      case _             => false
    }
    def isTwo(e: Expression) = e match {
      case Literal(2, _) => true
      case _             => false
    }
    val fConjuncts = splitConjunctivePredicates(f.condition)
    val top1 = fConjuncts.exists {
      case EqualTo(a, one) if a.semanticEquals(rk) && isOne(one)            => true
      case EqualTo(one, a) if a.semanticEquals(rk) && isOne(one)            => true
      case LessThanOrEqual(a, one) if a.semanticEquals(rk) && isOne(one)    => true
      case GreaterThanOrEqual(one, a) if a.semanticEquals(rk) && isOne(one) => true
      case LessThan(a, two) if a.semanticEquals(rk) && isTwo(two)           => true
      case GreaterThan(two, a) if a.semanticEquals(rk) && isTwo(two)        => true
      case _                                                                => false
    }
    if (!top1) return None

    // unwrap transparent operators between the window and the join:
    // WindowGroupLimit (Spark's own top-k pruning — subsumed by the
    // reduction) and a projection. The projection may carry computed
    // ALIASES (e.g. `t - rt AS gap`): it stays ABOVE the reduced join
    // (the reduction preserves every join-output exprId), and window
    // partition/order expressions that reference its aliases are
    // substituted down to join-level expressions before the side checks.
    var rewrap: LogicalPlan => LogicalPlan = identity
    var substitute: Expression => Expression = identity
    var cur: LogicalPlan = w.child
    cur match {
      case WindowGroupLimit(_, _, _, limit, inner) if limit >= 1 =>
        cur = inner // pure pruning; the reduction subsumes it
      case _ => ()
    }
    cur match {
      case p @ Project(list, inner) if list.forall(_.deterministic) =>
        val aliasMap: Map[Long, Expression] =
          list.collect { case a: Alias => a.toAttribute.exprId.id -> a.child }.toMap
        rewrap = child => p.copy(child = child)
        if (aliasMap.nonEmpty)
          substitute = e =>
            e.transformUp {
              case ar: AttributeReference if aliasMap.contains(ar.exprId.id) =>
                aliasMap(ar.exprId.id)
            }
        cur = inner
      case _ => ()
    }
    val j = cur match {
      case j: Join if !j.isStreaming &&
          j.condition.isDefined &&
          j.hint.leftHint.forall(_.strategy.isEmpty) &&
          j.hint.rightHint.forall(_.strategy.isEmpty) => j
      case _ => return None
    }
    if (w.orderSpec.isEmpty) return None
    val ordExprs = w.orderSpec.map(so => substitute(so.child))
    val partExprs = w.partitionSpec.map(substitute)

    // ORIENTATION: the ANCHOR side hosts the window partition (one best
    // match picked per anchor row — the as-of probe side); the MATCH side
    // hosts the ordering. Partition on the join's left is the written
    // idiom; partition on the join's RIGHT is the same idiom with the
    // FROM order flipped — swap the sides into the node and restore the
    // original column order with a Project. A partition referencing the
    // match side would slice groups by match values (not a per-anchor-row
    // reduction) and never rewrites. The outer variant must preserve the
    // anchor: LeftOuter with the anchor left, RightOuter with the anchor
    // right; the cross cases null-extend MATCHES, a different operator.
    val partLeft = partExprs.forall(_.references.subsetOf(j.left.outputSet)) &&
      ordExprs.forall(e => e.references.nonEmpty && e.references.subsetOf(j.right.outputSet))
    val partRight = partExprs.forall(_.references.subsetOf(j.right.outputSet)) &&
      ordExprs.forall(e => e.references.nonEmpty && e.references.subsetOf(j.left.outputSet))
    val (anchorSide, matchSide, swapped) =
      if (partLeft && (j.joinType == Inner || j.joinType == LeftOuter))
        (j.left, j.right, false)
      else if (partRight && (j.joinType == Inner || j.joinType == RightOuter))
        (j.right, j.left, true)
      else return None
    val outerMode = j.joinType != Inner
    def onAnchor(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(anchorSide.outputSet)
    def onMatch(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(matchSide.outputSet)

    // ordering: uniform direction, DEFAULT null placement (the
    // reduction's pick must be the ordering's first row per anchor row;
    // the as-of tie semantics are lexicographic max/min with Spark's
    // default null ordering), every expression match-side and
    // deterministic
    val forward = w.orderSpec.head.direction == Descending
    val defaultNulls = if (forward) NullsLast else NullsFirst
    val uniform = w.orderSpec.zip(ordExprs).forall { case (so, e) =>
      so.direction == (if (forward) Descending else Ascending) &&
      so.nullOrdering == defaultNulls &&
      e.deterministic &&
      RowOrdering.isOrderable(e.dataType)
    }
    if (!uniform) return None
    val rt = ordExprs.head
    if (!orderableNonFloating(rt.dataType)) return None
    val tieBreaks = ordExprs.tail

    val conjuncts = splitConjunctivePredicates(j.condition.get)
    if (!conjuncts.forall(_.deterministic)) return None
    // equi keys oriented (anchorExpr, matchExpr, original conjunct)
    val equis: Seq[(Expression, Expression, Expression)] = conjuncts.collect {
      case e @ EqualTo(a, b)
          if onAnchor(a) && onMatch(b) && RowOrdering.isOrderable(a.dataType) =>
        (a, b, e)
      case e @ EqualTo(a, b)
          if onMatch(a) && onAnchor(b) && RowOrdering.isOrderable(a.dataType) =>
        (b, a, e)
    }
    if (equis.isEmpty) return None

    // bounds on THE ordered match time rt, each against an anchor-side
    // expression: lower `a <= rt`, upper `rt <= b` (inclusive only — the
    // merge and the horizon check are inclusive)
    val lowers = conjuncts.collect {
      case e @ GreaterThanOrEqual(r, a) if r.semanticEquals(rt) && onAnchor(a) => (a, e)
      case e @ LessThanOrEqual(a, r) if r.semanticEquals(rt) && onAnchor(a)    => (a, e)
    }
    val uppers = conjuncts.collect {
      case e @ LessThanOrEqual(r, b) if r.semanticEquals(rt) && onAnchor(b)    => (b, e)
      case e @ GreaterThanOrEqual(b, r) if r.semanticEquals(rt) && onAnchor(b) => (b, e)
    }
    if (lowers.length > 1 || uppers.length > 1) return None
    // the merge anchors on the bound in the sort direction: DESC (latest)
    // needs `rt <= b`, ASC (earliest) needs `a <= rt`; the opposite bound,
    // when present, becomes the horizon check above the node
    val (anchor, horizon) =
      if (forward) (uppers.headOption, lowers.headOption)
      else (lowers.headOption, uppers.headOption)
    if (anchor.isEmpty) return None

    val used: Set[Expression] =
      (equis.map(_._3) ++ anchor.map(_._2) ++ horizon.map(_._2)).toSet
    val residual = conjuncts.filterNot(used.contains)
    // a match-side residual narrows the match domain identically on both
    // forms (push into the match child; unmatched anchors still
    // null-extend under the outer variant); anything else cannot leave an
    // outer condition and under Inner would change which rows reach the
    // window — decline
    if (!residual.forall(onMatch)) return None
    val newMatch = residual.reduceOption(And).map(Filter(_, matchSide)).getOrElse(matchSide)

    val node = AsOfJoinPlan(
      anchorSide,
      newMatch,
      leftKeys = equis.map(_._1),
      rightKeys = equis.map(_._2),
      leftTime = anchor.get._1,
      rightTime = rt,
      rightTieBreak = tieBreaks,
      mode = if (outerMode) AsOfJoinMode.Outer else AsOfJoinMode.Inner,
      forward = forward
    )
    val horizonPred = horizon.map { case (bound, _) =>
      if (forward) GreaterThanOrEqual(rt, bound) else LessThanOrEqual(rt, bound)
    }
    val reduced0: LogicalPlan = (horizonPred, outerMode) match {
      case (None, _) => node
      case (Some(pred), false) => Filter(pred, node)
      case (Some(pred), true) =>
        // outer: a best match failing the horizon must surface
        // NULL-extended (the original join had no in-horizon match for
        // that anchor row) — a projection nulls the match side out;
        // `pred` over a null rt is null ⇒ branch-else ⇒ stays null
        val matchOut = node.output.drop(anchorSide.output.length)
        val kept = anchorSide.output ++ matchOut.map { a =>
          Alias(If(pred, a, Literal(null, a.dataType)), a.name)(
            exprId = a.exprId, qualifier = a.qualifier)
        }
        Project(kept, node)
    }
    // swapped orientation: restore the join's original (left ++ right)
    // column order. The node's outer mode already marks the match side
    // nullable, so j.output's nullability is satisfied either way.
    val reduced =
      if (swapped) Project(j.output, reduced0) else reduced0
    Some(f.copy(child = w.copy(child = rewrap(reduced))))
  }
}
