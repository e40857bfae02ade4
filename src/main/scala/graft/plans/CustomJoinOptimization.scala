package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  And,
  Attribute,
  AttributeSet,
  Expression,
  GreaterThan,
  GreaterThanOrEqual,
  LessThan,
  LessThanOrEqual,
  Literal,
  NamedExpression,
  PredicateHelper
}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown + column pruning THROUGH the custom join nodes.
  *
  * Catalyst's own `PushDownPredicates` / `ColumnPruning` pattern-match the
  * built-in operators only — a `Filter` above [[AsOfJoinPlan]] /
  * [[IntervalJoinPlan]] would otherwise sit there forever, and a scan
  * below them would read every column of both sides. At 100 TB those are
  * the two optimizations that matter most (skip data at the source), so
  * the custom nodes must participate; this rule is injected beside
  * KernelFusion in `GraftExtensions` (and the imperative `register`).
  *
  * Soundness per transform:
  *
  *  - **Left-side filter pushdown (both nodes, inner AND outer).** Every
  *    output row carries an unmodified left row, and dropping a left row
  *    drops exactly that row's matches — the join treats left rows
  *    independently. So `Filter(p_left, J(l, r)) == J(Filter(p_left, l), r)`
  *    for deterministic `p_left`. (Non-deterministic predicates stay put:
  *    pushing would change their evaluation count/order.)
  *
  *  - **Predicate TRANSFER to the right side (both nodes, all modes).**
  *    Right rows reach the output only through matches, so predicates the
  *    left filter implies about matched right rows are COPIED below the
  *    right child (originals stay on the left): key predicates (matches
  *    require `rk = lk`), as-of upper time bounds (`rt <= lt`, so
  *    `lt <= c` implies `rt <= c`), and interval bounds (`rs <= lt <= re`,
  *    so an upper bound on `lt` bounds `rs` and a lower bound bounds
  *    `re`). Removing right rows that cannot match any surviving left row
  *    never changes which remaining row matches — the as-of "latest"
  *    selection competes within a key group, and the removed rows belong
  *    to groups/time-ranges the surviving left side never probes.
  *
  *  - **Right-side filter pushdown: interval join INNER ONLY.** The inner
  *    interval join emits every overlapping (l, r) pair, so a filter on
  *    right columns commutes with the join like a plain inner join. It is
  *    deliberately NOT done for the as-of join in ANY mode: the as-of
  *    match selects the LATEST right row per left row, so filtering right
  *    rows first changes WHICH row is latest — `Filter(r.v > 0, asof)`
  *    (drop matches with v <= 0) is not `asof(l, Filter(r.v > 0, r))`
  *    (match the latest row that HAS v > 0). Likewise not for outer
  *    interval joins, where a right predicate above the join also
  *    evaluates on null-extended rows.
  *
  *  - **Join-mode demotion (EliminateOuterJoin analog).** A
  *    null-intolerant predicate above a null-extending mode can never
  *    pass the null-extended rows, so the preservation is dead weight:
  *    `Filter(p_right_nullintolerant, Outer)` → `Filter(p, Inner)`,
  *    `Filter(p_left_nullintolerant, FullOuter)` → `Filter(p, Outer)`
  *    (both sides → Inner), as-of outer → inner — and the stricter
  *    mode's own pushdown rules then move the predicate at the
  *    optimizer's fixpoint.
  *
  *  - **Column pruning (both nodes).** When a `Project` or `Aggregate`
  *    directly above the join needs only a subset of its output, each
  *    child is narrowed to (columns the parent references) ∪ (columns the
  *    join expressions themselves read — keys, times, tie-breaks). The
  *    inserted child `Project`s keep the original attributes (same
  *    exprIds), so the exec's expression binding is untouched, and
  *    Catalyst's own `ColumnPruning` then folds them into the scans'
  *    `ReadSchema`. Fires only when it strictly narrows a side —
  *    fixpoint-safe.
  */
object CustomJoinOptimization extends Rule[LogicalPlan] with PredicateHelper {

  private def joinRefs(j: LogicalPlan): AttributeSet = j match {
    case a: AsOfJoinPlan =>
      AttributeSet(
        (a.leftKeys ++ a.rightKeys ++ Seq(a.leftTime, a.rightTime) ++ a.rightTieBreak)
          .flatMap(_.references)
      )
    case i: IntervalJoinPlan =>
      AttributeSet(
        (i.leftKeys ++ i.rightKeys ++ Seq(i.leftTime, i.rightStart, i.rightEnd))
          .flatMap(_.references)
      )
    case _ => AttributeSet.empty
  }

  /** Narrow `child` to the attributes in `required`, or None if nothing
    * would be pruned.
    */
  private def pruned(child: LogicalPlan, required: AttributeSet): Option[LogicalPlan] = {
    val needed = child.output.filter(required.contains)
    // never prune to zero columns: a scan must keep at least one column
    // to count rows, and an all-constant parent (e.g. count(1)) still
    // needs the child's cardinality
    if (needed.length == child.output.length || needed.isEmpty) None
    else Some(Project(needed.map(_.asInstanceOf[NamedExpression]), child))
  }

  private def pruneChildren(
      j: LogicalPlan,
      left: LogicalPlan,
      right: LogicalPlan,
      parentRefs: AttributeSet
  ): Option[(LogicalPlan, LogicalPlan)] = {
    val required = parentRefs ++ joinRefs(j)
    val (pl, pr) = (pruned(left, required), pruned(right, required))
    if (pl.isEmpty && pr.isEmpty) None
    else Some((pl.getOrElse(left), pr.getOrElse(right)))
  }

  private def split(cond: Expression, side: AttributeSet): (Seq[Expression], Seq[Expression]) =
    splitConjunctivePredicates(cond).partition(e =>
      e.deterministic && e.references.nonEmpty && e.references.subsetOf(side)
    )

  private def withRemainder(rest: Seq[Expression], newJoin: LogicalPlan): LogicalPlan =
    rest.reduceOption(And).map(Filter(_, newJoin)).getOrElse(newJoin)

  // ---- predicate transfer to the right side ---------------------------
  // A right row reaches the output ONLY through a match, and a match
  // requires equal keys and the node's time relation — so predicates the
  // left filter implies about MATCHED right rows can be copied (not
  // moved) to the right child. Removing right rows that cannot match any
  // surviving left row never changes which remaining row matches (the
  // as-of "latest" selection happens within a key group, and whole
  // groups the left no longer contains don't compete), so this is sound
  // for inner AND outer modes of both nodes.

  /** leftKey → rightKey, where both resolve to bare same-type attributes. */
  private def keyAttrMap(lks: Seq[Expression], rks: Seq[Expression]): Map[Attribute, Attribute] =
    lks.zip(rks).collect {
      case (l: Attribute, r: Attribute) if l.dataType == r.dataType => l -> r
    }.toMap

  /** Conjuncts referencing ONLY mapped left keys, restated about the
    * right keys: `p(lk)` holds for every surviving left row and matches
    * require `rk = lk`, so right rows with `¬p(rk)` can't match anything.
    */
  private def keyTransfers(
      conjuncts: Seq[Expression],
      m: Map[Attribute, Attribute]
  ): Seq[Expression] =
    if (m.isEmpty) Nil
    else
      conjuncts.collect {
        case e if e.deterministic && e.references.nonEmpty && e.references.forall(m.contains) =>
          e.transform { case a: Attribute if m.contains(a) => m(a) }
      }

  /** Literal UPPER bounds on `time` in the conjuncts, restated about
    * `target`: with `target <= time` guaranteed at every match (as-of
    * `rt <= lt`, interval `rs <= lt`), `time < c` implies `target < c`.
    */
  private def upperBounds(
      conjuncts: Seq[Expression],
      time: Expression,
      target: Expression
  ): Seq[Expression] =
    if (time.dataType != target.dataType) Nil
    else
      conjuncts.collect {
        case LessThan(t, l: Literal) if t.semanticEquals(time)           => LessThan(target, l)
        case LessThanOrEqual(t, l: Literal) if t.semanticEquals(time)    => LessThanOrEqual(target, l)
        case GreaterThan(l: Literal, t) if t.semanticEquals(time)        => LessThan(target, l)
        case GreaterThanOrEqual(l: Literal, t) if t.semanticEquals(time) => LessThanOrEqual(target, l)
      }

  /** Literal LOWER bounds on `time`, restated about `target`: with
    * `target >= time` guaranteed at every match (interval `re >= lt`),
    * `time > c` implies `target > c`.
    */
  private def lowerBounds(
      conjuncts: Seq[Expression],
      time: Expression,
      target: Expression
  ): Seq[Expression] =
    if (time.dataType != target.dataType) Nil
    else
      conjuncts.collect {
        case GreaterThan(t, l: Literal) if t.semanticEquals(time)     => GreaterThan(target, l)
        case GreaterThanOrEqual(t, l: Literal) if t.semanticEquals(time) =>
          GreaterThanOrEqual(target, l)
        case LessThan(l: Literal, t) if t.semanticEquals(time)        => GreaterThan(target, l)
        case LessThanOrEqual(l: Literal, t) if t.semanticEquals(time) => GreaterThanOrEqual(target, l)
      }

  // ---- join-mode demotion (EliminateOuterJoin analog) ------------------
  // A null-INTOLERANT predicate above a null-extending join can never
  // pass the null-extended rows, so the preservation that produced them
  // is dead weight: drop to the stricter mode and let that mode's
  // pushdown rules (this rule re-fires at the optimizer's fixpoint) move
  // the predicate the rest of the way. Catalyst's EliminateOuterJoin
  // does exactly this, but pattern-matches only the built-in Join.

  /** Does some conjunct referencing ONLY `side` filter out a row whose
    * `side` attributes are all NULL? (Evaluates the conjunct against an
    * all-null row — null or false means null-extended rows cannot pass.)
    */
  private def filtersNullExtended(conjuncts: Seq[Expression], side: AttributeSet): Boolean =
    conjuncts.exists { e =>
      e.deterministic && e.references.nonEmpty && e.references.subsetOf(side) && {
        val attrs = e.references.toSeq
        val bound = org.apache.spark.sql.catalyst.expressions.BindReferences
          .bindReference(e, org.apache.spark.sql.catalyst.expressions.AttributeSeq(attrs))
        !bound.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Unevaluable]) &&
        (try {
          val v = bound.eval(
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(attrs.length))
          v == null || v == false
        } catch { case scala.util.control.NonFatal(_) => false })
      }
    }

  /** The strictest interval-join mode `cond` permits above `j`:
    *  - FullOuter: a left-only null-filtering conjunct kills the
    *    unmatched-RIGHT rows (their left attrs are null) → Outer; one on
    *    each side kills both unmatched classes → Inner. The mirror case
    *    (only unmatched-LEFT rows die) has no expressible mode — the
    *    sweep is point-preserving, never interval-preserving — so the
    *    node stays FullOuter and the pushdown barrier keeps the filter.
    *  - Outer: a right-only null-filtering conjunct kills the
    *    null-extended rows → Inner (whose rules may then push it).
    */
  private def demotedMode(cond: Expression, j: IntervalJoinPlan): IntervalJoinMode = {
    val conjuncts = splitConjunctivePredicates(cond)
    j.mode match {
      case IntervalJoinMode.FullOuter =>
        val killsNullLeft = filtersNullExtended(conjuncts, j.left.outputSet)
        val killsNullRight = filtersNullExtended(conjuncts, j.right.outputSet)
        if (killsNullLeft && killsNullRight) IntervalJoinMode.Inner
        else if (killsNullLeft) IntervalJoinMode.Outer
        else j.mode
      case IntervalJoinMode.Outer
          if filtersNullExtended(conjuncts, j.right.outputSet) =>
        IntervalJoinMode.Inner
      case m => m
    }
  }

  /** Pushdown through a non-FullOuter interval join: left-only conjuncts
    * below the left child; whole-conjunct moves to the right only for
    * INNER (outer would skip null-extended rows' evaluation; semi/anti
    * expose no right columns above the join, so nothing can reference
    * them anyway); plus transferred COPIES — key predicates and interval
    * pruning from literal time bounds (matches need rs <= lt <= re, so
    * an upper bound on lt bounds rs above and a lower bound bounds re
    * below).
    */
  private def pushThroughInterval(
      f: Filter,
      cond: Expression,
      j: IntervalJoinPlan
  ): LogicalPlan = {
    val (leftOnly, afterLeft) = split(cond, j.left.outputSet)
    val (rightOnly, rest) =
      if (j.mode != IntervalJoinMode.Inner) (Nil, afterLeft)
      else afterLeft.partition(e =>
        e.deterministic && e.references.nonEmpty && e.references.subsetOf(j.right.outputSet)
      )
    if (leftOnly.isEmpty && rightOnly.isEmpty) f
    else {
      val transfers = keyTransfers(leftOnly, keyAttrMap(j.leftKeys, j.rightKeys)) ++
        upperBounds(leftOnly, j.leftTime, j.rightStart) ++
        lowerBounds(leftOnly, j.leftTime, j.rightEnd)
      val newLeft = leftOnly.reduceOption(And).map(Filter(_, j.left)).getOrElse(j.left)
      val newRight = (rightOnly ++ transfers)
        .reduceOption(And)
        .map(Filter(_, j.right))
        .getOrElse(j.right)
      withRemainder(rest, j.copy(left = newLeft, right = newRight))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {

    // ---- join-mode demotion + the FullOuter pushdown barrier ----------
    // Demotion must be decided before pushdown (which would otherwise
    // park the filter above a FullOuter barrier or refuse the right-side
    // move an Inner node permits); demotedMode is computed ONCE per
    // matched Filter, and only the two demotable modes pay it.
    case f @ Filter(cond, j: IntervalJoinPlan)
        if j.mode == IntervalJoinMode.FullOuter || j.mode == IntervalJoinMode.Outer =>
      val m = demotedMode(cond, j)
      if (m != j.mode) {
        // demote and stop — the stricter mode's own pushdown fires on
        // the optimizer's next fixpoint pass
        Filter(cond, j.copy(mode = m))
      } else if (j.mode == IntervalJoinMode.FullOuter) {
        // barrier: NOTHING moves through a (non-demotable) full outer
        // join (Spark's own PushPredicateThroughJoin makes the same
        // refusal) — pushing a left-only predicate would drop left rows
        // whose formerly-matched intervals must then surface
        // null-extended, and right-side transfers would likewise delete
        // rows the mode must preserve. Column pruning (below) still
        // applies.
        f
      } else {
        pushThroughInterval(f, cond, j)
      }

    case Filter(cond, j: AsOfJoinPlan)
        if j.mode == AsOfJoinMode.Outer &&
          filtersNullExtended(splitConjunctivePredicates(cond), j.right.outputSet) =>
      Filter(cond, j.copy(mode = AsOfJoinMode.Inner))

    // ---- predicate pushdown -------------------------------------------
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (leftOnly, rest) = split(cond, j.left.outputSet)
      if (leftOnly.isEmpty) f
      else {
        // transferred COPIES on the right: key predicates (matches need
        // rk = lk) and upper time bounds (matches need rt <= lt); the
        // originals stay pushed on the left. No whole-conjunct move to
        // the right EVER — that would change which row is "latest".
        // time-bound transfer is DIRECTION-aware: the forward merge
        // guarantees rt <= lt at every match, so upper bounds on lt carry
        // to rt; the backward merge guarantees rt >= lt, so only LOWER
        // bounds carry — transferring an upper bound there would delete
        // right rows that are valid next-event matches
        val timeBounds =
          if (j.forward) upperBounds(leftOnly, j.leftTime, j.rightTime)
          else lowerBounds(leftOnly, j.leftTime, j.rightTime)
        val transfers = keyTransfers(leftOnly, keyAttrMap(j.leftKeys, j.rightKeys)) ++
          timeBounds
        val newRight =
          transfers.reduceOption(And).map(Filter(_, j.right)).getOrElse(j.right)
        withRemainder(rest, j.copy(left = Filter(leftOnly.reduce(And), j.left), right = newRight))
      }

    case f @ Filter(cond, j: IntervalJoinPlan) =>
      pushThroughInterval(f, cond, j)

    // ---- column pruning ------------------------------------------------
    case p @ Project(_, j: AsOfJoinPlan) =>
      pruneChildren(j, j.left, j.right, p.references)
        .map { case (l, r) => p.copy(child = j.copy(left = l, right = r)) }
        .getOrElse(p)

    case p @ Project(_, j: IntervalJoinPlan) =>
      pruneChildren(j, j.left, j.right, p.references)
        .map { case (l, r) => p.copy(child = j.copy(left = l, right = r)) }
        .getOrElse(p)

    case a @ Aggregate(_, _, j: AsOfJoinPlan, _) =>
      pruneChildren(j, j.left, j.right, a.references)
        .map { case (l, r) => a.copy(child = j.copy(left = l, right = r)) }
        .getOrElse(a)

    case a @ Aggregate(_, _, j: IntervalJoinPlan, _) =>
      pruneChildren(j, j.left, j.right, a.references)
        .map { case (l, r) => a.copy(child = j.copy(left = l, right = r)) }
        .getOrElse(a)

    // ---- column pruning through a RESIDUAL filter ----------------------
    // An unpushable Filter (e.g. a cross-side predicate a RangeJoinRewrite
    // left behind, or a right-column predicate above an as-of/outer join)
    // sits between the parent and the join forever — without these cases
    // it would also block pruning, leaving both scans reading every
    // column. The filter's own references join the required set; the
    // filter itself stays exactly where it is (pruning never moves it).
    case p @ Project(_, f @ Filter(cond, j: AsOfJoinPlan)) =>
      pruneChildren(j, j.left, j.right, p.references ++ cond.references)
        .map { case (l, r) => p.copy(child = f.copy(child = j.copy(left = l, right = r))) }
        .getOrElse(p)

    case p @ Project(_, f @ Filter(cond, j: IntervalJoinPlan)) =>
      pruneChildren(j, j.left, j.right, p.references ++ cond.references)
        .map { case (l, r) => p.copy(child = f.copy(child = j.copy(left = l, right = r))) }
        .getOrElse(p)

    case a @ Aggregate(_, _, f @ Filter(cond, j: AsOfJoinPlan), _) =>
      pruneChildren(j, j.left, j.right, a.references ++ cond.references)
        .map { case (l, r) => a.copy(child = f.copy(child = j.copy(left = l, right = r))) }
        .getOrElse(a)

    case a @ Aggregate(_, _, f @ Filter(cond, j: IntervalJoinPlan), _) =>
      pruneChildren(j, j.left, j.right, a.references ++ cond.references)
        .map { case (l, r) => a.copy(child = f.copy(child = j.copy(left = l, right = r))) }
        .getOrElse(a)
  }
}
