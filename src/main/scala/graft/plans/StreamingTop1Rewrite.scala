package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  And,
  Ascending,
  Attribute,
  AttributeReference,
  CreateStruct,
  Descending,
  EqualTo,
  Expression,
  GetStructField,
  GreaterThan,
  GreaterThanOrEqual,
  LessThan,
  LessThanOrEqual,
  Literal,
  NamedExpression,
  NullsFirst,
  NullsLast,
  PredicateHelper,
  RowNumber,
  RowOrdering,
  WindowExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate,
  EventTimeWatermark,
  Filter,
  Join,
  LogicalPlan,
  Project,
  SubqueryAlias,
  Window
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** The STREAMING arm of the window-top-1 idiom ([[RangeJoinRewrite]]'s
  * batch reduction, r13 prescription #5): the same hand-written SQL
  *
  * {{{
  *   SELECT … FROM (
  *     SELECT l.*, r.*, row_number() OVER (
  *       PARTITION BY <left cols> ORDER BY r.rt DESC) rk
  *     FROM l [LEFT] JOIN r
  *       ON l.k = r.k AND r.rt <= l.t AND r.rt >= l.t - INTERVAL …
  *   ) WHERE rk = 1
  * }}}
  *
  * over STREAMING frames is refused outright by Spark ("non-time-based
  * windows are not supported on streaming DataFrames") even though its
  * semantics are exactly the bounded both-streams as-of the engine
  * already runs with finite state
  * ([[graft.streaming.EventTime.asofJoinBounded]]): a two-sided
  * time-bound stream-stream join followed by a watermark-finalized
  * best-match aggregation. This rule rewrites the refused shape onto
  * that composition.
  *
  * WHY an analyzer (post-hoc resolution) rule, not an optimizer rule
  * like the batch arm: Spark's UnsupportedOperationChecker rejects the
  * window on the ANALYZED plan at `start()`, before any optimizer runs —
  * the rewrite must already have happened. Consequently it is active
  * only on sessions built with `spark.sql.extensions=graft.GraftExtensions`
  * (analyzer rules cannot be injected into a live session the way
  * `GraftExtensions.register` adds optimizer rules).
  *
  * The rewrite: keep the JOIN verbatim (its two-sided time bound against
  * watermarked event-time columns is precisely what makes Spark evict
  * its state), and replace Filter(rk = 1) ∘ Window(row_number) with
  *
  * {{{ Aggregate(P, P :+ max_by(struct(<other cols>), struct(<order>)), join) }}}
  *
  * — `max_by` for DESC (latest; `min_by` for ASC/earliest), exactly
  * asofJoinBounded's pick. Soundness: rank-1 per P-group under ORDER BY
  * o₁…oₙ IS the group's (o₁…oₙ)-argmax row; both sides arbitrate ties
  * arbitrarily (`row_number` on equal keys is nondeterministic, as is
  * `max_by`), and both place a null-extended outer row last under the
  * DESC default NULLS LAST (struct ordering puts null fields first
  * ascending = last for max) and first under ASC NULLS FIRST (min picks
  * it) — the uniform-direction default-nulls precondition below is what
  * makes that correspondence exact. Unlike the batch arm the window
  * cannot be kept as arbiter (it is the refused operator), so the
  * aggregation must BE the arbiter — same preconditions, stricter
  * consequence: the rewrite declines anything it cannot reproduce
  * exactly, and a declined plan falls through to Spark's own refusal.
  *
  * Admissibility (each checked below):
  *  - Filter pins `rk` to exactly 1; no other conjunct references `rk`;
  *  - single `row_number()` window expression; uniform sort direction
  *    with default null placement; order head `rt` is a WATERMARKED
  *    match-side time attribute (non-floating), tails deterministic
  *    match-side tie-breaks;
  *  - partition expressions are plain anchor-side attributes (they
  *    become streaming group-by keys — include the anchor's event-time
  *    column to run in append mode; Spark's aggregation checker owns
  *    that diagnostic);
  *  - Inner/LeftOuter with the partition on the join's left, or
  *    Inner/RightOuter with it on the right (the preserved side must be
  *    the anchor — the cross cases null-extend matches, a different
  *    operator);
  *  - ≥ 1 cross-side equi conjunct (stream-stream joins hash-partition
  *    on it) and BOTH a lower and an upper bound on `rt` against
  *    anchor-side expressions referencing a watermarked attribute —
  *    without the two-sided bound the join state cannot evict, and
  *    unbounded state is the exact failure this arm exists to prevent;
  *  - no join-strategy hints (a hinted user knows better).
  *
  * State at scale: join state evicts by the watermark range (the bound
  * the user already wrote); aggregation groups finalize when the
  * watermark passes their event-time key. Both widths follow the
  * session's stateful shuffle conf — the `statePartitions` knob applies
  * through [[graft.streaming.EventTime.withStatePartitions]] on the
  * result, exactly as for the hand-built composition.
  *
  * Kill switch: `spark.graft.streamingTop1Rewrite.enabled=false`.
  */
object StreamingTop1Rewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.streamingTop1Rewrite.enabled"

  private def orderableNonFloating(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => false
    case other                  => RowOrdering.isOrderable(other)
  }

  private def watermarked(a: Attribute): Boolean =
    a.metadata.contains(EventTimeWatermark.delayKey)

  /** Discoverability shim for sessions WITHOUT builder-time extensions
    * (VERDICT r14 "What's missing" #3): the rule binds only via
    * `spark.sql.extensions` — on a plain session Spark refuses the
    * `row_number()=1`-over-bounded-join SQL at `start()` with a generic
    * "non-time-based windows are not supported on streaming DataFrames"
    * and no pointer to the engine's solution. Call this on the frame
    * BEFORE `start()` (analysis already ran, so the plan is inspectable):
    *
    *  - `Some(msg)` naming both escape hatches — rebuilding the session
    *    with `spark.sql.extensions=graft.GraftExtensions`, or composing
    *    manually with `graft.streaming.EventTime.asofJoinBounded` — when
    *    the plan carries the refused shape and the rewrite WOULD accept
    *    it (the same admissibility code path the analyzer rule runs);
    *  - `Some(msg)` naming the failed guard matrix + the manual
    *    composition when a streaming `row_number()` window is present
    *    but outside the guards (the rule would decline it even with
    *    extensions bound);
    *  - `None` when there is nothing to diagnose — including on an
    *    extensions session, where the rewrite already removed the window
    *    at analysis and the query simply runs.
    */
  def explainRefusal(df: org.apache.spark.sql.Dataset[_]): Option[String] = {
    val plan = df.queryExecution.analyzed
    if (!plan.isStreaming) return None
    var admissible = false
    var rankedWindow = false
    plan.foreach {
      case f: Filter if f.isStreaming && rewrite(f).isDefined => admissible = true
      case w: Window if w.isStreaming && w.windowExpressions.exists {
            case Alias(WindowExpression(RowNumber(), _), _) => true
            case _                                          => false
          } =>
        rankedWindow = true
      case _ => ()
    }
    if (admissible)
      Some(
        "Spark will refuse this query at start() (\"non-time-based windows are not " +
          "supported on streaming DataFrames\"), but it is exactly the bounded-as-of " +
          "top-1 idiom graft's StreamingTop1Rewrite runs with finite state. Two ways " +
          "to run it: (1) build the session with " +
          "spark.sql.extensions=graft.GraftExtensions (builder-time only — the " +
          "rewrite is an analyzer rule; GraftExtensions.register on a live session " +
          "cannot add it); or (2) compose it manually with " +
          "graft.streaming.EventTime.asofJoinBounded, the same finite-state " +
          "max_by/min_by aggregation the rewrite produces. If this session " +
          "ALREADY has the extensions, the kill switch is off: check " +
          s"$EnabledKey (the rewrite declines when it is set false).")
    else if (rankedWindow)
      Some(
        "This streaming plan carries a row_number() window Spark refuses at start(), " +
          "and its shape is OUTSIDE StreamingTop1Rewrite's guard matrix (required: " +
          "rk pinned to 1; single row_number; uniform sort direction with default " +
          "null placement; watermarked non-floating match-side order head; " +
          "plain-attribute anchor-side partition keys; both join children streaming; " +
          "preserved side = anchor; >= 1 cross-side equi conjunct; a two-sided time " +
          "bound on the order head; no join hints — see StreamingTop1Rewrite's " +
          "scaladoc). Restructure to match, or compose the semantics manually with " +
          "graft.streaming.EventTime.asofJoinBounded.")
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").trim.equalsIgnoreCase("true")) plan
    else
      plan.transformUp {
        case f @ Filter(_, _) if f.isStreaming =>
          rewrite(f).getOrElse(f)
      }

  private def rewrite(f: Filter): Option[LogicalPlan] = {
    // ---- locate the Window under the filter (through the analyzer's
    // transparent wrappers: SubqueryAlias and attribute-only Projects —
    // the final Project below restores exactly f.output, so pruning
    // projects need no re-wrapping)
    var cur: LogicalPlan = f.child
    var guard = 0
    while (guard < 8) {
      cur match {
        case s: SubqueryAlias => cur = s.child
        case p: Project if p.projectList.forall(_.isInstanceOf[Attribute]) => cur = p.child
        case _ => guard = 8
      }
      guard += 1
    }
    val w = cur match {
      case w: Window => w
      case _         => return None
    }

    // ---- exactly one window expression: row_number as rk
    val rk: Attribute = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => a.toAttribute
      case _                                                   => return None
    }
    // the filter must pin rk = 1 (same matcher family as the batch arm);
    // any OTHER conjunct referencing rk cannot be expressed post-rewrite
    // (rk is constant 1 afterwards) — decline
    def isOne(e: Expression) = e match { case Literal(1, _) => true; case _ => false }
    def isTwo(e: Expression) = e match { case Literal(2, _) => true; case _ => false }
    val fConjuncts = splitConjunctivePredicates(f.condition)
    val (pins, remaining) = fConjuncts.partition {
      case EqualTo(a, one) if a.semanticEquals(rk) && isOne(one)            => true
      case EqualTo(one, a) if a.semanticEquals(rk) && isOne(one)            => true
      case LessThanOrEqual(a, one) if a.semanticEquals(rk) && isOne(one)    => true
      case GreaterThanOrEqual(one, a) if a.semanticEquals(rk) && isOne(one) => true
      case LessThan(a, two) if a.semanticEquals(rk) && isTwo(two)           => true
      case GreaterThan(two, a) if a.semanticEquals(rk) && isTwo(two)        => true
      case _                                                                => false
    }
    if (pins.isEmpty) return None
    if (remaining.exists(_.references.contains(rk))) return None

    // ---- under the window: optional alias-carrying Project, then the join
    var substitute: Expression => Expression = identity
    var belowProject: Option[Project] = None
    var below: LogicalPlan = w.child
    below match {
      case s: SubqueryAlias => below = s.child
      case _                => ()
    }
    below match {
      case p @ Project(list, inner) if list.forall(_.deterministic) =>
        val aliasMap: Map[Long, Expression] =
          list.collect { case a: Alias => a.toAttribute.exprId.id -> a.child }.toMap
        if (aliasMap.nonEmpty)
          substitute = e =>
            e.transformUp {
              case ar: AttributeReference if aliasMap.contains(ar.exprId.id) =>
                aliasMap(ar.exprId.id)
            }
        belowProject = Some(p)
        below = inner
      case _ => ()
    }
    below match {
      case s: SubqueryAlias => below = s.child
      case _                => ()
    }
    val j = below match {
      // BOTH children streaming — the both-streams bounded-as-of shape.
      // A stream-static join with a STATIC anchor would rewrite into an
      // aggregation whose groups never finalize (no event-time key):
      // "top-1 over all matches ever" has no append-mode meaning, so it
      // stays with Spark's refusal rather than silently becoming
      // update-mode running-max semantics.
      case j: Join if j.left.isStreaming && j.right.isStreaming &&
          j.condition.isDefined &&
          j.hint.leftHint.forall(_.strategy.isEmpty) &&
          j.hint.rightHint.forall(_.strategy.isEmpty) => j
      case _ => return None
    }
    if (w.orderSpec.isEmpty) return None
    val ordExprs = w.orderSpec.map(so => substitute(so.child))
    val partExprs = w.partitionSpec.map(substitute)

    // ---- orientation: anchor side hosts the partition, match side the
    // ordering; the preserved side of an outer join must be the anchor
    val partLeft = partExprs.forall(_.references.subsetOf(j.left.outputSet)) &&
      ordExprs.forall(e => e.references.nonEmpty && e.references.subsetOf(j.right.outputSet))
    val partRight = partExprs.forall(_.references.subsetOf(j.right.outputSet)) &&
      ordExprs.forall(e => e.references.nonEmpty && e.references.subsetOf(j.left.outputSet))
    val (anchorSide, matchSide) =
      if (partLeft && (j.joinType == Inner || j.joinType == LeftOuter)) (j.left, j.right)
      else if (partRight && (j.joinType == Inner || j.joinType == RightOuter)) (j.right, j.left)
      else return None
    def onAnchor(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(anchorSide.outputSet)
    def onMatch(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(matchSide.outputSet)

    // ---- grouping keys must be plain attributes (they pass through the
    // Aggregate with their exprIds; computed partitions don't restore)
    val groupAttrs: Seq[Attribute] = partExprs.map {
      case a: AttributeReference => a
      case _                     => return None
    }

    // ---- ordering: uniform direction, default null placement (see
    // scaladoc: this is what makes max_by/min_by reproduce the window's
    // null-extended-row placement), deterministic, match-side
    val forward = w.orderSpec.head.direction == Descending
    val defaultNulls = if (forward) NullsLast else NullsFirst
    val uniform = w.orderSpec.zip(ordExprs).forall { case (so, e) =>
      so.direction == (if (forward) Descending else Ascending) &&
      so.nullOrdering == defaultNulls &&
      e.deterministic &&
      RowOrdering.isOrderable(e.dataType)
    }
    if (!uniform) return None
    val rt = ordExprs.head match {
      case a: AttributeReference if watermarked(a) && orderableNonFloating(a.dataType) => a
      case _ => return None // unwatermarked (or computed) time axis: no state story
    }

    // ---- the join must carry ≥1 equi conjunct and a TWO-SIDED bound on
    // rt against watermarked anchor-side time expressions — the bounds
    // stay in the join verbatim (they are its state-eviction contract);
    // strict and inclusive both qualify (the condition is not rewritten,
    // only proven bounded)
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => (onAnchor(a) && onMatch(b)) || (onMatch(a) && onAnchor(b))
      case _             => false
    }
    if (!hasEqui) return None
    def anchorTimeExpr(e: Expression): Boolean =
      onAnchor(e) && e.references.exists {
        case a: Attribute => watermarked(a)
        case _            => false
      }
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(r, a) if r.semanticEquals(rt) && anchorTimeExpr(a) => a
      case GreaterThan(r, a) if r.semanticEquals(rt) && anchorTimeExpr(a)        => a
      case LessThanOrEqual(a, r) if r.semanticEquals(rt) && anchorTimeExpr(a)    => a
      case LessThan(a, r) if r.semanticEquals(rt) && anchorTimeExpr(a)           => a
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(r, b) if r.semanticEquals(rt) && anchorTimeExpr(b)    => b
      case LessThan(r, b) if r.semanticEquals(rt) && anchorTimeExpr(b)           => b
      case GreaterThanOrEqual(b, r) if r.semanticEquals(rt) && anchorTimeExpr(b) => b
      case GreaterThan(b, r) if r.semanticEquals(rt) && anchorTimeExpr(b)        => b
    }
    if (lowers.isEmpty || uppers.isEmpty) return None

    // ---- build: Aggregate(P, P :+ best, join) + restore f.output
    val joinOut = j.output
    val groupIds = groupAttrs.map(_.exprId).toSet
    val nonGroup = joinOut.filterNot(a => groupIds.contains(a.exprId))
    if (nonGroup.isEmpty) return None
    val ordStruct = CreateStruct(ordExprs)
    val valStruct = CreateStruct(nonGroup)
    val pick =
      if (forward) MaxBy(valStruct, ordStruct).toAggregateExpression()
      else MinBy(valStruct, ordStruct).toAggregateExpression()
    val pickAlias = Alias(pick, "__graft_top1")()
    val agg = Aggregate(groupAttrs, (groupAttrs :+ pickAlias).map(_.asInstanceOf[NamedExpression]), j)
    val pickAttr = pickAlias.toAttribute
    // every join output attr back under its ORIGINAL exprId (group keys
    // pass through; the rest extract from the winner struct — positional
    // fields, so duplicate names across the sides are harmless)
    val restored = Project(
      joinOut.map { a =>
        if (groupIds.contains(a.exprId)) a
        else {
          val idx = nonGroup.indexWhere(_.exprId == a.exprId)
          Alias(GetStructField(pickAttr, idx, Some(a.name)), a.name)(
            exprId = a.exprId, qualifier = a.qualifier)
        }
      },
      agg)
    // recreate the below-window Project's computed aliases (same exprIds —
    // Alias carries its id) over the restored join columns
    val belowAgain: LogicalPlan =
      belowProject.map(p => p.copy(child = restored)).getOrElse(restored)
    val filtered = remaining.reduceOption(And).map(Filter(_, belowAgain)).getOrElse(belowAgain)
    // exactly f.output: rk is constant 1 on every surviving row
    val out = Project(
      f.output.map { a =>
        if (a.exprId == rk.exprId)
          Alias(Literal(1), a.name)(exprId = a.exprId, qualifier = a.qualifier)
        else a
      },
      filtered)
    Some(out)
  }
}
