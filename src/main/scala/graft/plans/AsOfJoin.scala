package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending,
  Descending,
  Attribute,
  AttributeSet,
  Expression,
  GenericInternalRow,
  JoinedRow,
  RowOrdering,
  SortOrder,
  UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.plans.logical.statsEstimation.EstimationUtils
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Output mode of the keyed as-of join.
  *
  *  - [[AsOfJoinMode.Inner]]: one row per left row with a match (the
  *    latest right row at or before its time), left ++ right columns.
  *  - [[AsOfJoinMode.Outer]]: every left row, null-extended when no
  *    right row precedes it.
  *  - [[AsOfJoinMode.Semi]]: left rows with ≥ 1 same-key right row at or
  *    before their time, once, left columns only — the single-bound
  *    `EXISTS (SELECT … WHERE rk = k AND rt <= t)` "has a prior
  *    version" idiom.
  *  - [[AsOfJoinMode.Anti]]: left rows with NO such right row — the
  *    staleness/orphan idiom (`NOT EXISTS …`).
  *  - [[AsOfJoinMode.Existence]]: every left row once, plus a boolean
  *    flag — the shape Spark's `RewritePredicateSubquery` plans for an
  *    EXISTS that cannot become a semi/anti join.
  *
  * The existence family needs no row buffering at all: the merge already
  * carries O(1) state, and "∃ rt ≤ t" is just "the carried key matches" —
  * only the matched right KEY is copied, never the row.
  */
sealed abstract class AsOfJoinMode extends Serializable
object AsOfJoinMode {
  case object Inner extends AsOfJoinMode
  case object Outer extends AsOfJoinMode
  case object Semi extends AsOfJoinMode
  case object Anti extends AsOfJoinMode
  final case class Existence(attr: Attribute) extends AsOfJoinMode
}

/** Logical AS-OF join: for every left row, the LATEST right row with the
  * same key and `rightTime <= leftTime` (inclusive — the "state as of this
  * instant" convention), null-extended on the right when `outer`.
  *
  * Spark has no native as-of join; the compositional encoding (union both
  * sides, window `last(... ignoreNulls)` over the interleaved stream —
  * q19) widens every row to the union schema and drags the left side
  * through the window state. This node plans to [[AsOfJoinExec]], a
  * sort-merge operator: both sides hash-partitioned by key and sorted by
  * (key, time), then ONE forward pass per partition with O(1) carried
  * state — the time-series point-in-time join shape (reference semantics:
  * the per-key ordered-processing guarantee of partition_by,
  * lib/broadway/topology.ex partitioning, pointed at temporal joins).
  *
  * `rightTieBreak` columns extend the right sort so equal-time right rows
  * resolve deterministically (the LAST in tie-break order wins, matching
  * `row_number() OVER (ORDER BY t DESC, tb DESC) = 1`).
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    mode: AsOfJoinMode,
    forward: Boolean = true
) extends BinaryNode {

  require(
    leftKeys.length == rightKeys.length,
    s"as-of join key arity mismatch: ${leftKeys.length} vs ${rightKeys.length}"
  )

  /** Convenience for rules that only distinguish the pair-emitting modes. */
  def outer: Boolean = mode == AsOfJoinMode.Outer

  override def output: Seq[Attribute] = mode match {
    case AsOfJoinMode.Inner => left.output ++ right.output
    case AsOfJoinMode.Outer => left.output ++ right.output.map(_.withNullability(true))
    case AsOfJoinMode.Semi | AsOfJoinMode.Anti => left.output
    case AsOfJoinMode.Existence(a)             => left.output :+ a
  }

  // the existence flag originates HERE, not in a child — without this the
  // node's missingInput is non-empty and plan integrity checks reject it
  override def producedAttributes: AttributeSet = mode match {
    case AsOfJoinMode.Existence(a) => AttributeSet(a)
    case _                         => AttributeSet.empty
  }

  /** At most one output row per left row — the join selects the single
    * latest match (outer/existence: exactly one; inner/semi/anti: one or
    * zero). Without this, `Optimizer`'s size framework has no case for an
    * unknown BinaryNode.
    */
  override def maxRows: Option[Long] = left.maxRows

  /** Size estimate for the planner. The stats visitors
    * (`SizeInBytesOnlyStatsPlanVisitor` / `BasicStatsPlanVisitor`)
    * pattern-match built-in nodes only and default an unknown BinaryNode
    * to the PRODUCT of its children's sizeInBytes — so everything planned
    * ABOVE an as-of join would see a wildly inflated size: a small as-of
    * output feeding a subsequent join would never be broadcast, and AQE's
    * size-based choices above the node would be skewed. The true output is
    * one row per left row (inner: at most one), widened by the matched
    * right payload — estimate left's bytes scaled to the output row width.
    * Semi/anti/existence stay in the left side's size class.
    */
  override def stats: Statistics = mode match {
    case AsOfJoinMode.Semi | AsOfJoinMode.Anti | AsOfJoinMode.Existence(_) =>
      left.stats
    case _ =>
      val leftStats = left.stats
      val leftRow = EstimationUtils.getSizePerRow(left.output)
      val outRow = EstimationUtils.getSizePerRow(output)
      Statistics(
        sizeInBytes = (leftStats.sizeInBytes * outRow / leftRow).max(1),
        rowCount = leftStats.rowCount
      )
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): AsOfJoinPlan = copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping [[AsOfJoinPlan]] to [[AsOfJoinExec]] —
  * registered through `GraftExtensions` (injectPlannerStrategy) or
  * imperatively via `spark.experimental.extraStrategies`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, mode, forward) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, mode, forward, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Required distribution: both sides clustered on
  * the join keys (EnsureRequirements co-partitions them — the SAME single
  * shuffle a regular sort-merge join pays, and none if the sides are
  * already bucketed by key). Required ordering: (key, time) ascending —
  * right additionally by the tie-break columns. Each partition then joins
  * in one forward merge holding ONE buffered right row: the most recent
  * right row at or before the current left timestamp for the current key.
  * Per-partition memory is O(1) regardless of key cardinality or skew —
  * there is no hash table and no per-key group materialization, so a
  * hot key degrades to a longer sorted run, never to memory pressure.
  */
final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    mode: AsOfJoinMode,
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {

  override def output: Seq[Attribute] = mode match {
    case AsOfJoinMode.Inner => left.output ++ right.output
    case AsOfJoinMode.Outer => left.output ++ right.output.map(_.withNullability(true))
    case AsOfJoinMode.Semi | AsOfJoinMode.Anti => left.output
    case AsOfJoinMode.Existence(a)             => left.output :+ a
  }

  override def producedAttributes: AttributeSet = mode match {
    case AsOfJoinMode.Existence(a) => AttributeSet(a)
    case _                         => AttributeSet.empty
  }

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      {
        val timeDir = if (forward) Ascending else Descending
        Seq(
          leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
          rightKeys.map(SortOrder(_, Ascending)) ++
            ((rightTime +: rightTieBreak).map(SortOrder(_, timeDir)))
        )
      }: _*
    )

  // one output row per surviving left row, in left order, left partitions
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map(
      "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"),
      "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of matched left rows")
    )

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val out = output
    val emitMode = mode
    // +1: forward merge (latest rt <= t); -1: backward merge over
    // descending-time sorted runs (earliest rt >= t) — the comparison and
    // the scan direction flip together, everything else is identical
    val dirSign = if (forward) 1 else -1

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      // existence flag carriers: 1-field boolean rows joined behind the
      // left row so outProj (bound against lOut :+ flag) can read them
      val flagTrue = new GenericInternalRow(Array[Any](true))
      val flagFalse = new GenericInternalRow(Array[Any](false))
      // the existence family (Semi/Anti/Existence) answers "∃ rt ≤ t"
      // from the carried key alone — the matched right ROW is never
      // copied in those modes
      val needMatchRow = emitMode match {
        case AsOfJoinMode.Inner | AsOfJoinMode.Outer => true
        case _                                       => false
      }
      // bind against `out` (right side nullable when outer), NOT the raw
      // child schemas: BoundReference takes nullability from the input
      // schema, and a non-nullable binding compiles away the null check —
      // a null-extended long would silently read as 0
      val outProj = UnsafeProjection.create(out, out)

      new Iterator[InternalRow] {
        // lookahead right row and its key/time projections. None of the
        // three is copied at fetch: the child's row buffer stays valid
        // until the NEXT rIter.next(), which only happens when this row
        // is consumed — so a blocking lookahead survives across left
        // rows for free, and discarded rows cost zero allocations.
        private var rNext: InternalRow = _
        private var rNextKey: InternalRow = _
        private var rNextTime: InternalRow = _
        // most recent right row emitted for some key (copied — it must
        // outlive its buffer; existence modes skip the row copy), with
        // its key copy; valid for a left row iff the keys still compare
        // equal
        private var matchRow: InternalRow = _
        private var matchKey: InternalRow = _
        private var ready: InternalRow = _

        // SQL as-of semantics: a NULL key never equals anything and a
        // NULL time never satisfies `rightTime <= leftTime` (the rank
        // oracle's `v.ts <= c.ts` discards NULLs) — null-keyed/timed
        // right rows can never match, so skip them at fetch; null-keyed/
        // timed left rows match nothing (null-extended when outer,
        // kept under anti — NOT EXISTS over an always-false condition —
        // flagged false under existence, dropped by inner and semi).
        private def fetchRight(): Unit = {
          rNext = null
          while (rNext == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            val t = rTimeProj(r)
            if (!k.anyNull && !t.isNullAt(0)) {
              rNext = r
              rNextKey = k
              rNextTime = t
            }
          }
        }

        fetchRight()

        private def advance(): Unit = {
          while (ready == null && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTime = lTimeProj(l)
            val lNull = lKey.anyNull || lTime.isNullAt(0)
            var cont = !lNull && rNext != null
            while (cont) {
              val c = keyOrd.compare(rNextKey, lKey)
              if (c < 0 || (c == 0 && dirSign * timeOrd.compare(rNextTime, lTime) <= 0)) {
                if (c == 0) {
                  if (needMatchRow) matchRow = rNext.copy()
                  matchKey = rNextKey.copy()
                }
                fetchRight()
                cont = rNext != null
              } else cont = false
            }
            val matched =
              !lNull && matchKey != null && keyOrd.compare(matchKey, lKey) == 0
            if (matched) numMatchedRows += 1
            emitMode match {
              case AsOfJoinMode.Inner | AsOfJoinMode.Outer =>
                if (matched) {
                  ready = outProj(joined(l, matchRow))
                  numOutputRows += 1
                } else if (emitMode == AsOfJoinMode.Outer) {
                  ready = outProj(joined(l, nullRight))
                  numOutputRows += 1
                }
              case AsOfJoinMode.Semi =>
                if (matched) { ready = l; numOutputRows += 1 }
              case AsOfJoinMode.Anti =>
                if (!matched) { ready = l; numOutputRows += 1 }
              case AsOfJoinMode.Existence(_) =>
                ready = outProj(joined(l, if (matched) flagTrue else flagFalse))
                numOutputRows += 1
            }
          }
        }

        override def hasNext: Boolean = { advance(); ready != null }

        override def next(): InternalRow = {
          advance()
          if (ready == null) throw new NoSuchElementException("empty as-of iterator")
          val r = ready
          ready = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan
  ): AsOfJoinExec = copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point for the native as-of join. Columns are
  * named (resolved against each side's analyzed plan); the right side is
  * re-aliased behind fresh exprIds so self-joins — both sides derived
  * from the same cached source — can't collide.
  */
object AsOf {
  import org.apache.spark.sql.{DataFrame, GraftColumns}
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.Project

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTieBreak: Seq[String] = Nil,
      outer: Boolean = false
  ): DataFrame =
    asofJoinMode(left, right, leftKeys, rightKeys, leftTime, rightTime, rightTieBreak,
      if (outer) AsOfJoinMode.Outer else AsOfJoinMode.Inner)

  /** BACKWARD (next-event) as-of join: for every left row, the EARLIEST
    * right row with the same key and `rightTime >= leftTime` (inclusive) —
    * the forward-looking attribution shape ("click → next purchase",
    * "alert → next heartbeat"). Same merge, run over descending-time
    * sorted runs; equal-time right rows resolve to the LAST in the
    * descending tie-break scan (the smallest tie-break value).
    */
  def asofNextJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTieBreak: Seq[String] = Nil,
      outer: Boolean = false
  ): DataFrame =
    asofJoinMode(left, right, leftKeys, rightKeys, leftTime, rightTime, rightTieBreak,
      if (outer) AsOfJoinMode.Outer else AsOfJoinMode.Inner, forward = false)

  /** Left rows with ≥ 1 same-key right row at or before their time —
    * `EXISTS (SELECT … WHERE rk = k AND rt <= t)`, left columns only.
    * `forward = false` flips the bound to `rt >= t` (the "has a NEXT
    * event" existence test), mirroring the full mode×direction lattice
    * the merge implements — the SQL rewrite and the TVF ('next_semi')
    * already reach it; this closes the Scala API gap.
    */
  def asofSemiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      forward: Boolean = true
  ): DataFrame =
    asofJoinMode(left, right, leftKeys, rightKeys, leftTime, rightTime, Nil,
      AsOfJoinMode.Semi, forward)

  /** Left rows with NO same-key right row at or before their time —
    * `NOT EXISTS …`, the staleness/orphan idiom. `forward = false`
    * flips the bound to `rt >= t` (no later event — the dead-end /
    * last-event idiom).
    */
  def asofAntiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      forward: Boolean = true
  ): DataFrame =
    asofJoinMode(left, right, leftKeys, rightKeys, leftTime, rightTime, Nil,
      AsOfJoinMode.Anti, forward)

  /** Every left row once, plus a boolean `existsCol` flagging whether a
    * same-key right row at or before its time exists — the FLAGGED form
    * of [[asofSemiJoin]]/[[asofAntiJoin]] (EXISTS as a column, not a
    * filter; one pass answers both "attributed?" and "orphan?" without a
    * union of semi + anti). `forward = false` flips the bound to
    * `rt >= t` ("has a NEXT event"). Same cost shape as semi: the merge
    * stops at the first qualifying right row per left row.
    */
  def asofExistsJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      existsCol: String = "matched",
      forward: Boolean = true
  ): DataFrame =
    asofJoinMode(left, right, leftKeys, rightKeys, leftTime, rightTime, Nil,
      AsOfJoinMode.Existence(
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          existsCol, org.apache.spark.sql.types.BooleanType, nullable = false)()),
      forward)

  private def asofJoinMode(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTieBreak: Seq[String],
      mode: AsOfJoinMode,
      forward: Boolean = true
  ): DataFrame = {
    val spark = left.sparkSession
    graft.GraftExtensions.register(spark)
    GraftColumns.ofRows(
      spark,
      planFor(
        left.queryExecution.analyzed,
        right.queryExecution.analyzed,
        leftKeys,
        rightKeys,
        leftTime,
        rightTime,
        rightTieBreak,
        mode,
        // honor the session's case-sensitivity setting
        // (spark.sql.caseSensitive) like every other DataFrame API
        spark.sessionState.conf.resolver,
        forward
      )
    )
  }

  /** Name-resolved plan construction shared by [[asofJoin]] and the SQL
    * table function `graft_asof_join` ([[TableFunctions.asof]]). The
    * right side is re-aliased behind fresh exprIds so self-joins — both
    * sides derived from the same relation — can't collide.
    */
  private[plans] def planFor(
      lPlan: LogicalPlan,
      rAnalyzed: LogicalPlan,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTieBreak: Seq[String],
      mode: AsOfJoinMode,
      nameMatches: (String, String) => Boolean,
      forward: Boolean = true
  ): AsOfJoinPlan = {
    // Stream-static soundness boundary: a STREAMING LEFT against a static
    // right is stateless per left row, so per-micro-batch execution is
    // exactly correct (StreamStaticJoinSpec). A STREAMING RIGHT is not —
    // "latest right row ≤ t" depends on right rows from EVERY batch, so a
    // pair emitted against batch 1's latest is silently superseded by
    // batch 2 (the stateful variant is streaming/AsOfStream). Refuse
    // loudly instead of emitting wrong per-batch answers.
    if (rAnalyzed.isStreaming) {
      throw new IllegalArgumentException(
        "as-of join: the right (versions) side cannot be a streaming source — " +
          "each micro-batch would see only its own slice of the versions and " +
          "emit matches a later batch supersedes; use graft.streaming.AsOfStream " +
          "for a growing right side, graft.streaming.EventTime.asofJoinBounded " +
          "when BOTH sides stream (bounded-lookback as-of — the bound is what " +
          "makes the state finite), or swap the sides if the right is the stream")
    }
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    val rOut = rAliases.map(_.toAttribute)
    def resolve(attrs: Seq[Attribute], n: String, side: String): Attribute =
      attrs.filter(a => nameMatches(a.name, n)) match {
        case Seq(a) => a
        case Seq() =>
          throw new IllegalArgumentException(s"as-of join: no column '$n' on the $side side")
        case many => // silent first-match binding would return wrong rows
          throw new IllegalArgumentException(
            s"as-of join: column '$n' is ambiguous on the $side side (${many.size} matches)"
          )
      }
    def la(n: String): Attribute = resolve(lPlan.output, n, "left")
    def ra(n: String): Attribute = resolve(rOut, n, "right")
    AsOfJoinPlan(
      lPlan,
      rPlan,
      leftKeys.map(la),
      rightKeys.map(ra),
      la(leftTime),
      ra(rightTime),
      rightTieBreak.map(ra),
      mode,
      forward
    )
  }
}
