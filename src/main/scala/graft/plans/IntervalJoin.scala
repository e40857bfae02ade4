package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending,
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
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Output mode of the keyed interval-containment join.
  *
  *  - [[IntervalJoinMode.Inner]]: one row per (point, covering interval)
  *    pair.
  *  - [[IntervalJoinMode.Outer]]: inner plus one null-extended row for
  *    each uncovered point.
  *  - [[IntervalJoinMode.Semi]]: each point covered by ≥ 1 interval, once,
  *    left columns only (`EXISTS (SELECT … WHERE k = rk AND t BETWEEN s
  *    AND e)` — the "keep rows inside a validity window" idiom).
  *  - [[IntervalJoinMode.Anti]]: each point covered by NO interval, once,
  *    left columns only (`NOT EXISTS …` — the purge/tombstone idiom).
  *  - [[IntervalJoinMode.Existence]]: EVERY point once, left columns plus
  *    a boolean flag (`attr`) telling whether ≥ 1 interval covers it —
  *    the shape Spark's `RewritePredicateSubquery` plans for an EXISTS
  *    that cannot become a semi/anti join (`WHERE p OR EXISTS(…)`, a
  *    flag consumed by a CASE, …). Same sweep as Semi, but emission is
  *    unconditional.
  *  - [[IntervalJoinMode.FullOuter]]: inner plus one null-extended row
  *    for each uncovered point AND one for each interval containing no
  *    point — the reconciliation shape ("orphans on both sides in one
  *    pass"). Costs nothing extra structurally: an interval admitted to
  *    the active buffer necessarily covers the admitting point, so the
  *    unmatched intervals are exactly the rows the sweep SKIPS
  *    (dead-on-arrival, keys between point keys, the post-points tail),
  *    emitted null-extended at the skip site.
  */
sealed abstract class IntervalJoinMode extends Serializable
object IntervalJoinMode {
  case object Inner extends IntervalJoinMode
  case object Outer extends IntervalJoinMode
  case object Semi extends IntervalJoinMode
  case object Anti extends IntervalJoinMode
  final case class Existence(attr: Attribute) extends IntervalJoinMode
  case object FullOuter extends IntervalJoinMode
}

/** Logical keyed INTERVAL-CONTAINMENT join: for every left (point) row,
  * every right (interval) row with the same key and
  * `rightStart <= leftTime <= rightEnd` (both bounds inclusive),
  * null-extended on the right when `outer` and no interval contains the
  * point.
  *
  * Spark plans an equi-key join with range predicates as a sort-merge
  * join on the key ONLY: every right row of the key group is buffered and
  * the range condition filters AFTER the match — a hot key degrades to
  * points×intervals work and a group-sized buffer. This node plans to
  * [[IntervalJoinExec]], a sweep-line merge: both sides hash-partitioned
  * by key and sorted by (key, time) / (key, start), then one forward pass
  * per partition holding only the ACTIVE intervals (started, not yet
  * ended) — memory bounded by the key's maximum concurrent-overlap
  * degree, never its row count, and work linear in input + output. The
  * sibling of [[AsOfJoinPlan]] for "which intervals cover this instant"
  * (sessionization containment, validity/SCD-2 windows, concurrency
  * queries — the q84/q197 family keyed per entity).
  */
final case class IntervalJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    mode: IntervalJoinMode
) extends BinaryNode {

  require(
    leftKeys.length == rightKeys.length,
    s"interval join key arity mismatch: ${leftKeys.length} vs ${rightKeys.length}"
  )

  override def output: Seq[Attribute] = mode match {
    case IntervalJoinMode.Inner => left.output ++ right.output
    case IntervalJoinMode.Outer => left.output ++ right.output.map(_.withNullability(true))
    case IntervalJoinMode.FullOuter =>
      left.output.map(_.withNullability(true)) ++ right.output.map(_.withNullability(true))
    // existence modes emit left rows only — the EXISTS / NOT EXISTS
    // containment idiom (dedup admission, purge)
    case IntervalJoinMode.Semi | IntervalJoinMode.Anti => left.output
    case IntervalJoinMode.Existence(a)                 => left.output :+ a
  }

  // the existence flag originates HERE, not in a child — without this the
  // node's missingInput is non-empty and plan integrity checks reject it
  override def producedAttributes: AttributeSet = mode match {
    case IntervalJoinMode.Existence(a) => AttributeSet(a)
    case _                             => AttributeSet.empty
  }

  /** Worst case every point of a key matches every interval of that key —
    * the product, guarded against overflow (Join's convention). Outer
    * additionally emits unmatched points, so a zero-row right side still
    * yields up to left.maxRows rows; full outer adds unmatched rows of
    * BOTH sides (≤ l·r + l + r). Semi/anti emit each left row at most
    * once.
    */
  override def maxRows: Option[Long] = mode match {
    case IntervalJoinMode.Semi | IntervalJoinMode.Anti | IntervalJoinMode.Existence(_) =>
      left.maxRows
    case IntervalJoinMode.FullOuter =>
      (left.maxRows, right.maxRows) match {
        case (Some(l), Some(r)) =>
          val p = BigInt(l) * BigInt(r) + BigInt(l) + BigInt(r)
          if (p.isValidLong) Some(p.toLong) else None
        case _ => None
      }
    case _ =>
      (left.maxRows, right.maxRows) match {
        case (Some(l), Some(r)) =>
          val p = BigInt(l) *
            BigInt(if (mode == IntervalJoinMode.Outer) math.max(r, 1L) else r)
          if (p.isValidLong) Some(p.toLong) else None
        case _ => None
      }
  }

  /** Size estimate for the planner. The default stats visitors assign an
    * unknown BinaryNode the PRODUCT of its children's sizeInBytes — every
    * operator above an interval join would plan against that fiction
    * (never broadcasting its output, skewing AQE and the
    * [[RangeJoinRewrite]] cost guard when a rewritten node feeds another
    * candidate join). The sweep-line targets sparse-overlap axes where
    * output ~ input, so estimate the SUM of the children — the same
    * shape-agnostic heuristic class Spark applies to unestimable joins,
    * far closer than the product and conservative enough (it can
    * under-estimate only when overlap degree is high, where AQE's runtime
    * sizes take over). Semi/anti never exceed the left side — Spark's own
    * `visitJoin` convention for LeftSemi/LeftAnti.
    */
  override def stats: Statistics = mode match {
    // existence adds one boolean per row — the left side's size class
    case IntervalJoinMode.Semi | IntervalJoinMode.Anti | IntervalJoinMode.Existence(_) =>
      left.stats
    case _ =>
      // SUM of children × a fan-out headroom factor, clamped by the
      // PRODUCT (the true worst case). The bare sum under-estimates dense
      // overlap — a parent join could wrongly broadcast a high-fan-out
      // interval result and OOM before AQE's runtime sizes (which only
      // correct at shuffle-stage boundaries) can intervene; the bare
      // product re-creates the default-visitor fiction the override
      // exists to kill. The factor is a session knob for axes whose
      // overlap degree is known.
      val sum = left.stats.sizeInBytes + right.stats.sizeInBytes
      val product = left.stats.sizeInBytes * right.stats.sizeInBytes
      val factor = BigInt(IntervalJoinPlan.statsFanoutFactor(conf))
      Statistics(sizeInBytes = (sum * factor).min(product.max(sum)).max(1))
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): IntervalJoinPlan = copy(left = newLeft, right = newRight)
}

object IntervalJoinPlan {
  /** Headroom multiplier on the children-sum size estimate for the
    * pair-emitting modes — the planner sees `min(product, factor × sum)`.
    * Raise it for axes with known-dense overlap (so parents never
    * broadcast the join's output); the default keeps a sparse-overlap
    * result in the same size class as its inputs while staying 8×
    * more conservative than the bare sum.
    */
  val StatsFanoutKey = "spark.graft.intervalJoin.statsFanoutFactor"

  private[plans] def statsFanoutFactor(conf: org.apache.spark.sql.internal.SQLConf): Long = {
    val raw = conf.getConfString(StatsFanoutKey, "8").trim
    val parsed =
      try raw.toLong
      catch {
        case e: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$StatsFanoutKey must be a positive long, got '$raw'", e)
      }
    require(parsed > 0, s"$StatsFanoutKey must be positive, got $parsed")
    parsed
  }
}

/** Planner strategy mapping [[IntervalJoinPlan]] to [[IntervalJoinExec]] —
  * registered through `GraftExtensions` (injectPlannerStrategy) or
  * imperatively via `spark.experimental.extraStrategies`.
  */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, lk, rk, lt, rs, re, mode) =>
      IntervalJoinExec(lk, rk, lt, rs, re, mode, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sweep-line interval-containment join. Required distribution: both
  * sides clustered on the join keys (the same single shuffle a sort-merge
  * join pays, and none when the sides are bucketed by key). Required
  * ordering: left (key, time), right (key, start), both ascending. Each
  * partition then merges forward once: right intervals of the current key
  * enter the active buffer as their start passes the sweep position,
  * leave it as soon as their end falls behind, and every left point emits
  * one row per interval still active — so per-partition memory is the
  * maximum number of intervals simultaneously covering one instant of one
  * key (the overlap degree), not the key's group size, and total work is
  * O(input + output).
  *
  * SQL semantics: NULL keys/times/bounds never match (skipped at fetch on
  * the right; matched-against-nothing on the left); inverted intervals
  * (end < start) contain no instant and fall out naturally.
  */
final case class IntervalJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    mode: IntervalJoinMode,
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {

  override def output: Seq[Attribute] = mode match {
    case IntervalJoinMode.Inner => left.output ++ right.output
    case IntervalJoinMode.Outer => left.output ++ right.output.map(_.withNullability(true))
    case IntervalJoinMode.FullOuter =>
      left.output.map(_.withNullability(true)) ++ right.output.map(_.withNullability(true))
    case IntervalJoinMode.Semi | IntervalJoinMode.Anti => left.output
    case IntervalJoinMode.Existence(a)                 => left.output :+ a
  }

  override def producedAttributes: AttributeSet = mode match {
    case IntervalJoinMode.Existence(a) => AttributeSet(a)
    case _                             => AttributeSet.empty
  }

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightStart).map(SortOrder(_, Ascending))
    )

  // Output rows follow left row order within each left partition — except
  // under FullOuter, where null-left rows interleave: their LEFT key
  // columns are null while the row physically sits in the partition its
  // RIGHT key hashed to, so any left-attribute partitioning/ordering
  // claim would be false (SMJ's FullOuter makes the same demotion).
  override def outputPartitioning: Partitioning = mode match {
    case IntervalJoinMode.FullOuter =>
      org.apache.spark.sql.catalyst.plans.physical
        .UnknownPartitioning(left.outputPartitioning.numPartitions)
    case _ => left.outputPartitioning
  }
  override def outputOrdering: Seq[SortOrder] = mode match {
    case IntervalJoinMode.FullOuter => Nil
    case _                          => left.outputOrdering
  }

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map(
      "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"),
      "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of matched left rows"),
      // NOTE: SQLMetrics merge task updates by SUM, so the headline number
      // is the sum of per-task peaks; the per-task peak itself is the
      // size-metric's max statistic (min/med/max are per-task values)
      "maxActiveIntervals" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createSizeMetric(sparkContext, "active intervals (sum of task peaks; per-task peak = max stat)"),
      "numSpilledKeys" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "keys degraded to the spillable active buffer")
    )

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val maxActive = longMetric("maxActiveIntervals")
    // Budget on the ACTIVE-interval buffer. The buffer is bounded by a
    // key's maximum concurrent-overlap degree — but a pathological input
    // (every interval of one key spanning the whole axis) silently
    // degrades that bound to the key's group size. Fail loud with the
    // offending key instead of spilling toward an executor OOM — the
    // `require(converged)` discipline of connectedComponents.
    // Parsed ONCE on the driver (doExecute runs there), so a bad value
    // fails the job before any task launches — and names the conf key
    // instead of surfacing as a bare NumberFormatException.
    val activeBudget = {
      val raw = conf.getConfString(IntervalJoinExec.MaxActiveKey, "10000000").trim
      val parsed =
        try raw.toLong
        catch {
          case e: NumberFormatException =>
            throw new IllegalArgumentException(
              s"${IntervalJoinExec.MaxActiveKey} must be a positive long, got '$raw'", e)
        }
      require(parsed > 0, s"${IntervalJoinExec.MaxActiveKey} must be positive, got $parsed")
      parsed
    }
    // Scale-safe alternative to the abort: beyond the budget, a key's
    // active set migrates to a disk-spillable row array (the structure
    // SMJ/Window use for oversized groups) — memory stays bounded by the
    // task memory manager while work stays linear in input + output (the
    // per-point rebuild cost is amortized by the emission fan-out it
    // accompanies). Off by default: the loud abort is the right first
    // answer to an axis-spanning hot key, and the spill path trades it
    // for throughput only when the operator EXPECTS dense overlap.
    // Budget and spill govern ONLY the pair-emitting modes
    // (inner/outer/full): the existence family (semi/anti/existence)
    // answers from an O(1) running-max end bound and never buffers.
    val spillEnabled = conf
      .getConfString(IntervalJoinExec.SpillKey, "false")
      .trim
      .equalsIgnoreCase("true")
    val spillInMemRows = conf.windowExecBufferInMemoryThreshold
    val spillRows = conf.windowExecBufferSpillThreshold
    val spillBytes = conf.windowExecBufferSpillSizeThreshold
    val numSpilledKeys = longMetric("numSpilledKeys")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rStartExpr = rightStart
    val rEndExpr = rightEnd
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val out = output
    val emitMode = mode

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rBoundsProj = UnsafeProjection.create(Seq(rStartExpr, rEndExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val nullLeft = new GenericInternalRow(lOut.size)
      val emitFull = emitMode == IntervalJoinMode.FullOuter
      // existence flag carriers: 1-field boolean rows joined behind the
      // left row so outProj (bound against lOut :+ flag) can read them
      val flagTrue = new GenericInternalRow(Array[Any](true))
      val flagFalse = new GenericInternalRow(Array[Any](false))
      // bind against `out` (right side nullable when outer), NOT the raw
      // child schemas — BoundReference takes nullability from the input
      // schema and a non-nullable binding compiles away the null check
      val outProj = UnsafeProjection.create(out, out)

      new Iterator[InternalRow] {
        // lookahead right row (uncopied — valid until the next fetch) with
        // its key and (start, end) projections
        private var rNext: InternalRow = _
        private var rNextKey: InternalRow = _
        private var rNextBounds: InternalRow = _
        // active intervals of the current left key: (copied row, copied
        // end-bound single-field row), insertion-ordered by start
        private val active = new scala.collection.mutable.ArrayBuffer[(InternalRow, InternalRow)]
        // Existence family (Semi/Anti/Existence): containment is
        // ∃(s,e): s ≤ t ≤ e  ⟺  max{e : s ≤ t, same key} ≥ t, so the sweep
        // carries ONE copied end bound instead of the active buffer —
        // O(1) state per key: no budget, no spill, axis-spanning hot keys
        // cost nothing. Sound because points ascend within a key and
        // admission is by ascending start: every same-key interval with
        // s ≤ t has been folded into the max by the time t is tested, and
        // an end bound that fails t can never cover a later t' > t.
        private val existenceMode = emitMode match {
          case IntervalJoinMode.Semi | IntervalJoinMode.Anti |
              IntervalJoinMode.Existence(_) => true
          case _ => false
        }
        private var existMaxEnd: InternalRow = _ // copied 1-field end row
        private def existCovered(lTime: InternalRow): Boolean =
          existMaxEnd != null && timeOrd.compare(existMaxEnd, lTime) >= 0
        // FullOuter only: copies of right rows the sweep skipped — an
        // admitted interval necessarily covers the admitting point, so
        // the UNMATCHED intervals are exactly the skipped rows
        // (dead-on-arrival, keys between point keys, null keys/bounds);
        // they drain null-extended ahead of the next point's emissions.
        // Size is output-proportional (each entry IS one output row).
        private val dropped = new scala.collection.mutable.ArrayBuffer[InternalRow]
        // FullOuter only: past the heap cap, skipped rows overflow to a
        // disk-spillable array — a point-free stretch of the right side
        // (e.g. a right table with far more keys than the left partition
        // holds points) accumulates the WHOLE inter-point gap before the
        // next drain site, and that gap is bounded by the right side, not
        // by the output already emitted. Two arrays swap like the spill
        // sweep's cur/new pair: `droppedDraining` is lazily consumed by
        // `pending` while fresh skips append to `droppedOverflow`.
        private var droppedOverflow: org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray = _
        private var droppedDraining: org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray = _

        private def addDropped(r: InternalRow): Unit =
          if (droppedOverflow != null && droppedOverflow.length > 0) {
            droppedOverflow.add(toUnsafe(r))
          } else if (dropped.length < spillInMemRows) {
            dropped += r.copy()
          } else {
            if (droppedOverflow == null) {
              droppedOverflow = new org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray(
                spillInMemRows, spillBytes, spillRows, spillBytes)
            }
            droppedOverflow.add(toUnsafe(r))
          }

        /** Every buffered skipped right row (heap + overflow) as ONE lazy
          * iterator of null-extended output rows; bumps numOutputRows by
          * the drained count. Swapping the overflow pair is safe here:
          * the previous drain's iterator was exhausted before advance()
          * could run again, so the returning array can be cleared.
          */
        private def drainDropped(): Iterator[InternalRow] = {
          val heapBatch = dropped.toVector
          dropped.clear()
          val overflowIter: Iterator[InternalRow] =
            if (droppedOverflow != null && droppedOverflow.length > 0) {
              val t = droppedDraining
              droppedDraining = droppedOverflow
              droppedOverflow = t
              if (droppedOverflow != null) droppedOverflow.clear()
              droppedDraining.generateIterator()
            } else Iterator.empty
          // count per pulled row, not eagerly at drain time — a parent
          // LIMIT may consume only a prefix, and the metric must report
          // rows actually emitted
          (heapBatch.iterator ++ overflowIter).map { r =>
            numOutputRows += 1
            outProj(joined(nullLeft, r))
          }
        }

        private def droppedNonEmpty: Boolean =
          dropped.nonEmpty || (droppedOverflow != null && droppedOverflow.length > 0)

        // FullOuter only: the post-points right tail has been emitted
        private var drainedRight = false
        private var activeKey: InternalRow = _ // copied key `active` belongs to
        private var peak = 0L
        // projected output rows pending for the current left row; LAZY:
        // `joined`/`outProj` are reused buffers, valid under the standard
        // Spark row-reuse contract (each returned row is overwritten by
        // the next `next()`), and `active`/`l` cannot mutate while
        // pending drains — advance() only runs once pending is exhausted
        private var pending: Iterator[InternalRow] = Iterator.empty

        // a single-row iterator whose row is produced ONLY when pulled —
        // used where an eagerly projected row could sit buffered behind
        // other rows that project through the same reused outProj buffer
        // (the FullOuter dropped-interval prepend). Iterator.fill takes
        // its element BY NAME and evaluates per next(), exactly the
        // laziness needed.
        private def lazySingle(make: => InternalRow): Iterator[InternalRow] =
          Iterator.fill(1)(make)

        // single-field extractors over the 2-field (start, end) bounds
        // row, so timeOrd can compare either bound against a left time;
        // pre-bound expressions (no input-schema binding)
        private val startRowOf = UnsafeProjection.create(
          Seq(org.apache.spark.sql.catalyst.expressions.BoundReference(0, timeType, nullable = false))
        )
        private val endRowOf = UnsafeProjection.create(
          Seq(org.apache.spark.sql.catalyst.expressions.BoundReference(1, timeType, nullable = false))
        )

        // ---- hot-key degradation (conf-gated spill mode) ----------------
        // Once a key's active set would exceed the budget and the spill
        // path is enabled, the set migrates to a disk-spillable row array
        // (the structure SMJ/Window use for oversized groups). Eviction
        // becomes a REBUILD — survivors copy to the scratch array, fused
        // with emission — so per-point work is O(active), the same order
        // as the inner/outer emission fan-out the point pays anyway, and
        // task memory stays bounded by the memory manager instead of the
        // key's overlap degree. The key reverts to the fast path (empty
        // ArrayBuffer) at the next key change.
        private var spillMode = false
        private var spillCur: org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray = _
        private var spillNew: org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray = _
        private val toUnsafe = UnsafeProjection.create(rOut, rOut)
        // separate bounds projection for the rebuild pass: rBoundsProj's
        // output buffer backs the lookahead's rNextBounds and must not be
        // clobbered while the lookahead is still pending admission
        private val rBoundsProj2 = UnsafeProjection.create(Seq(rStartExpr, rEndExpr), rOut)

        private def enterSpillMode(): Unit = {
          if (spillCur == null) {
            spillCur = new org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray(
              spillInMemRows, spillBytes, spillRows, spillBytes)
            spillNew = new org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray(
              spillInMemRows, spillBytes, spillRows, spillBytes)
          }
          // migrate the fast-path buffer: every entry survived this
          // point's eviction, so all re-qualify during the rebuild pass
          active.foreach { case (r, _) => spillCur.add(toUnsafe(r)) }
          active.clear()
          spillMode = true
          numSpilledKeys += 1
        }

        private def finishSweep(): Unit = {
          val t = spillCur; spillCur = spillNew; spillNew = t
          spillNew.clear()
          if (peak < spillCur.length) { peak = spillCur.length; maxActive.set(peak) }
        }

        /** One sweep position in spill mode: rebuild the active array
          * (dropping intervals that ended before `lTime`), admit same-key
          * arrivals, and set `pending` per the emit mode. Inner/outer run
          * LAZILY — the fan-out can be huge and must not materialize;
          * semi/anti need the full containment answer before emitting
          * their single row, so they sweep eagerly (bounded output).
          */
        private def sweepSpilled(l: InternalRow, lTime: InternalRow): Unit = {
          val passIter = spillCur.generateIterator()
          emitMode match {
            case IntervalJoinMode.Semi | IntervalJoinMode.Anti |
                IntervalJoinMode.Existence(_) =>
              // unreachable: the existence family answers from the O(1)
              // running-max end bound and never buffers an active set, so
              // enterSpillMode cannot fire for it
              throw new IllegalStateException(
                s"spill sweep reached for existence-family mode $emitMode")
            case _ =>
              pending = new Iterator[InternalRow] {
                private var phase = 0 // 0 rebuild, 1 admission, 2 finish, 3 done
                // true (l, r) matches only — full outer also streams
                // null-extended SKIPPED intervals through `ready`, and
                // those must not suppress the point's own null-extension
                private var matchedEmits = 0L
                private var ready: InternalRow = _
                private def computeNext(): Unit = {
                  while (ready == null && phase == 0) {
                    if (passIter.hasNext) {
                      val r = passIter.next()
                      if (timeOrd.compare(endRowOf(rBoundsProj2(r)), lTime) >= 0) {
                        spillNew.add(toUnsafe(r))
                        matchedEmits += 1
                        // outProj copies into its own buffer, so `ready`
                        // survives the array iterator's row reuse
                        ready = outProj(joined(l, r))
                      }
                    } else phase = 1
                  }
                  while (ready == null && phase == 1) {
                    if (rNext == null) phase = 2
                    else {
                      val c = keyOrd.compare(rNextKey, activeKey)
                      if (c < 0) {
                        // skipped key: unmatched — full outer emits it
                        // null-extended (project BEFORE fetchRight
                        // clobbers the lookahead)
                        if (emitFull) ready = outProj(joined(nullLeft, rNext))
                        fetchRight()
                      } else if (c == 0 && timeOrd.compare(startRowOf(rNextBounds), lTime) <= 0) {
                        if (timeOrd.compare(endRowOf(rNextBounds), lTime) >= 0) {
                          spillNew.add(toUnsafe(rNext))
                          matchedEmits += 1
                          ready = outProj(joined(l, rNext))
                        } else if (emitFull) {
                          // dead on arrival: contains no point (see the
                          // fast-path argument) — unmatched
                          ready = outProj(joined(nullLeft, rNext))
                        }
                        fetchRight()
                      } else phase = 2
                    }
                  }
                  if (ready == null && phase == 2) {
                    finishSweep()
                    if (matchedEmits > 0) numMatchedRows += 1
                    else if (emitMode == IntervalJoinMode.Outer || emitFull) {
                      ready = outProj(joined(l, nullRight))
                    }
                    phase = 3
                  }
                }
                override def hasNext: Boolean = { computeNext(); ready != null }
                override def next(): InternalRow = {
                  computeNext()
                  if (ready == null) throw new NoSuchElementException("empty spill sweep")
                  val r = ready
                  ready = null
                  numOutputRows += 1
                  r
                }
              }
          }
        }

        // NULL key/start/end right rows can never contain a point — skip
        // at fetch (full outer preserves them null-extended, like SQL).
        // Rows are copied only when buffered.
        private def fetchRight(): Unit = {
          rNext = null
          while (rNext == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            val b = rBoundsProj(r)
            if (!k.anyNull && !b.anyNull) {
              rNext = r
              rNextKey = k
              rNextBounds = b
            } else if (emitFull) {
              addDropped(r)
            }
          }
        }

        fetchRight()

        private def advance(): Unit = {
          while (!pending.hasNext && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTime = lTimeProj(l)
            val lNull = lKey.anyNull || lTime.isNullAt(0)
            if (!lNull) {
              // key change: the active set belongs to a previous key
              if (activeKey == null || keyOrd.compare(activeKey, lKey) != 0) {
                active.clear()
                existMaxEnd = null
                if (spillMode) { spillCur.clear(); spillMode = false }
                activeKey = lKey.copy()
              }
              // evict intervals that ended before this point FIRST, so the
              // budget below counts only truly-concurrent intervals — an
              // admission-before-eviction order would charge already-dead
              // intervals against the budget and abort spuriously
              // one-pass in-place compaction: copy survivors forward and
              // trim the tail once. (remove(i) inside the scan shifts the
              // whole tail per removal — with a large active set a
              // mass-expiry point paid a quadratic-ish compaction.)
              if (active.nonEmpty) {
                var i = 0
                var w = 0
                while (i < active.length) {
                  val a = active(i)
                  if (timeOrd.compare(endRowOf(a._2), lTime) >= 0) {
                    if (w != i) active(w) = a
                    w += 1
                  }
                  i += 1
                }
                if (w < active.length) active.takeInPlace(w)
              }
              // admit right intervals: skip keys before ours outright;
              // same-key intervals whose start has passed either enter
              // the active set or — if their end also lies behind the
              // sweep — die on arrival, never buffered
              var switched = spillMode
              if (!switched) {
                var cont = rNext != null
                while (cont) {
                  val c = keyOrd.compare(rNextKey, lKey)
                  if (c < 0) {
                    // a whole right key the points skipped over — under
                    // full outer every such interval is unmatched
                    if (emitFull) addDropped(rNext)
                    fetchRight(); cont = rNext != null
                  } else if (c == 0 && timeOrd.compare(startRowOf(rNextBounds), lTime) <= 0) {
                    if (existenceMode) {
                      // fold into the running max; DOA intervals
                      // (e < t) are handled naturally — their end can
                      // never raise the max past any current-or-later t
                      val endRow = endRowOf(rNextBounds)
                      if (existMaxEnd == null || timeOrd.compare(endRow, existMaxEnd) > 0) {
                        existMaxEnd = endRow.copy()
                      }
                      fetchRight(); cont = rNext != null
                    } else if (timeOrd.compare(endRowOf(rNextBounds), lTime) >= 0) {
                      if (active.length >= activeBudget) {
                        if (spillEnabled) {
                          // degrade this key to the spillable buffer; the
                          // lookahead row stays put — the spill sweep
                          // admits it (and everything after it) itself
                          enterSpillMode()
                          switched = true
                          cont = false
                        } else {
                          val keyRendered = activeKey.toSeq(keyTypes).mkString("[", ", ", "]")
                          throw new IllegalStateException(
                            s"interval join active-interval budget exceeded: key $keyRendered holds " +
                              s"more than $activeBudget simultaneously-active intervals " +
                              s"(set ${IntervalJoinExec.MaxActiveKey} to raise the budget, enable " +
                              s"${IntervalJoinExec.SpillKey} to degrade hot keys to a spillable " +
                              "buffer, or split axis-spanning intervals before joining)")
                        }
                      } else {
                        active += ((rNext.copy(), rNextBounds.copy()))
                        fetchRight(); cont = rNext != null
                      }
                    } else {
                      // dead on arrival: start has passed but end lies
                      // behind the sweep — since the right side is
                      // start-sorted and this point is the first with
                      // start <= time, NO earlier point fell inside it
                      // either: unmatched under full outer
                      if (emitFull) addDropped(rNext)
                      fetchRight(); cont = rNext != null
                    }
                  } else cont = false
                }
              }
              if (switched) {
                sweepSpilled(l, lTime)
              } else {
              if (peak < active.length) { peak = active.length; maxActive.set(peak) }
              emitMode match {
                case IntervalJoinMode.Inner | IntervalJoinMode.Outer |
                    IntervalJoinMode.FullOuter =>
                  if (active.nonEmpty) {
                    numMatchedRows += 1
                    // numOutputRows counts per PULL (inside the map), like
                    // the dropped-drain and spill paths — an eager bump by
                    // active.length would overstate emissions under a
                    // parent LIMIT that stops pulling mid-group
                    pending = active.toVector.iterator.map { a =>
                      numOutputRows += 1
                      outProj(joined(l, a._1))
                    }
                  } else if (emitMode != IntervalJoinMode.Inner) {
                    numOutputRows += 1
                    // LAZY single: under FullOuter the dropped-interval
                    // drain below prepends rows that project through the
                    // same reused outProj buffer — an eagerly projected
                    // row here would be clobbered before it is consumed.
                    // `l` stays valid until the next lIter.next(), which
                    // cannot happen before pending is exhausted.
                    pending = lazySingle(outProj(joined(l, nullRight)))
                  }
                // existence modes answer from the O(1) running max; the
                // left row itself emits at most once and `l` stays valid
                // until the next lIter.next(), which cannot happen before
                // this single pending row is consumed
                case IntervalJoinMode.Semi =>
                  if (existCovered(lTime)) {
                    numMatchedRows += 1
                    numOutputRows += 1
                    pending = Iterator.single(l)
                  }
                case IntervalJoinMode.Anti =>
                  if (!existCovered(lTime)) {
                    numOutputRows += 1
                    pending = Iterator.single(l)
                  }
                case IntervalJoinMode.Existence(_) =>
                  val covered = existCovered(lTime)
                  if (covered) numMatchedRows += 1
                  numOutputRows += 1
                  pending = Iterator.single(
                    outProj(joined(l, if (covered) flagTrue else flagFalse)))
              }
              }
              // full outer: intervals the sweep skipped since the last
              // point drain null-extended AHEAD of this point's rows
              // (skips only ever accumulate under FullOuter). Iterator.++
              // takes its argument BY NAME — snapshot the tail first, or
              // the concat would lazily re-read the reassigned `pending`
              // field and chase its own tail forever.
              if (droppedNonEmpty) {
                val tail = pending
                pending = drainDropped() ++ tail
              }
            } else {
              // NULL key/time left rows match nothing: outer null-extends
              // them (full outer too), anti keeps them (NOT EXISTS over an
              // always-false condition), existence keeps them with a false
              // flag, inner and semi drop them
              emitMode match {
                case IntervalJoinMode.Outer | IntervalJoinMode.FullOuter =>
                  numOutputRows += 1
                  pending = Iterator.single(outProj(joined(l, nullRight)))
                case IntervalJoinMode.Anti =>
                  numOutputRows += 1
                  pending = Iterator.single(l)
                case IntervalJoinMode.Existence(_) =>
                  numOutputRows += 1
                  pending = Iterator.single(outProj(joined(l, flagFalse)))
                case _ => ()
              }
            }
          }
        }

        // full outer: after the last point, every remaining right row —
        // buffered skips, the lookahead, and the unread tail (including
        // null-key rows fetchRight would reject) — is unmatched; drain
        // null-extended exactly once. The tail projects lazily straight
        // off rIter (no copies: outProj materializes each row on demand).
        private def drainRightTail(): Unit =
          if (emitFull && !pending.hasNext && !lIter.hasNext && !drainedRight) {
            drainedRight = true
            val head = drainDropped()
            val lookahead = if (rNext != null) Some(rNext.copy()) else None
            rNext = null
            pending =
              head ++ (lookahead.iterator ++ rIter).map { r =>
                numOutputRows += 1
                outProj(joined(nullLeft, r))
              }
          }

        override def hasNext: Boolean = { advance(); drainRightTail(); pending.hasNext }

        override def next(): InternalRow = {
          advance()
          drainRightTail()
          if (!pending.hasNext) throw new NoSuchElementException("empty interval iterator")
          pending.next()
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan
  ): IntervalJoinExec = copy(left = newLeft, right = newRight)
}

object IntervalJoinExec {
  /** Session conf key bounding the per-task active-interval buffer.
    * Applies only to the pair-emitting modes (inner/outer/full): the
    * existence family (semi/anti/existence) carries O(1) state per key
    * — a running max of admitted end bounds — and has no buffer to
    * bound.
    */
  val MaxActiveKey = "spark.graft.intervalJoin.maxActiveIntervals"

  /** Session conf key (boolean, default false): instead of aborting when a
    * key exceeds [[MaxActiveKey]], degrade that key to a disk-spillable
    * active buffer — memory stays bounded by the task memory manager,
    * work stays linear, throughput drops to the rebuild-per-point path.
    */
  val SpillKey = "spark.graft.intervalJoin.spillBeyondBudget"
}

/** DataFrame-level entry point for the native interval join. Columns are
  * named (resolved against each side's analyzed plan through the
  * session's resolver); the right side is re-aliased behind fresh exprIds
  * so self-joins can't collide.
  */
object Interval {
  import org.apache.spark.sql.{DataFrame, GraftColumns}
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.Project

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightStart: String,
      rightEnd: String,
      outer: Boolean = false
  ): DataFrame =
    joinWithMode(left, right, leftKeys, rightKeys, leftTime, rightStart, rightEnd,
      if (outer) IntervalJoinMode.Outer else IntervalJoinMode.Inner)

  /** Points covered by at least one same-key interval, each once, left
    * columns only — `EXISTS (SELECT 1 FROM r WHERE rk = lk AND lt BETWEEN
    * rs AND re)` without the SMJ group buffering.
    */
  def intervalSemiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightStart: String,
      rightEnd: String
  ): DataFrame =
    joinWithMode(left, right, leftKeys, rightKeys, leftTime, rightStart, rightEnd,
      IntervalJoinMode.Semi)

  /** Full-outer containment join: every (point, covering interval) pair,
    * plus each uncovered point and each point-free interval null-extended
    * — two-sided reconciliation ("orphans on both sides") in one sweep.
    */
  def intervalFullOuterJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightStart: String,
      rightEnd: String
  ): DataFrame =
    joinWithMode(left, right, leftKeys, rightKeys, leftTime, rightStart, rightEnd,
      IntervalJoinMode.FullOuter)

  /** Points covered by NO same-key interval — `NOT EXISTS …`, the
    * purge/tombstone idiom.
    */
  def intervalAntiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightStart: String,
      rightEnd: String
  ): DataFrame =
    joinWithMode(left, right, leftKeys, rightKeys, leftTime, rightStart, rightEnd,
      IntervalJoinMode.Anti)

  /** Every point once, plus a boolean `existsCol` flagging whether ANY
    * same-key interval covers it — the flagged form of
    * [[intervalSemiJoin]]/[[intervalAntiJoin]] (EXISTS as a column; one
    * pass answers both "covered?" and "uncovered?").
    */
  def intervalExistsJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightStart: String,
      rightEnd: String,
      existsCol: String = "matched"
  ): DataFrame =
    joinWithMode(left, right, leftKeys, rightKeys, leftTime, rightStart, rightEnd,
      IntervalJoinMode.Existence(
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          existsCol, org.apache.spark.sql.types.BooleanType, nullable = false)()))

  private def joinWithMode(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightStart: String,
      rightEnd: String,
      mode: IntervalJoinMode
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
        rightStart,
        rightEnd,
        mode,
        spark.sessionState.conf.resolver
      )
    )
  }

  /** Name-resolved plan construction shared by [[intervalJoin]] and the
    * SQL table function `graft_interval_join` ([[TableFunctions.interval]]).
    */
  private[plans] def planFor(
      lPlan: LogicalPlan,
      rAnalyzed: LogicalPlan,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightStart: String,
      rightEnd: String,
      mode: IntervalJoinMode,
      nameMatches: (String, String) => Boolean
  ): IntervalJoinPlan = {
    // Stream-static soundness boundary (StreamStaticJoinSpec pins the
    // sound cases): a streaming LEFT is stateless per left row for every
    // left-decided mode, so per-micro-batch execution is exactly correct.
    // Two shapes are NOT and must fail loudly instead of silently
    // emitting per-batch-wrong answers:
    //  - FULL OUTER with a streaming side: the static side's unmatched
    //    rows would re-emit every micro-batch (and a streaming side's
    //    unmatched rows can't be decided within one batch);
    //  - a streaming RIGHT in any left-preserving/left-deciding mode:
    //    "covered by some interval" quantifies over intervals from EVERY
    //    batch, so outer/semi/anti/existence answers flip as later
    //    batches arrive (inner is the one per-pair-decidable exception).
    if (lPlan.isStreaming && rAnalyzed.isStreaming) {
      // checked FIRST so both-streaming inputs get the one actionable
      // remediation (the FullOuter message's "use the outer mode"
      // suggestion would itself be rejected for these inputs). Even
      // INNER is only per-pair-decidable when at most one side streams:
      // per-micro-batch execution joins batch SLICES, so a point from
      // batch 1 never meets an interval from batch 2
      // (L1∪L2 ⋈ R1∪R2 ≠ (L1⋈R1) ∪ (L2⋈R2)). The watermark-bounded
      // stateful path is EventTime.intervalJoin.
      throw new IllegalArgumentException(
        "interval join: both sides are streaming — per-micro-batch execution " +
          "would silently drop every cross-batch (point, interval) pair; use " +
          "graft.streaming.EventTime.intervalJoin (stream-stream, " +
          "watermark-bounded state) instead")
    }
    if ((lPlan.isStreaming || rAnalyzed.isStreaming) && mode == IntervalJoinMode.FullOuter) {
      throw new IllegalArgumentException(
        "interval join: FULL OUTER requires both sides static — unmatched rows " +
          "of the static side would re-emit every micro-batch; reconcile after " +
          "the stream lands, or use the outer mode on the streaming (point) side")
    }
    if (rAnalyzed.isStreaming && mode != IntervalJoinMode.Inner) {
      throw new IllegalArgumentException(
        s"interval join: a streaming right (intervals) side supports only the " +
          s"inner mode — $mode quantifies over intervals across micro-batches " +
          "and would answer from each batch's slice alone")
    }
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    val rOut = rAliases.map(_.toAttribute)
    def resolve(attrs: Seq[Attribute], n: String, side: String): Attribute =
      attrs.filter(a => nameMatches(a.name, n)) match {
        case Seq(a) => a
        case Seq() =>
          throw new IllegalArgumentException(s"interval join: no column '$n' on the $side side")
        case many =>
          throw new IllegalArgumentException(
            s"interval join: column '$n' is ambiguous on the $side side (${many.size} matches)"
          )
      }
    def la(n: String): Attribute = resolve(lPlan.output, n, "left")
    def ra(n: String): Attribute = resolve(rOut, n, "right")
    val lt = la(leftTime)
    val rs = ra(rightStart)
    val re = ra(rightEnd)
    require(
      rs.dataType == lt.dataType && re.dataType == lt.dataType,
      s"interval join time/bound types must match: ${lt.dataType} vs ${rs.dataType}/${re.dataType}"
    )
    require(
      leftKeys.length == rightKeys.length,
      s"interval join needs equally many keys on both sides: ${leftKeys.length} vs ${rightKeys.length}"
    )
    val lks = leftKeys.map(la)
    val rks = rightKeys.map(ra)
    lks.zip(rks).foreach { case (l, r) =>
      // Mismatched key types would hash-partition the two sides differently
      // and compare raw UnsafeRow layouts — silently empty results. Builtin
      // joins insert casts at analysis; here the caller must align types.
      require(
        l.dataType == r.dataType,
        s"interval join key types must match: ${l.name}: ${l.dataType} vs ${r.name}: ${r.dataType}"
      )
    }
    IntervalJoinPlan(
      lPlan,
      rPlan,
      lks,
      rks,
      lt,
      rs,
      re,
      mode
    )
  }
}
