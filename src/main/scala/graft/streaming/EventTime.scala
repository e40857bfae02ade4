package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time processing — deliberately BEYOND the reference: Broadway has
  * no event-time windows, watermarks, or late-data handling (SURVEY §2.8;
  * its only timers are processing-time batch timeouts,
  * batcher_stage.ex:240-243). On Spark these are native and essential for
  * the 100 TB streaming-analytics surface, so the engine exposes them
  * first-class.
  */
object EventTime {

  /** Tumbling event-time window aggregation with a watermark: late rows
    * beyond `watermarkDelay` are dropped; in append mode a window emits
    * once, when the watermark passes its end — the exactly-once analog of a
    * finalized batch.
    */
  def tumblingAgg(
      events: DataFrame,
      eventTimeCol: String,
      windowDuration: String,
      watermarkDelay: String,
      keys: Seq[Column],
      aggs: Seq[Column]
  ): DataFrame =
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding (hopping) event-time windows: each event lands in
    * windowDuration/slideDuration overlapping windows; with a watermark,
    * each window still finalizes exactly once in append mode. The streaming
    * twin of q28_sliding_windows.
    */
  def slidingAgg(
      events: DataFrame,
      eventTimeCol: String,
      windowDuration: String,
      slideDuration: String,
      watermarkDelay: String,
      keys: Seq[Column],
      aggs: Seq[Column]
  ): DataFrame =
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration, slideDuration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Streaming exact dedup with bounded state: duplicates of `idCols`
    * are dropped; the watermark lets Spark evict state for ids older than
    * the delay — the streaming twin of q30_exact_dedup, with the state
    * bound that makes it viable on an unbounded 100 TB stream.
    */
  def dedupStream(
      events: DataFrame,
      eventTimeCol: String,
      watermarkDelay: String,
      idCols: Seq[String]
  ): DataFrame =
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Session windows keyed by arbitrary columns: gap-based grouping — the
    * event-time generalization of the batch sessionization in
    * q12_sessions.
    */
  def sessionAgg(
      events: DataFrame,
      eventTimeCol: String,
      gapDuration: String,
      watermarkDelay: String,
      keys: Seq[Column],
      aggs: Seq[Column]
  ): DataFrame =
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(session_window(col(eventTimeCol), gapDuration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Stream-stream inner equi-join bounded by an event-time interval:
    * a right row matches a left row with the same key when
    * rightTime ∈ [leftTime, leftTime + within]. BOTH the watermarks and
    * the time-range condition are load-bearing at scale — they are what
    * lets Spark evict buffered join state once the watermark passes a
    * row's match window; an unconstrained stream-stream join buffers both
    * streams forever (the unbounded-state killer on a 100 TB stream).
    * Key columns must be named identically on both sides and are emitted
    * once (`usingColumns` semantics via an explicit condition).
    *
    * Sizing: a stream-stream join runs FOUR state stores per shuffle
    * partition (left/right × keyToNumValues/keyWithIndexToValue), each
    * paying load/commit/maintenance every micro-batch regardless of data
    * volume — so set `spark.sql.shuffle.partitions` at query start to the
    * STATE volume, not the core count. Bench-measured (BENCH r12
    * interval_join variants): width 32 → 8 quadruples throughput at the
    * 200k-row shape and still wins 2.2× at 1M rows (73k vs 33k rows/s) —
    * the fixed cost amortizes with batch size but never disappears. The
    * RocksDB provider (`spark.sql.streaming.stateStore.providerClass`)
    * costs ~1.4× throughput at heap-sized state (1M-row run: 27k vs 33k
    * at width 32); pick it for state CAPACITY (state beyond executor
    * heap — the 100 TB deployment), not speed.
    */
  /** Idempotent watermarking: a side whose time column already CARRIES
    * watermark metadata (e.g. composed below a
    * dropDuplicatesWithinWatermark dedup — the chained stateful
    * pipeline) keeps it; re-marking would fail Spark's "Redefining
    * watermark is disallowed" check under multiple-stateful-operator
    * support. The check reads the OUTPUT attribute's delay metadata —
    * not plan-tree node names — so a projection that rebuilt the column
    * (dropping the metadata) correctly re-marks, and resolution follows
    * the session's resolver like every named-column API here. When a
    * watermark is retained, ITS delay governs late-drop and state
    * eviction, not the argument — the mismatch is logged.
    */
  private def marked(df: DataFrame, timeCol: String, watermarkDelay: String): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
    val resolver = df.sparkSession.sessionState.conf.resolver
    val existingDelayMs = df.queryExecution.analyzed.output.collectFirst {
      case a if resolver(a.name, timeCol) && a.metadata.contains(EventTimeWatermark.delayKey) =>
        a.metadata.getLong(EventTimeWatermark.delayKey)
    }
    existingDelayMs match {
      case Some(delayMs) =>
        val requestedMs = EventTimeWatermark.getDelayMs(
          org.apache.spark.sql.catalyst.util.IntervalUtils.fromIntervalString(watermarkDelay))
        if (delayMs != requestedMs) {
          org.slf4j.LoggerFactory.getLogger(EventTime.getClass).warn(
            s"'$timeCol' already carries a ${delayMs} ms watermark; " +
              s"keeping it (requested '$watermarkDelay' = $requestedMs ms would redefine " +
              "the watermark, disallowed under multi-stateful-operator support). " +
              "Late-drop/state-eviction follow the RETAINED delay.")
        }
        df
      case None => df.withWatermark(timeCol, watermarkDelay)
    }
  }

  /** Stateful shuffle width as a FIRST-CLASS operator parameter.
    *
    * A stateful operator's shuffle width is pinned by
    * `spark.sql.shuffle.partitions` AT QUERY START (then forever by the
    * checkpoint) — session-conf folklore a deployment gets wrong once and
    * can never revise. `Some(n)` rebases the plan onto a cloned session
    * carrying the override, so the width binds THIS query only: the
    * caller's session conf is untouched, concurrent queries keep their
    * own widths, and the streaming runtime records n in the checkpoint's
    * offset log so a restart keeps it regardless of the session it
    * restarts from. `None` inherits the session conf; the bounded joins'
    * DEFAULT is [[AutoStatePartitions]] (auto-size to the heuristic's
    * floor — see its scaladoc for why defaults stopped inheriting).
    *
    * Choosing n: see [[statePartitionsForVolume]] — width follows STATE
    * volume, not core count (BENCH r12: 32 → 8 quadrupled interval-join
    * throughput at 200k rows; every partition pays 4 state-store
    * load/commit cycles per micro-batch whether or not it holds data).
    *
    * Caveat: because the returned frame belongs to the CLONED session,
    * `StreamingQueryListener`s registered on the original session do not
    * receive this query's events — register on the returned frame's
    * `sparkSession` (or the started query's `q.sparkSession`) instead.
    */
  private def bindStatePartitions(df: DataFrame, statePartitions: Option[Int]): DataFrame =
    statePartitions match {
      case None => df
      case s if s.asInstanceOf[AnyRef] eq AutoStatePartitions =>
        // auto is meaningful only for STREAMING frames (stateful shuffle
        // width); a batch invocation of the same operator keeps the
        // session's width — AQE already sizes batch shuffles, and
        // clamping a large batch job to the stateful floor would be a
        // parallelism regression
        if (df.isStreaming) {
          val width = statePartitionsForVolume(0L)
          // observable-default log (ADVICE r16): the auto default CHANGES
          // the width a session-conf deployment used to inherit — say so
          // once per bind, with the revise knob, so "why is my stateful
          // width 8" is answered by the log rather than a plan dig
          org.slf4j.LoggerFactory.getLogger(EventTime.getClass).info(
            s"statePartitions=auto: binding stateful shuffle width $width " +
              s"(small-state floor) for this query; session " +
              s"spark.sql.shuffle.partitions is NOT inherited. Pass " +
              s"Some(statePartitionsForVolume(peakStateBytes)) for large " +
              s"bounded state, or None to inherit the session conf.")
          withStatePartitions(df, width)
        } else df
      case Some(p) => withStatePartitions(df, p)
    }

  /** The DEFAULT `statePartitions` posture of the bounded stateful joins
    * ([[intervalJoin]], [[asofJoinBounded]]): auto-size the stateful
    * shuffle width to [[statePartitionsForVolume]]'s floor (8) instead of
    * inheriting `spark.sql.shuffle.partitions`. Defaults are what users
    * run, and the bench triangle measured the inherited session width as
    * a ~3× throughput tax at typical bounded-join state (every partition
    * pays fixed state-store load/commit cycles per micro-batch whether or
    * not it holds rows) — the floor is the measured small-state optimum,
    * and the BOUNDED joins' state is watermark-horizon-sized by
    * construction (ScaleStress pinned the flat-state asymptote), so
    * "small" is the typical regime, not an assumption. Deployments with
    * genuinely larger bounded state should pass
    * `Some(statePartitionsForVolume(measuredPeakStateBytes))` from a
    * probe run's `state_mem_mb`. Pass `None` to inherit the session conf
    * (the pre-auto posture); existing checkpoints are unaffected either
    * way (width is pinned by the checkpoint's offset log at first start).
    *
    * The sentinel matches by IDENTITY (`eq`), not value: an equal-valued
    * `Some` built elsewhere — a `Some(0)` or `Some(Int.MinValue)` wired
    * from a misread config — is NOT auto and fails fast in
    * `withStatePartitions` ("must be positive"), exactly like any other
    * invalid width. Auto is requested only by passing THIS object (or by
    * omitting the parameter).
    */
  val AutoStatePartitions: Option[Int] = Some(Int.MinValue)

  /** The same binding as the operators' `statePartitions` parameter, for
    * ANY stateful frame (tumbling/session aggregations, dedup streams, a
    * composed pipeline): rebase `df` onto a cloned session whose
    * `spark.sql.shuffle.partitions` is `p`, so the width binds at THIS
    * query's start (and is then pinned by its checkpoint) without touching
    * the caller's session or concurrent queries. Apply ONCE, to the final
    * frame, just before `writeStream` — the width is a query-level
    * property, not per-operator. Same listener caveat as the parameter:
    * register `StreamingQueryListener`s on the returned frame's session.
    */
  def withStatePartitions(df: DataFrame, p: Int): DataFrame = {
    require(p > 0, s"statePartitions must be positive, got $p")
    val bound = org.apache.spark.sql.GraftColumns.cloneWithConf(
      df.sparkSession, "spark.sql.shuffle.partitions" -> p.toString)
    org.apache.spark.sql.GraftColumns.ofRows(bound, df.queryExecution.logical)
  }

  /** The documented state-volume sizing heuristic, executable: one shuffle
    * partition per `targetBytesPerPartition` of peak operator state
    * (default 32 MB — comfortably in-heap per task for the default
    * provider, large enough that per-partition store fixed costs are
    * amortized), floored at `minPartitions` (default 8 — the bench-
    * measured small-state optimum: below it commit parallelism and
    * failure granularity degrade faster than fixed costs shrink). Peak
    * state for an interval join ≈ rows arriving within
    * (watermarkDelay + within) × input rate, times ~2 (both sides
    * buffer); read it off a probe run's `state_rows_max`/`state_mem_mb`
    * progress metrics when in doubt.
    */
  def statePartitionsForVolume(
      stateBytes: Long,
      targetBytesPerPartition: Long = 32L * 1024 * 1024,
      minPartitions: Int = 8
  ): Int = {
    require(stateBytes >= 0 && targetBytesPerPartition > 0 && minPartitions > 0,
      s"invalid sizing inputs: bytes=$stateBytes target=$targetBytesPerPartition min=$minPartitions")
    math.max(minPartitions.toLong,
      (stateBytes + targetBytesPerPartition - 1) / targetBytesPerPartition).toInt
  }

  def intervalJoin(
      left: DataFrame,
      leftTimeCol: String,
      right: DataFrame,
      rightTimeCol: String,
      keys: Seq[String],
      watermarkDelay: String,
      within: String,
      joinType: String = "inner",
      statePartitions: Option[Int] = AutoStatePartitions
  ): DataFrame = {
    val l = marked(left, leftTimeCol, watermarkDelay)
    val r0 = marked(right, rightTimeCol, watermarkDelay)
    // Rename the right key columns BEFORE the join (fresh exprIds): when
    // both sides derive from the same frame (a self-join — clicks and
    // views filtered from one events table), the un-aliased right key
    // carries the LEFT key's exprId; the analyzer's self-join dedup then
    // re-aliases the right side and a post-join `drop(r(k))` resolves to
    // the LEFT attribute — silently keeping the null-extended RIGHT key,
    // so every OUTER-unmatched row emits a NULL key. (Inner modes never
    // see it: matched keys are equal. Found by q258's oracle gate.)
    val r = keys.foldLeft(r0)((df, k) => df.withColumnRenamed(k, s"__graft_rk_$k"))
    val cond = keys.map(k => l(k) === r(s"__graft_rk_$k")).reduce(_ && _) &&
      r(rightTimeCol) >= l(leftTimeCol) &&
      r(rightTimeCol) <= l(leftTimeCol) + expr(s"INTERVAL $within")
    // outer variants emit the null-extended row once the watermark proves
    // no match can still arrive — late emission, but exactly once; the
    // right-side key copies are dropped (usingColumns semantics). For
    // right-preserving modes (right/full outer) a right-unmatched row has
    // NULL left keys, so dropping the renamed right copy alone would
    // discard the join key entirely — coalesce the sides first, the
    // usingColumns contract.
    val joined = l.join(r, cond, joinType)
    val rightPreserving =
      Set("right", "rightouter", "right_outer", "full", "fullouter", "full_outer", "outer")
        .contains(joinType.toLowerCase)
    val keyed =
      if (rightPreserving)
        keys.foldLeft(joined)((df, k) => df.withColumn(k, coalesce(l(k), r(s"__graft_rk_$k"))))
      else joined
    bindStatePartitions(keyed.drop(keys.map(k => s"__graft_rk_$k"): _*), statePartitions)
  }

  /** Stream-stream AS-OF join with a bounded lookback — the remediation
    * for the refused both-streaming as-of shape (plans/AsOfJoin refuses a
    * streaming right because "latest rt ≤ t" quantifies over every
    * batch). For each left row: the LATEST same-key right row with
    * rightTime ∈ [leftTime − lookback, leftTime]; ties on rightTime
    * resolve to the LARGEST `rightTieBreak`, matching the batch
    * [[graft.plans.AsOf.asofJoin]]. The lookback bound is not a
    * compromise — it is what makes both-streaming as-of state FINITE (an
    * unbounded as-of must buffer every right row forever), and with it
    * the operator composes from two watermark-evicted primitives Spark
    * runs in append mode: a two-sided time-bound stream-stream join
    * (rt ≤ t ∧ rt ≥ t − lookback bounds each side against the other's
    * watermark, so join state evicts) followed by an event-time-keyed
    * aggregation whose group finalizes when the watermark passes
    * leftTime — at which point no rt ≤ leftTime row can still arrive,
    * so "latest" is final and emitted exactly once.
    *
    * `outer = true` keeps matchless left rows null-extended (the
    * left-outer interval join emits them once the watermark proves no
    * match; their single null-rt group aggregates to null fields).
    *
    * Contract: non-key column names must be disjoint across the sides
    * (the final group-by resolves left columns by name on the joined
    * frame), and left rows identical in EVERY column collapse to one
    * output row — carry a unique id column when exact multiplicity
    * matters (a stable id from the source; NOT `uuid()`/
    * `monotonically_increasing_id()`, whose values change on micro-batch
    * replay and would double-count redelivered rows). Because the
    * best-match aggregation groups by every left column, a left side
    * carrying a `MapType` column is rejected up front with the column
    * named (Spark cannot group by maps) — project the map away, or
    * `map_entries` it into an (orderable) array of structs first.
    *
    * `forward = false` flips the direction to the NEXT-EVENT shape
    * (the batch asofNextJoin's streaming twin): the EARLIEST right row
    * with rightTime ∈ [leftTime, leftTime + lookback] — `lookback`
    * then reads as a lookAHEAD horizon — ties to the smallest
    * tie-break (min_by), matching the batch backward merge. Here the
    * horizon bound earns its keep twice: finite join state AND a
    * finalization point (the group closes when the watermark passes
    * leftTime + lookback… in fact when it passes the group key's
    * leftTime plus the join's buffered range — Spark derives it from
    * the same condition that bounds the state).
    */
  def asofJoinBounded(
      left: DataFrame,
      leftTimeCol: String,
      right: DataFrame,
      rightTimeCol: String,
      keys: Seq[String],
      watermarkDelay: String,
      lookback: String,
      rightTieBreak: Seq[String] = Nil,
      outer: Boolean = false,
      forward: Boolean = true,
      statePartitions: Option[Int] = AutoStatePartitions
  ): DataFrame = {
    // fail fast with the column named, not a deep analyzer error from the
    // final group-by (which spans every left column)
    val mapCols = left.schema.fields
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(_.name)
    require(
      mapCols.isEmpty,
      s"asofJoinBounded groups by every left column, and Spark cannot group by MapType " +
        s"column(s) ${mapCols.mkString("'", "', '", "'")} — project them away or convert " +
        "with map_entries() before the join")
    val l = marked(left, leftTimeCol, watermarkDelay)
    val r0 = marked(right, rightTimeCol, watermarkDelay)
    // same self-join exprId hazard as intervalJoin (see its comment):
    // rename right keys pre-join, drop the unambiguous names post-join
    val r = keys.foldLeft(r0)((df, k) => df.withColumnRenamed(k, s"__graft_rk_$k"))
    val keyCond = keys.map(k => l(k) === r(s"__graft_rk_$k")).reduce(_ && _)
    val cond =
      if (forward)
        keyCond && r(rightTimeCol) <= l(leftTimeCol) &&
          r(rightTimeCol) >= l(leftTimeCol) - expr(s"INTERVAL $lookback")
      else
        keyCond && r(rightTimeCol) >= l(leftTimeCol) &&
          r(rightTimeCol) <= l(leftTimeCol) + expr(s"INTERVAL $lookback")
    val joined = l.join(r, cond, if (outer) "left_outer" else "inner")
      .drop(keys.map(k => s"__graft_rk_$k"): _*)
    // best-match selection over the right payload, ordered by
    // (rightTime, tieBreak…) — struct ordering is lexicographic. Forward
    // (latest ≤ t): max_by, ties to the LARGEST tie-break — the batch
    // as-of's forward semantics. Backward (earliest ≥ t): min_by, ties
    // to the SMALLEST — the batch next-event merge's. leftTimeCol keeps
    // its watermark through the join, so the append-mode aggregation
    // finalizes per left row and state evicts.
    val rightPayload = right.columns.filterNot(keys.contains)
    val ord = struct((col(rightTimeCol) +: rightTieBreak.map(col)): _*)
    val pick =
      if (forward) max_by(struct(rightPayload.map(col): _*), ord)
      else min_by(struct(rightPayload.map(col): _*), ord)
    val picked = joined
      .groupBy(left.columns.map(col): _*)
      .agg(pick.as("__asof_m"))
      .select(
        left.columns.map(col) ++
          rightPayload.map(c => col("__asof_m").getField(c).as(c)): _*)
    bindStatePartitions(picked, statePartitions)
  }
}
