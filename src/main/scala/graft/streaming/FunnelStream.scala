package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for streaming funnel tracking. */
final case class FunnelEvent(userId: Long, eventType: String, tsMicros: Long)

/** Emitted once per key per stage: the key just reached `stage` (1-based)
  * at `tsMicros`.
  */
final case class StageReached(userId: Long, stage: Int, tsMicros: Long)

/** Per-key funnel progress: first-hit timestamps of the stages reached so
  * far (≤ steps.length entries).
  */
final case class FunnelState(reachedTs: Seq[Long])

/** Streaming ordered-funnel tracking — the continuous twin of q98's batch
  * funnel and the simplest CEP (sequence-pattern) operator: per key, a
  * state machine advances through `steps` where each stage's FIRST hit
  * must be strictly after the previous stage's first hit; a StageReached
  * row is emitted exactly once per (key, stage). The per-key serial
  * processing guarantee it builds on is the same one Broadway's
  * `partition_by` pins a key to one process for
  * (/root/reference/lib/broadway.ex:524-607) — here the "process" is the
  * flatMapGroupsWithState group, single-threaded per key per micro-batch.
  *
  * Semantics / scale design:
  *  - state per key is ≤ steps.length longs — bounded by the pattern
  *    length, never by event history, so it holds on an unbounded stream;
  *  - redelivery-proof: a stage records only its first hit, and events of
  *    types other than the NEXT expected step are ignored, so an
  *    at-least-once source cannot double-advance the machine;
  *  - within a micro-batch the group's events are applied in
  *    (ts, eventType) order — deterministic under any arrival shuffling
  *    of the batch; across batches, processing is arrival order, so a
  *    late-arriving event with an earlier timestamp cannot retro-advance
  *    a stage (append-only — the same no-retroactivity trade-off as
  *    AsOfStream/QuotaStream). When events arrive in event-time order
  *    (or all in one batch), stage timestamps equal the batch q98
  *    formulation: t_k = min ts of step k strictly after t_{k-1}.
  */
object FunnelStream {

  def track(events: Dataset[FunnelEvent], steps: Seq[String]): Dataset[StageReached] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[StageReached]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          var reached = state.getOption.map(_.reachedTs.toVector).getOrElse(Vector.empty[Long])
          val emitted = Vector.newBuilder[StageReached]
          // chronological replay within the batch: a stage-k hit earlier in
          // the batch unlocks a stage-k+1 hit later in the same batch
          it.toVector.sortBy(e => (e.tsMicros, e.eventType)).foreach { e =>
            val next = reached.size
            if (
              next < steps.length && e.eventType == steps(next) &&
              (reached.isEmpty || e.tsMicros > reached.last)
            ) {
              reached = reached :+ e.tsMicros
              emitted += StageReached(uid, reached.size, e.tsMicros)
            }
          }
          val out = emitted.result()
          if (out.nonEmpty) state.update(FunnelState(reached))
          out.iterator
        }
      )
  }
}
