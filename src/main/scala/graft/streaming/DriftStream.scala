package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One quantized observation: (key, event-time window start, value cents). */
final case class DriftObs(key: String, windowStart: Long, cents: Long)

/** Finalized-window drift report: a window's integer-cent mean against the
  * previous finalized window of the same key.
  */
final case class DriftReport(
    key: String,
    windowStart: Long,
    n: Long,
    meanCents: Long,
    prevMeanCents: Long,
    gapCents: Long
)

/** Per-key running stats: the open window plus the last CLOSED window's
  * mean — two longs of state per key beyond the open accumulator, the
  * fixed-size-state discipline of QuotaStream/FunnelStream.
  */
final case class DriftState(
    openWindow: Long,
    n: Long,
    sum: Long,
    prevMean: Long,
    hasPrev: Boolean
)

/** Streaming twin of q117's epoch-drift monitor: per key (event type), the
  * value distribution of each time window is compared against the PREVIOUS
  * window as soon as a later window's first event closes it — the
  * continuously-running form of the snapshot-over-snapshot data-quality
  * gate (alert on upstream distribution shift before it reaches a training
  * run).
  *
  * Semantics and bounds:
  *  - all arithmetic is exact int64 on pre-quantized cents (the q117
  *    convention), so stream == batch bit-for-bit;
  *  - a window is reported when a LATER window's event arrives for that
  *    key (window-close-on-advance). Within a micro-batch, events replay
  *    in (windowStart) order, so multiple windows closing in one batch
  *    each report once, in order;
  *  - ordering contract: like FunnelStream, per-key windows must not
  *    regress ACROSS batches (arrival order within a batch is free).
  *    Feed it through a watermark + `dropDuplicates` upstream for
  *    at-least-once sources; a late event for an already-closed window is
  *    counted into the OPEN window's report only if its windowStart is
  *    still open, otherwise it is dropped into the state's open window
  *    accumulator guard (ignored) — the documented trade for two-longs
  *    state instead of per-window maps.
  */
object DriftStream {

  def track(obs: Dataset[DriftObs]): Dataset[DriftReport] = {
    implicit val stateEnc = Encoders.product[DriftState]
    implicit val outEnc = Encoders.product[DriftReport]
    implicit val keyEnc = Encoders.STRING
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[DriftObs], state: GroupState[DriftState]) => {
          var st = state.getOption.getOrElse(DriftState(Long.MinValue, 0L, 0L, 0L, hasPrev = false))
          val out = Vector.newBuilder[DriftReport]
          it.toVector.sortBy(_.windowStart).foreach { o =>
            if (st.openWindow == Long.MinValue) {
              st = DriftState(o.windowStart, 1L, o.cents, 0L, hasPrev = false)
            } else if (o.windowStart == st.openWindow) {
              st = st.copy(n = st.n + 1L, sum = st.sum + o.cents)
            } else if (o.windowStart > st.openWindow) {
              // the open window closes: report it against the previous one
              val mean = math.floorDiv(st.sum, st.n)
              if (st.hasPrev)
                out += DriftReport(
                  key,
                  st.openWindow,
                  st.n,
                  mean,
                  st.prevMean,
                  math.abs(mean - st.prevMean)
                )
              st = DriftState(o.windowStart, 1L, o.cents, mean, hasPrev = true)
            } // windowStart < openWindow: late for a closed window — dropped
          }
          state.update(st)
          out.result().iterator
        }
      )
  }
}
