package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation for the volume monitor: (key, event-time window start).
  * Volume is COUNTED, not carried — each row is one event.
  */
final case class AnomalyObs(key: String, windowStart: Long)

/** Finalized-window volume report: the closed window's event count against
  * the median/MAD fence of the trailing history of closed windows for the
  * same key. `histN` says how many history windows the fence saw (reports
  * with histN == 0 have no fence and are never anomalous).
  */
final case class AnomalyReport(
    key: String,
    windowStart: Long,
    cnt: Long,
    med: Long,
    mad: Long,
    histN: Long,
    anomaly: Boolean
)

/** Per-key state: the open window's count plus a bounded ring of the last
  * [[AnomalyStream.HistoryK]] CLOSED window counts — fixed-size state per
  * key no matter how long the stream runs, the QuotaStream/DriftStream
  * discipline.
  */
final case class AnomalyState(openWindow: Long, openCnt: Long, hist: Seq[Long])

/** Streaming twin of q147's median/MAD volume-anomaly fence: per key, each
  * event-time window's ingest volume is judged against the robust fence of
  * the trailing closed windows the moment a later window's first event
  * closes it — the continuously-running delivery monitor (double-delivered
  * hour, dead upstream) in front of mixture weights and dedup admission.
  *
  * Semantics and bounds:
  *  - the fence is integer-exact and identical to q147's:
  *    |cnt − med|·10⁴ > 3·14826·MAD with rank-discrete lower-median over
  *    the ≤HistoryK history counts (window-sort of ≤16 longs, in-state);
  *  - window-close-on-advance ordering contract as DriftStream: per-key
  *    windows must not regress ACROSS micro-batches; within a batch events
  *    replay in windowStart order. Late events for closed windows drop;
  *  - state is O(HistoryK) longs per key, mergeable-in-time: replaying a
  *    prefix rebuilds the identical ring, so checkpoint recovery is exact.
  */
object AnomalyStream {

  /** Trailing closed windows the fence sees. 16 ≈ two weeks of daily
    * windows — long enough for a stable median, short enough that a
    * regime change ages out.
    */
  val HistoryK = 16

  /** Rank-discrete lower median of a non-empty bounded seq (q147's
    * (n+1)/2 rank over ascending order).
    */
  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s(((s.length + 1) / 2) - 1)
  }

  private def fence(cnt: Long, hist: Seq[Long]): (Long, Long, Boolean) =
    if (hist.isEmpty) (0L, 0L, false)
    else {
      val med = lowerMedian(hist)
      val mad = lowerMedian(hist.map(h => math.abs(h - med)))
      (med, mad, math.abs(cnt - med) * 10000L > 3L * 14826L * mad)
    }

  def track(obs: Dataset[AnomalyObs]): Dataset[AnomalyReport] = {
    implicit val stateEnc = Encoders.product[AnomalyState]
    implicit val outEnc = Encoders.product[AnomalyReport]
    implicit val keyEnc = Encoders.STRING
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[AnomalyObs], state: GroupState[AnomalyState]) => {
          var st = state.getOption.getOrElse(AnomalyState(Long.MinValue, 0L, Vector.empty))
          val out = Vector.newBuilder[AnomalyReport]
          it.toVector.sortBy(_.windowStart).foreach { o =>
            if (st.openWindow == Long.MinValue) {
              st = AnomalyState(o.windowStart, 1L, st.hist)
            } else if (o.windowStart == st.openWindow) {
              st = st.copy(openCnt = st.openCnt + 1L)
            } else if (o.windowStart > st.openWindow) {
              val (med, mad, anom) = fence(st.openCnt, st.hist)
              out += AnomalyReport(
                key,
                st.openWindow,
                st.openCnt,
                med,
                mad,
                st.hist.length.toLong,
                anom
              )
              st = AnomalyState(
                o.windowStart,
                1L,
                (st.hist :+ st.openCnt).takeRight(HistoryK)
              )
            } // windowStart < openWindow: late for a closed window — dropped
          }
          state.update(st)
          out.result().iterator
        }
      )
  }
}
