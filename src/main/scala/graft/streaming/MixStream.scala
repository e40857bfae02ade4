package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One categorical observation: (key, event-time window start, category).
  * The mix is COUNTED per category — each row is one event.
  */
final case class MixObs(key: String, windowStart: Long, category: String)

/** Finalized-window mix report: the closed window's category distribution
  * against the fixed baseline, as total-variation distance in basis points
  * (q155's integer algebra — ½·Σ|p−q| over cross-multiplied counts, no
  * floats, no libm).
  */
final case class MixReport(key: String, windowStart: Long, n: Long, tvdBp: Long)

/** Per-key state: the open window's per-category counts. The map is
  * bounded by the CATEGORY cardinality (event types / languages / quality
  * flags — bounded metadata, the DriftStream/AnomalyStream fixed-state
  * discipline), not by stream length.
  */
final case class MixState(openWindow: Long, cats: Map[String, Long])

/** Streaming twin of q155's categorical-drift monitor: per key, each
  * event-time window's category MIX is scored against a fixed baseline
  * distribution the moment a later window's first event closes it — the
  * continuously-running "did the event mix shift" gate (q117's streaming
  * twin watches a value's mean; this one watches the composition).
  *
  * Semantics and bounds:
  *  - TVD is exact int64 on cross-multiplied counts, identical to q155:
  *    Σ|o_c·N_b − b_c·N_o| · 10⁴ div (2·N_o·N_b) over the category union,
  *    so stream == batch bit-for-bit and a window with no events in a
  *    baseline-heavy category still pays for the absence;
  *  - the baseline is COUNTS at any scale (shares cancel through the
  *    cross-multiplication) — pass q155's early-epoch counts, a golden
  *    reference mix, or yesterday's totals;
  *  - window-close-on-advance ordering contract as AnomalyStream: per-key
  *    windows must not regress ACROSS micro-batches; within a batch
  *    events replay in windowStart order; late events for closed windows
  *    drop.
  */
object MixStream {

  /** Exact q155 TVD in basis points between observed counts and the
    * baseline counts (either side all-zero → 0).
    */
  def tvdBp(obs: Map[String, Long], baseline: Map[String, Long]): Long = {
    val no = obs.values.sum
    val nb = baseline.values.sum
    if (no == 0L || nb == 0L) 0L
    else {
      val sumAbs = (obs.keySet ++ baseline.keySet).iterator.map { c =>
        math.abs(obs.getOrElse(c, 0L) * nb - baseline.getOrElse(c, 0L) * no)
      }.sum
      sumAbs * 10000L / (2L * no * nb)
    }
  }

  def track(obs: Dataset[MixObs], baseline: Map[String, Long]): Dataset[MixReport] = {
    implicit val stateEnc = Encoders.product[MixState]
    implicit val outEnc = Encoders.product[MixReport]
    implicit val keyEnc = Encoders.STRING
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[MixObs], state: GroupState[MixState]) => {
          var st = state.getOption.getOrElse(MixState(Long.MinValue, Map.empty))
          val out = Vector.newBuilder[MixReport]
          it.toVector.sortBy(_.windowStart).foreach { o =>
            if (st.openWindow == Long.MinValue) {
              st = MixState(o.windowStart, Map(o.category -> 1L))
            } else if (o.windowStart == st.openWindow) {
              st = st.copy(cats =
                st.cats.updated(o.category, st.cats.getOrElse(o.category, 0L) + 1L)
              )
            } else if (o.windowStart > st.openWindow) {
              out += MixReport(
                key,
                st.openWindow,
                st.cats.values.sum,
                tvdBp(st.cats, baseline)
              )
              st = MixState(o.windowStart, Map(o.category -> 1L))
            } // windowStart < openWindow: late for a closed window — dropped
          }
          state.update(st)
          out.result().iterator
        }
      )
  }
}
