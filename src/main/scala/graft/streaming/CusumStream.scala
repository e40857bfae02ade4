package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation for the CUSUM monitor: per-key deviation `x` (signal −
  * target, already centered) at monotone per-key sequence `seq` (arrival
  * order; doc_id in the batch twin q188).
  */
final case class CusumObs(key: String, seq: Long, x: Long)

/** Running CUSUM snapshot for a key, emitted once per micro-batch that
  * touched the key: worst upward/downward excursion so far, the net drift,
  * and how many observations contributed.
  */
final case class CusumReport(
    key: String,
    docs: Long,
    maxUpCusum: Long,
    maxDownCusum: Long,
    netDrift: Long
)

/** Per-key state — six longs, constant forever: the prefix sum P, its
  * running min/max, the two worst excursions, the observation count, and
  * the last applied sequence number (the redelivery guard).
  */
final case class CusumState(
    p: Long,
    minP: Long,
    maxP: Long,
    maxUp: Long,
    maxDown: Long,
    n: Long,
    lastSeq: Long
)

/** Streaming twin of q188's CUSUM quality-drift chart: the same
  * linearization (S_i = P_i − min_{j≤i} P_j over prefix sums of centered
  * deviations) maintained incrementally — O(1) longs of state per key, so
  * the monitor runs forever on an unbounded ingest while reproducing the
  * batch chart exactly (StreamingOpsSpec pins final stream state == q188).
  *
  * Contracts (the QuotaStream/DriftStream discipline):
  *  - per-key `seq` must not regress across micro-batches; within a batch
  *    observations replay in `seq` order;
  *  - at-least-once redelivery is absorbed by the `lastSeq` guard — a
  *    replayed observation is a no-op, so checkpoint recovery and upstream
  *    retries cannot double-count a deviation.
  */
object CusumStream {

  def track(obs: Dataset[CusumObs]): Dataset[CusumReport] = {
    implicit val stateEnc = Encoders.product[CusumState]
    implicit val outEnc = Encoders.product[CusumReport]
    implicit val keyEnc = Encoders.STRING
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[CusumObs], state: GroupState[CusumState]) => {
          var st = state.getOption.getOrElse(
            CusumState(0L, 0L, 0L, 0L, 0L, 0L, Long.MinValue)
          )
          var touched = false
          it.toVector.sortBy(_.seq).foreach { o =>
            if (o.seq > st.lastSeq) { // redelivery guard
              val p = st.p + o.x
              // q188's windows start at the FIRST prefix (no virtual P₀=0
              // term): the first observation seeds min/max with its own p
              val minP = if (st.n == 0L) p else math.min(st.minP, p)
              val maxP = if (st.n == 0L) p else math.max(st.maxP, p)
              st = CusumState(
                p,
                minP,
                maxP,
                math.max(st.maxUp, p - minP),
                math.max(st.maxDown, maxP - p),
                st.n + 1L,
                o.seq
              )
              touched = true
            }
          }
          if (touched) {
            state.update(st)
            Iterator.single(CusumReport(key, st.n, st.maxUp, st.maxDown, st.p))
          } else Iterator.empty
        }
      )
  }
}
