package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for the streaming as-of join (timestamps as epoch micros —
  * the caller projects `unix_micros(ts)` so state stays primitive).
  */
final case class AsOfEvent(
    eventId: Long,
    tsUs: Long,
    userId: Long,
    eventType: String,
    value: Double
)

/** Kept per-user state: the latest view seen so far. */
final case class AsOfState(vts: Long, vid: Long, vval: Double)

/** One matched click → latest preceding view. */
final case class AsOfMatch(
    eventId: Long,
    userId: Long,
    viewId: Long,
    gapUs: Long,
    viewValue: Double
)

/** Streaming twin of q19's as-of join, as an explicitly-stateful operator:
  * per user, the state is the latest view event; each click joins the
  * state at-or-before its timestamp. This is the
  * `flatMapGroupsWithState` shape the batch union+window trick cannot
  * express on an unbounded stream — state is ONE row per key (bounded by
  * user count, not history), and output is append-only.
  *
  * Ordering semantics: events within a micro-batch are processed in
  * (ts, views-first, event_id) order — identical tie-breaks to the batch
  * operator — and the view state carries the (ts, event_id)-max view
  * across batches. A view that arrives AFTER a click it should have
  * matched (cross-batch late data) cannot retro-join it: that is the
  * standard streaming as-of trade-off; bound it with a watermark-delayed
  * source if retro-accuracy matters more than latency.
  */
object AsOfStream {

  /** Sentinel view id for left-outer unmatched clicks (no preceding view). */
  val NoView: Long = -1L

  /** Inner as-of join (matched clicks only). */
  def asOfJoin(events: Dataset[AsOfEvent]): Dataset[AsOfMatch] =
    asOfJoin(events, emitUnmatched = false)

  /** As-of enrich with optional left-outer semantics: when `emitUnmatched`
    * is set, a click with no at-or-before view still emits — viewId/gapUs
    * ride the [[NoView]] sentinel (flatMapGroupsWithState output encoders
    * are product types, so a sentinel beats an Option column here: the
    * downstream schema stays primitive and filter-able). Unlike a
    * stream-stream outer join there is NO watermark wait: whether a click
    * has a preceding view is decidable the moment the click is processed
    * (state only ever grows), so unmatched rows emit in the same
    * micro-batch — append-mode, exactly-once per click.
    */
  def asOfJoin(events: Dataset[AsOfEvent], emitUnmatched: Boolean): Dataset[AsOfMatch] = {
    implicit val stateEnc = Encoders.product[AsOfState]
    implicit val outEnc = Encoders.product[AsOfMatch]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[AsOfEvent], state: GroupState[AsOfState]) => {
          val sorted = it.toVector.sortBy(e => (e.tsUs, e.eventType != "view", e.eventId))
          var st = state.getOption
          val out = Vector.newBuilder[AsOfMatch]
          sorted.foreach { e =>
            if (e.eventType == "view") {
              if (st.forall(s => s.vts < e.tsUs || (s.vts == e.tsUs && s.vid < e.eventId)))
                st = Some(AsOfState(e.tsUs, e.eventId, e.value))
            } else if (e.eventType == "click") {
              st.filter(_.vts <= e.tsUs) match {
                case Some(s) =>
                  out += AsOfMatch(e.eventId, userId, s.vid, e.tsUs - s.vts, s.vval)
                case None =>
                  if (emitUnmatched)
                    out += AsOfMatch(e.eventId, userId, NoView, NoView, 0.0)
              }
            }
          }
          st.foreach(state.update)
          out.result().iterator
        }
      )
  }
}
