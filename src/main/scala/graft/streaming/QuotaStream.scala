package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input document for streaming quota admission. */
final case class QuotaDoc(docId: Long, source: String)

/** One admitted document with its per-source admission sequence number. */
final case class Admitted(docId: Long, source: String, seq: Long)

/** Streaming per-key quota admission — the continuous twin of q79's
  * per-source document cap: admit at most `cap` documents per source,
  * then drop that source's remainder forever. This is the
  * repetition-control gate of a continuously-ingesting curation pipeline
  * (no single domain may dominate the admitted mixture), and the per-KEY
  * generalization of the reference's global rate-limiting admission
  * (`/root/reference/lib/broadway/topology/rate_limiter.ex:45-63` keeps
  * one shared counter; here the counter is keyed).
  *
  * Semantics:
  *  - state per source is ONE long (admitted-so-far) — bounded by source
  *    count, never by history, so it holds at 100 TB ingest;
  *  - callers dedup redeliveries upstream (`dropDuplicates("docId")`,
  *    state-backed — the bounded-state variant is
  *    dropDuplicatesWithinWatermark) so an at-least-once source cannot
  *    burn quota on duplicates;
  *  - within a micro-batch, candidates are admitted in docId order
  *    (deterministic under any partition/arrival shuffle of the batch);
  *    across batches, admission is arrival order — a late-arriving lower
  *    docId cannot evict an already-admitted document (append-only
  *    output, the same no-retroactivity trade-off as AsOfStream).
  *
  * The per-batch group buffer is the batch's rows for one source (same
  * bounded-by-trigger caveat as Pipeline.processBatch; a pathological
  * hot source within one trigger buffers in one task — cap the trigger
  * size via source admission if that matters).
  */
object QuotaStream {

  def admit(docs: Dataset[QuotaDoc], cap: Int): Dataset[Admitted] = {
    require(cap > 0, s"cap must be positive, got $cap")
    implicit val stateEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Admitted]
    implicit val keyEnc = Encoders.STRING
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (source: String, it: Iterator[QuotaDoc], state: GroupState[Long]) => {
          val before = state.getOption.getOrElse(0L)
          val room = (cap - before).max(0L).toInt
          val picked =
            if (room == 0) Vector.empty
            else it.toVector.sortBy(_.docId).take(room)
          if (picked.nonEmpty) state.update(before + picked.size)
          picked.iterator.zipWithIndex.map { case (d, i) =>
            Admitted(d.docId, source, before + i + 1)
          }
        }
      )
  }
}
