package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.CurationOps

/** Streaming twin of q70's curation composition: the same scoring Column
  * algebra over a documents STREAM — language + quality acceptance,
  * content-fingerprint dedup, stream-static embedding join, per-source
  * acceptance stats. This is the shape of a continuously-ingesting
  * training-data pipeline: new crawl shards arrive, are scored and
  * deduped against everything already admitted, and the corpus stats
  * update incrementally.
  *
  * Stage semantics on a stream:
  *  - scoring/filtering is stateless Column algebra (identical plan to
  *    batch — `CurationOps.scoreDocs` is shared code);
  *  - `dropDuplicates(fp)` is state-backed first-wins dedup — the
  *    streaming analog of the batch keep-set (batch keeps min doc_id;
  *    a stream keeps the first ARRIVAL, which also absorbs at-least-once
  *    source redelivery). The two agree only when ingest order follows
  *    doc_id — under out-of-order arrival the stream deliberately keeps
  *    the earlier-arriving duplicate and its per-doc attributes (e.g.
  *    embedding norm) diverge from the batch min-doc_id canonical row;
  *    StreamingOpsSpec pins this first-wins contract explicitly.
  *    Unbounded corpora bound the state with
  *    `dropDuplicatesWithinWatermark` on an ingest-time column;
  *  - the embedding join is a stream-static equi-join (no state);
  *  - the rollup is an incremental streaming aggregation (update/complete
  *    output) via the shared `CurationOps.acceptanceStats`.
  */
object CurationStream {

  /** Accepted canonical (source, q10k, n10k) rows as an append stream —
    * compose with [[CurationOps.acceptanceStats]] (one more stateful op)
    * or aggregate downstream.
    */
  def acceptedDocs(docsStream: DataFrame, staticEmbeddings: DataFrame): DataFrame =
    CurationOps
      .scoreDocs(docsStream)
      .dropDuplicates("fp")
      .filter(col("lang") === "en" && col("q10k") >= 5000L)
      .join(CurationOps.embNorms10k(staticEmbeddings), col("doc_id") === col("vec_id"))
      .select(col("source"), col("q10k"), col("n10k"))

  /** Full pipeline ending in the per-source stats (dedup state + agg
    * state chained in one query; complete output mode).
    */
  def curationStats(docsStream: DataFrame, staticEmbeddings: DataFrame): DataFrame =
    CurationOps.acceptanceStats(acceptedDocs(docsStream, staticEmbeddings))
}
