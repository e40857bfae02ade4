package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input document for streaming weighted sampling. */
final case class SampleDoc(docId: Long, source: String, nTokens: Long)

/** Changelog event: a document entered (`admit`) or left (`evict`) the
  * current sample. The live sample at any time = admitted − evicted.
  */
final case class SampleEvent(docId: Long, source: String, pri: Long, event: String)

private[streaming] final case class SampleMember(pri: Long, docId: Long, source: String)
private[streaming] final case class SampleState(members: Seq[SampleMember])

/** Streaming weighted sampling without replacement — the continuous twin
  * of q199's priority sample (Duffield–Lund–Thorup): keep the k smallest
  * deterministic priorities pri = u·10⁶ div weight seen so far, where u
  * is the md5-derived 16-bit uniform of the doc id (bit-identical to the
  * batch query's `conv(substring(md5(id),1,4),16,10)`).
  *
  * Bottom-k over a total order is an order-independent, mergeable sketch,
  * so the stream is EXACT, not approximate: after any sequence of
  * micro-batches the live sample equals the batch query over the union of
  * all input — independent of batch boundaries, arrival order, partition
  * layout, or at-least-once redelivery (SampleStreamSpec pins all three).
  * Redelivery is naturally idempotent: a doc in the sample is skipped by
  * id; an evicted or never-admitted doc lost to a strictly better
  * (pri, docId) set that only ever improves, so it can never re-enter.
  *
  * Scale shape: priorities are computed map-side and each input partition
  * pre-reduces to its local bottom-k, so at most k rows per partition per
  * trigger reach the single global-state task (the same map-side-combine
  * discipline as a distributed TakeOrdered); state is k rows, bounded for
  * the life of the stream. Emission is an append-only changelog — the
  * sink replays admit/evict to materialize the current sample, the same
  * convention as CDC consumers.
  */
object SampleStream {

  /** JVM twin of the q199 priority expression (TextExprSpec-style parity
    * is pinned in SampleStreamSpec against the SQL formulation).
    */
  def priorityOf(docId: Long, nTokens: Long): Long = {
    val d = java.security.MessageDigest
      .getInstance("MD5")
      .digest(docId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u = (((d(0) & 0xff) << 8) | (d(1) & 0xff)).toLong + 1L
    u * 1000000L / math.max(nTokens, 1L)
  }

  def sample(docs: Dataset[SampleDoc], k: Int): Dataset[SampleEvent] = {
    require(k > 0, s"k must be positive, got $k")
    implicit val memberEnc = Encoders.product[SampleMember]
    implicit val stateEnc = Encoders.product[SampleState]
    implicit val outEnc = Encoders.product[SampleEvent]
    implicit val keyEnc = Encoders.scalaInt
    val local = docs.mapPartitions { it =>
      // Bounded bottom-k: a size-k max-heap on (pri, docId) keeps partition
      // memory O(k) regardless of trigger size (the scaladoc's pre-reduce
      // discipline), vs materializing + sorting the whole partition.
      val worstFirst = Ordering.by[SampleMember, (Long, Long)](m => (m.pri, m.docId))
      val heap = scala.collection.mutable.PriorityQueue.empty[SampleMember](worstFirst)
      it.foreach { dc =>
        val m = SampleMember(priorityOf(dc.docId, dc.nTokens), dc.docId, dc.source)
        if (heap.size < k) heap.enqueue(m)
        else if (worstFirst.compare(m, heap.head) < 0) { heap.dequeue(); heap.enqueue(m) }
      }
      heap.iterator
    }
    local
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (_: Int, it: Iterator[SampleMember], state: GroupState[SampleState]) => {
          val cur = state.getOption.map(_.members.toVector).getOrElse(Vector.empty)
          val curIds = cur.map(_.docId).toSet
          val fresh = it
            .filterNot(m => curIds.contains(m.docId)) // redelivered members: no-op
            .toVector
            .distinctBy(_.docId) // same doc from several partitions in one batch
          val merged = (cur ++ fresh).sortBy(m => (m.pri, m.docId)).take(k)
          val mergedIds = merged.map(_.docId).toSet
          val admitted = merged.filterNot(m => curIds.contains(m.docId))
          val evicted = cur.filterNot(m => mergedIds.contains(m.docId))
          if (admitted.nonEmpty) state.update(SampleState(merged))
          (admitted.map(m => SampleEvent(m.docId, m.source, m.pri, "admit")) ++
            evicted.map(m => SampleEvent(m.docId, m.source, m.pri, "evict"))).iterator
        }
      )
  }
}
