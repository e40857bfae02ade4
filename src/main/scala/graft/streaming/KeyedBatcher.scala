package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{BatchMode, Message}

/** One emitted batch with its trigger ("size" | "timeout" | "flush") —
  * the `{messages, %BatchInfo{}}` pair of the reference
  * (/root/reference/lib/broadway/topology/batcher_stage.ex:259-279).
  */
final case class EmittedBatch[A](
    batcher: String,
    batchKey: String,
    trigger: String,
    messages: Seq[Message[A]]
)

/** Cross-micro-batch keyed batching with size AND processing-time timeout —
  * the full BatcherStage semantic (batcher_stage.ex:106-257): per
  * (batcher, batchKey) accumulate until `batchSize` is reached (trigger
  * "size"), a flush-mode message arrives (trigger "flush",
  * batcher_stage.ex:178-179), or the timeout fires (trigger "timeout",
  * batcher_stage.ex:80-89). Open batches survive micro-batch boundaries in
  * `GroupState`; timers are `ProcessingTimeTimeout`s, which fire when a
  * later micro-batch runs (documented deviation: timer granularity is the
  * trigger interval, SURVEY §7.3).
  *
  * Scale: state per open (batcher, batchKey) group is bounded by batchSize
  * messages; the shuffle key is the group key, so hot keys can be salted by
  * the caller via batchKey suffixing.
  */
object KeyedBatcher {

  def apply[A](
      messages: Dataset[Message[A]],
      batchSize: Int = 100,
      batchTimeoutMs: Long = 1000L
  )(implicit enc: Encoder[Message[A]], outEnc: Encoder[EmittedBatch[A]]): Dataset[EmittedBatch[A]] = {
    implicit val keyEnc: Encoder[(String, String)] = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val stateEnc: Encoder[Array[Byte]] = Encoders.BINARY

    messages
      .groupByKey((m: Message[A]) => (m.batcher, m.batchKey))
      .flatMapGroupsWithState[Array[Byte], EmittedBatch[A]](
        OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout
      ) { (key: (String, String), it: Iterator[Message[A]], state: GroupState[Array[Byte]]) =>
        val (batcher, batchKey) = key
        if (state.hasTimedOut) {
          val buffered = state.getOption.map(deserialize[A]).getOrElse(Vector.empty)
          state.remove()
          if (buffered.nonEmpty) Iterator.single(EmittedBatch(batcher, batchKey, "timeout", buffered))
          else Iterator.empty
        } else {
          val buffered = state.getOption.map(deserialize[A]).getOrElse(Vector.empty)
          val incoming = it.toVector.sortBy(_.metadata.get("seq").map(_.toLong).getOrElse(0L))
          val all = buffered ++ incoming
          val flushNow = incoming.exists(_.batchMode == BatchMode.Flush)
          val out = Vector.newBuilder[EmittedBatch[A]]
          var rest = all
          while (rest.size >= batchSize) {
            val (chunk, tail) = rest.splitAt(batchSize)
            out += EmittedBatch(batcher, batchKey, "size", chunk)
            rest = tail
          }
          if (flushNow && rest.nonEmpty) {
            out += EmittedBatch(batcher, batchKey, "flush", rest)
            rest = Vector.empty
          }
          if (rest.isEmpty) state.remove()
          else {
            state.update(serialize(rest))
            state.setTimeoutDuration(batchTimeoutMs)
          }
          out.result().iterator
        }
      }
  }

  // Open-batch state is serialized with plain Java serialization: the
  // payload type A is opaque to Spark here (arbitrary user type, like the
  // reference's `term` payloads), so a product encoder is not available.
  private def serialize[A](msgs: Vector[Message[A]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(msgs)
    oos.close()
    bos.toByteArray
  }

  private def deserialize[A](bytes: Array[Byte]): Vector[Message[A]] = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    ois.readObject().asInstanceOf[Vector[Message[A]]]
  }
}
