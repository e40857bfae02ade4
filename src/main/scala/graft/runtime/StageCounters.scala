package graft.runtime

import org.apache.spark.SparkContext
import org.apache.spark.util.LongAccumulator

/** Per-stage counters — the analog of Broadway's per-stage telemetry spans
  * (/root/reference/lib/broadway.ex:651-888: processor, batcher and
  * batch-processor spans with message counts, emit sites
  * processor_stage.ex:65-120 and batcher_stage.ex:55-77, payloads tested at
  * test/broadway_test.exs:879-1032). Spark's native mechanism for
  * executor-side counting is the accumulator: updates merge into the driver
  * after every micro-batch, so an operator can dashboard per-stage and
  * per-batcher throughput without any extra shuffle or driver collect.
  *
  * Accumulator caveat (standard Spark semantics): updates from re-executed
  * tasks re-apply, so counts can over-report under task retry — acceptable
  * for operational telemetry, same stance as the reference's telemetry
  * (observability, not a ledger; the ack path is the ledger).
  */
final class StageCounters private[runtime] (
    /** Messages that left handle_message still ok. */
    val processorProcessed: LongAccumulator,
    /** Messages failed or crashed in the processor stage. */
    val processorFailed: LongAccumulator,
    /** Batches assembled per batcher (one per handle_batch call). */
    val batcherBatches: Map[String, LongAccumulator],
    /** Messages through each batcher's handle_batch. */
    val batcherMessages: Map[String, LongAccumulator],
    /** Messages failed/crashed by each batcher's handle_batch. */
    val batcherFailed: Map[String, LongAccumulator],
    /** handle_failed invocations (one per ackRef group with failures). */
    val handleFailedInvocations: LongAccumulator,
    /** Messages acked successful / failed. */
    val ackSuccessful: LongAccumulator,
    val ackFailed: LongAccumulator
) extends Serializable {

  def snapshot: StageMetrics =
    StageMetrics(
      processorProcessed = processorProcessed.value,
      processorFailed = processorFailed.value,
      batcherBatches = batcherBatches.map { case (k, v) => k -> v.value.longValue() },
      batcherMessages = batcherMessages.map { case (k, v) => k -> v.value.longValue() },
      batcherFailed = batcherFailed.map { case (k, v) => k -> v.value.longValue() },
      handleFailedInvocations = handleFailedInvocations.value,
      ackSuccessful = ackSuccessful.value,
      ackFailed = ackFailed.value
    )
}

/** Immutable snapshot of a pipeline's per-stage counters. */
final case class StageMetrics(
    processorProcessed: Long,
    processorFailed: Long,
    batcherBatches: Map[String, Long],
    batcherMessages: Map[String, Long],
    batcherFailed: Map[String, Long],
    handleFailedInvocations: Long,
    ackSuccessful: Long,
    ackFailed: Long
)

object StageCounters {
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, StageCounters]()

  /** Create + register counters for a pipeline (called by Pipeline.start).
    * Accumulators are built here so the counters object itself holds no
    * SparkContext and serializes cleanly into executor closures.
    */
  def create(sc: SparkContext, pipelineName: String, batcherNames: Seq[String]): StageCounters = {
    def acc(suffix: String): LongAccumulator = sc.longAccumulator(s"graft.$pipelineName.$suffix")
    val c = new StageCounters(
      processorProcessed = acc("processor.processed"),
      processorFailed = acc("processor.failed"),
      batcherBatches = batcherNames.map(b => b -> acc(s"batcher.$b.batches")).toMap,
      batcherMessages = batcherNames.map(b => b -> acc(s"batcher.$b.messages")).toMap,
      batcherFailed = batcherNames.map(b => b -> acc(s"batcher.$b.failed")).toMap,
      handleFailedInvocations = acc("handleFailed.invocations"),
      ackSuccessful = acc("ack.successful"),
      ackFailed = acc("ack.failed")
    )
    registry.put(pipelineName, c)
    c
  }

  /** Snapshot for a pipeline name; zeros if none registered. */
  def metricsOf(pipelineName: String): Option[StageMetrics] =
    Option(registry.get(pipelineName)).map(_.snapshot)

  def remove(pipelineName: String): Unit = { registry.remove(pipelineName); () }
}
