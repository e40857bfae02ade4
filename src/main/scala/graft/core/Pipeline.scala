package graft.core

import scala.util.control.NonFatal
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ack.Acknowledger
import graft.config.{BatcherConfig, PipelineConfig}
import graft.model.{BatchInfo, BatchMode, Message, MessageStatus}
import graft.runtime.{PipelineRegistry, StageCounters, StageMetrics}

/** The pipeline engine: Broadway's producer → processor → batcher →
  * batch-processor topology (/root/reference/guides/internals/architecture.md:
  * 11-25) realized as a Structured Streaming lineage.
  *
  * Stage mapping (all per micro-batch, executor-side):
  *  - processor stage: `prepareMessages` over partitions (amortized setup,
  *    reference processor_stage.ex:122-147) then `handleMessage` per message
  *    with crash containment (processor_stage.ex:149-211);
  *  - batcher stage: shuffle on (batcher, batchKey) — the analog of the
  *    partition dispatch in topology.ex:286-289 — then per-group chunking by
  *    size / custom splitter with trigger labels size|timeout|flush
  *    (batcher_stage.ex:106-257);
  *  - batch-processor stage: `handleBatch` per chunk with crash containment
  *    (batch_processor_stage.ex:110-127);
  *  - ack: one `Acknowledger.ack` per ackRef group per micro-batch
  *    (acknowledger.ex:64-85), failed messages passed to `handleFailed`
  *    first (broadway.ex:1031-1056).
  *
  * Scale: nothing here collects to the driver. The only wide edges are the
  * (batcher, batchKey) shuffle and the ackRef grouping; both keys are
  * user-chosen and high-cardinality at scale. Deviation from the reference
  * (documented, SURVEY §7.3): batch timeouts align to micro-batch
  * boundaries — a partial batch flushes at the end of the micro-batch with
  * trigger "timeout" instead of waiting a wall-clock timer.
  */
object Pipeline {

  /** Arrival order within a group: the ingest-stamped "seq" metadata.
    * Parsed ONCE per message into a key array before sorting — a plain
    * `sortBy(_.metadata.get("seq")…)` re-does the Map lookup + Option
    * allocation + String→Long parse on EVERY comparison (O(n log n)
    * parses per group), which the 200k-row streaming bench shows as real
    * per-micro-batch overhead across the processor/batcher/ack stages.
    */
  private[graft] def seqSorted[A](it: Iterator[Message[A]]): Vector[Message[A]] = {
    val arr = it.map(m => (m.metadata.get("seq").map(_.toLong).getOrElse(0L), m)).toArray
    arr.sortInPlaceBy(_._1)
    val b = Vector.newBuilder[Message[A]]
    b.sizeHint(arr.length)
    arr.foreach(p => b += p._2)
    b.result()
  }

  /** Process one micro-batch (or one batch DataFrame) through the full
    * stage chain. Returns the messages with final statuses (post-batch).
    */
  def processBatch[A](
      ds: Dataset[Message[A]],
      config: PipelineConfig[A],
      acknowledger: Acknowledger,
      counters: Option[StageCounters] = None
  )(implicit enc: Encoder[Message[A]]): Dataset[Message[A]] = {
    implicit val keyEnc: Encoder[(String, String)] = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val strEnc: Encoder[String] = Encoders.STRING

    val batcherNames = config.batcherNames
    val hasBatchers = config.batchers.nonEmpty
    val prepare = config.prepareMessages
    val handle = config.handleMessage

    def runProcessor(msgs: Seq[Message[A]]): Iterator[Message[A]] = {
      // prepare_messages crash containment (processor_stage.ex:122-147):
      // a raise — or returning fewer/more messages than given, which the
      // reference validates and raises on (processor_stage.ex:226-232) —
      // fails EVERY message in the batch ({kind, reason, stack} status)
      // while the stage itself survives; the failed messages skip
      // handle_message and flow to handle_failed + failure ack like any
      // other crash.
      val (prepared, prepFailed) =
        try {
          val p = prepare(msgs)
          if (p.length != msgs.length)
            throw new IllegalStateException(
              "expected all messages to be returned from prepareMessages"
            )
          (p, Seq.empty[Message[A]])
        } catch {
          case NonFatal(e) =>
            (Seq.empty[Message[A]], msgs.map(m => m.copy(status = MessageStatus.crashed(e))))
        }
      counters.foreach(c => prepFailed.foreach(_ => c.processorFailed.add(1L)))
      prepFailed.iterator ++ prepared.iterator.map { m =>
        val t0 = System.nanoTime()
        val out =
          if (!m.isOk) m
          else
            try {
              val o = handle(m)
              // configure_ack contract (acknowledger.ex:44-59 via
              // message.ex:135-155): newly-attached ack options pass through
              // the acknowledger, which validates/normalizes them; a raise
              // here crashes the message like any handler crash.
              val o2 =
                if (o.ackOptions != m.ackOptions) o.withAckOptions(acknowledger.configure(o.ackRef, o.ackOptions))
                else o
              if (hasBatchers && !batcherNames.contains(o2.batcher))
                // reference raises on unknown batcher (processor_stage.ex:213-224);
                // we fail the message so the pipeline keeps running
                o2.failed(s"unknown batcher: ${o2.batcher}")
              else o2
            } catch { case NonFatal(e) => m.copy(status = MessageStatus.crashed(e)) }
        // per-stage span counts + duration (broadway.ex:651-888 processor
        // spans measure time, not just throughput)
        counters.foreach { c =>
          if (out.isOk) c.processorProcessed.add(1L) else c.processorFailed.add(1L)
          if (m.isOk) c.processorNanos.add(System.nanoTime() - t0)
        }
        out
      }
    }

    // Processor stage: prepare (per partition) + handle (per message).
    // With partition_by (broadway.ex:524-607): same key ⇒ same group ⇒
    // serial, arrival-ordered processing — the shuffle is the analog of the
    // hash dispatch to a fixed processor index (topology.ex:222-232).
    val handled: Dataset[Message[A]] = config.partitionBy match {
      case Some(pf) =>
        val n = config.processorConcurrency
        implicit val intEnc: Encoder[Int] = Encoders.scalaInt
        ds.groupByKey((m: Message[A]) => math.floorMod(pf(m.data), n))
          .flatMapGroups { (_: Int, it: Iterator[Message[A]]) =>
            runProcessor(seqSorted(it))
          }
      case None =>
        // it.toSeq materializes the partition: prepare_messages is a
        // BATCH-wide callback (broadway.ex:234-258 hands the whole
        // demand batch to the user), so the opaque typed path cannot
        // stream row-by-row. The memory guard at scale is ADMISSION,
        // not this Seq — maxOffsetsPerTrigger / maxFilesPerTrigger
        // bound a micro-batch (and with it every partition's slice)
        // exactly like Broadway's max_demand bounds the batch the
        // reference hands its processors.
        ds.mapPartitions(it => runProcessor(it.toSeq))
    }

    val afterBatches: Dataset[Message[A]] =
      if (!hasBatchers) handled // terminal processor: ack directly (broadway.ex:313-323)
      else {
        val byBatcher = config.batchers.map(b => b.name -> b).toMap
        val handleBatchF = config.handleBatch
        // Per-batcher partition_by override (options.ex:182-187): the third
        // key component is the override's hash slot (0 when unset, which
        // degenerates to the plain (batcher, batchKey) grouping).
        val partOverride: Map[String, (A => Int, Int)] =
          config.batchers.flatMap(b => b.partitionBy.map(pf => b.name -> (pf, b.concurrency))).toMap
        implicit val key3Enc: Encoder[(String, Int, String)] =
          Encoders.tuple(Encoders.STRING, Encoders.scalaInt, Encoders.STRING)

        // Failed messages route to a pseudo-batcher that passes them
        // through untouched (they must SKIP handle_batch —
        // broadway_test.exs:799-806). Using one groupByKey for both flows
        // means the processor stage is materialized exactly once by the
        // shuffle — no double evaluation of handleMessage side effects.
        val FailedRoute = "\u0000failed"
        handled
          .groupByKey { (m: Message[A]) =>
            if (!m.isOk) (FailedRoute, 0, m.batchKey)
            else {
              val slot = partOverride.get(m.batcher) match {
                case Some((pf, conc)) => math.floorMod(pf(m.data), conc)
                case None             => 0
              }
              (m.batcher, slot, m.batchKey)
            }
          }
          .flatMapGroups { (key: (String, Int, String), it: Iterator[Message[A]]) =>
            val (batcherName, _, batchKey) = key
            if (batcherName == FailedRoute) it
            else {
              val bc = byBatcher(batcherName)
              // Stable per-key order: arrival sequence stamped at ingest
              // (the ordered-processing guarantee of partition_by,
              // broadway.ex:524-607; same key ⇒ one group ⇒ serial here).
              val msgs = seqSorted(it)
              val chunks = splitBatches(msgs, bc)
              chunks.iterator.flatMap { case (chunk, trigger) =>
                val info = BatchInfo(batcherName, batchKey, TaskContext.getPartitionId(), chunk.size, trigger)
                val t0 = System.nanoTime()
                val result =
                  try {
                    val out = handleBatchF(batcherName, chunk, info)
                    require(out.size == chunk.size, s"handleBatch must return all ${chunk.size} messages")
                    out
                  } catch {
                    case NonFatal(e) => chunk.map(_.copy(status = MessageStatus.crashed(e)))
                  }
                // batcher/batch-processor span counts + handle_batch
                // duration (batcher_stage.ex:55-77)
                counters.foreach { c =>
                  c.batcherBatches.get(batcherName).foreach(_.add(1L))
                  c.batcherMessages.get(batcherName).foreach(_.add(chunk.size.toLong))
                  c.batcherFailed.get(batcherName).foreach(_.add(result.count(!_.isOk).toLong))
                  c.batcherNanos.get(batcherName).foreach(_.add(System.nanoTime() - t0))
                }
                // ack_immediately messages keep their pre-batch status
                // (message.ex:172-201: the ack is locked in before the batch).
                chunk.lazyZip(result).map { (before, after) =>
                  if (before.isAckLocked) after.copy(status = before.status) else after
                }
              }
            }
          }
      }

    // Ack stage: one ack per ackRef group; handleFailed before failure ack.
    val handleFailedF = config.handleFailed
    val acked = afterBatches
      .groupByKey((m: Message[A]) => m.ackRef)
      .mapGroups { (ref: String, it: Iterator[Message[A]]) =>
        val msgs = seqSorted(it)
        val (ok, failed) = msgs.partition(_.isOk)
        val failedFinal =
          if (failed.nonEmpty) {
            counters.foreach(_.handleFailedInvocations.add(1L))
            val t0 = System.nanoTime()
            val r =
              try handleFailedF(failed)
              catch { case NonFatal(_) => failed } // handle_failed crash must not take down the ack (acknowledger.ex:93-151)
            counters.foreach(_.handleFailedNanos.add(System.nanoTime() - t0))
            r
          } else failed
        counters.foreach { c =>
          c.ackSuccessful.add(ok.size.toLong)
          c.ackFailed.add(failedFinal.size.toLong)
        }
        // a bad acknowledger must not take down the stage (reference wraps
        // ack_messages in try/catch + Logger.error on BOTH the processor and
        // batch-processor paths — processor_stage.ex:97-103,
        // batch_processor_stage.ex:86-93); the messages' statuses are
        // already final, only the delivery notification is lost
        try acknowledger.ack(ref, ok, failedFinal)
        catch {
          case NonFatal(e) =>
            org.slf4j.LoggerFactory
              .getLogger("graft.core.Pipeline")
              .error(s"acknowledger crashed for ackRef=$ref: ${e.getMessage}", e)
        }
        ref
      }
    acked.collect() // forces the ack action for this micro-batch
    afterBatches
  }

  /** Chunk one (batcher, batchKey) group into batches with trigger labels.
    * Full chunks (fixed size or splitter-emitted) are "size"; a flush-mode
    * message delivers the open chunk AT that message (batcher_stage.ex:
    * 178-179 — later messages in the group start a new chunk, same
    * per-message semantics as KeyedBatcher); a trailing partial chunk is
    * "timeout" (micro-batch-aligned timeout). Splitter path mirrors the
    * tuple batch_size semantics (options.ex:233-263): accumulator folds
    * until the step says emit.
    */
  def splitBatches[A](
      msgs: Seq[Message[A]],
      bc: BatcherConfig[A]
  ): Seq[(Seq[Message[A]], String)] = {
    val out = Vector.newBuilder[(Seq[Message[A]], String)]
    var cur = Vector.empty[Message[A]]
    var acc = bc.batchSplitter.map(_.init).getOrElse(0L)
    def emit(trigger: String): Unit =
      if (cur.nonEmpty) {
        out += ((cur, trigger))
        cur = Vector.empty
        acc = bc.batchSplitter.map(_.init).getOrElse(0L)
      }
    msgs.foreach { m =>
      cur :+= m
      bc.batchSplitter match {
        case Some(sp) =>
          val (emitNow, next) = sp.step(m, acc)
          acc = next
          if (emitNow) emit("size")
        case None =>
          if (cur.size >= bc.batchSize) emit("size")
      }
      if (m.batchMode == BatchMode.Flush) emit("flush")
    }
    emit("timeout")
    out.result()
  }

  /** Start a streaming pipeline over a source of already-wrapped messages.
    * The analog of `Broadway.start_link/2` (broadway.ex:1123-1162):
    * validates config, assembles the lineage, registers the running query.
    */
  def start[A](
      spark: SparkSession,
      source: Dataset[Message[A]],
      config: PipelineConfig[A],
      acknowledger: Acknowledger,
      rateLimiter: Option[RateLimiter] = None
  )(implicit enc: Encoder[Message[A]]): RunningPipeline[A] = {
    config.validate() match {
      case Left(err) => throw new IllegalArgumentException(s"invalid pipeline config: $err")
      case Right(_)  => ()
    }
    config.prepareForStart()
    val counters = StageCounters.create(spark.sparkContext, config.name, config.batchers.map(_.name))
    def build(): StreamingQuery = {
      val writer = source.writeStream
        .queryName(config.name)
        .outputMode("update")
        .trigger(Trigger.ProcessingTime(config.triggerIntervalMs))
        .foreachBatch { (df: Dataset[Message[A]], _: Long) =>
          processBatch(df, config, acknowledger, Some(counters))
          ()
        }
      config.checkpointLocation.foreach(writer.option("checkpointLocation", _))
      writer.start()
    }
    // Source descriptors — the producer_names/1 analog (broadway.ex:
    // 1184-1197): one entry per source leaf in the streaming plan.
    val producers = source.queryExecution.logical
      .collectLeaves()
      .map(l => l.toString.linesIterator.next().take(120))
    val running = new RunningPipeline[A](config, build(), rateLimiter, producers)
    config.restartPolicy.foreach(p => graft.runtime.Supervisor.supervise(spark, running, p, () => build()))
    // Registration can throw with a pluggable backend (name validation,
    // descriptor I/O). At this point the query is already started and
    // supervised — swallowing the failure OR propagating it bare would
    // leak a running, restart-supervised pipeline that drainAll can never
    // see. Tear the query back down first, then rethrow.
    try PipelineRegistry.register(running)
    catch {
      case NonFatal(e) =>
        try running.stop(StopReason.Kill, config.shutdownBudgetMs)
        catch { case NonFatal(_) => () }
        throw e
    }
    running
  }

  /** Analog of `Broadway.process_name/2` (broadway.ex:1058-1081): the
    * canonical name for a pipeline component — used as accumulator / query
    * naming convention so dashboards can address a stage deterministically.
    */
  def processName(pipelineName: String, component: String, index: Int = 0): String =
    s"$pipelineName.graft.$component.$index"
}

/** Termination reason for `RunningPipeline.stop` — the exit-reason
  * argument of `Broadway.stop/3` (broadway.ex:1525-1539) reduced to the
  * distinctions that change behavior off the BEAM: graceful (`Normal`,
  * `Shutdown` — drain first) vs brutal (`Kill` — immediate teardown).
  */
sealed trait StopReason
object StopReason {
  case object Normal extends StopReason
  case object Shutdown extends StopReason
  case object Kill extends StopReason
}

/** Handle on a started pipeline — introspection + lifecycle, the analog of
  * `Broadway.topology/1|all_running/0|stop/3` (broadway.ex:1184-1276,
  * 1525-1539) and the Terminator's graceful drain (topology/terminator.ex:
  * 41-60): process everything in flight, then stop.
  */
final class RunningPipeline[A](
    val config: PipelineConfig[A],
    initialQuery: StreamingQuery,
    val rateLimiter: Option[RateLimiter],
    /** Source descriptors (the producer_names/1 analog). */
    val producerNames: Seq[String] = Seq.empty
) {
  private val queryRef = new java.util.concurrent.atomic.AtomicReference[StreamingQuery](initialQuery)

  /** The live query — replaced in place by the Supervisor on restart. */
  def query: StreamingQuery = queryRef.get()

  private[graft] def replaceQuery(q: StreamingQuery): Unit = queryRef.set(q)

  def name: String = config.name

  def processAllAvailable(): Unit = query.processAllAvailable()

  /** Graceful drain + stop within the shutdown budget (default 30 s,
    * options.ex:13-20). Supervision is dropped first so an intentional
    * stop never races a restart.
    */
  def stop(): Unit = stop(StopReason.Normal, config.shutdownBudgetMs)

  /** `Broadway.stop/3` analog (broadway.ex:1525-1539): stop with an
    * explicit reason and termination budget. `Normal`/`Shutdown` drain
    * in-flight messages first (the graceful path); `Kill` is the brutal
    * variant — no `prepare_for_draining`, no drain, the query is torn
    * down immediately (still releasing runtime resources, which on the
    * BEAM the process exit handles for free). For `Kill` the budget is
    * real: `StreamingQuery.stop` itself blocks per
    * `spark.sql.streaming.stopTimeout` (default: indefinitely), so the
    * kill issues it from a daemon thread and waits at most `timeoutMs` —
    * a user callback stuck in a non-interruptible loop cannot hang the
    * caller, and resource cleanup below always runs (best-effort
    * teardown, exactly what a brutal exit means).
    */
  def stop(reason: StopReason, timeoutMs: Long): Unit = {
    val graceful = reason != StopReason.Kill
    if (graceful) config.prepareForDraining()
    // Set the cancel flag BEFORE settling on which query to stop (forget
    // adds the name to cancelledNames first): a restart that swaps in a
    // fresh query AFTER the re-read below sees the flag at its
    // post-registration check and kills the fresh run itself; a swap that
    // completed BEFORE is exactly the query the re-read returns. Reading
    // the query first (the original order) left a window where stop()
    // tore down an already-replaced dead query and the fresh run survived
    // as a zombie. The second forget is a no-op when nothing swapped.
    graft.runtime.Supervisor.forget(name, query.runId)
    val q = query
    graft.runtime.Supervisor.forget(name, q.runId)
    try { if (graceful) q.processAllAvailable() }
    finally {
      // On a query that already crashed, processAllAvailable/awaitTermination
      // rethrow its StreamingQueryException — runtime resources must still be
      // released (else every crashed pipeline leaks its registry entry and
      // counters), so the releases get their own finally.
      try {
        if (graceful) {
          q.stop()
          q.awaitTermination(timeoutMs)
        } else {
          val killer = new Thread(
            () => try q.stop() catch { case scala.util.control.NonFatal(_) => () },
            s"graft-kill-$name"
          )
          killer.setDaemon(true)
          killer.start()
          killer.join(math.max(timeoutMs, 1L))
        }
      } finally {
        rateLimiter.foreach(_.shutdown())
        // post-mortem metrics: snapshot BEFORE the counters leave the
        // registry, so callers can still read the final stage totals of a
        // stopped pipeline (e.g. the drain scenario proving every pushed
        // row processed) — the reference's telemetry outlives the stages
        finalMetrics = StageCounters.metricsOf(name)
        StageCounters.remove(name)
        PipelineRegistry.unregister(name)
      }
    }
  }

  def topology: TopologyInfo =
    TopologyInfo(
      name = name,
      processorConcurrency = config.processorConcurrency,
      batchers = config.batchers.map(b => BatcherInfo(b.name, b.batchSize, b.batchTimeoutMs, b.concurrency))
    )

  @volatile private var finalMetrics: Option[StageMetrics] = None

  /** Per-stage counter snapshot (the telemetry-span analog); after stop(),
    * the final snapshot taken at teardown.
    */
  def stageMetrics: Option[StageMetrics] =
    StageCounters.metricsOf(name).orElse(finalMetrics)

  def getRateLimiting: Option[graft.config.RateLimiting] = rateLimiter.map(_.get)

  def updateRateLimiting(
      allowedMessages: Option[Int] = None,
      intervalMs: Option[Long] = None,
      reset: Boolean = false
  ): Unit = rateLimiter.foreach(_.update(allowedMessages, intervalMs, reset))
}

final case class BatcherInfo(name: String, batchSize: Int, batchTimeoutMs: Long, concurrency: Int)
final case class TopologyInfo(name: String, processorConcurrency: Int, batchers: Seq[BatcherInfo])
