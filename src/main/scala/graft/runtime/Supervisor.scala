package graft.runtime

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable
import scala.util.control.NonFatal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import graft.config.RestartPolicy
import graft.core.RunningPipeline

/** Restart-on-failure supervision — the analog of the reference's
  * supervision tree (/root/reference/lib/broadway/topology.ex:506-557:
  * crashed stages restart and resubscribe, tested at
  * test/broadway_test.exs:2070-2347). Spark's unit of failure is the whole
  * `StreamingQuery`, so supervision here means: a `StreamingQueryListener`
  * watches supervised queries, and when one terminates WITH an exception it
  * is rebuilt and restarted from its checkpoint — the offset log makes the
  * failed micro-batch replay, so an idempotent sink observes effectively-
  * once delivery. Restarts are budgeted by [[graft.config.RestartPolicy]]
  * (max_restarts within a sliding max_seconds window); exceeding the budget
  * gives up permanently, like a supervisor exceeding its restart intensity.
  *
  * The restart runs on a dedicated daemon thread, not the listener bus
  * thread — `DataStreamWriter.start` itself posts listener events and must
  * not block the bus.
  */
object Supervisor {

  private final class State(
      val pipelineName: String,
      val running: RunningPipeline[_],
      val policy: RestartPolicy,
      val build: () => StreamingQuery,
      val restartTimes: mutable.ArrayDeque[Long] = mutable.ArrayDeque.empty
  )

  /** Live supervised runs, keyed by runId (unique per physical run). */
  private val entries = new ConcurrentHashMap[UUID, State]()

  /** Terminal outcomes + counters, keyed by pipeline name (for tests and
    * operator introspection — the `all_running/0` style surface).
    */
  private val restartCounts = new ConcurrentHashMap[String, Integer]()
  private val gaveUpSet = ConcurrentHashMap.newKeySet[String]()

  @volatile private var installed = false

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      val st = entries.remove(e.runId)
      if (st != null && e.exception.isDefined) {
        val t = new Thread(() => attemptRestart(st), s"graft-supervisor-${st.pipelineName}")
        t.setDaemon(true)
        t.start()
      }
    }
  }

  private def attemptRestart(st: State): Unit = {
    val now = System.currentTimeMillis()
    val windowStart = now - st.policy.withinSeconds * 1000L
    st.restartTimes.removeHeadWhile(_ < windowStart)
    if (st.restartTimes.size >= st.policy.maxRestarts) {
      gaveUpSet.add(st.pipelineName)
      PipelineRegistry.unregister(st.pipelineName)
      ()
    } else {
      st.restartTimes.append(now)
      try {
        val q = st.build()
        st.running.replaceQuery(q)
        restartCounts.merge(st.pipelineName, 1, (a, b) => a + b)
        entries.put(q.runId, st)
        ()
      } catch {
        case NonFatal(_) =>
          gaveUpSet.add(st.pipelineName)
          PipelineRegistry.unregister(st.pipelineName)
          ()
      }
    }
  }

  /** Put a running pipeline under supervision. Idempotently installs the
    * session listener.
    */
  def supervise(
      spark: SparkSession,
      running: RunningPipeline[_],
      policy: RestartPolicy,
      build: () => StreamingQuery
  ): Unit = {
    synchronized {
      if (!installed) {
        spark.streams.addListener(listener)
        installed = true
      }
    }
    val st = new State(running.name, running, policy, build)
    entries.put(running.query.runId, st)
    ()
  }

  /** Drop supervision for a run (called on intentional stop, so a clean
    * shutdown never races a restart).
    */
  def forget(runId: UUID): Unit = { entries.remove(runId); () }

  /** Completed restarts for a pipeline name. */
  def restartCount(pipelineName: String): Int =
    Option(restartCounts.get(pipelineName)).fold(0)(_.intValue())

  /** True once the restart budget was exhausted (supervisor "died"). */
  def gaveUp(pipelineName: String): Boolean = gaveUpSet.contains(pipelineName)

  /** Test hook: clear terminal state for a pipeline name. */
  def reset(pipelineName: String): Unit = {
    restartCounts.remove(pipelineName)
    gaveUpSet.remove(pipelineName)
    ()
  }
}
