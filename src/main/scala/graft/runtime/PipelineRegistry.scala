package graft.runtime

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Global registry of running pipelines — the analog of the reference's
  * config storage (/root/reference/lib/broadway/config_storage.ex:1-44,
  * `:persistent_term` backend) powering `Broadway.all_running/0`
  * (broadway.ex:1259-1276).
  */
object PipelineRegistry {
  private val running = new ConcurrentHashMap[String, graft.core.RunningPipeline[_]]()

  def register(p: graft.core.RunningPipeline[_]): Unit = running.put(p.name, p)
  def unregister(name: String): Unit = running.remove(name)
  def get(name: String): Option[graft.core.RunningPipeline[_]] = Option(running.get(name))
  def allRunning: Seq[String] = running.keySet().asScala.toSeq.sorted

  /** Source descriptors of a running pipeline — the `producer_names/1`
    * analog (broadway.ex:1184-1197); None for unknown pipelines.
    */
  def producerNames(name: String): Option[Seq[String]] = get(name).map(_.producerNames)

  /** Gracefully drain and stop every running pipeline (each within its own
    * shutdown budget) — the terminator's process-everything-then-stop pass
    * (/root/reference/lib/broadway/topology/terminator.ex:41-60) applied
    * registry-wide. Failures stopping one pipeline don't prevent draining
    * the rest.
    */
  def drainAll(): Unit =
    running.values().asScala.toSeq.foreach { p =>
      try p.stop()
      catch { case scala.util.control.NonFatal(_) => () }
    }

  @volatile private var hookInstalled = false

  /** Install a JVM shutdown hook that drains all pipelines — the analog of
    * Broadway draining on application termination. Idempotent; opt-in
    * because tests and short-lived drivers manage lifecycles explicitly.
    */
  def installShutdownDrain(): Unit = synchronized {
    if (!hookInstalled) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => drainAll(), "graft-shutdown-drain"))
      hookInstalled = true
    }
  }
}
