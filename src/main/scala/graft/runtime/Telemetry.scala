package graft.runtime

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Progress telemetry — the analog of Broadway's `:telemetry` spans
  * (/root/reference/lib/broadway.ex:651-888): per-pipeline counters fed by a
  * `StreamingQueryListener` (micro-batch progress ≈ the processor/batcher
  * span events).
  */
object Telemetry {

  final case class PipelineMetrics(
      batches: Long = 0L,
      inputRows: Long = 0L,
      lastBatchDurationMs: Long = 0L
  )

  private val metrics = new ConcurrentHashMap[String, PipelineMetrics]()

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      metrics.compute(
        name,
        (_, old) => {
          val base = Option(old).getOrElse(PipelineMetrics())
          PipelineMetrics(
            batches = base.batches + 1,
            inputRows = base.inputRows + p.numInputRows,
            lastBatchDurationMs = Option(p.batchDuration).getOrElse(0L)
          )
        }
      )
      ()
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  private val installer = new SessionListenerInstall(listener)

  /** Idempotently attach the listener to THIS session (once per session,
    * not once per JVM — see [[SessionListenerInstall]]).
    */
  def install(spark: SparkSession): Unit = installer.ensure(spark)

  def of(pipelineName: String): PipelineMetrics =
    Option(metrics.get(pipelineName)).getOrElse(PipelineMetrics())

  def all: Map[String, PipelineMetrics] = metrics.asScala.toMap
}
