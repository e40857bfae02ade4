package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Registry of every DataFrame the query library persists (the LSH
  * signature/posting intermediates and verified-pair results), so a
  * long-lived session can release them instead of relying on LRU eviction
  * under memory pressure. Query code calls `persisted(df)` in place of
  * `df.persist()`; hosts call `invalidate()` between workloads.
  *
  * Entries are keyed by (session UUID, canonicalized logical plan) — the
  * same identity Spark's CacheManager dedups persist() on — so a host
  * that rebuilds the same query repeatedly re-uses one registry slot
  * instead of growing without bound, and entries belonging to a stopped
  * session are dropped on the next registration (their cache died with
  * the SparkContext).
  *
  * Unpersisting a plan that two registered handles share is safe —
  * `unpersist` is idempotent.
  */
object Caches {
  private final case class Key(sessionId: Int, plan: LogicalPlan)

  private val registry = new ConcurrentHashMap[Key, DataFrame]()

  private def keyOf(df: DataFrame): Key =
    Key(System.identityHashCode(df.sparkSession), df.queryExecution.analyzed.canonicalized)

  /** Persist `df` (default storage level) and track it for later release.
    * Re-registering a semantically identical plan replaces the previous
    * handle rather than accumulating a new one.
    */
  def persisted(df: DataFrame): DataFrame = {
    pruneStopped()
    registry.put(keyOf(df), df.persist())
    df
  }

  /** Number of tracked (not yet invalidated) cached frames. */
  def trackedCount: Int = registry.size

  /** Drop entries whose owning SparkContext has stopped — their cached
    * blocks are already gone, keeping the handle only pins dead plans.
    */
  private def pruneStopped(): Unit =
    registry.entrySet().removeIf(e => e.getValue.sparkSession.sparkContext.isStopped)

  /** Release everything the library cached (non-blocking unpersist). */
  def invalidate(): Unit = {
    val it = registry.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      it.remove()
      val df = e.getValue
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist(blocking = false)
    }
  }
}
