package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry of every DataFrame the query library persists (the LSH
  * signature/posting intermediates and verified-pair results), so a
  * long-lived session can release them instead of relying on LRU eviction
  * under memory pressure. Query code calls `persisted(df)` in place of
  * `df.persist()`; hosts call `invalidate()` between workloads.
  *
  * Unpersisting a plan that two registered handles share (Spark's
  * CacheManager dedups persist() by canonicalized plan) is safe —
  * `unpersist` is idempotent.
  */
object Caches {
  private val registry = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (default storage level) and track it for later release. */
  def persisted(df: DataFrame): DataFrame = {
    registry.add(df.persist())
    df
  }

  /** Number of tracked (not yet invalidated) cached frames. */
  def trackedCount: Int = registry.size

  /** Release everything the library cached (non-blocking unpersist). */
  def invalidate(): Unit = {
    var df = registry.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = registry.poll()
    }
  }
}
