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
  *
  * Build attribution: query code wraps a shared-build family in
  * `buildScope("name") { ... }`; every COLD registration (a plan not
  * already tracked) inside the scope is logged as (name, frame) in
  * registration order. The bench reads `registrationLog` to decompose a
  * query's cold time into named shared-build charges — registration order
  * is dependency order (DataFrames register bottom-up during
  * construction), so materializing the log front-to-back times each build
  * incrementally against its already-warm prerequisites.
  */
object Caches {
  private final case class Key(sessionId: Int, plan: LogicalPlan)

  private val registry = new ConcurrentHashMap[Key, DataFrame]()

  // dynamic scope for build attribution (driver-side plan construction is
  // single-threaded per query — a ThreadLocal stack is exact)
  private val scope = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }
  // ordered (tag, frame) log of COLD registrations since the last
  // invalidate/drain — small (≤ tracked frames), driver-only bookkeeping
  private val regLog =
    java.util.Collections.synchronizedList(new java.util.ArrayList[(String, DataFrame)]())

  private def keyOf(df: DataFrame): Key =
    Key(System.identityHashCode(df.sparkSession), df.queryExecution.analyzed.canonicalized)

  /** Run `body` with cold registrations attributed to `name`. Nested
    * scopes win (a composite build's inner families keep their own
    * names), so tags stay atomic and charge sums never double count.
    */
  def buildScope[T](name: String)(body: => T): T = {
    val prev = scope.get()
    scope.set(name :: prev)
    try body
    finally scope.set(prev)
  }

  /** Persist `df` (default storage level) and track it for later release.
    * Re-registering a semantically identical plan replaces the previous
    * handle rather than accumulating a new one.
    */
  def persisted(df: DataFrame): DataFrame = {
    pruneStopped()
    val prev = registry.put(keyOf(df), df.persist())
    if (prev == null) {
      regLog.add((scope.get().headOption.getOrElse("other"), df))
    }
    df
  }

  /** Number of tracked (not yet invalidated) cached frames. */
  def trackedCount: Int = registry.size

  /** Cold registrations (tag, frame) since the last invalidate/drain, in
    * dependency (construction) order. Read-only snapshot.
    */
  def registrationLog: Seq[(String, DataFrame)] =
    regLog.synchronized(Seq(regLog.toArray(Array.empty[(String, DataFrame)]): _*))

  /** Tags cold-registered since the last invalidate/drain, deduped, in
    * first-registration order.
    */
  def coldBuildTags: Seq[String] = registrationLog.map(_._1).distinct

  /** Drop entries whose owning SparkContext has stopped — their cached
    * blocks are already gone, keeping the handle only pins dead plans.
    */
  private def pruneStopped(): Unit =
    registry.entrySet().removeIf(e => e.getValue.sparkSession.sparkContext.isStopped)

  /** Release everything the library cached (non-blocking unpersist). */
  def invalidate(): Unit = {
    regLog.clear()
    val it = registry.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      it.remove()
      val df = e.getValue
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist(blocking = false)
    }
  }
}
