package graft.core

import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import graft.config.RateLimiting

/** Token-per-interval rate limiter — the analog of the reference's shared
  * `:atomics` counter (/root/reference/lib/broadway/topology/rate_limiter.ex:
  * 45-63): a budget of `allowedMessages` is granted each `intervalMs`;
  * acquisitions draw it down lock-free; over-limit work is the caller's to
  * buffer (producer-side buffering, producer_stage.ex:293-403).
  *
  * Runtime updates mirror `update_rate_limiting/2`
  * (/root/reference/lib/broadway.ex:1479-1523): new limits take effect at the
  * next interval unless `reset = true`.
  */
final class RateLimiter(initialAllowed: Int, initialIntervalMs: Long) {

  @volatile private var allowed: Int = initialAllowed
  @volatile private var intervalMs: Long = initialIntervalMs
  private val counter = new AtomicLong(initialAllowed.toLong)
  @volatile private var onReplenish: () => Unit = () => ()

  private val scheduler = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-rate-limiter")
    t.setDaemon(true)
    t
  })
  @volatile private var task: ScheduledFuture[_] = schedule()

  private def schedule(): ScheduledFuture[_] =
    scheduler.scheduleAtFixedRate(
      () => {
        counter.set(allowed.toLong)
        onReplenish()
      },
      intervalMs,
      intervalMs,
      TimeUnit.MILLISECONDS
    )

  /** Try to take up to `n` tokens; returns how many were granted (0..n). */
  def tryAcquire(n: Int): Int = {
    var granted = 0
    var done = false
    while (!done) {
      val cur = counter.get()
      if (cur <= 0) { granted = 0; done = true }
      else {
        val take = math.min(cur, n.toLong)
        if (counter.compareAndSet(cur, cur - take)) { granted = take.toInt; done = true }
      }
    }
    granted
  }

  /** Callback invoked on each interval replenish (buffered-demand replay). */
  def setOnReplenish(f: () => Unit): Unit = onReplenish = f

  def get: RateLimiting = RateLimiting(allowed, intervalMs)

  def update(newAllowed: Option[Int], newIntervalMs: Option[Long], reset: Boolean): Unit = {
    newAllowed.foreach(allowed = _)
    newIntervalMs.foreach { i =>
      intervalMs = i
      task.cancel(false)
      task = schedule()
    }
    if (reset) {
      counter.set(allowed.toLong)
      onReplenish()
    }
  }

  def shutdown(): Unit = {
    task.cancel(false)
    scheduler.shutdownNow()
  }
}
