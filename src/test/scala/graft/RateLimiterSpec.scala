package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.RateLimiter

/** Token-per-interval semantics (rate_limiter.ex:45-63) without Spark in
  * the loop, so timing is deterministic enough to assert on.
  */
class RateLimiterSpec extends AnyFunSuite {

  test("grants up to the budget, then zero until replenish") {
    val rl = new RateLimiter(5, 600000)
    try {
      assert(rl.tryAcquire(3) == 3)
      assert(rl.tryAcquire(3) == 2) // partial grant of the remainder
      assert(rl.tryAcquire(1) == 0)
    } finally rl.shutdown()
  }

  test("replenishes each interval and fires the callback") {
    val rl = new RateLimiter(2, 150)
    try {
      @volatile var replenished = 0
      rl.setOnReplenish(() => replenished += 1)
      assert(rl.tryAcquire(2) == 2)
      assert(rl.tryAcquire(1) == 0)
      val deadline = System.currentTimeMillis() + 5000
      while (replenished == 0 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(replenished >= 1)
      assert(rl.tryAcquire(1) == 1)
    } finally rl.shutdown()
  }

  test("update with reset applies immediately") {
    val rl = new RateLimiter(1, 600000)
    try {
      assert(rl.tryAcquire(1) == 1)
      assert(rl.tryAcquire(1) == 0)
      rl.update(Some(10), None, reset = true)
      assert(rl.get.allowedMessages == 10)
      assert(rl.tryAcquire(5) == 5)
    } finally rl.shutdown()
  }

  test("update without reset takes effect at the next interval") {
    val rl = new RateLimiter(1, 200)
    try {
      assert(rl.tryAcquire(1) == 1)
      rl.update(Some(3), None, reset = false)
      // immediately after update, the current window is still exhausted
      assert(rl.tryAcquire(3) <= 3)
      val deadline = System.currentTimeMillis() + 5000
      var got = 0
      while (got < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        got = math.max(got, rl.tryAcquire(3))
      }
      assert(got == 3)
    } finally rl.shutdown()
  }
}
