package graft.sinks

/** St9 write-side rate limiting: a token bucket for `foreachPartition`
  * producers (the read side uses the source's own `maxOffsetsPerTrigger`).
  * One instance per task; `acquire` blocks until tokens accrue. Large
  * acquisitions (n > burst capacity) go into token debt rather than waiting
  * forever for a balance the capacity clamp could never reach.
  */
final class RateLimiter(permitsPerSec: Double, burst: Double = 0) {
  require(permitsPerSec > 0, "permitsPerSec must be positive")
  private val capacity = math.max(permitsPerSec, burst)
  private var tokens = capacity
  private var lastNanos = System.nanoTime()

  def acquire(n: Int = 1): Unit = synchronized {
    refill()
    tokens -= n // may go negative: the caller pays the debt by waiting
    while (tokens < 0) {
      val waitMs = (-tokens / permitsPerSec * 1000).toLong + 1
      Thread.sleep(math.min(waitMs, 100))
      refill()
    }
  }

  private def refill(): Unit = {
    val now = System.nanoTime()
    tokens = math.min(capacity, tokens + (now - lastNanos) / 1e9 * permitsPerSec)
    lastNanos = now
  }
}
