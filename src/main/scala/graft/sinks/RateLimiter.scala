package graft.sinks

/** St9 write-side rate limiting: a token bucket for `foreachPartition`
  * producers (the read side uses the source's own `maxOffsetsPerTrigger`).
  * One instance per task; `acquire` blocks until tokens accrue.
  */
final class RateLimiter(permitsPerSec: Double, burst: Double = 0) {
  private val capacity = math.max(permitsPerSec, burst)
  private var tokens = capacity
  private var lastNanos = System.nanoTime()

  def acquire(n: Int = 1): Unit = synchronized {
    while (tokens < n) {
      val now = System.nanoTime()
      tokens = math.min(capacity, tokens + (now - lastNanos) / 1e9 * permitsPerSec)
      lastNanos = now
      if (tokens < n) {
        val waitMs = ((n - tokens) / permitsPerSec * 1000).toLong + 1
        Thread.sleep(math.min(waitMs, 100))
      }
    }
    tokens -= n
  }
}
