package graft.metrics

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** JVM-global named counters for driver-side OPERATOR events that Spark's
  * listener bus cannot see — most importantly the over-gate fallback
  * switches (BM25's broadcast→shuffle-join flip, the dense family's
  * query-shard recursion). Those switches are row-identical by
  * construction, so their only externally visible trace used to be a
  * driver-log warning; at 100 TB an operator silently running in its
  * degraded regime must be observable at `/metrics`, not greppable in
  * logs. The gate decisions happen on the driver (they hang off a
  * measured `count()`), so a process-local adder is the whole mechanism —
  * no listener, no shuffle of metric state.
  *
  * [[GraftMetrics.snapshot]] merges these into its Prometheus exposition,
  * so every [[MetricsServer]] endpoint serves them automatically.
  */
object GraftCounters {
  private val counters = new ConcurrentHashMap[String, LongAdder]()

  def inc(name: String): Unit =
    counters.computeIfAbsent(name, _ => new LongAdder).increment()

  def get(name: String): Long =
    Option(counters.get(name)).map(_.sum()).getOrElse(0L)

  def snapshot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    counters.asScala.map { case (k, v) => k -> v.sum() }.toMap
  }
}
