package graft.metrics

import graft.validation.CircuitBreaker
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Aggregated component-health view (reference health.rs:1-359): named
  * components with healthy/degraded/unhealthy states, overall = worst of all,
  * plus process counters (uptime, active jobs, records, recent throughput).
  *
  * `clock` is injectable for deterministic tests (the reference uses Instant
  * internally for the same bookkeeping).
  */
final class HealthRegistry(clock: () => Long = () => System.currentTimeMillis()) {

  import HealthRegistry._

  private val startMs = clock()
  private case class ComponentState(status: String, message: Option[String],
                                    lastCheckedMs: Long, lastSuccessMs: Option[Long])
  private val components =
    new java.util.concurrent.ConcurrentHashMap[String, ComponentState]()
  private val breakers =
    new java.util.concurrent.ConcurrentHashMap[String, CircuitBreaker]()
  private val recordsProcessed = new AtomicLong
  private val activeJobs = new AtomicLong
  // (epoch ms, count) samples for the 10 s throughput window; 60 s retained
  private val samples = new AtomicReference[Vector[(Long, Long)]](Vector.empty)

  def registerComponent(name: String): Unit = {
    val now = clock()
    components.put(name, ComponentState(Healthy, None, now, Some(now)))
  }

  /** Tie a component to a circuit breaker: its state is derived at report
    * time (closed → healthy, half-open → degraded, open → unhealthy) —
    * breaker trips surface in /health without extra plumbing.
    */
  def registerBreaker(name: String, cb: CircuitBreaker): Unit =
    breakers.put(name, cb)

  def updateComponent(name: String, status: String, message: Option[String]): Unit = {
    val now = clock()
    components.compute(name, (_, prev) => ComponentState(status, message, now,
      if (status == Healthy) Some(now)
      else Option(prev).flatMap(_.lastSuccessMs)))
  }

  def markHealthy(name: String): Unit = updateComponent(name, Healthy, None)
  def markDegraded(name: String, msg: String): Unit =
    updateComponent(name, Degraded, Some(msg))
  def markUnhealthy(name: String, msg: String): Unit =
    updateComponent(name, Unhealthy, Some(msg))

  def jobStarted(): Unit = activeJobs.incrementAndGet()
  def jobCompleted(): Unit = activeJobs.decrementAndGet()

  def recordRecords(n: Long): Unit = {
    recordsProcessed.addAndGet(n)
    val now = clock()
    samples.updateAndGet(v => (v :+ (now, n)).filter(_._1 > now - 60000L))
  }

  /** Records/sec over the trailing 10 s window (health.rs current_throughput). */
  def currentThroughput: Double = {
    val cutoff = clock() - 10000L
    samples.get().iterator.filter(_._1 > cutoff).map(_._2).sum / 10.0
  }

  def report(): HealthReport = {
    val now = clock()
    val fromBreakers = breakers.entrySet().iterator()
    val breakerComponents = Iterator.continually(fromBreakers)
      .takeWhile(_.hasNext).map(_.next()).map { e =>
        val st = e.getValue.state match {
          case "closed" => Healthy
          case "half-open" => Degraded
          case _ => Unhealthy
        }
        ComponentHealth(e.getKey, st,
          if (st == Healthy) None else Some(s"circuit breaker ${e.getValue.state}"),
          now, None)
      }.toVector
    val it = components.entrySet().iterator()
    val explicit = Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).map { e =>
      val s = e.getValue
      ComponentHealth(e.getKey, s.status, s.message, s.lastCheckedMs,
        s.lastSuccessMs.map(now - _))
    }.toVector
    // one entry per name: a component registered both explicitly and as a
    // breaker would emit duplicate JSON keys (parsers keep only one, hiding
    // the other state) — merge with the WORST status winning
    val rank = Map(Healthy -> 0, Degraded -> 1, Unhealthy -> 2)
    val all = (explicit ++ breakerComponents)
      .groupBy(_.name).values
      .map(_.maxBy(c => rank.getOrElse(c.status, 2)))
      .toVector.sortBy(_.name)
    val overall =
      if (all.exists(_.status == Unhealthy)) Unhealthy
      else if (all.exists(_.status == Degraded)) Degraded
      else Healthy
    HealthReport(overall, (now - startMs) / 1000.0, all, activeJobs.get(),
      recordsProcessed.get(), currentThroughput)
  }
}

object HealthRegistry {
  val Healthy = "healthy"
  val Degraded = "degraded"
  val Unhealthy = "unhealthy"
}

case class ComponentHealth(name: String, status: String, message: Option[String],
                           lastCheckedMs: Long, lastSuccessMs: Option[Long])

case class HealthReport(status: String, uptimeSecs: Double,
                        components: Vector[ComponentHealth], activeJobs: Long,
                        recordsProcessed: Long, currentThroughput: Double) {

  /** The /health JSON body (metrics/server.rs handle_health_request shape). */
  def toJson: String = {
    import graft.util.Json.{escape => js, num}
    val comps = components.map { c =>
      s"${js(c.name)}:{" +
        s""""status":${js(c.status)},"message":${c.message.map(js).getOrElse("null")}}"""
    }.mkString(",")
    s"""{"status":${js(status)},"uptime_secs":${uptimeSecs.round},""" +
      s""""active_jobs":$activeJobs,"records_processed":$recordsProcessed,""" +
      s""""current_throughput":${num(currentThroughput, 1)},"components":{$comps}}"""
  }
}
