package graft.remap

import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Bulk consumer-group offset reset with bounded concurrency, per-group
  * retry + exponential backoff, and a p50/p99 commit-latency report
  * (reference restore/offset_automation.rs:48-57,202-247).
  *
  * The reference fans out OffsetCommitRequests over a tokio semaphore; here a
  * fixed thread pool bounds in-flight commits the same way. The committer is
  * the injection seam: an AdminClient `alterConsumerGroupOffsets` in
  * production, an in-memory recorder in tests (no broker in the sandbox).
  */
object BulkOffsetReset {

  /** offset_automation.rs BulkOffsetResetConfig (defaults: 50 concurrent,
    * 3 retries, 100 ms base backoff).
    */
  case class Config(
      maxConcurrent: Int = 50,
      maxRetryAttempts: Int = 3,
      retryBaseDelayMs: Long = 100,
      continueOnError: Boolean = true,
      sleeper: Long => Unit = Thread.sleep, // injectable: tests don't sleep
      clockNanos: () => Long = System.nanoTime)

  /** One group's batch: (topic, partition, new_offset) triples. */
  case class Batch(groupId: String, offsets: Seq[(String, Int, Long)])

  case class PartitionError(topic: String, partition: Int, message: String)

  /** offset_automation.rs GroupResetOutcome. */
  case class GroupOutcome(group_id: String, partitions_reset: Long,
                          partitions_failed: Long, errors: Seq[PartitionError],
                          duration_ms: Long, retry_attempts: Int)

  /** offset_automation.rs BulkOffsetResetReport + OffsetResetMetrics rollup. */
  case class Report(status: String, total_groups: Int, successful_groups: Int,
                    failed_groups: Int, total_offsets_reset: Long,
                    total_retries: Long, p50_latency_ms: Double,
                    p99_latency_ms: Double, avg_latency_ms: Double,
                    elapsed_ms: Long, offsets_per_second: Double,
                    outcomes: Seq[GroupOutcome]) {
    def toJson: String = {
      import graft.util.Json.{escape => js, num}
      val os = outcomes.map(o =>
        s"""{"group_id":${js(o.group_id)},"partitions_reset":${o.partitions_reset},""" +
          s""""partitions_failed":${o.partitions_failed},"duration_ms":${o.duration_ms},""" +
          s""""retry_attempts":${o.retry_attempts}}""").mkString("[", ",", "]")
      s"""{"status":${js(status)},"total_groups":$total_groups,""" +
        s""""successful_groups":$successful_groups,"failed_groups":$failed_groups,""" +
        s""""total_offsets_reset":$total_offsets_reset,"total_retries":$total_retries,""" +
        s""""p50_latency_ms":${num(p50_latency_ms, 2)},"p99_latency_ms":${num(p99_latency_ms, 2)},""" +
        s""""avg_latency_ms":${num(avg_latency_ms, 2)},"elapsed_ms":$elapsed_ms,""" +
        s""""offsets_per_second":${num(offsets_per_second, 1)},"outcomes":$os}"""
    }
  }

  /** Where one group-batch commit lands. Returns per-partition failures
    * (empty = whole batch committed). Implementations must be thread-safe —
    * up to `maxConcurrent` batches are in flight.
    */
  trait BatchCommitter {
    def commitBatch(group: String, offsets: Seq[(String, Int, Long)]): Seq[PartitionError]
  }

  /** Adapt the three-phase single-offset committer seam. */
  def adapt(c: graft.pipelines.GroupOffsetCommitter): BatchCommitter =
    (group: String, offsets: Seq[(String, Int, Long)]) => {
      offsets.flatMap { case (t, p, o) =>
        try { c.commit(group, t, p, o); None }
        catch { case e: Exception => Some(PartitionError(t, p, String.valueOf(e.getMessage))) }
      }
    }

  /** Build per-group batches from a reset plan (unresolved targets are not
    * committable and are excluded, as in the reference's plan application).
    */
  def batches(plan: OffsetResetPlan): Seq[Batch] =
    plan.entries.collect { case OffsetResetEntry(g, t, p, _, Some(tgt)) => (g, t, p, tgt) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (g, rows) => Batch(g, rows.map(r => (r._2, r._3, r._4))) }

  /** Execute all batches with bounded concurrency and retries. Sequential
    * 500 groups × 10 ms ≈ 5 s; at concurrency 50 ≈ 100 ms — the whole point
    * at estate scale.
    */
  def execute(committer: BatchCommitter, work: Seq[Batch],
              config: Config = Config()): Report = {
    val t0 = config.clockNanos()
    val latencies = new ConcurrentLinkedQueue[Double]()
    val offsetsReset = new AtomicLong
    val retries = new AtomicLong
    val pool = Executors.newFixedThreadPool(math.max(1, config.maxConcurrent))
    // fail-fast flag for continueOnError=false: groups not yet started when a
    // group exhausts its retries are SKIPPED (reported failed with a skip
    // marker), matching the reference's abort-on-error mode
    val aborted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val outcomes =
      try {
        val futures = work.map { batch =>
          pool.submit(new java.util.concurrent.Callable[GroupOutcome] {
            override def call(): GroupOutcome =
              if (!config.continueOnError && aborted.get())
                GroupOutcome(batch.groupId, 0, batch.offsets.size,
                  batch.offsets.map { case (t, p, _) =>
                    PartitionError(t, p, "skipped: fail-fast after earlier group failure")
                  }, 0, 0)
              else {
                val o = resetGroupWithRetry(committer, batch, config, latencies,
                  offsetsReset, retries)
                if (o.partitions_failed > 0) aborted.set(true)
                o
              }
          })
        }
        futures.map(_.get())
      } finally {
        pool.shutdown()
        pool.awaitTermination(60, TimeUnit.SECONDS)
      }
    val lats = {
      val a = latencies.toArray(Array.empty[java.lang.Double]).map(_.doubleValue())
      java.util.Arrays.sort(a); a
    }
    // offset_automation.rs percentile_latency: index = round(p/100 * (n-1))
    def pct(p: Double): Double =
      if (lats.isEmpty) 0.0
      else lats(math.min(lats.length - 1, math.round(p / 100.0 * (lats.length - 1)).toInt))
    val failedGroups = outcomes.count(_.partitions_failed > 0)
    val elapsedMs = (config.clockNanos() - t0) / 1000000L
    Report(
      status =
        if (outcomes.isEmpty) "success"
        else if (failedGroups == 0) "success"
        else if (failedGroups < outcomes.size) "partial" else "failed",
      total_groups = outcomes.size,
      successful_groups = outcomes.size - failedGroups,
      failed_groups = failedGroups,
      total_offsets_reset = offsetsReset.get(),
      total_retries = retries.get(),
      p50_latency_ms = pct(50), p99_latency_ms = pct(99),
      avg_latency_ms = if (lats.isEmpty) 0.0 else lats.sum / lats.length,
      elapsed_ms = elapsedMs,
      offsets_per_second =
        if (elapsedMs == 0) 0.0 else offsetsReset.get().toDouble / elapsedMs * 1000.0,
      outcomes = outcomes)
  }

  /** offset_automation.rs reset_group_with_retry: commit, keep only the
    * failed partitions, back off exponentially (base × 2^(attempt-1) + 10%
    * deterministic jitter — rand would make retry timing untestable), retry
    * up to maxRetryAttempts.
    */
  private def resetGroupWithRetry(committer: BatchCommitter, batch: Batch,
                                  config: Config,
                                  latencies: ConcurrentLinkedQueue[Double],
                                  offsetsReset: AtomicLong,
                                  retries: AtomicLong): GroupOutcome = {
    val start = config.clockNanos()
    var pending = batch.offsets
    var errors: Seq[PartitionError] = Nil
    var attempt = 0
    var done = false
    while (!done) {
      val reqStart = config.clockNanos()
      errors = committer.commitBatch(batch.groupId, pending)
      latencies.add((config.clockNanos() - reqStart) / 1e6)
      val failedKeys = errors.map(e => (e.topic, e.partition)).toSet
      offsetsReset.addAndGet((pending.size - failedKeys.size).toLong)
      if (failedKeys.isEmpty || attempt >= config.maxRetryAttempts) done = true
      else {
        pending = pending.filter(o => failedKeys.contains((o._1, o._2)))
        attempt += 1
        retries.incrementAndGet()
        val backoff = config.retryBaseDelayMs * (1L << (attempt - 1))
        val jitter = (backoff * 0.1 * ((batch.groupId.hashCode & 0xff) / 255.0)).toLong
        config.sleeper(backoff + jitter)
      }
    }
    GroupOutcome(batch.groupId, batch.offsets.size - errors.size, errors.size,
      errors, (config.clockNanos() - start) / 1000000L, attempt)
  }
}
