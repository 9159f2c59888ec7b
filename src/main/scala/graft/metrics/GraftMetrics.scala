package graft.metrics

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.LongAdder

/** Engine-level counters (A8/K10, reference metrics/registry.rs) sourced from
  * Spark's listener bus instead of hand-rolled instrumentation: records and
  * bytes read/written, shuffle traffic, task counts and time. A snapshot maps
  * 1:1 onto the reference's counter names; serving them over HTTP is a
  * presentation concern left to the deployment (Spark's own metrics sinks
  * already export these).
  */
final class GraftMetrics extends SparkListener {
  val recordsRead = new LongAdder
  val bytesRead = new LongAdder
  val recordsWritten = new LongAdder
  val bytesWritten = new LongAdder
  val shuffleBytesWritten = new LongAdder
  val tasksCompleted = new LongAdder
  val tasksFailed = new LongAdder
  val taskTimeMs = new LongAdder

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    // completed means SUCCEEDED — counting failed tasks as completed would
    // show a 100% completion panel during an outage
    if (taskEnd.reason == org.apache.spark.Success) tasksCompleted.increment()
    else tasksFailed.increment()
    val m = taskEnd.taskMetrics
    if (m != null) {
      recordsRead.add(m.inputMetrics.recordsRead)
      bytesRead.add(m.inputMetrics.bytesRead)
      recordsWritten.add(m.outputMetrics.recordsWritten)
      bytesWritten.add(m.outputMetrics.bytesWritten)
      shuffleBytesWritten.add(m.shuffleWriteMetrics.bytesWritten)
      taskTimeMs.add(m.executorRunTime)
    }
  }

  def snapshot: Map[String, Long] = Map(
    "records_read_total" -> recordsRead.sum(),
    "bytes_read_total" -> bytesRead.sum(),
    "records_written_total" -> recordsWritten.sum(),
    "bytes_written_total" -> bytesWritten.sum(),
    "shuffle_bytes_written_total" -> shuffleBytesWritten.sum(),
    "tasks_completed_total" -> tasksCompleted.sum(),
    "tasks_failed_total" -> tasksFailed.sum(),
    "task_time_ms_total" -> taskTimeMs.sum()) ++
    // driver-side operator counters (over-gate fallback trips etc.) ride
    // the same exposition — see GraftCounters
    GraftCounters.snapshot

  /** Prometheus text exposition rendering of the snapshot. */
  def prometheusText: String =
    snapshot.toSeq.sortBy(_._1)
      .map { case (k, v) => s"graft_$k $v" }.mkString("", "\n", "\n")
}

object GraftMetrics {
  /** Register a fresh collector on the session's listener bus. */
  def install(spark: SparkSession): GraftMetrics = {
    val m = new GraftMetrics
    spark.sparkContext.addSparkListener(m)
    m
  }
}
