package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization over an event stream (beyond-reference
  * analytics, same family as the St7/St8 streaming additions): group each
  * key's events into sessions separated by inactivity gaps > `gapMs`.
  *
  * Spark-first shape: ONE hash exchange on the key + ONE sort per partition
  * feed BOTH window passes (the `lag` that finds the gap and the running
  * `sum` that numbers the sessions share partitioning and ordering, so
  * Catalyst plans them over a single Exchange+Sort) AND the per-session
  * aggregate: hashpartitioning(key) satisfies the (key, session_seq)
  * clustering — a session never straddles key partitions — so Catalyst adds
  * NO second exchange. The whole operator moves the data exactly once
  * (plan-locked in SessionizeSpec). At 100 TB one key shuffle is the floor
  * for any per-key order-dependent computation; nothing here adds to it.
  *
  * Determinism: events are ordered by (ts, tiebreak) inside each key.
  * Session ASSIGNMENT is invariant to tie order (a tie has gap 0 <= gapMs,
  * so tied events always share a session), but the explicit tiebreak keeps
  * `lag` itself deterministic under retries, matching the battery's
  * everything-is-replayable rule.
  */
object Sessionize {

  /** Per-event session tagging: input columns plus `session_seq` (1-based
    * per-key session number in time order). `tsCol` must be a numeric
    * (epoch-millis) column.
    */
  def tagSessions(events: DataFrame, keyCol: String, tsCol: String,
                  gapMs: Long, tiebreakCol: String): DataFrame = {
    val order = Seq(col(tsCol), col(tiebreakCol))
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("graft_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("graft_new_session",
        (col("graft_prev_ts").isNull ||
          col(tsCol) - col("graft_prev_ts") > gapMs).cast("long"))
      .withColumn("session_seq", sum("graft_new_session").over(run))
      .drop("graft_prev_ts", "graft_new_session")
  }

  /** One row per session: (key, session_seq, n_events, start_ms, end_ms,
    * duration_ms). The groupBy rides the windows' key partitioning — no
    * additional exchange (see object doc).
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gapMs: Long, tiebreakCol: String): DataFrame =
    tagSessions(events, keyCol, tsCol, gapMs, tiebreakCol)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ms"),
        max(col(tsCol)).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))

  /** Per-key rollup report: session count, event count, the largest session
    * and the longest inactivity-bounded span — the shape a telemetry
    * dashboard reads. Metadata-sized output (one row per key).
    */
  def sessionReport(events: DataFrame, keyCol: String, tsCol: String,
                    gapMs: Long, tiebreakCol: String): DataFrame =
    sessions(events, keyCol, tsCol, gapMs, tiebreakCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"),
        max("duration_ms").as("max_session_ms"),
        sum("duration_ms").as("total_session_ms"))

  /** Streaming counterpart on Structured Streaming's native session_window:
    * watermark-bounded, merges windows as late-but-in-watermark events
    * arrive. Output: one row per closed (key, session window) with its event
    * count — the same sessions `sessions()` computes in batch, maintained
    * incrementally with state that expires at the watermark (no unbounded
    * growth). `tsCol` must be a TIMESTAMP column here (event time).
    */
  def sessionStream(events: DataFrame, keyCol: String, tsCol: String,
                    gap: String, delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
