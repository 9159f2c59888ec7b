package graft

import graft.operators.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {

  private val Gap = 1000L // 1s gap for fixture readability

  private def fixture = {
    import spark.implicits._
    // user 1: [0, 500, 900] | [3000, 3100] — two sessions
    // user 2: [0] | [5000] | [10000] — three singletons
    // ties (user 3 at t=100 twice) share a session regardless of order
    Seq(
      (1L, 0L, 1L), (1L, 500L, 2L), (1L, 900L, 3L),
      (1L, 3000L, 4L), (1L, 3100L, 5L),
      (2L, 0L, 6L), (2L, 5000L, 7L), (2L, 10000L, 8L),
      (3L, 100L, 9L), (3L, 100L, 10L)
    ).toDF("user_id", "ts_ms", "event_id")
  }

  test("sessions: gaps-and-islands boundaries, durations, counts") {
    val s = Sessionize.sessions(fixture, "user_id", "ts_ms", Gap, "event_id")
      .orderBy("user_id", "session_seq").collect()
    val byUser = s.groupBy(_.getLong(0))
    assert(byUser(1L).length == 2)
    assert(byUser(1L).map(r => (r.getLong(2), r.getLong(5))).toSeq ==
      Seq((3L, 900L), (2L, 100L)), "user 1: (n_events, duration) per session")
    assert(byUser(2L).length == 3 && byUser(2L).forall(_.getLong(2) == 1L))
    assert(byUser(3L).length == 1 && byUser(3L).head.getLong(2) == 2L,
      "tied timestamps share a session")
  }

  test("sessionReport rollup matches sessions") {
    val r = Sessionize.sessionReport(fixture, "user_id", "ts_ms", Gap, "event_id")
      .orderBy("user_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 2L, 5L), (2L, 3L, 3L), (3L, 1L, 2L)))
    val u1 = r(0)
    assert(u1.getAs[Long]("max_session_events") == 3L)
    assert(u1.getAs[Long]("max_session_ms") == 900L)
    assert(u1.getAs[Long]("total_session_ms") == 1000L)
  }

  test("plan: one key exchange feeds both window passes and the session agg partials map-side") {
    val p = Sessionize.sessions(fixture, "user_id", "ts_ms", Gap, "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    // exactly 1: hashpartitioning(user_id) satisfies the (user_id,
    // session_seq) aggregate's clustering (groups never straddle key
    // partitions), so the windows AND the session aggregate all ride the
    // one key shuffle — the whole operator moves the data once
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
    assert("Sort ".r.findAllIn(p).size <= 2, s"windows must share one sort:\n$p")
    assert(p.contains("partial_count") || p.contains("partial"), "session agg must partial-combine")
  }

  test("session assignment is partitioning-invariant") {
    val a = Sessionize.sessions(fixture.repartition(7), "user_id", "ts_ms", Gap, "event_id")
    val b = Sessionize.sessions(fixture.coalesce(1), "user_id", "ts_ms", Gap, "event_id")
    assert(a.orderBy("user_id", "session_seq").collect().toSeq ==
      b.orderBy("user_id", "session_seq").collect().toSeq)
  }

  test("streaming session_window agrees with batch sessions on closed windows (St7 family)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new Timestamp(1700000000000L + ms)
    val input = MemoryStream[(Long, Timestamp)]
    val out = Sessionize.sessionStream(
      input.toDF().toDF("user_id", "ts"), "user_id", "ts",
      gap = "1 second", delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, ts(0)), (1L, ts(500)), (1L, ts(900)), (2L, ts(0)))
      q.processAllAvailable()
      // advance the watermark far past the sessions so they close
      input.addData((9L, ts(60000)))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "n_events").as[(Long, Long)].collect().toMap
      assert(rows.get(1L).contains(3L),
        s"user 1's three gap-joined events form one session: $rows")
      assert(rows.get(2L).contains(1L))
    } finally q.stop()
  }
}
