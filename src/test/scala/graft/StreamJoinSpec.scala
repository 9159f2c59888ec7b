package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamJoinSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  test("stream-stream interval join: matches inside the bound, drops outside, state expires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamJoin.withinTime(
      clicks.toDF().toDF("user_id", "click_ts", "page"),
      buys.toDF().toDF("user_id", "buy_ts", "amount"),
      "user_id", "click_ts", "buy_ts",
      delay = "2 seconds", before = "0 seconds", after = "5 seconds")
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((1L, ts(0), "home"), (2L, ts(0), "promo"))
      buys.addData(
        (1L, ts(3000), 9.99),   // 3s after user 1's click → in bound
        (2L, ts(9000), 5.00),   // 9s after user 2's click → out of bound
        (3L, ts(1000), 1.00))   // no click at all
      q.processAllAvailable()
      val rows = spark.table("sj_out")
        .select("user_id", "page", "amount").as[(Long, String, Double)]
        .collect().toSet
      assert(rows == Set((1L, "home", 9.99)), s"got $rows")
      // the plan is a symmetric streaming join with watermark-bounded state
      assert(q.lastProgress.stateOperators.exists(
        _.operatorName.toLowerCase.contains("join")))
      // push the watermark far forward, then replay an old matching buy: the
      // left state for ts(0) clicks must be GONE (bounded state, not a cache
      // of the whole stream)
      clicks.addData((9L, ts(600000), "late-probe"))
      buys.addData((9L, ts(600000), 2.22))
      q.processAllAvailable()
      buys.addData((2L, ts(2000), 7.77)) // would match user 2's click... if state lived forever
      q.processAllAvailable()
      val after = spark.table("sj_out")
        .select("user_id", "amount").as[(Long, Double)].collect().toSet
      assert(after.contains((9L, 2.22)), "fresh in-watermark match still joins")
      assert(!after.contains((2L, 7.77)),
        "expired left state must not match a late right event")
    } finally q.stop()
  }

  test("clashing non-key columns fail loudly at build time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Long, Timestamp, String)]
    val b = MemoryStream[(Long, Timestamp, String)]
    val e = intercept[IllegalArgumentException] {
      StreamJoin.withinTime(
        a.toDF().toDF("k", "ts_a", "v"), b.toDF().toDF("k", "ts_b", "v"),
        "k", "ts_a", "ts_b", "1 second", "0 seconds", "1 second")
    }
    assert(e.getMessage.contains("v"))
  }
}
