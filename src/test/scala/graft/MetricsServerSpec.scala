package graft

import graft.metrics.{GraftMetrics, HealthRegistry, MetricsServer}
import graft.validation.CircuitBreaker
import java.net.{HttpURLConnection, URI}

class MetricsServerSpec extends SparkSpec {

  private def get(port: Int, path: String): (Int, String, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(stream.readAllBytes(), "UTF-8")
    (code, body, String.valueOf(conn.getContentType))
  }

  test("/metrics serves Prometheus text and task counters move after a job (K10/A8)") {
    val metrics = GraftMetrics.install(spark)
    val server = MetricsServer.start(metrics, port = 0)
    try {
      val (_, before, _) = get(server.port, "/metrics")
      assert(before.contains("graft_tasks_completed_total"))
      val t0 = before.linesIterator
        .find(_.startsWith("graft_tasks_completed_total")).get.split(' ')(1).toLong
      spark.range(1000).groupBy(org.apache.spark.sql.functions.expr("id % 7"))
        .count().collect()
      // listener bus is async — poll until the task-end events drain
      var t1 = t0
      var ctype = ""
      val deadline = System.currentTimeMillis() + 10000
      while (t1 <= t0 && System.currentTimeMillis() < deadline) {
        val (code, after, ct) = get(server.port, "/metrics")
        assert(code == 200)
        ctype = ct
        t1 = after.linesIterator
          .find(_.startsWith("graft_tasks_completed_total")).get.split(' ')(1).toLong
        if (t1 <= t0) Thread.sleep(100)
      }
      assert(ctype.startsWith("text/plain"))
      assert(t1 > t0, s"tasks_completed did not move: $t0 -> $t1")
    } finally server.stop()
  }

  test("/health reflects breaker state: 200 healthy, 503 when a breaker opens") {
    var now = 0L
    val health = new HealthRegistry(clock = () => now)
    val cb = new CircuitBreaker(2, resetAfterMs = 60000, clock = () => now)
    health.registerBreaker("produce", cb)
    health.registerComponent("storage")
    health.recordRecords(500)
    val server = MetricsServer.start(new GraftMetrics, Some(health), port = 0)
    try {
      val (okCode, okBody, ctype) = get(server.port, "/health")
      assert(okCode == 200 && ctype.startsWith("application/json"))
      assert(okBody.contains(""""status":"healthy""""))
      assert(okBody.contains(""""records_processed":500"""))
      // degraded still answers 200 (reference: only Unhealthy is 503)
      health.markDegraded("storage", "slow listings")
      val (degCode, degBody, _) = get(server.port, "/healthz")
      assert(degCode == 200 && degBody.contains(""""status":"degraded""""))
      assert(degBody.contains(""""message":"slow listings""""))
      // trip the breaker → overall unhealthy → 503
      def boom(): Unit = intercept[RuntimeException](cb.call(throw new RuntimeException("x")))
      boom(); boom()
      val (badCode, badBody, _) = get(server.port, "/health")
      assert(badCode == 503)
      assert(badBody.contains(""""produce":{"status":"unhealthy""""))
    } finally server.stop()
  }

  test("cli status-watch polls the endpoint and prints counter deltas") {
    val metrics = GraftMetrics.install(spark)
    val server = MetricsServer.start(metrics, port = 0)
    try {
      Cli.run(spark, Array("status-watch",
        s"http://127.0.0.1:${server.port}", "3", "50"))
    } finally server.stop()
  }

  test("cli status-watch: dead endpoint is one loud connection error, not N timeouts") {
    // unbound port: the pre-loop /health probe must fail with guidance
    // (status_watch.rs run_watch bails before entering its ticker loop)
    val e = intercept[IllegalStateException] {
      Cli.run(spark, Array("status-watch", "http://127.0.0.1:1", "3", "50"))
    }
    assert(e.getMessage.contains("metrics enabled"), e.getMessage)
  }

  test("cli status-watch survives a mid-watch connection loss with backoff") {
    val metrics = GraftMetrics.install(spark)
    val server = MetricsServer.start(metrics, port = 0)
    val port = server.port
    // kill the server after the first scrape; the loop must print the
    // reconnect line (and keep going) instead of propagating the IOException
    val killer = new Thread(() => { Thread.sleep(120); server.stop() })
    killer.start()
    Cli.run(spark, Array("status-watch", s"http://127.0.0.1:$port", "4", "100"))
    killer.join()
  }

  test("index links endpoints; unknown paths 404") {
    val server = MetricsServer.start(new GraftMetrics, port = 0)
    try {
      val (rootCode, rootBody, _) = get(server.port, "/")
      assert(rootCode == 200 && rootBody.contains("/metrics") && rootBody.contains("/health"))
      assert(get(server.port, "/nope")._1 == 404)
    } finally server.stop()
  }

  test("over-gate fallback trips are observable at /metrics, not just in driver logs") {
    import spark.implicits._
    val bmBefore = graft.metrics.GraftCounters
      .get("bm25_shuffle_join_fallback_total")
    val dnBefore = graft.metrics.GraftCounters
      .get("dense_query_shard_fallback_total")
    // trip BM25's broadcast→shuffle-join switch: 3 queries over maxQueries=1
    val docs = (0L until 10L).map(i => (i, s"mtr w$i pi " * 10))
      .toDF("doc_id", "text")
    val qs = (0L until 3L).map(i => (i, s"mtr w$i pi"))
      .toDF("query_id", "text")
    graft.ann.Bm25.topK(docs, qs, k = 2, maxQueries = 1L).collect()
    // trip the dense family's query-shard recursion the same way
    val chunks = Seq((1L, 0L, 0L, Seq(2L, 1L)), (2L, 0L, 0L, Seq(1L, 3L)))
      .toDF("doc_id", "chunk_idx", "chunk_start", "vec")
    val qv = Seq((1L, Seq(1L, 0L)), (2L, Seq(0L, 1L)), (3L, Seq(1L, 1L)))
      .toDF("query_id", "vec")
    graft.ann.Retrieval.topKChunks(chunks, qv, k = 1, maxQueries = 1L)
      .collect()
    assert(graft.metrics.GraftCounters
      .get("bm25_shuffle_join_fallback_total") > bmBefore,
      "BM25 shuffle-join fallback must increment its counter")
    assert(graft.metrics.GraftCounters
      .get("dense_query_shard_fallback_total") > dnBefore,
      "dense shard fallback must increment its counter")
    // and both ride the Prometheus exposition every MetricsServer serves
    val server = MetricsServer.start(GraftMetrics.install(spark), port = 0)
    try {
      val (code, body, _) = get(server.port, "/metrics")
      assert(code == 200)
      assert(body.contains("graft_bm25_shuffle_join_fallback_total"), body)
      assert(body.contains("graft_dense_query_shard_fallback_total"), body)
    } finally server.stop()
    // the counters are gate-trip counters, not per-shard: an under-gate
    // serve must leave them unchanged
    val after = graft.metrics.GraftCounters
      .get("dense_query_shard_fallback_total")
    graft.ann.Retrieval.topKChunks(chunks, qv, k = 1).collect()
    assert(graft.metrics.GraftCounters
      .get("dense_query_shard_fallback_total") == after)
  }

  test("throughput window: only the trailing 10 s of samples count") {
    var now = 100000L
    val health = new HealthRegistry(clock = () => now)
    health.recordRecords(1000) // at t=100 s
    now += 5000
    health.recordRecords(500) // at t=105 s
    assert(health.currentThroughput == 150.0) // both inside the 10 s window
    now += 8000 // t=113 s: first sample aged out
    assert(health.currentThroughput == 50.0)
  }
}
