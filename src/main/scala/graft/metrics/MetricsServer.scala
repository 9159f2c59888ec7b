package graft.metrics

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** The metrics/health HTTP endpoint (reference metrics/server.rs:1-371):
  *
  *  - `/metrics` (or a configured path) — Prometheus text exposition;
  *  - `/health` and `/healthz` — JSON health report, HTTP 503 when overall
  *    status is unhealthy (degraded still answers 200, like the reference);
  *  - `/` — HTML index linking the two;
  *  - anything else — 404.
  *
  * Built on the JDK's com.sun.net.httpserver — no extra dependency; one
  * small thread pool, driver-side only (metrics are collected from the
  * listener bus, so the driver sees the whole app).
  */
final class MetricsServer private (server: HttpServer, val port: Int) {
  def stop(): Unit = server.stop(0)
}

object MetricsServer {

  /** Start on `port` (0 = ephemeral; read the bound port from `.port`). */
  def start(metrics: GraftMetrics,
            health: Option[HealthRegistry] = None,
            port: Int = 9090,
            metricsPath: String = "/metrics"): MetricsServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    // daemon threads: a metrics endpoint must never keep the driver JVM
    // alive after the app's main exits without calling stop()
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(2,
      (r: Runnable) => { val t = new Thread(r, "graft-metrics-http"); t.setDaemon(true); t }))

    def respond(x: HttpExchange, code: Int, contentType: String, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.set("Content-Type", contentType)
      x.sendResponseHeaders(code, bytes.length.toLong)
      try x.getResponseBody.write(bytes) finally x.close()
    }

    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = try {
        x.getRequestURI.getPath match {
          case p if p == metricsPath || p == "/metrics" =>
            respond(x, 200, "text/plain; version=0.0.4; charset=utf-8",
              metrics.prometheusText)
          case "/health" | "/healthz" =>
            health match {
              case Some(h) =>
                val r = h.report()
                val code = if (r.status == HealthRegistry.Unhealthy) 503 else 200
                respond(x, code, "application/json", r.toJson)
              case None =>
                respond(x, 200, "application/json", """{"status":"healthy"}""")
            }
          case "/" =>
            respond(x, 200, "text/html; charset=utf-8",
              s"""<!DOCTYPE html><html><head><title>Graft Metrics</title></head>
                 |<body><h1>Graft Metrics Server</h1><ul>
                 |<li><a href="$metricsPath">$metricsPath</a> - Prometheus metrics</li>
                 |<li><a href="/health">/health</a> - Health check</li>
                 |</ul></body></html>""".stripMargin)
          case _ =>
            respond(x, 404, "text/plain", "Not Found")
        }
      } catch { case scala.util.control.NonFatal(e) =>
        try respond(x, 500, "text/plain", String.valueOf(e.getMessage))
        catch { case _: Throwable => x.close() }
      }
    })
    server.start()
    new MetricsServer(server, server.getAddress.getPort)
  }
}
