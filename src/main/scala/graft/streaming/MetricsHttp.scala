package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Prometheus scrape endpoint ≙ `utils/http.go:13-33` (the
  * reference's `:7716/metrics`; its REST API, `api/api.go:7-35`, is
  * all no-op stubs — `/metrics` is the only informative surface, so
  * it is the only one replicated).
  *
  * Serves the [[Metrics.Collector]] snapshot in the Prometheus text
  * exposition format (v0.0.4): `# TYPE` line + `graft_<name> <value>`
  * per metric. Zero dependencies — the JDK's built-in
  * `com.sun.net.httpserver` (same drop-in role as Go's `net/http`).
  *
  * Driver-side control plane only: one tiny HTTP thread, never on the
  * data path. On a cluster this runs in the driver JVM; executors
  * report through the engine's own metrics system.
  *
  * {{{
  * val collector = new Metrics.Collector
  * spark.streams.addListener(collector)
  * val http = MetricsHttp.start(collector, port = 7716)
  * // curl localhost:7716/metrics
  * http.stop()
  * }}}
  */
object MetricsHttp {

  final class Endpoint(server: HttpServer) {
    /** Bound port (useful when started with port = 0 in tests). */
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  /** Render a snapshot in Prometheus text format. */
  private[streaming] def render(snapshot: Map[String, Any]): String =
    snapshot.toSeq.sortBy(_._1).map { case (name, value) =>
      // the _total naming convention decides counter-ness regardless
      // of the value's runtime type — a Double-valued cumulative
      // metric advertised as gauge would break rate()/increase()
      val kind = if (name.endsWith("_total")) "counter" else "gauge"
      val v = value match {
        case d: Double => d.toString
        case x => x.toString
      }
      s"# TYPE graft_$name $kind\ngraft_$name $v"
    }.mkString("", "\n", "\n")

  /** Start the scrape server; `port = 0` picks a free port. */
  def start(collector: Metrics.Collector, port: Int = 7716): Endpoint = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/metrics", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        // JDK HttpServer matches contexts by PREFIX: /metricsanything
        // lands here too — serve only the exact path
        if (x.getRequestURI.getPath != "/metrics") {
          x.sendResponseHeaders(404, -1); x.close(); return
        }
        val body = render(collector.snapshot).getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.add("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        x.sendResponseHeaders(200, body.length)
        val os = x.getResponseBody
        try os.write(body) finally os.close()
        x.close()
      }
    })
    // any other path: 404 (the reference's REST API endpoints are
    // no-ops; we do not pretend to serve them). /metrics never
    // reaches this context (longest-prefix wins), so answer
    // unconditionally — an unanswered exchange leaks the connection.
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        x.sendResponseHeaders(404, -1)
        x.close()
      }
    })
    server.setExecutor(null) // single built-in dispatch thread
    server.start()
    new Endpoint(server)
  }
}
