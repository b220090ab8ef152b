package graft.sinks

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.meta.{ColumnDef, TableDef}

/** Stream-load transport against a local HTTP stub playing the
  * FE+BE roles: Basic auth on every hop, 307 redirect re-auth
  * (≙ starrocks.go:56-60), retry on in-band failure
  * (≙ starrocks.go:147-160), delete-sign rows in the payload. */
object StreamLoadStub {
  case class Req(path: String, auth: String, body: String,
      headers: Map[String, String])

  // all access guarded by StreamLoadStub.synchronized
  val requests = mutable.ArrayBuffer.empty[Req]
  @volatile var failuresRemaining = 0
  @volatile var port: Int = 0
  private var server: HttpServer = null

  private def record(ex: HttpExchange): Req = {
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    val hs = Seq("format", "strip_outer_array", "columns", "merge_type")
      .flatMap(k => Option(ex.getRequestHeaders.getFirst(k)).map(k -> _))
      .toMap
    val r = Req(ex.getRequestURI.getPath,
      Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""),
      body, hs)
    synchronized { requests += r }
    r
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  def start(): Unit = synchronized {
    if (server != null) return
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort
    // FE: always 307-redirect to the BE path (what a real FE does)
    server.createContext("/api", (ex: HttpExchange) => {
      record(ex)
      ex.getResponseHeaders.add("Location",
        s"http://127.0.0.1:$port/be${ex.getRequestURI.getPath}")
      respond(ex, 307, "")
    })
    // BE: requires auth (redirect must have re-attached it); can be
    // armed to fail in-band first (Status != Success on HTTP 200)
    server.createContext("/be/api", (ex: HttpExchange) => {
      val r = record(ex)
      if (!r.auth.startsWith("Basic "))
        respond(ex, 401, """{"Status":"Fail","Message":"no auth"}""")
      else {
        val fail = synchronized {
          if (failuresRemaining > 0) { failuresRemaining -= 1; true }
          else false
        }
        if (fail)
          respond(ex, 200, """{"Status":"Fail","Message":"intended error"}""")
        else
          respond(ex, 200, """{"Status":"Success","NumberLoadedRows":2}""")
      }
    })
    server.start()
  }

  def reset(failures: Int = 0): Unit = synchronized {
    requests.clear(); failuresRemaining = failures
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }
}

class StreamLoadSinkSpec extends SparkSpec {
  import spark.implicits._

  private val t = TableDef("db1", "t1", Seq(
    ColumnDef("id", "bigint", isPrimaryKey = true),
    ColumnDef("k", "int")))

  private def batch = Seq((1L, 10, "insert"), (2L, 20, "delete"))
    .toDF("id", "k", "op").repartition(1)

  private def sink(doris: Boolean = false) = {
    StreamLoadStub.start()
    new StreamLoadSink(s"http://127.0.0.1:${StreamLoadStub.port}",
      user = "root", password = "secret", doris = doris, retryBackoffMs = 1)
  }

  private def bePuts = StreamLoadStub.synchronized {
    StreamLoadStub.requests.filter(_.path.startsWith("/be/")).toVector
  }

  test("PUT follows the FE 307 redirect and RE-ATTACHES Basic auth") {
    val s = sink(); StreamLoadStub.reset()
    s.write(batch, t, 0L)
    val paths = StreamLoadStub.synchronized {
      StreamLoadStub.requests.map(_.path).toVector
    }
    assert(paths.contains("/api/db1/t1/_stream_load"))
    assert(paths.contains("/be/api/db1/t1/_stream_load"))
    val be = bePuts.head
    val expected = java.util.Base64.getEncoder
      .encodeToString("root:secret".getBytes("UTF-8"))
    assert(be.auth == s"Basic $expected")
  }

  test("payload is a JSON array with _delete_sign_ routing") {
    val s = sink(); StreamLoadStub.reset()
    s.write(batch, t, 0L)
    val body = bePuts.head.body
    assert(body.startsWith("[") && body.endsWith("]"))
    assert(body.contains(""""id":1,"k":10,"_delete_sign_":0"""))
    assert(body.contains(""""id":2,"k":20,"_delete_sign_":1"""))
    assert(bePuts.head.headers("format") == "json")
    assert(bePuts.head.headers("columns") == "id,k,_delete_sign_")
  }

  test("doris mode sends MERGE headers") {
    val s = sink(doris = true); StreamLoadStub.reset()
    s.write(batch, t, 0L)
    assert(bePuts.head.headers("merge_type") == "MERGE")
  }

  test("in-band Status!=Success on HTTP 200 is retried until Success") {
    val s = sink(); StreamLoadStub.reset(failures = 2)
    s.write(batch, t, 0L) // 2 in-band failures, 3rd attempt succeeds
    assert(bePuts.size == 3)
  }

  test("exhausted retries propagate the in-band failure") {
    val s = sink(); StreamLoadStub.reset(failures = 3)
    intercept[org.apache.spark.SparkException] { s.write(batch, t, 0L) }
  }
}
