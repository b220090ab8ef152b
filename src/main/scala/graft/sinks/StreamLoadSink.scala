package graft.sinks

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}

import graft.meta.TableDef
import graft.streaming.Pipeline
import graft.streaming.Pipeline.BatchSink

/** HTTP transport for the StarRocks/Doris stream-load sink
  * (≙ `outputs/starrocks/starrocks.go:136-208`,
  * `outputs/doris/doris.go:136-210`): PUT a JSON array of rows to
  * `/api/{db}/{table}/_stream_load` with the format/columns headers
  * from [[Formats.streamLoadHeaders]] and Basic auth.
  *
  * Reference-parity behaviors:
  *  - Basic auth header on the initial request
  *    (`starrocks.go:170`) AND re-attached on every redirect hop —
  *    the FE answers 307 to a BE address, and the default HTTP client
  *    drops Authorization across redirects, so the reference installs
  *    a CheckRedirect hook (`starrocks.go:56-60`); here redirects are
  *    followed manually with the header re-added.
  *  - request-level retry, 3 tries, linear 5s·attempt backoff
  *    (`starrocks.go:147-160`).
  *  - a 200 whose body lacks `"Status":"Success"` is a FAILURE
  *    (`starrocks.go:196-203`) — stream load reports errors in-band.
  *
  * Rows are formatted by the declarative [[Formats.streamLoadJson]]
  * (codegen'd `to_json`, `_delete_sign_` routing included) and sent
  * per-partition from the executors; only bounded chunks are held in
  * memory.
  */
final class StreamLoadSink(
    baseUrl: String,
    user: String,
    password: String,
    doris: Boolean = false,
    rowsPerRequest: Int = 10240, // ≙ DefaultBatchSize, starrocks_utils.go:14
    retries: Int = 3,
    retryBackoffMs: Long = 5000,
    maxRedirects: Int = 3) extends BatchSink {

  override def write(batch: DataFrame, t: TableDef, batchId: Long): Unit = {
    val url = s"$baseUrl/api/${t.schema}/${t.name}/_stream_load"
    val headers = Formats.streamLoadHeaders(t, doris)
    val auth = java.util.Base64.getEncoder.encodeToString(
      s"$user:$password".getBytes(StandardCharsets.UTF_8)) // ≙ auth(), starrocks_utils.go:21-27
    val (n, rt, bo, mr) = (rowsPerRequest, retries, retryBackoffMs, maxRedirects)
    Formats.streamLoadJson(batch, t).foreachPartition { (it: Iterator[Row]) =>
      it.grouped(n).foreach { chunk =>
        val body = chunk.map(_.getString(0)).mkString("[", ",", "]")
        Pipeline.retry(rt, bo) {
          StreamLoadSink.send(url, body, headers, auth, mr)
        }
      }
    }
  }
}

object StreamLoadSink {

  /** One stream-load PUT, following redirects manually so the Basic
    * auth header survives each hop. Throws on transport errors, non-2xx
    * codes, and in-band `"Status" != "Success"` responses — the caller
    * retries. */
  private[sinks] def send(url0: String, body: String,
      headers: Map[String, String], basicAuth: String,
      maxRedirects: Int): Unit = {
    var url = url0
    var hops = 0
    while (true) {
      val conn = URI.create(url).toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      try {
        conn.setRequestMethod("PUT")
        conn.setInstanceFollowRedirects(false)
        conn.setDoOutput(true)
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        // re-attached on EVERY hop ≙ CheckRedirect, starrocks.go:56-60
        conn.setRequestProperty("Authorization", "Basic " + basicAuth)
        val out = conn.getOutputStream
        try out.write(body.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        val code = conn.getResponseCode
        if (code == 307 || code == 308 || code == 301 || code == 302) {
          val loc = conn.getHeaderField("Location")
          if (loc == null) throw new IOException(s"redirect $code without Location")
          hops += 1
          if (hops > maxRedirects)
            throw new IOException(s"too many stream-load redirects ($hops)")
          url = URI.create(url).resolve(loc).toString
        } else {
          val stream =
            if (code / 100 == 2) conn.getInputStream else conn.getErrorStream
          val respBody =
            if (stream == null) ""
            else try new String(stream.readAllBytes(), StandardCharsets.UTF_8)
            finally stream.close()
          if (code / 100 != 2)
            throw new IOException(s"stream load HTTP $code: $respBody")
          val status = """"Status"\s*:\s*"([^"]+)"""".r
            .findFirstMatchIn(respBody).map(_.group(1))
          // ≙ starrocks.go:196-203: non-Success body is an error even on 200
          if (!status.contains("Success"))
            throw new IOException(s"stream load failed: $respBody")
          return
        }
      } finally conn.disconnect()
    }
  }
}
