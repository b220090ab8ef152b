package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.CRC32

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.{Binlog, BinlogClient, FakeMaster}
import graft.sources.Binlog.{Type => T}
import graft.sources.BinlogWriter
import graft.sources.BinlogWriter._

/** The reference's PRIMARY pipeline, end-to-end over a real TCP
  * socket: registry `mysql` source conf (exactly what a TOML
  * `[input] type="mysql"` assembles) → replication-protocol session
  * against a scripted master → driver-side relay segments → DSv2
  * `graft-binlog` stream → typed ChangeEvents, consumed by a real
  * Structured Streaming query (≙ `inputs/mysql/mysql.go:41` +
  * `mysql_replication.go:38-65` + the channel into transforms).
  * After MySqlSessionSpec (client/relay layers) this leaves no
  * untested seam between a master's socket and the typed stream —
  * only a production MySQL build itself is absent.
  */
class MySqlSourceE2eSpec extends SparkSpec {

  private val sid = Array.tabulate(16)(i => (i + 1).toByte)
  private val cols = Seq(Col(T.Long, 0), Col(T.Varchar, 20))

  private def writeRowsTxn(gno: Long, ids: Seq[(Int, String)]) = Seq(
    Binlog.GtidEvent -> gtid(sid, gno),
    Binlog.TableMapEvent -> tableMap(5, "shop", "users", cols),
    Binlog.WriteRowsV2 -> rows(Binlog.WriteRowsV2, 5, 2, ids.map { case (id, s) =>
      Seq(v(new Buf().u32(id.toLong)), v(new Buf().u8(s.getBytes.length).raw(s.getBytes)))
    }),
    Binlog.XidEvent -> xid(gno))

  import BinlogWriter.{artificialRotate, splitFrames}

  test("registry mysql source: TCP master → relay → DSv2 → typed change events") {
    val masterFile = BinlogWriter.file(
      writeRowsTxn(1, Seq(1 -> "ann", 2 -> "bob")) ++
        writeRowsTxn(2, Seq(3 -> "cyd")) :+
        // the reference's other replication concern: DDL rides the
        // same stream (mysql_replication.go:186-226) — it must arrive
        // as an op="ddl" event for SchemaEvolution, not be dropped
        (Binlog.QueryEvent ->
          query("shop", "ALTER TABLE users ADD COLUMN note VARCHAR(64)")))
    val master = new FakeMaster("secret", Seq(FakeMaster.Session(
      FakeMaster.NativeOk,
      artificialRotate("binlog.000001", 4) +: splitFrames(masterFile),
      afterFrames = "hold"))) // a live master: stream, then stay quiet
    val relayDir = Files.createTempDirectory("graft-mysql-e2e-relay")
    val ckpt = Files.createTempDirectory("graft-mysql-e2e-ckpt").toString
    try {
      val stream = Registry.source("mysql", spark, Map(
        "host" -> "127.0.0.1", "port" -> master.port.toString,
        "user" -> "repl", "password" -> "secret", "serverId" -> "4321",
        "relayDir" -> relayDir.toString,
        "tables" -> "shop.users:id|name",
        "file" -> "binlog.000001", "pos" -> "4",
        "retryBackoffMs" -> "100", "maxRetries" -> "3"))
      // the relay appends asynchronously; wait until the whole master
      // file (magic + every frame) is on disk before draining
      val seg = relayDir.resolve("binlog.000001")
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while ((!Files.exists(seg) || Files.size(seg) < masterFile.length) &&
          System.nanoTime() < deadline) Thread.sleep(50)
      assert(Files.exists(seg) && Files.size(seg) == masterFile.length,
        s"relay did not reproduce the master file in time " +
          s"(${if (Files.exists(seg)) Files.size(seg) else -1}/${masterFile.length})")

      val seen = collection.mutable.ArrayBuffer.empty[(String, String, String, Long, String)]
      val q = stream.writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.selectExpr("op", "after['name']", "after['sql']", "seq", "pos")
            .collect().map(r => (r.getString(0), r.getString(1),
              r.getString(2), r.getLong(3), r.getString(4)))
          seen.synchronized { seen ++= rows }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000), "stream did not drain")

      val rows = seen.sortBy(_._4).toVector
      val dml = rows.filter(_._1 == "insert")
      assert(dml.map(r => (r._1, r._2)) ==
        Vector(("insert", "ann"), ("insert", "bob"), ("insert", "cyd")), rows)
      // GTID watermark rides along as the ACCUMULATED executed set:
      // rows of txn 1 carry uuid:1, rows after txn 2 carry uuid:1-2
      assert(dml.take(2).forall(_._5.endsWith(":1")), rows)
      assert(dml.last._5.endsWith(":1-2"), rows)
      // the ALTER arrives as a ddl event on the same ordered stream,
      // after every DML row, carrying the statement for the registry
      val ddl = rows.filter(_._1 == SchemaEvolution.DdlOp)
      assert(ddl.length == 1 && ddl.head._3.startsWith("ALTER TABLE users"), rows)
      assert(ddl.head._4 > dml.last._4, "ddl must sort after prior dml")
    } finally {
      master.close() // relay's bounded retries then stop the daemon
      def rm(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        if (Files.exists(p))
          Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(f => Files.deleteIfExists(f))
      }
      rm(relayDir)
      rm(java.nio.file.Paths.get(ckpt))
    }
  }
}
