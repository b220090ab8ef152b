package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.Binlog.{Type => T}
import graft.sources.BinlogWriter._

/** The graft-binlog streaming source: byte-packed (segment, pos)
  * offsets over binary segments — checkpoint resume, growing active
  * segment, rotation pickup, byte-budget admission control. */
class BinlogStreamSpec extends SparkSpec {

  private val sid = Array.tabulate(16)(i => (i + 1).toByte)
  private val cols = Seq(Col(T.Long, 0), Col(T.Varchar, 20))
  private val tablesOpt = "shop.users:id|name"

  private def txn(gno: Long, ids: Seq[(Int, String)]): Seq[(Int, Array[Byte])] = Seq(
    Binlog.GtidEvent -> gtid(sid, gno),
    Binlog.TableMapEvent -> tableMap(5, "shop", "users", cols),
    Binlog.WriteRowsV2 -> rows(Binlog.WriteRowsV2, 5, 2, ids.map { case (id, s) =>
      Seq(v(new Buf().u32(id.toLong)), v(new Buf().u8(s.getBytes.length).raw(s.getBytes)))
    }),
    Binlog.XidEvent -> xid(gno))

  private def drain(dir: String, ckpt: String,
      extra: Map[String, String] = Map.empty): Seq[(Long, String, String)] = {
    val seen = collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val r0 = spark.readStream.format("graft-binlog")
      .option("path", dir).option("tables", tablesOpt)
    val q = extra.foldLeft(r0) { case (acc, (k, v)) => acc.option(k, v) }.load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.selectExpr("seq", "op", "after['name']")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        seen.synchronized { seen ++= rows }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    seen.sortBy(_._1).toSeq
  }

  test("drain, checkpoint-resume on append (growing segment) and rotation") {
    val dir = Files.createTempDirectory("blstream").toString
    val ckpt = Files.createTempDirectory("blstream-ckpt").toString
    val events1 = txn(1, Seq(1 -> "ann", 2 -> "bob"))
    Files.write(Paths.get(dir, "binlog.000001"), file(events1))

    val first = drain(dir, ckpt)
    assert(first.map(_._3) == Seq("ann", "bob"))
    // seq = packed (segment 0, event byte start + row idx): monotone
    assert(first.map(_._1) == first.map(_._1).sorted && first.map(_._1).distinct.size == 2)

    // the ACTIVE segment grows in place: same prefix + a new txn.
    // (BinlogWriter.file is deterministic, so rewriting with the
    // extended event list appends whole frames — the server's own
    // append behavior.)
    Files.write(Paths.get(dir, "binlog.000001"),
      file(events1 ++ txn(2, Seq(1 -> "anna"))))
    val second = drain(dir, ckpt)
    assert(second.map(_._3) == Seq("anna"), s"resume must serve only new bytes: $second")
    assert(second.head._1 > first.last._1, "seqs stay monotone across triggers")

    // rotation: a NEW segment; only its events served
    Files.write(Paths.get(dir, "binlog.000002"),
      file((Binlog.PreviousGtidsEvent -> previousGtids(Seq(sid -> Seq((1L, 3L))))) +:
        txn(3, Seq(3 -> "cal"))))
    val third = drain(dir, ckpt)
    assert(third.map(_._3) == Seq("cal"))
    assert(BinlogStreamSource.segOf(third.head._1) == 2,
      "seq carries the segment's own numeric suffix")
  }

  test("purging consumed segments does not remap the checkpoint (suffix-keyed offsets)") {
    val dir = Files.createTempDirectory("blstream8").toString
    val ckpt = Files.createTempDirectory("bl8-ckpt").toString
    Files.write(Paths.get(dir, "binlog.000001"), file(txn(1, Seq(1 -> "ann"))))
    Files.write(Paths.get(dir, "binlog.000002"),
      file((Binlog.PreviousGtidsEvent -> previousGtids(Seq(sid -> Seq((1L, 2L))))) +:
        txn(2, Seq(2 -> "bob"))))
    assert(drain(dir, ckpt).map(_._3) == Seq("ann", "bob"))
    // retention purges segment 1; a new segment rotates in — offsets
    // must keep pointing at segment NUMBERS, not listing positions
    Files.delete(Paths.get(dir, "binlog.000001"))
    Files.write(Paths.get(dir, "binlog.000003"),
      file((Binlog.PreviousGtidsEvent -> previousGtids(Seq(sid -> Seq((1L, 3L))))) +:
        txn(3, Seq(3 -> "cal"))))
    val after = drain(dir, ckpt)
    assert(after.map(_._3) == Seq("cal"), s"purge must not replay or skip: $after")
  }

  test("numeric suffix ordering survives the 6-digit rollover") {
    val dir = Files.createTempDirectory("blstream9").toString
    val ckpt = Files.createTempDirectory("bl9-ckpt").toString
    // lexicographically '1000000' < '999999' — numeric order must win
    Files.write(Paths.get(dir, "binlog.999999"), file(txn(1, Seq(1 -> "ann"))))
    Files.write(Paths.get(dir, "binlog.1000000"),
      file((Binlog.PreviousGtidsEvent -> previousGtids(Seq(sid -> Seq((1L, 2L))))) +:
        txn(2, Seq(2 -> "bob"))))
    val seen = drain(dir, ckpt)
    assert(seen.map(_._3) == Seq("ann", "bob"))
    assert(BinlogStreamSource.segOf(seen.head._1) == 999999)
    assert(BinlogStreamSource.segOf(seen.last._1) == 1000000)
  }

  test("maxBytesPerTrigger splits the drain into multiple micro-batches") {
    val dir = Files.createTempDirectory("blstream2").toString
    val ckpt = Files.createTempDirectory("blstream2-ckpt").toString
    Files.write(Paths.get(dir, "binlog.000001"),
      file(txn(1, Seq(1 -> "ann")) ++ txn(2, Seq(2 -> "bob")) ++ txn(3, Seq(3 -> "cal"))))

    var batches = 0
    val q = spark.readStream.format("graft-binlog")
      .option("path", dir).option("tables", tablesOpt)
      .option("maxBytesPerTrigger", "150")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (b.count() > 0) batches += 1
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(batches >= 2, s"a 150-byte budget must split the drain; got $batches batches")
  }

  test("registry 'binlog' source builds the stream; missing tables option fails loudly") {
    val dir = Files.createTempDirectory("blstream3").toString
    val df = graft.streaming.Registry.source("binlog", spark,
      Map("path" -> dir, "tables" -> tablesOpt))
    assert(df.isStreaming)
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-binlog").option("path", dir).load()
    }
    assert(e.getMessage.contains("tables"))
  }

  test("position bootstrap: startOffset latest / explicit coordinate / checkpoint wins") {
    val dir = Files.createTempDirectory("blstream5").toString
    val seg1 = file(txn(1, Seq(1 -> "ann")))
    Files.write(Paths.get(dir, "binlog.000001"), seg1)

    // latest: nothing historical; only post-start appends
    val ckptLatest = Files.createTempDirectory("bl5-ckpt").toString
    assert(drain(dir, ckptLatest, Map("startOffset" -> "latest")).isEmpty)
    Files.write(Paths.get(dir, "binlog.000001"),
      file(txn(1, Seq(1 -> "ann")) ++ txn(2, Seq(2 -> "bob"))))
    assert(drain(dir, ckptLatest, Map("startOffset" -> "latest")).map(_._3) == Seq("bob"))

    // explicit (segment-number, byte) coordinate: serve only past it
    val ckptMid = Files.createTempDirectory("bl5-ckpt2").toString
    assert(drain(dir, ckptMid,
      Map("startOffset" -> s"1:${seg1.length}")).map(_._3) == Seq("bob"))

    // checkpoint beats a backwards startOffset override on restart
    assert(drain(dir, ckptMid, Map("startOffset" -> "1:0")).isEmpty)
  }

  test("binlog DDL events drive SchemaRegistry evolution mid-stream") {
    import graft.meta.SchemaRegistry
    import graft.streaming.SchemaEvolution
    val dir = Files.createTempDirectory("blstream6").toString
    val ckpt = Files.createTempDirectory("bl6-ckpt").toString
    // txn, then an ALTER arriving over the binlog QUERY path
    Files.write(Paths.get(dir, "binlog.000001"),
      file(txn(1, Seq(1 -> "ann")) ++ Seq(
        Binlog.QueryEvent -> query("shop",
          "ALTER TABLE users ADD COLUMN age INT"))))

    val registry = new SchemaRegistry
    registry.applySql(
      "CREATE TABLE shop.users (id bigint primary key, name varchar(20))", "shop")
    val v0 = registry.current("shop", "users").get.version

    var applied = 0
    val q = spark.readStream.format("graft-binlog")
      .option("path", dir).option("tables", tablesOpt).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        applied += SchemaEvolution.applyDdl(b, registry)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    assert(applied == 1)
    val cur = registry.current("shop", "users").get
    assert(cur.version > v0 && cur.columnNames.contains("age"),
      s"binlog DDL must evolve the registry: $cur")
  }

  test("'*' routing takes names from FULL-metadata segments through the stream") {
    val dir = Files.createTempDirectory("blstream7").toString
    val ckpt = Files.createTempDirectory("bl7-ckpt").toString
    val tmFull = tableMap(5, "shop", "users", cols, names = Seq("id", "name"))
    Files.write(Paths.get(dir, "binlog.000001"), file(Seq(
      Binlog.GtidEvent -> gtid(sid, 1),
      Binlog.TableMapEvent -> tmFull,
      Binlog.WriteRowsV2 -> rows(Binlog.WriteRowsV2, 5, 2, Seq(Seq(
        v(new Buf().u32(9)), v(new Buf().u8(3).raw("zoe".getBytes))))),
      Binlog.XidEvent -> xid(1))))
    val seen = collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = spark.readStream.format("graft-binlog")
      .option("path", dir).option("tables", "shop.users:*").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= b.selectExpr("after['id']", "after['name']")
            .collect().map(r => (r.getString(0), r.getString(1)))
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(seen.toSeq == Seq(("9", "zoe")))
  }

  test("torn tail frames are excluded until complete") {
    val dir = Files.createTempDirectory("blstream4").toString
    val ckpt = Files.createTempDirectory("blstream4-ckpt").toString
    val whole = file(txn(1, Seq(1 -> "ann")))
    val torn = whole ++ whole.takeRight(30).take(15) // garbage half-frame tail
    Files.write(Paths.get(dir, "binlog.000001"), torn)
    // decode must not throw and must serve exactly the complete events
    val seen = drain(dir, ckpt)
    assert(seen.map(_._3) == Seq("ann"))
  }
}
