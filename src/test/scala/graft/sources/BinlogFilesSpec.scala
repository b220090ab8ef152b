package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.operators.Compactor
import graft.sources.Binlog.{Type => T}
import graft.sources.BinlogWriter._

import org.apache.spark.sql.functions._

/** End-to-end: binary binlog segments on disk → distributed decode
  * (one task per segment) → the SAME routed/compacted dataflow the
  * JSONL changelog feeds. Proves the wire decoder's output is
  * pipeline-compatible and that cross-segment seq bases keep global
  * binlog order for the order-free compactor. */
class BinlogFilesSpec extends SparkSpec {
  import spark.implicits._

  private val sid = Array.tabulate(16)(i => (i + 1).toByte)
  private val cols = Seq(Col(T.Long, 0), Col(T.Varchar, 20))
  private val names = Map(("shop", "users") -> Seq("id", "name"))

  private def ins(gno: Long, rowsIn: Seq[(Int, String)]): Seq[(Int, Array[Byte])] = Seq(
    Binlog.GtidEvent -> gtid(sid, gno),
    Binlog.TableMapEvent -> tableMap(5, "shop", "users", cols),
    Binlog.WriteRowsV2 -> rows(Binlog.WriteRowsV2, 5, 2, rowsIn.map { case (id, s) =>
      Seq(v(new Buf().u32(id.toLong)), v(new Buf().u8(s.getBytes.length).raw(s.getBytes)))
    }),
    Binlog.XidEvent -> xid(gno))

  private def upd(gno: Long, id: Int, from: String, to: String): Seq[(Int, Array[Byte])] = Seq(
    Binlog.GtidEvent -> gtid(sid, gno),
    Binlog.TableMapEvent -> tableMap(5, "shop", "users", cols),
    Binlog.UpdateRowsV2 -> rows(Binlog.UpdateRowsV2, 5, 2, Seq(
      Seq(v(new Buf().u32(id.toLong)), v(new Buf().u8(from.length).raw(from.getBytes))),
      Seq(v(new Buf().u32(id.toLong)), v(new Buf().u8(to.length).raw(to.getBytes))))),
    Binlog.XidEvent -> xid(gno))

  test("segments decode distributed, seqs stay monotone, compactor keeps last image") {
    val dir = Files.createTempDirectory("binlog-seg").toString
    // segment 1: insert id=1,2; segment 2 (later rotation): update id=1
    Files.write(Paths.get(dir, "binlog.000001"),
      file(ins(1, Seq(1 -> "ann", 2 -> "bob"))))
    // real segments open with PREVIOUS_GTIDS carrying all earlier
    // gnos — that's what keeps per-segment decode position-complete
    Files.write(Paths.get(dir, "binlog.000002"),
      file((Binlog.PreviousGtidsEvent -> previousGtids(Seq(sid -> Seq((1L, 2L))))) +:
        upd(2, 1, "ann", "anna")))

    val ds = BinlogFiles.changeEvents(spark, dir, names, glob = "binlog.*")
    val evs = ds.collect().sortBy(_.seq)
    assert(evs.map(_.op).toSeq == Seq("insert", "insert", "update"))
    // cross-segment monotonicity: segment 2's seqs sit above segment 1's
    assert(evs(2).seq > evs(1).seq && evs(2).seq >= (1L << 40))
    assert(evs(2).pos.endsWith(":1-2"))

    // the standard downstream: route + last-event-per-key compaction
    val routed = ds.toDF()
      .filter($"db" === "shop" && $"table" === "users")
      .select($"op", $"seq",
        $"after".getItem("id").cast("long").as("id"),
        $"after".getItem("name").as("name"))
    val compacted = Compactor.lastEventPerKey(Seq("id"), col("seq"))(routed)
      .orderBy("id")
      .select("id", "name", "op").as[(Long, String, String)].collect().toSeq
    assert(compacted == Seq((1L, "anna", "update"), (2L, "bob", "insert")))
  }

  test("registers as the 'binlog-files' plugin source (tables conf routes + names)") {
    val dir = Files.createTempDirectory("binlog-seg3").toString
    Files.write(Paths.get(dir, "binlog.000001"),
      file(ins(1, Seq(7 -> "kim"))))
    val df = graft.streaming.Registry.source("binlog-files", spark,
      Map("path" -> dir, "tables" -> "shop.users:id|name", "glob" -> "binlog.*"))
    val rows = df.selectExpr("op", "after['id']", "after['name']")
      .as[(String, String, String)].collect().toSeq
    assert(rows == Seq(("insert", "7", "kim")))
  }

  test("a segment for only-unrouted tables contributes nothing") {
    val dir = Files.createTempDirectory("binlog-seg2").toString
    Files.write(Paths.get(dir, "binlog.000001"),
      file(ins(1, Seq(1 -> "zed"))))
    val ds = BinlogFiles.changeEvents(spark, dir,
      Map(("other", "t") -> Seq("a", "b")), glob = "binlog.*")
    assert(ds.count() == 0)
  }
}
