package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.ChangeEvent
import graft.meta.{ColumnDef, TableDef}
import graft.operators.Transforms
import graft.sinks.ParquetUpsertSink

/** End-to-end changelog replay (SURVEY §5.2): MemoryStream envelope
  * → route → transform → compact → parquet upsert sink, asserted
  * against the naively-applied oracle state. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val target = TableDef("db1", "t1", Seq(
    ColumnDef("id", "bigint", isPrimaryKey = true),
    ColumnDef("k", "int"),
    ColumnDef("c", "varchar(120)")))

  private def ev(op: String, seq: Long, id: Long, k: Int, c: String,
      table: String = "t1"): ChangeEvent =
    ChangeEvent("db1", table, op, new Timestamp(1700000000000L + seq), s"gtid:$seq",
      seq, 0, Map("id" -> id.toString, "k" -> k.toString, "c" -> c), null)

  test("changelog replay: insert/update/delete/reinsert + routing + idempotent replay") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ChangeEvent]
    val sink = new ParquetUpsertSink(dir)
    val route = Pipeline.Route("db1", "t1", target,
      transforms = Seq(Transforms.dropWhere(col("op") === "replace")))

    // batch 1: FIXTURES A.5 — same-key insert→update→delete→insert,
    // a second key ending deleted, an unrouted table, a replace drop.
    // Data added BEFORE start: AvailableNow snapshots its target
    // offset at query start.
    mem.addData(
      ev("insert", 1, 1, 10, "a"),
      ev("update", 2, 1, 11, "a2"),
      ev("delete", 3, 1, 0, ""),
      ev("insert", 4, 1, 12, "a3"),
      ev("insert", 5, 2, 20, "b"),
      ev("delete", 6, 2, 0, ""),
      ev("insert", 7, 9, 99, "unrouted", table = "t_other"),
      ev("replace", 8, 3, 30, "dropped-by-transform"))
    val q = Pipeline.start(mem.toDF(), Seq(route), sink, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.processAllAvailable()
    q.stop()

    val state1 = spark.read.parquet(s"$dir/db1.t1")
      .select($"id", $"k", $"c").as[(Long, Int, String)].collect().sortBy(_._1)
    assert(state1.toSeq == Seq((1L, 12, "a3")))

    // batch 2 (restart from checkpoint): update key 1, re-insert key 2
    mem.addData(ev("update", 9, 1, 13, "a4"), ev("insert", 10, 2, 21, "b2"))
    val q2 = Pipeline.start(mem.toDF(), Seq(route), sink, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q2.processAllAvailable()
    q2.stop()

    val state2 = spark.read.parquet(s"$dir/db1.t1")
      .select($"id", $"k", $"c").as[(Long, Int, String)].collect().sortBy(_._1)
    assert(state2.toSeq == Seq((1L, 13, "a4"), (2L, 21, "b2")))
  }

  test("routed() projects the map envelope onto typed columns") {
    val df = Seq(ev("insert", 1, 7, 70, "x")).toDF()
    val out = Pipeline.routed(df, Pipeline.Route("db1", "t1", target))
    assert(out.schema("id").dataType.typeName == "long")
    assert(out.schema("k").dataType.typeName == "integer")
    val row = out.select($"id", $"k", $"c", $"op", $"seq")
      .as[(Long, Int, String, String, Long)].head()
    assert(row == (7L, 70, "x", "insert", 1L))
  }

  test("retry: linear backoff then success / exhaustion") {
    var n = 0
    val got = Pipeline.retry(tries = 3, backoffMs = 1) {
      n += 1; if (n < 3) sys.error("boom") else 42
    }
    assert(got == 42 && n == 3)
    var m = 0
    val ex = intercept[RuntimeException] {
      Pipeline.retry(tries = 2, backoffMs = 1) { m += 1; sys.error("always") }
    }
    assert(ex.getMessage == "always" && m == 2)
  }
}
