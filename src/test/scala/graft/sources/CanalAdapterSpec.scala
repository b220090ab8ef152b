package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.meta.{ColumnDef, TableDef}
import graft.sinks.Formats

class CanalAdapterSpec extends SparkSpec {
  import spark.implicits._

  private val t = TableDef("shop", "items", Seq(
    ColumnDef("id", "bigint", isPrimaryKey = true),
    ColumnDef("v", "int")))

  test("round-trips the engine's own Canal formatter output") {
    val envelope = Seq(
      ("shop", "items", "insert", new java.sql.Timestamp(1700000001000L),
        "g:0", 0L, 0, Map("id" -> "1", "v" -> "10"),
        null.asInstanceOf[Map[String, String]]),
      ("shop", "items", "update", new java.sql.Timestamp(1700000002000L),
        "g:1", 1L, 0, Map("id" -> "1", "v" -> "11"),
        Map("id" -> "1", "v" -> "10")),
      ("shop", "items", "delete", new java.sql.Timestamp(1700000003000L),
        "g:2", 2L, 0, Map("id" -> "1", "v" -> "11"),
        null.asInstanceOf[Map[String, String]])
    ).toDF("db", "table", "op", "ts", "pos", "seq", "tableVersion",
      "after", "before")

    val wire = Formats.canalJson(envelope, t, emitTsMs = lit(123L))
    val back = CanalAdapter.fromJson(wire, "value").orderBy("seq").collect()

    assert(back.length == 3)
    assert(back.map(_.getAs[String]("op")).toSeq ==
      Seq("insert", "update", "delete"))
    assert(back.forall(r => r.getAs[String]("db") == "shop" &&
      r.getAs[String]("table") == "items"))
    // seq derives as id*batchCap + idx; single-row messages keep order
    assert(back.map(_.getAs[Long]("seq") / 4096).toSeq == Seq(0L, 1L, 2L))
    assert(back(1).getAs[Map[String, String]]("after") ==
      Map("id" -> "1", "v" -> "11"))
    assert(back(1).getAs[Map[String, String]]("before") ==
      Map("id" -> "1", "v" -> "10"))
    assert(back(0).getAs[Map[String, String]]("before") == null)
    assert(back(0).getAs[String]("pos") == "g:0")
    assert(back(0).getAs[java.sql.Timestamp]("ts").getTime == 1700000001000L)
  }

  test("corrupt canal payloads: fail default, skip drops, mark DLQs") {
    val wire = Seq(
      """{"id":1,"database":"shop","table":"items","gtid":["g:1"],""" +
        """"isDdl":false,"type":"INSERT","es":1700000001000,""" +
        """"data":[{"id":"1"}],"old":null}""",
      "garbled {{{ not canal").toDF("value")
    def run(mode: String) =
      CanalAdapter.fromJson(wire, "value", onCorrupt = mode)
    val e = intercept[Exception] { run("fail").collect() }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert((e.getMessage + rootMsg(e)).contains("canal"))
    assert(run("skip").count() == 1)
    val marked = run("mark").collect()
    assert(marked.length == 2)
    val dlq = marked.filter(_.getAs[String]("op") == "__corrupt__")
    assert(dlq.length == 1)
    assert(dlq(0).getAs[Map[String, String]]("after")("raw")
      .contains("garbled"))
  }

  test("over-cap canal batches fail loudly (seq ranges would collide)") {
    val rows = (0 until 5).map(i => s"""{"id":"$i"}""").mkString(",")
    val wire = Seq(
      s"""{"id":7,"database":"d","table":"t","gtid":["g"],"isDdl":false,""" +
        s""""type":"INSERT","es":1,"data":[$rows],"old":null}""").toDF("value")
    val e = intercept[Exception] {
      CanalAdapter.fromJson(wire, "value", batchCap = 4).collect()
    }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert((e.getMessage + rootMsg(e)).contains("batchCap"))
  }

  test("batched data arrays unbatch in order; DDL messages are excluded") {
    val wire = Seq(
      // one canal message carrying TWO rows
      """{"id":7,"database":"shop","table":"items","gtid":["g:7"],""" +
        """"isDdl":false,"type":"INSERT","es":1700000009000,""" +
        """"data":[{"id":"5","v":"50"},{"id":"6","v":"60"}],"old":null}""",
      """{"id":8,"database":"shop","table":"items","gtid":["g:8"],""" +
        """"isDdl":true,"type":"ALTER","es":1700000010000,""" +
        """"data":null,"old":null}""").toDF("value")
    val back = CanalAdapter.fromJson(wire, "value").orderBy("seq").collect()
    assert(back.length == 2, "DDL message must not enter the DML stream")
    assert(back.map(_.getAs[Map[String, String]]("after")("id")).toSeq ==
      Seq("5", "6"))
    assert(back.map(_.getAs[Long]("seq")).toSeq ==
      Seq(7L * 4096, 7L * 4096 + 1))
  }
}
