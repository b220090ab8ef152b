package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DebeziumAdapterSpec extends SparkSpec {
  import spark.implicits._

  // realistic Debezium payloads: typed scalar values, snapshot reads,
  // null before/after images
  private val lines = Seq(
    // snapshot read (op=r) — typed int values stringify
    """{"before":null,"after":{"id":1,"qty":10,"name":"a"},""" +
      """"source":{"db":"shop","table":"items","gtid":"uuid:1","ts_ms":1000},""" +
      """"op":"r","ts_ms":1001}""",
    // insert
    """{"before":null,"after":{"id":2,"qty":20,"name":"b"},""" +
      """"source":{"db":"shop","table":"items","gtid":"uuid:2","ts_ms":2000},""" +
      """"op":"c","ts_ms":2001}""",
    // update with both images
    """{"before":{"id":1,"qty":10,"name":"a"},""" +
      """"after":{"id":1,"qty":11,"name":"a2"},""" +
      """"source":{"db":"shop","table":"items","gtid":"uuid:3","ts_ms":3000},""" +
      """"op":"u","ts_ms":3001}""",
    // delete: after is null
    """{"before":{"id":2,"qty":20,"name":"b"},"after":null,""" +
      """"source":{"db":"shop","table":"items","gtid":"uuid:4","ts_ms":4000},""" +
      """"op":"d","ts_ms":4001}""")

  private def adapted = DebeziumAdapter.fromJson(
    lines.zipWithIndex.toDF("value", "offset"), "value", col("offset"))

  test("maps the Debezium envelope onto ChangeEvent columns") {
    val rows = adapted.orderBy("seq").collect()
    assert(adapted.columns.toSeq ==
      graft.cdc.ChangeEvent.schema.fields.map(_.name).toSeq)
    assert(rows.map(_.getAs[String]("op")).toSeq ==
      Seq("insert", "insert", "update", "delete"))
    assert(rows.forall(r => r.getAs[String]("db") == "shop" &&
      r.getAs[String]("table") == "items"))
    // typed JSON scalars stringify into the pre-routing map contract
    assert(rows(0).getAs[Map[String, String]]("after") ==
      Map("id" -> "1", "qty" -> "10", "name" -> "a"))
    // update carries both images; delete has null after
    assert(rows(2).getAs[Map[String, String]]("before")("qty") == "10")
    assert(rows(3).getAs[Map[String, String]]("after") == null)
    assert(rows(0).getAs[String]("pos") == "uuid:1")
    assert(rows(0).getAs[java.sql.Timestamp]("ts").getTime == 1001L)
  }

  test("corrupt/unsupported payloads: fail default, skip drops, mark DLQs") {
    val mixed = lines ++ Seq(
      "not json at all",
      // valid JSON, unsupported op (truncate) — must NOT become an upsert
      """{"before":null,"after":null,""" +
        """"source":{"db":"shop","table":"items","gtid":"uuid:5","ts_ms":5000},""" +
        """"op":"t","ts_ms":5001}""")
    def adapt(mode: String) = DebeziumAdapter.fromJson(
      mixed.zipWithIndex.toDF("value", "offset"), "value", col("offset"),
      onCorrupt = mode)
    // fail (default): evaluation raises with context
    val e = intercept[Exception] { adapt("fail").collect() }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert((e.getMessage + rootMsg(e)).contains("debezium"),
      e.getMessage + rootMsg(e))
    // skip: only the 4 good DML events survive
    assert(adapt("skip").count() == 4)
    // mark: bad records become __corrupt__ DLQ events with the raw
    // payload; good events untouched
    val marked = adapt("mark").orderBy("seq").collect()
    assert(marked.length == 6)
    val dlq = marked.filter(_.getAs[String]("op") == "__corrupt__")
    assert(dlq.length == 2)
    assert(dlq.exists(_.getAs[Map[String, String]]("before")("raw")
      .contains("not json")))
    assert(dlq.exists(_.getAs[Map[String, String]]("before")("raw")
      .contains("\"op\":\"t\"")))
  }

  test("adapted stream drives the engine's compaction unchanged") {
    val compacted = graft.operators.Compactor
      .lastEventPerKeyAgg(Seq("k"), "seq")(
        adapted.withColumn("k", col("after")("id")))
    // id 1: update (qty 11) wins; id 2: delete wins... but delete has
    // null after -> key null; key on coalesce(after.id, before.id)
    val byKey = graft.operators.Compactor.lastEventPerKeyAgg(Seq("k"), "seq")(
      adapted.withColumn("k",
        coalesce(col("after")("id"), col("before")("id"))))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[String]("op")).toMap
    assert(byKey == Map("1" -> "update", "2" -> "delete"))
    assert(compacted.columns.contains("op"))
  }
}
