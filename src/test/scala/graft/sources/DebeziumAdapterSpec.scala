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
