package graft.sinks

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.ChangeEvent
import graft.meta.{ColumnDef, TableDef}

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val t = TableDef("db1", "t1", Seq(
    ColumnDef("id", "bigint", isPrimaryKey = true),
    ColumnDef("k", "int"),
    ColumnDef("c", "varchar(120)")))

  private def envelope = Seq(
    ChangeEvent("db1", "t1", "insert", new Timestamp(1700000000000L),
      "gtid:1", 1L, 0, Map("id" -> "1", "k" -> "10", "c" -> "a"), null),
    ChangeEvent("db1", "t1", "delete", new Timestamp(1700000001000L),
      "gtid:2", 2L, 0, Map("id" -> "2", "k" -> "20", "c" -> "b"), null)
  ).toDF()

  test("streamLoadJson emits _delete_sign_ 0/1 rows") {
    val typed = Seq((1L, 10, "a", "insert"), (2L, 20, "b", "delete"))
      .toDF("id", "k", "c", "op")
    val rows = Formats.streamLoadJson(typed, t).as[String].collect()
    assert(rows(0) == """{"id":1,"k":10,"c":"a","_delete_sign_":0}""")
    assert(rows(1) == """{"id":2,"k":20,"c":"b","_delete_sign_":1}""")
  }

  test("stream-load headers: SR base, Doris adds MERGE") {
    val sr = Formats.streamLoadHeaders(t, doris = false)
    assert(sr("columns") == "id,k,c,_delete_sign_")
    assert(sr("strip_outer_array") == "true" && !sr.contains("merge_type"))
    val doris = Formats.streamLoadHeaders(t, doris = true)
    assert(doris("merge_type") == "MERGE" && doris("delete") == "_delete_sign_=1")
  }

  test("kafkaJson carries database/table/type/ts/data/old") {
    val v = Formats.kafkaJson(envelope).as[String].collect().head
    assert(v.contains(""""database":"db1""""))
    assert(v.contains(""""type":"insert""""))
    assert(v.contains(""""data":{"id":"1","k":"10","c":"a"}"""))
    assert(v.contains(""""ts":1700000000"""))
  }

  test("canalJson has sqlType/mysqlType/pkNames and stringified data") {
    val v = Formats.canalJson(envelope, t).as[String].collect().head
    assert(v.contains(""""pkNames":["id"]"""))
    assert(v.contains(""""sqlType":{"id":-5,"k":4,"c":12}"""))
    assert(v.contains(""""mysqlType":{"id":"bigint","k":"int","c":"varchar(120)"}"""))
    assert(v.contains(""""type":"INSERT""""))
    assert(v.contains(""""isDdl":false"""))
  }

  test("jdbcTypeCode maps the reference's type table") {
    assert(Formats.jdbcTypeCode("bigint") == -5)
    assert(Formats.jdbcTypeCode("varchar(64)") == 12)
    assert(Formats.jdbcTypeCode("datetime") == 93)
    assert(Formats.jdbcTypeCode("decimal(18,4)") == 3)
    assert(Formats.jdbcTypeCode("blob") == -3)
  }

  test("withKafkaKey: partition = hash % n, key = hash string") {
    val out = Formats.withKafkaKey(envelope, t, numPartitions = 8)
      .select($"key", $"partition").as[(String, Int)].collect()
    out.foreach { case (key, part) =>
      assert(part >= 0 && part < 8)
      assert(BigInt(key) % 8 == part)
    }
    // same pk hashes to same partition deterministically
    val again = Formats.withKafkaKey(envelope, t, 8)
      .select($"partition").as[Int].collect()
    assert(again.toSeq == out.map(_._2).toSeq)
  }
}
