package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class OutboxAdapterSpec extends SparkSpec {
  import spark.implicits._

  private def envelope(rows: Seq[(String, Long, String, String, String)]) =
    rows.toDF("atype", "aid", "payload", "op", "pos")
      .select(
        lit("svc").as("db"), lit("outbox").as("table"), col("op"),
        lit(null).cast(TimestampType).as("ts"), col("pos"),
        monotonically_increasing_id().as("seq"),
        lit(0).as("tableVersion"),
        map(lit("aggregatetype"), col("atype"),
          lit("aggregateid"), col("aid").cast(StringType),
          lit("payload"), col("payload")).as("after"),
        lit(null).cast(MapType(StringType, StringType)).as("before"))

  test("routes outbox inserts to per-aggregate streams with the pk injected") {
    val out = OutboxAdapter.route(envelope(Seq(
      ("order", 7L, """{"total":"12.5","ccy":"EUR"}""", "insert", "g:1"),
      ("shipment", 8L, """{"carrier":"dhl"}""", "insert", "g:2"))))
      .orderBy("seq").collect()
    assert(out.map(_.getAs[String]("table")).toSeq == Seq("order", "shipment"))
    assert(out(0).getAs[Map[String, String]]("after") ==
      Map("id" -> "7", "total" -> "12.5", "ccy" -> "EUR"))
    assert(out(1).getAs[Map[String, String]]("after") ==
      Map("id" -> "8", "carrier" -> "dhl"))
    assert(out.forall(_.getAs[String]("op") == "insert"))
  }

  test("outbox updates/deletes are transport housekeeping, not events") {
    val out = OutboxAdapter.route(envelope(Seq(
      ("order", 1L, """{"x":"1"}""", "insert", "g:1"),
      ("order", 1L, """{"x":"1"}""", "delete", "g:2"),
      ("order", 1L, """{"x":"2"}""", "update", "g:3"))))
    assert(out.count() == 1)
  }

  test("the injected pk wins over a payload field named id") {
    val out = OutboxAdapter.route(envelope(Seq(
      ("order", 42L, """{"id":"evil","x":"1"}""", "insert", "g:1"))))
      .collect().head
    assert(out.getAs[Map[String, String]]("after") ==
      Map("id" -> "42", "x" -> "1"))
  }

  test("unparseable payload degrades to the pk-only after image") {
    val out = OutboxAdapter.route(envelope(Seq(
      ("order", 9L, "not json", "insert", "g:1"))))
      .collect().head
    assert(out.getAs[Map[String, String]]("after") == Map("id" -> "9"))
  }
}
