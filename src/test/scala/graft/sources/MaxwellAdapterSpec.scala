package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaxwellAdapterSpec extends SparkSpec {
  import spark.implicits._

  // realistic Maxwell payloads: seconds-resolution ts, xid/commit
  // noise fields, bootstrap snapshot rows, partial `old` images
  private val lines = Seq(
    // bootstrap snapshot row (≙ Debezium op=r)
    """{"database":"shop","table":"items","type":"bootstrap-insert",""" +
      """"ts":1000,"data":{"id":1,"qty":10,"name":"a"}}""",
    // plain insert, with binlog position
    """{"database":"shop","table":"items","type":"insert","ts":2000,""" +
      """"xid":940752,"commit":true,"position":"master.000006:800911",""" +
      """"data":{"id":2,"qty":20,"name":"b"}}""",
    // update: `old` carries ONLY the changed columns
    """{"database":"shop","table":"items","type":"update","ts":3000,""" +
      """"gtid":"uuid:3","data":{"id":1,"qty":11,"name":"a"},""" +
      """"old":{"qty":10}}""",
    // delete: data is the final row image
    """{"database":"shop","table":"items","type":"delete","ts":4000,""" +
      """"data":{"id":2,"qty":20,"name":"b"}}""")

  private def adapted = MaxwellAdapter.fromJson(
    lines.zipWithIndex.toDF("value", "offset"), "value", col("offset"))

  test("maps the Maxwell envelope onto ChangeEvent columns") {
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
    // Maxwell ts is SECONDS
    assert(rows(0).getAs[java.sql.Timestamp]("ts").getTime == 1000000L)
    // pos: gtid wins over file position; falls back to position
    assert(rows(1).getAs[String]("pos") == "master.000006:800911")
    assert(rows(2).getAs[String]("pos") == "uuid:3")
    // partial before-image carried as-is
    assert(rows(2).getAs[Map[String, String]]("before") == Map("qty" -> "10"))
    assert(rows(3).getAs[Map[String, String]]("before") == null)
  }

  test("corrupt payloads: fail default, skip drops, mark DLQs") {
    val mixed = lines ++ Seq(
      "not json at all",
      // DML with NO row image: unusable (null pks would compact under
      // one key and upsert garbage) — must be policed, not passed
      """{"database":"shop","table":"items","type":"insert","ts":6000}""")
    def adapt(mode: String) = MaxwellAdapter.fromJson(
      mixed.zipWithIndex.toDF("value", "offset"), "value", col("offset"),
      onCorrupt = mode)
    val e = intercept[Exception] { adapt("fail").collect() }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert((e.getMessage + rootMsg(e)).contains("maxwell"),
      e.getMessage + rootMsg(e))
    assert(adapt("skip").count() == 4)
    val marked = adapt("mark").orderBy("seq").collect()
    assert(marked.length == 6)
    val dlq = marked.filter(_.getAs[String]("op") == "__corrupt__")
    assert(dlq.length == 2)
    assert(dlq.exists(_.getAs[Map[String, String]]("before")("raw")
      .contains("not json")))
    assert(dlq.exists(_.getAs[Map[String, String]]("before")("raw")
      .contains("\"ts\":6000")))
  }

  test("bootstrap markers are control records: dropped in EVERY mode") {
    // Maxwell's bootstrap writes start/complete markers around the
    // bootstrap-insert rows on the same stream — a bootstrap must not
    // crash onCorrupt=fail, and the markers are not corruption
    val mixed = Seq(
      """{"database":"shop","table":"items","type":"bootstrap-start",""" +
        """"ts":5000,"data":{}}""") ++ lines ++ Seq(
      """{"database":"shop","table":"items","type":"bootstrap-complete",""" +
        """"ts":7000,"data":{}}""")
    for (mode <- Seq("fail", "skip", "mark")) {
      val out = MaxwellAdapter.fromJson(
        mixed.zipWithIndex.toDF("value", "offset"), "value", col("offset"),
        onCorrupt = mode).collect()
      assert(out.length == 4, mode)
      assert(!out.exists(_.getAs[String]("op") == "__corrupt__"), mode)
    }
  }

  test("adapted stream drives the engine's compaction unchanged") {
    val byKey = graft.operators.Compactor.lastEventPerKeyAgg(Seq("k"), "seq")(
      adapted.withColumn("k", col("after")("id")))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[String]("op")).toMap
    assert(byKey == Map("1" -> "update", "2" -> "delete"))
  }
}
