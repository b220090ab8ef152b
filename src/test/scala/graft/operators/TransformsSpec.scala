package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("db1", "t1", 1L, "insert", 10.0),
    ("db1", "t1", 2L, "update", 20.0),
    ("db1", "t2", 3L, "delete", 30.0),
    ("db2", "t1", 4L, "insert", 40.0)
  ).toDF("db", "table", "seq", "op", "v")

  test("renameColumn renames present columns and skips absent ones") {
    val out = Transforms.renameColumn("v" -> "value", "nope" -> "x")(df)
    assert(out.columns.toSeq == Seq("db", "table", "seq", "op", "value"))
  }

  test("deleteColumn drops columns") {
    assert(Transforms.deleteColumn("v", "op")(df).columns.toSeq ==
      Seq("db", "table", "seq"))
  }

  test("dropWhere removes matching rows (reference drop-if-true hook)") {
    assert(Transforms.dropWhere($"op" === "delete")(df).count() == 3)
  }

  test("columnMapper positional mapping") {
    val out = Transforms.columnMapper(Seq("seq", "v"), Seq("id", "amount"))(df)
    assert(out.columns.toSeq == Seq("id", "amount"))
    assert(out.orderBy("id").as[(Long, Double)].collect().head == (1L, 10.0))
  }

  test("deleteSign is 1 only for deletes") {
    val out = df.withColumn("_delete_sign_", Transforms.deleteSign($"op"))
    val m = out.select($"seq", $"_delete_sign_").as[(Long, Int)].collect().toMap
    assert(m == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 0))
  }

  test("routeTables keeps only routed (db, table) pairs") {
    val out = Transforms.routeTables(Set("db1" -> "t1"))(df)
    assert(out.select("seq").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(Transforms.routeTables(Set.empty)(df).count() == 0)
  }

  test("changedColumns: native fused pass ≡ the HOF reference on randomized maps") {
    // maps with overlapping / one-sided / null-valued keys across 500
    // rows — add, remove, change, null-vs-absent, and equal cases all
    // occur; the native expression must match the four-operator HOF
    // pipeline row for row
    val base = spark.range(500)
    def mk(aNull: org.apache.spark.sql.Column,
        bMod: Long, extraKey: String, extraMod: Long) = map_concat(
      map(lit("a"), aNull),
      when(pmod(col("id"), lit(bMod)) === 0, map(lit("b"), pmod(col("id"), lit(7L))))
        .otherwise(map().cast("map<string,bigint>")),
      when(pmod(col("id"), lit(extraMod)) === 0, map(lit(extraKey), lit(1L)))
        .otherwise(map().cast("map<string,bigint>")))
    val before = mk(
      when(pmod(col("id"), lit(4L)) === 0, lit(null).cast("bigint"))
        .otherwise(pmod(col("id"), lit(5L))), 3L, "c", 5L)
    val after = mk(pmod(col("id"), lit(5L)), 2L, "d", 7L)
    val out = base.select(col("id"),
      Transforms.changedColumns(before, after).as("nat"),
      Transforms.changedColumnsHof(before, after).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"row ${r.getLong(0)}: native ${r.getSeq[String](1)} != " +
          s"hof ${r.getSeq[String](2)}")
    }
    // analytic spot checks: id=0 → before a=null,b=0,c=1; after a=0,
    // b=0,d=1 → changed = a (null→0), c (removed), d (added); b equal
    val r0 = out.find(_.getLong(0) == 0L).get
    assert(r0.getSeq[String](1) == Seq("a", "c", "d"))
    // id=10 → before a=0 (10%4!=0 → 10%5=0), c=1 (10%5=0); after
    // a=0, b=3 (10%2=0) → changed = b (added), c (removed); a equal
    val r10 = out.find(_.getLong(0) == 10L).get
    assert(r10.getSeq[String](1) == Seq("b", "c"))
  }

  test("enrich left-joins dim attributes, keeps unmatched, no key dup") {
    import spark.implicits._
    val stream = Seq((1L, 10L, "insert"), (2L, 99L, "update"))
      .toDF("event_id", "uid", "op")
    val dim = Seq((10L, "alice", "US"), (11L, "bob", "DE"))
      .toDF("cust_id", "name", "country")
    val out = graft.operators.Transforms.enrich(
      dim, keys = Seq("uid" -> "cust_id"), proj = Seq("name"))(stream)
    assert(out.columns.toSeq == Seq("event_id", "uid", "op", "name"),
      "dim key must not duplicate; only projected attrs added")
    val rows = out.orderBy("event_id").collect()
    assert(rows(0).getString(3) == "alice")
    assert(rows(1).isNullAt(3), "unmatched events must survive with nulls")
    // bounded dim is broadcast
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("enrich works on the STREAMING path (stream-static join)") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val dir = Files.createTempDirectory("enrich-stream").toString
    Files.write(Paths.get(dir, "a.jsonl"),
      Seq(
        """{"db":"d","table":"t","op":"insert","ts":1,"pos":"p","seq":0,"tableVersion":0,"after":{"id":"1","uid":"10"},"before":null}""",
        """{"db":"d","table":"t","op":"insert","ts":2,"pos":"p","seq":1,"tableVersion":0,"after":{"id":"2","uid":"99"},"before":null}""")
        .mkString("\n").getBytes("UTF-8"))
    val dim = Seq((10L, "alice")).toDF("cust_id", "name")
    val stream = spark.readStream.format("graft-changelog")
      .option("path", dir).load()
      .select(col("seq"), col("after")("uid").cast("long").as("uid"))
    val q = graft.operators.Transforms.enrich(
        dim, keys = Seq("uid" -> "cust_id"))(stream)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("enrich_out").orderBy("seq").collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("name") == "alice")
    assert(got(1).isNullAt(got(1).fieldIndex("name")))
  }

  test("chain applies transforms in order") {
    val out = Transforms.chain(
      Transforms.renameColumn("v" -> "value"),
      Transforms.deleteColumn("op"),
      Transforms.dropWhere($"value" < 15.0))(df)
    assert(out.columns.toSeq == Seq("db", "table", "seq", "value"))
    assert(out.count() == 3)
  }

  test("maskColumn: hash is deterministic, partial keeps the tail, " +
    "redact is constant, nulls stay null everywhere") {
    val d = Seq(
      (1L, "4111111111111111", "secret", "x"),
      (2L, "4111111111111111", "ab", null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String], "abcd", "y")
    ).toDF("id", "card", "s", "t")
    val out = Transforms.maskColumns(
      "card" -> "partial", "s" -> "hash", "t" -> "redact",
      "absent" -> "hash")(d)
      .orderBy($"id")
      .as[(Long, String, String, String)].collect().toSeq
    assert(out(0)._2 == "************1111")
    assert(out(1)._2 == out(0)._2)            // same input, same mask
    assert(out(2)._2 == null)                  // null stays null
    // hash: 64 lowercase hex chars, equal inputs collide on purpose
    assert(out(0)._3.matches("[0-9a-f]{64}"))
    assert(out(1)._3 != out(0)._3)
    // at-or-under keep chars masks FULLY (no short-secret echo)
    assert(out(2)._3.matches("[0-9a-f]{64}"))
    assert(out(0)._4 == "***" && out(1)._4 == null && out(2)._4 == "***")
  }

  test("maskColumn partial fully masks short values and newlines") {
    val d = Seq((1L, "abc"), (2L, "a\nb\ncdef")).toDF("id", "v")
    val out = Transforms.maskColumns("v" -> "partial")(d)
      .orderBy($"id").as[(Long, String)].collect().toSeq
    assert(out(0)._2 == "***")
    assert(out(1)._2 == "****cdef")
  }

  test("maskColumn rejects unknown modes loudly") {
    intercept[IllegalArgumentException] {
      Transforms.maskColumn(col("x"), "rot13")
    }
  }

}
