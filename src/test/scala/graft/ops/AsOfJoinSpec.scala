package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf picks latest right row at-or-before each left ts") {
    val left = Seq(
      (1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 35L, "e3"),
      (2L, 15L, "e4"), (3L, 5L, "e5")
    ).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 10L, "v@10"), (1L, 30L, "v@30"), (2L, 20L, "v@20")
    ).toDF("k", "rts", "v")

    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select($"name", $"v").as[(String, Option[String])]
      .collect().toMap
    assert(out == Map(
      "e1" -> Some("v@10"),   // tie: right row AT leftTs is visible
      "e2" -> Some("v@10"),
      "e3" -> Some("v@30"),
      "e4" -> None,           // right row is later than the left ts
      "e5" -> None))          // no right rows for key 3
  }

  test("whole latest right row wins atomically — a later NULL is not " +
    "papered over by an older value") {
    val left = Seq((1L, 10L, "e")).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 1L, Option(5), Option(10)),
      (1L, 2L, Option.empty[Int], Option(20)) // a cleared, b updated
    ).toDF("k", "rts", "a", "b")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("a", "b"))
      .select($"a", $"b").as[(Option[Int], Option[Int])].collect().head
    // per-column carry would resurrect a=5 from the older row
    assert(out == (None, Some(20)))
  }

  test("broadcastAsOf matches asOf and never shuffles the fact side") {
    val left = Seq(
      (1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 35L, "e3"),
      (2L, 15L, "e4"), (3L, 5L, "e5")
    ).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 10L, "v@10"), (1L, 30L, "v@30"), (2L, 20L, "v@20")
    ).toDF("k", "rts", "v")
    val bc = AsOfJoin.broadcastAsOf(left, right, Seq("k"), "ts", "rts",
      Seq("v"))
    val got = bc.select($"name", $"v").as[(String, Option[String])]
      .collect().toMap
    val viaSort = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select($"name", $"v").as[(String, Option[String])].collect().toMap
    assert(got == viaSort)
    val plan = bc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // exactly ONE hash exchange — the dim history's own
    // pack-and-broadcast aggregation; the fact side feeds the join
    // directly from its scan
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("broadcastAsOf groups null keys like asOf (null-safe join)") {
    val left = Seq((Option.empty[Long], 10L, "e1"), (Some(1L), 10L, "e2"))
      .toDF("k", "ts", "name")
    val right = Seq((Option.empty[Long], 5L, "vN"), (Some(1L), 5L, "v1"))
      .toDF("k", "rts", "v")
    def m(df: org.apache.spark.sql.DataFrame): Map[String, Option[String]] =
      df.select($"name", $"v").as[(String, Option[String])].collect().toMap
    val expected = Map("e1" -> Some("vN"), "e2" -> Some("v1"))
    assert(m(AsOfJoin.broadcastAsOf(left, right, Seq("k"), "ts", "rts",
      Seq("v"))) == expected)
    assert(m(AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
      Seq("v"))) == expected)
  }

  test("broadcastAsOf ties at equal (key, ts) go to the greatest payload") {
    val left = Seq((1L, 10L, "e")).toDF("k", "ts", "name")
    val right = Seq((1L, 10L, "a"), (1L, 10L, "b")).toDF("k", "rts", "v")
    val got = AsOfJoin.broadcastAsOf(left, right, Seq("k"), "ts", "rts",
      Seq("v")).select($"v").as[String].collect().toSeq
    assert(got == Seq("b"))
  }

  test("broadcastAsOf enriches a STREAM (stream-static, no state store)") {
    implicit val ctx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String)]
    val right = Seq((1L, 10L, "v@10"), (1L, 30L, "v@30"))
      .toDF("k", "rts", "v")
    val enriched = AsOfJoin.broadcastAsOf(
      mem.toDF().toDF("k", "ts", "name"), right, Seq("k"), "ts", "rts",
      Seq("v"))
    val q = enriched.writeStream.format("memory")
      .queryName("asof_stream_out").outputMode("append").start()
    mem.addData((1L, 20L, "e1"), (1L, 35L, "e2"), (2L, 5L, "e3"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("asof_stream_out")
      .select($"name", $"v").as[(String, Option[String])].collect().toMap
    assert(got == Map("e1" -> Some("v@10"), "e2" -> Some("v@30"),
      "e3" -> None))
  }

  test("payload name colliding with a left column is rejected") {
    val left = Seq((1L, 10L, "x")).toDF("k", "ts", "v")
    val right = Seq((1L, 5L, "y")).toDF("k", "rts", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
    }
  }

  test("left columns and row count are preserved (left-outer semantics)") {
    val left = Seq((1L, 10L, 1.5), (1L, 20L, 2.5)).toDF("k", "ts", "x")
    val right = Seq((1L, 5L, 9.9)).toDF("k", "rts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
    assert(out.count() == 2)
    assert(out.columns.toSeq == Seq("k", "ts", "x", "v"))
    assert(out.select($"x").as[Double].collect().sorted.toSeq == Seq(1.5, 2.5))
  }
}
