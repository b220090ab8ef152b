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

  test("left columns and row count are preserved (left-outer semantics)") {
    val left = Seq((1L, 10L, 1.5), (1L, 20L, 2.5)).toDF("k", "ts", "x")
    val right = Seq((1L, 5L, 9.9)).toDF("k", "rts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
    assert(out.count() == 2)
    assert(out.columns.toSeq == Seq("k", "ts", "x", "v"))
    assert(out.select($"x").as[Double].collect().sorted.toSeq == Seq(1.5, 2.5))
  }
}
