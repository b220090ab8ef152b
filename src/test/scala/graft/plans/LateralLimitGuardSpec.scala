package graft.plans

import graft.SparkSpec

class LateralLimitGuardSpec extends SparkSpec {
  import spark.implicits._

  private def setup(): Unit = {
    Seq((0L, "n0"), (1L, "n1")).toDF("k", "name")
      .createOrReplaceTempView("llg_outer_long")
    Seq((0, "n0"), (1, "n1")).toDF("k", "name")
      .createOrReplaceTempView("llg_outer_int")
    Seq((0, "a", 10), (0, "b", 20), (0, "c", 30), (1, "d", 40), (1, "e", 50))
      .toDF("k", "v", "score").createOrReplaceTempView("llg_inner")
  }

  test("rejects LATERAL + LIMIT over a type-coerced correlation") {
    setup()
    // long outer key vs int inner key: Spark 4.1.2 silently returns
    // the global top-1 instead of top-1 per outer row (verified: 1
    // row instead of 2) — the guard must turn that into an error
    val e = intercept[Exception] {
      spark.sql(
        """SELECT o.name, i.v FROM llg_outer_long o,
          |LATERAL (SELECT v FROM llg_inner i WHERE i.k = o.k
          |         ORDER BY score DESC LIMIT 1) i""".stripMargin).collect()
    }
    assert(e.getMessage.contains("type-coerced"),
      s"expected the guard's message, got: ${e.getMessage}")
  }

  test("matching key types pass and decorrelate correctly") {
    setup()
    val rows = spark.sql(
      """SELECT o.name, i.v FROM llg_outer_int o,
        |LATERAL (SELECT v FROM llg_inner i WHERE i.k = o.k
        |         ORDER BY score DESC LIMIT 1) i""".stripMargin)
      .as[(String, String)].collect().toSet
    assert(rows == Set(("n0", "c"), ("n1", "e")))
  }

  test("type-coerced correlation WITHOUT a limit passes") {
    setup()
    val n = spark.sql(
      """SELECT o.name, i.v FROM llg_outer_long o,
        |LATERAL (SELECT v FROM llg_inner i WHERE i.k = o.k) i""".stripMargin)
      .count()
    assert(n == 5L)
  }
}
