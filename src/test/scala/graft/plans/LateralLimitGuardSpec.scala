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
    assert(e.getMessage.contains("Cast on one side"),
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

  test("rejects EXPLICIT user casts too — both sides produce the same " +
      "wrong plan on 4.1.2, so exempting them would admit wrong data") {
    setup()
    // outer-side explicit cast: without the guard this returns 1 row
    // (global top-1) instead of 2 — verified before the guard existed
    val e1 = intercept[Exception] {
      spark.sql(
        """SELECT o.name, i.v FROM llg_outer_long o,
          |LATERAL (SELECT v FROM llg_inner i
          |         WHERE i.k = CAST(o.k AS INT)
          |         ORDER BY score DESC LIMIT 1) i""".stripMargin).collect()
    }
    assert(e1.getMessage.contains("Cast on one side"),
      s"expected the guard's message, got: ${e1.getMessage}")
    // inner-side explicit cast: also returns the global top-1 when
    // unguarded (probed on 4.1.2: Set((n1,e)))
    val e2 = intercept[Exception] {
      spark.sql(
        """SELECT o.name, i.v FROM llg_outer_long o,
          |LATERAL (SELECT v FROM llg_inner i
          |         WHERE CAST(i.k AS BIGINT) = o.k
          |         ORDER BY score DESC LIMIT 1) i""".stripMargin).collect()
    }
    assert(e2.getMessage.contains("Cast on one side"),
      s"expected the guard's message, got: ${e2.getMessage}")
  }

  test("the prescribed remediation — derived-table pre-cast — passes " +
      "the guard and decorrelates correctly") {
    setup()
    val rows = spark.sql(
      """SELECT o.name, i.v
        |FROM (SELECT CAST(k AS INT) AS k, name FROM llg_outer_long) o,
        |LATERAL (SELECT v FROM llg_inner i WHERE i.k = o.k
        |         ORDER BY score DESC LIMIT 1) i""".stripMargin)
      .as[(String, String)].collect().toSet
    assert(rows == Set(("n0", "c"), ("n1", "e")),
      s"derived-outer LATERAL decorrelated wrong: $rows")
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
