package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def builtin(df: org.apache.spark.sql.DataFrame, p: Double) =
    df.groupBy($"g").agg(expr(s"percentile(v, $p)").as("exp"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def banded(df: org.apache.spark.sql.DataFrame, p: Double,
      bands: Int = 16) =
    ExactQuantiles.percentiles(df, "g", Seq("v" -> Seq(p)), bands)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

  test("bit-identical to the built-in percentile() on randomized data") {
    // non-dyadic values (2-decimal money shapes) exercise the exact
    // interpolation formula, not just exact-rank picks
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c",
        math.floor(rng.nextDouble() * 10000) / 100.0)
    }
    val df = rows.toDF("g", "v").repartition(7)
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val exp = builtin(df, p)
      val got = banded(df, p)
      assert(got.keySet == exp.keySet)
      for (g <- exp.keys) {
        assert(java.lang.Double.doubleToLongBits(got(g)) ==
          java.lang.Double.doubleToLongBits(exp(g)),
          s"p=$p g=$g: got ${got(g)}, percentile() says ${exp(g)}")
      }
    }
  }

  test("constant group short-circuits; singleton group works") {
    val df = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0), ("s", 42.0))
      .toDF("g", "v")
    val got = banded(df, 0.75)
    assert(got == Map("c" -> 5.0, "s" -> 42.0))
  }

  test("nulls are excluded like the built-in") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val got = banded(df, 0.5)
    assert(got("a") == 2.0)
  }

  test("heavily tied values agree with the built-in") {
    val rows = (1 to 200).map(i => ("t", (i % 4).toDouble))
    val df = rows.toDF("g", "v").repartition(5)
    for (p <- Seq(0.1, 0.5, 0.9)) {
      assert(banded(df, p) == builtin(df, p), s"p=$p")
    }
  }

  test("multiple target columns and percentiles in one call") {
    val df = Seq(("a", 1.0, 10.0), ("a", 2.0, 20.0), ("a", 3.0, 30.0))
      .toDF("g", "q", "x")
    val rows = ExactQuantiles.percentiles(df, "g",
      Seq("q" -> Seq(0.5), "x" -> Seq(0.25, 0.75)))
      .collect().map(r => (r.getString(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    assert(rows(("q", 0.5)) == 2.0)
    assert(rows(("x", 0.25)) == 15.0)
    assert(rows(("x", 0.75)) == 25.0)
  }
}
