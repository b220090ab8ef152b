package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class Sum128Spec extends SparkSpec {
  import spark.implicits._

  private def sumOf(xs: Seq[Option[Long]], groups: Int = 1): Map[Int, Option[BigInt]] =
    xs.zipWithIndex.map { case (x, i) => (i % groups, x) }
      .toDF("g", "x")
      .groupBy($"g").agg(call_function("sum128", $"x").as("s"))
      .collect()
      .map(r => r.getInt(0) -> Option(r.getDecimal(1)).map(d => BigInt(d.toBigInteger)))
      .toMap

  test("sums past long overflow exactly") {
    // 200 × (2^62) = 2^69.64… — far past Long.MaxValue
    val big = Seq.fill(200)(Option(Long.MaxValue / 2 + 1))
    assert(sumOf(big)(0).get ==
      BigInt(Long.MaxValue / 2 + 1) * 200)
    val negBig = Seq.fill(200)(Option(Long.MinValue / 2))
    assert(sumOf(negBig)(0).get == BigInt(Long.MinValue / 2) * 200)
  }

  test("random longs match the BigInteger model; NULLs skipped; all-NULL group is NULL") {
    val gen = Gen.listOfN(300, Gen.option(Gen.choose(Long.MinValue / 4, Long.MaxValue / 4)))
    (0 until 8).foreach { i =>
      val xs = gen(Gen.Parameters.default, Seed(99L + i)).get
      val expected = xs.flatten.foldLeft(BigInteger.ZERO)((a, b) => a.add(BigInteger.valueOf(b)))
      val got = sumOf(xs)(0)
      if (xs.flatten.isEmpty) assert(got.isEmpty)
      else assert(got.get == BigInt(expected))
    }
    assert(sumOf(Seq(None, None))(0).isEmpty)
  }

  test("grouped sums partition correctly across many groups") {
    val xs = (1L to 1000L).map(Option(_))
    val out = sumOf(xs, groups = 7)
    val model = (1L to 1000L).groupBy(v => ((v - 1) % 7).toInt)
      .map { case (g, vs) => g -> BigInt(vs.sum) }
    assert(out.map { case (g, v) => g -> v.get } == model)
  }

  test("plan: map-side partial aggregation and whole-stage codegen cover the update") {
    val df = (1L to 100L).map(Option(_)).zipWithIndex.map { case (x, i) => (i % 3, x) }
      .toDF("g", "x")
      .groupBy($"g").agg(call_function("sum128", $"x"))
    df.collect() // materialize so AQE's final plan (with codegen spans) is visible
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum128"), plan)
    // '*(n)' prefixes mark WholeStageCodegen stages; both the partial
    // and final HashAggregate must sit inside one
    assert(plan.contains("*(1) HashAggregate") || plan.contains("*(2) HashAggregate"),
      plan)
  }

  test("sum128 resolves under DISTINCT and FILTER clauses (raw-builder registration)") {
    val out = Seq(1L, 1L, 2L, 3L, 3L).toDF("x")
      .selectExpr(
        "CAST(sum128(DISTINCT x) AS DOUBLE) AS d",
        "CAST(sum128(x) FILTER (WHERE x > 1) AS DOUBLE) AS f")
      .as[(Double, Double)].collect().head
    assert(out == ((6.0, 8.0)))
  }

  test("GraftExtensions.ensure registers functions on a session lacking them") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val registry = spark.sessionState.functionRegistry
    // simulate a host session built WITHOUT spark.sql.extensions
    registry.dropFunction(FunctionIdentifier("sum128"))
    registry.dropFunction(FunctionIdentifier("dot_product"))
    assert(!registry.functionExists(FunctionIdentifier("sum128")))
    // every SparkEntry query self-heals the registry via ensure()
    val df = graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
    assert(df.count() > 0)
    assert(registry.functionExists(FunctionIdentifier("sum128")))
    assert(registry.functionExists(FunctionIdentifier("dot_product")))
  }

  test("fixed-point money pattern: cents → sum128 → exact decimal division") {
    // 0.01 + 0.02 + … + 1.00 = 50.50 exactly
    val df = (1 to 100).map(c => c / 100.0).toDF("x")
      .selectExpr("CAST(floor(x * 100.0 + 0.5) AS BIGINT) AS cents")
      .selectExpr("CAST(sum128(cents) / 100 AS DOUBLE) AS total")
    assert(df.as[Double].collect().head == 50.50)
  }
}
