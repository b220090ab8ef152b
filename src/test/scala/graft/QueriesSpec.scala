package graft

/** Every declared query must run and produce rows at sf0.001, and
  * every oracle key must reference a declared query. Exact value
  * parity with DuckDB is checked by the driver (and locally by
  * tools/compare.py); this suite guards runnability + wiring. */
class QueriesSpec extends SparkSpec {

  test("every oracle key has a query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle entries without queries: $dangling")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      // q_setop_except / q_anti_join can legitimately be empty when
      // every customer has orders; everything else must return rows.
      val n = df.count()
      if (name != "q_setop_except" && name != "q_anti_join")
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("q_percentiles_approx tracks the exact percentile (no oracle by design)") {
    import org.apache.spark.sql.functions.col
    val approx = SparkEntry.queries("q_percentiles_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = SparkEntry.queries("q_percentiles")(spark, sfDir)
      .select(col("l_returnflag"), col("p75_price")) // any exact column works for scale
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // medians vs p75 aren't comparable directly — recompute the exact
    // median for the tolerance check
    val exactMed = graft.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(org.apache.spark.sql.functions.expr(
        "percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exactMed.foreach { case (flag, m) =>
      val a = approx(flag)
      assert(math.abs(a - m) / m < 0.05,
        s"approx median for $flag drifted >5%: approx=$a exact=$m")
    }
    assert(exact.nonEmpty)
  }

  test("q_distinct_approx tracks exact countDistinct (no oracle by design)") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val approx = SparkEntry.queries("q_distinct_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      // rsd 2% requested; allow 3σ
      assert(math.abs(a - e).toDouble / e < 0.06,
        s"approx distinct for $flag drifted >6%: approx=$a exact=$e")
    }
  }
}
