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

  test("q_percentiles_approx verdict: every in-engine sketch is within tolerance") {
    val rows = SparkEntry.queries("q_percentiles_approx")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"empty group ${r.getString(0)}")
      assert(r.getBoolean(2) && r.getBoolean(3),
        s"approx percentile for ${r.getString(0)} outside 5% of exact")
    }
  }

  test("q_distinct_approx verdict: every in-engine sketch is within tolerance") {
    val rows = SparkEntry.queries("q_distinct_approx")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"approx distinct for ${r.getString(0)} outside 6% of exact " +
          s"(parts exact=${r.getLong(1)}, supps exact=${r.getLong(2)})")
    }
  }
}
