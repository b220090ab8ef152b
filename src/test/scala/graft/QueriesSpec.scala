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

  test("r15 cdc_incremental_checksum: event_id is unique per user " +
    "(max_by gate) and the max_by state ≡ the window-desc state") {
    import org.apache.spark.sql.functions._
    val ev = Tables.normalizeTsNs(
      spark.read.parquet(s"$sfDir/events.parquet"))
      .select(col("user_id"), col("event_id"), col("value"))
    // the r15 swap of the desc window for max_by(value, event_id) is
    // sound ONLY under (user_id, event_id) uniqueness — event_id is
    // the table's PK; pin it so a future data regen that breaks it
    // fails here, not as a silent nondeterministic checksum
    val dupes = ev.groupBy(col("user_id"), col("event_id"))
      .count().filter(col("count") > 1).count()
    assert(dupes == 0, "event_id no longer unique per user — the " +
      "max_by compacted state in cdc_incremental_checksum is unsound")
    val viaWindow = ev
      .withColumn("rnd", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("event_id").desc)))
      .filter(col("rnd") === 1)
      .select(col("user_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val viaMaxBy = ev.groupBy(col("user_id"))
      .agg(max_by(col("value"), col("event_id")).as("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(viaWindow == viaMaxBy)
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
