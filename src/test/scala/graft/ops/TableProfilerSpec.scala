package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class TableProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profiles counts, nulls, distincts and min/max per column type") {
    val df = Seq(
      (1L, Some(2.0), Some("b"), Some(Timestamp.valueOf("2024-01-02 03:04:05"))),
      (2L, None, Some("a"), None),
      (3L, Some(2.0), None, Some(Timestamp.valueOf("2023-12-31 00:00:00"))),
      (4L, Some(-1.5), Some("a"), Some(Timestamp.valueOf("2024-01-02 03:04:05")))
    ).toDF("id", "v", "s", "t")
    val p = TableProfiler.profile(df, Seq("id", "v", "s", "t"))
      .collect().map(r => r.getString(0) -> r).toMap

    val id = p("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 4)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 4.0)
    assert(id.isNullAt(6) && id.isNullAt(7))

    val v = p("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getDouble(4) == -1.5 && v.getDouble(5) == 2.0)

    val s = p("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "b")

    val t = p("t")
    assert(t.getLong(2) == 1 && t.getLong(3) == 2)
    assert(t.getString(6) == "2023-12-31 00:00:00" &&
      t.getString(7) == "2024-01-02 03:04:05")
  }

  test("all statistics come from ONE scan of the source") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val out = TableProfiler.profile(df,
      Seq("l_orderkey", "l_quantity", "l_returnflag"))
    out.collect()
    // AQE's toString prints Final AND Initial plans — count scans in
    // the final section only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected a single parquet scan, got $scans:\n$plan")
  }
}
