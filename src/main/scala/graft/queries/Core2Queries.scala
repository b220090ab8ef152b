package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Second relational batch: outer joins, cube, subqueries, string /
  * date scalar functions, conditional expressions, additional window
  * functions — coverage for operator families the reference lacks
  * entirely but any replacement engine must provide (SURVEY §2
  * "Absent" rows). */
object Core2Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // left outer join + null-skipping COUNT(col)
    "q_left_join_counts" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    // full outer join of two pre-aggregates, null-coalesced
    "q_full_outer_nation" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
      val supp = Tables.load(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
      cust.withColumnRenamed("nk", "cnk")
        .join(supp.withColumnRenamed("nk", "snk"),
          col("cnk") === col("snk"), "full_outer")
        .select(coalesce(col("cnk"), col("snk")).as("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nk"))
    }),

    // CUBE grouping sets with null markers coalesced
    "q_cube_status_prio" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"), col("n"))
        .orderBy(col("st"), col("prio"))),

    // scalar string functions (all codegen'd builtins)
    "q_string_funcs" -> ((s, dir) =>
      Tables.load(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_type"), " ", "_").as("type_us"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))),

    // scalar date functions over TIMESTAMP_NTZ
    "q_date_funcs" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          // both engines emit DATE for the truncated month (Spark's
          // date_trunc returns LTZ timestamp, DuckDB returns DATE)
          date_trunc("month", col("o_orderdate")).cast("date").as("mon"))
        .orderBy(col("o_orderkey"))),

    // CASE bands + aggregate
    "q_case_bands" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(when(col("o_totalprice") < 50000.0, "low")
          .when(col("o_totalprice") < 150000.0, "mid")
          .otherwise("high").as("band"))
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
        .orderBy(col("band"))),

    // IN-subquery (Catalyst plans a left-semi join)
    "q_in_subquery" -> ((s, dir) => {
      val machinery = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
      Tables.load(s, dir, "orders")
        .join(machinery, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    }),

    // cross join (explicit cartesian, small dims)
    "q_cross_join" -> ((s, dir) => {
      val r1 = Tables.load(s, dir, "region").select(col("r_name").as("a"))
      val r2 = Tables.load(s, dir, "region").select(col("r_name").as("b"))
      r1.crossJoin(r2).orderBy(col("a"), col("b"))
    }),

    // UNION ALL with a source discriminator
    "q_union_all" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(lit("cust").as("src"), col("c_custkey").as("key"))
      val sup = Tables.load(s, dir, "supplier")
        .select(lit("supp").as("src"), col("s_suppkey").as("key"))
      c.unionByName(sup).orderBy(col("src"), col("key"))
    }),

    // rank vs dense_rank with real ties (priority strings)
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderpriority"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .orderBy(col("o_orderkey"))
    }),

    // first/last value over an unbounded frame
    "q_window_firstlast" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(w).as("last_ok"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // SQL frontend: the same engine drives spark.sql over registered
    // views (q3 restated in SQL text)
    "q_sql_frontend" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'HOUSEHOLD'
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // correlated LATERAL subquery with per-row LIMIT: top-2
    // customers by balance per nation — the "top-k per outer row"
    // idiom SQL users reach for before window functions. Catalyst
    // decorrelates it; ties broken by name so both engines agree.
    "q_lateral_topk" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT n.n_name, c.c_name,
          |  CAST(c.c_acctbal AS DOUBLE) AS bal
          |FROM nation n,
          |LATERAL (SELECT c_name, c_acctbal FROM customer c
          |         WHERE c.c_nationkey = n.n_nationkey
          |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
          |ORDER BY n.n_name, bal DESC, c.c_name""".stripMargin)
    }),

    // JSON scalar extraction from the events props column — sorted
    // narrow FIRST so the range-sampling pass doesn't run the JSON
    // parse a second time (see cdc_json_format)
    "q_json_extract" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("props"))
        .orderBy(col("event_id"))
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))),

    // PIVOT (conditional aggregation): order counts by priority ×
    // status
    "q_pivot_status" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))),

    // exact interpolated percentiles (sort-based, not approx —
    // matches DuckDB quantile_cont bit-for-bit on these inputs)
    "q_percentiles" -> ((s, dir) => {
      // distributed exact selection (ops/ExactQuantiles), NOT the
      // built-in percentile() aggregate: percentile() buffers every
      // value of a group inside ONE task (an unsplittable
      // ObjectHashAggregate buffer, single-threaded sort) — 20 s at
      // sf1 and a straight OOM at 100 TB. The banded form keeps every
      // stage bounded and reproduces percentile()'s interpolation
      // bit-for-bit (same formula), so the quantile_cont oracle is
      // unchanged.
      val q = graft.ops.ExactQuantiles.percentiles(
        Tables.load(s, dir, "lineitem"), "l_returnflag",
        Seq("l_quantity" -> Seq(0.5),
          "l_extendedprice" -> Seq(0.25, 0.75)))
      q.groupBy(col("l_returnflag"))
        .agg(
          max(when(col("vcol") === "l_quantity" && col("p") === 0.5,
            col("value"))).as("med_qty"),
          max(when(col("vcol") === "l_extendedprice" && col("p") === 0.25,
            col("value"))).as("p25_price"),
          max(when(col("vcol") === "l_extendedprice" && col("p") === 0.75,
            col("value"))).as("p75_price"))
        .orderBy(col("l_returnflag"))
    }),

    // range (band) join: non-equi condition against a small broadcast
    // side — the plan is BroadcastNestedLoopJoin, the right shape for
    // a bounded band table at any fact size
    "q_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq(
        ("p0", 0.0, 50.0), ("p1", 50.0, 100.0),
        ("p2", 100.0, 150.0), ("p3", 150.0, 1e9))
        .toDF("band", "lo", "hi")
      Tables.load(s, dir, "events")
        .join(broadcast(bands),
          col("value") >= col("lo") && col("value") < col("hi"))
        .select(col("event_id"), col("band"))
        .orderBy(col("event_id"))
    }),

    // range join, SCALE path: same semantics as q_range_join but via
    // bin quantization — intervals explode into fixed-width bins, the
    // match becomes a shuffle EQUI-join on bin id + residual filter
    // (ops/BinnedRangeJoin). No broadcast, no nested loop: the
    // interval side here derives from nation (25 overlapping windows,
    // width 30, stride 20) purely to have a deterministic table both
    // engines construct identically — the plan is the one that holds
    // when intervals grow with the data.
    "q_range_join_binned" -> ((s, dir) => {
      val iv = Tables.load(s, dir, "nation").select(
        col("n_nationkey"),
        (col("n_nationkey") * 20).cast("double").as("lo"),
        (col("n_nationkey") * 20 + 30).cast("double").as("hi"))
      graft.ops.BinnedRangeJoin.join(
        Tables.load(s, dir, "events").select(col("event_id"), col("value")),
        "value", iv, "lo", "hi", binWidth = 32.0)
        .select(col("event_id"), col("n_nationkey"))
        .orderBy(col("event_id"), col("n_nationkey"))
    }),

    // per-group top-k via the engine's own bounded-heap aggregate
    // (functions/TopKLargest, a TypedImperativeAggregate registered
    // through GraftExtensions): map-side partial heaps mean the
    // shuffle carries at most k doubles per group per task —
    // row_number-over-window would sort every row, collect_list would
    // materialize whole groups.
    // The heap's array output is exploded to (group, rank, value)
    // scalar rows for the final projection: the driver's pandas
    // compare can't hash raw array cells, and raw doubles compare
    // exactly where formatted strings would risk float-format
    // divergence between engines.
    // `value + 0.0` normalizes -0.0 → 0.0 on both sides: the heap's
    // IEEE total order ranks 0.0 above -0.0 while the oracle's sort
    // treats them equal, so raw zeros at the k-boundary could emit
    // with different signs and spuriously hash-mismatch.
    "q_topk_per_group" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(expr("topk_largest(value, 5)").as("tv"))
        .select(col("event_type"), posexplode(col("tv")).as(Seq("p", "v")))
        .select(col("event_type"), (col("p") + 1).as("rk"),
          (col("v") + lit(0.0)).as("value"))
        .orderBy(col("event_type"), col("rk"))),

    // HAVING (post-aggregate filter)
    "q_having" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 40)
        .orderBy(col("l_partkey")))
  )

  val oracle: Map[String, String] = Map(
    "q_left_join_counts" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_full_outer_nation" ->
      """SELECT coalesce(c.nk, s.nk) AS nk,
        | coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        |      FROM customer GROUP BY 1) c
        |FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
        |           FROM supplier GROUP BY 1) s ON c.nk = s.nk
        |ORDER BY nk""".stripMargin,
    "q_cube_status_prio" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        | coalesce(o_orderpriority, 'ALL') AS prio, COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, prio""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        | substring(p_name, 1, 5) AS prefix, length(p_name) AS name_len,
        | replace(p_type, ' ', '_') AS type_us,
        | p_brand || '#' || p_type AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS y,
        | CAST(month(o_orderdate) AS INTEGER) AS m,
        | CAST(day(o_orderdate) AS INTEGER) AS d,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS mon
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_case_bands" ->
      """SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low'
        |  WHEN o_totalprice < 150000.0 THEN 'mid' ELSE 'high' END AS band,
        | COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY band""".stripMargin,
    "q_in_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'MACHINERY')
        |ORDER BY o_orderkey""".stripMargin,
    "q_cross_join" ->
      """SELECT r1.r_name AS a, r2.r_name AS b
        |FROM region r1 CROSS JOIN region r2 ORDER BY a, b""".stripMargin,
    "q_union_all" ->
      """SELECT 'cust' AS src, c_custkey AS key FROM customer
        |UNION ALL SELECT 'supp' AS src, s_suppkey AS key FROM supplier
        |ORDER BY src, key""".stripMargin,
    "q_window_rank" ->
      """SELECT o_orderkey, o_orderstatus,
        | rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority)
        |   AS rnk,
        | dense_rank() OVER (PARTITION BY o_orderstatus
        |   ORDER BY o_orderpriority) AS drnk
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_firstlast" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER w AS first_ok,
        | last_value(o_orderkey) OVER w AS last_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_sql_frontend" ->
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'HOUSEHOLD'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_lateral_topk" ->
      """SELECT n.n_name, c.c_name,
        |  CAST(c.c_acctbal AS DOUBLE) AS bal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n.n_name, bal DESC, c.c_name""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_pivot_status" ->
      """SELECT o_orderpriority,
        | COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
        | COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
        | COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS med_qty,
        | quantile_cont(l_extendedprice, 0.25) AS p25_price,
        | quantile_cont(l_extendedprice, 0.75) AS p75_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_range_join" ->
      """SELECT event_id, band FROM events e
        |JOIN (VALUES ('p0', 0.0, 50.0), ('p1', 50.0, 100.0),
        |             ('p2', 100.0, 150.0), ('p3', 150.0, 1000000000.0))
        |  AS b(band, lo, hi)
        |  ON e.value >= b.lo AND e.value < b.hi
        |ORDER BY event_id""".stripMargin,
    "q_range_join_binned" ->
      """SELECT event_id, n_nationkey FROM events e
        |JOIN (SELECT n_nationkey,
        |        CAST(n_nationkey * 20 AS DOUBLE) AS lo,
        |        CAST(n_nationkey * 20 + 30 AS DOUBLE) AS hi
        |      FROM nation) n
        |  ON e.value >= n.lo AND e.value < n.hi
        |ORDER BY event_id, n_nationkey""".stripMargin,
    "q_topk_per_group" ->
      """SELECT event_type, rk, value + 0.0 AS value FROM (
        |  SELECT event_type, value,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC) AS INTEGER) AS rk
        |  FROM events WHERE value IS NOT NULL) x
        |WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin,
    "q_having" ->
      """SELECT l_partkey, COUNT(*) AS n FROM lineitem
        |GROUP BY l_partkey HAVING COUNT(*) > 40
        |ORDER BY l_partkey""".stripMargin
  )
}
