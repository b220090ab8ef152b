package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Relational query layer over the TPC-H-ish testdata.
  *
  * The reference engine has no joins/aggregations/windows/sorts/set
  * ops (SURVEY §2 marks them Absent) — in the Spark engine they are
  * Catalyst built-ins, declared here so the optimizer owns the
  * physical strategy (broadcast vs shuffle join, partial aggregation,
  * AQE). Numeric outputs are computed in DECIMAL: decimal arithmetic
  * is exact and associativity-proof, so results are deterministic
  * under any partitioning / shuffle order — double sums are not.
  */
object CoreQueries {
  // The testdata's doubles are 2-decimal money; casting at the data's
  // true scale keeps the cast 9 orders of magnitude away from any
  // rounding boundary, so Spark (HALF_UP on shortest-repr) and DuckDB
  // (scaled-double round) agree exactly. Scale-4 casts were observed
  // to diverge by 1 ulp on FP near-ties.
  private val D = DecimalType(18, 2)     // exact money/quantity intermediate
  // Final output columns are cast DECIMAL→DOUBLE: the aggregation stays
  // exact (decimal, associativity-proof under any shuffle order) and the
  // single final conversion is IEEE-nearest in both Spark and DuckDB, so
  // the rendered value is bit-identical across engines. Emitting DECIMAL
  // directly hash-mismatched in the driver gate (scale/trailing-zero
  // rendering differs between engines) even when values were equal.
  private val F = DecimalType(4, 2)      // 1±discount/tax factors

  private def dec(c: Column): Column = c.cast(D)
  private def one: Column = lit(1.0).cast(F)
  private def discF: Column = one - col("l_discount").cast(F)
  private def taxF: Column = one + col("l_tax").cast(F)

  // Fixed-point revenue: sum(price·(1-disc)) as exact integer cents²
  // through the sum128 limb aggregate (functions/Sum128) — same
  // exact rational as the decimal(38,6) form (both oracle-green),
  // without the per-row BigDecimal that sum(decimal>18) costs. The
  // money columns carry 2 decimals, so floor(x·100+0.5) is the exact
  // long value on both engines.
  private[queries] def cents(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast("long")
  // DOUBLE rendering is only driver-stable while the UNSCALED exact
  // sum stays under 2^53 ≈ 9.0e15: above that, DuckDB's
  // decimal→DOUBLE cast double-rounds (int128→double loses low bits,
  // THEN the scale division rounds again) while Spark's
  // BigDecimal.doubleValue rounds once, correctly — a 1-ulp lottery
  // per group. Measured at sf3: q1's sum_charge (scale-6 units,
  // unscaled ≈ 2.4e17) lost it on 2 of 6 groups. Audited across
  // every double-rendered decimal sum in the sf3 dumps (max |value|
  // per column × 10^scale vs 2^53): after q1 and q5 moved to exact
  // strings, the tightest remaining margins are q14's
  // total_revenue (~1.0e14 unscaled, 86×) and q19's revenue
  // (~7.4e13, 121×); everything else is ≥200× under. Money
  // aggregates that can cross render via sum128Money.
  private[queries] def sum128Scaled(c: Column, scale: Long): Column =
    (call_function("sum128", c) / lit(scale)).cast("double")
  // Exact rendering at ANY magnitude: round the exact decimal to
  // cents and emit the STRING (compare.py doctrine: "VARCHAR for
  // exactness, DOUBLE when the magnitude fits"). Spark round() is
  // HALF_UP and DuckDB ROUND is half-away-from-zero — identical on
  // every sign — and both engines render DECIMAL(·,2) strings with
  // the full two-digit scale, so the bytes match bit-for-bit with no
  // FP cast anywhere. Oracle twin: CAST(ROUND(SUM(...), 2) AS VARCHAR).
  private[queries] def sum128Money(c: Column, scale: Long): Column =
    round(call_function("sum128", c) / lit(scale), 2).cast("string")
  private def centsRevenue: Column =
    (call_function("sum128",
      cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
      / lit(10000L)).cast("double")

  // shared oracle SQL fragments (DuckDB dialect = ANSI here)
  private val sqlDisc = "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
  private val sqlTax = "(CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))"
  private val sqlPrice = "CAST(l_extendedprice AS DECIMAL(18,2))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ≙ TPC-H Q1: full-scan hash aggregate; partial agg map-side, 6
    // groups — shuffle is O(partitions), not O(rows).
    "q1_pricing_summary" -> ((s, dir) => {
      // Fixed-point money math on the engine's sum128 aggregate
      // (functions/Sum128): inputs scale to exact integer cents
      // (floor(x·100+0.5) — the money columns carry 2 decimals, so
      // the long is the exact value), products stay exact long
      // arithmetic inside whole-stage codegen, and the 128-bit limb
      // sum defers ALL BigDecimal work to one op per group. Same
      // exact rational as the decimal(38,6) formulation (both
      // hash-match the DuckDB oracle), measured 3-4× faster on the
      // full scan — sum(decimal>18) runs per-row BigDecimal, the
      // reason native engines sum money as int128.
      val p = cents(col("l_extendedprice"))
      val d = lit(100L) - cents(col("l_discount"))
      val t = lit(100L) + cents(col("l_tax"))
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum128Scaled(cents(col("l_quantity")), 100L).as("sum_qty"),
          // money sums as exact decimal STRINGS: at sf3 sum_charge's
          // unscaled sum (~2.4e17) is past the 2^53 cliff where
          // DuckDB's decimal→DOUBLE cast double-rounds (2 of 6
          // groups came back 1 ulp off) — see sum128Money
          sum128Money(p, 100L).as("sum_base_price"),
          sum128Money(p * d, 10000L).as("sum_disc_price"),
          sum128Money(p * d * t, 1000000L).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ≙ TPC-H Q3 shape: selective dim filter into the fact join,
    // then top-k. customer is data-proportional (sf0.1 → 15K rows;
    // cluster scale → billions), so NO broadcast hint: AQE broadcasts
    // while the filtered side is small and falls back to a shuffled
    // join at scale. A hard hint here is a guaranteed OOM at 100 TB.
    "q3_segment_topk" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(centsRevenue.as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ≙ TPC-H Q5 shape: star join. Only the FIXED-cardinality dims
    // (nation=25, region=5) get broadcast hints; customer is
    // data-proportional and reaches its join unhinted — AQE picks
    // broadcast at small sf, shuffled join at cluster scale.
    "q5_region_nation_revenue" -> ((s, dir) => {
      val region = Tables.load(s, dir, "region")
      val nation = Tables.load(s, dir, "nation")
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      // nation⋈region pre-joins into ONE 25-row broadcast dim: one
      // hash table to build and probe instead of two (same result,
      // one fewer broadcast stage at any scale)
      val dim = nation.join(region, col("n_regionkey") === col("r_regionkey"))
      // q5 aggregates the UNFILTERED fact table into 25 groups, so
      // its sums are the largest in the suite after q1's: at sf3 the
      // exact scale-4 sum reaches ~3.7e14 unscaled — 24× under the
      // 2^53 double cliff (see sum128Money), crossing around sf70.
      // Render exact; ORDER on the exact decimal (the string would
      // sort lexicographically), project the string after.
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(dim), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg((call_function("sum128",
          cents(col("l_extendedprice"))
            * (lit(100L) - cents(col("l_discount")))) / lit(10000L))
          .as("__rev"))
        .orderBy(col("__rev").desc, col("n_name"))
        .select(col("r_name"), col("n_name"),
          round(col("__rev"), 2).cast("string").as("revenue"))
    }),

    // global top-k: Spark's TakeOrderedAndProject — per-partition
    // heaps, no full sort, no full shuffle.
    "q_topk_orders" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // ranking window: latest order per customer.
    "q_window_latest_order" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"))
    }),

    // analytic window with running frame; DECIMAL keeps the running
    // sum exact regardless of the engine's frame evaluation strategy.
    "q_window_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(D)).over(w).cast("double").as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // distinct aggregate: suppliers per part (expand + two-phase agg).
    "q_distinct_suppliers" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_items"))
        .orderBy(col("l_partkey"))),

    // set op: EXCEPT (customers that never ordered, key-only form).
    "q_setop_except" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer").select(col("c_custkey"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"))
      c.except(o).orderBy(col("c_custkey"))
    }),

    // set op: INTERSECT (finished ∩ urgent orders).
    "q_setop_intersect" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
        .intersect(
          o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")))
        .orderBy(col("o_orderkey"))
    }),

    // anti join ≙ NOT EXISTS (broadcast of the build side at scale).
    "q_anti_join" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // semi join ≙ EXISTS.
    "q_semi_join" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // rollup: grouping-set aggregate; NULL group markers coalesced to
    // 'ALL' so null-ordering differences can't bite the oracle.
    "q_rollup_counts" -> ((s, dir) =>
      graft.ops.Spread.auto(Tables.load(s, dir, "lineitem"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))),

    // correlated-scalar shape: orders above their customer's average
    // (expressed as join against a pre-aggregated subquery — the plan
    // Catalyst would decorrelate to anyway).
    "q_above_avg_orders" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      // exact decimal sum ÷ count, then one double division: the
      // double avg() is partition-order-dependent in its last ulp,
      // which can flip `price > avg` on degenerate groups.
      val avgs = o.groupBy(col("o_custkey").as("k"))
        .agg((sum(dec(col("o_totalprice"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_price"))
      // No broadcast hint: avgs is O(|customer|) — data-proportional, so
      // a forced broadcast OOMs at 100× scale. AQE broadcasts while the
      // frame is actually small and shuffles otherwise.
      o.join(avgs, col("o_custkey") === col("k"))
        .filter(col("o_totalprice") > col("avg_price"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         | CAST(ROUND(SUM($sqlPrice), 2) AS VARCHAR) AS sum_base_price,
         | CAST(ROUND(SUM($sqlPrice * $sqlDisc), 2) AS VARCHAR) AS sum_disc_price,
         | CAST(ROUND(SUM($sqlPrice * $sqlDisc * $sqlTax), 2) AS VARCHAR) AS sum_charge,
         | COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_segment_topk" ->
      s"""SELECT o_orderkey, o_orderdate,
         | CAST(SUM($sqlPrice * $sqlDisc) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_region_nation_revenue" ->
      s"""SELECT r_name, n_name,
         | CAST(ROUND(SUM($sqlPrice * $sqlDisc), 2) AS VARCHAR) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY SUM($sqlPrice * $sqlDisc) DESC, n_name""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_window_latest_order" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_window_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_distinct_suppliers" ->
      """SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_supp,
        | COUNT(*) AS n_items
        |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,
    "q_setop_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,
    "q_setop_intersect" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_rollup_counts" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        | coalesce(l_linestatus, 'ALL') AS ls,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_above_avg_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |JOIN (SELECT o_custkey AS k,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |          / CAST(COUNT(*) AS DOUBLE) AS avg_price
        |      FROM orders GROUP BY o_custkey) a ON o.o_custkey = a.k
        |WHERE o_totalprice > avg_price
        |ORDER BY o_orderkey""".stripMargin
  )
}
