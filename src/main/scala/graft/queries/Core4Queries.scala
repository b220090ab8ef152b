package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Fourth query batch: the remaining classic TPC-H shapes expressible
  * over the driver testdata (no partsupp table exists, so Q2/Q9/Q11/
  * Q16/Q20 are out of reach): Q7 two-nation volume shipping, Q8
  * market share, Q17 small-quantity average (correlated scalar avg),
  * Q19 disjunctive predicate pushdown, Q21 multi-EXISTS.
  *
  * Same decimal discipline as CoreQueries: exact DECIMAL aggregation
  * (associativity-proof under any shuffle order — double sums would
  * be partitioning-dependent and never hash-match the oracle), one
  * final cast to DOUBLE (IEEE-nearest in both engines).
  */
object Core4Queries {
  private val D = DecimalType(18, 2)
  private val F = DecimalType(4, 2)
  private def dec(c: Column): Column = c.cast(D)
  private def discF: Column = col("l_discount").cast(F)
  private def volume: Column = dec(col("l_extendedprice")) *
    (lit(1.0).cast(F) - discF)

  private val sqlPrice = "CAST(l_extendedprice AS DECIMAL(18,2))"
  private val sqlDiscF = "CAST(l_discount AS DECIMAL(4,2))"
  private val sqlVolume = s"$sqlPrice * (CAST(1 AS DECIMAL(4,2)) - $sqlDiscF)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ≙ TPC-H Q7: volume shipped between two nations, both
    // directions, by year. Nation (25 rows) broadcasts into supplier
    // and customer; the nation FILTER then cuts both to 2/25 BEFORE
    // any fact joins — AQE sizes those shrunken sides at runtime (no
    // explicit broadcast hint: supplier/customer grow with the data).
    // The only full-fact shuffles are lineitem⨝supplier-lines and
    // lineitem⨝orders on their natural keys.
    "q7_volume_shipping" -> ((s, dir) => {
      val nat = Tables.load(s, dir, "nation")
        .filter(col("n_name").isin("NATION_12", "NATION_19"))
      val sup = Tables.load(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.load(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"), volume.as("vol_d"))
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_12" &&
            col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" &&
            col("cust_nation") === "NATION_12"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("vol_d")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // ≙ TPC-H Q8: one nation's market share inside one region's
    // customer demand, by order year. Numerator (CASE-gated) and
    // denominator aggregate EXACTLY in decimal; the single final
    // double division is IEEE-identical in both engines. Region →
    // nation → customer prunes the order side early; the p_type
    // filter prunes lineitem via the part join.
    "q8_market_share" -> ((s, dir) => {
      val pa = Tables.load(s, dir, "part")
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val supN = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custR = Tables.load(s, dir, "customer")
        .join(broadcast(Tables.load(s, dir, "nation")
            .join(Tables.load(s, dir, "region"),
              col("n_regionkey") === col("r_regionkey"))
            .filter(col("r_name") === "AMERICA")
            .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(custR, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          volume.as("vol_d"))
        .join(pa, col("l_partkey") === col("p_partkey"), "left_semi")
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("vol_d"))
            .otherwise(lit(0).cast(D))).as("nation_vol_d"),
          sum(col("vol_d")).as("total_vol_d"))
        .select(col("o_year"),
          (col("nation_vol_d").cast("double") /
            col("total_vol_d").cast("double")).as("mkt_share"),
          col("total_vol_d").cast("double").as("total_volume"))
        .orderBy(col("o_year"))
    }),

    // ≙ TPC-H Q17: revenue from small-quantity lines of one brand's
    // small parts, where "small quantity" is a correlated per-part
    // scalar (0.2 × that part's average quantity). Aggregate-then-
    // join-back (q18's shape): the part semi-join prunes lineitem
    // FIRST, so the per-part avg (map-side combined) and the final
    // filter both run over the pruned fact only. The threshold double
    // derives from an EXACT decimal sum, so it is partitioning-
    // independent on both engines.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val pa = Tables.load(s, dir, "part")
        .filter(col("p_brand") === "Brand#1" && col("p_size") <= 10)
        .select(col("p_partkey"))
      val j = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(pa, col("l_partkey") === col("p_partkey"), "left_semi")
      val thr = j.groupBy(col("l_partkey"))
        .agg(((sum(dec(col("l_quantity"))).cast("double") /
          count(lit(1))) * 0.2).as("thr"))
      j.join(thr, Seq("l_partkey"))
        .filter(col("l_quantity") < col("thr"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
          .as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // ≙ TPC-H Q19: disjunction of (brand, size-band, quantity-band)
    // conjuncts across the part join. Catalyst's CNF conversion
    // extracts the part-only disjunction (brand/size) and pushes it
    // to the part SCAN, and likewise the quantity disjunction to
    // lineitem — the join no longer sees either table unfiltered
    // (PlanShapeSpec pins the pushdown).
    "q19_disjunctive_revenue" -> ((s, dir) => {
      // revenue as exact integer cents² through sum128 (same
      // fixed-point pattern as q1/q3/q5 — helpers shared from
      // CoreQueries so the rounding constant lives in ONE place)
      import CoreQueries.{cents, sum128Scaled}
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          (cents(col("l_extendedprice")) *
            (lit(100L) - cents(col("l_discount")))).as("vol_c"))
      val pa = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      li.join(pa, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(sum128Scaled(col("vol_c"), 10000L).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // UNPIVOT (wide → long melt): each id row fans out to one row per
    // measure column — a narrow scan-stage Expand, no shuffle. The
    // inverse of q_pivot_status.
    "q_unpivot" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          col("o_totalprice").as("totalprice"),
          col("o_custkey").cast("double").as("custkey"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("totalprice"), col("custkey")), "name", "value")
        .orderBy(col("o_orderkey"), col("name"))),

    // EXCEPT ALL — multiset difference (keeps surplus duplicates,
    // unlike the distinct EXCEPT in q_setop_except). Canonicalized
    // through a final count-per-key aggregate so the oracle compare
    // has a deterministic row order.
    "q_setop_except_all" -> ((s, dir) => {
      val a = Tables.load(s, dir, "lineitem")
        .filter(col("l_linenumber") <= 2).select(col("l_suppkey"))
      val b = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_linenumber") === 1)
        .select(col("l_suppkey"))
      a.exceptAll(b)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("surplus"))
        .orderBy(col("l_suppkey"))
    }),

    // ordered string aggregation (group_concat/listagg): sorted
    // collect_list + array_join is the deterministic Spark spelling —
    // an UNSORTED listagg is partitioning-dependent and could never
    // hash-match (the same reason rand() sampling is banned).
    "q_group_concat" -> ((s, dir) =>
      Tables.load(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
          .as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))),

    // ≙ TPC-H Q21 shape (adapted: no receipt/commit dates in the
    // testdata — "late" = shipped >90 days after the order date):
    // suppliers who were the ONLY late shipper in a multi-supplier
    // finished order. EXISTS/NOT-EXISTS become left-semi/left-anti
    // joins on the orderkey with a suppkey-inequality condition; the
    // `late` frame feeds both the probe and the anti side, and the
    // identical subtrees share one shuffle via ReuseExchange (no
    // cache — at 100 TB a cache of a fact-sized frame is the bug).
    "q21_waiting_supplier" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val ordF = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      def late: DataFrame = li
        .join(ordF, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val others = li.select(col("l_orderkey").as("o2_orderkey"),
        col("l_suppkey").as("o2_suppkey"))
      val lateOthers = late.select(col("l_orderkey").as("o3_orderkey"),
        col("l_suppkey").as("o3_suppkey"))
      late
        .join(others,
          col("l_orderkey") === col("o2_orderkey") &&
            col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
        .join(lateOthers,
          col("l_orderkey") === col("o3_orderkey") &&
            col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
        .join(Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // one-scan table profiling (ops/TableProfiler): every column's
    // row/null/exact-distinct counts and min/max from a single scan —
    // explode to (col, value) + two hash aggregates, so the only
    // sort-based aggregate sees distinct VALUES, not table rows. The
    // oracle states the same statistics as one UNION ALL per column,
    // which is exactly the k-scan plan the operator avoids at 100 TB.
    "q_profile_table" -> ((s, dir) =>
      graft.ops.TableProfiler.profile(
        graft.ops.Spread.auto(Tables.load(s, dir, "lineitem")),
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
          "l_shipdate"))
        .orderBy(col("col_name"))),

    // declarative data-quality audit (ops/Constraints): k row-local
    // checks fold into ONE conditional-aggregation scan; `unique`
    // adds one hash aggregate, referential integrity one anti-join
    // against the (broadcastable) parent. The validation layer a CDC
    // consumer runs on the replicated target — exact integer
    // violation counts, so the audit oracle-checks.
    "q_constraint_audit" -> ((s, dir) => {
      import graft.ops.Constraints._
      audit(Tables.load(s, dir, "lineitem"), Seq(
        NotNull("l_orderkey"),
        Range("l_discount", 0.0, 0.05),
        InSet("l_returnflag", Seq("A", "N", "R")),
        Predicate("price_positive", col("l_extendedprice") > 0.0),
        Unique(Seq("l_orderkey", "l_linenumber")),
        RefIntegrity("l_partkey", Tables.load(s, dir, "part"),
          "p_partkey", "part")))
    })
  )

  val oracle: Map[String, String] = Map(
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |  CAST(SUM($sqlVolume) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_19') OR
         |       (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_12'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      s"""WITH flat AS (
         |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |    $sqlVolume AS vol_d,
         |    (SELECT n_name FROM nation
         |     WHERE n_nationkey = s_nationkey) AS supp_nation
         |  FROM lineitem
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  WHERE l_partkey IN (SELECT p_partkey FROM part
         |                      WHERE p_type = 'PROMO')
         |    AND o_custkey IN (
         |      SELECT c_custkey FROM customer
         |      JOIN nation ON c_nationkey = n_nationkey
         |      JOIN region ON n_regionkey = r_regionkey
         |      WHERE r_name = 'AMERICA')
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1998-01-01')
         |SELECT o_year,
         |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_d
         |           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
         |    CAST(SUM(vol_d) AS DOUBLE) AS mkt_share,
         |  CAST(SUM(vol_d) AS DOUBLE) AS total_volume
         |FROM flat GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q17_small_qty_revenue" ->
      s"""WITH j AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem
         |  WHERE l_partkey IN (SELECT p_partkey FROM part
         |                      WHERE p_brand = 'Brand#1' AND p_size <= 10)),
         |a AS (
         |  SELECT l_partkey,
         |    (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
         |     COUNT(*)) * 0.2 AS thr
         |  FROM j GROUP BY l_partkey)
         |SELECT CAST(SUM($sqlPrice) AS DOUBLE) / 7.0 AS avg_yearly,
         |  COUNT(*) AS n_lines
         |FROM j JOIN a USING (l_partkey)
         |WHERE l_quantity < thr""".stripMargin,
    "q19_disjunctive_revenue" ->
      s"""SELECT CAST(SUM($sqlVolume) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_unpivot" ->
      """SELECT o_orderkey, name, value FROM (
        |  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice,
        |    CAST(o_custkey AS DOUBLE) AS custkey
        |  FROM orders WHERE o_orderkey < 2000)
        |UNPIVOT (value FOR name IN (totalprice, custkey))
        |ORDER BY o_orderkey, name""".stripMargin,
    "q_setop_except_all" ->
      """SELECT l_suppkey, COUNT(*) AS surplus FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_linenumber <= 2
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_returnflag = 'R' AND l_linenumber = 1)
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_group_concat" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n
        |FROM nation GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin,
    "q21_waiting_supplier" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q_constraint_audit" ->
      """SELECT 0 AS ord, 'not_null(l_orderkey)' AS "check",
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_violations
        |FROM lineitem
        |UNION ALL
        |SELECT 1, 'range(l_discount)',
        |  CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.05
        |                THEN 0 ELSE 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 2, 'in_set(l_returnflag)',
        |  CAST(SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R')
        |                THEN 0 ELSE 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 3, 'price_positive',
        |  CAST(SUM(CASE WHEN l_extendedprice > 0.0 THEN 0 ELSE 1 END)
        |       AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 4, 'unique(l_orderkey,l_linenumber)',
        |  CAST(coalesce(SUM(n - 1), 0) AS BIGINT)
        |FROM (SELECT count(*) AS n FROM lineitem
        |      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1) t
        |UNION ALL
        |SELECT 5, 'ref(l_partkey->part.p_partkey)',
        |  CAST(count(*) AS BIGINT)
        |FROM lineitem l
        |WHERE l_partkey IS NOT NULL AND NOT EXISTS
        |  (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        |ORDER BY ord""".stripMargin,
    "q_profile_table" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS col_name,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
        |    CAST(MIN(l_orderkey) AS DOUBLE) AS min_num,
        |    CAST(MAX(l_orderkey) AS DOUBLE) AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_str,
        |    CAST(NULL AS VARCHAR) AS max_str
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linenumber', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) - COUNT(l_linenumber) AS BIGINT),
        |    CAST(COUNT(DISTINCT l_linenumber) AS BIGINT),
        |    CAST(MIN(l_linenumber) AS DOUBLE),
        |    CAST(MAX(l_linenumber) AS DOUBLE),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT),
        |    CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
        |    MIN(l_quantity), MAX(l_quantity),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
        |    CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    MIN(l_returnflag), MAX(l_returnflag)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT),
        |    CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    CAST(MIN(l_shipdate) AS VARCHAR),
        |    CAST(MAX(l_shipdate) AS VARCHAR)
        |  FROM lineitem)
        |ORDER BY col_name""".stripMargin
  )
}
