package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics over the `events` table — the OLAP shapes a
  * CDC consumer builds on top of the replicated stream (funnel
  * conversion, retention cohorts, event-time lateness). All time math
  * is exact integer nanoseconds (Tables.loadEventsNs), so every query
  * hash-matches the DuckDB oracle under any partitioning.
  */
object EventQueries {
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.loadEventsNs(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ordered funnel: users reaching view → click-after-view →
    // purchase-after-that-click. Each stage is one keyed min-aggregate
    // joined to the previous stage's frame — three shuffles on the
    // SAME key (user_id), so at scale the exchanges line up and AQE
    // reuses the partitioning; no window over the whole event history
    // and no per-user event-list materialization (the collect_list
    // funnel shape holds a user's entire history in one row — this
    // one never does).
    "q_event_funnel" -> ((s, dir) => {
      val ev = events(s, dir)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      def stage(df: DataFrame, n: Int, name: String) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(n).as("stage"), lit(name).as("funnel"), col("n_users"))
      stage(v, 1, "view")
        .unionAll(stage(c, 2, "view>click"))
        .unionAll(stage(p, 3, "view>click>purchase"))
        .orderBy(col("stage"))
    }),

    // retention cohorts: cohort week = the user's first active week;
    // n_users per (cohort, week-offset) — the retention triangle.
    // Distinct (user, week) first (collapses each user's events in a
    // week to one row BEFORE any join), then one tiny per-user min and
    // one count aggregate; weeks are integer ns-epoch divisions, so
    // the cohort assignment is exact on both engines.
    "q_retention_cohort" -> ((s, dir) => {
      val wkNs = 604800000000000L // 7 days in ns
      val wk = events(s, dir)
        .select(col("user_id"), expr(s"ts div ${wkNs}L").as("wk"))
        .distinct()
      val cohort = wk.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
      // rows are distinct (user, wk) so count(*) IS distinct users
      wk.join(cohort, "user_id")
        .groupBy(col("cw").as("cohort_week"),
          (col("wk") - col("cw")).as("offset_weeks"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("offset_weeks"))
    }),

    // event-time lateness profile: how far behind the running
    // event-time high-watermark each event arrives (arrival order =
    // event_id) — the measurement that picks a streaming watermark
    // delay from the data instead of folklore. A naive global
    // running-max is ONE un-partitioned window; the scale shape is
    // the same banded two-pass prefix scan as pipe_token_budget:
    // coarse bands of the (monotone) arrival key, per-band maxima
    // joined into strictly-lower-band offsets (a tiny band×band
    // self-join, broadcast back), then the exact prefix max runs
    // per-band in parallel. max() is order-insensitive, so the
    // banded result is exactly the global one.
    "cdc_lateness_profile" -> ((s, dir) => {
      graft.ops.BandedScan.prefixMaxExclusive(
        events(s, dir).select(col("event_id"), col("ts")),
        orderCol = "event_id", valCol = "ts")
        .withColumnRenamed("prefix_max", "pmax")
        .filter(col("pmax").isNotNull)
        .withColumn("late_ns", greatest(col("pmax") - col("ts"), lit(0L)))
        .withColumn("ord",
          when(col("late_ns") === 0L, 0)
            .when(col("late_ns") <= 60000000000L, 1)
            .when(col("late_ns") <= 600000000000L, 2)
            .when(col("late_ns") <= 3600000000000L, 3)
            .otherwise(4))
        .withColumn("bucket",
          when(col("ord") === 0, "on_time")
            .when(col("ord") === 1, "le_1m")
            .when(col("ord") === 2, "le_10m")
            .when(col("ord") === 3, "le_1h")
            .otherwise("gt_1h"))
        .groupBy(col("ord"), col("bucket"))
        .agg(count(lit(1)).as("n_events"), max(col("late_ns")).as("max_late_ns"))
        .orderBy(col("ord"))
    }),

    // hourly volume anomaly detection: per event type, hours whose
    // event count deviates > 2σ from that type's mean rate — the
    // monitoring query a CDC operator runs over the replicated
    // stream. The z-test is rearranged to MULTIPLICATION over exact
    // integer moments ((n·c − Σc)² > 4·(n·Σc² − (Σc)²)): no mean, no
    // variance division, no sqrt, so both engines evaluate identical
    // IEEE products of exactly-represented integers and the flag
    // hash-matches (same trick as text_length_outliers). Two hash
    // aggregates + a broadcast of per-type moments; nothing global.
    "cdc_hourly_anomaly" -> ((s, dir) => {
      val hc = events(s, dir)
        .select(col("event_type"), expr("ts div 3600000000000").as("hr"))
        .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("c"))
      val m = hc.groupBy(col("event_type")).agg(count(lit(1)).as("nh"),
        sum(col("c").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("sx"),
        sum(col("c").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("c")).as("sxx"))
      hc.join(broadcast(m), Seq("event_type"))
        .select(col("event_type"),
          ((col("nh").cast("double") * col("c").cast("double")
            - col("sx").cast("double"))
            * (col("nh").cast("double") * col("c").cast("double")
              - col("sx").cast("double"))
            > lit(4.0) * (col("nh").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")))
            .as("anom"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("anom"), 1L).otherwise(0L)).as("n_anomalous"))
        .orderBy(col("event_type"))
    }),

    // event-type transition matrix (the Markov path-analysis shape):
    // per user, consecutive event pairs in event-time order, counted
    // per (from, to). One KEYED window (user_id partitions — never a
    // global sort) + one hash aggregate over ≤ |types|² keys; ties
    // broken by event_id so the sequence is total and the count
    // deterministic under any partitioning.
    "q_event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prev_type"), col("next_type"))
    }),

    // replication hole detection: ranges missing from a monotone
    // sequence — the GTID/seq-gap audit a CDC consumer runs before
    // trusting a backfill. The 'purchase' sub-stream's event_ids play
    // the applied-transaction sequence (the full table is dense, so
    // the filter is what makes gaps exist). Previous-seq comes from
    // BandedScan.prevValue — the banded lag-1, not a global window —
    // and each row with prev + 1 < seq emits one (gap_start, gap_end)
    // range: output is gap-proportional, never row-proportional.
    "cdc_seq_gaps" -> ((s, dir) =>
      graft.ops.BandedScan.prevValue(
        events(s, dir).filter(col("event_type") === "purchase")
          .select(col("event_id")),
        orderCol = "event_id", valCol = "event_id")
        .filter(col("prev_value").isNotNull &&
          col("event_id") > col("prev_value") + 1L)
        .select((col("prev_value") + 1L).as("gap_start"),
          (col("event_id") - 1L).as("gap_end"),
          (col("event_id") - col("prev_value") - 1L).as("n_missing"))
        .orderBy(col("gap_start")))
  )

  val oracle: Map[String, String] = Map(
    "q_event_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT 1 AS stage, 'view' AS funnel, count(*) AS n_users FROM v
        |UNION ALL
        |SELECT 2, 'view>click', count(*) FROM c
        |UNION ALL
        |SELECT 3, 'view>click>purchase', count(*) FROM p
        |ORDER BY stage""".stripMargin,
    "q_retention_cohort" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |              epoch_ns(ts) // 604800000000000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cw FROM wk GROUP BY 1)
        |SELECT c.cw AS cohort_week, wk.wk - c.cw AS offset_weeks,
        |  count(*) AS n_users
        |FROM wk JOIN c ON wk.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "cdc_lateness_profile" ->
      """WITH l AS (
        |  SELECT event_id, epoch_ns(ts) AS tns,
        |    max(epoch_ns(ts)) OVER (ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM events),
        |b AS (
        |  SELECT greatest(pmax - tns, 0) AS late_ns FROM l
        |  WHERE pmax IS NOT NULL)
        |SELECT CASE WHEN late_ns = 0 THEN 0
        |            WHEN late_ns <= 60000000000 THEN 1
        |            WHEN late_ns <= 600000000000 THEN 2
        |            WHEN late_ns <= 3600000000000 THEN 3
        |            ELSE 4 END AS ord,
        |  CASE WHEN late_ns = 0 THEN 'on_time'
        |       WHEN late_ns <= 60000000000 THEN 'le_1m'
        |       WHEN late_ns <= 600000000000 THEN 'le_10m'
        |       WHEN late_ns <= 3600000000000 THEN 'le_1h'
        |       ELSE 'gt_1h' END AS bucket,
        |  count(*) AS n_events, max(late_ns) AS max_late_ns
        |FROM b GROUP BY 1, 2 ORDER BY ord""".stripMargin,
    "cdc_hourly_anomaly" ->
      """WITH hc AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, count(*) AS nh, SUM(c) AS sx,
        |    SUM(c * c) AS sxx
        |  FROM hc GROUP BY 1)
        |SELECT hc.event_type, count(*) AS n_hours,
        |  CAST(SUM(CASE WHEN
        |    (CAST(nh AS DOUBLE) * CAST(c AS DOUBLE) - CAST(sx AS DOUBLE))
        |    * (CAST(nh AS DOUBLE) * CAST(c AS DOUBLE) - CAST(sx AS DOUBLE))
        |    > 4.0 * (CAST(nh AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
        |FROM hc JOIN m USING (event_type)
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_event_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type, count(*) AS n
        |FROM s WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY prev_type, next_type""".stripMargin,
    "cdc_seq_gaps" ->
      """WITH s AS (
        |  SELECT event_id,
        |    lag(event_id) OVER (ORDER BY event_id) AS prev_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT prev_id + 1 AS gap_start, event_id - 1 AS gap_end,
        |  event_id - prev_id - 1 AS n_missing
        |FROM s WHERE prev_id IS NOT NULL AND event_id > prev_id + 1
        |ORDER BY gap_start""".stripMargin
  )
}
