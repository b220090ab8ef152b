package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** Batch ≡ streaming equivalence on the REAL events table: the
  * declared batch queries (`cdc_sessionize`, `cdc_hourly_rollup` —
  * DuckDB-oracle-verified) are replayed as Structured Streaming
  * aggregates over the exact same parquet, and the results must
  * match row-for-row. This closes the loop the reference never had:
  * its pipeline is stream-only with no way to prove the stream's
  * aggregates against a batch recomputation of the same history.
  *
  * Complete output mode: these are finite replays, and complete mode
  * emits every group's final state without coupling the test to
  * watermark-flush timing (the append-mode/watermark path is covered
  * by StatefulOpsSpec's late-data tests).
  */
class StreamingTwinsSpec extends SparkSpec {

  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("graft-twin-events")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    // copied parquet is non-trivial at bench scale: don't leak it
    // across suite runs
    d.toFile.deleteOnExit()
    d.resolve("events.parquet").toFile.deleteOnExit()
    d.toString
  }

  /** The events table as a file stream, ts normalized to Long ns
    * through the same contract probe the batch loader uses. */
  private def streamEvents: DataFrame = {
    val schema = graft.Tables.load(spark, sfDir, "events").schema
    graft.Tables.normalizeTsNs(
      spark.readStream.schema(schema).parquet(eventsDir))
  }

  private def runToTable(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), s"$name did not finish")
    spark.table(name)
  }

  test("session_window stream ≡ batch cdc_sessionize on the same events") {
    val batch = graft.SparkEntry.queries("cdc_sessionize")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val sessions = StatefulOps.sessionWindowCounts(
      streamEvents.withColumn("ts_t", timestamp_micros(expr("ts div 1000"))),
      eventTimeCol = "ts_t", keyCol = "user_id",
      gap = "30 minutes", delay = "0 seconds")
    val streamed = runToTable(sessions, "twin_sessions")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(streamed == batch,
      s"streaming sessions diverge: only-stream=${(streamed -- batch).take(5)} " +
        s"only-batch=${(batch -- streamed).take(5)}")
  }

  test("stream-stream intervalJoin ≡ batch cdc_interval_join on the same events") {
    val batch = graft.SparkEntry.queries("cdc_interval_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    def side(kind: String, idAs: String, tsAs: String): DataFrame =
      streamEvents.filter(col("event_type") === kind)
        .select(col("event_id").as(idAs), col("user_id"),
          timestamp_micros(expr("ts div 1000")).as(tsAs))
    // stream-stream inner join is append-mode-only; a finite replay
    // emits every match, the watermark only bounds state
    val joined = StatefulOps.intervalJoin(
      side("purchase", "p_id", "p_ts"), side("signup", "s_id", "s_ts"),
      keyCols = Seq("user_id"), leftTs = "p_ts", rightTs = "s_ts",
      delay = "0 seconds", before = "1 hour", after = "1 hour")
      .select(col("p_id"), col("r_s_id"), col("user_id"))
    val name = "twin_interval"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), s"$name did not finish")
    val streamed = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(streamed == batch,
      s"interval join diverges: only-stream=${(streamed -- batch).take(5)} " +
        s"only-batch=${(batch -- streamed).take(5)}")
  }

  test("tumbling-window stream ≡ batch cdc_hourly_rollup on the same events") {
    val batch = graft.SparkEntry.queries("cdc_hourly_rollup")(spark, sfDir)
      .select(col("hr").cast("string"), col("event_type"), col("n"),
        col("sum_value"))
      .collect().map(_.toString).toSet

    val rollup = streamEvents
      .withColumn("hr_t", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("hr_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").cast("string").as("hr"),
        col("event_type"), col("n"), col("sum_value"))
    val streamed = runToTable(rollup, "twin_rollup")
      .collect().map(_.toString).toSet

    assert(streamed == batch,
      s"streaming rollup diverges: only-stream=${(streamed -- batch).take(5)} " +
        s"only-batch=${(batch -- streamed).take(5)}")
  }

  test("funnelStream ≡ batch q_event_funnel on the same events") {
    import spark.implicits._
    val batch = graft.SparkEntry.queries("q_event_funnel")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

    val evs = streamEvents
      .select(col("user_id").as("userId"), col("ts").as("tsNs"),
        col("event_id").as("seq"), col("event_type").as("eventType"))
      .as[StatefulOps.FunnelEvent]
    val prog = StatefulOps.funnelStream(evs,
      Seq("view", "click", "purchase")).toDF()
    val q = prog.writeStream.format("memory").queryName("twin_funnel")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "funnel stream did not finish")
    // update mode appends one progress row per (user, batch); the
    // LAST row per user is the final stage (stage is monotone)
    val finalStage = spark.table("twin_funnel")
      .groupBy(col("userId")).agg(max(col("stage")).as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val streamedCounts = (1 to 3).map(s =>
      s -> finalStage.values.count(_ >= s).toLong).toMap
    assert(streamedCounts == batch,
      s"funnel diverges: stream=$streamedCounts batch=$batch")
  }

  test("transitionsStream ≡ batch q_event_transitions on the same events") {
    import spark.implicits._
    val batch = graft.SparkEntry.queries("q_event_transitions")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    val evs = streamEvents
      .select(col("user_id").as("userId"), col("ts").as("tsNs"),
        col("event_id").as("seq"), col("event_type").as("eventType"))
      .as[StatefulOps.FunnelEvent]
    val pairs = StatefulOps.transitionsStream(evs).toDF()
    val q = pairs.writeStream.format("memory").queryName("twin_transitions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "transitions stream did not finish")
    val streamed = spark.table("twin_transitions")
      .groupBy(col("prevType"), col("nextType"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch,
      s"transitions diverge: only-stream=${(streamed.toSet -- batch.toSet).take(5)} " +
        s"only-batch=${(batch.toSet -- streamed.toSet).take(5)}")
  }
}
