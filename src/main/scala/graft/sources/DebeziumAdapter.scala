package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium envelope → [[graft.cdc.ChangeEvent]] adapter.
  *
  * The reference tails MySQL binlog directly; in most modern stacks
  * the changelog is ALREADY on Kafka in Debezium's JSON envelope
  * (`{before, after, source:{db, table, gtid, ...}, op, ts_ms}`).
  * This adapter maps that payload column onto the engine's canonical
  * envelope so every downstream piece — routing, transforms,
  * compaction, sinks — runs unchanged on a Debezium feed.
  *
  * Pure narrow projection (`from_json` + column maps): fuses into
  * the scan/stream stage, no shuffle. Row images parse as
  * `Map[String,String]` — Spark's JSON reader stringifies scalar
  * values, which matches the engine's pre-routing contract (typed
  * casts happen per routed table, `Pipeline.routed`).
  *
  * Op mapping: c (create) and r (snapshot read) → insert, u →
  * update, d → delete — Debezium's documented op codes.
  *
  * @param seq monotone sequence expression for the engine's offset/
  *            compaction contract. For a Kafka feed the natural
  *            choice is the partition offset; for files, a line
  *            number. Debezium's own `source.sequence`/gtid strings
  *            are carried in `pos` for lineage but are not numeric.
  */
object DebeziumAdapter {

  val payloadSchema: StructType = StructType(Seq(
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("gtid", StringType),
      StructField("ts_ms", LongType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** @param onCorrupt same policy surface as the changelog source:
    *   `fail` (default) raises on unparseable payloads, non-envelope
    *   messages (tombstones, schema-change events) and UNKNOWN op
    *   codes (t=truncate, m=message — not DML; passing them through
    *   as upserts would write null-image rows into the target);
    *   `skip` drops them; `mark` emits `__corrupt__` events carrying
    *   the raw payload in `before["raw"]` for DLQ routing. A file
    *   feed and a Debezium feed must lose data the same (loud) way.
    */
  def fromJson(df: DataFrame, jsonCol: String, seq: Column,
      onCorrupt: String = "fail"): DataFrame = {
    val opMapped =
      when(col("__dbz.op").isin("c", "r"), graft.cdc.ChangeEvent.Insert)
        .when(col("__dbz.op") === "u", graft.cdc.ChangeEvent.Update)
        .when(col("__dbz.op") === "d", graft.cdc.ChangeEvent.Delete)
    val bad = col("__dbz").isNull || col("__dbz.source.db").isNull ||
      col("__dbz.source.table").isNull || opMapped.isNull
    val parsed = df.withColumn("__dbz", from_json(col(jsonCol), payloadSchema))
    val (policed, opCol, beforeCol, dbCol, tableCol) = EnvelopePolicy(
      parsed, jsonCol, "debezium", bad, opMapped, col("__dbz.before"),
      col("__dbz.source.db"), col("__dbz.source.table"), onCorrupt)
    policed.select(
      dbCol.as("db"),
      tableCol.as("table"),
      opCol.as("op"),
      timestamp_millis(coalesce(col("__dbz.ts_ms"),
        col("__dbz.source.ts_ms"))).as("ts"),
      col("__dbz.source.gtid").as("pos"),
      seq.cast("long").as("seq"),
      lit(0).as("tableVersion"),
      col("__dbz.after").as("after"),
      beforeCol.as("before"))
  }
}
