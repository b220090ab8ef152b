package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maxwell's-daemon envelope → [[graft.cdc.ChangeEvent]] adapter —
  * the third common MySQL CDC JSON wire format beside Debezium
  * ([[DebeziumAdapter]]) and Canal ([[CanalAdapter]]).
  *
  * Maxwell emits one flat JSON object per row event:
  * `{database, table, type, ts, xid, commit, position?, gtid?,
  * data:{...}, old:{...}}` — `ts` in SECONDS (Debezium uses ms),
  * `data` the full new row image, `old` ONLY the changed columns'
  * previous values (a partial before-image, unlike Debezium's full
  * one; carried as-is — changed-column extraction works directly,
  * full-before reconstruction would need `coalesce(old[c], data[c])`
  * per column downstream).
  *
  * Op mapping: insert → insert, bootstrap-insert → insert (Maxwell's
  * snapshot path, ≙ Debezium op=r), update → update, delete →
  * delete. Non-DML rows — bootstrap-start/complete markers, DDL
  * events from --output_ddl — fall under the same onCorrupt
  * fail/skip/mark policy as every other source: they must never pass
  * through as upserts.
  *
  * Pure narrow projection (from_json + maps), fuses into the scan
  * stage; same stringified-scalar pre-routing contract as the other
  * adapters (typed casts happen per routed table, Pipeline.routed).
  */
object MaxwellAdapter {

  val payloadSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("ts", LongType),
    StructField("position", StringType),
    StructField("gtid", StringType),
    StructField("data", MapType(StringType, StringType)),
    StructField("old", MapType(StringType, StringType))))

  /** @param seq monotone sequence for the offset/compaction contract
    *            (Kafka partition offset or file line number — same
    *            note as [[DebeziumAdapter.fromJson]])
    * @param onCorrupt fail (default) | skip | mark — identical
    *            semantics to the changelog source and the other
    *            adapters; mark emits `__corrupt__` events with the
    *            raw payload in `before["raw"]` */
  def fromJson(df: DataFrame, jsonCol: String, seq: Column,
      onCorrupt: String = "fail"): DataFrame = {
    require(Set("fail", "skip", "mark")(onCorrupt),
      s"onCorrupt must be fail|skip|mark, got '$onCorrupt'")
    val opMapped =
      when(col("__mxw.type").isin("insert", "bootstrap-insert"),
        graft.cdc.ChangeEvent.Insert)
        .when(col("__mxw.type") === "update", graft.cdc.ChangeEvent.Update)
        .when(col("__mxw.type") === "delete", graft.cdc.ChangeEvent.Delete)
    val bad = col("__mxw").isNull || col("__mxw.database").isNull ||
      col("__mxw.table").isNull || opMapped.isNull
    val parsed = df.withColumn("__mxw", from_json(col(jsonCol), payloadSchema))
    val policed = onCorrupt match {
      case "skip" => parsed.filter(!bad)
      case _ => parsed
    }
    val (opCol, beforeCol, dbCol, tableCol) = onCorrupt match {
      case "mark" => (
        when(bad, lit("__corrupt__")).otherwise(opMapped),
        when(bad, map(lit("raw"), col(jsonCol)))
          .otherwise(col("__mxw.old")),
        coalesce(col("__mxw.database"), lit("")),
        coalesce(col("__mxw.table"), lit("")))
      case "fail" => (
        when(bad, raise_error(concat(
          lit("corrupt/unsupported maxwell record "),
          lit("(set onCorrupt=skip|mark to continue): "),
          substring(col(jsonCol), 1, 120))).cast("string"))
          .otherwise(opMapped),
        col("__mxw.old"), col("__mxw.database"), col("__mxw.table"))
      case _ => (opMapped, col("__mxw.old"), col("__mxw.database"),
        col("__mxw.table"))
    }
    policed.select(
      dbCol.as("db"),
      tableCol.as("table"),
      opCol.as("op"),
      timestamp_seconds(col("__mxw.ts")).as("ts"),
      coalesce(col("__mxw.gtid"), col("__mxw.position")).as("pos"),
      seq.cast("long").as("seq"),
      lit(0).as("tableVersion"),
      col("__mxw.data").as("after"),
      beforeCol.as("before"))
  }
}
