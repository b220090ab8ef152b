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
    val opMapped =
      when(col("__mxw.type").isin("insert", "bootstrap-insert"),
        graft.cdc.ChangeEvent.Insert)
        .when(col("__mxw.type") === "update", graft.cdc.ChangeEvent.Update)
        .when(col("__mxw.type") === "delete", graft.cdc.ChangeEvent.Delete)
    // a DML event without a row image is unusable — null pks would
    // compact under one key and upsert a garbage row (Maxwell always
    // emits `data` for DML, unlike Debezium where delete.after is
    // legitimately null)
    val bad = col("__mxw").isNull || col("__mxw.database").isNull ||
      col("__mxw.table").isNull || opMapped.isNull ||
      col("__mxw.data").isNull
    val parsed = df.withColumn("__mxw", from_json(col(jsonCol), payloadSchema))
      // bootstrap-start/complete markers always bracket a Maxwell
      // bootstrap: row-data-free CONTROL records, not corruption —
      // dropping them keeps onCorrupt=fail strict for real damage
      // (the same split CanalAdapter applies to DDL messages).
      // coalesce: unparseable JSON yields a struct of NULLs, and a
      // null `type` must stay (to be policed as corrupt), not be
      // swallowed by the three-valued isin
      .filter(not(coalesce(
        col("__mxw.type").isin("bootstrap-start", "bootstrap-complete"),
        lit(false))))
    val (policed, opCol, beforeCol, dbCol, tableCol) = EnvelopePolicy(
      parsed, jsonCol, "maxwell", bad, opMapped, col("__mxw.old"),
      col("__mxw.database"), col("__mxw.table"), onCorrupt)
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
