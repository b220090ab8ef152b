package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canal envelope → [[graft.cdc.ChangeEvent]] adapter — the inverse
  * of `Formats.canalJson` (≙ the Aliyun-DTS-Canal format the
  * reference PRODUCES, `outputs/kafka/kafka_utils.go:116-256`).
  * A pipeline whose upstream already publishes Canal to Kafka plugs
  * in here and reuses routing/compaction/sinks unchanged; round-trip
  * with the engine's own formatter is spec-pinned, so producer and
  * consumer cannot drift.
  *
  * Canal batches rows (`data`/`old` are ARRAYS per message):
  * `posexplode` unbatches them, and the element index sub-orders the
  * engine seq (seq = id·batchCap + idx) so compaction sees the
  * within-message order. Narrow projection — no shuffle.
  */
object CanalAdapter {

  val payloadSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("gtid", ArrayType(StringType)),
    StructField("isDdl", BooleanType),
    StructField("type", StringType),
    StructField("es", LongType),
    StructField("data", ArrayType(MapType(StringType, StringType))),
    StructField("old", ArrayType(MapType(StringType, StringType)))))

  /** @param batchCap max rows per canal message (sub-order bound for
    *                  the derived seq). A message batching MORE rows
    *                  than this would produce seq values colliding
    *                  with the next message's range — compaction
    *                  could then pick a stale image — so it fails
    *                  loudly instead.
    * @param onCorrupt fail (default) | skip | mark — same policy
    *                  surface as the changelog source and
    *                  [[DebeziumAdapter]]: unparseable payloads and
    *                  envelopes without row images must not VANISH
    *                  from an exactly-once stream (posexplode of a
    *                  null data array silently deletes the row
    *                  otherwise). DDL messages are intentionally
    *                  excluded (they go to the schema path). */
  def fromJson(df: DataFrame, jsonCol: String, batchCap: Int = 4096,
      onCorrupt: String = "fail"): DataFrame = {
    require(Set("fail", "skip", "mark")(onCorrupt),
      s"onCorrupt must be fail|skip|mark, got '$onCorrupt'")
    val parsed = df.withColumn("__c", from_json(col(jsonCol), payloadSchema))
    val isDdl = coalesce(col("__c.isDdl"), lit(false))
    val bad = !isDdl && (col("__c").isNull || col("__c.data").isNull ||
      col("__c.database").isNull || col("__c.type").isNull)
    val policed = onCorrupt match {
      case "skip" => parsed.filter(!bad)
      case "fail" => parsed.withColumn("__c",
        when(bad, raise_error(concat(
          lit("corrupt canal record (set onCorrupt=skip|mark to "),
          lit("continue): "), substring(col(jsonCol), 1, 120)))
          .cast(payloadSchema)).otherwise(col("__c")))
      case _ => parsed.withColumn("__c", when(bad,
        // mark: synthesize a one-row DML envelope carrying the raw
        // payload; id/seq fall back to 0 (callers DLQ-route on op)
        struct(coalesce(col("__c.id"), lit(0L)).as("id"),
          lit("").as("database"), lit("").as("table"),
          array().cast("array<string>").as("gtid"),
          lit(false).as("isDdl"), lit("__corrupt__").as("type"),
          lit(null).cast("long").as("es"),
          array(map(lit("raw"), col(jsonCol))).as("data"),
          lit(null).cast("array<map<string,string>>").as("old")))
        .otherwise(col("__c")))
    }
    policed
      // DDL messages carry no row images — they go to the schema
      // path, not the DML stream
      .filter(!coalesce(col("__c.isDdl"), lit(false)))
      .select(col("__c"), posexplode(col("__c.data")))
      .select(
        col("__c.database").as("db"),
        col("__c.table").as("table"),
        when(col("__c.type") === "__corrupt__", col("__c.type"))
          .otherwise(lower(col("__c.type"))).as("op"),
        timestamp_millis(col("__c.es")).as("ts"),
        // try_: the mark-mode corrupt envelope has an EMPTY gtid array
        // and ANSI element_at throws on out-of-bounds
        try_element_at(col("__c.gtid"), lit(1)).as("pos"),
        when(col("pos") < batchCap, col("__c.id") * batchCap + col("pos"))
          .otherwise(raise_error(concat(
            lit(s"canal message batches more than batchCap=$batchCap "),
            lit("rows; raise batchCap (seq ranges would collide)")))
            .cast("long")).as("seq"),
        lit(0).as("tableVersion"),
        col("col").as("after"),
        try_element_at(col("__c.old"), col("pos") + 1).as("before"))
  }
}
