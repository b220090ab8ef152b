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
    *                 the derived seq) */
  def fromJson(df: DataFrame, jsonCol: String,
      batchCap: Int = 4096): DataFrame =
    df.withColumn("__c", from_json(col(jsonCol), payloadSchema))
      // DDL messages carry no row images — they go to the schema
      // path, not the DML stream
      .filter(!coalesce(col("__c.isDdl"), lit(false)))
      .select(col("__c"), posexplode(col("__c.data")))
      .select(
        col("__c.database").as("db"),
        col("__c.table").as("table"),
        lower(col("__c.type")).as("op"),
        timestamp_millis(col("__c.es")).as("ts"),
        element_at(col("__c.gtid"), 1).as("pos"),
        (col("__c.id") * batchCap + col("pos")).as("seq"),
        lit(0).as("tableVersion"),
        col("col").as("after"),
        element_at(col("__c.old"), col("pos") + 1).as("before"))
}
