package graft.cdc

import org.apache.spark.sql.types._

/** Canonical changelog envelope ≙ `core/msg.go:31-53` (see SURVEY
  * §1.1 / FIXTURES A.1). The generic pre-routing stream keeps row
  * images as Map[String,String]; per-table routed paths project the
  * map onto the table's StructType (strong typing + Tungsten layout).
  *
  * `seq` is the engine's addition: a monotone per-stream sequence
  * (binlog file/pos or source offset) that makes batch compaction
  * order-free (SURVEY §7.5.1). `pos` carries the GTID-set watermark
  * (≙ MsgCtl, `inputs/mysql/msg.go:76-84`).
  */
final case class ChangeEvent(
    db: String,
    table: String,
    op: String,                    // insert | update | delete | replace
    ts: java.sql.Timestamp,
    pos: String,                   // GTID-set watermark
    seq: Long,                     // monotone source sequence
    tableVersion: Int,
    after: Map[String, String],    // row image (null for none)
    before: Map[String, String])   // pre-image, updates only

object ChangeEvent {
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  val Replace = "replace"

  val schema: StructType = StructType(Seq(
    StructField("db", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts", TimestampType),
    StructField("pos", StringType),
    StructField("seq", LongType, nullable = false),
    StructField("tableVersion", IntegerType, nullable = false),
    StructField("after", MapType(StringType, StringType)),
    StructField("before", MapType(StringType, StringType))))
}
