package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.TableDef
import graft.operators.Transforms

/** Row→payload formatting for the HTTP stream-load and Kafka sinks,
  * as declarative column expressions (codegen'd `to_json`, no
  * per-row driver code).
  */
object Formats {

  /** StarRocks/Doris stream-load JSON rows: data columns plus the
    * `_delete_sign_` 0/1 virtual column for primary-key-model loads
    * (≙ `outputs/starrocks/starrocks_utils.go:39-69`,
    * `outputs/doris/doris_utils.go:42-72`). Input: a routed, typed,
    * compacted batch with an `op` column. */
  def streamLoadJson(batch: DataFrame, t: TableDef,
      keep: Seq[Column] = Nil): DataFrame = {
    val dataCols = t.columnNames.map(col)
    batch
      .withColumn("_delete_sign_", Transforms.deleteSign(col("op")))
      .select(to_json(struct(dataCols :+ col("_delete_sign_"): _*))
        .as("row_json") +: keep: _*)
  }

  /** Stream-load HTTP headers ≙ `outputs/starrocks/starrocks.go:
    * 163-183` / `outputs/doris/doris.go:163-188`. */
  def streamLoadHeaders(t: TableDef, doris: Boolean): Map[String, String] = {
    val base = Map(
      "format" -> "json",
      "strip_outer_array" -> "true",
      "strict_mode" -> "true",
      "Expect" -> "100-continue",
      "columns" -> (t.columnNames :+ "_delete_sign_").mkString(","))
    if (doris) base ++ Map("merge_type" -> "MERGE",
      "delete" -> "_delete_sign_=1", "merge" -> "_delete_sign_=0")
    else base
  }

  /** Kafka `json` format ≙ `outputs/kafka/kafka_utils.go:75-94`:
    * {database, table, type, ts, data, old}. Operates on the generic
    * envelope stream. */
  def kafkaJson(envelope: DataFrame, keep: Seq[Column] = Nil): DataFrame =
    envelope.select(
      to_json(struct(
        col("db").as("database"),
        col("table"),
        col("op").as("type"),
        unix_timestamp(col("ts")).as("ts"),
        col("after").as("data"),
        col("before").as("old"))).as("value") +: keep: _*)

  /** Debezium-style change envelope — the other de-facto-standard
    * CDC JSON shape next to Canal (public format, debezium.io MySQL
    * connector docs): {before, after, source{connector, db, table,
    * pos}, op, ts_ms} with op codes c(reate)/u(pdate)/d(elete)/
    * r(ead). A create has `before: null`, a delete `after: null` —
    * and those nulls are EMITTED (`ignoreNullFields` off): Debezium
    * consumers distinguish "no before image" (JSON null) from an
    * absent field. Operates on the same generic envelope stream as
    * [[kafkaJson]]; `op` holds the engine's insert/update/delete
    * verbs and is transcoded here. */
  def debeziumJson(envelope: DataFrame, keep: Seq[Column] = Nil): DataFrame = {
    val opCode = when(col("op") === "insert", "c")
      .when(col("op") === "update", "u")
      .when(col("op") === "delete", "d")
      .otherwise("r")
    envelope.select(
      to_json(
        struct(
          when(opCode === "c", lit(null)).otherwise(col("before"))
            .as("before"),
          when(opCode === "d", lit(null)).otherwise(col("after"))
            .as("after"),
          struct(lit("graft").as("connector"), col("db"), col("table"),
            col("pos")).as("source"),
          opCode.as("op"),
          (unix_timestamp(col("ts")) * 1000L).as("ts_ms")),
        Map("ignoreNullFields" -> "false")).as("value") +: keep: _*)
  }

  /** Canal-envelope type code + normalized mysqlType name, matching
    * the reference's Aliyun/MySQL-protocol table EXACTLY
    * (`outputs/kafka/kafka_utils.go:128-230`): tinyint 1, smallint 2,
    * int 3, float 4, double 5, timestamp 7, bigint 8, mediumint 9,
    * date 10, time 11, datetime 12, *text 15, bit 16, json 245,
    * decimal 246, enum 247, set 248, binary/blob 252, varchar 253,
    * char 254. `year` has NO sqlType entry in the reference (the map
    * key is simply absent) — modeled as None here. A consumer decoding
    * against the reference's envelope reads these codes, so JDBC
    * java.sql.Types values (round 1) were a wrong-output bug. */
  def canalType(rawType: String): (Option[Int], String) = {
    val base = rawType.toLowerCase.takeWhile(c => c.isLetter)
    base match {
      case "tinyint" => (Some(1), "tinyint")
      case "smallint" => (Some(2), "smallint")
      case "mediumint" => (Some(9), "mediumint")
      case "bigint" => (Some(8), "bigint")
      case "int" | "integer" => (Some(3), "int")
      case "year" => (None, "year")
      case "float" => (Some(4), "float")
      case "double" | "real" => (Some(5), "double")
      case "enum" => (Some(247), "enum")
      case "set" => (Some(248), "set")
      case t if t.endsWith("text") => (Some(15), "text")
      case "char" => (Some(254), "char")
      case "datetime" => (Some(12), "datetime")
      case "timestamp" => (Some(7), "timestamp")
      case "date" => (Some(10), "date")
      case "time" => (Some(11), "time")
      case "bit" => (Some(16), "bit")
      case "json" => (Some(245), "json")
      case "decimal" | "numeric" => (Some(246), "decimal")
      case "binary" => (Some(252), "binary")
      case t if t.endsWith("blob") || t == "varbinary" => (Some(252), "blob")
      // reference TypeString fallthrough: varchar 253
      case _ => (Some(253), "varchar")
    }
  }

  /** Aliyun-DTS-Canal envelope ≙ `aliyunDtsCanalFormat.formatMsg`
    * (`outputs/kafka/kafka_utils.go:116-256`): stringified row data,
    * per-column sqlType/mysqlType, pkNames, monotone id.
    * `emitTsMs` defaults to wall-clock (reference behavior); inject a
    * deterministic column for replayable/oracle-checked output. */
  def canalJson(envelope: DataFrame, t: TableDef,
      emitTsMs: Column = unix_timestamp(current_timestamp()) * 1000,
      keep: Seq[Column] = Nil): DataFrame = {
    // year columns are omitted from sqlType (reference parity); every
    // column appears in mysqlType with its normalized base name.
    val sqlTypes = map(t.columns.flatMap { c =>
      canalType(c.rawType)._1.toSeq.flatMap(code => Seq(lit(c.name), lit(code)))
    }: _*)
    val mysqlTypes = map(t.columns.flatMap(c =>
      Seq(lit(c.name), lit(canalType(c.rawType)._2))): _*)
    val pkNames = array(t.pkColumns.map(c => lit(c.name)): _*)
    envelope.select(
      to_json(struct(
        col("seq").as("id"),
        col("db").as("database"),
        col("table"),
        array(col("pos")).as("gtid"),
        pkNames.as("pkNames"),
        lit(false).as("isDdl"),
        upper(col("op")).as("type"),
        (unix_timestamp(col("ts")) * 1000).as("es"),
        emitTsMs.as("ts"),
        lit("").as("sql"),
        lit("").as("serverId"),
        sqlTypes.as("sqlType"),
        mysqlTypes.as("mysqlType"),
        array(col("after")).as("data"),
        array(col("before")).as("old"))).as("value") +: keep: _*)
  }

  /** Kafka record key + partition from the PK hash
    * (≙ `outputs/kafka/kafka.go:161-170`: partition = hash %
    * partitionNum, key = decimal string of the hash). xxhash64 is
    * Spark-native codegen; distribution-equivalent to the
    * reference's Go hashstructure (values differ — non-parity
    * documented, only placement uniformity matters). */
  def withKafkaKey(envelope: DataFrame, t: TableDef, numPartitions: Int): DataFrame = {
    val pkVals = t.pkColumns.map(c => col("after").getItem(c.name))
    val h = abs(xxhash64(pkVals: _*))
    envelope
      .withColumn("key", h.cast(StringType))
      .withColumn("partition", pmod(h, lit(numPartitions)).cast(IntegerType))
  }
}
