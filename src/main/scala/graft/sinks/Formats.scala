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
  def streamLoadJson(batch: DataFrame, t: TableDef): DataFrame = {
    val dataCols = t.columnNames.map(col)
    batch
      .withColumn("_delete_sign_", Transforms.deleteSign(col("op")))
      .select(to_json(struct(dataCols :+ col("_delete_sign_"): _*)).as("row_json"))
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
  def kafkaJson(envelope: DataFrame): DataFrame =
    envelope.select(
      to_json(struct(
        col("db").as("database"),
        col("table"),
        col("op").as("type"),
        unix_timestamp(col("ts")).as("ts"),
        col("after").as("data"),
        col("before").as("old"))).as("value"))

  /** JDBC type codes for the canal envelope, from the table's raw
    * MySQL types (≙ the sqlType map in
    * `outputs/kafka/kafka_utils.go:116-256`). */
  def jdbcTypeCode(rawType: String): Int = {
    val base = rawType.toLowerCase.takeWhile(c => c.isLetter)
    base match {
      case "tinyint" => -6
      case "smallint" => 5
      case "mediumint" | "int" | "integer" | "year" => 4
      case "bigint" => -5
      case "float" => 7
      case "double" | "real" => 8
      case "decimal" | "numeric" => 3
      case "char" => 1
      case "varchar" | "enum" | "set" | "json" => 12
      case "text" | "tinytext" | "mediumtext" | "longtext" => 2005
      case "date" => 91
      case "time" => 92
      case "datetime" | "timestamp" => 93
      case "bit" => -7
      case "binary" => -2
      case "varbinary" | "blob" | "tinyblob" | "mediumblob" | "longblob" => -3
      case _ => 12
    }
  }

  /** Aliyun-DTS-Canal envelope ≙ `aliyunDtsCanalFormat.formatMsg`
    * (`outputs/kafka/kafka_utils.go:116-256`): stringified row data,
    * per-column sqlType/mysqlType, pkNames, monotone id.
    * `emitTsMs` defaults to wall-clock (reference behavior); inject a
    * deterministic column for replayable/oracle-checked output. */
  def canalJson(envelope: DataFrame, t: TableDef,
      emitTsMs: Column = unix_timestamp(current_timestamp()) * 1000): DataFrame = {
    val sqlTypes = map(t.columns.flatMap(c =>
      Seq(lit(c.name), lit(jdbcTypeCode(c.rawType)))): _*)
    val mysqlTypes = map(t.columns.flatMap(c =>
      Seq(lit(c.name), lit(c.rawType))): _*)
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
        sqlTypes.as("sqlType"),
        mysqlTypes.as("mysqlType"),
        array(col("after")).as("data"),
        array(col("before")).as("old"))).as("value"))
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
