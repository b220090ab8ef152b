package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.meta.SchemaRegistry
import graft.sinks.ParquetUpsertSink

/** FIXTURES A.3: the full 13-type table through the envelope →
  * routed cast → sink path, verifying every MySQL type decodes from
  * the string map into its Spark type. */
class TypesMixSpec extends SparkSpec {
  import spark.implicits._

  test("typesmix: all 13 reference types decode through the pipeline") {
    val registry = new SchemaRegistry
    registry.applySql(
      """CREATE TABLE typesmix (
        | tenant_id INT NOT NULL,
        | id BIGINT NOT NULL,
        | v_num TINYINT, v_year YEAR,
        | v_float FLOAT, v_double DOUBLE,
        | v_enum ENUM('a','b','c'), v_set SET('x','y'),
        | v_str VARCHAR(64), v_text TEXT,
        | v_dt DATETIME(3), v_ts TIMESTAMP(3),
        | v_date DATE,
        | v_bit BIT(8), v_json JSON,
        | v_dec DECIMAL(18,4), v_bin VARBINARY(32),
        | PRIMARY KEY (tenant_id, id))""".stripMargin, "db1")
    val t = registry.current("db1", "typesmix").get
    assert(t.pkColumns.map(_.name) == Seq("tenant_id", "id"))

    val logDir = Files.createTempDirectory("tm-log").toString
    val after =
      """{"tenant_id":"1","id":"10","v_num":"5","v_year":"2024",
        |"v_float":"1.5","v_double":"2.25","v_enum":"b","v_set":"x,y",
        |"v_str":"s","v_text":"t","v_dt":"2024-01-02 03:04:05.123",
        |"v_ts":"2024-01-02 03:04:05.123","v_date":"2024-01-02",
        |"v_bit":"1","v_json":"{\"a\":1}","v_dec":"12.3456",
        |"v_bin":"abc"}""".stripMargin.replaceAll("\n", "")
    Files.write(Paths.get(logDir, "s.jsonl"), Seq(
      s"""{"db":"db1","table":"typesmix","op":"insert","ts":1700000000000,"pos":"g:0","seq":0,"tableVersion":0,"after":$after,"before":null}"""
    ).mkString("\n").getBytes("UTF-8"))

    val sinkDir = Files.createTempDirectory("tm-sink").toString
    val ckpt = Files.createTempDirectory("tm-ckpt").toString
    val q = Pipeline.start(
      spark.readStream.format("graft-changelog").option("path", logDir).load(),
      Seq(Pipeline.Route("db1", "typesmix", t)),
      new ParquetUpsertSink(sinkDir), ckpt, trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    val out = spark.read.parquet(s"$sinkDir/db1.typesmix")
    val row = out.collect().head
    val schema = out.schema

    assert(schema("tenant_id").dataType.typeName == "integer")
    assert(schema("id").dataType.typeName == "long")
    assert(schema("v_num").dataType.typeName == "byte")
    assert(schema("v_year").dataType.typeName == "integer")
    assert(schema("v_float").dataType.typeName == "float")
    assert(schema("v_double").dataType.typeName == "double")
    assert(schema("v_dec").dataType.typeName == "decimal(18,4)")
    assert(schema("v_dt").dataType.typeName == "timestamp_ntz")
    assert(schema("v_ts").dataType.typeName == "timestamp")
    assert(schema("v_date").dataType.typeName == "date")
    assert(schema("v_bin").dataType.typeName == "binary")

    assert(row.getAs[Int]("tenant_id") == 1)
    assert(row.getAs[Byte]("v_num") == 5)
    assert(row.getAs[Float]("v_float") == 1.5f)
    assert(row.getAs[String]("v_enum") == "b")
    assert(row.getAs[java.math.BigDecimal]("v_dec")
      .compareTo(new java.math.BigDecimal("12.3456")) == 0)
    assert(row.getAs[java.sql.Date]("v_date").toString == "2024-01-02")
    assert(row.getAs[java.time.LocalDateTime]("v_dt").toString
      == "2024-01-02T03:04:05.123")
    assert(new String(row.getAs[Array[Byte]]("v_bin"), "UTF-8") == "abc")
    assert(row.getAs[String]("v_json") == """{"a":1}""")
  }
}
