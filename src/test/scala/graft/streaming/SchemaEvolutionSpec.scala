package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.meta.SchemaRegistry
import graft.sinks.ParquetUpsertSink

/** Runtime schema evolution end-to-end: DDL arrives IN the
  * changelog, old- and new-version DML decode through their pinned
  * schemas, the sink sees the evolved shape. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def dml(seq: Long, ver: Int, after: String): String =
    s"""{"db":"db1","table":"t1","op":"insert","ts":${1700000000000L + seq},""" +
      s""""pos":"g:$seq","seq":$seq,"tableVersion":$ver,"after":$after,"before":null}"""

  private def ddl(seq: Long, sql: String): String =
    s"""{"db":"db1","table":"t1","op":"ddl","ts":${1700000000000L + seq},""" +
      s""""pos":"g:$seq","seq":$seq,"tableVersion":0,"after":{"sql":"$sql"},"before":null}"""

  test("DDL in-stream: add column mid-batch, version-pinned decode") {
    val registry = new SchemaRegistry
    registry.applySql("CREATE TABLE t1 (id BIGINT PRIMARY KEY, k INT)", "db1")

    val logDir = Files.createTempDirectory("evo-log").toString
    val sinkDir = Files.createTempDirectory("evo-sink").toString
    val ckpt = Files.createTempDirectory("evo-ckpt").toString
    Files.write(Paths.get(logDir, "s.jsonl"), Seq(
      dml(0, 0, """{"id":"1","k":"10"}"""),
      ddl(1, "ALTER TABLE t1 ADD COLUMN c VARCHAR(20)"),
      dml(2, 1, """{"id":"2","k":"20","c":"new"}"""),
      // a v0 straggler after the DDL (in-flight event): decodes with
      // its pinned v0 schema, new column null-filled
      dml(3, 0, """{"id":"3","k":"30"}""")
    ).mkString("\n").getBytes("UTF-8"))

    val sink = new ParquetUpsertSink(sinkDir)
    val q = spark.readStream.format("graft-changelog")
      .option("path", logDir).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        SchemaEvolution.processBatch(b, registry, Seq("db1" -> "t1"), sink, id)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    assert(registry.current("db1", "t1").get.columnNames == Seq("id", "k", "c"))
    assert(registry.current("db1", "t1").get.version == 1)

    val state = spark.read.parquet(s"$sinkDir/db1.t1")
      .select($"id", $"k", $"c").as[(Long, Int, Option[String])]
      .collect().sortBy(_._1)
    assert(state.toSeq == Seq(
      (1L, 10, None), (2L, 20, Some("new")), (3L, 30, None)))
  }

  test("rename column via DDL changes subsequent decode") {
    val registry = new SchemaRegistry
    registry.applySql("CREATE TABLE t1 (id BIGINT PRIMARY KEY, k INT)", "db1")

    val logDir = Files.createTempDirectory("evo2-log").toString
    val sinkDir = Files.createTempDirectory("evo2-sink").toString
    val ckpt = Files.createTempDirectory("evo2-ckpt").toString
    Files.write(Paths.get(logDir, "s.jsonl"), Seq(
      dml(0, 0, """{"id":"1","k":"10"}"""),
      ddl(1, "ALTER TABLE t1 RENAME COLUMN k TO k9"),
      dml(2, 1, """{"id":"2","k9":"20"}""")
    ).mkString("\n").getBytes("UTF-8"))

    val sink = new ParquetUpsertSink(sinkDir)
    val q = spark.readStream.format("graft-changelog")
      .option("path", logDir).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        SchemaEvolution.processBatch(b, registry, Seq("db1" -> "t1"), sink, id)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val state = spark.read.parquet(s"$sinkDir/db1.t1")
      .select($"id", $"k9").as[(Long, Option[Int])].collect().sortBy(_._1)
    // rename lineage: the v0 row's `k` value lands under `k9` — the
    // same physical column, not a null-out
    assert(state.toSeq == Seq((1L, Some(10)), (2L, Some(20))))
  }

  test("replayed batch does not re-apply DDL (at-least-once idempotence)") {
    val registry = new SchemaRegistry
    registry.applySql("CREATE TABLE t1 (id BIGINT PRIMARY KEY, k INT)", "db1")
    val batch = Seq(
      ("db1", "t1", "ddl", new java.sql.Timestamp(0L), "g:1", 1L, 0,
        Map("sql" -> "ALTER TABLE t1 ADD COLUMN c VARCHAR(10)"),
        null.asInstanceOf[Map[String, String]])
    ).toDF("db", "table", "op", "ts", "pos", "seq", "tableVersion",
      "after", "before")
    assert(SchemaEvolution.applyDdl(batch, registry) == 1)
    assert(registry.current("db1", "t1").get.version == 1)
    // replay the same batch: no new version
    assert(SchemaEvolution.applyDdl(batch, registry) == 0)
    assert(registry.current("db1", "t1").get.version == 1)
  }
}
