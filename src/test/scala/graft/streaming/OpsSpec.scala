package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.meta.{ColumnDef, TableDef}
import graft.sinks.ParquetUpsertSink

/** Backfill + metrics + registry (SURVEY §2 #29-31 and the snapshot
  * gap row). */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val target = TableDef("db1", "t1", Seq(
    ColumnDef("id", "bigint", isPrimaryKey = true),
    ColumnDef("k", "int"),
    ColumnDef("c", "varchar(120)")))

  test("backfill snapshot then stream: CDC events win over snapshot rows") {
    val sinkDir = Files.createTempDirectory("bf-sink").toString
    val logDir = Files.createTempDirectory("bf-log").toString
    val ckpt = Files.createTempDirectory("bf-ckpt").toString
    val sink = new ParquetUpsertSink(sinkDir)

    // snapshot: ids 1..3
    val snapshot = Seq((1L, 10, "a"), (2L, 20, "b"), (3L, 30, "c"))
      .toDF("id", "k", "c")
    Backfill.run(spark, Map(target -> snapshot), sink)
    val afterSnap = spark.read.parquet(s"$sinkDir/db1.t1")
    assert(afterSnap.count() == 3)

    // live CDC: update id 2, delete id 3, insert id 4
    Files.write(Paths.get(logDir, "s.jsonl"), Seq(
      s"""{"db":"db1","table":"t1","op":"update","ts":1700000000000,"pos":"g:0","seq":0,"tableVersion":0,"after":{"id":"2","k":"21","c":"b2"},"before":null}""",
      s"""{"db":"db1","table":"t1","op":"delete","ts":1700000001000,"pos":"g:1","seq":1,"tableVersion":0,"after":{"id":"3","k":"0","c":""},"before":null}""",
      s"""{"db":"db1","table":"t1","op":"insert","ts":1700000002000,"pos":"g:2","seq":2,"tableVersion":0,"after":{"id":"4","k":"40","c":"d"},"before":null}"""
    ).mkString("\n").getBytes("UTF-8"))

    val env = Registry.source("changelog", spark, Map("path" -> logDir))
    val q = Pipeline.start(env, Seq(Pipeline.Route("db1", "t1", target)),
      sink, ckpt, trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    val state = spark.read.parquet(s"$sinkDir/db1.t1")
      .select($"id", $"k", $"c").as[(Long, Int, String)].collect().sortBy(_._1)
    assert(state.toSeq ==
      Seq((1L, 10, "a"), (2L, 21, "b2"), (4L, 40, "d")))
  }

  test("metrics: observe + listener count rows and deletes per batch") {
    val logDir = Files.createTempDirectory("m-log").toString
    val ckpt = Files.createTempDirectory("m-ckpt").toString
    val sinkDir = Files.createTempDirectory("m-sink").toString
    Files.write(Paths.get(logDir, "s.jsonl"), (0 until 10).map { i =>
      val op = if (i % 5 == 0) "delete" else "insert"
      s"""{"db":"db1","table":"t1","op":"$op","ts":${1700000000000L + i},"pos":"g:$i","seq":$i,"tableVersion":0,"after":{"id":"$i","k":"$i","c":"x"},"before":null}"""
    }.mkString("\n").getBytes("UTF-8"))

    val collector = new Metrics.Collector
    spark.streams.addListener(collector)
    try {
      val env = Metrics.observed(
        Registry.source("changelog", spark, Map("path" -> logDir)))
      val q = Pipeline.start(env, Seq(Pipeline.Route("db1", "t1", target)),
        new ParquetUpsertSink(sinkDir), ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
      // listener events are async; wait for delivery
      var tries = 0
      while (collector.rowsRead.sum() < 10 && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val snap = collector.snapshot
      assert(snap("rows_read_total") == 10L)
      assert(snap("deletes_read_total") == 2L)
      assert(collector.batches.sum() >= 1L)
      // read delay = wall clock - newest event ts (fixture events sit
      // at 2023-11, so the gauge is large and positive); write delay
      // gauge picked up the sink's addBatch duration
      assert(snap("read_delay_time_seconds").asInstanceOf[Double] > 0.0)
      assert(snap("write_delay_time_seconds").asInstanceOf[Double] >= 0.0)
    } finally spark.streams.removeListener(collector)
  }

  test("metrics HTTP endpoint serves Prometheus text format (≙ :7716/metrics)") {
    val collector = new Metrics.Collector
    collector.rowsRead.add(42)
    collector.deletesRead.add(7)
    collector.batches.increment()
    val http = MetricsHttp.start(collector, port = 0) // free port
    try {
      def get(path: String): (Int, String) = {
        val conn = new java.net.URL(s"http://127.0.0.1:${http.port}$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val body =
          if (code == 200)
            new String(conn.getInputStream.readAllBytes(), "UTF-8")
          else ""
        conn.disconnect()
        (code, body)
      }
      val (code, body) = get("/metrics")
      assert(code == 200)
      assert(body.contains("# TYPE graft_rows_read_total counter"))
      assert(body.contains("graft_rows_read_total 42"))
      assert(body.contains("graft_deletes_read_total 7"))
      assert(body.contains("graft_batches_total 1"))
      assert(body.contains("graft_last_input_rows_per_second 0.0"))
      // non-metrics paths 404 (the reference's REST API is no-op stubs)
      assert(get("/api/addRouter")._1 == 404)
    } finally http.stop()
  }

  test("registry: unknown names fail, built-ins resolve") {
    assert(Registry.sinkNames.contains("parquet-upsert"))
    assert(Registry.sourceNames.contains("changelog"))
    intercept[IllegalArgumentException] { Registry.sink("nope", Map.empty) }
  }
}
