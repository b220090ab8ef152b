package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class ChangelogSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeLog(dir: String, name: String, events: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      events.mkString("\n").getBytes("UTF-8"))

  private def line(seq: Long, op: String, id: Int, k: Int,
      table: String = "t1"): String =
    s"""{"db":"db1","table":"$table","op":"$op","ts":${1700000000000L + seq},""" +
      s""""pos":"gtid:$seq","seq":$seq,"tableVersion":0,""" +
      s""""after":{"id":"$id","k":"$k"},"before":null}"""

  test("db/table equality filters are pushed into the scan") {
    val dir = Files.createTempDirectory("clog-push").toString
    writeLog(dir, "a.jsonl", Seq(
      line(0, "insert", 1, 10, table = "t1"),
      line(1, "insert", 2, 20, table = "t2"),
      line(2, "insert", 3, 30, table = "t1"),
      line(3, "insert", 4, 40, table = "t3")))
    val df = spark.read.format("graft-changelog").option("path", dir).load()
      .filter($"db" === "db1" && $"table" === "t1")
    // the scan's description advertises the pushed routing predicate
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[db=db1,table=t1]"), plan)
    // and results are correct (Spark re-applies the residual above)
    assert(df.select($"seq").as[Long].collect().sorted.toSeq == Seq(0L, 2L))
    // non-equality / other-column predicates still work, unpushed
    val other = spark.read.format("graft-changelog").option("path", dir).load()
      .filter($"op" === "insert" && $"seq" >= 2)
    assert(other.count() == 2)
  }

  test("onCorrupt=fail (default) stops on a corrupt line, with context") {
    val dir = Files.createTempDirectory("clog-corrupt-fail").toString
    writeLog(dir, "a.jsonl", Seq(
      line(0, "insert", 1, 10),
      """{"db":"db1","table":"t1","op":"insert","seq":1,"after":{BROKEN""",
      line(2, "insert", 3, 30)))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-changelog").option("path", dir).load().count()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("corrupt changelog line"), msg)
    assert(msg.contains("seq=1"), msg)
  }

  test("onCorrupt=skip drops corrupt lines, serves the rest") {
    val dir = Files.createTempDirectory("clog-corrupt-skip").toString
    writeLog(dir, "a.jsonl", Seq(
      line(0, "insert", 1, 10),
      """total garbage, not even json""",
      """{"db":"db1","table":"t1","op":"insert","seq":2,"after":{BROKEN""",
      line(3, "insert", 4, 40)))
    val df = spark.read.format("graft-changelog").option("path", dir)
      .option("onCorrupt", "skip").load()
    assert(df.select($"seq").as[Long].collect().sorted.toSeq == Seq(0L, 3L))
  }

  test("onCorrupt=mark emits a DLQ-routable __corrupt__ event") {
    val dir = Files.createTempDirectory("clog-corrupt-mark").toString
    val bad = """{"db":"db1","table":"t1","op":"insert","seq":1,"after":{BROKEN"""
    writeLog(dir, "a.jsonl", Seq(
      line(0, "insert", 1, 10), bad, line(2, "insert", 3, 30)))
    val df = spark.read.format("graft-changelog").option("path", dir)
      .option("onCorrupt", "mark").load()
    // exactly-once accounting intact: all three seqs served
    assert(df.select($"seq").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L))
    // the DLQ route is a plain filter on the same stream
    val dlq = df.filter($"op" === "__corrupt__").collect()
    assert(dlq.length == 1)
    assert(dlq(0).getAs[Long]("seq") == 1L)
    assert(dlq(0).getAs[Map[String, String]]("before")("raw") == bad)
    val good = df.filter($"op" =!= "__corrupt__")
    assert(good.count() == 2)
    // corrupt line whose seq is unrecoverable still fails under mark
    // (no deterministic offset-window position => no exactly-once)
    writeLog(dir, "b.jsonl", Seq("no seq here at all"))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-changelog").option("path", dir)
        .option("onCorrupt", "mark").load().count()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("unrecoverable seq"), msg)
  }

  test("corrupt tail lines do not break the offset watermark scan") {
    val dir = Files.createTempDirectory("clog-corrupt-stream").toString
    writeLog(dir, "a.jsonl", Seq(
      line(0, "insert", 1, 10),
      """{"db":"db1","table":"t1","op":"u","seq":1,"after":{BROKEN""",
      """beyond repair"""))
    // watermark scan degrades per line: parse -> regex -> ignore
    assert(ChangelogFiles.fileMaxSeq(dir + "/a.jsonl") == 1L)
    // and a stream in skip mode drains cleanly past both
    val q = spark.readStream.format("graft-changelog")
      .option("path", dir).option("onCorrupt", "skip").load()
      .writeStream.format("memory").queryName("corrupt_stream_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("corrupt_stream_out").select($"seq")
      .as[Long].collect().toSeq == Seq(0L))
  }

  test("pushed filters apply on the STREAMING path too") {
    val dir = Files.createTempDirectory("clog-push-stream").toString
    writeLog(dir, "a.jsonl", Seq(
      line(0, "insert", 1, 10, table = "t1"),
      line(1, "insert", 2, 20, table = "t2"),
      line(2, "insert", 3, 30, table = "t1")))
    val df = spark.readStream.format("graft-changelog")
      .option("path", dir).load()
      .filter($"db" === "db1" && $"table" === "t1")
    val q = df.writeStream.format("memory").queryName("push_stream_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val seqs = spark.table("push_stream_out").select($"seq")
      .as[Long].collect().sorted.toSeq
    assert(seqs == Seq(0L, 2L))
  }

  test("pushFilters accepts only db/table string equality") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
    val b = new ChangelogScanBuilder("/tmp/x", None, None)
    val fs: Array[org.apache.spark.sql.sources.Filter] = Array(
      EqualTo("db", "d"), EqualTo("table", "t"),
      EqualTo("op", "insert"), GreaterThan("seq", 5L))
    val residual = b.pushFilters(fs)
    assert(residual.toSeq == fs.toSeq, "everything must remain a residual")
    assert(b.pushedFilters().toSeq ==
      Seq(EqualTo("db", "d"), EqualTo("table", "t")))
  }

  test("batch read parses the envelope") {
    val dir = Files.createTempDirectory("clog").toString
    writeLog(dir, "a.jsonl", Seq(line(0, "insert", 1, 10),
      line(1, "update", 1, 11), line(2, "delete", 2, 0)))
    val df = spark.read.format("graft-changelog").option("path", dir).load()
    assert(df.count() == 3)
    val r = df.orderBy("seq")
      .select($"db", $"table", $"op", $"seq", $"pos", expr("after['k']"))
      .as[(String, String, String, Long, String, String)].collect()
    assert(r(0) == ("db1", "t1", "insert", 0L, "gtid:0", "10"))
    assert(r(2)._3 == "delete")
  }

  test("streaming: all events delivered once; offsets advance") {
    val dir = Files.createTempDirectory("clog").toString
    val ckpt = Files.createTempDirectory("clog-ckpt").toString
    writeLog(dir, "a.jsonl", (0 until 20).map(i => line(i, "insert", i, i)))

    val seen = collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-changelog")
      .option("path", dir).option("maxEventsPerTrigger", "7").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= b.select("seq").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect() }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(seen.sorted.toSeq == (0L until 20L), s"got $seen")

    // append more events, restart from checkpoint: only the new ones
    writeLog(dir, "b.jsonl", (20 until 25).map(i => line(i, "insert", i, i)))
    seen.clear()
    val q2 = spark.readStream.format("graft-changelog")
      .option("path", dir).option("maxEventsPerTrigger", "7").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= b.select("seq").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect() }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(seen.sorted.toSeq == (20L until 25L),
      s"checkpoint resume must not replay: $seen")
  }

  test("position bootstrap chain: startSeq override, latest, checkpoint priority") {
    val dir = Files.createTempDirectory("clog").toString
    writeLog(dir, "a.jsonl", (0 until 10).map(i => line(i, "insert", i, i)))

    def drain(ckpt: String, opts: Map[String, String]): Seq[Long] = {
      val seen = collection.mutable.ArrayBuffer.empty[Long]
      val r = spark.readStream.format("graft-changelog").option("path", dir)
      val q = opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("seq").as[Long](
            org.apache.spark.sql.Encoders.scalaLong).collect() }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      seen.sorted.toSeq
    }

    // 2. config startSeq: deploy mid-log, serve only seq > 5
    val ckptMid = Files.createTempDirectory("clog-ckpt").toString
    assert(drain(ckptMid, Map("startSeq" -> "5")) == (6L until 10L))

    // 3. startSeq=latest: nothing historical; only post-start appends
    val ckptLatest = Files.createTempDirectory("clog-ckpt").toString
    assert(drain(ckptLatest, Map("startSeq" -> "latest")).isEmpty)
    writeLog(dir, "b.jsonl", (10 until 12).map(i => line(i, "insert", i, i)))
    assert(drain(ckptLatest, Map("startSeq" -> "latest")) == (10L until 12L))

    // 1. checkpoint beats the config override on restart (≙ meta.db
    // position wins over start-gtid): a startSeq pointing backwards
    // must not replay already-served events
    assert(drain(ckptMid, Map("startSeq" -> "0")) == (10L until 12L))
  }

  test("maxEventsPerTrigger bounds each micro-batch (backpressure)") {
    val dir = Files.createTempDirectory("clog").toString
    val ckpt = Files.createTempDirectory("clog-ckpt").toString
    writeLog(dir, "a.jsonl", (0 until 10).map(i => line(i, "insert", i, i)))
    val sizes = collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-changelog")
      .option("path", dir).option("maxEventsPerTrigger", "4").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.synchronized { sizes += b.count() }; ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(sizes.forall(_ <= 4), s"batch sizes: $sizes")
    assert(sizes.sum == 10)
  }
}
