package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("streamingDedup suppresses replayed ids within the watermark") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val deduped = StatefulOps.streamingDedup(
      mem.toDF().toDF("id", "ts"), Seq("id"), "ts", "10 minutes")
    val t0 = 1700000000000L
    mem.addData((1L, new Timestamp(t0)), (1L, new Timestamp(t0 + 1000)),
      (2L, new Timestamp(t0 + 2000)), (2L, new Timestamp(t0 + 3000)),
      (3L, new Timestamp(t0 + 4000)))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_out").select($"id").as[Long]
      .collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("topk_largest runs as a streaming aggregate (update mode)") {
    // the custom TypedImperativeAggregate must compose with
    // Structured Streaming: partial heaps live in the state store and
    // merge across micro-batches exactly as they merge across tasks
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val agg = mem.toDF().toDF("g", "v")
      .groupBy($"g")
      .agg(org.apache.spark.sql.functions.expr("topk_largest(v, 3)").as("top"))
    val q = agg.writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    mem.addData(("a", 1.0), ("a", 5.0), ("b", 2.0))
    q.processAllAvailable()
    // second batch: the heap state must carry over, not reset
    mem.addData(("a", 9.0), ("a", 3.0), ("a", 0.5), ("b", 7.0))
    q.processAllAvailable(); q.stop()
    // memory sink in update mode appends updated rows; last row per
    // group is the current state
    val rows = spark.table("topk_out").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq)
    val last = rows.zipWithIndex.groupBy(_._1._1).view
      .mapValues(_.maxBy(_._2)._1._2).toMap
    assert(last == Map("a" -> Seq(9.0, 5.0, 3.0), "b" -> Seq(7.0, 2.0)))
  }

  test("windowedCounts groups by event-time tumbling window") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val counts = StatefulOps.windowedCounts(
      mem.toDF().toDF("kind", "ts"), "ts", "kind", "1 hour", "1 minute")
    val q = counts.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    val h0 = 1700000000000L - (1700000000000L % 3600000L)
    mem.addData(
      ("a", new Timestamp(h0 + 60000)), ("a", new Timestamp(h0 + 120000)),
      ("b", new Timestamp(h0 + 60000)),
      ("a", new Timestamp(h0 + 3600000 + 60000)))
    q.processAllAvailable(); q.stop()
    val out = spark.table("win_out")
      .select($"win_start", $"kind", $"n")
      .as[(Timestamp, String, Long)].collect()
      .map { case (w, k, n) => (w.getTime, k, n) }.toSet
    assert(out == Set((h0, "a", 2L), (h0, "b", 1L),
      (h0 + 3600000L, "a", 1L)))
  }

  test("sessionWindowCounts merges events into gap-based sessions") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sess = StatefulOps.sessionWindowCounts(
      mem.toDF().toDF("user_id", "ts"), "ts", "user_id",
      gap = "10 minutes", delay = "1 minute")
    val q = sess.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    val t0 = 1700000000000L
    // user 1: two events 5 min apart (one session), then one 30 min
    // later (second session); user 2: one event
    mem.addData((1L, new Timestamp(t0)), (1L, new Timestamp(t0 + 300000)),
      (1L, new Timestamp(t0 + 2100000)), (2L, new Timestamp(t0)))
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess_out")
      .select($"user_id", $"n_events").as[(Long, Long)]
      .collect().sorted.toSeq
    assert(out == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("intervalJoin pairs events within the bound, drops outside it") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val t0 = 1700000000000L
    val joined = StatefulOps.intervalJoin(
      imps.toDF().toDF("user_id", "ts"),
      clicks.toDF().toDF("user_id", "cts"),
      Seq("user_id"), "ts", "cts", "1 minute",
      before = "0 seconds", after = "10 seconds")
    // user 1: click 5s after impression (match); user 2: click 30s
    // after (outside bound); user 3: click 2s BEFORE (outside bound)
    imps.addData((1L, new Timestamp(t0)), (2L, new Timestamp(t0)),
      (3L, new Timestamp(t0)))
    clicks.addData((1L, new Timestamp(t0 + 5000)),
      (2L, new Timestamp(t0 + 30000)), (3L, new Timestamp(t0 - 2000)))
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("ij_out").select($"user_id").as[Long]
      .collect().toSeq
    assert(out == Seq(1L))
  }

  test("late data beyond the watermark is dropped from windowed aggs") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val counts = StatefulOps.windowedCounts(
      mem.toDF().toDF("kind", "ts"), "ts", "kind", "1 hour", "10 minutes")
    // append mode: a window only emits once the watermark passes its
    // end — the mode where lateness actually drops rows
    val q = counts.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    val h0 = 1700000000000L - (1700000000000L % 3600000L)
    // batch 1: two on-time events in hour h0
    mem.addData(("a", new Timestamp(h0 + 60000)),
      ("a", new Timestamp(h0 + 120000)))
    q.processAllAvailable()
    // batch 2: advance the watermark far past h0 (event at h0+3h)
    mem.addData(("b", new Timestamp(h0 + 3 * 3600000L + 60000)))
    q.processAllAvailable()
    // batch 3: a LATE event for the already-closed h0 window — must
    // NOT resurrect or change it
    mem.addData(("a", new Timestamp(h0 + 180000)))
    q.processAllAvailable()
    // batch 4: advance watermark past the h0+3h window so b emits too
    mem.addData(("c", new Timestamp(h0 + 6 * 3600000L)))
    q.processAllAvailable(); q.stop()
    val out = spark.table("late_out")
      .select($"win_start", $"kind", $"n")
      .as[(Timestamp, String, Long)].collect()
      .map { case (w, k, n) => (w.getTime, k, n) }.toSet
    // h0/a emitted with 2 (the late third event dropped, not merged)
    assert(out.contains((h0, "a", 2L)))
    assert(!out.contains((h0, "a", 3L)))
    assert(out.contains((h0 + 3 * 3600000L, "b", 1L)))
  }

  test("streaming NEAR-dup suppression: dedup on the simhash column") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val t0 = 1700000000000L
    // near-identical docs share a 16-bit simhash; dedup keys on it
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog", new Timestamp(t0)),
      (2L, "the quick brown fox jumps over the lazy dog", new Timestamp(t0 + 1000)),
      (3L, "completely different text about spark engines", new Timestamp(t0 + 2000)))
    val docs = mem.toDF().toDF("id", "text", "ts")
    // batch-compute simhash per micro-batch via the same operator the
    // batch path uses, keyed inside streamingDedup
    val withSim = docs.withColumn("fp",
      org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.lower($"text")))
    val deduped = StatefulOps.streamingDedup(withSim, Seq("fp"), "ts", "1 hour")
    val q = deduped.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("neardup_out").select($"id").as[Long]
      .collect().sorted.toSeq
    assert(ids == Seq(1L, 3L))
  }

  test("streamingDedup runs on the RocksDB state store (the 100 TB state path)") {
    // the in-memory (HDFS-backed) provider holds state on-heap; at
    // 100 TB stream state must spill off-heap — prove the same
    // operator runs unmodified on RocksDB, checkpointed and resumed
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("rocks-ckpt").toString
      val mem = MemoryStream[(Long, Timestamp)]
      val deduped = StatefulOps.streamingDedup(
        mem.toDF().toDF("id", "ts"), Seq("id"), "ts", "10 minutes")
      val t0 = 1700000000000L
      mem.addData((1L, new Timestamp(t0)), (1L, new Timestamp(t0 + 1000)),
        (2L, new Timestamp(t0 + 2000)))
      val q = deduped.writeStream.format("memory").queryName("rocks_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      // state survives across micro-batches in RocksDB: a replay of id
      // 1 in a LATER batch is still suppressed
      mem.addData((1L, new Timestamp(t0 + 3000)), (3L, new Timestamp(t0 + 4000)))
      q.processAllAvailable(); q.stop()
      val ids = spark.table("rocks_out").select($"id").as[Long]
        .collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("materializedView: lake table tracks the exact running aggregate") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import graft.meta.{ColumnDef, TableDef}
    implicit val ctx = spark.sqlContext

    val target = TableDef("mv", "user_totals", Seq(
      ColumnDef("user_id", "bigint", isPrimaryKey = true),
      ColumnDef("n", "bigint"), ColumnDef("total", "bigint")))
    val sinkDir = Files.createTempDirectory("mv-sink").toString
    val ckpt = Files.createTempDirectory("mv-ckpt").toString
    val sink = new graft.sinks.ParquetUpsertSink(sinkDir)

    val mem = MemoryStream[(Long, Long)]
    val agg = mem.toDF().toDF("user_id", "amount")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"amount").as("total"))

    def state(): Map[Long, (Long, Long)] =
      spark.read.parquet(s"$sinkDir/mv.user_totals")
        .select($"user_id", $"n", $"total").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap

    // AvailableNow snapshots the available offsets at start, so the data
    // must be in the stream BEFORE the query starts or the run can
    // legitimately process nothing.
    mem.addData((1L, 10L), (1L, 5L), (2L, 7L))
    val q = StatefulOps.materializedView(agg, target, sink, ckpt,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(state() == Map(1L -> (2L, 15L), 2L -> (1L, 7L)))

    // second increment: only touched keys change; untouched key 2
    // keeps its row (the view is over the full history)
    mem.addData((1L, 1L), (3L, 99L))
    val q2 = StatefulOps.materializedView(agg, target, sink, ckpt,
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(state() == Map(1L -> (3L, 16L), 2L -> (1L, 7L), 3L -> (1L, 99L)))
  }

  test("sessionSummaries tracks gap-based sessions across batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[StatefulOps.UserEvent]
    val sums = StatefulOps.sessionSummaries(mem.toDS(), gapMs = 60000L)
    val q = sums.writeStream.format("memory").queryName("sess_out")
      .outputMode("update").start()
    val t0 = 1700000000000L
    // user 1: two events close together (1 session), user 2: one
    mem.addData(StatefulOps.UserEvent(1, t0),
      StatefulOps.UserEvent(1, t0 + 1000), StatefulOps.UserEvent(2, t0))
    q.processAllAvailable()
    // next batch: user 1 after a gap -> second session; state carries
    mem.addData(StatefulOps.UserEvent(1, t0 + 10 * 60000))
    q.processAllAvailable(); q.stop()
    val m = spark.table("sess_out").as[StatefulOps.SessionSummary]
      .collect().groupBy(_.userId).map { case (u, rows) =>
        u -> rows.maxBy(_.nEvents) }
    assert(m(1L).nSessions == 2 && m(1L).nEvents == 3)
    assert(m(2L).nSessions == 1 && m(2L).nEvents == 1)
  }

  test("scd2Stream closes versions across batches; deletes close without opening") {
    implicit val ctx = spark.sqlContext
    import StatefulOps.{ClosedVersion, VersionEvent}
    val mem = MemoryStream[VersionEvent]
    val q = StatefulOps.scd2Stream(mem.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    // batch 1: key 1 insert → update (closes v1); key 2 insert (open)
    mem.addData(
      VersionEvent(1L, 1L, 100L, "a", "insert"),
      VersionEvent(1L, 2L, 200L, "b", "update"),
      VersionEvent(2L, 3L, 150L, "x", "insert"))
    q.processAllAvailable()
    val after1 = spark.table("scd2_out").as[ClosedVersion].collect().toSet
    assert(after1 == Set(ClosedVersion(1L, 1L, "a", 100L, 200L)))
    // batch 2: key 1's open version closes via a new update (state
    // carried across batches); key 2 deleted -> closes, opens nothing
    mem.addData(
      VersionEvent(1L, 4L, 300L, "c", "update"),
      VersionEvent(2L, 5L, 250L, "x", "delete"))
    q.processAllAvailable()
    val after2 = spark.table("scd2_out").as[ClosedVersion].collect().toSet
    assert(after2 == Set(
      ClosedVersion(1L, 1L, "a", 100L, 200L),
      ClosedVersion(1L, 2L, "b", 200L, 300L),
      ClosedVersion(2L, 3L, "x", 150L, 250L)))
    // batch 3: event after a delete opens fresh; the dead state does
    // NOT produce a phantom closed version
    mem.addData(VersionEvent(2L, 6L, 400L, "y", "insert"))
    q.processAllAvailable(); q.stop()
    val after3 = spark.table("scd2_out").as[ClosedVersion].collect().toSet
    assert(after3 == after2, "a delete-closed key must not re-close")
  }
}
