package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.meta.{ColumnDef, TableDef}
import graft.sinks.ParquetUpsertSink

/** Backfill.chunked against the real ParquetUpsertSink: live change
  * batches and chunk writes interleave through ONE sink, with a
  * change landing in the middle of a chunk's watermark window. The
  * sink drops delete tombstones on write, so this is exactly the
  * sink class for which the window rule is load-bearing: the spec
  * shows the reconciled run converging and the unreconciled run
  * resurrecting a deleted key. */
class BackfillChunkedSpec extends SparkSpec {
  import spark.implicits._

  private val t = TableDef("app", "acct", Seq(
    ColumnDef("id", "bigint", isPrimaryKey = true),
    ColumnDef("v", "varchar(16)")))

  /** Source-of-truth table + changelog: rows applied in seq order. */
  private class Source {
    val history = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var pos = 0L // stream position = last seq APPLIED to the sink
    def change(id: Long, v: String, op: String, seq: Long): (Long, String, String, Long) = {
      val e = (id, v, op, seq); history += e; e
    }
    def tableNow: DataFrame = { // what a chunk reader sees RIGHT NOW
      val latest = history.groupBy(_._1).flatMap { case (_, es) =>
        val last = es.maxBy(_._4)
        if (last._3 == "delete") None else Some((last._1, last._2))
      }
      latest.toSeq.toDF("id", "v")
    }
    def keysIn(lo: Long, hi: Long): DataFrame =
      history.filter(e => e._4 > lo && e._4 <= hi).map(_._1)
        .toSeq.toDF("id")
  }

  private def applyLive(sink: ParquetUpsertSink, src: Source,
      events: Seq[(Long, String, String, Long)]): Unit = {
    sink.write(events.toDF("id", "v", "op", "seq")
      .withColumn("pos", concat(lit("seq:"), col("seq"))), t, src.pos)
    src.pos = events.map(_._4).max
  }

  private def runScenario(reconcile: Boolean): Map[Long, String] = {
    val dir = Files.createTempDirectory("graft-chunked-bf").toString
    val sink = new ParquetUpsertSink(dir)
    val src = new Source
    // pre-stream state: three accounts exist before the backfill
    src.change(1L, "a1", "insert", 1L)
    src.change(2L, "b1", "insert", 2L)
    src.change(3L, "c1", "insert", 3L)
    src.pos = 3L // stream tails from here; the sink starts EMPTY

    val windowKeys: (Long, Long) => DataFrame =
      if (reconcile) src.keysIn
      else (_, _) => Seq.empty[Long].toDF("id") // protocol violation

    // chunk 1 (key 1): quiet window
    val c1 = () => src.tableNow.filter(col("id") === 1L)
    // chunk 2 (key 2): an update to key 2 lands MID-READ — the read
    // observes the new value, but its seq is already applied; the
    // window rule must drop the ambiguous snapshot row either way
    val c2 = () => {
      applyLive(sink, src, Seq(src.change(2L, "b3", "update", 6L)))
      src.tableNow.filter(col("id") === 2L)
    }
    // chunk 3 (key 3): the key is DELETED mid-read; the read raced
    // ahead of the delete and still returns the old row
    val c3 = () => {
      val stale = src.tableNow.filter(col("id") === 3L).localCheckpoint(true)
      applyLive(sink, src, Seq(src.change(3L, "", "delete", 7L)))
      stale
    }

    // live traffic before the backfill reaches chunk 2
    applyLive(sink, src, Seq(src.change(2L, "b2", "update", 4L)))

    Backfill.chunked(t, Iterator(c1, c2, c3), () => src.pos,
      windowKeys, sink)

    sink.read(t).select("id", "v").as[(Long, String)].collect().toMap
  }

  test("reconciled chunked backfill converges on a tombstone-dropping sink") {
    // key 1 from the chunk; key 2 from its live update (seq 6 beats
    // any snapshot row); key 3 deleted — must be ABSENT
    assert(runScenario(reconcile = true) == Map(1L -> "a1", 2L -> "b3"))
  }

  test("without the window rule the deleted key is resurrected") {
    val got = runScenario(reconcile = false)
    assert(got.get(3L).contains("c1"),
      s"expected the unreconciled run to resurrect key 3, got $got")
    assert(got == Map(1L -> "a1", 2L -> "b3", 3L -> "c1"))
  }
}
