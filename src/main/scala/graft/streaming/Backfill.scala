package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.TableDef

/** Initial full-table snapshot backfill — deliberately ABSENT in the
  * reference (sync silently starts at the current GTID,
  * `inputs/mysql/mysql_position.go:37-54`; SURVEY §2 flags this as a
  * gap to fix). The engine makes bootstrap explicit:
  *
  *   1. batch-read the source table (JDBC / parquet snapshot),
  *   2. convert rows to insert-events with seq = -1 (before every
  *      live seq, so any concurrent CDC event wins compaction),
  *   3. write through the SAME per-table sink path,
  *   4. then start the stream from the snapshot watermark.
  *
  * At 100 TB the snapshot read is the dominant cost: for JDBC use
  * predicate-partitioned reads (partitionColumn/numPartitions on the
  * PK); the write path is the sink's normal bulk load.
  */
object Backfill {

  /** Convert a snapshot DataFrame to the routed/typed batch shape
    * the sinks consume (columns + op/seq/pos). */
  def asInsertBatch(snapshot: DataFrame, t: TableDef): DataFrame = {
    val cols = t.columnNames.map(n => col(n).cast(t.column(n).get.sparkType).as(n))
    snapshot.select(cols: _*)
      .withColumn("op", lit("insert"))
      .withColumn("seq", lit(-1L))
      .withColumn("pos", lit("snapshot"))
  }

  /** Run the snapshot through the sink, one table at a time. */
  def run(spark: SparkSession, snapshots: Map[TableDef, DataFrame],
      sink: Pipeline.BatchSink): Unit =
    snapshots.foreach { case (t, df) =>
      sink.write(asInsertBatch(df, t), t, batchId = -1L)
    }

  /** Chunked backfill interleaved with a LIVE stream — the DBLog
    * watermark protocol ([[graft.ops.ChunkedSnapshot]] proves the
    * semantics; this is the control-plane loop that runs it against a
    * real pipeline + sink). Per chunk:
    *
    *   lo = streamPos(); rows = read chunk (materialized NOW — the
    *   read must happen between the watermarks, so laziness is forced
    *   out with an executor-side localCheckpoint, never a driver
    *   collect); hi = streamPos(); drop rows whose key has a change
    *   in (lo, hi]; write survivors as seq = -1 inserts.
    *
    * Ordering contract the caller owes: events with seq > hi must not
    * reach the sink before this chunk's write returns — run chunk
    * steps between micro-batches (or from foreachBatch), which is
    * DBLog's "emit the chunk into the stream at the high watermark".
    * Reconciliation is what makes this safe for TOMBSTONE-DROPPING
    * sinks (ParquetUpsertSink drops deletes on write): an
    * unreconciled chunk row whose key was deleted inside the window
    * would resurrect the key, because there is no tombstone left to
    * arbitrate against — BackfillChunkedSpec shows exactly that.
    *
    * Chunks run through ONE sink write each; with a seq-arbitrated
    * idempotent sink multiple chunk loops may run in parallel over
    * disjoint pk ranges (the per-table write lock is the only
    * serialization point).
    *
    * @param chunkReads  pk-ordered chunk readers; each invoked once,
    *                    at its own low watermark
    * @param streamPos   current applied stream position
    * @param windowKeys  keys changed in a (lo, hi] stream window, as
    *                    a one-column-per-pk frame
    * @return number of snapshot rows written
    */
  def chunked(t: TableDef, chunkReads: Iterator[() => DataFrame],
      streamPos: () => Long, windowKeys: (Long, Long) => DataFrame,
      sink: Pipeline.BatchSink): Long = {
    val pks = t.pkColumns.map(_.name)
    require(pks.nonEmpty, s"${t.schema}.${t.name}: chunked backfill needs a pk")
    var written = 0L
    var batch = 0L
    chunkReads.foreach { readChunk =>
      val lo = streamPos()
      val rows = readChunk().localCheckpoint(true)
      val hi = streamPos()
      val survivors =
        graft.ops.ChunkedSnapshot.reconcileChunk(rows, windowKeys(lo, hi), pks)
          .localCheckpoint(true)
      val n = survivors.count()
      // a fully-superseded chunk writes nothing (snapshot rows carry
      // no deletes, so an empty batch would be a pure no-op write)
      if (n > 0) sink.write(asInsertBatch(survivors, t), t, batchId = -2L - batch)
      written += n
      batch += 1
    }
    written
  }
}
