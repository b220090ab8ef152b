package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.meta.TableDef
import graft.operators.{Compactor, Transforms}

/** CDC pipeline assembly ≙ `app/server.go:26-92,158-166`:
  * source → transforms → route → (compact → sink) per table, as one
  * Structured Streaming query with `foreachBatch`.
  *
  * Semantics vs the reference:
  *  - batching: Spark's trigger replaces the size-OR-interval flush
  *    loops (`outputs/starrocks/starrocks.go:64-134`); default
  *    trigger 3s ≙ the reference's `batch-interval-ms` 3000.
  *  - ordering: per-key last-event compaction on the monotone `seq`
  *    replaces order-preserving run-splitting (SURVEY §7.5.1).
  *  - delivery: at-least-once; offsets/commits live in the
  *    checkpoint dir (≙ GTID bbolt persistence,
  *    `inputs/mysql/mysql_position.go:150-170`); sinks must be
  *    idempotent by PK, which compacted upserts are.
  *  - DDL: a registry-refresh callback; the streaming query restarts
  *    per schema version (SURVEY §3.2) — orchestrated outside the
  *    query itself.
  */
object Pipeline {

  /** One route: (db, table) → target table meta + column transforms
    * (≙ a `[[routers]]` TOML entry + its transform list).
    *
    * `source` is the SOURCE table's schema when it differs from the
    * target (rename/mapper configs): the envelope is projected onto
    * the source's columns first, transforms then rename/drop/remap,
    * and the result must land on the target's shape — the
    * reference's order (transforms rewrite the column list BEFORE
    * the mapper zips it, `transforms/transforms.go:22-55` →
    * `core/meta.go:78-104`). When None, source shape = target shape. */
  final case class Route(
      db: String,
      table: String,
      target: TableDef,
      transforms: Seq[DataFrame => DataFrame] = Nil,
      source: Option[TableDef] = None)

  /** Per-table batch sink (JDBC upsert / stream-load / Kafka /
    * parquet). Receives a routed, typed, compacted batch. */
  trait BatchSink extends Serializable {
    def write(batch: DataFrame, target: TableDef, batchId: Long): Unit
  }

  /** Project the generic Map-envelope onto a typed per-table frame:
    * after[name] cast to the column's Spark type, plus the envelope's
    * op/seq/pos/ts metadata (ts = source event time, which the Kafka
    * sink's envelope re-emits and lake sinks keep as provenance).
    * The filter sits on the scan; the cast is a narrow projection. */
  def routed(envelope: DataFrame, r: Route): DataFrame = {
    val shape = r.source.getOrElse(r.target)
    val typedCols = shape.columns.map { c =>
      col("after").getItem(c.name).cast(c.sparkType).as(c.name)
    }
    envelope
      .filter(col("db") === r.db && col("table") === r.table)
      .select(typedCols ++ Seq(col("op"), col("seq"), col("pos"),
        col("ts")): _*)
  }

  /** Compact a routed batch to last-event-per-key on `seq`
    * (hash-agg variant — map-side partial combine; see Compactor). */
  def compacted(batch: DataFrame, t: TableDef): DataFrame = {
    val pks = t.pkColumns.map(_.name)
    if (pks.isEmpty) batch
    else Compactor.lastEventPerKeyAgg(pks, "seq")(batch)
  }

  /** Assemble and start the streaming query. */
  def start(
      envelope: DataFrame,
      routes: Seq[Route],
      sink: BatchSink,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("3 seconds")): StreamingQuery = {
    envelope.writeStream
      .queryName("graft-cdc")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, routes, sink, batchId)
      }
      .start()
  }

  /** One micro-batch: route → transform → compact → sink, per route.
    * The batch is persisted once so N routes don't rescan the
    * source. */
  def processBatch(batch: DataFrame, routes: Seq[Route], sink: BatchSink,
      batchId: Long): Unit = {
    if (routes.size > 1) batch.persist()
    try {
      routes.foreach { r =>
        val typed = Transforms.chain(r.transforms: _*)(routed(batch, r))
        val compact = compacted(typed, r.target)
        sink.write(compact, r.target, batchId)
      }
    } finally {
      if (routes.size > 1) batch.unpersist()
    }
  }

  /** Retry with linear backoff ≙ `outputs/starrocks/starrocks.go:
    * 147-160` (3 tries, 5s·attempt). Wraps sink RPCs. */
  def retry[T](tries: Int = 3, backoffMs: Long = 5000)(f: => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < tries) {
      try return f
      catch {
        // NonFatal only: retrying InterruptedException would delay
        // streaming shutdown and re-run sink side effects after
        // cancellation; VM errors must propagate immediately.
        case scala.util.control.NonFatal(e) =>
          last = e
          attempt += 1
          if (attempt < tries) Thread.sleep(backoffMs * attempt)
      }
    }
    throw last
  }
}
