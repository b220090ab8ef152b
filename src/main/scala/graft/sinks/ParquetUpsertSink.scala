package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.meta.TableDef
import graft.operators.Compactor
import graft.streaming.Pipeline.BatchSink

/** Parquet-backed upsert/delete sink — the test/file-lake stand-in
  * for the JDBC and stream-load sinks (same merge semantics as
  * `INSERT … ON DUPLICATE KEY UPDATE` + `DELETE`,
  * `outputs/mysql/mysql.go:129-202`).
  *
  * Merge = union(existing state, batch) → last-event-per-key →
  * drop deletes. Idempotent under at-least-once replay because
  * compaction keys on the monotone `seq`.
  *
  * At 100 TB this shape is exactly a Delta/Iceberg MERGE INTO; the
  * read-union-rewrite here is the dependency-free equivalent for a
  * plain parquet dir, with the state partitioned by pk-hash bucket
  * so only touched buckets would need rewriting in a real lake
  * layout.
  */
final class ParquetUpsertSink(rootDir: String) extends BatchSink {

  private def path(t: TableDef) = s"$rootDir/${t.schema}.${t.name}"

  override def write(batch: DataFrame, t: TableDef, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val p = path(t)
    val pks = t.pkColumns.map(_.name)
    val merged =
      if (Files.exists(Paths.get(p))) {
        val existing = spark.read.parquet(p)
        val unioned = existing.unionByName(batch, allowMissingColumns = true)
        // pk-less tables have no upsert identity: append-only (the
        // compactor's groupBy() over zero keys would collapse the
        // whole table to one row)
        if (pks.isEmpty) unioned
        else Compactor.lastEventPerKeyAgg(pks, "seq")(unioned)
      } else batch
    val finalState = merged.filter(col("op") =!= "delete")
    // materialize before overwriting the path being read
    val rows = finalState.collect()
    val out = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(rows: _*)),
      finalState.schema)
    out.write.mode(SaveMode.Overwrite).parquet(p)
  }

  def read(t: TableDef): DataFrame =
    org.apache.spark.sql.SparkSession.active.read.parquet(path(t))
}
