package graft.sinks

import java.sql.Connection

import org.apache.spark.sql.{DataFrame, Row}

import graft.meta.TableDef
import graft.streaming.Pipeline
import graft.streaming.Pipeline.BatchSink

/** JDBC executor for the MySQL upsert/delete sink — the transport
  * that actually runs [[SqlGen]]'s statements
  * (≙ `outputs/mysql/mysql.go:129-226` `execute`/`executeSQL`).
  *
  * Execution is per-partition on the executors: each partition opens
  * one connection, chunks its rows into bounded multi-row statements,
  * and binds/executes them — nothing flows through the driver. The
  * incoming batch is already compacted to last-event-per-key, so each
  * key appears once and upsert/delete ordering within a batch is
  * immaterial (the reference's order-preserving run-splitting,
  * `outputs/mysql/mysql.go:172-202`, is unnecessary — SURVEY §7.5.1).
  *
  * Statement-level retry: 3 tries with linear 5s·attempt backoff
  * ≙ `executeSQL` (`outputs/mysql/mysql.go:204-226`).
  *
  * @param connect serializable connection factory, invoked on the
  *                executor (e.g. `() => DriverManager.getConnection(url)`)
  * @param assumeCompacted skip the defensive per-batch compaction.
  *                [[graft.streaming.Pipeline.processBatch]] always
  *                compacts immediately before `sink.write`, so
  *                pipeline-wired instances set this to avoid paying a
  *                second full aggregate+shuffle of every micro-batch;
  *                direct users keep the default (defended) path.
  */
final class JdbcUpsertSink(
    connect: () => Connection,
    maxRowsPerStatement: Int = 1024,
    retries: Int = 3,
    retryBackoffMs: Long = 5000,
    assumeCompacted: Boolean = false) extends BatchSink {

  override def write(batch: DataFrame, t: TableDef, batchId: Long): Unit = {
    val cols = t.columnNames
    val pks = t.pkColumns.map(_.name)
    // ≙ `outputs/mysql/mysql.go:130-132`: pk-less tables unsupported
    require(pks.nonEmpty,
      s"${t.schema}.${t.name}: JDBC upsert sink requires primary keys")
    // Upserts run before deletes within a chunk, so correctness needs
    // ONE event per key. Unless the caller vouches (assumeCompacted —
    // the Pipeline path, which compacts right before write), don't
    // trust the scaladoc contract: compact defensively when the batch
    // carries the monotone `seq` (costs a real aggregate+shuffle of
    // the batch — that is why the pipeline path opts out), else
    // verify key-uniqueness and fail loudly — feeding an uncompacted
    // frame through would silently reorder delete-then-insert
    // sequences (the ordering the reference preserves via
    // run-splitting, `outputs/mysql/mysql.go:172-202`).
    val safe =
      if (assumeCompacted) batch
      else if (batch.columns.contains("seq"))
        graft.operators.Compactor.lastEventPerKeyAgg(pks, "seq")(batch)
      else {
        import org.apache.spark.sql.functions.{col, count, lit}
        val dups = batch.groupBy(pks.map(col): _*)
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
        require(dups == 0,
          s"${t.schema}.${t.name}: batch has multiple events per key and no " +
            "'seq' column to compact on — compact upstream or add 'seq'")
        batch
      }
    val (cf, tt, mx, rt, bo) =
      (connect, t, maxRowsPerStatement, retries, retryBackoffMs)
    safe.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = cf()
        try {
          rows.grouped(mx).foreach { chunk =>
            val (dels, ups) = chunk.partition(_.getAs[String]("op") == "delete")
            if (ups.nonEmpty) {
              val maps = ups.map(r => cols.map(c => c -> r.getAs[Any](c)).toMap)
              val (sql, binds) = SqlGen.upsertSql(tt, maps)
              JdbcUpsertSink.execute(conn, sql, binds, rt, bo)
            }
            if (dels.nonEmpty) {
              val maps = dels.map(r => pks.map(c => c -> r.getAs[Any](c)).toMap)
              val (sql, binds) = SqlGen.deleteSql(tt, maps)
              JdbcUpsertSink.execute(conn, sql, binds, rt, bo)
            }
          }
        } finally conn.close()
      }
    }
  }
}

object JdbcUpsertSink {
  /** Prepare + bind + execute one statement with linear-backoff retry
    * (≙ `executeSQL`, `outputs/mysql/mysql.go:204-226`). */
  private[sinks] def execute(conn: Connection, sql: String,
      binds: Seq[Any], retries: Int, backoffMs: Long): Unit =
    Pipeline.retry(retries, backoffMs) {
      val ps = conn.prepareStatement(sql)
      try {
        binds.zipWithIndex.foreach { case (v, i) =>
          ps.setObject(i + 1, v)
        }
        ps.executeUpdate()
      } finally ps.close()
    }
}
