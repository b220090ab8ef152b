package graft.sinks

import graft.meta.TableDef

/** Batched DML SQL generation for the JDBC upsert/delete sink
  * ≙ `outputs/mysql/mysql_utils.go:45-134`.
  *
  * Pure string/value functions — unit-testable without a database,
  * executed inside `foreachBatch` partitions against a JDBC
  * connection. Because the engine compacts each micro-batch to
  * last-event-per-key first (Compactor), a batch holds at most one
  * statement kind per key and the reference's order-preserving
  * "run splitting" (`outputs/mysql/mysql.go:172-202`) is
  * unnecessary.
  *
  * The reference's multi-PK bulk delete binds nil instead of the row
  * values (`outputs/mysql/mysql_utils.go:98-105` reads from an
  * unpopulated map) — [[deleteSql]] fixes that by binding the actual
  * PK tuples.
  */
object SqlGen {

  // Identifiers flow in from parsed upstream DDL (untrusted replication
  // stream): escape embedded backticks by doubling (MySQL convention) so
  // a hostile name can't break out of the quote and inject SQL.
  private def q(id: String): String = s"`${id.replace("`", "``")}`"

  /** Multi-row INSERT … ON DUPLICATE KEY UPDATE
    * (≙ generateBulkInsertOnDuplicateKeyUpdateSQL,
    * `outputs/mysql/mysql_utils.go:45-76`).
    * Returns (sql, flattened bind values row-major). */
  def upsertSql(t: TableDef, rows: Seq[Map[String, Any]]): (String, Seq[Any]) = {
    require(rows.nonEmpty, "empty batch")
    val cols = t.columnNames
    val tuple = cols.map(_ => "?").mkString("(", ",", ")")
    val updates = cols.filterNot(c => t.pkColumns.exists(_.name == c))
      .map(c => s"${q(c)}=VALUES(${q(c)})")
    val updateClause =
      if (updates.nonEmpty) updates.mkString(", ")
      // all-PK table: no-op assignment keeps the statement valid
      else s"${q(cols.head)}=${q(cols.head)}"
    val sql = s"INSERT INTO ${q(t.schema)}.${q(t.name)} " +
      cols.map(q).mkString("(", ",", ")") +
      s" VALUES ${Seq.fill(rows.size)(tuple).mkString(",")}" +
      s" ON DUPLICATE KEY UPDATE $updateClause"
    (sql, rows.flatMap(r => cols.map(r.getOrElse(_, null))))
  }

  /** Bulk delete. Single PK → `pk IN (…)`
    * (≙ `outputs/mysql/mysql_utils.go:114-134`); composite PK →
    * OR-of-conjunctions with REAL bound values (reference bug
    * fixed). */
  def deleteSql(t: TableDef, rows: Seq[Map[String, Any]]): (String, Seq[Any]) = {
    require(rows.nonEmpty, "empty batch")
    val pks = t.pkColumns.map(_.name)
    require(pks.nonEmpty, s"${t.name}: delete requires primary keys")
    val target = s"${q(t.schema)}.${q(t.name)}"
    if (pks.size == 1) {
      val sql = s"DELETE FROM $target WHERE ${q(pks.head)} IN " +
        rows.map(_ => "?").mkString("(", ",", ")")
      (sql, rows.map(_.getOrElse(pks.head, null)))
    } else {
      val tuple = pks.map(p => s"${q(p)}=?").mkString("(", " AND ", ")")
      val sql = s"DELETE FROM $target WHERE " +
        Seq.fill(rows.size)(tuple).mkString(" OR ")
      (sql, rows.flatMap(r => pks.map(r.getOrElse(_, null))))
    }
  }
}
