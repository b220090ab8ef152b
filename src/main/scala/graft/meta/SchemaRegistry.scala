package graft.meta

import scala.collection.concurrent.TrieMap

/** Versioned schema registry ≙ `inputs/mysql/mysql_meta.go:88-133`:
  * every DDL-driven mutation bumps the version and RETAINS all
  * historical versions, keyed `(db, table, version)`, so in-flight
  * events pinned to an older `tableVersion` still decode
  * (≙ `outputs/kafka/kafka.go:135-140`).
  *
  * Plain driver-side state — schemas are control-plane metadata, not
  * data. Thread-safe via TrieMap (streaming listener threads may
  * evolve schemas while queries read them).
  */
final class SchemaRegistry {
  import DdlStatement._

  private val byVersion = TrieMap.empty[(String, String, Int), TableDef]
  private val latest = TrieMap.empty[(String, String), Int]
  // column-rename lineage: (db, table, newVersion) -> (from -> to),
  // so version-pinned frames can be re-labeled onto newer shapes
  private val renames = TrieMap.empty[(String, String, Int), Map[String, String]]

  /** High-watermark of applied DDL sequence numbers — foreachBatch is
    * at-least-once, so a replayed batch must not re-apply its DDL
    * (each application bumps versions and would desynchronize
    * tableVersion pinning). */
  @volatile var ddlWatermark: Long = -1L

  def register(t: TableDef): TableDef = {
    byVersion.put((t.schema, t.name, t.version), t)
    latest.updateWith((t.schema, t.name)) {
      case Some(v) if v >= t.version => Some(v)
      case _ => Some(t.version)
    }
    t
  }

  def get(db: String, table: String, version: Int): Option[TableDef] =
    byVersion.get((db, table, version))

  def current(db: String, table: String): Option[TableDef] =
    latest.get((db, table)).flatMap(v => byVersion.get((db, table, v)))

  def currentVersion(db: String, table: String): Option[Int] =
    latest.get((db, table))

  def tables: Seq[TableDef] =
    latest.keys.toSeq.sorted.flatMap { case (d, t) => current(d, t) }

  def drop(db: String, table: String): Unit = {
    latest.remove((db, table))
    byVersion.keys.filter(k => k._1 == db && k._2 == table)
      .foreach(byVersion.remove)
  }

  /** Apply one parsed DDL statement against the current version of
    * its table, registering a bumped new version
    * (≙ `metas/mysql_ddl_parse.go:99-376` + version bump at
    * `inputs/mysql/mysql_meta.go:116-123`). Unknown/unroutable
    * tables are ignored, as is DDL for shadow tables. */
  def applyDdl(db: String, stmt: DdlStatement): Option[TableDef] = {
    if (DdlParser.isShadowTable(stmt.table)) return None
    stmt match {
      case CreateTable(t, cols, ifNotExists) =>
        if (ifNotExists && current(db, t).isDefined) current(db, t)
        else Some(register(TableDef(db, t, cols)))
      case CreateTableLike(t, src) =>
        current(db, src).map(s => register(TableDef(db, t, s.columns)))
      case CreateTableAsSelect(_, _) =>
        None // schema depends on the SELECT; reference also only flags it
      case DropTable(t) => drop(db, t); None
      case TruncateTable(t) => current(db, t) // schema unchanged
      case RenameTable(t, to) =>
        current(db, t).map { cur =>
          drop(db, t)
          register(cur.copy(name = to, version = cur.version + 1))
        }
      case AddColumn(t, c, pos) =>
        evolve(db, t)(cols =>
          insertAt(cols.filterNot(_.name.equalsIgnoreCase(c.name)), c, pos))
      case DropColumn(t, name) =>
        evolve(db, t)(_.filterNot(_.name.equalsIgnoreCase(name)))
      case ModifyColumn(t, c, pos) =>
        evolve(db, t) { cols =>
          val prevPk = cols.find(_.name.equalsIgnoreCase(c.name))
            .exists(_.isPrimaryKey)
          val merged = c.copy(isPrimaryKey = c.isPrimaryKey || prevPk)
          pos match {
            case Default => // plain MODIFY keeps the original position
              cols.map(x => if (x.name.equalsIgnoreCase(c.name)) merged else x)
            case p =>
              insertAt(cols.filterNot(_.name.equalsIgnoreCase(c.name)), merged, p)
          }
        }
      case ChangeColumn(t, from, c, pos) =>
        val out = evolve(db, t) { cols =>
          val prevPk = cols.find(_.name.equalsIgnoreCase(from))
            .exists(_.isPrimaryKey)
          val merged = c.copy(isPrimaryKey = c.isPrimaryKey || prevPk)
          val without = cols.filterNot(_.name.equalsIgnoreCase(from))
          pos match {
            case Default =>
              cols.map(x => if (x.name.equalsIgnoreCase(from)) merged else x)
            case p => insertAt(without, merged, p)
          }
        }
        if (!from.equalsIgnoreCase(c.name))
          out.foreach(n => renames.put((db, t, n.version), Map(from -> c.name)))
        out
      case RenameColumn(t, from, to) =>
        val out = evolve(db, t)(_.map(c =>
          if (c.name.equalsIgnoreCase(from)) c.copy(name = to) else c))
        out.foreach(n => renames.put((db, t, n.version), Map(from -> to)))
        out
    }
  }

  /** Translate a column name from an older schema version to its
    * name at `toVersion`, following recorded renames (CHANGE COLUMN
    * lineage is recorded the same way). */
  def nameAt(db: String, table: String, fromVersion: Int, toVersion: Int,
      name: String): String =
    ((fromVersion + 1) to toVersion).foldLeft(name) { (n, v) =>
      renames.get((db, table, v)).flatMap(_.collectFirst {
        case (f, t) if f.equalsIgnoreCase(n) => t
      }).getOrElse(n)
    }

  /** Parse + apply a raw DDL string (ONE statement — the binlog
    * delivery unit). Returns affected tables. */
  def applySql(sql: String, defaultDb: String): Seq[TableDef] =
    DdlParser.parse(sql, defaultDb) match {
      case Some((db, stmts)) => stmts.flatMap(applyDdl(db, _))
      case None => Nil
    }

  /** Apply a multi-statement DDL SCRIPT (a schema snapshot file):
    * statements split on ';' outside quotes/backticks/parens —
    * feeding a script through [[applySql]] would silently apply only
    * the first statement (the parser matches one statement per
    * call). */
  def applyScript(sql: String, defaultDb: String): Seq[TableDef] =
    splitStatements(sql).flatMap(applySql(_, defaultDb))

  private def splitStatements(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' | '`' => quote = ch; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ';' if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += ch
      }
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def evolve(db: String, table: String)(
      f: Seq[ColumnDef] => Seq[ColumnDef]): Option[TableDef] =
    current(db, table).map { cur =>
      register(cur.copy(columns = f(cur.columns), version = cur.version + 1))
    }

  private def insertAt(cols: Seq[ColumnDef], c: ColumnDef,
      pos: DdlStatement.Pos): Seq[ColumnDef] = pos match {
    case First => c +: cols
    case After(a) =>
      val i = cols.indexWhere(_.name.equalsIgnoreCase(a))
      if (i < 0) cols :+ c
      else (cols.take(i + 1) :+ c) ++ cols.drop(i + 1)
    case Default => cols :+ c
  }
}
