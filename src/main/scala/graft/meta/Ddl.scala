package graft.meta

/** MySQL-dialect DDL statements the engine replays for schema
  * evolution — the surface the reference handles via the TiDB parser
  * (`metas/mysql_ddl_parse.go:378-505` parse,
  * `metas/mysql_ddl_parse.go:99-376` apply). Catalyst's parser speaks
  * Spark SQL, not MySQL ALTER dialect (FIRST/AFTER, CHANGE COLUMN),
  * so this is a small driver-side parser — it never touches the data
  * path.
  */
sealed trait DdlStatement { def table: String }

object DdlStatement {
  /** Column position for ADD/MODIFY/CHANGE. */
  sealed trait Pos
  case object Default extends Pos
  case object First extends Pos
  final case class After(column: String) extends Pos

  final case class CreateTable(table: String, columns: Seq[ColumnDef],
      ifNotExists: Boolean = false) extends DdlStatement
  final case class CreateTableLike(table: String, sourceTable: String)
    extends DdlStatement
  final case class CreateTableAsSelect(table: String, select: String)
    extends DdlStatement
  final case class DropTable(table: String) extends DdlStatement
  final case class TruncateTable(table: String) extends DdlStatement
  final case class RenameTable(table: String, to: String) extends DdlStatement
  final case class AddColumn(table: String, col: ColumnDef, pos: Pos)
    extends DdlStatement
  final case class DropColumn(table: String, column: String) extends DdlStatement
  final case class ModifyColumn(table: String, col: ColumnDef, pos: Pos)
    extends DdlStatement
  final case class ChangeColumn(table: String, from: String, col: ColumnDef,
      pos: Pos) extends DdlStatement
  final case class RenameColumn(table: String, from: String, to: String)
    extends DdlStatement
}

object DdlParser {
  import DdlStatement._

  private def unq(s: String): String =
    s.trim.stripPrefix("`").stripSuffix("`")

  /** Strip an optional `db.` qualifier; returns (db | default, table). */
  private def qual(s: String, defaultDb: String): (String, String) = {
    val parts = s.split("\\.", 2)
    if (parts.length == 2) (unq(parts(0)), unq(parts(1)))
    else (defaultDb, unq(parts(0)))
  }

  private val CreateRe =
    """(?is)^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([`\w.]+)\s*(.*)$""".r
  private val AlterRe = """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+(.*)$""".r
  private val DropRe =
    """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([`\w.]+)\s*$""".r
  private val TruncateRe =
    """(?is)^\s*TRUNCATE\s+(?:TABLE\s+)?([`\w.]+)\s*$""".r
  private val RenameRe =
    """(?is)^\s*RENAME\s+TABLE\s+(.*)$""".r

  /** Parse one DDL statement; returns (db, statements). Multi-clause
    * ALTERs and multi-pair RENAME TABLEs expand to one statement per
    * clause, matching the reference's []*DdlStatement shape. */
  def parse(sql: String, defaultDb: String): Option[(String, Seq[DdlStatement])] = {
    val trimmed = sql.trim.stripSuffix(";")
    trimmed match {
      case CreateRe(ifne, tbl, rest) =>
        val (db, t) = qual(tbl, defaultDb)
        val restT = rest.trim
        val upper = restT.toUpperCase
        if (upper.startsWith("LIKE")) {
          val (_, src) = qual(restT.substring(4).trim, defaultDb)
          Some((db, Seq(CreateTableLike(t, src))))
        } else if (upper.startsWith("AS") || upper.startsWith("SELECT")) {
          Some((db, Seq(CreateTableAsSelect(t, restT))))
        } else if (restT.startsWith("(")) {
          val inner = restT.substring(1, matchingParen(restT, 0))
          Some((db, Seq(CreateTable(t, parseColumnList(inner),
            ifNotExists = ifne != null))))
        } else None
      case DropRe(tbl) =>
        val (db, t) = qual(tbl, defaultDb)
        Some((db, Seq(DropTable(t))))
      case TruncateRe(tbl) =>
        val (db, t) = qual(tbl, defaultDb)
        Some((db, Seq(TruncateTable(t))))
      case RenameRe(rest) =>
        val pairs = splitTopLevel(rest, ',').map { p =>
          val m = """(?is)^\s*([`\w.]+)\s+TO\s+([`\w.]+)\s*$""".r
          p match {
            case m(a, b) =>
              val (db, t) = qual(a, defaultDb)
              val (tdb, tt) = qual(b, defaultDb)
              (db, tdb, RenameTable(t, tt))
            case _ => return None
          }
        }
        // parse() reports one db per statement, so a multi-pair rename
        // spanning databases (or moving a table across them) can't be
        // represented. Silently dropping it would leave the registry
        // diverged from upstream with no signal — throw so operators
        // notice (a None here becomes Nil in SchemaRegistry.applySql,
        // i.e. an invisible no-op).
        val dbs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        if (dbs.size > 1) throw new UnsupportedOperationException(
          s"cross-database RENAME TABLE is not supported (databases: " +
            s"${dbs.mkString(", ")}) — the schema registry would go stale; " +
            "split the rename per database or re-bootstrap the registry")
        else pairs.headOption.map(h => (h._1, pairs.map(_._3)))
      case AlterRe(tbl, clauses) =>
        val (db, t) = qual(tbl, defaultDb)
        val stmts = splitTopLevel(clauses, ',').flatMap(parseAlterClause(t, _))
        if (stmts.isEmpty) None else Some((db, stmts))
      case _ => None
    }
  }

  private val AddRe =
    """(?is)^\s*ADD\s+(?:COLUMN\s+)?([`\w]+)\s+(.+?)(\s+FIRST|\s+AFTER\s+[`\w]+)?\s*$""".r
  private val DropColRe = """(?is)^\s*DROP\s+(?:COLUMN\s+)?([`\w]+)\s*$""".r
  private val ModifyRe =
    """(?is)^\s*MODIFY\s+(?:COLUMN\s+)?([`\w]+)\s+(.+?)(\s+FIRST|\s+AFTER\s+[`\w]+)?\s*$""".r
  private val ChangeRe =
    """(?is)^\s*CHANGE\s+(?:COLUMN\s+)?([`\w]+)\s+([`\w]+)\s+(.+?)(\s+FIRST|\s+AFTER\s+[`\w]+)?\s*$""".r
  private val RenameColRe =
    """(?is)^\s*RENAME\s+COLUMN\s+([`\w]+)\s+TO\s+([`\w]+)\s*$""".r
  private val RenameToRe = """(?is)^\s*RENAME\s+(?:TO\s+|AS\s+)?([`\w.]+)\s*$""".r

  private def parsePos(s: String): Pos =
    Option(s).map(_.trim).filter(_.nonEmpty) match {
      case None => Default
      case Some(p) if p.equalsIgnoreCase("FIRST") => First
      case Some(p) => After(unq(p.split("\\s+")(1)))
    }

  // index/constraint ALTER clauses must not fall through to AddRe —
  // `ADD INDEX idx (c)` would otherwise parse as a phantom column
  private val alterNoiseRe =
    ("""(?is)^\s*(?:ADD\s+(?:PRIMARY\s+KEY|(?:UNIQUE\s+)?(?:INDEX|KEY)|""" +
      """CONSTRAINT|FULLTEXT|SPATIAL|FOREIGN\s+KEY|CHECK)|""" +
      """DROP\s+(?:PRIMARY\s+KEY|INDEX|KEY|CONSTRAINT|FOREIGN\s+KEY)|""" +
      """ALTER\s+(?:COLUMN\s+)?[`\w]+\s+SET|ENGINE|AUTO_INCREMENT|""" +
      """CHARACTER\s+SET|CONVERT|COMMENT|ROW_FORMAT).*$""").r

  private def parseAlterClause(table: String, clause: String): Option[DdlStatement] =
    clause match {
      case alterNoiseRe() => None // index/constraint/option clause — no schema effect
      case AddRe(name, typ, pos) =>
        Some(AddColumn(table, colDef(unq(name), typ), parsePos(pos)))
      case ModifyRe(name, typ, pos) =>
        Some(ModifyColumn(table, colDef(unq(name), typ), parsePos(pos)))
      case ChangeRe(from, to, typ, pos) =>
        Some(ChangeColumn(table, unq(from), colDef(unq(to), typ), parsePos(pos)))
      case RenameColRe(from, to) =>
        Some(RenameColumn(table, unq(from), unq(to)))
      case DropColRe(name) => Some(DropColumn(table, unq(name)))
      case RenameToRe(to) => Some(RenameTable(table, unq(to.split("\\.").last)))
      case _ => None // unsupported clause (index/constraint/engine...) — skip
    }

  /** Column definition from "type [attrs...]" — keeps the full raw
    * type (incl. parens), detects inline PRIMARY KEY / NOT NULL /
    * COMMENT. */
  private def colDef(name: String, typeAndAttrs: String): ColumnDef = {
    val s = typeAndAttrs.trim
    val rawType = {
      // type token = first word plus an optional immediate (...) group
      val m = """^([a-zA-Z]+)\s*(\([^)]*\))?""".r.findFirstMatchIn(s).get
      m.group(1) + Option(m.group(2)).getOrElse("")
    }
    val upper = s.toUpperCase
    val comment = """(?i)COMMENT\s+'([^']*)'""".r
      .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    ColumnDef(name, rawType,
      isPrimaryKey = upper.contains("PRIMARY KEY"), comment = comment)
  }

  /** Parse the parenthesized body of CREATE TABLE. */
  private[meta] def parseColumnList(inner: String): Seq[ColumnDef] = {
    val parts = splitTopLevel(inner, ',')
    val pkRe = """(?is)^\s*PRIMARY\s+KEY\s*\((.*)\)\s*$""".r
    val constraintRe =
      """(?is)^\s*(?:CONSTRAINT|UNIQUE|KEY|INDEX|FULLTEXT|FOREIGN|CHECK)\b.*$""".r
    var pks = Set.empty[String]
    val cols = parts.flatMap {
      case pkRe(names) =>
        pks ++= splitTopLevel(names, ',').map(unq(_).toLowerCase); None
      case constraintRe() => None
      case colPart =>
        val t = colPart.trim
        val nameMatch = """^([`\w]+)\s+(.*)$""".r.findFirstMatchIn(t)
        nameMatch.map(m => colDef(unq(m.group(1)), m.group(2)))
    }
    cols.map(c => if (pks.contains(c.name.toLowerCase))
      c.copy(isPrimaryKey = true) else c)
  }

  /** Split on `sep` at paren depth 0, respecting quotes. */
  private[meta] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote: Char = 0
    s.foreach { ch =>
      if (inQuote != 0) {
        cur += ch
        if (ch == inQuote) inQuote = 0
      } else ch match {
        case '\'' | '"' | '`' => inQuote = ch; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case c if c == sep && depth == 0 =>
          out += cur.toString; cur.clear()
        case c => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    s.length - 1
  }

  /** Online-schema-change shadow tables to ignore, mirroring the
    * reference's gh-ost / Aliyun DMS detection
    * (`inputs/mysql/mysql_replication.go:160-185`). */
  private val shadowRes = Seq(
    """^tp_\d+_(?:ogt|del|ogl)_.*$""".r,   // Aliyun DMS
    """^tpa_[a-z0-9]+_.*$""".r,            // Aliyun DMS
    """^_(.+)_(?:gho|ghc|del)$""".r,       // gh-ost
    """^_(.+)_(?:old|new)$""".r)           // pt-osc

  def isShadowTable(name: String): Boolean =
    shadowRes.exists(_.pattern.matcher(name).matches())
}
