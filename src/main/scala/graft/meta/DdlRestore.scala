package graft.meta

/** DDL restore/normalize ≙ `metas/mysql_ddl_parse.go:507-562`
  * (`TableRestore`): turn parsed statements / table metadata back
  * into canonical, schema-qualified SQL text. Used for logging,
  * DDL forwarding to targets, and round-trip tests.
  */
object DdlRestore {
  import DdlStatement._

  private def q(id: String): String = s"`$id`"
  private def qt(db: String, t: String): String = s"${q(db)}.${q(t)}"

  def columnSql(c: ColumnDef): String = {
    val pk = if (c.isPrimaryKey) " PRIMARY KEY" else ""
    val comment = if (c.comment.nonEmpty) s" COMMENT '${c.comment}'" else ""
    s"${q(c.name)} ${c.rawType}$pk$comment"
  }

  private def posSql(p: Pos): String = p match {
    case Default => ""
    case First => " FIRST"
    case After(c) => s" AFTER ${q(c)}"
  }

  /** Canonical SQL for one statement, qualified with `db`. */
  def toSql(db: String, stmt: DdlStatement): String = stmt match {
    case CreateTable(t, cols, ifne) =>
      val ine = if (ifne) "IF NOT EXISTS " else ""
      val pks = cols.filter(_.isPrimaryKey).map(_.name)
      val colDefs = cols.map(c => columnSql(c.copy(isPrimaryKey = false)))
      val pkClause =
        if (pks.isEmpty) "" else s", PRIMARY KEY (${pks.map(q).mkString(", ")})"
      s"CREATE TABLE $ine${qt(db, t)} (${colDefs.mkString(", ")}$pkClause)"
    case CreateTableLike(t, src) =>
      s"CREATE TABLE ${qt(db, t)} LIKE ${qt(db, src)}"
    case CreateTableAsSelect(t, select) =>
      s"CREATE TABLE ${qt(db, t)} $select"
    case DropTable(t) => s"DROP TABLE ${qt(db, t)}"
    case TruncateTable(t) => s"TRUNCATE TABLE ${qt(db, t)}"
    case RenameTable(t, to) => s"RENAME TABLE ${qt(db, t)} TO ${qt(db, to)}"
    case AddColumn(t, c, pos) =>
      s"ALTER TABLE ${qt(db, t)} ADD COLUMN ${columnSql(c)}${posSql(pos)}"
    case DropColumn(t, c) =>
      s"ALTER TABLE ${qt(db, t)} DROP COLUMN ${q(c)}"
    case ModifyColumn(t, c, pos) =>
      s"ALTER TABLE ${qt(db, t)} MODIFY COLUMN ${columnSql(c)}${posSql(pos)}"
    case ChangeColumn(t, from, c, pos) =>
      s"ALTER TABLE ${qt(db, t)} CHANGE COLUMN ${q(from)} ${columnSql(c)}${posSql(pos)}"
    case RenameColumn(t, from, to) =>
      s"ALTER TABLE ${qt(db, t)} RENAME COLUMN ${q(from)} TO ${q(to)}"
  }

  /** Full CREATE TABLE for a TableDef (≙ SHOW CREATE TABLE shape). */
  def createTableSql(t: TableDef): String =
    toSql(t.schema, CreateTable(t.name, t.columns))
}
