package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{ColumnDef, DdlStatement => D, TableDef}

/** Dialect rendering for the DDL forwarder — pure string generation,
  * no database (the live-Derby path is in SchemaEvolutionSpec). */
class DdlForwardSpec extends AnyFunSuite {

  private val t = TableDef("db1", "orders", Nil)
  private val bare = TableDef("", "t1", Nil)

  test("mysql dialect renders the full ALTER surface with positioning") {
    val d = DdlForward.MySql
    assert(DdlForward.alterSql(d, t,
      D.AddColumn("orders", ColumnDef("note", "varchar(32)"),
        D.After("status"))) ==
      Some(Seq("ALTER TABLE `db1`.`orders` ADD COLUMN `note` varchar(32)" +
        " AFTER `status`")))
    assert(DdlForward.alterSql(d, t,
      D.AddColumn("orders", ColumnDef("first", "int"), D.First)) ==
      Some(Seq("ALTER TABLE `db1`.`orders` ADD COLUMN `first` int FIRST")))
    assert(DdlForward.alterSql(d, t, D.DropColumn("orders", "note")) ==
      Some(Seq("ALTER TABLE `db1`.`orders` DROP COLUMN `note`")))
    assert(DdlForward.alterSql(d, t,
      D.ModifyColumn("orders", ColumnDef("qty", "bigint"), D.Default)) ==
      Some(Seq("ALTER TABLE `db1`.`orders` MODIFY COLUMN `qty` bigint")))
    assert(DdlForward.alterSql(d, t,
      D.ChangeColumn("orders", "qty", ColumnDef("quantity", "bigint"),
        D.Default)) ==
      Some(Seq("ALTER TABLE `db1`.`orders` CHANGE COLUMN `qty` `quantity`" +
        " bigint")))
    assert(DdlForward.alterSql(d, t, D.RenameColumn("orders", "a", "b")) ==
      Some(Seq("ALTER TABLE `db1`.`orders` RENAME COLUMN `a` TO `b`")))
    assert(DdlForward.alterSql(d, t, D.TruncateTable("orders")) ==
      Some(Seq("TRUNCATE TABLE `db1`.`orders`")))
  }

  test("derby dialect maps types, drops positioning, falls back on MODIFY") {
    val d = DdlForward.Derby
    // position silently ignored (bind-by-name upserts don't need it)
    assert(DdlForward.alterSql(d, bare,
      D.AddColumn("t1", ColumnDef("note", "text"), D.After("k"))) ==
      Some(Seq("ALTER TABLE \"t1\" ADD COLUMN \"note\" LONG VARCHAR")))
    assert(DdlForward.alterSql(d, bare,
      D.AddColumn("t1", ColumnDef("ts", "datetime"), D.Default)) ==
      Some(Seq("ALTER TABLE \"t1\" ADD COLUMN \"ts\" TIMESTAMP")))
    // Derby's rename is a top-level statement
    assert(DdlForward.alterSql(d, bare, D.RenameColumn("t1", "a", "b")) ==
      Some(Seq("RENAME COLUMN \"t1\".\"a\" TO \"b\"")))
    // no general type MODIFY → restart-protocol fallback
    assert(DdlForward.alterSql(d, bare,
      D.ModifyColumn("t1", ColumnDef("k", "bigint"), D.Default)).isEmpty)
    assert(DdlForward.alterSql(d, bare,
      D.ChangeColumn("t1", "k", ColumnDef("k2", "bigint"),
        D.Default)).isEmpty)
  }

  test("table-level statements stay on the restart protocol") {
    for (d <- Seq(DdlForward.MySql, DdlForward.Derby)) {
      assert(DdlForward.alterSql(d, t,
        D.CreateTable("orders", Nil)).isEmpty)
      assert(DdlForward.alterSql(d, t, D.DropTable("orders")).isEmpty)
      assert(DdlForward.alterSql(d, t,
        D.RenameTable("orders", "orders2")).isEmpty)
    }
  }

  /** Minimal MySQL-Connector/J-shaped JDBC metadata fake: with
    * databaseTerm=CATALOG the driver IGNORES the schemaPattern
    * argument entirely, and a null catalog means ALL databases. The
    * replay-idempotence probe must therefore not trust a bare
    * `rs.next()` — it has to check the returned row's TABLE_CAT
    * against the routed database, or a same-named table in another
    * database makes a fresh ALTER look like a completed replay. */
  private class MySqlShapedConn(
      rows: Seq[(String, String, String)], // (catalog, table, column)
      val executed: scala.collection.mutable.Buffer[String],
      // Postgres-shaped variant: rows carry a SCHEMA (reported in
      // TABLE_SCHEM), the schemaPattern argument IS honored, and
      // TABLE_CAT reports the connected database's name for every row
      schemaOf: Map[(String, String, String), String] = Map.empty,
      honorSchemaPattern: Boolean = false,
      // connection-level current namespace (JDBC getCatalog/getSchema)
      // — what the schema-less replay probe resolves against
      curCatalog: String = null,
      curSchema: String = null) {
    import java.lang.reflect.{InvocationHandler, Method, Proxy}
    import java.sql.{Connection, DatabaseMetaData, ResultSet, Statement}

    private def mk[T](cls: Class[T])(h: (String, Array[AnyRef]) => AnyRef): T =
      Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
        new InvocationHandler {
          def invoke(p: AnyRef, m: Method, a: Array[AnyRef]): AnyRef =
            h(m.getName, if (a == null) Array.empty else a)
        }).asInstanceOf[T]

    private def unesc(p: String): String = p.replace("\\", "")
    private def rsOver(hits: Seq[(String, String, String)]): ResultSet = {
      var i = -1
      mk(classOf[ResultSet]) {
        case ("next", _) => i += 1; java.lang.Boolean.valueOf(i < hits.length)
        case ("getString", a) => a(0).asInstanceOf[String] match {
          case "TABLE_CAT" => hits(i)._1
          case "TABLE_SCHEM" => // Connector/J reports null schema
            schemaOf.get(hits(i)).orNull
          case other => sys.error(s"unexpected column $other")
        }
        case ("close", _) => null
        case (n, _) => sys.error(s"unexpected ResultSet.$n")
      }
    }
    private val md = mk(classOf[DatabaseMetaData]) {
      case ("getSearchStringEscape", _) => "\\"
      case ("getColumns", a) =>
        val cat = a(0).asInstanceOf[String] // exact, null = ALL dbs
        // schemaPattern: IGNORED in Connector/J CATALOG mode,
        // honored by schema-position drivers
        val schPat = Option(a(1).asInstanceOf[String]).map(unesc)
        val tbl = unesc(a(2).asInstanceOf[String])
        val col = unesc(a(3).asInstanceOf[String])
        rsOver(rows.filter { case r @ (c, t, n) =>
          (cat == null || c.equalsIgnoreCase(cat)) &&
            (!honorSchemaPattern || schPat.forall(sp =>
              schemaOf.get(r).exists(_.equalsIgnoreCase(sp)))) &&
            t.equalsIgnoreCase(tbl) && n.equalsIgnoreCase(col) })
      case (n, _) => sys.error(s"unexpected DatabaseMetaData.$n")
    }
    val conn: Connection = mk(classOf[Connection]) {
      case ("getMetaData", _) => md
      case ("getCatalog", _) => curCatalog
      case ("getSchema", _) => curSchema
      case ("createStatement", _) => mk(classOf[Statement]) {
        case ("executeUpdate", a) =>
          executed += a(0).asInstanceOf[String]; Integer.valueOf(0)
        case ("close", _) => null
        case (n, _) => sys.error(s"unexpected Statement.$n")
      }
      case ("close", _) => null
      case (n, _) => sys.error(s"unexpected Connection.$n")
    }
  }

  test("replay probe is catalog-exact on MySQL-shaped metadata " +
      "(same-named table in another database is NOT a completed replay)") {
    val executed = scala.collection.mutable.Buffer.empty[String]
    // db 'other' already has orders.note; routed db1.orders does not
    val fake = new MySqlShapedConn(
      Seq(("other", "orders", "note"), ("db1", "orders", "status")), executed)
    val fw = new JdbcDdlForwarder(() => fake.conn, DdlForward.MySql)
    val add = D.AddColumn("orders",
      ColumnDef("note", "varchar(32)"), D.Default)
    assert(fw.forward(add, t)) // must EXECUTE, not skip
    assert(executed ==
      Seq("ALTER TABLE `db1`.`orders` ADD COLUMN `note` varchar(32)"))

    // and once db1 itself has the column, the replay IS a no-op
    executed.clear()
    val fake2 = new MySqlShapedConn(
      Seq(("other", "orders", "note"), ("db1", "orders", "note")), executed)
    val fw2 = new JdbcDdlForwarder(() => fake2.conn, DdlForward.MySql)
    assert(fw2.forward(add, t))
    assert(executed.isEmpty)
  }

  test("replay probe is schema-exact on Postgres-shaped metadata " +
      "(a db named like the schema cannot vouch for another schema's column)") {
    // schema-position driver: database ALSO named 'db1' (= the routed
    // schema name), orders.note exists only in schema 'public'. The
    // probe's catalog-position pass returns that row with
    // TABLE_CAT='db1' — the namespace-aware acceptance must reject it
    // because the row REPORTS a schema ('public') that is not the
    // routed one, so the ALTER executes instead of being skipped.
    val executed = scala.collection.mutable.Buffer.empty[String]
    val row = ("db1", "orders", "note")
    val fake = new MySqlShapedConn(Seq(row), executed,
      schemaOf = Map(row -> "public"), honorSchemaPattern = true)
    val fw = new JdbcDdlForwarder(() => fake.conn, DdlForward.MySql)
    val add = D.AddColumn("orders",
      ColumnDef("note", "varchar(32)"), D.Default)
    assert(fw.forward(add, t))
    assert(executed ==
      Seq("ALTER TABLE `db1`.`orders` ADD COLUMN `note` varchar(32)"))
    // and when the column exists in the ROUTED schema, the replay IS
    // a no-op — the schemaPattern-position probe finds it
    executed.clear()
    val row2 = ("db1", "orders", "note")
    val fake2 = new MySqlShapedConn(Seq(row2), executed,
      schemaOf = Map(row2 -> "db1"), honorSchemaPattern = true)
    val fw2 = new JdbcDdlForwarder(() => fake2.conn, DdlForward.MySql)
    assert(fw2.forward(add, t))
    assert(executed.isEmpty)
  }

  test("schema-less replay probe resolves the connection's own database " +
      "(a same-named table in ANY other database is NOT a completed replay)") {
    val add = D.AddColumn("t1", ColumnDef("note", "varchar(32)"), D.Default)
    // MySQL-shaped (catalog position): connected to db1; t1.note
    // exists only in 'other' — the null-catalog probe RETURNS that
    // row, and the old bare-rs.next() acceptance skipped the ALTER
    val executed = scala.collection.mutable.Buffer.empty[String]
    val fake = new MySqlShapedConn(
      Seq(("other", "t1", "note"), ("db1", "t1", "status")), executed,
      curCatalog = "db1")
    val fw = new JdbcDdlForwarder(() => fake.conn, DdlForward.MySql)
    assert(fw.forward(add, bare)) // must EXECUTE, not skip
    assert(executed == Seq("ALTER TABLE `t1` ADD COLUMN `note` varchar(32)"))
    // once the CONNECTED database has the column, the replay IS a no-op
    executed.clear()
    val fake2 = new MySqlShapedConn(
      Seq(("other", "t1", "note"), ("db1", "t1", "note")), executed,
      curCatalog = "db1")
    val fw2 = new JdbcDdlForwarder(() => fake2.conn, DdlForward.MySql)
    assert(fw2.forward(add, bare))
    assert(executed.isEmpty)

    // schema-position driver (Derby/Postgres shape): current schema
    // APP; the column exists only in schema OTHER → execute
    executed.clear()
    val row = ("db1", "t1", "note")
    val fake3 = new MySqlShapedConn(Seq(row), executed,
      schemaOf = Map(row -> "OTHER"), honorSchemaPattern = true,
      curCatalog = "db1", curSchema = "APP")
    val fw3 = new JdbcDdlForwarder(() => fake3.conn, DdlForward.MySql)
    assert(fw3.forward(add, bare))
    assert(executed == Seq("ALTER TABLE `t1` ADD COLUMN `note` varchar(32)"))
    // and in the CURRENT schema → completed replay, no-op
    executed.clear()
    val fake4 = new MySqlShapedConn(Seq(row), executed,
      schemaOf = Map(row -> "APP"), honorSchemaPattern = true,
      curCatalog = "db1", curSchema = "APP")
    val fw4 = new JdbcDdlForwarder(() => fake4.conn, DdlForward.MySql)
    assert(fw4.forward(add, bare))
    assert(executed.isEmpty)
  }

  test("derby type map covers the MySQL family, escapes unknowns to text") {
    import DdlForward.derbyType
    assert(derbyType("int") == "INTEGER")
    assert(derbyType("TINYINT") == "SMALLINT")
    assert(derbyType("varchar(64)") == "VARCHAR(64)")
    assert(derbyType("decimal(12,2)") == "DECIMAL(12,2)")
    assert(derbyType("json") == "LONG VARCHAR")
    assert(derbyType("double") == "DOUBLE")
    assert(derbyType("float") == "REAL")
    assert(derbyType("mediumblob") == "BLOB")
    assert(derbyType("sometype9") == "LONG VARCHAR")
  }
}
