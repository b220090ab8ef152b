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
