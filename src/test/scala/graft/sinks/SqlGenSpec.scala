package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{ColumnDef, TableDef}

class SqlGenSpec extends AnyFunSuite {

  private val t = TableDef("db", "t", Seq(
    ColumnDef("id", "int", isPrimaryKey = true),
    ColumnDef("k", "int"),
    ColumnDef("c", "varchar(120)")))

  private val multiPk = TableDef("db", "m", Seq(
    ColumnDef("tenant", "int", isPrimaryKey = true),
    ColumnDef("id", "bigint", isPrimaryKey = true),
    ColumnDef("v", "varchar(10)")))

  test("upsert SQL: multi-row VALUES + non-pk update clause") {
    val rows = Seq(
      Map[String, Any]("id" -> 1, "k" -> 10, "c" -> "a"),
      Map[String, Any]("id" -> 2, "k" -> 20, "c" -> "b"))
    val (sql, binds) = SqlGen.upsertSql(t, rows)
    assert(sql ==
      "INSERT INTO `db`.`t` (`id`,`k`,`c`) VALUES (?,?,?),(?,?,?)" +
        " ON DUPLICATE KEY UPDATE `k`=VALUES(`k`), `c`=VALUES(`c`)")
    assert(binds == Seq(1, 10, "a", 2, 20, "b"))
  }

  test("single-PK bulk delete uses IN list") {
    val rows = Seq(Map[String, Any]("id" -> 1), Map[String, Any]("id" -> 2))
    val (sql, binds) = SqlGen.deleteSql(t, rows)
    assert(sql == "DELETE FROM `db`.`t` WHERE `id` IN (?,?)")
    assert(binds == Seq(1, 2))
  }

  test("multi-PK delete binds real tuple values " +
    "(reference nil-binding bug fixed, mysql_utils.go:98-105)") {
    val rows = Seq(
      Map[String, Any]("tenant" -> 1, "id" -> 10L, "v" -> "x"),
      Map[String, Any]("tenant" -> 2, "id" -> 20L, "v" -> "y"))
    val (sql, binds) = SqlGen.deleteSql(multiPk, rows)
    assert(sql == "DELETE FROM `db`.`m` WHERE " +
      "(`tenant`=? AND `id`=?) OR (`tenant`=? AND `id`=?)")
    assert(binds == Seq(1, 10L, 2, 20L))
    assert(!binds.contains(null), "the reference bug bound nils here")
  }

  test("all-PK table upsert stays valid SQL") {
    val allPk = TableDef("db", "p", Seq(
      ColumnDef("a", "int", isPrimaryKey = true),
      ColumnDef("b", "int", isPrimaryKey = true)))
    val (sql, _) = SqlGen.upsertSql(allPk, Seq(Map("a" -> 1, "b" -> 2)))
    assert(sql.endsWith("ON DUPLICATE KEY UPDATE `a`=`a`"))
  }

  test("missing columns bind null") {
    val (_, binds) = SqlGen.upsertSql(t, Seq(Map[String, Any]("id" -> 1)))
    assert(binds == Seq(1, null, null))
  }
}
