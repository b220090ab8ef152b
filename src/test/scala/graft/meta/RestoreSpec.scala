package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

class RestoreSpec extends AnyFunSuite {
  import DdlStatement._

  test("restore normalizes statements to qualified SQL") {
    assert(DdlRestore.toSql("db", AddColumn("t",
      ColumnDef("e", "int"), After("k"))) ==
      "ALTER TABLE `db`.`t` ADD COLUMN `e` int AFTER `k`")
    assert(DdlRestore.toSql("db", ChangeColumn("t", "pad",
      ColumnDef("pad2", "char(60)"), First)) ==
      "ALTER TABLE `db`.`t` CHANGE COLUMN `pad` `pad2` char(60) FIRST")
    assert(DdlRestore.toSql("db", RenameTable("a", "b")) ==
      "RENAME TABLE `db`.`a` TO `db`.`b`")
  }

  test("parse -> restore -> parse round-trips") {
    val sqls = Seq(
      "ALTER TABLE `db`.`t` ADD COLUMN `e` int AFTER `k`",
      "ALTER TABLE `db`.`t` DROP COLUMN `e`",
      "ALTER TABLE `db`.`t` RENAME COLUMN `a` TO `b`",
      "DROP TABLE `db`.`t`",
      "TRUNCATE TABLE `db`.`t`")
    sqls.foreach { sql =>
      val Some((db, Seq(stmt))) = DdlParser.parse(sql, "db")
      assert(DdlRestore.toSql(db, stmt) == sql, s"round-trip of $sql")
    }
  }

  test("createTableSql emits PK clause") {
    val t = TableDef("db", "t", Seq(
      ColumnDef("a", "int", isPrimaryKey = true),
      ColumnDef("b", "varchar(10)")))
    assert(DdlRestore.createTableSql(t) ==
      "CREATE TABLE `db`.`t` (`a` int, `b` varchar(10), PRIMARY KEY (`a`))")
    // and the emitted SQL parses back to the same shape
    val reg = new SchemaRegistry
    reg.applySql(DdlRestore.createTableSql(t), "db")
    assert(reg.current("db", "t").get.pkColumns.map(_.name) == Seq("a"))
  }

  test("fromStruct honors TableDef metadata and explicit pks") {
    val t = TableDef("db", "t", Seq(
      ColumnDef("id", "bigint", isPrimaryKey = true),
      ColumnDef("v", "decimal(18,4)")))
    val back = JdbcMeta.fromStruct("db", "t", t.toStructType)
    assert(back == t)

    val plain = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val td = JdbcMeta.fromStruct("db", "x", plain, pks = Seq("ID"))
    assert(td.pkColumns.map(_.name) == Seq("id"))
    assert(td.column("name").get.rawType == "text")
  }

  test("rawTypeOf inverts the 13-type mapping") {
    Seq("tinyint", "smallint", "int", "bigint", "float", "double",
      "decimal(18,4)", "date", "datetime", "timestamp", "blob")
      .foreach { raw =>
        assert(JdbcMeta.rawTypeOf(MySqlTypes.toSpark(raw)) == raw)
      }
  }
}
