package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** DDL parse + apply against the FIXTURES.md A.4 evolution script
  * (mirrors `metas/mysql_ddl_parse.go:99-376` +
  * `inputs/mysql/mysql_meta.go:116-123` version bumps). */
class DdlSpec extends AnyFunSuite {

  private def freshRegistry: SchemaRegistry = {
    val reg = new SchemaRegistry
    reg.applySql(
      """CREATE TABLE sbtest1 (
        | id INT NOT NULL PRIMARY KEY,
        | k INT NOT NULL,
        | c CHAR(120) NOT NULL,
        | pad CHAR(60) NOT NULL)""".stripMargin, "db")
    reg
  }

  test("CREATE TABLE parses columns and primary key") {
    val reg = freshRegistry
    val t = reg.current("db", "sbtest1").get
    assert(t.columnNames == Seq("id", "k", "c", "pad"))
    assert(t.pkColumns.map(_.name) == Seq("id"))
    assert(t.version == 0)
  }

  test("CREATE TABLE with PRIMARY KEY constraint clause") {
    val reg = new SchemaRegistry
    reg.applySql(
      "CREATE TABLE t (a INT, b BIGINT, v VARCHAR(10), PRIMARY KEY (a, b))",
      "db")
    val t = reg.current("db", "t").get
    assert(t.pkColumns.map(_.name) == Seq("a", "b"))
  }

  test("A.4 evolution script: each step bumps version with expected shape") {
    val reg = freshRegistry
    def names = reg.current("db", "sbtest1").get.columnNames

    reg.applySql("ALTER TABLE sbtest1 ADD COLUMN e INT AFTER k", "db")
    assert(names == Seq("id", "k", "e", "c", "pad"))
    reg.applySql("ALTER TABLE sbtest1 ADD COLUMN f0 INT FIRST", "db")
    assert(names == Seq("f0", "id", "k", "e", "c", "pad"))
    reg.applySql("ALTER TABLE sbtest1 MODIFY COLUMN c VARCHAR(200)", "db")
    assert(reg.current("db", "sbtest1").get.column("c").get.rawType
      == "VARCHAR(200)")
    assert(names == Seq("f0", "id", "k", "e", "c", "pad"))
    reg.applySql("ALTER TABLE sbtest1 CHANGE COLUMN pad pad2 CHAR(60) AFTER id", "db")
    assert(names == Seq("f0", "id", "pad2", "k", "e", "c"))
    reg.applySql("ALTER TABLE sbtest1 RENAME COLUMN k TO k9", "db")
    assert(names == Seq("f0", "id", "pad2", "k9", "e", "c"))
    reg.applySql("ALTER TABLE sbtest1 DROP COLUMN e", "db")
    assert(names == Seq("f0", "id", "pad2", "k9", "c"))
    assert(reg.current("db", "sbtest1").get.version == 6)

    reg.applySql("RENAME TABLE sbtest1 TO sbtest1_r", "db")
    assert(reg.current("db", "sbtest1").isEmpty)
    assert(reg.current("db", "sbtest1_r").get.columnNames
      == Seq("f0", "id", "pad2", "k9", "c"))
  }

  test("historical versions stay resolvable (version-pinned decode)") {
    val reg = freshRegistry
    reg.applySql("ALTER TABLE sbtest1 DROP COLUMN pad", "db")
    assert(reg.get("db", "sbtest1", 0).get.columnNames
      == Seq("id", "k", "c", "pad"))
    assert(reg.get("db", "sbtest1", 1).get.columnNames == Seq("id", "k", "c"))
  }

  test("multi-clause ALTER expands to per-clause statements") {
    val reg = freshRegistry
    reg.applySql(
      "ALTER TABLE sbtest1 ADD COLUMN x INT, DROP COLUMN c, RENAME COLUMN k TO kk",
      "db")
    val t = reg.current("db", "sbtest1").get
    assert(t.columnNames == Seq("id", "kk", "pad", "x"))
    assert(t.version == 3)
  }

  test("PK survives MODIFY/CHANGE of a pk column") {
    val reg = freshRegistry
    reg.applySql("ALTER TABLE sbtest1 MODIFY COLUMN id BIGINT", "db")
    assert(reg.current("db", "sbtest1").get.pkColumns.map(_.name) == Seq("id"))
    reg.applySql("ALTER TABLE sbtest1 CHANGE COLUMN id id2 BIGINT", "db")
    assert(reg.current("db", "sbtest1").get.pkColumns.map(_.name) == Seq("id2"))
  }

  test("CREATE TABLE LIKE copies schema; DROP removes; TRUNCATE keeps") {
    val reg = freshRegistry
    reg.applySql("CREATE TABLE sbtest2 LIKE sbtest1", "db")
    assert(reg.current("db", "sbtest2").get.columnNames
      == Seq("id", "k", "c", "pad"))
    reg.applySql("TRUNCATE TABLE sbtest2", "db")
    assert(reg.current("db", "sbtest2").isDefined)
    reg.applySql("DROP TABLE sbtest2", "db")
    assert(reg.current("db", "sbtest2").isEmpty)
  }

  test("shadow tables are ignored (gh-ost / DMS / pt-osc)") {
    assert(DdlParser.isShadowTable("_sbtest1_gho"))
    assert(DdlParser.isShadowTable("tp_123_ogt_sbtest1"))
    assert(DdlParser.isShadowTable("tpa_abc123_x"))
    assert(!DdlParser.isShadowTable("sbtest1"))
    val reg = freshRegistry
    val out = reg.applySql("ALTER TABLE _sbtest1_gho ADD COLUMN x INT", "db")
    assert(out.isEmpty)
  }

  test("qualified db.table names override default db") {
    val reg = new SchemaRegistry
    reg.applySql("CREATE TABLE otherdb.t1 (a INT PRIMARY KEY)", "db")
    assert(reg.current("otherdb", "t1").isDefined)
    assert(reg.current("db", "t1").isEmpty)
  }

  test("type mapping covers the 13 reference types") {
    val cases = Map(
      "tinyint" -> ByteType, "smallint" -> ShortType, "int" -> IntegerType,
      "bigint" -> LongType, "year" -> IntegerType, "float" -> FloatType,
      "double" -> DoubleType, "enum('a','b')" -> StringType,
      "set('x')" -> StringType, "varchar(64)" -> StringType,
      "text" -> StringType, "datetime" -> TimestampNTZType,
      "timestamp" -> TimestampType, "date" -> DateType,
      "bit(8)" -> BinaryType, "json" -> StringType,
      "decimal(18,4)" -> DecimalType(18, 4), "decimal(10)" -> DecimalType(10, 0),
      "varbinary(32)" -> BinaryType, "blob" -> BinaryType)
    cases.foreach { case (raw, expect) =>
      assert(MySqlTypes.toSpark(raw) == expect, s"for $raw")
    }
  }

  test("ADD INDEX / constraint / option clauses have no schema effect") {
    val reg = freshRegistry
    val before = reg.current("db", "sbtest1").get
    Seq(
      "ALTER TABLE sbtest1 ADD INDEX idx_k (k)",
      "ALTER TABLE sbtest1 ADD UNIQUE KEY uk (c)",
      "ALTER TABLE sbtest1 ADD CONSTRAINT fk FOREIGN KEY (k) REFERENCES o(id)",
      "ALTER TABLE sbtest1 ADD PRIMARY KEY (id)",
      "ALTER TABLE sbtest1 DROP INDEX idx_k",
      "ALTER TABLE sbtest1 AUTO_INCREMENT = 100"
    ).foreach { sql =>
      reg.applySql(sql, "db")
      assert(reg.current("db", "sbtest1").get.columns == before.columns,
        s"schema must not change for: $sql")
    }
  }

  test("ADD COLUMN dedups case-insensitively (MySQL name semantics)") {
    val reg = freshRegistry
    reg.applySql("ALTER TABLE sbtest1 ADD COLUMN K BIGINT", "db")
    val names = reg.current("db", "sbtest1").get.columnNames
    assert(names.count(_.equalsIgnoreCase("k")) == 1, s"got $names")
  }

  test("BEGIN and unsupported statements parse to None") {
    assert(DdlParser.parse("BEGIN", "db").isEmpty)
    assert(DdlParser.parse("SET NAMES utf8", "db").isEmpty)
  }
}
