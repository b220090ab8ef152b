package graft.meta

import java.sql.DriverManager

import graft.SparkSpec

/** Schema snapshot load (SURVEY §2 #7-8) against a LIVE JDBC
  * database — in-process Derby (shipped with Spark), standing in for
  * the reference's `SHOW CREATE TABLE` / `information_schema` reads
  * (`inputs/mysql/mysql_meta.go:32-69`,
  * `outputs/starrocks/starrocks_meta.go:31-108`). Exercises the real
  * `spark.read.jdbc` schema resolution and
  * `DatabaseMetaData.getPrimaryKeys` paths, not just the pure
  * StructType conversion. */
class JdbcMetaLiveSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:metadb;create=true"

  test("loadTable resolves columns, types, and composite PK from a live DB") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE T1 (
          |  A BIGINT NOT NULL, B INT NOT NULL,
          |  V VARCHAR(40), D DOUBLE,
          |  PRIMARY KEY (A, B))""".stripMargin)
      st.executeUpdate("INSERT INTO T1 VALUES (1, 2, 'x', 3.5)")
      st.close()
    } finally conn.close()

    val props = new java.util.Properties
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val t = JdbcMeta.loadTable(spark, url, "APP", "T1", props)

    assert(t.schema == "APP" && t.name == "T1")
    assert(t.columnNames == Seq("A", "B", "V", "D"))
    // composite PK resolved via DatabaseMetaData (KEY_SEQ-sorted;
    // note Derby numbers KEY_SEQ by index position, so a reordered
    // declaration is a Derby-specific sequence — column-order PK
    // keeps the assertion portable)
    assert(t.pkColumns.map(_.name) == Seq("A", "B"))
    val byName = t.columns.map(c => c.name -> c.rawType).toMap
    assert(byName("A") == "bigint" && byName("B") == "int")
    assert(byName("V") == "text" && byName("D") == "double")
  }

  test("live JDBC snapshot backfill: remote table → seq=-1 inserts → sink") {
    import org.apache.spark.sql.functions.col
    val props = new java.util.Properties
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val t = JdbcMeta.loadTable(spark, url, "APP", "T1", props)
    val snap = spark.read.jdbc(url, "APP.T1", props)
    val sinkDir = java.nio.file.Files.createTempDirectory("jdbc-bf").toString
    graft.streaming.Backfill.run(spark,
      Map(t -> snap), new graft.sinks.ParquetUpsertSink(sinkDir))
    val rows = spark.read.parquet(s"$sinkDir/APP.T1")
      .select(col("A"), col("B"), col("V"), col("D"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getDouble(3))).toSeq
    assert(rows == Seq((1L, 2, "x", 3.5)))
  }

  test("primaryKeys falls back from catalog to schema namespace (ANSI DBs)") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE T2 (ID BIGINT NOT NULL PRIMARY KEY, X INT)")
      st.close()
    } finally conn.close()
    // Derby has no catalogs: the catalog interpretation of "APP"
    // returns nothing and the schema interpretation must win
    val pks = JdbcMeta.primaryKeys(url, "APP", "T2", new java.util.Properties)
    assert(pks == Seq("ID"))
  }
}
