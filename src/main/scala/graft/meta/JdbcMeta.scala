package graft.meta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Schema snapshot loading ≙ `inputs/mysql/mysql_meta.go:32-69` and
  * the per-sink meta loaders (SHOW CREATE TABLE / information_schema
  * → Table).
  *
  * Spark-native: `spark.read.jdbc` resolves the remote schema
  * through the JDBC dialect; [[fromStruct]] converts the resolved
  * StructType into the engine's TableDef (PKs supplied separately —
  * JDBC metadata exposes them via `java.sql.DatabaseMetaData
  * .getPrimaryKeys`, which [[loadTable]] consults when a live
  * connection exists). The StructType↔TableDef conversion is pure
  * and unit-tested; the JDBC call is a thin wrapper.
  */
object JdbcMeta {

  /** Spark type → MySQL raw type (inverse of MySqlTypes.toSpark,
    * for round-tripping schemas into DDL). */
  def rawTypeOf(dt: DataType): String = dt match {
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case StringType => "text"
    case BinaryType => "blob"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampNTZType => "datetime"
    case TimestampType => "timestamp"
    case _: DayTimeIntervalType => "time"
    case other => other.simpleString
  }

  /** Pure conversion: resolved StructType → TableDef. Field metadata
    * `rawType`/`isPrimaryKey` (as written by TableDef.toField) is
    * honored when present, so the conversion round-trips. */
  def fromStruct(db: String, table: String, schema: StructType,
      pks: Seq[String] = Nil): TableDef = {
    val cols = schema.fields.map { f =>
      val raw =
        if (f.metadata.contains("rawType")) f.metadata.getString("rawType")
        else rawTypeOf(f.dataType)
      val pk = pks.exists(_.equalsIgnoreCase(f.name)) ||
        (f.metadata.contains("isPrimaryKey") &&
          f.metadata.getBoolean("isPrimaryKey"))
      ColumnDef(f.name, raw, isPrimaryKey = pk)
    }
    TableDef(db, table, cols.toIndexedSeq)
  }

  /** Load a remote table's schema via JDBC (needs a reachable DB;
    * everything after the `.jdbc` call is the tested pure path). */
  def loadTable(spark: SparkSession, url: String, db: String, table: String,
      props: java.util.Properties = new java.util.Properties): TableDef = {
    val schema = spark.read.jdbc(url, s"$db.$table", props).schema
    val pks = primaryKeys(url, db, table, props)
    fromStruct(db, table, schema, pks)
  }

  /** PK names via JDBC DatabaseMetaData (≙ the reference reading
    * COLUMN_KEY='PRI' from information_schema), in KEY_SEQ order.
    *
    * `db` is tried as the CATALOG first (MySQL maps databases to
    * catalogs), then as the SCHEMA (Derby/Postgres/ANSI map them to
    * schemas and reject or ignore a catalog) — same namespace
    * probing the reference hardcodes per target in its *_meta.go
    * loaders. */
  def primaryKeys(url: String, db: String, table: String,
      props: java.util.Properties): Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      def fetch(catalog: String, schema: String): Seq[String] = {
        val rs = conn.getMetaData.getPrimaryKeys(catalog, schema, table)
        val out = Seq.newBuilder[(Short, String)]
        while (rs.next())
          out += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
        out.result().sortBy(_._1).map(_._2)
      }
      val asCatalog = fetch(db, null)
      if (asCatalog.nonEmpty) asCatalog else fetch(null, db)
    } finally conn.close()
  }
}
