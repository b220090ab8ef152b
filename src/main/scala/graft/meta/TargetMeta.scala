package graft.meta

import org.apache.spark.sql.types._

/** Target-side schema snapshot loading, dialect-aware — ≙ the
  * reference's per-sink meta loaders
  * (`outputs/starrocks/starrocks_meta.go:31-108`,
  * `outputs/doris/doris_meta.go:50-110`).
  *
  * The reference connects to the TARGET over the MySQL protocol and
  * runs
  * {{{
  * SELECT column_name, column_default, is_nullable, data_type,
  *        column_type, column_key
  * FROM information_schema.columns
  * WHERE table_schema = ? AND table_name = ?
  * ORDER BY ordinal_position
  * }}}
  * then maps `data_type` into its coarse type enum, defaulting
  * unknown types to string. A generic JDBC read (JdbcMeta.loadTable)
  * is wrong for the OLAP-only types StarRocks/Doris report here —
  * LARGEINT (int128), HLL / BITMAP / PERCENTILE / QUANTILE_STATE
  * (opaque sketch state), ARRAY&lt;…&gt;, DECIMAL32/64/128 / DECIMALV3 —
  * so each target gets a dialect table keyed on the
  * `information_schema.data_type` string.
  *
  * The row-shape → TableDef/StructType conversion is pure and
  * fixture-tested (the sandbox has no live SR/Doris; recorded rows
  * stand in for the wire). Only [[TargetMeta.loadTable]] touches JDBC.
  */
object TargetMeta {

  /** One `information_schema.columns` row, exactly the six columns
    * the reference selects. */
  final case class InfoSchemaRow(
      columnName: String,
      columnDefault: Option[String],
      isNullable: String, // "YES" | "NO"
      dataType: String, // e.g. "largeint", "decimal64"
      columnType: String, // e.g. "decimal64(10, 2)", "array<int(11)>"
      columnKey: String) // "PRI" | "UNI" | "MUL" | ""

  /** data_type → Spark mapping for one target family. */
  sealed trait MetaDialect {
    def name: String

    /** Dialect-specific overrides; fall through to [[sharedOlap]]
      * then MySqlTypes. */
    protected def specific: PartialFunction[String, DataType] =
      PartialFunction.empty

    def toSpark(dataType: String, columnType: String): DataType = {
      val dt = dataType.trim.toLowerCase
      specific.applyOrElse(dt, sharedOlap(columnType))
    }

    /** The OLAP types both SR and Doris report, which the MySQL
      * mapping mistypes or doesn't know:
      *   - LARGEINT is int128 → DecimalType(38,0), the widest exact
      *     integer Spark offers (values above 38 digits — the top
      *     ~2% of the int128 range — would overflow; documented
      *     boundary, same one every Spark↔SR connector has).
      *   - HLL / BITMAP / PERCENTILE / QUANTILE_STATE / AGG_STATE
      *     are opaque aggregate sketch state → BinaryType (they are
      *     only meaningful to the target's own agg functions; rawType
      *     on the ColumnDef preserves the declared type).
      *   - DECIMAL32/64/128, DECIMALV2/V3 carry (p,s) in column_type.
      *   - ARRAY / MAP recurse on the column_type argument(s);
      *     STRUCT degrades to StringType (JSON rendering) with the
      *     declared type preserved in rawType.
      */
    private def sharedOlap(columnType: String): String => DataType = {
      case "largeint" => DecimalType(38, 0)
      case "hll" | "bitmap" | "percentile" | "quantile_state" |
           "agg_state" => BinaryType
      case "decimal" | "decimalv2" | "decimal32" | "decimal64" |
           "decimal128" | "decimalv3" =>
        parseDecimal(columnType)
      case "array" => ArrayType(parseNested(innerOf(columnType)))
      case "map" =>
        splitTopLevel(innerOf(columnType)) match {
          case Seq(k, v) => MapType(parseNested(k), parseNested(v))
          case _ => StringType
        }
      case "struct" | "json" | "jsonb" | "variant" => StringType
      case "string" => StringType
      case "boolean" => BooleanType
      case "date" | "datev2" => DateType
      // OLAP targets store civil (zone-less) datetimes
      case "datetime" | "datetimev2" => TimestampNTZType
      case other => MySqlTypes.toSpark(other)
    }

    /** Parse a nested type rendering from column_type (recursive for
      * array/map; e.g. "array<int(11)>", "map<varchar(10),int(11)>"). */
    private def parseNested(s: String): DataType = {
      val t = s.trim
      val base = t.takeWhile(c => c != '(' && c != '<').trim.toLowerCase
      toSpark(base, t)
    }
  }

  private val DecimalRe = """(?i)decimal\w*\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r

  private def parseDecimal(columnType: String): DataType =
    DecimalRe.findFirstMatchIn(columnType) match {
      case Some(m) =>
        DecimalType(m.group(1).toInt, Option(m.group(2)).map(_.toInt).getOrElse(0))
      case None => DecimalType(38, 9) // SR/Doris default when undeclared
    }

  /** "array<int(11)>" → "int(11)"; tolerant of missing brackets. */
  private def innerOf(columnType: String): String = {
    val a = columnType.indexOf('<')
    val b = columnType.lastIndexOf('>')
    if (a >= 0 && b > a) columnType.substring(a + 1, b) else ""
  }

  /** Split map type args on the top-level comma only (nested
    * decimal(10,2) / array<…> commas don't count). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case c @ ('<' | '(') => depth += 1; cur += c
      case c @ ('>' | ')') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** StarRocks — `outputs/starrocks/starrocks_meta.go:68-93`. */
  case object StarRocks extends MetaDialect {
    val name = "starrocks"
  }

  /** Doris — `outputs/doris/doris_meta.go:73-97`. Doris additionally
    * reports the v2 date/datetime and decimalv3 names, covered by the
    * shared table. */
  case object Doris extends MetaDialect {
    val name = "doris"
  }

  /** Pure conversion: recorded information_schema rows → TableDef.
    * Mirrors the reference loop (`starrocks_meta.go:64-101`): rawType
    * keeps the full `column_type` rendering, `column_key = "PRI"`
    * marks the primary key, zero rows is a loud error
    * ("load meta %s.%s not found"). */
  def fromInfoSchema(db: String, table: String, rows: Seq[InfoSchemaRow],
      dialect: MetaDialect): TableDef = {
    require(rows.nonEmpty, s"load meta $db.$table not found (${dialect.name})")
    TableDef(db, table, rows.map(r =>
      ColumnDef(r.columnName, r.columnType, isPrimaryKey = r.columnKey == "PRI")))
  }

  /** The dialect-resolved Spark schema for a target table. (TableDef
    * .toStructType maps rawType through the MySQL table — correct for
    * the SOURCE side; target columns need their dialect.) */
  def structType(db: String, table: String, rows: Seq[InfoSchemaRow],
      dialect: MetaDialect): StructType =
    StructType(rows.map { r =>
      StructField(r.columnName, dialect.toSpark(r.dataType, r.columnType),
        nullable = !r.isNullable.equalsIgnoreCase("NO"),
        new MetadataBuilder().putString("rawType", r.columnType)
          .putBoolean("isPrimaryKey", r.columnKey == "PRI").build())
    })

  /** A loaded target table: the engine's TableDef (rawType keeps the
    * declared SR/Doris rendering; note its `sparkType`/`toStructType`
    * resolve through the SOURCE-side MySQL map and will mistype OLAP
    * columns) AND the dialect-resolved Spark schema, which is the one
    * to write/cast against. */
  final case class TargetTable(table: TableDef, schema: StructType)

  /** Pure composition used by [[load]]: rows → TableDef + dialect
    * schema in one step, so the live path cannot drop the dialect
    * mapping. */
  def fromRows(db: String, table: String, rows: Seq[InfoSchemaRow],
      dialect: MetaDialect): TargetTable =
    TargetTable(fromInfoSchema(db, table, rows, dialect),
      structType(db, table, rows, dialect))

  /** The reference's exact meta query (`starrocks_meta.go:46-50`). */
  val InfoSchemaSql: String =
    "SELECT column_name, column_default, is_nullable, data_type, " +
      "column_type, column_key FROM information_schema.columns " +
      "WHERE table_schema = ? AND table_name = ? ORDER BY ordinal_position"

  /** Live-target load over the MySQL wire protocol (SR/Doris FE
    * speak it) — the thin untested JDBC edge; everything else is the
    * tested pure path. */
  def load(url: String, db: String, table: String,
      dialect: MetaDialect,
      props: java.util.Properties = new java.util.Properties): TargetTable = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val ps = conn.prepareStatement(InfoSchemaSql)
      ps.setString(1, db)
      ps.setString(2, table)
      val rs = ps.executeQuery()
      val rows = Seq.newBuilder[InfoSchemaRow]
      while (rs.next()) rows += InfoSchemaRow(
        rs.getString(1), Option(rs.getString(2)), rs.getString(3),
        rs.getString(4), rs.getString(5), rs.getString(6))
      fromRows(db, table, rows.result(), dialect)
    } finally conn.close()
  }
}
