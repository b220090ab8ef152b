package graft.meta

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.TargetMeta.InfoSchemaRow

/** Dialect meta loaders against RECORDED information_schema.columns
  * rows — the row shape the reference's per-target loaders consume
  * (`outputs/starrocks/starrocks_meta.go:46-101`,
  * `outputs/doris/doris_meta.go:50-110`); the sandbox has no live
  * SR/Doris, so fixtures stand in for the wire. */
class TargetMetaSpec extends AnyFunSuite {

  private def row(name: String, dataType: String, columnType: String,
      key: String = "", nullable: String = "YES") =
    InfoSchemaRow(name, None, nullable, dataType, columnType, key)

  // A StarRocks PRIMARY KEY table using the OLAP-only types a generic
  // JDBC read mistypes.
  private val srRows = Seq(
    row("id", "largeint", "largeint", key = "PRI", nullable = "NO"),
    row("name", "varchar", "varchar(64)"),
    row("price", "decimal64", "decimal64(10, 2)"),
    row("ratio", "decimalv2", "decimalv2(27, 9)"),
    row("uv_sketch", "hll", "hll"),
    row("user_bitmap", "bitmap", "bitmap"),
    row("latency_pct", "percentile", "percentile"),
    row("tags", "array", "array<int(11)>"),
    row("payload", "json", "json"),
    row("born", "date", "date"),
    row("updated", "datetime", "datetime"))

  test("StarRocks: largeint/hll/bitmap/decimal64/array resolve per dialect") {
    val st = TargetMeta.structType("db", "t", srRows, TargetMeta.StarRocks)
    val types = st.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == DecimalType(38, 0)) // int128 → widest exact
    assert(types("name") == StringType)
    assert(types("price") == DecimalType(10, 2))
    assert(types("ratio") == DecimalType(27, 9))
    assert(types("uv_sketch") == BinaryType) // opaque sketch state
    assert(types("user_bitmap") == BinaryType)
    assert(types("latency_pct") == BinaryType)
    assert(types("tags") == ArrayType(IntegerType))
    assert(types("payload") == StringType)
    assert(types("born") == DateType)
    assert(types("updated") == TimestampNTZType) // civil datetime
  }

  test("StarRocks: TableDef keeps PRI flag, rawType, nullability") {
    val t = TargetMeta.fromInfoSchema("db", "t", srRows, TargetMeta.StarRocks)
    assert(t.pkColumns.map(_.name) == Seq("id"))
    assert(t.column("price").get.rawType == "decimal64(10, 2)")
    val st = TargetMeta.structType("db", "t", srRows, TargetMeta.StarRocks)
    assert(!st("id").nullable && st("name").nullable)
    assert(st("uv_sketch").metadata.getString("rawType") == "hll")
  }

  // A Doris UNIQUE KEY table exercising the v2/v3 type names and the
  // aggregate-state types.
  private val dorisRows = Seq(
    row("k", "bigint", "bigint(20)", key = "PRI", nullable = "NO"),
    row("big", "largeint", "largeint"),
    row("amt", "decimalv3", "decimalv3(20, 4)"),
    row("d", "datev2", "datev2"),
    row("ts", "datetimev2", "datetimev2(3)"),
    row("q", "quantile_state", "quantile_state"),
    row("ag", "agg_state", "agg_state<max(int(11))>"),
    row("m", "map", "map<varchar(10),decimal(10,2)>"),
    row("s", "struct", "struct<a:int(11),b:varchar(5)>"),
    row("j", "jsonb", "jsonb"))

  test("Doris: v2/v3 names, quantile/agg state, map/struct resolve") {
    val st = TargetMeta.structType("db", "t", dorisRows, TargetMeta.Doris)
    val types = st.fields.map(f => f.name -> f.dataType).toMap
    assert(types("k") == LongType)
    assert(types("big") == DecimalType(38, 0))
    assert(types("amt") == DecimalType(20, 4))
    assert(types("d") == DateType)
    assert(types("ts") == TimestampNTZType)
    assert(types("q") == BinaryType)
    assert(types("ag") == BinaryType)
    // map args split on the TOP-LEVEL comma only — the decimal(10,2)
    // comma must not break the parse
    assert(types("m") == MapType(StringType, DecimalType(10, 2)))
    assert(types("s") == StringType) // struct degrades, rawType kept
    assert(types("j") == StringType)
  }

  test("undeclared decimal precision falls back to the SR/Doris default") {
    assert(TargetMeta.StarRocks.toSpark("decimal", "decimal") ==
      DecimalType(38, 9))
  }

  test("unknown future types degrade to string, never error") {
    assert(TargetMeta.Doris.toSpark("inverted_index_v9", "inverted_index_v9")
      == StringType)
  }

  test("fromRows (the live-load composition) carries the dialect schema") {
    // the live `load` path returns fromRows' result verbatim — this
    // pins that a caller gets the DIALECT-resolved schema, not the
    // MySQL-map mistyping of OLAP columns (largeint/hll → string)
    val tt = TargetMeta.fromRows("db", "t", srRows, TargetMeta.StarRocks)
    assert(tt.table.pkColumns.map(_.name) == Seq("id"))
    assert(tt.schema("id").dataType == DecimalType(38, 0))
    assert(tt.schema("uv_sketch").dataType == BinaryType)
    assert(tt.schema("name").nullable && !tt.schema("id").nullable)
  }

  test("zero rows fails loudly — reference parity ('load meta not found')") {
    val e = intercept[IllegalArgumentException] {
      TargetMeta.fromInfoSchema("db", "missing", Nil, TargetMeta.StarRocks)
    }
    assert(e.getMessage.contains("load meta db.missing not found"))
  }
}
