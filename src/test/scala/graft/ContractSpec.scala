package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata schema contract. The driver regenerates
  * /root/testdata between rounds and has silently changed column
  * encodings before (events.ts: int64-nanos → timestamp[us]), which
  * cost a whole round of correctness rows. This spec turns the next
  * silent regeneration into ONE loud failure with a message naming
  * the drift, instead of N scattered DATATYPE_MISMATCH analysis
  * errors.
  */
class ContractSpec extends SparkSpec {

  test("events schema matches the contract (ts drift fails loudly)") {
    val schema = Tables.load(spark, sfDir, "events").schema
    val expected = Map(
      "event_id" -> Set[DataType](LongType),
      "ts" -> Set[DataType](LongType, TimestampType, TimestampNTZType),
      "user_id" -> Set[DataType](LongType),
      "event_type" -> Set[DataType](StringType),
      "value" -> Set[DataType](DoubleType),
      "props" -> Set[DataType](StringType))
    assert(schema.fieldNames.toSet == expected.keySet,
      s"testdata regenerated — events columns are ${schema.fieldNames.mkString(",")}")
    schema.fields.foreach { f =>
      assert(expected(f.name).contains(f.dataType),
        s"testdata regenerated — events.${f.name} is now ${f.dataType} " +
          s"(expected one of ${expected(f.name).mkString("/")}); " +
          "update Tables.normalizeTsNs / the queries for the new encoding")
    }
  }

  test("every testdata table matches its schema contract") {
    // the driver regenerates ALL of /root/testdata between rounds —
    // any column it re-encodes must fail HERE with the table and
    // column named, not as scattered analysis errors across queries.
    // Date-like columns accept date or timestamp encodings (every
    // consumer casts through an instant-preserving path); everything
    // else is pinned to the type the suite was verified against.
    val dateLike = Set[DataType](DateType, TimestampType, TimestampNTZType)
    val contracts: Map[String, Map[String, Set[DataType]]] = Map(
      "region" -> Map("r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
      "nation" -> Map("n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
        "n_regionkey" -> Set(IntegerType)),
      "customer" -> Map("c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
        "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
        "c_mktsegment" -> Set(StringType)),
      "supplier" -> Map("s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
        "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
      "part" -> Map("p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
        "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
        "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
      "orders" -> Map("o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
        "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
        "o_orderdate" -> dateLike, "o_orderpriority" -> Set(StringType)),
      "lineitem" -> Map("l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
        "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
        "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
        "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
        "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
        "l_shipdate" -> dateLike),
      "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
        "lang" -> Set(StringType), "source" -> Set(StringType),
        "n_chars" -> Set(LongType)),
      "embeddings" -> Map("vec_id" -> Set(LongType),
        "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
        "label" -> Set(IntegerType)))
    contracts.foreach { case (table, cols) =>
      val schema = Tables.load(spark, sfDir, table).schema
      assert(schema.fieldNames.toSet == cols.keySet,
        s"testdata regenerated — $table columns are now " +
          s"${schema.fieldNames.mkString(",")} (expected ${cols.keySet.mkString(",")})")
      schema.fields.foreach { f =>
        assert(cols(f.name).contains(f.dataType),
          s"testdata regenerated — $table.${f.name} is now ${f.dataType} " +
            s"(suite verified against ${cols(f.name).mkString("/")}); " +
            "adapt the loaders/queries for the new encoding")
      }
    }
  }

  test("normalizeTsNs: timestamp[us]-style column converts to exact Long ns") {
    import spark.implicits._
    val df = Seq("2024-05-06 07:08:09.123456", "1970-01-01 00:00:00")
      .toDF("raw")
      .select(col("raw").cast(TimestampNTZType).as("ts"))
    val out = Tables.normalizeTsNs(df)
    assert(out.schema("ts").dataType == LongType)
    val got = out.orderBy(col("ts")).as[Long].collect().toSeq
    // UTC session: 2024-05-06T07:08:09.123456Z = 1714979289123456 µs
    assert(got == Seq(0L, 1714979289123456L * 1000L))
  }

  test("normalizeTsNs: Long column passes through untouched") {
    import spark.implicits._
    val df = Seq(42L).toDF("ts")
    assert(Tables.normalizeTsNs(df) eq df)
  }

  test("normalizeTsNs: unexpected type fails with the contract message") {
    import spark.implicits._
    val df = Seq("not-a-time").toDF("ts")
    val e = intercept[IllegalStateException](Tables.normalizeTsNs(df))
    assert(e.getMessage.contains("testdata schema contract broken"))
    assert(e.getMessage.contains("StringType"))
  }

  test("loadEventsNs yields Long ns on the live testdata") {
    val ev = Tables.loadEventsNs(spark, sfDir)
    assert(ev.schema("ts").dataType == LongType)
    assert(ev.limit(1).count() == 1)
  }
}
