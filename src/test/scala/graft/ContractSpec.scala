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
