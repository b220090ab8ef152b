package graft

import org.apache.spark.sql.Dataset

// top-level case classes so Spark synthesizes Encoders directly
case class LineRow(l_returnflag: String, l_linestatus: String,
    l_quantity: Double, l_extendedprice: Double)
case class FlagStats(flag: String, n: Long, qty: Double)

/** Typed Dataset[T] surface: the engine exposes DataFrames for
  * dynamic schemas (routing, evolution), but case-class Datasets
  * where compile-time field checks help — this spec pins that the
  * typed path produces the same results as the untyped plan over the
  * real testdata. */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("typed groupByKey aggregate matches untyped groupBy") {
    val li: Dataset[LineRow] = Tables.load(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_linestatus", $"l_quantity",
        $"l_extendedprice")
      .as[LineRow]

    val typed = li.groupByKey(_.l_returnflag)
      .mapGroups((flag, rows) => {
        val rs = rows.toSeq
        FlagStats(flag, rs.size.toLong,
          rs.map(r => BigDecimal(r.l_quantity)).sum.toDouble)
      })
      .collect().map(s => s.flag -> (s.n, s.qty)).toMap

    val untyped = li.toDF().groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          $"l_quantity".cast("decimal(18,2)")).as("q"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue())).toMap

    assert(typed == untyped)
  }

  test("typed filter + map pipeline") {
    val flags = Tables.load(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_linestatus", $"l_quantity",
        $"l_extendedprice").as[LineRow]
      .filter(_.l_quantity > 45.0)
      .map(_.l_returnflag)
      .distinct().collect().sorted
    assert(flags.nonEmpty && flags.forall(Set("A", "N", "R")))
  }
}
