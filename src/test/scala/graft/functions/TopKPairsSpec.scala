package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"s".desc, $"id")
    df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"g", $"id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
  }

  private def viaHeap(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g")
      .agg(call_function("topk_pairs", $"s", $"id", lit(k)).as("tk"))
      .select($"g", posexplode($"tk"))
      .select($"g", $"col.id", ($"pos" + 1).as("rank"))
      .as[(Long, Long, Int)].collect().toSet

  test("equals the (score desc, id asc) window rank on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 2000L).map(i =>
      (i % 13, i, rnd.nextInt(50).toDouble)) // heavy score ties
    val df = rows.toDF("g", "id", "s").repartition(7, $"id")
    Seq(1, 3, 10, 500).foreach { k =>
      assert(viaHeap(df, k) == viaWindow(df, k), s"k=$k")
    }
  }

  test("merges across partitions: map-side heaps agree with one task") {
    val rows = (1L to 500L).map(i => (0L, i, (i % 7).toDouble))
    val many = rows.toDF("g", "id", "s").repartition(16)
    val one = rows.toDF("g", "id", "s").coalesce(1)
    assert(viaHeap(many, 9) == viaHeap(one, 9))
  }

  test("partial aggregation: the exchange carries heaps, not rows") {
    val df = (1L to 100L).map(i => (i % 4, i, i.toDouble)).toDF("g", "id", "s")
    val agg = df.groupBy($"g")
      .agg(call_function("topk_pairs", $"s", $"id", lit(5)).as("tk"))
    val plan = agg.queryExecution.executedPlan.toString
    val objAggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(objAggs >= 2, s"expected partial+final ObjectHashAggregate:\n$plan")
  }

  test("null score or id is skipped; empty group yields empty array") {
    val df = Seq(
      (1L, java.lang.Long.valueOf(10L), java.lang.Double.valueOf(5.0)),
      (1L, null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(9.0)),
      (1L, java.lang.Long.valueOf(11L), null.asInstanceOf[java.lang.Double]),
      (2L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[java.lang.Double])
    ).toDF("g", "id", "s")
    val out = df.groupBy($"g")
      .agg(call_function("topk_pairs", $"s", $"id", lit(3)).as("tk"))
      .select($"g", size($"tk").as("n")).as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 2L -> 0))
  }

  test("NaN ranks above every finite score (IEEE total order)") {
    val df = Seq((0L, 1L, 1.0), (0L, 2L, Double.NaN), (0L, 3L, 2.0))
      .toDF("g", "id", "s")
    val top = df.groupBy($"g")
      .agg(call_function("topk_pairs", $"s", $"id", lit(1)).as("tk"))
      .select(element_at($"tk", 1).getField("id")).as[Long].head
    assert(top == 2L)
  }
}
