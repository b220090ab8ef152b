package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proof of the bucketing scale claim: two tables hash-bucketed the
  * same way join with NO Exchange on either side. At 100 TB the
  * recurring fact-fact join is the dominant shuffle; bucketing pays
  * it once at write time.
  */
class BucketedJoinSpec extends SparkSpec {

  private def withConfs[T](kvs: (String, String)*)(f: => T): T = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("same-bucketing fact-fact join plans with zero Exchange") {
    val dir = Files.createTempDirectory("graft-bucketed").toString
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    LakeLayout.writeBucketed(orders, "b_orders", s"$dir/orders",
      buckets = 8, bucketCols = Seq("o_orderkey"),
      sortCols = Seq("o_orderkey"))
    LakeLayout.writeBucketed(lineitem, "b_lineitem", s"$dir/lineitem",
      buckets = 8, bucketCols = Seq("l_orderkey"),
      sortCols = Seq("l_orderkey"))
    try {
      // force the shuffle-join path: the point is that bucketing
      // removes the shuffle a sort-merge join would otherwise need
      // (broadcast would hide it — and a real fact-fact join has no
      // broadcastable side anyway)
      withConfs(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val joined = spark.table("b_lineitem")
          .join(spark.table("b_orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
        val n = joined.count()
        assert(n == lineitem.count(), "inner PK-FK join keeps all lineitems")
        val p = joined.queryExecution.executedPlan.toString
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          "expected a shuffle-family join:\n" + p)
        assert(!p.contains("Exchange"),
          "bucketed scans must satisfy the join's distribution " +
            "with no shuffle:\n" + p)
        // both scans report the bucket layout
        assert(p.contains("SelectedBucketsCount: 8 out of 8"), p)
      }
      // bucket pruning: an equality filter on the bucket column
      // touches 1 of 8 buckets. autoBucketedScan turns the bucketed
      // scan OFF when no join/agg wants the distribution, which also
      // forfeits pruning — disable it so the filter-only query keeps
      // the bucket index (what a point-lookup-heavy deployment sets).
      withConfs(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        val pruned = spark.table("b_orders").filter(col("o_orderkey") === 7L)
        pruned.collect()
        val pp = pruned.queryExecution.executedPlan.toString
        assert(pp.contains("SelectedBucketsCount: 1 out of 8"),
          "bucket pruning must reach the scan:\n" + pp)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
