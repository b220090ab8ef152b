package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BandedScan must equal the naive global-window scan it replaces —
  * on sparse keys (empty bands), negative keys (floor-banding, not
  * truncate), and any band width. */
class BandedScanSpec extends SparkSpec {
  import spark.implicits._

  // deterministic sparse key set: mixed sign, large gaps (whole bands
  // empty at width 8), shuffled insert order
  private val keys: Seq[Long] =
    Seq(-9003L, -9001L, -17L, -3L, 0L, 1L, 2L, 40L, 41L, 300L, 301L,
      302L, 5000L, 5003L, 90001L)
  private def frame = scala.util.Random.shuffle(keys.zipWithIndex)
    .map { case (k, i) => (k, (k % 7) * 11 + i) }
    .toDF("k", "v")

  test("prefixMaxExclusive ≡ naive global window on sparse mixed-sign keys") {
    for (width <- Seq(1L, 8L, 1000L)) {
      val w = Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, -1)
      val naive = frame.withColumn("pm", max($"v").over(w))
        .select($"k", $"pm").as[(Long, Option[Long])].collect().toMap
      val banded = BandedScan.prefixMaxExclusive(frame, "k", "v", width)
        .select($"k", $"prefix_max").as[(Long, Option[Long])].collect().toMap
      assert(banded == naive, s"width=$width")
    }
  }

  test("prevValue ≡ naive global lag on sparse mixed-sign keys") {
    for (width <- Seq(1L, 8L, 1000L)) {
      val w = Window.orderBy($"k")
      val naive = frame.withColumn("pv", lag($"v", 1).over(w))
        .select($"k", $"pv").as[(Long, Option[Long])].collect().toMap
      val banded = BandedScan.prevValue(frame, "k", "v", width)
        .select($"k", $"prev_value").as[(Long, Option[Long])].collect().toMap
      assert(banded == naive, s"width=$width")
    }
  }

  test("randomized: both scans ≡ naive on 30 generated sparse key sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(1, 80)
      ks <- Gen.listOfN(n, Gen.choose(-100000L, 100000L))
      w <- Gen.oneOf(1L, 3L, 64L, 4096L)
    } yield (ks.distinct, w)
    (0 until 30).foreach { i =>
      gen(Gen.Parameters.default, Seed(7L + i)).foreach { case (ks, width) =>
        val df = ks.zipWithIndex.map { case (k, j) => (k, k * 31 + j) }
          .toDF("k", "v")
        val wNaive = Window.orderBy($"k")
        val naive = df
          .withColumn("pm", max($"v").over(
            wNaive.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("pv", lag($"v", 1).over(wNaive))
          .select($"k", $"pm", $"pv")
          .as[(Long, Option[Long], Option[Long])].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        val gotPm = BandedScan.prefixMaxExclusive(df, "k", "v", width)
          .select($"k", $"prefix_max").as[(Long, Option[Long])]
          .collect().toMap
        val gotPv = BandedScan.prevValue(df, "k", "v", width)
          .select($"k", $"prev_value").as[(Long, Option[Long])]
          .collect().toMap
        ks.foreach { k =>
          assert(gotPm(k) == naive(k)._1, s"prefix_max k=$k width=$width")
          assert(gotPv(k) == naive(k)._2, s"prev_value k=$k width=$width")
        }
      }
    }
  }

  test("no stage single-partitions the data (no empty-frame global window)") {
    // the point of the op: the executed plan must not contain a
    // window over an un-partitioned (global) ordering
    val plan = BandedScan.prefixMaxExclusive(frame, "k", "v", 8L)
      .queryExecution.executedPlan.toString
    val globalWindow = plan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("partitionBy=[]"))
    assert(!globalWindow, s"global window found in plan:\n$plan")
  }
}
