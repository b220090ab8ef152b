package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BinnedRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    // overlapping, boundary-landing, and wider-than-W intervals
    (1L, 0.0, 10.0), (2L, 5.0, 15.0), (3L, 10.0, 20.0), (4L, 0.0, 37.0))
    .toDF("iv_id", "lo", "hi")
  private val points =
    Seq((100L, 0.0), (101L, 5.0), (102L, 9.999), (103L, 10.0),
      (104L, 14.999), (105L, 36.999), (106L, 37.0), (107L, -1.0))
      .toDF("p_id", "p")

  private def naive = points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi"))
    .select(col("p_id"), col("iv_id"))
    .as[(Long, Long)].collect().sorted.toSeq

  test("binned join matches the naive range join, incl. boundaries") {
    for (w <- Seq(4.0, 10.0, 64.0)) {
      val out = BinnedRangeJoin.join(points, "p", intervals, "lo", "hi", w)
        .select(col("p_id"), col("iv_id"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(out == naive, s"binWidth=$w")
    }
  }

  test("each matching pair appears exactly once (no bin-overlap dupes)") {
    val out = BinnedRangeJoin.join(points, "p", intervals, "lo", "hi", 4.0)
      .groupBy(col("p_id"), col("iv_id")).count()
      .filter(col("count") > 1).count()
    assert(out == 0)
  }

  test("null points and null interval bounds drop, same as the naive join") {
    val np = Seq((200L, Some(5.0)), (201L, None)).toDF("p_id", "p")
    val ni = Seq((10L, Some(0.0), Some(10.0)), (11L, None, Some(10.0)),
      (12L, Some(0.0), None)).toDF("iv_id", "lo", "hi")
    // naive: NULL comparisons are never true -> only (200, 10) matches
    val out = BinnedRangeJoin.join(np, "p", ni, "lo", "hi", 4.0)
      .select(col("p_id"), col("iv_id"))
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((200L, 10L)))
  }

  test("inverted intervals (hi < lo) fail loudly, not silently explode") {
    // sequence(start, stop) steps -1 when start > stop: without the
    // guard a swapped lo/hi pair silently blows up into descending
    // bins that the residual filter then discards — masking the bug
    val bad = Seq((20L, 30.0, 0.0)).toDF("iv_id", "lo", "hi")
    val e = intercept[Exception] {
      BinnedRangeJoin.join(points, "p", bad, "lo", "hi", 4.0).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(msgs.contains("inverted interval"), msgs)
  }

  test("colliding column names and bad widths fail loudly") {
    val badIv = intervals.withColumnRenamed("iv_id", "p_id")
    assertThrows[IllegalArgumentException] {
      BinnedRangeJoin.join(points, "p", badIv, "lo", "hi", 4.0)
    }
    assertThrows[IllegalArgumentException] {
      BinnedRangeJoin.join(points, "p", intervals, "lo", "hi", 0.0)
    }
    // '__bin' is reserved — a pre-existing one would be silently
    // clobbered and dropped otherwise
    assertThrows[IllegalArgumentException] {
      BinnedRangeJoin.join(points.withColumn("__bin", col("p")), "p",
        intervals, "lo", "hi", 4.0)
    }
  }
}
