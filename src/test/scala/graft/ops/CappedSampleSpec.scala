package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class CappedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: DataFrame, key: String, hash: org.apache.spark.sql.Column,
      tiebreak: String, cap: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(hash, col(tiebreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
  }

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.select($"id", $"key").as[(Long, String)].collect().toSet

  test("row-identical to the window form on a skewed corpus") {
    // mega-key 'big' (500 rows), mid key (30), tiny keys (< cap)
    val data = ((1L to 500L).map(i => (i, "big")) ++
      (501L to 530L).map(i => (i, "mid")) ++
      Seq((900L, "solo1"), (901L, "solo2"), (902L, "solo2")))
      .toDF("id", "key")
    val h = graft.functions.TextFunctions.hashBucket($"id", 1000000)
    (1 to 20 by 6).foreach { cap =>
      val fast = CappedSample.perKeyCap(data, Seq("key"), h, $"id", cap)
      val ref = windowForm(data, "key", h, "id", cap)
      assert(rows(fast) == rows(ref), s"cap=$cap")
    }
  }

  test("hash ties break by the tiebreak column, same as the window") {
    // constant hash forces the tiebreak to decide everything
    val data = (1L to 100L).map(i => (i, "k")).toDF("id", "key")
    val fast = CappedSample.perKeyCap(data, Seq("key"), lit(0L), $"id", 7,
      hashRange = 1L)
    assert(rows(fast) == (1L to 7L).map((_, "k")).toSet)
  }

  test("clustered hashes force the threshold loop and stay exact") {
    // all hashes packed at the TOP of the range: the initial
    // threshold (sized for uniform hashes) catches nothing, so the
    // doubling loop must walk up — and the result is still exactly
    // the cap smallest by (hash, id)
    val data = (1L to 200L).map(i => (i, "k")).toDF("id", "key")
    val packed = lit(999000L) + pmod($"id", lit(1000L))
    val fast = CappedSample.perKeyCap(data, Seq("key"), packed, $"id", 5)
    val ref = windowForm(data, "key", packed, "id", 5)
    assert(rows(fast) == rows(ref))
  }

  test("minExponent matches BigInt arithmetic at overflow-adversarial " +
      "(hash, n) — keys beyond Long.MaxValue/hashRange rows") {
    // the r9 form computed h·n directly, which wraps once n >
    // Long.MaxValue/hashRange (~9.2e12 at the default 1e6 range) and
    // silently collapses SOME rows' exponents; the decomposed form
    // must agree with exact BigInt ceil_log2(ceil(h·n/C)) everywhere,
    // including far past that wrap point
    val cap = 1000
    val hashRange = 1000000L
    val bigC = BigInt(cap) * BigInt(hashRange)
    def expected(h: Long, n: Long): Int =
      if (h <= 0) 0
      else {
        val x = (BigInt(h) * BigInt(n) + bigC - 1) / bigC
        if (x <= 1) 0 else (x - 1).bitLength
      }
    val ns = Seq(1001L, 999999L, 9223372036853L, // ~Long.Max/hashRange
      9223372036854L, 98765432109876L, Long.MaxValue / 2, Long.MaxValue)
    val hs = Seq(-1L, 0L, 1L, 2L, 499999L, 999998L, 999999L)
    val cases = for { n <- ns; h <- hs } yield (h, n)
    val got = cases.toDF("h", "n")
      .select($"h", $"n",
        CappedSample.minExponent($"h", $"n", cap, hashRange).as("k"))
      .as[(Long, Long, Int)].collect()
    got.foreach { case (h, n, k) =>
      assert(k == expected(h, n),
        s"minExponent(h=$h, n=$n) = $k, expected ${expected(h, n)}")
    }
  }

  test("perKeyCap rejects cap/hashRange combinations whose h·r term " +
      "would overflow") {
    val data = Seq((1L, "a")).toDF("id", "key")
    val e = intercept[IllegalArgumentException] {
      CappedSample.perKeyCap(data, Seq("key"), lit(0L), $"id",
        cap = 1000000000, hashRange = 1000000000L)
    }
    assert(e.getMessage.contains("cap·hashRange²"))
  }

  test("keys at or under the cap keep every row with no rank at all") {
    val data = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "key")
    val h = graft.functions.TextFunctions.hashBucket($"id", 1000000)
    assert(rows(CappedSample.perKeyCap(data, Seq("key"), h, $"id", 5)) ==
      Set((1L, "a"), (2L, "a"), (3L, "b")))
  }

  test("partitioning-invariant") {
    val data = (1L to 300L).map(i => (i, s"k${i % 3}")).toDF("id", "key")
    val h = graft.functions.TextFunctions.hashBucket($"id", 1000000)
    val a = rows(CappedSample.perKeyCap(data, Seq("key"), h, $"id", 10))
    val b = rows(CappedSample.perKeyCap(
      data.repartition(13, $"id"), Seq("key"), h, $"id", 10))
    assert(a == b)
  }

  test("null hashes rank first and are kept, like the window form") {
    // nulls in BOTH an over-cap and an under-cap key: the r8 form
    // silently dropped over-cap-key null-hash rows (__csh < t is
    // null → filtered) while keeping under-cap ones
    val data = (1L to 60L).map(i => (i, "big")) ++ Seq((100L, "small"))
    val df = data.toDF("id", "key")
    val h = when($"id" <= 3 || $"id" === 100L, lit(null))
      .otherwise(graft.functions.TextFunctions.hashBucket($"id", 1000000))
    val fast = CappedSample.perKeyCap(df, Seq("key"), h, $"id", 5)
    val ref = windowForm(df, "key", h, "id", 5)
    assert(rows(fast) == rows(ref))
    // the three null-hash rows of the over-cap key rank first
    assert(rows(fast).filter(_._2 == "big").map(_._1)
      .intersect(Set(1L, 2L, 3L)) == Set(1L, 2L, 3L))
    assert(rows(fast).contains((100L, "small")))
  }

  test("threshold doubling does NOT re-read the input per step") {
    // adversarial: every hash packed at the very top of the range, so
    // the threshold must double 5 times before any candidate
    // appears. An accumulator on the SOURCE counts actual input-row
    // reads: with the doubling search DECLARATIVE (per-row minimal
    // exponent + per-key histogram, one plan, no driver loop), the
    // total is a small constant multiple of the input, independent
    // of how many doublings the data forces (the old driver-loop
    // form re-ran the scan + count-join lineage per doubling: ~3
    // more passes per doubling, ~23 source passes here vs ~8).
    val reads = spark.sparkContext.longAccumulator("src-reads")
    val n = 100L
    val src = spark.range(1, n + 1).as[Long]
      .map { i => reads.add(1); (i, "k") }.toDF("id", "key")
    val fast = CappedSample.perKeyCap(src, Seq("key"),
      lit(999999L), $"id", 5)
    val ref = windowForm(src, "key", lit(999999L), "id", 5)
    assert(rows(fast) == rows(ref))
    // consume once more so the count below includes the final read
    fast.collect()
    // bound: a handful of passes per consuming action (count-join +
    // histogram + candidate branches, exchanges reused within each
    // plan) × three actions here; the driver-loop form added ~3 per
    // doubling on top
    assert(reads.value <= 12 * n,
      s"input read ${reads.value} times for $n rows — the doubling " +
        "search is re-reading the source per step")
  }

  test("null keys form an ordinary group, like the window form") {
    val data = (Seq((1L, null.asInstanceOf[String]), (2L, null),
      (3L, null), (4L, "k")) ++ (5L to 20L).map((_, "k")))
      .toDF("id", "key")
    val h = graft.functions.TextFunctions.hashBucket($"id", 1000000)
    val fast = CappedSample.perKeyCap(data, Seq("key"), h, $"id", 2)
    val ref = windowForm(data, "key", h, "id", 2)
    val fr = fast.select($"id", coalesce($"key", lit("<null>")))
      .as[(Long, String)].collect().toSet
    val rr = ref.select($"id", coalesce($"key", lit("<null>")))
      .as[(Long, String)].collect().toSet
    assert(fr == rr)
    assert(fr.count(_._2 == "<null>") == 2) // null group capped at 2
  }

}
