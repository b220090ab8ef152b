package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def builtin(df: org.apache.spark.sql.DataFrame, p: Double) =
    df.groupBy($"g").agg(expr(s"percentile(v, $p)").as("exp"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  // directRowBound = 0 forces the BANDED plan regardless of input
  // size — the r14 small-input gate would otherwise route every
  // test-scale input through the direct percentile() path and these
  // pins would compare the built-in to itself
  private def banded(df: org.apache.spark.sql.DataFrame, p: Double,
      bands: Int = 16) =
    ExactQuantiles.percentiles(df, "g", Seq("v" -> Seq(p)), bands,
      directRowBound = 0L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

  test("bit-identical to the built-in percentile() on randomized data") {
    // non-dyadic values (2-decimal money shapes) exercise the exact
    // interpolation formula, not just exact-rank picks
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c",
        math.floor(rng.nextDouble() * 10000) / 100.0)
    }
    val df = rows.toDF("g", "v").repartition(7)
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val exp = builtin(df, p)
      val got = banded(df, p)
      assert(got.keySet == exp.keySet)
      for (g <- exp.keys) {
        assert(java.lang.Double.doubleToLongBits(got(g)) ==
          java.lang.Double.doubleToLongBits(exp(g)),
          s"p=$p g=$g: got ${got(g)}, percentile() says ${exp(g)}")
      }
    }
  }

  test("small-input direct path ≡ banded bit-for-bit (incl. the " +
      "null-group flat asymmetry) and really skips the banded machinery") {
    val rng = new scala.util.Random(19)
    val rows = (1 to 600).map { i =>
      (s"g${i % 4}",
        if (i % 11 == 0) None
        else Some(math.floor(rng.nextDouble() * 10000) / 100.0))
    } ++ Seq((null: String, Some(1.0)),
      (null: String, Some(2.0))) // null group VARIED → drops on both
    val df = rows.toDF("g", "v").repartition(7)
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 1.0)) {
      // default gate: the whole input is far under the bound → direct
      val direct = ExactQuantiles.percentiles(df, "g",
        Seq("v" -> Seq(p)), bands = 16)
      // the direct plan is one hash aggregate — no band-rank windows
      assert(!direct.queryExecution.executedPlan.toString.contains("Window"),
        "direct path should have no window operators")
      val got = direct.collect()
        .map(r => r.getString(0) -> r.getDouble(3)).toMap
      val exp = builtin(df.filter($"g".isNotNull), p)
      assert(got.keySet == exp.keySet, s"p=$p")
      exp.foreach { case (g, e) =>
        assert(java.lang.Double.doubleToLongBits(got(g)) ==
          java.lang.Double.doubleToLongBits(e),
          s"p=$p g=$g: direct ${got(g)}, percentile() says $e")
      }
      assert(got == banded(df, p), s"p=$p: direct and banded disagree")
    }
    // null group with CONSTANT values rides the flat short-circuit on
    // the banded path and is KEPT — the direct path must reproduce
    // that asymmetry, not "clean it up"
    val flatNull = (Seq((null: String, 7.5), (null, 7.5)) ++
      (1 to 50).map(i => ("g", i.toDouble))).toDF("g", "v")
    for (p <- Seq(0.25, 0.5)) {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => Option(r.getString(0)) -> r.getDouble(3)).toMap
      val d = rows(ExactQuantiles.percentiles(flatNull, "g",
        Seq("v" -> Seq(p)), bands = 16))
      val b = rows(ExactQuantiles.percentiles(flatNull, "g",
        Seq("v" -> Seq(p)), bands = 16, directRowBound = 0L))
      assert(d == b, s"p=$p: direct and banded disagree on null-flat")
      assert(d(None) == 7.5, s"p=$p: null flat group should be kept")
    }
    // multi-column, multi-p through the direct path
    val multi = Seq(("a", 1.0, 10.0), ("a", 2.0, 20.0), ("a", 3.0, 30.0))
      .toDF("g", "q", "x")
    val rowsM = ExactQuantiles.percentiles(multi, "g",
      Seq("q" -> Seq(0.5), "x" -> Seq(0.25, 0.75)))
      .collect().map(r => (r.getString(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    assert(rowsM == Map(("q", 0.5) -> 2.0, ("x", 0.25) -> 15.0,
      ("x", 0.75) -> 25.0))
  }

  test("constant group short-circuits; singleton group works") {
    val df = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0), ("s", 42.0))
      .toDF("g", "v")
    val got = banded(df, 0.75)
    assert(got == Map("c" -> 5.0, "s" -> 42.0))
  }

  test("nulls are excluded like the built-in") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val got = banded(df, 0.5)
    assert(got("a") == 2.0)
  }

  test("heavily tied values agree with the built-in") {
    val rows = (1 to 200).map(i => ("t", (i % 4).toDouble))
    val df = rows.toDF("g", "v").repartition(5)
    for (p <- Seq(0.1, 0.5, 0.9)) {
      assert(banded(df, p) == builtin(df, p), s"p=$p")
    }
  }

  test("multiple target columns and percentiles in one call") {
    val df = Seq(("a", 1.0, 10.0), ("a", 2.0, 20.0), ("a", 3.0, 30.0))
      .toDF("g", "q", "x")
    val rows = ExactQuantiles.percentiles(df, "g",
      Seq("q" -> Seq(0.5), "x" -> Seq(0.25, 0.75)),
      directRowBound = 0L)
      .collect().map(r => (r.getString(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    assert(rows(("q", 0.5)) == 2.0)
    assert(rows(("x", 0.25)) == 15.0)
    assert(rows(("x", 0.75)) == 25.0)
  }

  test("narrow-band pileup recurses into located bands and still " +
      "matches the built-in bit-for-bit") {
    // adversarial concentration: 99% of values inside one band-width
    // sliver [0, 1e-4) of a [0, 10000] range (so level-0 banding
    // piles them into band 0), including heavy DUPLICATES (the
    // all-values-equal sub-band short-circuit), plus a sprinkle of
    // spread values. A tiny bandRowBound forces recursion; depth 3
    // exercises multi-level shifts of the target rank.
    val rng = new scala.util.Random(41)
    val sliver = (1 to 3000).map { i =>
      ("n", if (i % 3 == 0) 5.0e-5 // duplicate pileup
            else math.floor(rng.nextDouble() * 1e6) / 1e10)
    }
    val spread = (1 to 30).map(_ =>
      ("n", math.floor(rng.nextDouble() * 1e8) / 1e4))
    val df = (sliver ++ spread).toDF("g", "v").repartition(11)
    for (p <- Seq(0.05, 0.25, 0.5, 0.75, 0.95)) {
      val exp = builtin(df, p)
      // forced recursion: any located band over 64 rows recurses
      val got = ExactQuantiles.percentiles(df, "g",
        Seq("v" -> Seq(p)), bands = 16, bandRowBound = 64L,
        maxDepth = 3)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      assert(got.keySet == exp.keySet, s"p=$p")
      exp.foreach { case (g, e) =>
        assert(java.lang.Double.doubleToLongBits(got(g)) ==
          java.lang.Double.doubleToLongBits(e),
          s"p=$p g=$g: got ${got(g)}, percentile() says $e")
      }
      // and the no-recursion plan (maxDepth=1) agrees — the bound is
      // purely a partition-size decision, never a value decision
      val flat1 = ExactQuantiles.percentiles(df, "g",
        Seq("v" -> Seq(p)), bands = 16, bandRowBound = 64L,
        maxDepth = 1)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      assert(flat1 == got, s"p=$p: depth-1 and depth-3 disagree")
    }
  }

  test("every-value-identical band terminates recursion via the " +
      "sub-band short-circuit") {
    // one group: 10k copies of the same value + 3 outliers; the
    // pileup band cannot shrink by re-banding — the klo==khi branch
    // must answer without ranking (and without infinite descent)
    val rows = (1 to 10000).map(_ => ("d", 7.25)) ++
      Seq(("d", 1.0), ("d", 99.0), ("d", 50.0))
    val df = rows.toDF("g", "v").repartition(7)
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val got = ExactQuantiles.percentiles(df, "g",
        Seq("v" -> Seq(p)), bands = 8, bandRowBound = 32L, maxDepth = 4)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      assert(got == builtin(df, p), s"p=$p")
    }
  }

  test("high-cardinality group keys fall back to shuffle joins with " +
      "identical values, and the plan really loses the broadcasts") {
    // 2000 groups × 1 col × 16 bands = 32000 hist rows: force the
    // gate with a 1000-row threshold; every group has 5 rows so the
    // built-in stays cheap to compare against
    val rng = new scala.util.Random(23)
    val rows = for (g <- 1 to 2000; _ <- 1 to 5)
      yield (f"g$g%04d", math.floor(rng.nextDouble() * 10000) / 100.0)
    val df = rows.toDF("g", "v").repartition(13)
    // disable size-based auto-broadcast so the plan shows ONLY the
    // operator's own hints (at production scale the gated relations
    // exceed the threshold anyway; at test scale everything is tiny
    // and AQE would re-broadcast them, hiding the gate from the plan)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = ExactQuantiles.percentiles(df, "g",
        Seq("v" -> Seq(0.5)), bands = 16, maxBroadcastHistRows = 1000L,
        directRowBound = 0L)
      // the gated plan keeps ONLY the constant-bounded broadcasts
      // (the (cid, p) target list and the column-name table — both
      // bounded by the call signature, not the data); the three
      // data-shaped relations (stats, histogram, located bands) must
      // lose theirs: 5 hinted joins ungated, 2 gated
      def nBcast(d: org.apache.spark.sql.DataFrame): Int =
        "BroadcastHashJoin".r
          .findAllIn(d.queryExecution.executedPlan.toString).length
      // the two constant hints appear twice each (the tg/names
      // subtrees duplicate across the flat/varied union branches),
      // all joining on __cid — 4 constant-bounded broadcasts max
      assert(nBcast(shuffled) <= 4,
        s"gate left ${nBcast(shuffled)} broadcast joins in the plan")
      val ungated = ExactQuantiles.percentiles(df, "g",
        Seq("v" -> Seq(0.5)), bands = 16, directRowBound = 0L)
      assert(nBcast(ungated) > nBcast(shuffled),
        s"expected the data-shaped hinted joins in the ungated plan, " +
          s"got ${nBcast(ungated)} vs gated ${nBcast(shuffled)}")
      val got = shuffled.collect()
        .map(r => r.getString(0) -> r.getDouble(3)).toMap
      val exp = builtin(df, 0.5)
      assert(got.keySet == exp.keySet)
      exp.foreach { case (g, e) =>
        assert(java.lang.Double.doubleToLongBits(got(g)) ==
          java.lang.Double.doubleToLongBits(e), s"g=$g")
      }
      // and the broadcast side of the gate agrees row-for-row
      val bcast = ungated.collect()
        .map(r => r.getString(0) -> r.getDouble(3)).toMap
      assert(bcast == got)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
