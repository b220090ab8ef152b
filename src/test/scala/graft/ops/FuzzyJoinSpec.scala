package graft.ops

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Levenshtein for the brute-force ground truth. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def pairsOf(strings: Seq[String]): Set[(Long, Long, Int)] = {
    val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    FuzzyJoin.selfPairs(df, "s", "id")
      .as[(Long, Long, Int)].collect().toSet
  }

  private def brute(strings: Seq[String]): Set[(Long, Long, Int)] =
    (for {
      i <- strings.indices; j <- strings.indices if i < j
      d = lev(strings(i), strings(j)) if d <= 1
    } yield (i.toLong, j.toLong, d)).toSet

  test("substitution, insertion, deletion and equality all pair; far strings do not") {
    val ss = Seq("kitten", "mitten", "kitte", "kittens", "kitten",
      "sitting", "dog")
    assert(pairsOf(ss) == brute(ss))
  }

  test("empty and single-character strings") {
    val ss = Seq("", "a", "b", "ab", "")
    assert(pairsOf(ss) == brute(ss))
  }

  test("repeated characters do not duplicate pairs") {
    val ss = Seq("aaa", "aa", "aab", "aba")
    val got = FuzzyJoin.selfPairs(
      ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s"),
      "s", "id").as[(Long, Long, Int)].collect()
    assert(got.length == got.toSet.size, "duplicate pair rows emitted")
    assert(got.toSet == brute(ss))
  }

  test("randomized completeness against brute force") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abc"
    val ss = Seq.fill(120)(
      (0 until (1 + rnd.nextInt(5)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    assert(pairsOf(ss) == brute(ss))
  }

  test("depth-2 neighborhoods: randomized completeness at maxDist=2") {
    val rnd = new scala.util.Random(23)
    val ss = Seq.fill(80)(
      (0 until (1 + rnd.nextInt(6)))
        .map(_ => "ab" (rnd.nextInt(2))).mkString)
    val got = FuzzyJoin.selfPairs(
      ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s"),
      "s", "id", maxDist = 2).as[(Long, Long, Int)].collect().toSet
    val want = (for {
      i <- ss.indices; j <- ss.indices if i < j
      d = lev(ss(i), ss(j)) if d <= 2
    } yield (i.toLong, j.toLong, d)).toSet
    assert(got == want)
  }

  test("two-table match: probe names against a dictionary") {
    val dict = Seq((10L, "spark"), (11L, "flink"), (12L, "trino"))
      .toDF("id", "name")
    val probe = Seq((1L, "spork"), (2L, "flink"), (3L, "duckdb"), (4L, "tri no"))
      .toDF("id", "name")
    val got = FuzzyJoin.matchPairs(probe, "name", "id", dict, "name", "id")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 10L, 1), (2L, 11L, 0), (4L, 12L, 1)))
  }

  test("the plan is a keyed join, not a cartesian product") {
    val df = (0L until 50L).map(i => (i, s"str$i")).toDF("id", "s")
    val out = FuzzyJoin.selfPairs(df, "s", "id")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join fell back to a quadratic plan:\n$plan")
  }
}
