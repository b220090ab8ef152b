package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class AhoCorasickSpec extends AnyFunSuite {

  private def naive(text: String, pats: Seq[String]): Seq[Int] =
    pats.zipWithIndex.collect {
      case (p, i) if text.contains(p) => i
    }

  private def ac(pats: Seq[String]): AhoCorasick =
    AhoCorasick.build(pats.map(_.getBytes("UTF-8")))

  private def run(a: AhoCorasick, text: String): Seq[Int] =
    a.matches(text.getBytes("UTF-8")).toSeq

  test("matches equal naive contains on random inputs") {
    val alphabet = "abcd"
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val pats = (0 until 30).map(_ => randStr(1 + rnd.nextInt(4))).distinct
    val a = ac(pats)
    (0 until 200).foreach { _ =>
      val t = randStr(rnd.nextInt(60))
      assert(run(a, t) == naive(t, pats), s"text=$t")
    }
  }

  test("overlapping and nested patterns all fire") {
    // "aba" in "ababa" twice (overlap), "ba" nested inside "aba",
    // "ababa" equals the whole text
    val pats = Seq("aba", "ba", "ababa", "x")
    assert(run(ac(pats), "ababa") == Seq(0, 1, 2))
  }

  test("a pattern that is a suffix of another is found via fail links") {
    // matching "hers" must also report "ers" and "s"
    val pats = Seq("hers", "ers", "s", "he")
    assert(run(ac(pats), "xhersx") == Seq(0, 1, 2, 3))
  }

  test("multi-byte UTF-8 patterns match exactly, never mid-codepoint") {
    val pats = Seq("é", "日本", "e")
    assert(run(ac(pats), "caf é 日本語") == Seq(0, 1))
    assert(run(ac(pats), "plain e only") == Seq(2))
  }

  test("duplicate occurrences report each pattern once, sorted") {
    val pats = Seq("zz", "aa")
    assert(run(ac(pats), "aazzaazz") == Seq(0, 1))
  }


  test("anyMatch equals matches.nonEmpty, incl. early-exit inputs") {
    val pats = Seq("abc", "bd", "zz")
    val a = ac(pats)
    Seq("xxabcyy", "abd", "nothing", "", "zz" * 5, "ab").foreach { t =>
      assert(a.anyMatch(t.getBytes("UTF-8")) == run(a, t).nonEmpty, t)
    }
  }

  test("empty text matches nothing; empty patterns are rejected") {
    assert(run(ac(Seq("a")), "") == Seq())
    intercept[IllegalArgumentException](ac(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq.empty))
  }
}

class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  test("multi_match SQL function matches per-pattern contains") {
    val pats = Seq("slow fast", "vector", "ector t", "zz-none")
    val df = Seq(
      (1L, "the slow fast table"),
      (2L, "a vector table here"),
      (3L, "nothing relevant"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = df.select($"id",
      call_function("multi_match", $"text",
        array(pats.map(lit): _*)).as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    assert(out(1L) == Seq(0))
    assert(out(2L) == Seq(1, 2))
    assert(out(3L) == Seq())
    assert(out(4L) == null)
  }

  test("multi_match runs inside whole-stage codegen") {
    val df = spark.range(100).select(
      concat(lit("txt "), $"id".cast("string")).as("text"))
    val out = df.select(
      size(call_function("multi_match", $"text",
        array(lit("txt"), lit("7")))).as("n"))
    // the Project carrying multi_match is inside a codegen stage
    // (the "*(n)" prefix) — no CodegenFallback interpretation
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(out.agg(sum($"n")).as[Long].head == 100L + 19L)
  }


  test("multi_match_any filters with early exit, same semantics") {
    val df = Seq((1L, "clean text"), (2L, "has vector inside"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val kept = df.filter(!call_function("multi_match_any", $"text",
      array(lit("vector"), lit("zz")))).select($"id").as[Long]
      .collect().toSeq
    // null text -> null predicate -> filtered out (SQL semantics)
    assert(kept == Seq(1L))
  }

  test("non-foldable pattern array is rejected at analysis") {
    val df = Seq(("a", Seq("a"))).toDF("t", "p")
    val e = intercept[Exception] {
      df.select(call_function("multi_match", $"t", $"p")).collect()
    }
    assert(e.getMessage.contains("foldable"))
  }
}
