package graft.functions

import graft.SparkSpec
import graft.ops.BpeTrain
import org.apache.spark.sql.functions._

class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.ensure(spark)

  private def nativeEnc(words: Seq[String],
      rules: Seq[(String, String)]): Seq[Seq[String]] =
    words.toDF("w")
      .select(BpeTrain.encodeNative($"w", rules).as("e"))
      .as[Seq[String]].collect().toSeq

  private def hofEnc(words: Seq[String],
      rules: Seq[(String, String)]): Seq[Seq[String]] =
    words.toDF("w")
      .select(BpeTrain.applyMerges($"w", rules).as("e"))
      .as[Seq[String]].collect().toSeq

  test("kernel == HOF fold on crafted edge words") {
    val rules = Seq(("a", "a"), ("aa", "b"), ("c", "d"), ("aab", "c"))
    val words = Seq("", "a", "aa", "aaa", "aaaa", "aab", "aabcd",
      "aaabcdcd", "zzz", "cdcdcd", "baab")
    assert(nativeEnc(words, rules) == hofEnc(words, rules))
  }

  test("kernel == HOF fold on randomized unicode words, incl. astral") {
    val rng = new scala.util.Random(71)
    // alphabet mixes ASCII, a 2-byte char, and an astral (4-byte,
    // surrogate-pair) char — pins the code-point split contract
    val alpha = Vector("a", "b", "c", "é", "😀")
    for (trial <- 1 to 8) {
      val words = (1 to 30).map(_ =>
        (0 until rng.nextInt(10))
          .map(_ => alpha(rng.nextInt(alpha.length))).mkString)
      // random rule table over observed symbols + merged products
      var symbols = alpha
      val rules = (1 to 12).map { _ =>
        val l = symbols(rng.nextInt(symbols.length))
        val r = symbols(rng.nextInt(symbols.length))
        symbols = symbols :+ (l + r)
        (l, r)
      }
      assert(nativeEnc(words, rules) == hofEnc(words, rules),
        s"trial $trial rules=$rules")
    }
  }

  test("kernel == HOF when a pair re-forms from a later merge's product") {
    // rule 1 creates 'ab' symbols; rule 2 merges (ab, ab); rule 3
    // targets (a, b) AGAIN — sequential semantics say rule 3 never
    // re-fires (cursor passed it), matching the fold
    val rules = Seq(("a", "b"), ("ab", "ab"), ("a", "b"))
    val words = Seq("abab", "aabb", "ababab")
    assert(nativeEnc(words, rules) == hofEnc(words, rules))
  }

  test("cost is vocabulary-independent: a 4K-rule table encodes fine") {
    // the HOF form would be a 4000-deep expression tree (untestably
    // slow to even PLAN); the kernel plans and runs it directly
    val rng = new scala.util.Random(5)
    var symbols = Vector("a", "b", "c", "d", "e")
    val rules = (1 to 4000).map { _ =>
      val l = symbols(rng.nextInt(symbols.length))
      val r = symbols(rng.nextInt(symbols.length))
      symbols = symbols :+ (l + r)
      (l, r)
    }
    val words = (1 to 500).map(_ =>
      (0 until (1 + rng.nextInt(12)))
        .map(_ => "abcde"(rng.nextInt(5))).mkString)
    val t0 = System.nanoTime()
    val got = nativeEnc(words, rules)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"4K-rule encode of 500 words: $secs%.2f s")
    assert(got.length == 500)
    // spot-check a prefix subset against the HOF with the first 10
    // rules only, on words the later rules never touch... instead:
    // verify against a driver-side sequential reference
    def refEncode(w: String): Seq[String] = {
      var syms = w.split("").toVector
      rules.foreach { case (l, r) =>
        val b = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            b += (l + r); j += 2
          } else { b += syms(j); j += 1 }
        }
        syms = b.result()
      }
      syms
    }
    words.zip(got).take(50).foreach { case (w, e) =>
      assert(e == refEncode(w), s"word=$w")
    }
  }

  test("bpe_merge_pair == mergePair HOF on crafted arrays") {
    val cases = Seq(
      Seq("a", "a", "a"), Seq("a", "b", "a", "b"), Seq("x"),
      Seq.empty[String], Seq("a", "a", "a", "a", "a"), Seq("b", "a"))
    val df = cases.toDF("syms")
    val got = df.select(
      call_function("bpe_merge_pair", $"syms", lit("a"), lit("a")).as("m"))
      .as[Seq[String]].collect().toSeq
    val exp = df.select(BpeTrain.mergePair($"syms", "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got == exp)
  }

  test("bpe_token_count == composed tokenize+encode+count, edge cases " +
      "and randomized text included") {
    val rules = Seq(("a", "b"), ("ab", "c"), ("x", "y"), ("é", "😀"))
    def composed(texts: Seq[Option[String]]): Seq[Option[Long]] =
      texts.toDF("t").select(
        when($"t".isNull, lit(null).cast("long")).otherwise(
          aggregate(
            filter(graft.functions.TextFunctions.tokens($"t"),
              w => length(w) > 0),
            lit(0L),
            (acc, w) => acc +
              size(BpeTrain.encodeNative(w, rules)).cast("long")))
          .as("n"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
        .toSeq
    def fused(texts: Seq[Option[String]]): Seq[Option[Long]] =
      texts.toDF("t").select(
        call_function("bpe_token_count", $"t",
          array(rules.map(p => lit(p._1)): _*),
          array(rules.map(p => lit(p._2)): _*)).as("n"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
        .toSeq
    val edge = Seq(Some("abc abc"), Some(""), Some("   "), None,
      Some("  ab  c  "), Some("a\tb c"), Some("é😀 xy é😀é😀"),
      Some("single"))
    assert(fused(edge) == composed(edge), s"edge: ${fused(edge)}")
    val rng = new scala.util.Random(19)
    val alpha = "abcxy é😀\t"
    val rand = (1 to 60).map(_ => Some(
      (0 until rng.nextInt(25)).map(_ => alpha(rng.nextInt(alpha.length)))
        .mkString))
    assert(fused(rand) == composed(rand))
  }

  test("non-foldable rule arrays are rejected loudly") {
    val e = intercept[Exception] {
      Seq(("ab", Seq("a")), ("cd", Seq("c"))).toDF("w", "ls")
        .select(call_function("bpe_encode", $"w", $"ls", $"ls"))
        .collect()
    }
    assert(e.getMessage.contains("foldable"))
  }
}
