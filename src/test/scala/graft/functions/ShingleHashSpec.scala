package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShingleHashSpec extends SparkSpec {
  import spark.implicits._

  private def composed(n: Int) =
    transform(array_distinct(TextFunctions.shingles(col("t"), n)),
      s => xxhash64(s))

  private def kernel(n: Int) = {
    graft.GraftExtensions.ensure(spark)
    call_function("shingle_hash64", col("t"), lit(n))
  }

  private def check(texts: Seq[String], n: Int): Unit = {
    val df = texts.toDF("t")
    val rows = df.select(composed(n).as("exp"), kernel(n).as("got"))
      .as[(Seq[Long], Seq[Long])].collect()
    texts.zip(rows).foreach { case (t, (exp, got)) =>
      assert(got == exp, s"n=$n text='" + t.take(60) + "'")
    }
  }

  test("value-identical to array_distinct(shingles) + xxhash64") {
    check(Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a a",                       // duplicate shingles collapse
      "  leading and trailing spaces   ",
      "multi    space     runs between tokens",
      "one two",                           // fewer tokens than n
      "exactly three tokens",              // count == 1
      "",                                  // empty → empty-token list
      "     ",                             // all spaces
      "tab\tand\nnewline are token bytes, not separators",
      "unicode café naïve 中文 tokens here"
    ), 3)
  }

  test("agrees for n=1 and n=5 too") {
    val texts = Seq("alpha beta gamma delta epsilon zeta",
      "x", "", "repeat repeat repeat repeat repeat repeat")
    check(texts, 1)
    check(texts, 5)
  }

  test("randomized corpus-shaped agreement") {
    val vocab = Array("spark", "window", "merge", "table", "column",
      "vector", "stream", "value", "data", "a", "the")
    val rng = new scala.util.Random(11)
    val texts = (1 to 200).map { _ =>
      (0 until (3 + rng.nextInt(40)))
        .map(_ => vocab(rng.nextInt(vocab.length)))
        .mkString(" ")
    }
    check(texts, 3)
  }

  test("null text yields null") {
    val df = Seq(Option("a b c d"), None).toDF("t")
    val got = df.select(kernel(3)).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }
}
