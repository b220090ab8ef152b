package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShingleUtf8Spec extends SparkSpec {
  import spark.implicits._

  private def kernel(n: Int, stride: Int) = {
    graft.GraftExtensions.ensure(spark)
    call_function("shingle_utf8", col("t"), lit(n), lit(stride))
  }

  private def check(texts: Seq[String], composed: org.apache.spark.sql.Column,
      n: Int, stride: Int): Unit = {
    val rows = texts.toDF("t")
      .select(composed.as("exp"), kernel(n, stride).as("got"))
      .as[(Seq[String], Seq[String])].collect()
    texts.zip(rows).foreach { case (t, (exp, got)) =>
      assert(got == exp, s"n=$n st=$stride text='" + t.take(60) + "'")
    }
  }

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a", "one two", "x", "", "   ",
    "  padded   with  space   runs ",
    "unicode café naïve 中文 mixed tokens in here")

  test("stride 1 is string-identical to shingles()") {
    check(samples, TextFunctions.shingles(col("t"), 3), 3, 1)
    check(samples, TextFunctions.shingles(col("t"), 2), 2, 1)
  }

  test("stride > 1 is string-identical to chunks()") {
    check(samples, TextFunctions.chunks(col("t"), 32, 24), 32, 24)
    check(samples, TextFunctions.chunks(col("t"), 4, 2), 4, 2)
    check(samples, TextFunctions.chunks(col("t"), 3, 3), 3, 3)
  }

  test("randomized corpus-shaped agreement, both semantics") {
    val vocab = Array("spark", "row", "agg", "the", "a", "scan")
    val rng = new scala.util.Random(23)
    val texts = (1 to 150).map { _ =>
      (0 until (1 + rng.nextInt(40)))
        .map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")
    }
    check(texts, TextFunctions.shingles(col("t"), 3), 3, 1)
    check(texts, TextFunctions.chunks(col("t"), 10, 7), 10, 7)
  }
}
