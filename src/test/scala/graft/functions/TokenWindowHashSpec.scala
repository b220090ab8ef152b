package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenWindowHashSpec extends SparkSpec {
  import spark.implicits._

  private def composed(w: Int) = {
    val toks = TextFunctions.tokens(col("t"))
    transform(
      sequence(lit(0), greatest(size(toks) - w, lit(0))),
      i => xxhash64(slice(toks, i + lit(1), lit(w))))
  }

  private def kernel(w: Int) = {
    graft.GraftExtensions.ensure(spark)
    call_function("token_window_hash64", col("t"), lit(w))
  }

  private def check(texts: Seq[String], w: Int): Unit = {
    val rows = texts.toDF("t")
      .select(composed(w).as("exp"), kernel(w).as("got"))
      .as[(Seq[Long], Seq[Long])].collect()
    texts.zip(rows).foreach { case (t, (exp, got)) =>
      assert(got == exp, s"w=$w text='" + t.take(60) + "'")
    }
  }

  test("value-identical to the xxhash64-of-slice fold") {
    check(Seq(
      "the quick brown fox jumps over the lazy dog today",
      "short doc",                          // fewer tokens than width
      "exactly ten tokens a b c d e f g",
      "",                                   // empty → single window
      "   ",                                // spaces → single window
      "  padded   with   runs  of spaces  ",
      "repeat repeat repeat repeat repeat repeat repeat"
    ), 10)
    check(Seq("a b c d e", "x", ""), 2)
    check(Seq("a b c d e"), 1)
  }

  test("randomized corpus-shaped agreement, positions align") {
    val vocab = Array("row", "scan", "agg", "hash", "join", "a", "the")
    val rng = new scala.util.Random(3)
    val texts = (1 to 150).map { _ =>
      (0 until (1 + rng.nextInt(30)))
        .map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")
    }
    check(texts, 10)
    check(texts, 4)
  }
}
