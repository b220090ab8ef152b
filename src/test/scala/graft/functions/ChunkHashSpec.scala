package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkHashSpec extends SparkSpec {
  import spark.implicits._

  private def composed(w: Int, st: Int) =
    transform(TextFunctions.chunks(col("t"), w, st),
      s => TextFunctions.tokenHash(s))

  private def kernel(w: Int, st: Int) = {
    graft.GraftExtensions.ensure(spark)
    call_function("chunk_hash60", col("t"), lit(w), lit(st))
  }

  private def check(texts: Seq[String], w: Int, st: Int): Unit = {
    val rows = texts.toDF("t")
      .select(composed(w, st).as("exp"), kernel(w, st).as("got"))
      .as[(Seq[Long], Seq[Long])].collect()
    texts.zip(rows).foreach { case (t, (exp, got)) =>
      assert(got == exp, s"w=$w st=$st text='" + t.take(60) + "'")
    }
  }

  test("value-identical to tokenHash over chunks()") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "short", "", "   ",
      "  spaced   out   tokens   here  ",
      "exactly ten tokens a b c d e f g",
      "unicode café naïve 中文 tokens mixed in the stream today")
    check(texts, 10, 10)   // spanDupStats' stride == width shape
    check(texts, 4, 2)     // overlapping chunks
    check(texts, 3, 3)
  }

  test("randomized corpus-shaped agreement") {
    val vocab = Array("spark", "merge", "table", "scan", "agg", "a", "of")
    val rng = new scala.util.Random(5)
    val texts = (1 to 150).map { _ =>
      (0 until (1 + rng.nextInt(35)))
        .map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")
    }
    check(texts, 10, 10)
    check(texts, 5, 3)
  }
}
