package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "the quick brown fox"),
    (2L, "  der hund und die katze  "),
    (3L, "xyz")
  ).toDF("id", "text")

  test("tokens trims and splits on whitespace runs") {
    val t = df.select(TextFunctions.tokens($"text")).as[Seq[String]]
      .collect()
    assert(t(0) == Seq("the", "quick", "brown", "fox"))
    assert(t(1) == Seq("der", "hund", "und", "die", "katze"))
  }

  test("tokenCount and stopwordCount") {
    val out = df.select($"id", TextFunctions.tokenCount($"text"),
      TextFunctions.stopwordCount($"text")).as[(Long, Int, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (4, 1))
    assert(out(3L) == (1, 0))
  }

  test("langId marker chain") {
    val out = df.select($"id", TextFunctions.langId($"text"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("chunks: full coverage, stride overlap, short docs = one chunk") {
    import org.apache.spark.sql.functions._
    def chunksOf(text: String, size: Int, stride: Int): Seq[Seq[String]] =
      Seq(text).toDF("t")
        .select(TextFunctions.chunks(col("t"), size, stride).as("c"))
        .collect()(0).getSeq[String](0).map(_.split(" ").toSeq)
    val doc = (1 to 57).map(i => s"w$i").mkString(" ")
    val cs = chunksOf(doc, 32, 24)
    // starts at 0, 24, 48; every token covered; consecutive chunks
    // overlap by size - stride = 8 (except the short tail)
    assert(cs.map(_.head) == Seq("w1", "w25", "w49"))
    assert(cs(0).size == 32 && cs(1).size == 32 && cs(2).size == 9)
    assert(cs.flatten.toSet == (1 to 57).map(i => s"w$i").toSet)
    assert(cs(0).takeRight(8) == cs(1).take(8))
    // short doc: exactly one (short) chunk
    assert(chunksOf("a b c", 32, 24) == Seq(Seq("a", "b", "c")))
    // boundary: exactly `size` tokens -> one chunk
    assert(chunksOf((1 to 32).map("t" + _).mkString(" "), 32, 24).size == 1)
  }

  test("fingerprint is normalization-invariant") {
    val fps = Seq((1L, "Hello World"), (2L, " hello world  "))
      .toDF("id", "text")
      .select(TextFunctions.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("tokenHash is a stable 60-bit value") {
    // cross-checked against DuckDB:
    // CAST(concat('0x', substring(md5('hello'),1,15)) AS BIGINT)
    val h = spark.range(1).select(TextFunctions.tokenHash(lit("hello")))
      .as[Long].head()
    assert(h == 419982666956583591L)
  }

  test("shingles produce n-grams in order") {
    val sh = df.filter($"id" === 1)
      .select(TextFunctions.shingles($"text", 3)).as[Seq[String]].head()
    assert(sh == Seq("the quick brown", "quick brown fox"))
  }

  test("shingles of short documents are empty, not an error") {
    val sh = Seq((1L, "two words"), (2L, "one"), (3L, ""))
      .toDF("id", "text")
      .select(TextFunctions.shingles($"text", 3)).as[Seq[String]].collect()
    assert(sh.forall(_.isEmpty))
  }
}
