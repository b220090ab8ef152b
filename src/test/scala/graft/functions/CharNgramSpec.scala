package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.MultilingualFixture

/** Character-n-gram tokenization + script-aware langid — the
  * space-free-script (CJK/Thai) layer (r12 verdict directive #2).
  * Pins: gram windows are codepoint-positional, spaces mark as ▁ so
  * grams are space-free (the compiled-kernel key contract),
  * charGramText round-trips through the whitespace tokenizer, and
  * the script detector classifies real zh/ja/th/ko text the
  * word-marker chain cannot see. */
class CharNgramSpec extends SparkSpec {

  import spark.implicits._

  private def grams(text: String, n: Int): Seq[String] =
    Seq(Tuple1(text)).toDF("text")
      .select(TextFunctions.charNgrams(col("text"), n).as("g"))
      .head().getSeq[String](0)

  test("charNgrams: sliding codepoint windows, space -> ▁") {
    assert(grams("abcdef", 5) == Seq("abcde", "bcdef"))
    // exactly n chars -> one gram
    assert(grams("abcde", 5) == Seq("abcde"))
    // shorter than n -> the whole (normalized) text as one gram
    assert(grams("ab", 5) == Seq("ab"))
    // empty / whitespace-only -> no grams
    assert(grams("", 5) == Seq())
    assert(grams("   ", 5) == Seq())
    // space runs collapse to ONE ▁ (tokens() parity: "a  b" is the
    // same token stream as "a b")
    assert(grams("ab  cd", 3) == Seq("ab▁", "b▁c", "▁cd"))
    // every gram is space-free — the compiled-kernel contract
    assert(grams("the quick brown fox", 5).forall(!_.contains(" ")))
  }

  test("charNgrams: CJK text grams by codepoint") {
    assert(grams("机器学习是分支", 5) == Seq("机器学习是", "器学习是分", "学习是分支"))
    // Thai combining marks are codepoints of their own — included,
    // not folded into grapheme clusters (DuckDB agrees; probed)
    assert(grams("ภาษาไทย", 5) == Seq("ภาษาไ", "าษาไท", "ษาไทย"))
  }

  test("charNgrams is CODEPOINT-positional, never grapheme-cluster: " +
    "Thai combining marks split mid-cluster — accepted behavior") {
    // น้ำ ("water") is THREE codepoints rendering as one visual
    // cluster: U+0E19 base + U+0E49 combining tone + U+0E33 SARA AM.
    // The 2-gram windows are the exact codepoint slices — the second
    // gram STARTS on the combining mark, i.e. mid-grapheme.
    assert(grams("น้ำ", 2) == Seq("น้", "้ำ"))
    // and with a following base consonant the same holds inside a
    // longer run (ดื่ม "drink": ด + สระ อือ U+0E37 + ไม้เอก U+0E48 + ม)
    assert(grams("ดื่ม", 2) == Seq("ดื", "ื่", "่ม"))
    // This is deliberate: fastText's char n-grams are codepoint
    // windows too, and codepoint length/substring semantics are the
    // only ones DuckDB and Spark share exactly (grapheme
    // segmentation is ICU-version-dependent — not oracle-checkable).
  }

  test("charNgrams: null text stays null (explodes to zero rows)") {
    val r = Seq(Tuple1(null: String)).toDF("text")
      .select(TextFunctions.charNgrams(col("text"), 5).as("g"))
      .head()
    assert(r.isNullAt(0))
  }

  test("native char_ngrams_utf8 kernel ≡ the composed Catalyst form " +
    "(trim + ' +'→▁ regexp + codepoint substr windows) on randomized " +
    "multilingual inputs — the r14 one-pass rewrite changes cost, " +
    "never values") {
    // the pre-r14 composed form, verbatim
    def composed(text: org.apache.spark.sql.Column, n: Int) =
      Exprs.bind(regexp_replace(trim(text), " +", "▁")) { t =>
        when(length(t) === 0, array().cast("array<string>"))
          .when(length(t) < n, array(t))
          .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
            i => t.substr(i, lit(n))))
      }
    val rnd = new scala.util.Random(42)
    val alphabets = Seq(
      "ab c", "机器学习智能 ", "ภาษาไทยน้ำ", "かなカナ漢字 ",
      "한국어 문장", "a\tb\nc  d", "x▁y", "é漢a ")
    val texts = (1 to 400).map { _ =>
      val alpha = alphabets(rnd.nextInt(alphabets.size))
      val len = rnd.nextInt(30)
      (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    } ++ Seq("", " ", "   ", "a", "ab", "abcd", " ab ", "  a  b  ")
    for (n <- Seq(1, 2, 3, 5, 7)) {
      val df = texts.map(Tuple1(_)).toDF("text")
        .select(TextFunctions.charNgrams(col("text"), n).as("fast"),
          composed(col("text"), n).as("slow"))
      assert(df.filter(col("fast") =!= col("slow")).count() == 0,
        s"native/composed divergence at n=$n")
    }
  }

  test("charGramText round-trips through the whitespace tokenizer: " +
    "tokens(charGramText(t)) == charNgrams(t) — char-gram mode rides " +
    "every word-token kernel as a projection") {
    val df = MultilingualFixture.df(spark)
      .select(
        TextFunctions.tokens(
          TextFunctions.charGramText(col("text"), 5)).as("via"),
        TextFunctions.charNgrams(col("text"), 5).as("direct"))
    assert(df.filter(col("via") =!= col("direct")).count() == 0)
  }

  test("langIdScript classifies real zh/ja/th/ko; latin falls back " +
    "to the word-marker chain") {
    val got = MultilingualFixture.df(spark)
      .select(col("lang"),
        TextFunctions.langIdScript(col("text")).as("pred"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (lang, pred) =>
      assert(pred == lang, s"expected $lang, predicted $pred") }
    // kana beats Han: mixed ja text (kanji + kana) reads as ja
    val ja = Seq(Tuple1("漢字とかなの混在テキスト")).toDF("text")
      .select(TextFunctions.langIdScript(col("text"))).head().getString(0)
    assert(ja == "ja")
    // null text -> the word-marker fallback's "und", never a crash
    val nl = Seq(Tuple1(null: String)).toDF("text")
      .select(TextFunctions.langIdScript(col("text"))).head().getString(0)
    assert(nl == "und")
  }

  test("MultilingualFixture stays oracle-embeddable: no quotes or " +
    "control chars in texts, distinct ids above any sf's range") {
    val ids = MultilingualFixture.rows.map(_._1)
    assert(ids.distinct.size == ids.size && ids.forall(_ >= 1000000000L))
    MultilingualFixture.rows.foreach { case (_, lang, text) =>
      assert(!text.contains("'") && !text.contains("\\"),
        s"text must embed in a SQL VALUES literal: $text")
      assert(text.forall(c => c >= ' '), s"control char in: $text")
      assert(lang.matches("[a-z]{2}"))
    }
  }
}
