package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LangModelSpec extends SparkSpec {

  import spark.implicits._

  // "a b" appears 3× (survives minCount=2); "b c" once (pruned)
  private def ref = Seq(
    (1L, "a b c"),
    (2L, "a b"),
    (3L, "a b a")).toDF("doc_id", "text")

  private def toks = split(col("text"), " ")

  test("unigram and pruned bigram counts match hand counts") {
    val uni = LangModel.unigrams(ref, toks).orderBy("token")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(uni.toSeq == Seq(("a", 4L), ("b", 3L), ("c", 1L)))
    val big = LangModel.bigrams(ref, toks, 2).orderBy("w1", "w2")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(big.toSeq == Seq(("a", "b", 3L)))
  }

  test("score takes the bigram path on hits, smoothed backoff otherwise") {
    val uni = LangModel.unigrams(ref, toks)
    val big = LangModel.bigrams(ref, toks, 2)
    // doc "a b c": transition a→b hits (3/4); b→c was pruned →
    // backoff 0.4·(c_uni(c)+1)/(N+V) = 0.4·(1+1)/(8+3)
    val got = LangModel.score(ref.filter(col("doc_id") === 1L),
      "doc_id", toks, uni, big).collect().head
    assert(got.getLong(1) == 2L) // n_trans
    assert(got.getLong(2) == 1L) // n_hits
    val p1 = 3L.toDouble / 4L.toDouble
    val p2 = 0.4 * ((1L + 1L).toDouble / (8L + 3L).toDouble)
    assert(got.getDouble(3) == ((0.0 + p1) + p2) / 2L.toDouble)
  }

  test("unseen tokens backoff with zero unigram mass; short docs score 0") {
    val uni = LangModel.unigrams(ref, toks)
    val big = LangModel.bigrams(ref, toks, 2)
    val probe = Seq((7L, "zz yy"), (8L, "a")).toDF("doc_id", "text")
    val got = LangModel.score(probe, "doc_id", toks, uni, big)
      .orderBy("doc_id").collect()
    val r7 = got(0)
    assert(r7.getLong(1) == 1L && r7.getLong(2) == 0L)
    assert(r7.getDouble(3) == 0.4 * (1L.toDouble / (8L + 3L).toDouble))
    val r8 = got(1)
    assert(r8.getLong(1) == 0L && r8.getLong(2) == 0L &&
      r8.getDouble(3) == 0.0)
  }

  test("scoreTrigram walks the backoff ladder: trigram, bigram, unigram") {
    // "a b c" ×2 → trigram (a,b,c) survives; "a b" adds bigram mass
    val ref3 = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b"))
      .toDF("doc_id", "text")
    val uni = LangModel.unigrams(ref3, toks)     // a:3 b:3 c:2, N=8 V=3
    val big = LangModel.bigrams(ref3, toks, 2)   // (a,b):3 (b,c):2
    val tri = LangModel.trigrams(ref3, toks, 2)  // (a,b,c):2
    val probe = Seq(
      (10L, "a b c"),   // trigram path: 2/3
      (11L, "x b c"),   // bigram backoff: 0.4·(c(b,c)/c(b)) = 0.4·2/3
      (12L, "x y z"),   // unigram backoff: 0.4²·(0+1)/(8+3)
      (13L, "a b"))     // under 3 tokens: 0 windows
      .toDF("doc_id", "text")
    val got = LangModel.scoreTrigram(probe, "doc_id", toks, uni, big, tri)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got(0) == ((10L, 1L, 1L, 0L,
      (0.0 + 2L.toDouble / 3L.toDouble) / 1L.toDouble)))
    assert(got(1) == ((11L, 1L, 0L, 1L,
      (0.0 + 0.4 * (2L.toDouble / 3L.toDouble)) / 1L.toDouble)))
    assert(got(2) == ((12L, 1L, 0L, 0L,
      (0.0 + 0.4 * 0.4 * (1L.toDouble / (8L + 3L).toDouble))
        / 1L.toDouble)))
    assert(got(3) == ((13L, 0L, 0L, 0L, 0.0)))
  }

  test("score is bit-identical under repartitioning") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val uni = LangModel.unigrams(docs, t)
    val big = LangModel.bigrams(docs, t, 2)
    def run(d: org.apache.spark.sql.DataFrame) =
      LangModel.score(d, "doc_id", t, uni, big).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
    assert(run(docs) == run(docs.repartition(11)))
  }

  test("compiled kernel ≡ relational scorer bit-for-bit, both orders") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val uni = LangModel.unigrams(docs, t)
    val big = LangModel.bigrams(docs, t, 2)
    val tri = LangModel.trigrams(docs, t, 2)
    val rel2 = LangModel.score(docs, "doc_id", t, uni, big)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val ker2 = LangModel.scoreCompiled(docs, "doc_id", "text", uni, big)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(ker2 == rel2)
    val rel3 = LangModel.scoreTrigram(docs, "doc_id", t, uni, big, tri)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val ker3 = LangModel.scoreTrigramCompiled(docs, "doc_id", "text",
      uni, big, tri).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(ker3 == rel3)
  }

  test("kernel tokenizer edge cases match split(trim(text), ' +')") {
    // the kernel replicates the ENGINE tokenizer
    // (TextFunctions.tokens), so the relational reference must use it
    val et = graft.functions.TextFunctions.tokens(col("text"))
    val uni = LangModel.unigrams(ref, et)
    val big = LangModel.bigrams(ref, et, 2)
    // empty, all-space, multi-space runs, leading/trailing spaces,
    // single token, unseen tokens
    val edge = Seq((1L, ""), (2L, "   "), (3L, "a  b   c"),
      (4L, "  a b  "), (5L, "a"), (6L, "zz yy xx"))
      .toDF("doc_id", "text")
    val rel = LangModel.score(edge, "doc_id", et, uni, big)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val ker = LangModel.scoreCompiled(edge, "doc_id", "text", uni, big)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(ker == rel)
  }

  test("scoreBy ≡ an independent per-language score() run for every " +
    "language (the CCNet per-group contract)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val uni = LangModel.unigramsBy(docs, col("lang"), t)
    val big = LangModel.bigramsBy(docs, col("lang"), t, 2)
    val got = LangModel.scoreBy(docs, "doc_id", col("lang"), t, uni, big)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val langs = docs.select(col("lang")).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(langs.size > 1, "fixture needs multiple languages")
    val expected = langs.flatMap { l =>
      val sub = docs.filter(col("lang") === l)
      LangModel.score(sub, "doc_id", t,
        LangModel.unigrams(sub, t), LangModel.bigrams(sub, t, 2))
        .collect().map(r => (r.getLong(0), l, r.getLong(1),
          r.getLong(2), r.getDouble(3)))
    }.sortBy(_._1)
    assert(got == expected)
    // and the per-group training is ONE aggregate keyed by (lang,
    // ngram) — the count tables carry every language
    assert(uni.select(col("g")).distinct().count() == langs.size)
  }

  test("compiled model bank ≡ relational scoreBy bit-for-bit, incl. " +
    "untrained groups and edge texts") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val uni = LangModel.unigramsBy(docs, col("lang"), t)
    val big = LangModel.bigramsBy(docs, col("lang"), t, 2)
    val rel = LangModel.scoreBy(docs, "doc_id", col("lang"), t, uni, big)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val bank = LangModel.broadcastBank(spark,
      LangModel.compileModelBy(uni, big))
    val ker = LangModel.scoreByCompiled(docs, "doc_id", "text", "lang",
      bank).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(ker == rel)
    // edges: untrained lang, empty text, null-ish spacing
    val edge = Seq((1L, "en", ""), (2L, "xx", "a b c"),
      (3L, "en", "  a  b "), (4L, "de", "a"))
      .toDF("doc_id", "lang", "text")
    val relE = LangModel.scoreBy(edge, "doc_id", col("lang"), t,
      uni, big).orderBy("doc_id").collect().map(_.toSeq).toSeq
    val kerE = LangModel.scoreByCompiled(edge, "doc_id", "text", "lang",
      bank).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(kerE == relE)
  }

  test("trigram model bank ≡ relational scoreTrigramBy bit-for-bit") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val uni = LangModel.unigramsBy(docs, col("lang"), t)
    val big = LangModel.bigramsBy(docs, col("lang"), t, 2)
    val tri = LangModel.trigramsBy(docs, col("lang"), t, 2)
    val rel = LangModel.scoreTrigramBy(docs, "doc_id", col("lang"), t,
      uni, big, tri).orderBy("doc_id").collect().map(_.toSeq).toSeq
    val bank = LangModel.broadcastBank(spark,
      LangModel.compileModelBy(uni, big, Some(tri)))
    val ker = LangModel.scoreTrigramByCompiled(docs, "doc_id", "text",
      "lang", bank).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(ker == rel)
    // and against an independent per-language scoreTrigram run
    val langs = docs.select(col("lang")).distinct()
      .collect().map(_.getString(0)).toSeq
    val expected = langs.flatMap { l =>
      val sub = docs.filter(col("lang") === l)
      LangModel.scoreTrigram(sub, "doc_id", t,
        LangModel.unigrams(sub, t), LangModel.bigrams(sub, t, 2),
        LangModel.trigrams(sub, t, 2))
        .collect().map(r => Seq(r.getLong(0), l, r.getLong(1),
          r.getLong(2), r.getLong(3), r.getDouble(4)))
    }.sortBy(_.head.asInstanceOf[Long])
    assert(rel == expected)
  }

  test("compileModelBy refuses the row gate and space-bearing tokens " +
    "loudly") {
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val train = Seq((1L, "en", "a b a b"), (2L, "de", "x y x y"))
      .toDF("doc_id", "lang", "text")
    val uni = LangModel.unigramsBy(train, col("lang"), t)
    val big = LangModel.bigramsBy(train, col("lang"), t, 1)
    intercept[ModelTooLargeException] {
      LangModel.compileModelBy(uni, big, maxModelRows = 2)
    }
    // a tokenizer yielding space-bearing tokens mis-buckets n-gram
    // order — loud, not silent
    val badUni = LangModel.unigramsBy(train, col("lang"),
      array(col("text")))
    val e = intercept[IllegalArgumentException] {
      LangModel.compileModelBy(badUni, big)
    }
    assert(e.getMessage.contains("space"), e.getMessage)
  }

  test("scoreBy restores docs of an untrained group as (0, 0, 0.0)") {
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val train = Seq((1L, "en", "a b a b"), (2L, "en", "a b c"))
      .toDF("doc_id", "lang", "text")
    val uni = LangModel.unigramsBy(train, col("lang"), t)
    val big = LangModel.bigramsBy(train, col("lang"), t, 1)
    val probe = Seq((10L, "en", "a b"), (11L, "xx", "a b"))
      .toDF("doc_id", "lang", "text")
    val got = LangModel.scoreBy(probe, "doc_id", col("lang"), t,
      uni, big).orderBy("doc_id").collect()
    assert(got(0).getLong(2) == 1L && got(0).getDouble(4) > 0.0)
    assert(got(1).getLong(2) == 0L && got(1).getLong(3) == 0L &&
      got(1).getDouble(4) == 0.0)
  }

  test("compileModel refuses a model over the row gate") {
    val uni = LangModel.unigrams(ref, toks)
    val big = LangModel.bigrams(ref, toks, 2)
    val e = intercept[IllegalArgumentException] {
      LangModel.compileModel(uni, big, None, maxModelRows = 2)
    }
    assert(e.getMessage.contains("relational"))
  }

  test("in-domain text outscores shuffled-vocabulary gibberish") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val uni = LangModel.unigrams(docs, t)
    val big = LangModel.bigrams(docs, t, 2)
    val fluent = LangModel.score(docs, "doc_id", t, uni, big)
      .agg(avg(col("mean_p"))).head.getDouble(0)
    // gibberish: same tokens, reversed order per doc — bigram
    // structure destroyed, unigram mass identical
    val shuffled = docs.select(col("doc_id"),
      concat_ws(" ", reverse(t)).as("text"))
    val gib = LangModel.score(shuffled, "doc_id", t, uni, big)
      .agg(avg(col("mean_p"))).head.getDouble(0)
    assert(fluent > gib,
      s"LM did not separate fluent ($fluent) from reversed ($gib)")
  }
}
