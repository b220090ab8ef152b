package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NbClassifierSpec extends SparkSpec {

  import spark.implicits._

  // tiny labeled corpus: 'ja'-marker vs 'no'-marker classes, one
  // shared filler token
  private def corpus = Seq(
    (1L, "A", "ja ja filler"),
    (2L, "A", "ja filler filler"),
    (3L, "B", "no no filler"),
    (4L, "B", "no filler no")).toDF("doc_id", "label", "text")

  private def toks = split(col("text"), " ")

  test("trainCounts matches hand counts and applies the minCount prune") {
    val got = NbClassifier.trainCounts(corpus, toks, col("label"), 2)
      .orderBy("label", "token")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // A: ja×3, filler×3; B: no×4, filler×2. Nothing below 2 here; a
    // singleton appears if we raise the bar:
    assert(got.toSeq == Seq(
      ("A", "filler", 3L), ("A", "ja", 3L),
      ("B", "filler", 2L), ("B", "no", 4L)))
    val pruned = NbClassifier.trainCounts(corpus, toks, col("label"), 3)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pruned.toSet == Set(("A", "filler"), ("A", "ja"), ("B", "no")))
  }

  test("predictVotes recovers the planted classes; votes are exact") {
    val counts = NbClassifier.trainCounts(corpus, toks, col("label"), 1)
    val got = NbClassifier.predictVotes(corpus, "doc_id", toks, counts)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    // hand model: V=3; N_A=6, N_B=6.
    //  p(ja|A)=(3+1)/9, p(ja|B)=(0+1)/9 → 'ja' votes A
    //  p(no|B)=5/9 vs 1/9 → 'no' votes B
    //  filler: A (3+1)/9 vs B (2+1)/9 → votes A
    // doc1 (ja ja filler) → A:3 votes; doc3 (no no filler): B:2, A:1
    assert(got.toSeq == Seq(
      (1L, "A", 3L, 3L), (2L, "A", 3L, 3L),
      (3L, "B", 2L, 3L), (4L, "B", 2L, 3L)))
  }

  test("out-of-vocabulary tokens vote for the smallest class total") {
    val skew = Seq(
      (1L, "A", "a a a a"),
      (2L, "B", "b b")).toDF("doc_id", "label", "text")
    val counts = NbClassifier.trainCounts(skew, toks, col("label"), 1)
    // doc of only unseen tokens: every class offers 1/(N_c+V);
    // N_A=4 > N_B=2 → B wins
    val probe = Seq((9L, "?", "zzz yyy")).toDF("doc_id", "label", "text")
    val got = NbClassifier.predictVotes(probe, "doc_id", toks, counts)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((9L, "B", 2L)))
  }

  test("scoreBinary matches a local fold and is partitioning-invariant") {
    val lab = when(col("label") === "A", lit("pos")).otherwise(lit("neg"))
    val counts = NbClassifier.trainCounts(corpus, toks, lab, 1)
    val priors = NbClassifier.docPriors(corpus, lab)
    def run(df: org.apache.spark.sql.DataFrame) =
      NbClassifier.scoreBinary(df, "doc_id", toks, counts, priors, "pos")
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3)))
    val got = run(corpus)
    // local reference fold (same IEEE ops, same order):
    // model: V=3, Npos=6, Nneg=6; prior = 2/2 = 1
    val cPos = Map("ja" -> 3L, "filler" -> 3L)
    val cNeg = Map("no" -> 4L, "filler" -> 2L)
    def ratio(t: String): Double =
      ((cPos.getOrElse(t, 0L) + 1L).toDouble / (6L + 3L).toDouble) /
        ((cNeg.getOrElse(t, 0L) + 1L).toDouble / (6L + 3L).toDouble)
    def score(text: String): Double =
      text.split(" ").take(40).foldLeft(1.0)((a, t) => a * ratio(t)) *
        (2L.toDouble / 2L.toDouble)
    val want = Seq(
      (1L, 3L, score("ja ja filler"), score("ja ja filler") >= 1.0),
      (2L, 3L, score("ja filler filler"), score("ja filler filler") >= 1.0),
      (3L, 3L, score("no no filler"), score("no no filler") >= 1.0),
      (4L, 3L, score("no filler no"), score("no filler no") >= 1.0))
    assert(got.toSeq == want)
    assert(got.count(_._4) == 2) // the two A docs clear the ratio
    // bit-identical under a different partitioning
    assert(run(corpus.repartition(7)).toSeq == got.toSeq)
  }

  test("scoreBinary counts only in-vocabulary prefix tokens as seen") {
    val lab = when(col("label") === "A", lit("pos")).otherwise(lit("neg"))
    val counts = NbClassifier.trainCounts(corpus, toks, lab, 1)
    val priors = NbClassifier.docPriors(corpus, lab)
    val probe = Seq((7L, "?", "ja unseen filler"))
      .toDF("doc_id", "label", "text")
    val got = NbClassifier.scoreBinary(probe, "doc_id", toks, counts,
      priors, "pos").collect()
    assert(got.head.getLong(1) == 2L) // ja + filler seen, unseen not
  }

  test("compiled kernel ≡ relational scoreBinary bit-for-bit, incl. " +
    "tokenizer edges") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val et = graft.functions.TextFunctions.tokens(col("text"))
    val lab = when(col("lang") === "en", lit("pos")).otherwise(lit("neg"))
    val counts = NbClassifier.trainCounts(docs, et, lab, 2)
    val priors = NbClassifier.docPriors(docs, lab)
    val rel = NbClassifier.scoreBinary(docs, "doc_id", et, counts,
      priors, "pos").orderBy("doc_id").collect().map(_.toSeq).toSeq
    val model = NbClassifier.compileBinary(counts, priors, "pos")
    val ker = NbClassifier.scoreBinaryCompiled(docs, "doc_id", "text",
      model).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(ker == rel)
    // edge texts: empty, all-space, runs, padding, short, unseen
    val edge = Seq((1L, ""), (2L, "   "), (3L, "ja  no   filler"),
      (4L, "  ja filler  "), (5L, "x"), (6L, "zz yy xx"))
      .toDF("doc_id", "text")
    val cons = NbClassifier.trainCounts(corpus, toks,
      when(col("label") === "A", lit("pos")).otherwise(lit("neg")), 1)
    val pris = NbClassifier.docPriors(corpus,
      when(col("label") === "A", lit("pos")).otherwise(lit("neg")))
    val relE = NbClassifier.scoreBinary(edge, "doc_id",
      graft.functions.TextFunctions.tokens(col("text")), cons, pris,
      "pos").orderBy("doc_id").collect().map(_.toSeq).toSeq
    val kerE = NbClassifier.scoreBinaryCompiled(edge, "doc_id", "text",
      NbClassifier.compileBinary(cons, pris, "pos"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(kerE == relE)
  }

  test("compileBinary refuses a model over the row gate") {
    val lab = when(col("label") === "A", lit("pos")).otherwise(lit("neg"))
    val counts = NbClassifier.trainCounts(corpus, toks, lab, 1)
    val priors = NbClassifier.docPriors(corpus, lab)
    val e = intercept[IllegalArgumentException] {
      NbClassifier.compileBinary(counts, priors, "pos", maxModelRows = 1)
    }
    assert(e.getMessage.contains("relational"))
  }

  test("predictLog matches a local log-space reference on the tiny corpus") {
    val counts = NbClassifier.trainCounts(corpus, toks, col("label"), 1)
    val got = NbClassifier.predictLog(corpus, "doc_id", toks, counts,
      NbClassifier.docPriors(corpus, col("label")))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // local reference with the same JVM Math.log and fold order
    val cA = Map("ja" -> 3L, "filler" -> 3L)
    val cB = Map("no" -> 4L, "filler" -> 2L)
    def lp(m: Map[String, Long], t: String): Double =
      math.log((m.getOrElse(t, 0L) + 1L).toDouble / (6L + 3L).toDouble)
    def post(m: Map[String, Long], text: String): Double =
      text.split(" ").foldLeft(0.0)((a, t) => a + lp(m, t)) +
        math.log(2L.toDouble)
    val want = corpus.collect().map { r =>
      val (id, text) = (r.getLong(0), r.getString(2))
      val (pa, pb) = (post(cA, text), post(cB, text))
      if (pa >= pb) (id, "A", pa) else (id, "B", pb)
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("log-space prediction on the real table beats the label prior " +
    "and is partitioning-invariant") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val counts = NbClassifier.trainCounts(docs, t, col("lang"), 2)
    val priors = NbClassifier.docPriors(docs, col("lang"))
    def run(d: org.apache.spark.sql.DataFrame) =
      NbClassifier.predictLog(d, "doc_id", t, counts, priors)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSeq
    val pred = run(docs)
    val lang = docs.select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = pred.size
    val correct = pred.count { case (id, p, _) => lang(id) == p }
    val prior = lang.values.groupBy(identity).values.map(_.size).max
    assert(correct.toDouble / n > prior.toDouble / n,
      s"NB accuracy $correct/$n no better than majority prior $prior/$n")
    assert(run(docs.repartition(13)) == pred)
  }
}
