package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {

  import spark.implicits._

  test("bucketCounts is capped by the bucket space and conserves mass") {
    val docs = Seq.tabulate(50)(i => (i.toLong, s"w$i x$i y$i"))
      .toDF("doc_id", "text")
    val counts = Dsir.bucketCounts(docs, "text", 16)
    assert(counts.count() <= 16)
    // 3 unigrams + 2 bigrams per doc
    assert(counts.agg(sum($"cnt")).head.getLong(0) == 50L * 5L)
  }

  test("weights favor target-like documents; fold matches a local " +
    "reference and is partitioning-invariant") {
    val target = Seq((1L, "alpha beta alpha beta"),
      (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = (Seq((10L, "alpha beta alpha"), (11L, "delta epsilon zeta"),
      (12L, "delta zeta epsilon")) ++ Seq((1L, "alpha beta alpha beta"),
      (2L, "alpha beta gamma"))).toDF("doc_id", "text")
    val b = 64
    val tc = Dsir.bucketCounts(target, "text", b)
    val rc = Dsir.bucketCounts(raw, "text", b)
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.weights(df, "doc_id", "text", tc, rc, b).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    val got = run(raw)
    val byId = got.map(t => t._1 -> t._3).toMap
    // target-vocabulary docs outweigh off-target docs
    assert(byId(10L) > byId(11L), s"weights: $byId")
    assert(byId(1L) > byId(12L), s"weights: $byId")
    // local reference of the exact fold for one doc (10): features =
    // unigram buckets then bigram buckets, same md5 hash, same
    // smoothing, fold from 1.0
    def bucket(s: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.substring(0, 15), 16) % b
    }
    val tgtToks = Seq("alpha", "beta", "alpha", "beta", "alpha", "beta",
      "gamma")
    val tgtBigs = Seq("alpha beta", "beta alpha", "alpha beta",
      "alpha beta", "beta gamma")
    val rawDocs = Seq("alpha beta alpha", "delta epsilon zeta",
      "delta zeta epsilon", "alpha beta alpha beta", "alpha beta gamma")
    val tMap = (tgtToks ++ tgtBigs).groupBy(bucket).map { case (k, v) =>
      k -> v.size.toLong }
    val rMap = rawDocs.flatMap { d =>
      val ts = d.split(" ").toSeq
      ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }.groupBy(bucket).map { case (k, v) => k -> v.size.toLong }
    val (nT, nR) = (tMap.values.sum, rMap.values.sum)
    val feats10 = {
      val ts = Seq("alpha", "beta", "alpha")
      (ts ++ ts.sliding(2).map(_.mkString(" "))).map(bucket)
    }
    val want10 = feats10.take(40).foldLeft(1.0) { (acc, f) =>
      acc * (((tMap.getOrElse(f, 0L) + 1L).toDouble /
        (nT + b).toDouble) /
        ((rMap.getOrElse(f, 0L) + 1L).toDouble / (nR + b).toDouble))
    }
    assert(byId(10L) == want10)
    assert(got.map(_._2) == Seq(7L, 5L, 5L, 5L, 5L)) // n_feat per doc
    assert(run(raw.repartition(7)) == got)
  }

  test("split model (one pass) ≡ two bucketCounts frames, weights " +
    "bit-identical") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val tgt = Dsir.bucketCounts(d.filter($"lang" === "en"), "text", 256)
    val raw = Dsir.bucketCounts(d, "text", 256)
    val twoFrame = Dsir.weights(d, "doc_id", "text", tgt, raw, 256)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val split = Dsir.weightsSplit(d, "doc_id", "text",
      Dsir.bucketCountsSplit(d, "text", $"lang" === "en", 256), 256)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(split == twoFrame)
  }

  test("native dsir_feature_buckets ≡ the verbatim composed " +
    "transform/concat_ws featurizer, word and char-gram, edges") {
    import org.apache.spark.sql.Column
    // the PRE-r14 composed form, verbatim (md5_hash60 + pmod over
    // two higher-order transforms) — the equality oracle
    def bucketC(f: Column, buckets: Int): Column =
      pmod(call_function("md5_hash60", f), lit(buckets.toLong))
    def composed(toks: Column, buckets: Int): Column =
      graft.functions.Exprs.bind(toks) { ts =>
        concat(
          transform(ts, t => bucketC(t, buckets)),
          transform(
            when(size(ts) < 2, array().cast("array<string>"))
              .otherwise(transform(sequence(lit(1), size(ts) - 1),
                i => concat_ws(" ", element_at(ts, i),
                  element_at(ts, i + 1)))),
            s => bucketC(s, buckets)))
      }
    graft.GraftExtensions.ensure(spark)
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val edges = Seq((900001L, null.asInstanceOf[String]),
      (900002L, ""), (900003L, "solo"), (900004L, "two tok"),
      (900005L, " padded  spaces  x "))
      .toDF("doc_id", "text")
    val c = d.select($"doc_id", $"text").unionByName(edges)
    for ((toks, label) <- Seq(
      (graft.functions.TextFunctions.tokens($"text"), "word"),
      (graft.functions.TextFunctions.charNgrams($"text", 5), "char"))) {
      val got = c.select($"doc_id",
        Dsir.featuresToks(toks, 1024).as("f"))
        .orderBy($"doc_id").collect().map(_.toSeq).toSeq
      val want = c.select($"doc_id",
        composed(toks, 1024).as("f"))
        .orderBy($"doc_id").collect().map(_.toSeq).toSeq
      assert(got == want, label)
    }
    // null ELEMENT semantics: null unigram bucket, concat_ws-style
    // pair skipping (matches the composed form on the same input)
    val weird = Seq(Tuple1(Seq[String](null, "a", null)))
      .toDF("toks")
    val gotW = weird.select(Dsir.featuresToks($"toks", 64).as("f"))
      .collect().head.toSeq
    val wantW = weird.select(composed($"toks", 64).as("f"))
      .collect().head.toSeq
    assert(gotW == wantW)
  }

  test("self-corpus form (literal scalars from the tokenize-count " +
    "pass) ≡ the two-call composition bit-for-bit, incl. the count " +
    "formula's edge docs") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // edge docs the nf formula must mirror exactly: null text (drops
    // from the explode → count 0), empty text (tokens('') = ['']: ONE
    // unigram, zero bigrams), single token (one unigram, zero
    // bigrams), and a target-side edge doc
    val edges = Seq((900001L, null.asInstanceOf[String], "de"),
      (900002L, "", "de"), (900003L, "solo", "en"),
      (900004L, " padded  spaces ", "en"))
      .toDF("doc_id", "text", "lang")
    val c = d.select($"doc_id", $"text", $"lang").unionByName(edges)
    val twoCall = Dsir.weightsSplit(c, "doc_id", "text",
      Dsir.bucketCountsSplit(c, "text", $"lang" === "en", 256), 256)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val self = Dsir.weightsSplitSelf(c, "doc_id", "text",
      $"lang" === "en", 256)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(self == twoCall)
    // and the char-gram array path (the model_dsir_chargram shape)
    val toks = graft.functions.TextFunctions.charNgrams($"text", 5)
    val twoCallT = Dsir.weightsSplitToks(c, "doc_id", toks,
      Dsir.bucketCountsSplitToks(c, toks, $"lang" === "en", 256), 256)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val selfT = Dsir.weightsSplitSelfToks(c, "doc_id", toks,
      $"lang" === "en", 256)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(selfT == twoCallT)
  }

  test("compiled kernel ≡ relational weightsSplit bit-for-bit, incl. " +
    "tokenizer edges") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val model = Dsir.bucketCountsSplit(d, "text", $"lang" === "en", 256)
    val rel = Dsir.weightsSplit(d, "doc_id", "text", model, 256)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val ker = Dsir.weightsSplitCompiled(d, "doc_id", "text",
      Dsir.compileSplit(model, 256))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(ker == rel)
    // edges: empty, all-space, runs, padding, 1 token, 50-token doc
    // (prefix boundary: 40 unigrams, no bigrams)
    val edge = Seq((1L, ""), (2L, "   "), (3L, "a  b   c"),
      (4L, "  a b  "), (5L, "x"),
      (6L, Seq.tabulate(50)(i => s"w$i").mkString(" ")),
      (7L, Seq.tabulate(30)(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val relE = Dsir.weightsSplit(edge, "doc_id", "text", model, 256)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val kerE = Dsir.weightsSplitCompiled(edge, "doc_id", "text",
      Dsir.compileSplit(model, 256))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(kerE == relE)
  }

  test("resampleTopK is a global (weight DESC, doc_id) head with ranks") {
    val w = Seq((3L, 2L, 0.5), (1L, 2L, 2.0), (2L, 2L, 2.0),
      (4L, 2L, 1.0)).toDF("doc_id", "n_feat", "weight")
    val got = Dsir.resampleTopK(w, 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1, 1L, 2.0), (2, 2L, 2.0), (3, 4L, 1.0)))
  }

  test("on the real table the en split outweighs the others under an " +
    "en target") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val tc = Dsir.bucketCounts(d.filter($"lang" === "en"), "text", 1024)
    val rc = Dsir.bucketCounts(d, "text", 1024)
    val w = Dsir.weights(d, "doc_id", "text", tc, rc, 1024)
      .join(d.select($"doc_id", $"lang"), "doc_id")
    // median-free robust check: mean log-free rank — count of en docs
    // in the top half should beat their base rate
    val n = w.count()
    val topHalf = Dsir.resampleTopK(w, (n / 2).toInt)
      .join(d.select($"doc_id", $"lang"), "doc_id")
    val enTop = topHalf.filter($"lang" === "en").count().toDouble /
      topHalf.count()
    val enBase = d.filter($"lang" === "en").count().toDouble / n
    assert(enTop > enBase,
      s"en fraction in top half $enTop must beat base rate $enBase")
  }
}
