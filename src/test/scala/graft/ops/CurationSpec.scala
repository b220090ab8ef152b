package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Config-driven curation pipeline: a TOML stage list must assemble,
  * drop exactly the planted bad docs, scrub boilerplate, split
  * deterministically, and report a monotone funnel from ONE action. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: 1 good, 2 exact dup of 1, 3 near dup of 1,
  // 4 repetitive garbage, 5 too short, 6 good unrelated
  private val good1 = "the quick brown fox jumps over the lazy dog " +
    "again and again the sun rises in the east of a green valley"
  private val corpus = Seq(
    (1L, good1),
    (2L, good1),
    (3L, good1.replace("dog", "cat")),
    (4L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    (5L, "too short"),
    (6L, "completely different content about spark query engines in the " +
      "world of a distributed data processing and the analytics it does")
  )

  private def writeCorpus(): String = {
    val dir = Files.createTempDirectory("curate-in").toString
    corpus.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    s"$dir/documents.parquet"
  }

  test("TOML config end-to-end: filters, dedup, scrub, split, funnel") {
    val in = writeCorpus()
    val out = Files.createTempDirectory("curate-out").toString + "/c"
    val config =
      s"""[input]
         |path = "$in"
         |
         |[[stages]]
         |type = "length-filter"
         |min-tokens = 5
         |
         |[[stages]]
         |type = "repetition-filter"
         |max-rep-ratio = 0.5
         |
         |[[stages]]
         |type = "dedup-exact"
         |
         |[[stages]]
         |type = "dedup-near"
         |
         |[[stages]]
         |type = "split"
         |train = 80
         |valid = 10
         |test = 10
         |
         |[output]
         |dir = "$out"
         |partition-by = "split"
         |""".stripMargin
    val (n, funnel) = graft.CurateMain.run(spark, config)
    // 5 drops on length, 4 on repetition, 2 on exact dup, 3 on near
    assert(n == 2, s"expected survivors {1, 6}: n=$n funnel=$funnel")
    val names = funnel.map(_._1)
    assert(names == Seq("stage_00_input", "stage_01_length-filter",
      "stage_02_repetition-filter", "stage_03_dedup-exact",
      "stage_04_dedup-near", "stage_05_split"))
    val counts = funnel.map(_._2)
    assert(counts.head == 6L)
    assert(counts == counts.sorted.reverse, s"funnel must be monotone: $funnel")
    // output is really partitioned by split and readable
    val written = spark.read.parquet(out)
    assert(written.count() == 2)
    assert(written.columns.contains("split"))
    val ids = written.select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 6L), s"keeper must be the min id: $ids")
  }

  test("span-scrub stage rewrites the text column in place") {
    val in = writeCorpus()
    val out = Files.createTempDirectory("curate-out2").toString + "/c"
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "span-scrub"
         |width = 10
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n, _) = graft.CurateMain.run(spark, config)
    assert(n == 6)
    val texts = spark.read.parquet(out)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // docs 1 and 2 are identical → their shared 10-token spans scrub
    assert(texts(1L).length < good1.length)
    assert(texts(1L) == texts(2L))
    // unrelated doc 6 untouched
    assert(texts(6L) == corpus.toMap.apply(6L))
  }

  test("nb-filter stage keeps docs the seed-trained classifier scores " +
    "positive; lm-filter drops disfluent docs") {
    val dir = Files.createTempDirectory("curate-model").toString
    // labeled seed set: 'good' docs share the clean vocabulary,
    // 'bad' docs the spam vocabulary
    Seq(
      (101L, "good", "the quick brown fox jumps over the lazy dog"),
      (102L, "good", "the sun rises in the east of a green valley"),
      (103L, "good", "a quick green fox in the lazy sun"),
      (104L, "bad", "buy cheap pills now click here buy now"),
      (105L, "bad", "click buy cheap now here pills cheap click"))
      .toDF("doc_id", "label", "text")
      .write.parquet(s"$dir/seed.parquet")
    val in = s"$dir/in.parquet"
    Seq(
      (1L, "the quick fox in the green valley of the lazy sun"),
      (2L, "buy cheap pills click here now now now"),
      (3L, "the sun rises over the quick brown dog"))
      .toDF("doc_id", "text").write.parquet(in)
    val out = Files.createTempDirectory("curate-model-out").toString + "/c"
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "nb-filter"
         |ref-path = "$dir/seed.parquet"
         |pos-label = "good"
         |min-count = 1
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n, funnel) = graft.CurateMain.run(spark, config)
    assert(n == 2, s"classifier should drop the spam doc: $funnel")
    val ids = spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSet
    assert(ids == Set(1L, 3L))

    // lm-filter: reference corpus = the good seed docs; the
    // scrambled doc shares their vocabulary but no bigrams
    val out2 = Files.createTempDirectory("curate-model-out2")
      .toString + "/c"
    val in2 = s"$dir/in2.parquet"
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "dog the over lazy jumps fox quick brown the"))
      .toDF("doc_id", "text").write.parquet(in2)
    // derive the threshold from the op itself: fluent must outscore
    // scrambled, and the midpoint separates them
    val seed = spark.read.parquet(s"$dir/seed.parquet")
    val st = graft.functions.TextFunctions.tokens(col("text"))
    val scores = LangModel.score(spark.read.parquet(in2), "doc_id", st,
      LangModel.unigrams(seed, st), LangModel.bigrams(seed, st, 2))
      .select($"doc_id", $"mean_p").as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(2L),
      s"fluent must outscore scrambled: $scores")
    val config2 =
      s"""[input]
         |path = "$in2"
         |[[stages]]
         |type = "lm-filter"
         |ref-path = "$dir/seed.parquet"
         |min-count = 2
         |min-score = ${(scores(1L) + scores(2L)) / 2.0}
         |[output]
         |dir = "$out2"
         |""".stripMargin
    val (n2, _) = graft.CurateMain.run(spark, config2)
    assert(n2 == 1)
    val ids2 = spark.read.parquet(out2).select($"doc_id").as[Long]
      .collect().toSet
    assert(ids2 == Set(1L), s"fluent doc must survive: $ids2")

    // ngram = 3 switches the stage to the trigram two-level backoff
    val s3 = LangModel.scoreTrigram(spark.read.parquet(in2), "doc_id",
      st, LangModel.unigrams(seed, st), LangModel.bigrams(seed, st, 2),
      LangModel.trigrams(seed, st, 2))
      .select($"doc_id", $"mean_p").as[(Long, Double)].collect().toMap
    assert(s3(1L) > s3(2L), s"trigram LM must separate: $s3")
    val out3 = Files.createTempDirectory("curate-model-out3")
      .toString + "/c"
    val config3 =
      s"""[input]
         |path = "$in2"
         |[[stages]]
         |type = "lm-filter"
         |ref-path = "$dir/seed.parquet"
         |ngram = 3
         |min-count = 2
         |min-score = ${(s3(1L) + s3(2L)) / 2.0}
         |[output]
         |dir = "$out3"
         |""".stripMargin
    val (n3, _) = graft.CurateMain.run(spark, config3)
    assert(n3 == 1)
    assert(spark.read.parquet(out3).select($"doc_id").as[Long]
      .collect().toSet == Set(1L))
  }

  test("dsir-filter stage keeps target-distribution docs") {
    val dir = Files.createTempDirectory("curate-dsir").toString
    Seq((101L, "alpha beta gamma alpha beta"),
      (102L, "beta alpha gamma beta"))
      .toDF("doc_id", "text").write.parquet(s"$dir/target.parquet")
    Seq((201L, "alpha beta gamma"), (202L, "delta epsilon zeta"),
      (203L, "zeta delta epsilon"), (204L, "epsilon zeta delta"))
      .toDF("doc_id", "text").write.parquet(s"$dir/raw.parquet")
    val in = s"$dir/in.parquet"
    spark.read.parquet(s"$dir/raw.parquet").write.parquet(in)
    val out = Files.createTempDirectory("curate-dsir-out").toString + "/c"
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "dsir-filter"
         |target-path = "$dir/target.parquet"
         |raw-path = "$dir/raw.parquet"
         |buckets = 64
         |min-weight = 1.0
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n, _) = graft.CurateMain.run(spark, config)
    val ids = spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSet
    assert(ids == Set(201L), s"only the target-like doc survives: $ids")
    assert(n == 1)
  }

  test("decontaminate-semantic stage drops embedding-near eval docs") {
    val dir = Files.createTempDirectory("curate-sem").toString
    val in = s"$dir/docs.parquet"
    Seq((1L, "paraphrased leak of the eval question", "srcA"),
      (2L, "entirely unrelated document", "srcA"),
      (3L, "doc with no embedding row survives", "srcB"))
      .toDF("doc_id", "text", "source").write.mode("overwrite").parquet(in)
    // doc 1's vector is near the eval vector; doc 2's is orthogonal;
    // doc 3 has NO embedding row (coverage gap → passes through)
    val embPath = s"$dir/emb.parquet"
    Seq((1L, Array(0.98f, 0.2f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(embPath)
    val evalPath = s"$dir/eval.parquet"
    Seq((100L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(evalPath)
    val out = Files.createTempDirectory("curate-sem-out").toString + "/c"
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "decontaminate-semantic"
         |eval-path = "$evalPath"
         |embedding-path = "$embPath"
         |tau = 0.9
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n, funnel) = graft.CurateMain.run(spark, config)
    assert(n == 2)
    assert(funnel.map(_._2) == Seq(3L, 2L), s"funnel: $funnel")
    val ids = spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSet
    assert(ids == Set(2L, 3L), s"doc 1 must be semantically dropped: $ids")
  }

  test("hybrid retrieval TOML end-to-end: filter -> bm25 + ann retrieve " +
      "-> hard negatives mined to parquet") {
    val dir = Files.createTempDirectory("curate-hyb").toString
    val in = s"$dir/docs.parquet"
    // docs 1-2 lexically match 'spark engine'; docs 3-4 are
    // semantically near the query anchor but share no query term;
    // doc 5 is noise; doc 6 is a too-short row the upstream filter
    // must drop BEFORE retrieval sees it
    Seq(
      (1L, "the spark engine answers queries with a distributed plan"),
      (2L, "a spark engine tutorial for the analytics of big corpora"),
      (3L, "fast cluster computation framework for petabyte analytics"),
      (4L, "distributed query planners and their cost models in depth"),
      (5L, "cooking recipes for a quiet sunday afternoon at home here"),
      (6L, "short"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    // anchor id 1 (the embedding id space == doc id space); docs
    // 3, 4 near the anchor, 2 mid, 5 far
    val embPath = s"$dir/emb.parquet"
    Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.6f, 0.8f)),
      (3L, Array(0.99f, 0.1f)), (4L, Array(0.97f, 0.15f)),
      (5L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(embPath)
    val out = Files.createTempDirectory("curate-hyb-out").toString + "/c"
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "length-filter"
         |min-tokens = 5
         |[[stages]]
         |type = "bm25-retrieve"
         |as = "lex"
         |k = 3
         |queries = ["1:spark engine"]
         |[[stages]]
         |type = "ann-retrieve"
         |as = "sem"
         |k = 3
         |embedding-path = "$embPath"
         |query-ids = ["1"]
         |[[stages]]
         |type = "hard-negatives"
         |semantic = "sem"
         |lexical = "lex"
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n, funnel) = graft.CurateMain.run(spark, config)
    val mined = spark.read.parquet(out)
      .select($"query_id", $"doc_id", $"sem_rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    // semantic top-3 of anchor 1 (self excluded): 3, 4, then 2;
    // lexical top-3 for 'spark engine': docs 1, 2 (the only term
    // matches) — so the hard negatives are exactly {3, 4}
    assert(mined.map(_._2).toSet == Set(3L, 4L),
      s"hard negatives: ${mined.toSeq}")
    assert(n == mined.length.toLong)
    // the funnel observed every stage boundary, including the
    // pass-through retrieve stages
    assert(funnel.map(_._1) == Seq("stage_00_input",
      "stage_01_length-filter", "stage_02_bm25-retrieve",
      "stage_03_ann-retrieve", "stage_04_hard-negatives"),
      s"funnel: $funnel")
  }

  test("fuse stage RRF-combines named slots into a ranked flow") {
    val dir = Files.createTempDirectory("curate-fuse").toString
    val in = s"$dir/docs.parquet"
    Seq(
      (1L, "the spark engine answers queries with a distributed plan"),
      (2L, "a spark engine tutorial for the analytics of big corpora"),
      (3L, "fast cluster computation framework for petabyte analytics"),
      (4L, "distributed query planners and their cost models in depth"),
      (5L, "cooking recipes for a quiet sunday afternoon at home here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val embPath = s"$dir/emb.parquet"
    Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.6f, 0.8f)),
      (3L, Array(0.99f, 0.1f)), (4L, Array(0.97f, 0.15f)),
      (5L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(embPath)
    val out = Files.createTempDirectory("curate-fuse-out").toString + "/c"
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "bm25-retrieve"
         |as = "lex"
         |k = 3
         |queries = ["1:spark engine"]
         |[[stages]]
         |type = "ann-retrieve"
         |as = "sem"
         |k = 3
         |embedding-path = "$embPath"
         |query-ids = ["1"]
         |[[stages]]
         |type = "fuse"
         |inputs = ["lex", "sem"]
         |k = 4
         |[output]
         |dir = "$out"
         |""".stripMargin
    graft.CurateMain.run(spark, config)
    val fused = spark.read.parquet(out)
      .select($"query_id", $"rnk", $"doc_id").as[(Long, Int, Long)]
      .collect().sortBy(_._2)
    // doc 2 is the only doc BOTH rankers surface → two RRF terms →
    // it must fuse to rank 1
    assert(fused.head._3 == 2L, s"fused: ${fused.toSeq}")
    assert(fused.map(_._3).distinct.length == fused.length)
    // cross-check against Fusion.rrfTopK on hand-built rankings:
    // lex = [1, 2], sem = [3, 4, 2] (self excluded)
    val lex = Seq((1L, 1L, 1), (1L, 2L, 2)).toDF("query_id", "doc_id", "rnk")
    val sem = Seq((1L, 3L, 1), (1L, 4L, 2), (1L, 2L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val exp = Fusion.rrfTopK(Seq(lex, sem), 4)
      .select($"query_id", $"rnk", $"doc_id").as[(Long, Int, Long)]
      .collect().sortBy(_._2).toSeq
    assert(fused.toSeq == exp, s"fused ${fused.toSeq} != expected $exp")
  }

  test("bpe-tokenize stage counts tokens with a trained vocabulary " +
      "from parquet, matching a driver-side sequential encode") {
    val dir = Files.createTempDirectory("curate-bpe").toString
    val in = s"$dir/docs.parquet"
    val docs = Seq(
      (1L, "banana bandana banana"),
      (2L, "ban ban banana"),
      (3L, ""),
      (4L, null.asInstanceOf[String]))
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    // train on the corpus the stage will tokenize (the normal flow:
    // train once as a deliberate action, serve from parquet)
    val vocabPath = s"$dir/vocab.parquet"
    val vocab = BpeTrain.train(
      BpeTrain.wordCounts(spark.read.parquet(in), "text"), 20)
    vocab.write.mode("overwrite").parquet(vocabPath)
    val rules = vocab.orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq
    assert(rules.nonEmpty)
    val out = Files.createTempDirectory("curate-bpe-out").toString + "/c"
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "bpe-tokenize"
         |vocab-path = "$vocabPath"
         |[output]
         |dir = "$out"
         |""".stripMargin
    graft.CurateMain.run(spark, config)
    val got = spark.read.parquet(out)
      .select($"doc_id", $"n_bpe_tokens")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    def refEncodeLen(w: String): Long = {
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
      syms.length.toLong
    }
    docs.foreach { case (id, text) =>
      val exp =
        if (text == null) -1L
        else text.split("\\s+").filter(_.nonEmpty).map(refEncodeLen).sum
      assert(got(id) == exp, s"doc $id: got ${got(id)}, expected $exp")
    }
  }

  test("token-budget with vocab-path spends REAL tokenizer tokens, " +
      "not whitespace tokens") {
    val dir = Files.createTempDirectory("curate-bpebudget").toString
    val in = s"$dir/docs.parquet"
    // two docs, both 4 whitespace tokens; doc 1's words fully merge
    // under the vocab (4 BPE tokens), doc 2's stay unmerged char
    // soup (many BPE tokens). A 10-token budget admits doc 1 under
    // BPE counting; whitespace counting would admit both.
    val docs = Seq(
      (1L, "ab ab ab ab"),
      (2L, "xyzw qrst uvmn efgh"))
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val vocabPath = s"$dir/vocab.parquet"
    // vocab: (a,b) -> ab only
    Seq((1, "a", "b", "ab", 4L))
      .toDF("rank", "left", "right", "merged", "freq")
      .write.mode("overwrite").parquet(vocabPath)
    val out = Files.createTempDirectory("curate-bpebudget-out")
      .toString + "/c"
    // doc 2 scores lower quality than doc 1? budget is
    // quality-ordered: make the admit decision deterministic by
    // checking totals instead — doc1 = 4 BPE tokens, doc2 = 16:
    // budget 10 fits exactly one of them whichever order
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "token-budget"
         |budget = 10
         |vocab-path = "$vocabPath"
         |[output]
         |dir = "$out"
         |""".stripMargin
    graft.CurateMain.run(spark, config)
    val ids = spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSet
    assert(ids.size == 1, s"budget 10 must admit exactly one doc: $ids")
    // whitespace counting admits BOTH (4 + 4 <= 10): prove the
    // counter actually changed
    val outWs = Files.createTempDirectory("curate-wsbudget-out")
      .toString + "/c"
    val wsConfig = config.replace(s"""vocab-path = "$vocabPath"\n""", "")
      .replace(out, outWs)
    graft.CurateMain.run(spark, wsConfig)
    val wsIds = spark.read.parquet(outWs).select($"doc_id").as[Long]
      .collect().toSet
    assert(wsIds == Set(1L, 2L), s"whitespace budget should admit both: $wsIds")
  }

  test("ann-index-retrieve serves the persisted IVF index from TOML, " +
      "matching a direct searchTopK call") {
    val dir = Files.createTempDirectory("curate-annidx").toString
    val in = s"$dir/docs.parquet"
    Seq((1L, "alpha document body here"), (2L, "beta document body here"),
      (3L, "gamma document body here"), (4L, "delta document body here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    // persisted index over a 12-vector corpus sharing the id space
    val vecs = (1 to 12).map { i =>
      val base = i % 4 match {
        case 0 => Array(1.0f, 0.0f)
        case 1 => Array(0.0f, 1.0f)
        case 2 => Array(-1.0f, 0.0f)
        case _ => Array(0.0f, -1.0f)
      }
      (i.toLong, Array(base(0) + 0.01f * i, base(1) + 0.005f * i))
    }.toDF("vec_id", "embedding")
    val idxDir = s"$dir/ann-index"
    IncrementalAnn.create(spark, vecs, "embedding", "vec_id", idxDir,
      nCells = 4)
    val out = Files.createTempDirectory("curate-annidx-out").toString + "/c"
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "ann-index-retrieve"
         |as = "sem"
         |k = 3
         |n-probe = 2
         |index-dir = "$idxDir"
         |query-ids = ["1", "2"]
         |[[stages]]
         |type = "fuse"
         |inputs = ["sem", "sem"]
         |k = 3
         |[output]
         |dir = "$out"
         |""".stripMargin
    graft.CurateMain.run(spark, config)
    val got = spark.read.parquet(out)
      .select($"query_id", $"rnk", $"doc_id").as[(Long, Int, Long)]
      .collect().toSet
    // fusing a ranking with itself preserves its order: the output
    // must equal the direct index search's (qid, rank, nid)
    val direct = IncrementalAnn.searchTopK(spark,
      vecs.filter($"vec_id".isin(1L, 2L)), "embedding", "vec_id",
      idxDir, k = 3, nProbe = 2)
      .select($"qid", $"rank", $"nid").as[(Long, Int, Long)]
      .collect().toSet
    assert(got == direct, s"got $got, direct $direct")
  }

  test("a fuse stage naming a missing slot fails loudly at assembly") {
    val in = writeCorpus()
    val out = Files.createTempDirectory("curate-noslot").toString + "/c"
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "fuse"
         |inputs = ["lex", "sem"]
         |[output]
         |dir = "$out"
         |""".stripMargin
    val e = intercept[RuntimeException] {
      graft.CurateMain.run(spark, config)
    }
    assert(e.getMessage.contains("no ranking slot"),
      s"got: ${e.getMessage}")
  }

  test("decontaminate, domain-cap and token-budget stages") {
    val dir = Files.createTempDirectory("curate-in3").toString
    val in = s"$dir/docs.parquet"
    Seq(
      (1L, good1, "srcA"),
      (2L, "completely different content about spark query engines in " +
        "the world of a distributed data processing", "srcA"),
      (3L, "another unrelated document with plenty of the words in a " +
        "sentence of the usual shape and form", "srcA"),
      (4L, "short filler words here in the middle of a corpus", "srcB"))
      .toDF("doc_id", "text", "source").write.mode("overwrite").parquet(in)
    // eval set shares shingles with doc 1 only
    val evalPath = s"$dir/eval.parquet"
    Seq((100L, good1)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(evalPath)
    val out = Files.createTempDirectory("curate-out3").toString + "/c"
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "decontaminate"
         |eval-path = "$evalPath"
         |[[stages]]
         |type = "domain-cap"
         |source-column = "source"
         |max-per-source = 2
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n, funnel) = graft.CurateMain.run(spark, config)
    // doc 1 decontaminated (3 left); srcA capped 2→2 of {2,3}; srcB 1
    assert(funnel.map(_._2) == Seq(4L, 3L, 3L), s"funnel: $funnel")
    assert(n == 3)
    val ids = spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSet
    assert(ids == Set(2L, 3L, 4L), s"doc 1 must be decontaminated: $ids")

    // token budget: tiny budget keeps a strict subset, ordered by quality
    val out2 = Files.createTempDirectory("curate-out4").toString + "/c"
    val budgetCfg =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "token-budget"
         |budget = 30
         |[output]
         |dir = "$out2"
         |""".stripMargin
    val (n2, _) = graft.CurateMain.run(spark, budgetCfg)
    assert(n2 > 0 && n2 < 4, s"a 30-token budget must drop something: $n2")
    val kept = spark.read.parquet(out2)
    assert(kept.columns.toSet == Set("doc_id", "text", "source"),
      "helper columns must not leak into the output")
  }

  test("validate gate passes a clean corpus and fails a violating one loudly") {
    val dir = Files.createTempDirectory("curate-val").toString
    val clean = s"$dir/clean.parquet"
    Seq((1L, "one doc here"), (2L, "two docs here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(clean)
    val dirty = s"$dir/dirty.parquet"
    Seq((1L, "one doc here"), (1L, "dup id"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dirty)
    val out = s"$dir/out"
    def cfg(in: String) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "validate"
         |not-null = "text"
         |unique = "doc_id"
         |[output]
         |dir = "$out"
         |""".stripMargin
    assert(graft.CurateMain.run(spark, cfg(clean))._1 == 2L)
    val e = intercept[RuntimeException] {
      graft.CurateMain.run(spark, cfg(dirty))
    }
    assert(e.getMessage.contains("failed validation") &&
      e.getMessage.contains("not_null(text)") &&
      e.getMessage.contains("unique(doc_id)"), e.getMessage)
  }

  test("validate accepts idiomatic TOML arrays for not-null/unique") {
    // not-null = ["doc_id", "text"] must parse as a column LIST —
    // stringifying the Seq would probe the bogus column 'List(doc_id'
    val dir = Files.createTempDirectory("curate-val-arr").toString
    val in = s"$dir/in.parquet"
    Seq((1L, "one doc here"), (2L, "two docs here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val out = s"$dir/out"
    val cfg =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "validate"
         |not-null = ["doc_id", "text"]
         |unique = ["doc_id"]
         |[output]
         |dir = "$out"
         |""".stripMargin
    assert(graft.CurateMain.run(spark, cfg)._1 == 2L)
  }

  test("streaming mode: re-runs process only NEW files; indexes dedup across runs") {
    val dir = Files.createTempDirectory("curate-stream").toString
    val (in, out, idx) = (s"$dir/in", s"$dir/out", s"$dir/index")
    def cfg(extraStage: String = "") =
      s"""[input]
         |path = "$in"
         |stream = "true"
         |[[stages]]
         |type = "length-filter"
         |min-tokens = 3
         |[[stages]]
         |type = "dedup-exact"
         |index-dir = "$idx"
         |$extraStage
         |[output]
         |dir = "$out"
         |""".stripMargin
    // run 1: two good docs land as the first files
    Seq((1L, good1), (2L, corpus(5)._2)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    val (n1, f1) = graft.CurateMain.run(spark, cfg())
    assert(n1 == 2L, f1.toString)
    // run 2: a NEW file arrives — an exact replay of doc 1 (new id),
    // one genuinely new doc, one too-short doc
    Seq((3L, good1),
      (4L, "a brand new document with enough tokens to survive"),
      (5L, "hi")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    val (n2, f2) = graft.CurateMain.run(spark, cfg())
    // ONLY the new file was read (checkpoint), and the fp index
    // dropped the cross-RUN duplicate
    assert(f2.head._2 == 3L, s"run 2 must see only the new file: $f2")
    assert(n2 == 1L, s"replayed doc must drop via the index: $f2")
    val ids = spark.read.parquet(out)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L), ids.toString)
    // run 3: nothing new → nothing processed, output unchanged
    val (n3, _) = graft.CurateMain.run(spark, cfg())
    assert(n3 == 0L && spark.read.parquet(out).count() == 3)
    // corpus-global stages are refused loudly in stream mode
    val e = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark, cfg(
        extraStage = "[[stages]]\ntype = \"dedup-near\"\n"))
    }
    assert(e.getMessage.contains("not streamable"), e.getMessage)
  }

  test("streaming model filters: fixed-model nb/lm/dsir stages decide " +
    "identically per micro-batch and across runs") {
    val dir = Files.createTempDirectory("curate-model-stream").toString
    val (in, out) = (s"$dir/in", s"$dir/out")
    Seq(
      (101L, "good", "the quick brown fox jumps over the lazy dog"),
      (102L, "good", "the sun rises in the east of a green valley"),
      (103L, "good", "a quick green fox in the lazy sun"),
      (104L, "bad", "buy cheap pills now click here buy now"),
      (105L, "bad", "click buy cheap now here pills cheap click"))
      .toDF("doc_id", "label", "text")
      .write.parquet(s"$dir/seed.parquet")
    def cfg() =
      s"""[input]
         |path = "$in"
         |stream = "true"
         |[[stages]]
         |type = "nb-filter"
         |ref-path = "$dir/seed.parquet"
         |pos-label = "good"
         |min-count = 1
         |[[stages]]
         |type = "dsir-filter"
         |target-path = "$dir/seed.parquet"
         |raw-path = "$dir/seed.parquet"
         |buckets = 64
         |min-weight = 0.0
         |[output]
         |dir = "$out"
         |""".stripMargin
    // run 1: one clean doc and one spam doc
    Seq((1L, "the quick fox in the green valley of the lazy sun"),
      (2L, "buy cheap pills click here now now now"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val (n1, _) = graft.CurateMain.run(spark, cfg())
    assert(n1 == 1L)
    // run 2: the SAME texts under new ids — the fixed models must
    // decide identically on the new micro-batch
    Seq((3L, "the quick fox in the green valley of the lazy sun"),
      (4L, "buy cheap pills click here now now now"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val (n2, _) = graft.CurateMain.run(spark, cfg())
    assert(n2 == 1L)
    val ids = spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().sorted.toSeq
    assert(ids == Seq(1L, 3L), ids.toString)
  }

  test("streaming domain-cap: ledgered cap is global across runs and " +
      "matches the batch stage's per-domain counts on the concatenated input") {
    val dir = Files.createTempDirectory("curate-dcap").toString
    val (in, out, state) = (s"$dir/in", s"$dir/out", s"$dir/state")
    def cfg() =
      s"""[input]
         |path = "$in"
         |stream = "true"
         |[[stages]]
         |type = "domain-cap"
         |source-column = "source"
         |max-per-source = 2
         |state-dir = "$state"
         |[output]
         |dir = "$out"
         |""".stripMargin
    val b1 = Seq((1L, "alpha words one", "srcA"), (2L, "beta words two", "srcA"),
      (3L, "gamma words three", "srcA"), (4L, "delta words four", "srcB"))
    val b2 = Seq((5L, "epsilon words five", "srcA"),
      (6L, "zeta words six", "srcB"), (7L, "eta words seven", "srcB"),
      (8L, "theta words eight", "srcC"))
    b1.toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("append").parquet(in)
    val (n1, _) = graft.CurateMain.run(spark, cfg())
    assert(n1 == 3L) // srcA capped 3→2, srcB 1
    b2.toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("append").parquet(in)
    val (n2, _) = graft.CurateMain.run(spark, cfg())
    // srcA is FULL from run 1 (the ledger carried it over), srcB has
    // one slot left, srcC is fresh
    assert(n2 == 2L, s"run 2 admitted $n2")
    val outDf = spark.read.parquet(out)
    // never admitted twice, and per-domain counts equal the BATCH
    // stage's counts on the concatenated input: min(cap, |domain|)
    assert(outDf.select($"doc_id").as[Long].collect().distinct.length ==
      outDf.count().toInt)
    val streamCounts = outDf.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    val concat = (b1 ++ b2).toDF("doc_id", "text", "source")
    val batchStage = Curation.stage(Map("type" -> "domain-cap",
      "source-column" -> "source", "max-per-source" -> 2L),
      "text", "doc_id", spark)
    val batchCounts = batchStage.apply(concat).groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    assert(streamCounts == batchCounts,
      s"stream $streamCounts != batch $batchCounts")
    // the admitted SET follows the first-come model: within a batch
    // the stage's (id-hash, id) order, across batches arrival order
    val order = concat
      .select($"doc_id", $"source",
        graft.functions.TextFunctions.hashBucket($"doc_id", 1000000)
          .as("h"))
      .as[(Long, String, Long)].collect()
      .map { case (id, src, h) => id -> ((src, h)) }.toMap
    def firstCome(batches: Seq[Seq[Long]]): Set[Long] = {
      val perDomain = scala.collection.mutable.Map.empty[String, Int]
      val admitted = Set.newBuilder[Long]
      batches.foreach { ids =>
        ids.sortBy(id => (order(id)._2, id)).foreach { id =>
          val src = order(id)._1
          if (perDomain.getOrElse(src, 0) < 2) {
            perDomain(src) = perDomain.getOrElse(src, 0) + 1
            admitted += id
          }
        }
      }
      admitted.result()
    }
    val expected = firstCome(Seq(b1.map(_._1), b2.map(_._1)))
    assert(outDf.select($"doc_id").as[Long].collect().toSet == expected)
    // genuine RE-DELIVERY of an already-admitted doc in a later batch:
    // dropped by the ledger (never admitted twice, no duplicate
    // output row, no cap consumed) while a genuinely new doc in the
    // same batch is admitted normally
    assert(expected.contains(4L), "test setup: doc 4 must be admitted")
    Seq((4L, "delta words four", "srcB"), (9L, "iota words nine", "srcC"))
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("append").parquet(in)
    val (n3, _) = graft.CurateMain.run(spark, cfg())
    assert(n3 == 1L, s"re-delivered doc must not re-admit: $n3")
    val ids3 = spark.read.parquet(out).select($"doc_id").as[Long].collect()
    assert(ids3.count(_ == 4L) == 1, "doc 4 duplicated across partitions")
    assert(ids3.toSet == expected + 9L)
  }

  test("streaming token-budget: the ledger carries spent tokens across " +
      "runs; stream-total ≡ the sequential first-come model") {
    val dir = Files.createTempDirectory("curate-tbud").toString
    val (in, out, state) = (s"$dir/in", s"$dir/out", s"$dir/state")
    val budget = 30L
    def cfg() =
      s"""[input]
         |path = "$in"
         |stream = "true"
         |[[stages]]
         |type = "token-budget"
         |budget = $budget
         |state-dir = "$state"
         |[output]
         |dir = "$out"
         |""".stripMargin
    val b1 = Seq(
      (1L, "a modest document with a handful of plain words in it"),
      (2L, "spam spam spam spam spam spam spam spam"),
      (3L, "another ordinary sentence with several everyday words here"))
    val b2 = Seq(
      (4L, "a later arrival with some reasonable words of its own"),
      (5L, "yet another document that may or may not fit the budget"))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val (n1, _) = graft.CurateMain.run(spark, cfg())
    b2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    graft.CurateMain.run(spark, cfg())
    val outIds = spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSet
    // sequential reference: walk each batch in (quality desc, id)
    // order, admit while spent + ntok <= budget (budgetFilter is a
    // monotone prefix within a batch), carry spent across batches —
    // computed with the SAME quality/token functions
    val metrics = (b1 ++ b2).toDF("doc_id", "text")
      .select($"doc_id",
        graft.functions.TextFunctions.qualityScore($"text").as("q"),
        graft.functions.TextFunctions.tokenCount($"text")
          .cast("long").as("ntok"))
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    var spent = 0L
    val expected = Set.newBuilder[Long]
    Seq(b1.map(_._1), b2.map(_._1)).foreach { ids =>
      var cum = 0L
      var open = true
      ids.sortBy(id => (-metrics(id)._1, id)).foreach { id =>
        val ntok = metrics(id)._2
        if (open && cum + ntok <= budget - spent) {
          cum += ntok; expected += id
        } else open = false // prefix semantics: first overflow closes
      }
      spent += cum
    }
    val exp = expected.result()
    assert(outIds == exp, s"stream $outIds != sequential model $exp")
    assert(n1 > 0 && outIds.nonEmpty)
    // the total never exceeds the budget
    val totalTok = outIds.toSeq.map(id => metrics(id)._2).sum
    assert(totalTok <= budget, s"admitted $totalTok tokens > $budget")
    // a third run with nothing new admits nothing and leaves the
    // output untouched
    val before = spark.read.parquet(out).count()
    val (n3, _) = graft.CurateMain.run(spark, cfg())
    assert(n3 == 0L && spark.read.parquet(out).count() == before)
  }

  test("dedup-near index append lands only after the output write succeeds") {
    val dir = Files.createTempDirectory("curate-idx").toString
    val in = s"$dir/docs.parquet"
    Seq((1L, good1), (2L, "a different doc with other words in it here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val idx = s"$dir/index"
    // an output path under a plain FILE → the parquet write fails
    val blocker = java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/blocker"))
    def cfg(out: String) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "dedup-near"
         |index-dir = "$idx"
         |[output]
         |dir = "$out"
         |""".stripMargin
    intercept[Throwable] {
      graft.CurateMain.run(spark, cfg(s"$blocker/sub/out"))
    }
    // the failed run must NOT have blacklisted the batch: a retry
    // with a good output path still accepts every doc
    val (n, _) = graft.CurateMain.run(spark, cfg(s"$dir/out"))
    assert(n == 2L,
      "docs were blacklisted by a failed run's index append")
    // and now the index holds their bands (the success-path append)
    assert(spark.read.parquet(idx).count() > 0)
  }

  test("unknown stage type fails loudly") {
    val e = intercept[RuntimeException] {
      Curation.stage(Map("type" -> "typo-stage"), "text", "doc_id", spark)
    }
    assert(e.getMessage.contains("unknown curation stage"))
  }

  test("blocklist-filter stage drops docs containing any pattern") {
    val d = Seq(
      (1L, "perfectly clean document"),
      (2L, "mentions the forbidden phrase here"),
      (3L, "has for bidden split so it survives"),
      (4L, "also bad phrase two appears")
    ).toDF("doc_id", "text")
    val st = Curation.stage(Map("type" -> "blocklist-filter",
      "patterns" -> Seq("forbidden phrase", "bad phrase two")),
      "text", "doc_id", spark)
    assert(st.streamable)
    assert(st.apply(d).select($"doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L))
  }


  test("nfc-normalize stage composes text in place") {
    val d = Seq((1L, "cafe\u0301 here"), (2L, "plain"))
      .toDF("doc_id", "text")
    val st = Curation.stage(Map("type" -> "nfc-normalize"),
      "text", "doc_id", spark)
    assert(st.streamable)
    val out = st.apply(d).orderBy($"doc_id").as[(Long, String)]
      .collect().toSeq
    assert(out == Seq((1L, "caf\u00e9 here"), (2L, "plain")))
  }

  test("media-filter stage keeps only decodable images inside the " +
    "dimension bounds, across all four codecs") {
    import graft.functions.{BmpFixture, GifFixture, JpegFixture, PngFixture}
    val rows = Seq(
      (1L, PngFixture.build(1L, 64, 48)),            // keep
      (2L, GifFixture.build(2L, 40, 40)),            // keep
      (3L, JpegFixture.build(3L, 64, 32)),           // keep
      (4L, BmpFixture.build(4L, 33, 33)),            // keep
      (5L, PngFixture.build(5L, 8, 8)),              // too small
      (6L, "not an image at all".getBytes("UTF-8")), // undecodable
      (7L, null.asInstanceOf[Array[Byte]]))          // null blob
    val d = rows.toDF("doc_id", "payload")
    val st = Curation.stage(Map("type" -> "media-filter",
      "min-width" -> 32L, "min-height" -> 32L), "text", "doc_id", spark)
    assert(st.streamable)
    assert(st.apply(d).select($"doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L, 4L))
    // formats accept-list: png-only now drops the GIF/JPEG/BMP rows
    val pngOnly = Curation.stage(Map("type" -> "media-filter",
      "min-width" -> 32L, "min-height" -> 32L,
      "formats" -> Seq("png")), "text", "doc_id", spark)
    assert(pngOnly.apply(d).select($"doc_id").as[Long].collect()
      .toSeq == Seq(1L))
    // unknown format name fails loudly
    intercept[IllegalArgumentException] {
      Curation.stage(Map("type" -> "media-filter",
        "formats" -> Seq("webp")), "text", "doc_id", spark)
    }
  }

  test("warc input format: curate straight from .warc/.warc.gz shards") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("warcin").toString
    val outDir = Files.createTempDirectory("warcout").toString + "/out"
    // two shards, one plain (id 2) one per-record-gzip (id 3)
    Files.write(Paths.get(dir, "a.warc"),
      graft.functions.WarcFixture.build(2L, 4))
    Files.write(Paths.get(dir, "b.warc.gz"),
      graft.functions.WarcFixture.build(3L, 3))
    val config =
      s"""[input]
         |path = "$dir"
         |format = "warc"
         |[output]
         |dir = "$outDir"
         |[[stages]]
         |type = "length-filter"
         |min-tokens = 1
         |""".stripMargin
    val (n, _) = graft.CurateMain.run(spark, config)
    assert(n == 7L, s"4 + 3 response records, got $n")
    val out = spark.read.parquet(outDir)
    assert(out.columns.toSet == Set("doc_id", "uri", "text"))
    val rows = out.orderBy($"uri").collect()
    assert(rows.length == 7)
    // html_text already ran: body text only, no tags
    rows.foreach { r =>
      val t = r.getAs[String]("text")
      assert(t.startsWith("crawl text") && !t.contains("<"), t)
    }
    // ids are stable content hashes: re-running yields identical ids
    val ids1 = out.select($"doc_id").as[Long].collect().sorted.toSeq
    val (n2, _) = graft.CurateMain.run(spark, config)
    assert(n2 == 7L)
    val again = spark.read.parquet(outDir).select($"doc_id")
      .as[Long].collect().sorted.toSeq
    assert(again == ids1)
  }

  test("webdataset input format: tar shards reassemble into samples " +
    "and feed media stages") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("wdsin").toString
    val outDir = Files.createTempDirectory("wdsout").toString + "/out"
    Files.write(Paths.get(dir, "shard0.tar"),
      graft.functions.TarFixture.build(10L, 3))
    Files.write(Paths.get(dir, "shard1.tar"),
      graft.functions.TarFixture.build(11L, 2))
    val config =
      s"""[input]
         |path = "$dir"
         |format = "webdataset"
         |[output]
         |dir = "$outDir"
         |[[stages]]
         |type = "media-filter"
         |blob-col = "payload"
         |min-width = 4
         |min-height = 3
         |""".stripMargin
    val (n, _) = graft.CurateMain.run(spark, config)
    // 5 samples total; sample i's png is (i%5+3)x(i%4+3): i=0 → 3x3
    // fails min-width 4; i=1 → 4x4 passes; i=2 → 5x5 passes. Shard 1:
    // i=0 fails, i=1 passes. → 3 survivors
    assert(n == 3L, s"got $n")
    val out = spark.read.parquet(outDir).orderBy($"sample_key")
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.getAs[String]("text").startsWith("sample "))
      assert(r.getAs[String]("label").length == 1)
    }
  }

  test("streaming warc input: the crawl-shard drain processes only " +
    "newly-landed shards") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("warcstream").toString
    val (in, out) = (s"$dir/in", s"$dir/out")
    Files.createDirectories(Paths.get(in))
    val config =
      s"""[input]
         |path = "$in"
         |format = "warc"
         |stream = "true"
         |[output]
         |dir = "$out"
         |[[stages]]
         |type = "length-filter"
         |min-tokens = 1
         |""".stripMargin
    Files.write(Paths.get(in, "s0.warc"),
      graft.functions.WarcFixture.build(2L, 3))
    val (n1, _) = graft.CurateMain.run(spark, config)
    assert(n1 == 3L, s"got $n1")
    // a new shard lands (gzip transport); only IT drains on run 2
    Files.write(Paths.get(in, "s1.warc.gz"),
      graft.functions.WarcFixture.build(3L, 2))
    val (n2, f2) = graft.CurateMain.run(spark, config)
    assert(n2 == 2L, s"run 2 must drain only the new shard: $f2")
    assert(spark.read.parquet(out).count() == 5)
    // webdataset is batch-only: refused loudly in stream mode
    val e = intercept[RuntimeException] {
      graft.CurateMain.run(spark, config.replace("\"warc\"",
        "\"webdataset\""))
    }
    assert(e.getMessage.contains("batch-only"), e.getMessage)
  }

  test("streaming warc drain survives ONE hostile shard: gzip bomb " +
    "past the inflate guard + malformed bytes contribute zero rows") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("warchostile").toString
    val (in, out) = (s"$dir/in", s"$dir/out")
    Files.createDirectories(Paths.get(in))
    val config =
      s"""[input]
         |path = "$in"
         |format = "warc"
         |stream = "true"
         |max-files-per-trigger = "1"
         |[output]
         |dir = "$out"
         |[[stages]]
         |type = "length-filter"
         |min-tokens = 1
         |""".stripMargin
    Files.write(Paths.get(in, "good0.warc"),
      graft.functions.WarcFixture.build(2L, 3))
    // the bomb: ~280 KB on disk, inflating past the 256 MB guard —
    // records() must DROP it (null → zero rows), never buffer it
    Files.write(Paths.get(in, "hostile.warc.gz"),
      graft.functions.WarcFixture.gzipBomb(300L * 1024 * 1024))
    // and plain garbage that fails the WARC/ version check
    Files.write(Paths.get(in, "garbage.warc"),
      "this is not a WARC shard\r\n".getBytes("UTF-8"))
    Files.write(Paths.get(in, "good1.warc.gz"),
      graft.functions.WarcFixture.build(3L, 2))
    // with maxFilesPerTrigger=1 the hostile shards are their own
    // micro-batches — the stream must complete through them
    val (n1, _) = graft.CurateMain.run(spark, config)
    assert(n1 == 5L, s"only the good shards' records drain: $n1")
    assert(spark.read.parquet(out).count() == 5)
    // the drain stays incremental afterwards: a new good shard lands
    // and ONLY it drains (the hostile files are checkpointed as
    // consumed, not retried forever)
    Files.write(Paths.get(in, "good2.warc"),
      graft.functions.WarcFixture.build(4L, 2))
    val (n2, _) = graft.CurateMain.run(spark, config)
    assert(n2 == 2L, s"run 2 must drain only the new shard: $n2")
    assert(spark.read.parquet(out).count() == 7)
  }

  test("frame-features stage: default fingerprint model matches the " +
    "gate expression; a config-named model class plugs in; bogus " +
    "classes fail loudly") {
    val d = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    // default model = the deterministic md5 fingerprint — must equal
    // the expression form the oracle checks
    val st = Curation.stage(Map("type" -> "frame-features",
      "stride" -> 2L), "text", "doc_id", spark)
    assert(st.streamable && st.replacesFlow)
    val got = st.apply(d).orderBy($"doc_id", $"frame_idx")
      .as[(Long, Int, String)].collect().toSeq
    val expected = graft.ops.Multimodal.sampleFrames(
      graft.ops.Multimodal.withSyntheticMedia(d, "text"), 2)
      .select($"doc_id", $"frame_idx",
        md5(concat($"payload", lit(":"), $"frame_idx".cast("string"))))
      .orderBy($"doc_id", $"frame_idx")
      .as[(Long, Int, String)].collect().toSeq
    assert(got == expected && got.nonEmpty)
    // a deployment's model class named in config (no code changes)
    val custom = Curation.stage(Map("type" -> "frame-features",
      "stride" -> 2L,
      "model-class" -> classOf[TestFrameModel].getName),
      "text", "doc_id", spark)
    val gotCustom = custom.apply(d).orderBy($"doc_id", $"frame_idx")
      .as[(Long, Int, String)].collect().toSeq
    assert(gotCustom.map(_._3) ==
      expected.map(e => s"len${if (e._1 == 1L) 10 else 5}:idx${e._2}"))
    // bogus classes are config errors, not silent fallbacks
    val e1 = intercept[RuntimeException] {
      Curation.stage(Map("type" -> "frame-features",
        "model-class" -> "no.such.Tower"), "text", "doc_id", spark)
    }
    assert(e1.getMessage.contains("cannot construct"), e1.getMessage)
    val e2 = intercept[RuntimeException] {
      Curation.stage(Map("type" -> "frame-features",
        "model-class" -> "java.lang.Object"), "text", "doc_id", spark)
    }
    assert(e2.getMessage.contains("not a graft.ops.FrameFeatureModel"),
      e2.getMessage)
  }

  test("frame-features streams: per-frame rows land incrementally " +
    "(the streamable flow-REPLACING combination)") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("framestream").toString
    val (in, out) = (s"$dir/in", s"$dir/out")
    Files.createDirectories(Paths.get(in))
    val config =
      s"""[input]
         |path = "$in"
         |stream = "true"
         |[[stages]]
         |type = "frame-features"
         |stride = 2
         |[output]
         |dir = "$out"
         |""".stripMargin
    def framesOf(texts: Seq[(Long, String)]): Long = {
      val d = texts.toDF("doc_id", "text")
      graft.ops.Multimodal.sampleFrames(
        graft.ops.Multimodal.withSyntheticMedia(d, "text"), 2).count()
    }
    val batch1 = Seq((1L, "alpha beta gamma"), (2L, "delta"))
    batch1.toDF("doc_id", "text").write.parquet(s"$in/s0.parquet")
    // the file-stream source globs *.parquet dirs' files — land the
    // shard as files inside the watched dir
    val (n1, _) = graft.CurateMain.run(spark, config.replace(
      s""""$in"""", s""""$in/s0.parquet""""))
    assert(n1 == framesOf(batch1), s"per-frame rows: $n1")
    val written = spark.read.parquet(out)
    assert(written.columns.toSet ==
      Set("doc_id", "frame_idx", "frame_fp", "__ingest_batch"))
  }

  test("html-extract stage strips markup in place") {
    val d = Seq(
      (1L, "<html><head><title>x</title></head><body><p>real &amp; text</p></body></html>"),
      (2L, "already plain")).toDF("doc_id", "text")
    val st = Curation.stage(Map("type" -> "html-extract"),
      "text", "doc_id", spark)
    assert(st.streamable)
    val out = st.apply(d).orderBy($"doc_id").as[(Long, String)]
      .collect().toSeq
    assert(out == Seq((1L, "real & text"), (2L, "already plain")))
  }

  test("audio-filter stage drops silence, clipping, and non-audio") {
    def wav(amp: Short, n: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes); buf.putInt(36 + n * 2)
      buf.put("WAVE".getBytes); buf.put("fmt ".getBytes)
      buf.putInt(16); buf.putShort(1); buf.putShort(1)
      buf.putInt(8000); buf.putInt(16000); buf.putShort(2)
      buf.putShort(16); buf.put("data".getBytes); buf.putInt(n * 2)
      (0 until n).foreach(_ => buf.putShort(amp))
      buf.array()
    }
    val rows = Seq(
      (1L, wav(16384, 50)),                 // rms 0.5: keep
      (2L, wav(0, 50)),                     // silence: drop
      (3L, wav(32767, 50)),                 // ~clipping: drop at hi=0.9
      (4L, "text".getBytes("UTF-8")))       // not audio: drop
    val d = rows.toDF("doc_id", "payload")
    val st = Curation.stage(Map("type" -> "audio-filter",
      "min-rms" -> 0.05, "max-rms" -> 0.9), "text", "doc_id", spark)
    assert(st.streamable)
    assert(st.apply(d).select($"doc_id").as[Long].collect().toSeq ==
      Seq(1L))
  }

}

/** Config-pluggable test model for the frame-features stage (no-arg
  * constructor, named by class in the TOML). */
class TestFrameModel extends graft.ops.FrameFeatureModel {
  override def featureBatch(frames: Seq[(Array[Byte], Int)]): Seq[String] =
    frames.map { case (blob, idx) => s"len${blob.length}:idx$idx" }
}
