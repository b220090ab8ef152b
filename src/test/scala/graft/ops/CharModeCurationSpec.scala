package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** tokenizer = "char" — the space-free-script mode of the model
  * filter stages (r12 verdict directive #2). Pins: char-gram LM
  * separates fluent from scrambled CJK where word mode is blind
  * (one giant token per sentence → zero transitions → everything
  * drops), the mode rides the committed-model lifecycle with
  * tokenizer in the model identity, nb-filter char mode classifies
  * CJK quality, and langid-filter script mode selects CJK corpora. */
class CharModeCurationSpec extends SparkSpec {

  import spark.implicits._

  // fluent zh sentences (repeated so char-bigram transitions clear
  // min-count) + their character-scrambled counterparts
  private val fluent = Seq(
    "机器学习是人工智能的一个重要分支",
    "深度神经网络在图像识别领域取得了成功",
    "机器学习是人工智能的一个重要分支",
    "深度神经网络在图像识别领域取得了成功",
    "机器学习是人工智能的一个重要分支")
  private val scrambled = "分机习能学工是人器智的一个重要支"

  test("lm-filter tokenizer=char separates fluent from scrambled " +
    "CJK; word mode is structurally blind (zero transitions)") {
    val dir = Files.createTempDirectory("char-lm").toString
    val seed = s"$dir/seed.parquet"
    fluent.zipWithIndex.map { case (t, i) => (100L + i, t) }
      .toDF("doc_id", "text").write.parquet(seed)
    val in = s"$dir/in.parquet"
    Seq((1L, fluent.head), (2L, scrambled))
      .toDF("doc_id", "text").write.parquet(in)

    def config(out: String, tok: String) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "lm-filter"
         |ref-path = "$seed"
         |tokenizer = "$tok"
         |min-count = 2
         |min-score = 0.05
         |[output]
         |dir = "$out"
         |""".stripMargin

    val (nChar, _) = graft.CurateMain.run(spark, config(s"$dir/c", "char"))
    val keptChar = spark.read.parquet(s"$dir/c")
      .select($"doc_id").as[Long].collect().toSet
    assert(keptChar == Set(1L),
      s"char mode must keep the fluent doc and drop the scrambled: $keptChar")
    assert(nChar == 1)

    // word mode: each zh sentence is ONE whitespace token -> zero
    // transitions -> mean_p 0 -> everything drops. This is exactly
    // the silent degradation char mode exists to fix.
    val (nWord, _) = graft.CurateMain.run(spark, config(s"$dir/w", "word"))
    assert(nWord == 0, s"word mode on CJK kept $nWord docs")
  }

  test("char-gram models ride the committed lifecycle; tokenizer is " +
    "part of the model identity") {
    val dir = Files.createTempDirectory("char-lm-store").toString
    val seed = s"$dir/seed.parquet"
    fluent.zipWithIndex.map { case (t, i) => (100L + i, t) }
      .toDF("doc_id", "text").write.parquet(seed)
    val in = s"$dir/in.parquet"
    Seq((1L, fluent.head), (2L, scrambled))
      .toDF("doc_id", "text").write.parquet(in)
    def config(out: String, tokLine: String, ref: Boolean) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "lm-filter"
         |${if (ref) s"""ref-path = "$seed"""" else ""}
         |$tokLine
         |min-count = 2
         |min-score = 0.05
         |model-dir = "$dir/model"
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n1, _) = graft.CurateMain.run(spark,
      config(s"$dir/out1", "tokenizer = \"char\"", ref = true),
      retrain = true)
    assert(n1 == 1)
    // serve with the corpus gone, same tokenizer: identical
    val (n2, _) = graft.CurateMain.run(spark,
      config(s"$dir/out2", "tokenizer = \"char\"", ref = false))
    assert(n2 == 1)
    // a word-tokenizer stage must REFUSE the char-trained model
    val bad = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark,
        config(s"$dir/out3", "", ref = false))
    }
    assert(bad.getMessage.contains("does not match"), bad.getMessage)
  }

  test("nb-filter tokenizer=char classifies CJK quality") {
    val dir = Files.createTempDirectory("char-nb").toString
    val seed = s"$dir/seed.parquet"
    // good = the fluent corpus; bad = repetitive junk characters
    (fluent.zipWithIndex.map { case (t, i) => (100L + i, "good", t) } ++
      Seq((200L, "bad", "广告广告广告点击点击点击广告广告广告点击点击"),
        (201L, "bad", "点击广告点击广告点击广告点击广告点击广告")))
      .toDF("doc_id", "label", "text").write.parquet(seed)
    val in = s"$dir/in.parquet"
    Seq((1L, fluent(1)), (2L, "广告点击广告点击广告点击广告点击"))
      .toDF("doc_id", "text").write.parquet(in)
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "nb-filter"
         |ref-path = "$seed"
         |tokenizer = "char"
         |char-n = 3
         |pos-label = "good"
         |min-count = 1
         |min-score = 1.0
         |[output]
         |dir = "$dir/out"
         |""".stripMargin
    val (n, _) = graft.CurateMain.run(spark, config)
    val kept = spark.read.parquet(s"$dir/out")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"char-NB must keep the fluent doc: $kept")
    assert(n == 1)
  }

  test("lm-filter tokenizer=auto routes each LANGUAGE to its natural " +
    "regime: zh scores char-grams, en scores words, in one model bank") {
    val dir = Files.createTempDirectory("auto-lm").toString
    val enFluent = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox sleeps in the lazy sun",
      "the quick brown fox runs past the lazy dog")
    val seed = s"$dir/seed.parquet"
    (fluent.zipWithIndex.map { case (t, i) => (100L + i, "zh", t) } ++
      enFluent.zipWithIndex.map { case (t, i) => (200L + i, "en", t) })
      .toDF("doc_id", "lang", "text").write.parquet(seed)
    val in = s"$dir/in.parquet"
    Seq(
      (1L, "zh", fluent.head),
      (2L, "zh", scrambled),
      (3L, "en", enFluent.head),
      (4L, "en", "dog lazy the over jumps fox brown quick the"))
      .toDF("doc_id", "lang", "text").write.parquet(in)
    def config(out: String, tokLine: String, modelDir: String) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "lm-filter"
         |ref-path = "$seed"
         |lang-column = "lang"
         |$tokLine
         |min-count = 2
         |min-quantile = 0.0
         |model-dir = "$modelDir"
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n, _) = graft.CurateMain.run(spark,
      config(s"$dir/out", "tokenizer = \"auto\"", s"$dir/model-a"),
      retrain = true)
    val kept = spark.read.parquet(s"$dir/out")
      .select($"doc_id").as[Long].collect().toSet
    // fluent zh (char regime) and fluent en (word regime) survive
    // their own languages' floors; both scrambled twins drop
    assert(kept == Set(1L, 3L), kept)
    assert(n == 2)
    // word mode on the same corpus is BLIND to zh — every zh doc
    // (training and input alike) scores the restored 0.0, so the
    // language's learned floor is 0.0 and the SCRAMBLED doc passes:
    // garbage-but-green, exactly the failure mode auto exists to fix
    val (nw, _) = graft.CurateMain.run(spark,
      config(s"$dir/out-w", "tokenizer = \"word\"", s"$dir/model-w"),
      retrain = true)
    val keptW = spark.read.parquet(s"$dir/out-w")
      .select($"doc_id").as[Long].collect().toSet
    assert(keptW.contains(2L) && !kept.contains(2L),
      s"word mode cannot reject the scrambled zh doc; auto can: $keptW")
    // auto outside lang mode refuses loudly
    val bad = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark,
        s"""[input]
           |path = "$in"
           |[[stages]]
           |type = "nb-filter"
           |ref-path = "$seed"
           |tokenizer = "auto"
           |label-column = "lang"
           |pos-label = "zh"
           |[output]
           |dir = "$dir/out-bad"
           |""".stripMargin)
    }
    assert(bad.getMessage.contains("lang-column"), bad.getMessage)
  }

  test("dedup-near tokenizer=char finds CJK near-dups that word " +
    "mode cannot shingle at all") {
    val dir = Files.createTempDirectory("char-near").toString
    val base = fluent.distinct.mkString("。")
    val in = s"$dir/in.parquet"
    Seq(
      (1L, base),
      (2L, base + "了"), // one trailing char appended — a near-dup
      (3L, "全然違う内容の文書ですから重複ではありません"))
      .toDF("doc_id", "text").write.parquet(in)
    def config(out: String, tokLine: String) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "dedup-near"
         |$tokLine
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (nc, _) = graft.CurateMain.run(spark,
      config(s"$dir/c", "tokenizer = \"char\""))
    val keptC = spark.read.parquet(s"$dir/c")
      .select($"doc_id").as[Long].collect().toSet
    assert(keptC == Set(1L, 3L),
      s"char near-dup must collapse the pair to its keeper: $keptC")
    assert(nc == 2)
    // word mode: one giant token per doc -> ZERO 3-gram shingles ->
    // no bands, no candidates — every near-dup survives unseen
    val (nw, _) = graft.CurateMain.run(spark, config(s"$dir/w", ""))
    assert(nw == 3, s"word mode cannot see CJK near-dups, kept $nw")
    // the projected kernel column must not leak into the output
    assert(!spark.read.parquet(s"$dir/c").columns.contains("__graft_gt"))
  }

  test("dedup-near index-dir stamps the tokenizer into the index " +
    "layout and refuses a mismatch (band spaces must not mix)") {
    val dir = Files.createTempDirectory("near-tok-id").toString
    val in = s"$dir/in.parquet"
    Seq((1L, fluent.distinct.mkString("。")))
      .toDF("doc_id", "text").write.parquet(in)
    def config(out: String, tokLine: String) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "dedup-near"
         |index-dir = "$dir/index"
         |$tokLine
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n1, _) = graft.CurateMain.run(spark,
      config(s"$dir/c1", "tokenizer = \"char\""))
    assert(n1 == 1)
    // same tokenizer: serves the same index
    val (n2, _) = graft.CurateMain.run(spark,
      config(s"$dir/c2", "tokenizer = \"char\""))
    assert(n2 == 0, "replayed batch must be fully deduped")
    // word mode against the char-built index: REFUSE — word shingles
    // hash into a different band space, membership would silently
    // never match again
    val bad = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark, config(s"$dir/c3", ""))
    }
    assert(bad.getMessage.contains("does not match"), bad.getMessage)
    // a different char-n is a different gram space too
    val bad2 = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark,
        config(s"$dir/c4", "tokenizer = \"char\"\nchar-n = 4"))
    }
    assert(bad2.getMessage.contains("does not match"), bad2.getMessage)
  }

  test("decontaminate tokenizer=char catches CJK eval leakage that " +
    "word mode cannot shingle") {
    val dir = Files.createTempDirectory("char-decon").toString
    val evalSentence = "人工知能の評価ベンチマークの質問文です"
    val eval = s"$dir/eval.parquet"
    Seq((900L, evalSentence)).toDF("doc_id", "text").write.parquet(eval)
    val in = s"$dir/in.parquet"
    Seq(
      (1L, "本文の途中に" + evalSentence + "が混入した文書"),
      (2L, "評価セットとは無関係の全く別の日本語文書です"))
      .toDF("doc_id", "text").write.parquet(in)
    def config(out: String, tokLine: String) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "decontaminate"
         |eval-path = "$eval"
         |ngram = 3
         |$tokLine
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (nc, _) = graft.CurateMain.run(spark,
      config(s"$dir/c", "tokenizer = \"char\""))
    val keptC = spark.read.parquet(s"$dir/c")
      .select($"doc_id").as[Long].collect().toSet
    assert(keptC == Set(2L),
      s"char mode must drop the doc containing the eval sentence: $keptC")
    assert(nc == 1)
    // word mode: no word shingles on either side -> leakage unseen
    val (nw, _) = graft.CurateMain.run(spark, config(s"$dir/w", ""))
    assert(nw == 2, s"word mode cannot see CJK leakage, kept $nw")
  }

  test("dsir-filter tokenizer=char resamples toward a CJK target " +
    "corpus where word features don't exist") {
    val dir = Files.createTempDirectory("char-dsir").toString
    // target = ML-themed zh; raw = target + ad junk
    val target = s"$dir/target.parquet"
    fluent.distinct.zipWithIndex.map { case (t, i) => (100L + i, t) }
      .toDF("doc_id", "text").write.parquet(target)
    val raw = s"$dir/raw.parquet"
    (fluent.distinct.zipWithIndex.map { case (t, i) => (100L + i, t) } ++
      Seq((300L, "广告点击广告点击广告点击广告点击广告点击"),
        (301L, "点击广告点击广告点击广告点击广告点击广告")))
      .toDF("doc_id", "text").write.parquet(raw)
    val in = s"$dir/in.parquet"
    Seq((1L, fluent.head), (2L, "广告点击广告点击广告点击"))
      .toDF("doc_id", "text").write.parquet(in)
    def config(out: String, tokLine: String) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "dsir-filter"
         |target-path = "$target"
         |raw-path = "$raw"
         |buckets = 256
         |min-weight = 1.0
         |$tokLine
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (nc, _) = graft.CurateMain.run(spark,
      config(s"$dir/c", "tokenizer = \"char\""))
    val keptC = spark.read.parquet(s"$dir/c")
      .select($"doc_id").as[Long].collect().toSet
    assert(keptC == Set(1L),
      s"char DSIR must keep the target-like doc, drop the junk: $keptC")
    assert(nc == 1)
    // word mode: each doc is ONE hashed token + zero bigrams — one
    // feature per doc, so target-likeness is invisible (whatever it
    // keeps, it cannot SEPARATE the two; both land on the same
    // single-feature likelihood shape)
    val (nw, _) = graft.CurateMain.run(spark, config(s"$dir/w", ""))
    assert(nw == 0 || nw == 2,
      s"word mode cannot separate CJK docs, kept $nw of 2")
  }

  test("langid-filter mode=model: a TRAINED classifier tags unlabeled " +
    "text, rides the ModelStore lifecycle, and refuses a mismatch") {
    val dir = Files.createTempDirectory("model-langid").toString
    val enFluent = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox sleeps in the lazy sun",
      "the quick brown fox runs past the lazy dog")
    val seed = s"$dir/seed.parquet"
    (fluent.zipWithIndex.map { case (t, i) => (100L + i, "zh", t) } ++
      enFluent.zipWithIndex.map { case (t, i) => (200L + i, "en", t) })
      .toDF("doc_id", "lang", "text").write.parquet(seed)
    // UNLABELED input — the case the heuristic modes cannot serve
    // beyond their hand-coded markers
    val in = s"$dir/in.parquet"
    Seq((1L, fluent.head), (2L, enFluent.head))
      .toDF("doc_id", "text").write.parquet(in)
    def config(out: String, extra: String, ref: Boolean) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "langid-filter"
         |mode = "model"
         |langs = ["zh"]
         |${if (ref) s"""ref-path = "$seed"""" else ""}
         |model-dir = "$dir/model"
         |$extra
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n1, _) = graft.CurateMain.run(spark,
      config(s"$dir/out1", "", ref = true), retrain = true)
    val kept = spark.read.parquet(s"$dir/out1")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"trained LID must keep only the zh doc: $kept")
    assert(n1 == 1)
    // serve with the seed corpus gone: the committed model carries it
    val (n2, _) = graft.CurateMain.run(spark,
      config(s"$dir/out2", "", ref = false))
    assert(n2 == 1)
    // a differently-configured stage must REFUSE the committed model
    val bad = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark,
        config(s"$dir/out3", "char-n = 4", ref = false))
    }
    assert(bad.getMessage.contains("does not match"), bad.getMessage)
  }

  test("the full CCNet recipe on UNLABELED text: trained LID stamps " +
    "output-column, lm-filter tokenizer=auto routes off the PREDICTION") {
    val dir = Files.createTempDirectory("lid-auto").toString
    val enFluent = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox sleeps in the lazy sun",
      "the quick brown fox runs past the lazy dog")
    // LID seed carries the ground-truth label; the LM seed is the
    // SAME corpus with its label column named as the stage will see
    // it at serve time (the stamped prediction column)
    val lidSeed = s"$dir/lid-seed.parquet"
    (fluent.zipWithIndex.map { case (t, i) => (100L + i, "zh", t) } ++
      enFluent.zipWithIndex.map { case (t, i) => (200L + i, "en", t) })
      .toDF("doc_id", "lang", "text").write.parquet(lidSeed)
    val lmSeed = s"$dir/lm-seed.parquet"
    (fluent.zipWithIndex.map { case (t, i) => (100L + i, "zh", t) } ++
      enFluent.zipWithIndex.map { case (t, i) => (200L + i, "en", t) })
      .toDF("doc_id", "pred_lang", "text").write.parquet(lmSeed)
    // UNLABELED input: fluent + scrambled in both regimes
    val in = s"$dir/in.parquet"
    Seq(
      (1L, fluent.head),
      (2L, scrambled),
      (3L, enFluent.head),
      (4L, "dog lazy the over jumps fox brown quick the"))
      .toDF("doc_id", "text").write.parquet(in)
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "langid-filter"
         |mode = "model"
         |ref-path = "$lidSeed"
         |output-column = "pred_lang"
         |[[stages]]
         |type = "lm-filter"
         |ref-path = "$lmSeed"
         |lang-column = "pred_lang"
         |tokenizer = "auto"
         |min-count = 2
         |min-quantile = 0.0
         |[output]
         |dir = "$dir/out"
         |""".stripMargin
    val (n, _) = graft.CurateMain.run(spark, config)
    val kept = spark.read.parquet(s"$dir/out")
      .select($"doc_id").as[Long].collect().toSet
    // fluent zh routes to char grams off its PREDICTED language and
    // clears zh's learned floor; fluent en routes to words; both
    // scrambled twins drop — no pre-labeled lang column anywhere
    assert(kept == Set(1L, 3L),
      s"LID→auto-LM on unlabeled text must keep the fluent pair: $kept")
    assert(n == 2)
  }

  test("langid-filter script=true selects space-free-script corpora") {
    val dir = Files.createTempDirectory("char-langid").toString
    val in = s"$dir/in.parquet"
    Seq((1L, "日本語のテキストです"),
      (2L, "机器学习是人工智能的分支"),
      (3L, "the quick brown fox"),
      (4L, "ภาษาไทยมีสระผสม"))
      .toDF("doc_id", "text").write.parquet(in)
    val config =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "langid-filter"
         |langs = ["ja", "zh"]
         |script = true
         |[output]
         |dir = "$dir/out"
         |""".stripMargin
    val (n, _) = graft.CurateMain.run(spark, config)
    val kept = spark.read.parquet(s"$dir/out")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), kept)
    assert(n == 2)
  }

  test("langid-filter mode=model streams: per-micro-batch predictions " +
    "equal the batch run (the kernel is scan-stage, so state-free)") {
    val dir = Files.createTempDirectory("langid-stream").toString
    val enFluent = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox sleeps in the lazy sun",
      "the quick brown fox runs past the lazy dog")
    val seed = s"$dir/seed.parquet"
    (fluent.zipWithIndex.map { case (t, i) => (100L + i, "zh", t) } ++
      enFluent.zipWithIndex.map { case (t, i) => (200L + i, "en", t) })
      .toDF("doc_id", "lang", "text").write.parquet(seed)
    // two arrival units -> two micro-batches, each carrying one
    // language, so a batch-local mistake (e.g. per-batch retraining)
    // could not hide behind a balanced batch
    val in = s"$dir/in"
    Seq((1L, fluent.head), (2L, scrambled))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    Seq((3L, enFluent.head))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    def config(out: String, stream: Boolean) =
      s"""[input]
         |path = "$in"
         |${if (stream) "stream = \"true\"\nmax-files-per-trigger = \"1\"\n" +
             s"""checkpoint = "$dir/ckpt"""" else ""}
         |[[stages]]
         |type = "langid-filter"
         |mode = "model"
         |ref-path = "$seed"
         |output-column = "pred_lang"
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (nb, _) = graft.CurateMain.run(spark, config(s"$dir/out-b", stream = false))
    val (ns, _) = graft.CurateMain.run(spark, config(s"$dir/out-s", stream = true))
    assert(nb == 3 && ns == 3, s"batch $nb stream $ns")
    def preds(out: String) = spark.read.parquet(out)
      .select($"doc_id", $"pred_lang").as[(Long, String)].collect().toMap
    val (pb, ps) = (preds(s"$dir/out-b"), preds(s"$dir/out-s"))
    assert(pb == ps, s"batch $pb vs stream $ps")
    assert(pb(1L) == "zh" && pb(3L) == "en", pb.toString)
  }
}
