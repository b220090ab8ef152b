package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the persisted train→save→load→serve model lifecycle
  * (r11 directive #2): a --retrain run commits the model tables
  * through [[ModelStore]]'s marker discipline; a serve run scores
  * bit-identically with the TRAINING CORPUS ABSENT; torn or
  * mismatched stores are refused loudly. */
class ModelLifecycleSpec extends SparkSpec {

  import spark.implicits._

  private def rmTree(p: String): Unit = {
    val path = Paths.get(p)
    if (Files.exists(path))
      Files.walk(path).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.delete(f); () })
  }

  test("nb-filter model-dir: retrain commits, serve run scores " +
    "bit-identically with the training corpus deleted") {
    val dir = Files.createTempDirectory("model-life-nb").toString
    val seed = s"$dir/seed.parquet"
    Seq(
      (101L, "good", "the quick brown fox jumps over the lazy dog"),
      (102L, "good", "the sun rises in the east of a green valley"),
      (103L, "good", "a quick green fox in the lazy sun"),
      (104L, "bad", "buy cheap pills now click here buy now"),
      (105L, "bad", "click buy cheap now here pills cheap click"))
      .toDF("doc_id", "label", "text").write.parquet(seed)
    val in = s"$dir/in.parquet"
    Seq(
      (1L, "the quick fox in the green valley of the lazy sun"),
      (2L, "buy cheap pills click here now now now"),
      (3L, "the sun rises over the quick brown dog"))
      .toDF("doc_id", "text").write.parquet(in)
    val modelDir = s"$dir/model"

    def config(out: String, withRef: Boolean) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "nb-filter"
         |${if (withRef) s"""ref-path = "$seed"""" else ""}
         |pos-label = "good"
         |min-count = 1
         |model-dir = "$modelDir"
         |[output]
         |dir = "$out"
         |""".stripMargin

    // 1. retrain: trains from seed, commits the model, serves
    val out1 = s"$dir/out1"
    val (n1, _) = graft.CurateMain.run(spark, config(out1, withRef = true),
      retrain = true)
    assert(n1 == 2)
    val got1 = spark.read.parquet(out1).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    // remember the committed model's exact scores for the
    // bit-identity comparison after the corpus is gone
    val load = ModelStore.open(spark, modelDir, "nb",
      Map("pos-label" -> "good", "min-count" -> "1",
        "label-column" -> "label", "tokenizer" -> "word"))
    val scoresTrained = NbClassifier.scoreBinaryCompiled(
      spark.read.parquet(in), "doc_id", "text",
      NbClassifier.compileBinary(load("counts"), load("priors"), "good"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq

    // 2. the training corpus disappears — the deployment reality
    rmTree(seed)
    assert(!Files.exists(Paths.get(seed)))

    // 3. serve run: no ref-path configured at all, corpus absent —
    // same survivors, byte-for-byte
    val out2 = s"$dir/out2"
    val (n2, _) = graft.CurateMain.run(spark, config(out2, withRef = false))
    assert(n2 == n1)
    val got2 = spark.read.parquet(out2).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(got2 == got1)
    // and the scores themselves are bit-identical
    val load2 = ModelStore.open(spark, modelDir, "nb",
      Map("pos-label" -> "good", "min-count" -> "1",
        "label-column" -> "label", "tokenizer" -> "word"))
    val scoresServed = NbClassifier.scoreBinaryCompiled(
      spark.read.parquet(in), "doc_id", "text",
      NbClassifier.compileBinary(load2("counts"), load2("priors"), "good"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(scoresServed == scoresTrained)

    // 4. parameter mismatch is refused loudly (yesterday's model in
    // a reconfigured stage = silent corruption without this)
    val bad = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark, config(s"$dir/out3", withRef = false)
        .replace("min-count = 1", "min-count = 3"))
    }
    assert(bad.getMessage.contains("does not match"), bad.getMessage)

    // 5. torn save (marker missing) is refused loudly and names the
    // recovery action
    Files.delete(Paths.get(s"$modelDir/_graft_model"))
    val torn = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark, config(s"$dir/out4", withRef = false))
    }
    assert(torn.getMessage.contains("--retrain"), torn.getMessage)
  }

  test("lm-filter lang-column mode: per-language models + learned " +
    "per-language cutoffs, lifecycle included") {
    val dir = Files.createTempDirectory("model-life-lmlang").toString
    val seed = s"$dir/seed.parquet"
    // two languages with DIFFERENT fluency distributions: en bigrams
    // repeat (high scores), de docs share fewer transitions — a
    // GLOBAL cutoff would judge de against en's distribution
    Seq(
      (101L, "en", "the quick brown fox jumps over the lazy dog"),
      (102L, "en", "the quick brown fox sleeps in the lazy sun"),
      (103L, "en", "the quick brown fox runs past the lazy dog"),
      (104L, "de", "der schnelle fuchs springt"),
      (105L, "de", "der braune hund schlaeft"),
      (106L, "de", "der schnelle hund springt heute"))
      .toDF("doc_id", "lang", "text").write.parquet(seed)
    val in = s"$dir/in.parquet"
    Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "dog lazy the over jumps fox brown quick the"),
      (3L, "de", "der schnelle fuchs springt"),
      (4L, "xx", "unassessable language"))
      .toDF("doc_id", "lang", "text").write.parquet(in)
    val modelDir = s"$dir/model"
    def config(out: String, withRef: Boolean) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "lm-filter"
         |${if (withRef) s"""ref-path = "$seed"""" else ""}
         |lang-column = "lang"
         |min-count = 2
         |min-quantile = 0.0
         |model-dir = "$modelDir"
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n1, _) = graft.CurateMain.run(spark, config(s"$dir/out1", true),
      retrain = true)
    val kept1 = spark.read.parquet(s"$dir/out1")
      .select($"doc_id").as[Long].collect().toSet
    // quantile 0.0 = each language's training-minimum cutoff: the
    // fluent en doc (a training text) and the seen de doc clear
    // their OWN language's floor; the scrambled en doc (all-backoff
    // transitions) scores below it; the unassessable language drops
    assert(kept1.contains(1L) && kept1.contains(3L), kept1)
    assert(!kept1.contains(2L), s"scrambled en doc must drop: $kept1")
    assert(!kept1.contains(4L), s"unassessable lang must drop: $kept1")
    // serve run with the training corpus gone: identical output
    rmTree(seed)
    val (n2, _) = graft.CurateMain.run(spark, config(s"$dir/out2", false))
    assert(n2 == n1)
    assert(spark.read.parquet(s"$dir/out2").select($"doc_id")
      .as[Long].collect().toSet == kept1)
    // changed min-quantile invalidates the committed model loudly
    val bad = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark, config(s"$dir/out3", false)
        .replace("min-quantile = 0.0", "min-quantile = 0.5"))
    }
    assert(bad.getMessage.contains("does not match"), bad.getMessage)
  }

  test("lm-filter and dsir-filter model-dir serve runs survive " +
    "corpus deletion with identical output") {
    val dir = Files.createTempDirectory("model-life-lm").toString
    val seed = s"$dir/seed.parquet"
    Seq((101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "the sun rises in the east of a green valley"),
      (103L, "the quick brown fox sleeps in the green valley"))
      .toDF("doc_id", "text").write.parquet(seed)
    val in = s"$dir/in.parquet"
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "dog the over lazy jumps fox quick brown the"))
      .toDF("doc_id", "text").write.parquet(in)

    val lmConfig = (out: String, ref: String) =>
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "lm-filter"
         |$ref
         |ngram = 3
         |min-count = 2
         |min-score = 0.001
         |model-dir = "$dir/lm-model"
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (nl1, _) = graft.CurateMain.run(spark,
      lmConfig(s"$dir/lm-out1", s"""ref-path = "$seed""""),
      retrain = true)

    // DSIR: target = fox docs, raw = the whole seed
    val target = s"$dir/target.parquet"
    spark.read.parquet(seed).filter($"text".contains("fox"))
      .write.parquet(target)
    val dsirConfig = (out: String, ref: String) =>
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "dsir-filter"
         |$ref
         |buckets = 64
         |min-weight = 1.0
         |model-dir = "$dir/dsir-model"
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (nd1, _) = graft.CurateMain.run(spark,
      dsirConfig(s"$dir/dsir-out1",
        s"""target-path = "$target"
           |raw-path = "$seed"""".stripMargin), retrain = true)

    val lm1 = spark.read.parquet(s"$dir/lm-out1").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val ds1 = spark.read.parquet(s"$dir/dsir-out1").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq

    rmTree(seed)
    rmTree(target)

    val (nl2, _) = graft.CurateMain.run(spark,
      lmConfig(s"$dir/lm-out2", ""))
    val (nd2, _) = graft.CurateMain.run(spark,
      dsirConfig(s"$dir/dsir-out2", ""))
    assert(nl2 == nl1 && nd2 == nd1)
    assert(spark.read.parquet(s"$dir/lm-out2").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq == lm1)
    assert(spark.read.parquet(s"$dir/dsir-out2").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq == ds1)
  }

  test("bpe-tokenize model-dir: retrain commits the vocab, serve " +
    "survives corpus deletion, torn and mismatched stores refuse") {
    val dir = Files.createTempDirectory("model-life-bpe").toString
    val seed = s"$dir/seed.parquet"
    Seq.fill(6)("low lower lowest newer newest").zipWithIndex
      .map { case (t, i) => (100L + i, t) }
      .toDF("doc_id", "text").write.parquet(seed)
    val in = s"$dir/in.parquet"
    Seq((1L, "lower newest"), (2L, "low low newer"))
      .toDF("doc_id", "text").write.parquet(in)
    def config(out: String, withRef: Boolean, merges: Int = 20) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "bpe-tokenize"
         |${if (withRef) s"""ref-path = "$seed"""" else ""}
         |model-dir = "$dir/model"
         |merges = $merges
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n1, _) = graft.CurateMain.run(spark, config(s"$dir/out1", true),
      retrain = true)
    assert(n1 == 2)
    val got1 = spark.read.parquet(s"$dir/out1")
      .orderBy("doc_id").select("doc_id", "n_bpe_tokens")
      .collect().map(_.toSeq).toSeq
    // serve with the training corpus GONE: identical token counts
    rmTree(seed)
    val (n2, _) = graft.CurateMain.run(spark, config(s"$dir/out2", false))
    assert(n2 == n1)
    assert(spark.read.parquet(s"$dir/out2")
      .orderBy("doc_id").select("doc_id", "n_bpe_tokens")
      .collect().map(_.toSeq).toSeq == got1)
    // a merges-count mismatch is a DIFFERENT vocabulary — refused
    val bad = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark,
        config(s"$dir/out3", false, merges = 50))
    }
    assert(bad.getMessage.contains("does not match"), bad.getMessage)
    // torn store (marker missing) refuses and names the recovery
    Files.delete(Paths.get(s"$dir/model/_graft_model"))
    val torn = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark, config(s"$dir/out4", false))
    }
    assert(torn.getMessage.contains("--retrain"), torn.getMessage)
  }

  test("dsir-filter model-dir: torn store refuses loudly") {
    val dir = Files.createTempDirectory("model-life-dsir-torn").toString
    val seed = s"$dir/seed.parquet"
    Seq((101L, "the quick brown fox"), (102L, "the lazy dog sleeps"))
      .toDF("doc_id", "text").write.parquet(seed)
    val target = s"$dir/target.parquet"
    spark.read.parquet(seed).filter($"text".contains("fox"))
      .write.parquet(target)
    val in = s"$dir/in.parquet"
    Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
      .write.parquet(in)
    def config(out: String, ref: String) =
      s"""[input]
         |path = "$in"
         |[[stages]]
         |type = "dsir-filter"
         |$ref
         |buckets = 64
         |min-weight = 0.0
         |model-dir = "$dir/model"
         |[output]
         |dir = "$out"
         |""".stripMargin
    graft.CurateMain.run(spark, config(s"$dir/out1",
      s"""target-path = "$target"
         |raw-path = "$seed"""".stripMargin), retrain = true)
    Files.delete(Paths.get(s"$dir/model/_graft_model"))
    val torn = intercept[IllegalArgumentException] {
      graft.CurateMain.run(spark, config(s"$dir/out2", ""))
    }
    assert(torn.getMessage.contains("--retrain"), torn.getMessage)
  }

  test("staged-generation save: a failed retrain preserves the " +
    "previously committed model; the next good one supersedes it") {
    val dir = Files.createTempDirectory("model-life-gen").toString
    val store = s"$dir/model"
    val params = Map("k" -> "1")
    // generation 1: a good committed model
    ModelStore.save(spark, store, "test", params,
      Map("t" -> Seq((1L, "v1")).toDF("id", "v")))
    assert(ModelStore.exists(spark, store))

    // retrain attempt whose training plan FAILS AT EXECUTION (the
    // bad-ref-path / OOM / job-kill shape) — previously this
    // permanently destroyed the committed model (marker deleted
    // before the first table write)
    val bad = spark.range(1)
      .select(assert_true(col("id") > 10).as("x"), col("id"))
    intercept[Exception] {
      ModelStore.save(spark, store, "test", params, Map("t" -> bad))
    }
    // the old model still serves, bit-identically
    assert(ModelStore.exists(spark, store))
    val load1 = ModelStore.open(spark, store, "test", params)
    assert(load1("t").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "v1")))

    // a subsequent GOOD retrain supersedes; the failed save's ORPHAN
    // dir is GC'd but the superseded COMMITTED generation survives
    // one more save — a loader opened before this retrain still
    // reads its parquet (Spark reads are deferred to action time)
    ModelStore.save(spark, store, "test", params,
      Map("t" -> Seq((2L, "v2")).toDF("id", "v")))
    val load2 = ModelStore.open(spark, store, "test", params)
    assert(load2("t").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "v2")))
    // the pre-retrain loader is pinned to its generation and still
    // serves the OLD rows (deferred-GC window)
    assert(load1("t").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "v1")))
    def genDirs() = {
      val children = Files.list(Paths.get(store)).iterator()
      val names = scala.collection.mutable.Set.empty[String]
      while (children.hasNext)
        names += children.next().getFileName.toString
      names.filter(n => n == "tables" || n.startsWith("tables-g"))
    }
    // gen 0 = "tables" (first save), gen 1 = the failed orphan,
    // gen 2 = this good save: the orphan dies, the superseded
    // committed gen survives
    val after2 = genDirs()
    assert(after2 == Set("tables", "tables-g2"),
      s"expected new + superseded generations, orphan GC'd: $after2")
    // one more save: the oldest generation ages out — steady-state
    // disk is two generations
    ModelStore.save(spark, store, "test", params,
      Map("t" -> Seq((3L, "v3")).toDF("id", "v")))
    val after3 = genDirs()
    assert(after3 == Set("tables-g2", "tables-g3"),
      s"steady state is two generations: $after3")
  }
}
