package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** Regression pin for the round-11 soak find: a STREAM-mode run
  * whose input has more files than maxFilesPerTrigger executes
  * SEVERAL micro-batches in ONE streaming query — the per-stage
  * funnel must survive that (Spark `Observation`s are single-use,
  * and the first cut reused names across batches within one query,
  * which surfaced as `key not found: n` on batch 2). */
class CurationMultiBatchSpec extends SparkSpec {
  import spark.implicits._

  test("stream mode with multiple micro-batches per run: funnel " +
    "totals and output survive") {
    val dir = Files.createTempDirectory("curate-mb").toString
    val (in, out, idx) = (s"$dir/in", s"$dir/out", s"$dir/idx")
    // three files → three micro-batches in ONE run
    Seq((1L, "a good long document with many distinct tokens inside"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    Seq((2L, "another good long document with plenty of word variety"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    Seq((3L, "a good long document with many distinct tokens inside"), // dup of 1
      (4L, "short"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    // a trained vocab so the run exercises the bpe-tokenize stage —
    // the stage mix of the sf1 soak runbook (CurationSoakMain)
    val vocab = s"$dir/vocab.parquet"
    graft.ops.BpeTrain.train(
      graft.ops.BpeTrain.wordCounts(
        spark.read.parquet(in).toDF(), "text"), 20)
      .write.parquet(vocab)
    val cfg =
      s"""[input]
         |path = "$in"
         |stream = "true"
         |max-files-per-trigger = "1"
         |[[stages]]
         |type = "length-filter"
         |min-tokens = 3
         |[[stages]]
         |type = "bpe-tokenize"
         |vocab-path = "$vocab"
         |output-column = "n_bpe_tokens"
         |[[stages]]
         |type = "dedup-exact"
         |index-dir = "$idx"
         |[[stages]]
         |type = "dedup-near"
         |index-dir = "$dir/idx-band"
         |[output]
         |dir = "$out"
         |""".stripMargin
    val (n, funnel) = graft.CurateMain.run(spark, cfg)
    assert(n == 2L, s"admitted $n, funnel $funnel")
    val f = funnel.toMap
    assert(f("stage_00_input") == 4L, funnel.toString)
    assert(f("stage_01_length-filter") == 3L, funnel.toString)
    assert(f("stage_02_bpe-tokenize") == 3L, funnel.toString)
    assert(f("stage_03_dedup-exact-index") == 2L, funnel.toString)
    assert(f("stage_04_dedup-near-index") == 2L, funnel.toString)
    val ids = spark.read.parquet(out).select($"doc_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L), ids.toString)
  }

  test("starvedBatchWarning: fires below half the executor's cores, " +
    "stays quiet at or above, and names the knob (r14 SCALE.md " +
    "batch-geometry find)") {
    // 4-file trigger on 32 cores — the measured sweep's trap
    val w = graft.CurateMain.starvedBatchWarning(4, 32)
    assert(w.isDefined)
    assert(w.get.contains("max-files-per-trigger"), w.get)
    assert(w.get.contains("8x"), w.get) // 32/4 — quantified, not vague
    // at half the cores the batch is within 2x of saturation: quiet
    assert(graft.CurateMain.starvedBatchWarning(16, 32).isEmpty)
    assert(graft.CurateMain.starvedBatchWarning(32, 32).isEmpty)
    assert(graft.CurateMain.starvedBatchWarning(64, 32).isEmpty)
    // degenerate inputs never warn (an empty batch has 0 partitions)
    assert(graft.CurateMain.starvedBatchWarning(0, 32).isEmpty)
    assert(graft.CurateMain.starvedBatchWarning(1, 1).isEmpty)
  }
}
