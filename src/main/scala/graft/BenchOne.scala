package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness for A/B-ing bench methodology —
  * born from two rounds of driver-vs-builder deltas on UNCHANGED
  * code (r5: q_window_running_total/cdc_compact_agg; r6:
  * dedup_minhash_lsh). Runs ONE named query N times after a warmup
  * and prints every sample plus min/median/max as one JSON line, so
  * a regression claim can be tested against the sample DISTRIBUTION
  * instead of a single min-of-2 or median-of-3 point.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain graft.BenchOne <query> [reps] [gc|nogc]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <query> [reps] [gc|nogc]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    require(reps >= 1, s"reps must be >= 1, got $reps")
    val doGc = args.length <= 2 || args(2) == "gc"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferFiltersFromGenerate + filter pushdown re-evaluates the
      // GENERATOR expression inside the scan filter: every
      // explode-based training featurize (char_ngrams_utf8,
      // dsir_feature_buckets, transition pairs) ran twice per row
      // (r14; plan excerpt in OPTIMIZATION_r14.md). The inferred
      // size()>0 filter only saves empty-row Generate machinery
      // here (explodes sit directly on scans), so it is a strict
      // loss at any scale for expensive generators.
      // A/B knob (r15 adjudication of the ann_ivfpq regression):
      // SPARK_GRAFT_EXCLUDED_RULES overrides the exclusion list —
      // set it to "" to time a query WITH the rule re-enabled. Tool
      // main only; the bench/verify mains keep the fixed exclusion.
      .config("spark.sql.optimizer.excludedRules",
        sys.env.getOrElse("SPARK_GRAFT_EXCLUDED_RULES",
          "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"))
      // experiment knob (r14, default OFF): AQE replanning of cache
      // materialization coalesces model-sized caches (helps compile-
      // heavy queries ~0.5 s) but ALSO coalesces corpus-proportional
      // caches at sf0.1 (dedup shingle tables, LM scored tables) and
      // costs their downstream stages parallelism — measured net
      // wash-to-negative (BenchOne A/B in OPTIMIZATION_r14.md), so
      // the model-table fix is the surgical repartition(1) in the
      // compile paths instead
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "false"))
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    def consume(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    consume() // warmup: JIT + codegen + FS cache
    val samples = (1 to reps).map { _ =>
      if (doGc) System.gc()
      consume()
    }
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val sorted = samples.sorted
    // conventional median: mean of the two mid samples for even reps
    // (upper-mid alone would bias A/B regression calls high)
    val median =
      if (reps % 2 == 1) sorted(reps / 2)
      else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
    val line = s"""{"query":"$name","reps":$reps,"gc":$doGc,""" +
      s""""samples":[${samples.map(fmt).mkString(",")}],""" +
      s""""min":${fmt(sorted.head)},""" +
      s""""median":${fmt(median)},""" +
      s""""max":${fmt(sorted.last)},"sf":"$sfDir"}"""
    spark.stop()
    println(line)
  }
}
