package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Empirical per-query breakdown (optimization guide §1.1) without
  * the UI: job/stage/task counts and where the wall-clock goes —
  * executor task time vs scheduling/planning gaps. The fixture-scale
  * gate queries are frequently JOB-COUNT bound (plan + codegen +
  * schedule ~100-300 ms per stage at local[32]), which per-stage
  * task metrics alone cannot show.
  *
  * usage: ProbeQ <sfDir> <query> [query...]
  */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val stageTaskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]
    val stageGcMs = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val i = s.stageInfo
        val ms = i.completionTime.getOrElse(0L) -
          i.submissionTime.getOrElse(0L)
        // per-stage executor task time + GC: the wall column alone
        // cannot split "32 concurrent heavy tasks" from "32 cheap
        // tasks behind one straggler" (r14: needed to localize a
        // 38 s task-time query whose stage names are all lambdas)
        val tt: Long = Option(stageTaskMs.remove(i.stageId))
          .fold(0L)(_.longValue)
        val gc: Long = Option(stageGcMs.remove(i.stageId))
          .fold(0L)(_.longValue)
        stageRows.add(f"$ms%6d ms  stage ${i.stageId}%4d " +
          f"tasks=${i.numTasks}%3d taskTime=$tt%6d gc=$gc%5d  " +
          i.name.take(60))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          stageTaskMs.merge(t.stageId,
            t.taskMetrics.executorRunTime, _ + _)
          stageGcMs.merge(t.stageId, t.taskMetrics.jvmGCTime, _ + _)
        }
      }
    })
    for (name <- args.drop(1)) {
      val q = SparkEntry.queries(name)
      // warmup once (JIT + catalog), then measure
      q(spark, dir).write.format("noop").mode("overwrite").save()
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      stageRows.clear()
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // settle listener delivery (the bus is async; private API, so
      // just give it a beat)
      Thread.sleep(300)
      println(f"PROBE $name wall=$wall%.2fs jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get} " +
        f"taskTime=${taskMs.get / 1000.0}%.2fs " +
        f"(parallel ${taskMs.get / 1000.0 / wall}%.1fx)")
      val rows = stageRows.toArray(Array.empty[String]).sorted.reverse
      rows.take(12).foreach(r => println("  " + r))
    }
    spark.stop()
  }
}
