package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan widening (optimization guide §2.5: one
  * unsplittable input → repartition immediately after the read).
  *
  * The gate-scale parquet inputs are single row-groups, so every
  * corpus featurize otherwise runs as ONE task regardless of core
  * count. Widening was measured as a LOSS earlier in r14 (entry 5:
  * 32-way concurrent evaluation thrashed memory bandwidth) — that
  * verdict INVERTED once the generator double-evaluation was
  * removed (entry 11): post-fix, `model_lm_trigram_by_lang` runs
  * 3.5-6.6 s at width 1, 1.1-1.5 s at width 8-16, ~2 s at 32.
  *
  * Width = HALF the session's slots: these train+score queries run
  * concurrent jobs (the model-table broadcast builds overlap the
  * scoring stage), so reserving headroom measures faster than
  * saturating, and the sweep's optimum (8-16 of 32) sits there.
  *
  * Scale-adaptive by construction, not a local constant: the widen
  * fires only when the scan's actual partition count is BELOW the
  * target, so a real multi-partition input (any cluster-scale
  * dataset) passes through untouched and nothing ever COALESCES.
  * The round-robin exchange moves the corpus once at gate scale
  * (~30 MB); retry determinism comes from Spark's
  * sortBeforeRepartition default (guide §2.5).
  */
object Spread {

  def auto(df: DataFrame): DataFrame = {
    val target = math.max(1,
      df.sparkSession.sparkContext.defaultParallelism / 2)
    // planning-only peek at the scan's split count (no job runs)
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
