package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact prefix scans over a GLOBAL order without a global window.
  *
  * An un-partitioned `Window.orderBy(...)` funnels the whole relation
  * through ONE partition — the canonical 100 TB scale-killer. When
  * the ordering key is monotone-bandable (any integer key: band =
  * key div width), a prefix aggregate decomposes exactly into
  *   (per-band prefix within the band)  ⊕  (aggregate of all lower bands)
  * for any associative ⊕ that is order-insensitive on its band
  * summary (max, min, sum of a commutative monoid). The band
  * summaries form a tiny relation (n / bandWidth rows), so the
  * cross-band combine is a band×band inequality self-join — never a
  * data-sized single partition; every data-sized stage stays
  * partition-parallel on the band key.
  *
  * Used by `cdc_lateness_profile` (prefix max of event-time = the
  * streaming high-watermark) and `cdc_seq_gaps` (previous-value scan
  * = replication hole detection). `pipe_token_budget` applies the
  * same decomposition with quality-quantile bands inline.
  */
object BandedScan {

  /** Exact floor-division band id. All-integer (`div` over an
    * exactly-divisible numerator): no double rounding for keys past
    * 2^53, and floor (not truncate-toward-zero) semantics so
    * negative keys band BELOW zero instead of colliding with band 0
    * and breaking the band order. */
  private def bandExpr(bandWidth: Long): Column =
    expr(s"(__ok - ((__ok % ${bandWidth}L + ${bandWidth}L) % ${bandWidth}L))" +
      s" div ${bandWidth}L")

  /** A null banding key would make `__band` null and the inner join
    * on `__band` would silently DROP the row — diverging from the
    * naive global window these ops claim exact equivalence with (a
    * window sorts nulls; it never drops rows). Fail loudly instead,
    * inside the scan stage (no extra pass). */
  private def failNull(c: Column, what: String): Column =
    when(c.isNull, raise_error(lit(
      s"BandedScan: null $what — the banded decomposition requires " +
        "non-null keys; filter or coalesce nulls first"))).otherwise(c)

  /** Adds `prefix_max`: the max of `valCol` over all rows STRICTLY
    * earlier in `orderCol` order (null for the global first row —
    * there is no earlier row). Exclusive on purpose: the row's own
    * value never masks the question "what had been seen before it".
    */
  def prefixMaxExclusive(df: DataFrame, orderCol: String, valCol: String,
      bandWidth: Long = 4096L): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val banded = df.withColumn("__ok",
        failNull(col(orderCol).cast("long"), s"order key '$orderCol'"))
      .withColumn("__band", bandExpr(bandWidth))
    val bmax = banded.groupBy(col("__band"))
      .agg(max(col(valCol)).as("__bm"))
    // each band's offset = max over all strictly lower bands; the
    // summaries are data/bandWidth rows, so the inequality self-join
    // is trivially small and broadcasts back
    val off = bmax
      .join(bmax.select(col("__band").as("__lb"), col("__bm").as("__lm")),
        col("__lb") < col("__band"), "left")
      .groupBy(col("__band")).agg(max(col("__lm")).as("__off"))
    val w = Window.partitionBy(col("__band")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() skips nulls: in-band-empty (first row of its band)
    // falls back to the lower-band offset; both null ⇒ global first
    banded.join(broadcast(off), Seq("__band"))
      .withColumn("prefix_max",
        greatest(max(col(valCol)).over(w), col("__off")))
      .drop("__band", "__off", "__ok")
  }

  /** Quality-ordered global budget selection: keep rows in
    * descending-`qualityCol` order (ties by `tieCol`) while the
    * running sum of `weightCol` stays within `budget` — the
    * data-constrained-scaling curation shape, shared by the
    * `pipe_token_budget` query and the curation CLI's token-budget
    * stage.
    *
    * Same decomposition as the prefix scans above, with the bands
    * taken from the sort key itself: quality quantizes into coarse
    * bands (`floor(q · bandMultiplier)` — a monotone function of the
    * sort key, so band order IS quality order), per-band totals (a
    * tiny aggregate) broadcast back as cumulative offsets, and the
    * exact integer running sum proceeds per-band in parallel — never
    * one un-partitioned window. (A constant partition key doesn't
    * dodge that: Spark 4's EliminateWindowPartitions strips foldable
    * keys.) Returns the input columns unchanged, helpers dropped. */
  def budgetFilter(df: DataFrame, qualityCol: String, weightCol: String,
      tieCol: String, budget: Long, bandMultiplier: Int = 4): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val banded = df.withColumn("__band", failNull(
      floor(col(qualityCol) * bandMultiplier).cast("long"),
      s"quality '$qualityCol'"))
    val bandTotals = banded.groupBy(col("__band"))
      .agg(sum(col(weightCol)).as("__btok"))
    // each band's offset = total weight of all STRICTLY HIGHER
    // (better-quality) bands — a tiny band×band inequality join
    val offsets = bandTotals
      .join(bandTotals.select(col("__band").as("__hb"),
          col("__btok").as("__hbtok")),
        col("__hb") > col("__band"), "left")
      .groupBy(col("__band"))
      .agg(coalesce(sum(col("__hbtok")), lit(0L)).as("__off"))
    val w = Window.partitionBy(col("__band"))
      .orderBy(col(qualityCol).desc, col(tieCol))
    banded.join(broadcast(offsets), Seq("__band"))
      .withColumn("__cum", sum(col(weightCol)).over(w) + col("__off"))
      .filter(col("__cum") <= budget)
      .drop("__band", "__off", "__cum")
  }

  /** Adds `prev_value`: `valCol` of the row immediately before this
    * one in `orderCol` order (lag 1 across the whole relation; null
    * for the global first row). Same banded decomposition — the
    * cross-band seam needs each band's LAST value, carried by
    * max_by(val, order) in the band summary, and "previous nonempty
    * band" resolves in the same tiny inequality join (empty bands —
    * a filtered/sparse key — are skipped by taking the lower band
    * with the greatest last-order). */
  def prevValue(df: DataFrame, orderCol: String, valCol: String,
      bandWidth: Long = 4096L): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val banded = df.withColumn("__ok",
        failNull(col(orderCol).cast("long"), s"order key '$orderCol'"))
      .withColumn("__band", bandExpr(bandWidth))
    val blast = banded.groupBy(col("__band"))
      .agg(max_by(col(valCol), col(orderCol)).as("__lv"),
        max(col(orderCol)).as("__lo"))
    val off = blast
      .join(blast.select(col("__band").as("__lb"), col("__lv").as("__plv"),
          col("__lo").as("__plo")),
        col("__lb") < col("__band"), "left")
      .groupBy(col("__band"))
      .agg(max_by(col("__plv"), col("__plo")).as("__prev"))
    val w = Window.partitionBy(col("__band")).orderBy(col(orderCol))
    // NOTE: assumes non-null valCol (the coalesce seam can't tell "no
    // previous row in band" from "previous value was null")
    banded.join(broadcast(off), Seq("__band"))
      .withColumn("prev_value",
        coalesce(lag(col(valCol), 1).over(w), col("__prev")))
      .drop("__band", "__prev", "__ok")
  }
}
