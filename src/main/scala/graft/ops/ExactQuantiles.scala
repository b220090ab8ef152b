package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT interpolated percentiles per group, computed by distributed
  * selection instead of per-group buffering.
  *
  * Spark's exact `percentile()` aggregate materializes every value of
  * a group in ONE task's memory (an ObjectHashAggregate buffer), then
  * sorts it single-threaded — the aggregate equivalent of the
  * unsplittable window partition: at 100 TB a popular group is tens
  * of gigabytes in one JVM. This operator keeps every stage bounded:
  *
  *   1. per-group count/min/max (map-side-combinable, broadcastable);
  *   2. each row maps to one of `bands` equal-width value bands —
  *      a (group, band) COUNT histogram (hash aggregate, no buffers);
  *   3. a ≤`bands`-row-per-group prefix sum locates, for each target
  *      rank `1 + p·(n−1)` (its floor and ceil), the single band
  *      containing it;
  *   4. only the rows of LOCATED bands (~n/bands each under any
  *      roughly-even spread) are ranked — a window over band-sized
  *      partitions, never group-sized;
  *   5. the ranked values at the two indices interpolate with
  *      Spark's own formula
  *      `lower·(highIdx − pos) + higher·(pos − lowIdx)`, so results
  *      are bit-identical to `percentile()` (and to the DuckDB
  *      `quantile_cont` oracle that formula already hash-matches).
  *
  * Constant groups (min = max) short-circuit: every percentile IS
  * that value — no candidate scan, and the all-values-equal band
  * degeneracy cannot arise. Remaining pathological case: a group
  * whose values pile into one narrow band that still spans distinct
  * values keeps that band's rank partition large (recursing into the
  * band would bound it; not needed at this engine's data shapes).
  *
  * Cost: two scans of (group, value) + small shuffles, vs one scan
  * into unbounded per-group buffers. Null values are excluded (the
  * `percentile()` contract); null GROUPS are excluded by the keyed
  * joins — callers with nullable group keys should coalesce first.
  */
object ExactQuantiles {

  /** @param targets (valueColumn, percentiles) pairs
    * @return (grp, vcol, p, value) — one row per group × target
    */
  def percentiles(df: DataFrame, grp: String,
      targets: Seq[(String, Seq[Double])],
      bands: Int = 1024): DataFrame = {
    require(targets.nonEmpty, "percentiles: no targets")
    require(bands > 1, s"percentiles: need bands > 1, got $bands")
    targets.map { case (vcol, ps) =>
      require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
        s"percentiles($vcol): p must be in [0,1], got $ps")
      onColumn(df, grp, vcol, ps, bands)
    }.reduce(_ unionByName _)
  }

  private def onColumn(df: DataFrame, grp: String, vcol: String,
      ps: Seq[Double], bands: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(grp).as("__g"), col(vcol).cast("double")
      .as("__v")).filter(col("__v").isNotNull)
    val stats = base.groupBy(col("__g")).agg(count(lit(1)).as("__n"),
      min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))

    val psDf = ps.toDF("__p")
    // target rank (Spark percentile definition): pos = 1 + (n−1)·p,
    // needed row indices = floor(pos) and ceil(pos), 1-based
    val tg = stats.crossJoin(broadcast(psDf))
      .withColumn("__pos",
        lit(1.0) + (col("__n") - 1).cast("double") * col("__p"))
      .withColumn("__li", floor(col("__pos")).cast("long"))
      .withColumn("__hi2", ceil(col("__pos")).cast("long"))

    // constant groups: every percentile is the single value
    val flat = tg.filter(col("__lo") === col("__hi"))
      .select(col("__g"), col("__p"), col("__lo").as("__val"))

    val varied = tg.filter(col("__lo") < col("__hi"))
    val width = (col("__hi") - col("__lo")) / lit(bands.toDouble)
    val bandOf = least(lit(bands - 1),
      floor((col("__v") - col("__lo")) / width).cast("int"))
    val banded = base
      .join(broadcast(stats.filter(col("__lo") < col("__hi"))
        .select(col("__g").as("__g2"), col("__lo"), col("__hi"))),
        col("__g") === col("__g2"))
      .select(col("__g"), col("__v"), bandOf.as("__b"))
    // (group, band) histogram + exclusive prefix count — ≤ bands
    // rows per group, so the window partition is bounded by `bands`
    val wPrev = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bc = banded.groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cb", coalesce(sum(col("__c")).over(wPrev), lit(0L)))

    // locate the band holding each needed index: band b covers global
    // ranks (cb, cb + c]; bc is G×bands rows — broadcastable for any
    // sane group count
    val need = varied
      .select(col("__g"), col("__p"), col("__pos"), col("__li"),
        col("__hi2"))
      .select(col("__g"), col("__p"), col("__pos"), col("__li"),
        col("__hi2"), explode(array(col("__li"), col("__hi2"))).as("__i"))
    val loc = need.join(
      broadcast(bc.select(col("__g").as("__g3"), col("__b"),
        col("__c"), col("__cb"))),
      col("__g") === col("__g3") && col("__cb") < col("__i") &&
        col("__i") <= col("__cb") + col("__c"))

    // rank ONLY the located bands' rows; partition size ≈ n/bands
    val wanted = loc.select(col("__g"), col("__b")).distinct()
    val wRank = Window.partitionBy(col("__g"), col("__b"))
      .orderBy(col("__v"))
    val ranked = banded.join(broadcast(wanted), Seq("__g", "__b"))
      .withColumn("__rn", row_number().over(wRank))
    val at = loc.join(ranked.select(col("__g").as("__g4"),
        col("__b").as("__b4"), col("__rn"), col("__v")),
      col("__g") === col("__g4") && col("__b") === col("__b4") &&
        col("__i") === col("__cb") + col("__rn"))

    // Spark Percentile's interpolation, verbatim:
    // lower·(highIdx − pos) + higher·(pos − lowIdx); integer pos ⇒
    // the single value
    val interp = at.groupBy(col("__g"), col("__p"), col("__pos"),
        col("__li"), col("__hi2"))
      .agg(max(when(col("__i") === col("__li"), col("__v"))).as("__lv"),
        max(when(col("__i") === col("__hi2"), col("__v"))).as("__hv"))
      .select(col("__g"), col("__p"),
        when(col("__li") === col("__hi2"), col("__lv"))
          .otherwise(
            col("__lv") * (col("__hi2").cast("double") - col("__pos")) +
              col("__hv") * (col("__pos") - col("__li").cast("double")))
          .as("__val"))

    interp.unionByName(flat)
      .select(col("__g").as(grp), lit(vcol).as("vcol"),
        col("__p").as("p"), col("__val").as("value"))
  }
}
