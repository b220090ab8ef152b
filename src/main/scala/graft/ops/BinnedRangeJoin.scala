package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join at scale: points ⋈ intervals on
  * `lo <= p < hi` WITHOUT a broadcast-nested-loop.
  *
  * [[graft.queries.Core2Queries]]'s `q_range_join` broadcasts the
  * band table — correct while the interval side is bounded (a fixed
  * banding scheme), a scale-killer the moment intervals grow with the
  * data (per-entity validity windows, price bands per product, time
  * ranges per session): BNL cost is |P|×|I| and the broadcast frame
  * is data-proportional.
  *
  * The scale shape quantizes the range dimension into fixed-width
  * bins: an interval [lo, hi) registers in every bin it overlaps
  * (`explode(sequence(floor(lo/W), floor(hi/W)))` — ≤ ⌈width/W⌉+1
  * rows), a point registers in exactly one (`floor(p/W)`), and the
  * match becomes a shuffle EQUI-join on the bin id plus a residual
  * `lo <= p < hi` filter. Each matching pair meets in exactly one bin
  * (the point's), so no post-join dedup is needed. Cost:
  * O(|P| + |I|·width/W) shuffled rows and a hash join — AQE handles
  * hot bins (a skewed value range) like any other skewed key.
  *
  * Choosing W: W ≈ the typical interval width ⇒ ~2 bin rows per
  * interval. W far below the max width inflates the interval side;
  * W far above it degrades each bin toward a local cross product —
  * both still correct, only slower. For long-tailed widths, split
  * the interval side by width into two joins (narrow binned, wide
  * broadcast) — the hybrid the scaladoc example leaves out for
  * brevity.
  */
object BinnedRangeJoin {

  /** @param points    point side; must not already contain `__bin`
    * @param pCol      point value column (numeric)
    * @param intervals interval side; column names must be disjoint
    *                  from `points`' (alias beforehand otherwise)
    * @param loCol     inclusive lower bound column
    * @param hiCol     exclusive upper bound column
    * @param binWidth  bin width W (> 0) in the range dimension's units
    * @return one row per (point, interval) match, carrying all
    *         columns of both sides
    */
  def join(points: DataFrame, pCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty,
      s"point/interval column names collide: $overlap — alias them first")
    val reserved = (points.columns ++ intervals.columns).filter(_ == "__bin")
    require(reserved.isEmpty,
      "'__bin' is reserved by BinnedRangeJoin — rename the input column")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    // hi is exclusive, but a boundary-landing hi still registers its
    // bin — harmless (the residual filter rejects), and dropping it
    // would lose matches for points in [floor(hi/W)*W, hi).
    // Inverted intervals (hi < lo) fail LOUDLY inside the expansion
    // expression (so column pruning can't elide the check): Spark's
    // sequence(start, stop) silently steps -1 when start > stop, so a
    // swapped lo/hi column pair would explode into a descending run
    // of bins the residual filter then discards — a silent row
    // blow-up masking a data-quality bug.
    // (null bounds keep their pre-guard behavior: explode(null)
    // drops the interval row, it does not raise)
    val ibin = intervals.withColumn("__bin",
      explode(when(col(loCol).isNull || col(hiCol).isNull, lit(null))
        .when(col(loCol) <= col(hiCol),
          sequence(bin(col(loCol)), bin(col(hiCol))))
        .otherwise(raise_error(concat(
          lit("BinnedRangeJoin: inverted interval (hi < lo): lo="),
          col(loCol).cast("string"), lit(" hi="),
          col(hiCol).cast("string"))))))
    val pbin = points.withColumn("__bin", bin(col(pCol)))
    pbin.join(ibin, Seq("__bin"))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__bin")
  }
}
