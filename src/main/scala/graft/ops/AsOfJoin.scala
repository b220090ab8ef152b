package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: each left row picks the latest right
  * row with the same key and `rightTs <= leftTs`.
  *
  * Built by COMPOSITION (SURVEY §7.4 preference (a)) rather than a
  * custom SparkPlan: union the two sides tagged, sort-once per key by
  * (ts, side), and carry the right side's payload forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding frame. One
  * shuffle on the key, one per-partition sort — the same cost as the
  * sort-merge join Spark would run for an equi-join, and no
  * range-explosion like the naive `left.ts >= right.ts` join
  * (which Catalyst can only express as a broadcast-nested-loop or an
  * exploding range join).
  *
  * Tie semantics: a right row at exactly leftTs IS visible
  * (`<=`), matching DuckDB/kdb ASOF JOIN. Right rows sort before
  * left rows on equal ts via the side tag.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (e.g. a slowly-changing dim)
    * @param keys      equi-join key columns (same names both sides)
    * @param leftTs    event-time column name on the left
    * @param rightTs   event-time column name on the right
    * @param payload   right-side columns to carry (null when no
    *                  right row is at-or-before the left row) */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side: right=0 sorts before left=1 at equal ts (tie visible)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((keys ++ Seq("__ts", "__side")).map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((keys ++ Seq("__ts", "__side")).map(col) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        payload.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__c_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        payload.map(c => col(s"__c_$c").as(c)): _*)
  }
}
