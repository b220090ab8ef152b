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
    *                  right row is at-or-before the left row)
    * @param rightTiebreak optional right-side column (e.g. a seq)
    *                  ordering right rows that share (key, ts): the
    *                  highest value wins. Without it, equal-ts right
    *                  rows have no deterministic winner across
    *                  runs/partitionings (same role as the order
    *                  column in Compactor.lastEventPerKey).
    *                  NULL semantics: the ascending sort is
    *                  nulls-first, so a null-tiebreak row always
    *                  loses to any non-null one at equal (key, ts),
    *                  and rows whose tiebreak is null remain
    *                  non-deterministic among THEMSELVES — full
    *                  determinism requires the column to be non-null
    *                  (e.g. coalesce a surrogate seq in first). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      rightTiebreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val collisions = payload.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: $collisions — alias them first")
    // The payload is carried as ONE struct so the whole latest right
    // row wins atomically — per-column last(ignoreNulls) would mix
    // fields from different right versions whenever a later row sets
    // a column back to null.
    def payloadStruct(f: String => Column): Column =
      struct(payload.map(c => f(c).as(c)): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(c =>
        org.apache.spark.sql.types.StructField(c, right.schema(c).dataType))))
    // side: right=0 sorts before left=1 at equal ts (tie visible)
    val tbType = rightTiebreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(tbType))
      .select((keys ++ Seq("__ts", "__side", "__tb")).map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) :+
        nullPayload.as("__p"): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__tb",
        rightTiebreak.map(col).getOrElse(lit(null).cast(tbType)))
      .select((keys ++ Seq("__ts", "__side", "__tb")).map(col) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
        payloadStruct(col).as("__p"): _*)
    // __tb last: side still dominates at equal ts; among right rows
    // sharing (key, ts), ascending tiebreaker makes the highest value
    // the `last` — i.e. the winner — deterministically. NULL
    // tiebreakers sort FIRST (Spark asc = nulls-first), so a null-__tb
    // row loses to ANY non-null peer at the same (key, ts); multiple
    // all-null peers are indistinguishable and the winner among them
    // is partitioning-dependent — callers needing full determinism
    // must supply a non-null (or coalesced) tiebreak column.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        payload.map(c => col("__c").getField(c).as(c)): _*)
  }

  /** Broadcast point-in-time lookup — the as-of join for a BOUNDED
    * reference side (a slowly-changing dimension's version history):
    * the right side packs into one time-sorted array per key and
    * broadcasts; the fact side is never shuffled — the lookup is a
    * per-row ordered-array probe fused into the scan stage.
    *
    * Use this when the reference side is dimension-sized (the SCD-2
    * enrichment case: "which dim version was current at event
    * time"); use [[asOf]] when the reference side grows with the
    * data — a broadcast hint there is the classic scale-killer.
    *
    * Cost: zero shuffles on the fact side, O(|versions(key)|) per
    * probe (version chains are short for real dims; sorted-array
    * scan beats per-row binary search at those lengths anyway).
    *
    * Tie semantics: rows sharing (key, ts) resolve to the greatest
    * (ts, payload…) tuple — lexicographic `array_max` — which is
    * deterministic under any partitioning; same `<=` visibility as
    * [[asOf]].
    */
  def broadcastAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val collisions = payload.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: $collisions — alias them first")
    val hist = right.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col(rightTs).as("__ts") +: payload.map(col): _*))).as("__hist"))
    // null-SAFE key equality: asOf's window partitioning groups null
    // keys together (a null-key left row sees null-key right rows),
    // so the broadcast variant must too — a plain equi-join would
    // silently diverge on nullable-key dims
    val cond = keys.map(k => left(k) <=> hist(k)).reduce(_ && _)
    left.join(broadcast(hist), cond, "left")
      .withColumn("__m",
        array_max(filter(hist("__hist"), h => h("__ts") <= col(leftTs))))
      .select(left.columns.toSeq.map(c => left(c)) ++
        payload.map(c => col("__m").getField(c).as(c)): _*)
  }
}
