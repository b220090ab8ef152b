package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §7.5.5 / the 100 TB checklist): when one
  * key holds a disproportionate share of rows, a plain groupBy/join
  * sends it to one reducer. Salting splits the hot key across
  * `buckets` partial groups; algebraic aggregates then merge the
  * partials. AQE's skew-join handles the join case at runtime —
  * these helpers cover aggregation skew and the deterministic-plan
  * variant for joins AQE can't see (e.g. pre-AQE stats misses).
  */
object Salting {

  /** A deterministic per-row salt in [0, buckets): hashes the whole
    * row so replays salt identically (no rand() — reproducible plans
    * and retry-safe tasks). */
  def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.toSeq.map(col): _*), lit(buckets))

  /** Salted two-phase sum/count: groupBy(keys + salt) partial, then
    * groupBy(keys) merge. Identical results to the direct aggregate
    * for any algebraic measure. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", rowSalt(df, buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a salt
    * in [0, buckets); the (small-ish) right side is replicated once
    * per bucket so every salted key still finds its match. Use when
    * the right side is too big to broadcast but small enough to
    * replicate `buckets` times. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val l = left.withColumn("__salt", rowSalt(left, buckets))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
