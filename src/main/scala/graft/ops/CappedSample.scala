package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key cap — keep the `cap` smallest rows per key by
  * `(hash, id)` — WITHOUT ever sorting a mega-key's full partition.
  *
  * The naive form (`row_number() OVER (PARTITION BY key ORDER BY
  * hash, id) <= cap`) is what the cap exists to defend against: a
  * window partition cannot be split across tasks (every row of the
  * key must colocate for the rank), so the one mega-domain /
  * mega-cluster the cap targets becomes a single task sorting that
  * key's entire row set — AQE's skew handling applies to joins and
  * aggregates, not to window colocation. At 100 TB, one 30%-of-corpus
  * template family = one task sorting 30 TB.
  *
  * This form bounds every stage by `cap`, not by `|key|`:
  *   1. per-key counts (map-side-combinable aggregate);
  *   2. keys at or under the cap keep ALL rows — no ordering at all;
  *   3. over-cap keys pre-filter to `hash < t(key)` where `t` is
  *      sized so ~2·cap rows pass (`hash` is uniform — it is a
  *      digest); if any key got fewer than `cap` candidates (hash
  *      clustering — possible, just exponentially unlikely), the
  *      threshold DOUBLES and the filter re-runs, so the result is
  *      EXACT, never sampled: a row with `hash >= t` is
  *      lexicographically greater than every candidate, so once a
  *      key has `cap` candidates the true top-cap is inside them;
  *   4. the rank runs over candidates only — partitions of ~2·cap
  *      rows however large the key was.
  *
  * Output is row-identical to the window form (spec-pinned on
  * adversarial mega-key data), so the DuckDB window oracles keep
  * hash-matching.
  *
  * @param hash      deterministic order column in `[0, hashRange)`
  *                  (e.g. `TextFunctions.hashBucket(id, 1000000)`).
  *                  NULLs are allowed and rank FIRST (Spark's
  *                  ascending null ordering — identical to what the
  *                  window form produces): internally they map to -1,
  *                  below every real hash, so they are always
  *                  candidates and never silently dropped.
  * @param tiebreak  total-order tiebreak within equal hashes
  */
object CappedSample {
  def perKeyCap(df: DataFrame, keyCols: Seq[String], hash: Column,
      tiebreak: Column, cap: Int,
      hashRange: Long = 1000000L): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(hashRange > 0, s"hashRange must be positive, got $hashRange")
    val outCols = df.columns.toSeq
    // NULL-SAFE key plumbing: a plain using-column join would DROP
    // rows whose key is null (null never equals null in a join),
    // silently losing the null-key group the window form keeps.
    // Keys are copied to working aliases (__csk_i) and every join
    // here uses <=> (null-safe equality); groupBy already treats
    // null as an ordinary group.
    val keyAliases = keyCols.indices.map(i => s"__csk_$i")
    // null hashes → -1: below every real hash (contract: [0,
    // hashRange)), so null-hash rows rank first — the window form's
    // nulls-first ascending order — AND always pass the `__csh < t`
    // candidate filter. The r8 form dropped them for over-cap keys
    // (null < t is null → filtered) while keeping them for under-cap
    // keys: silently inconsistent.
    val masked = keyCols.indices.foldLeft(
      df.withColumn("__csh", coalesce(hash, lit(-1L)))) {
      case (d, i) => d.withColumn(keyAliases(i), col(keyCols(i)))
    }
    val ks = keyAliases.map(col)
    val grpCounts = masked.groupBy(ks: _*).agg(count(lit(1)).as("__csn"))
    val joinedN = masked.join(
      grpCounts.withColumnRenamed("__csn", "__csn2")
        .toDF(keyAliases.map(_ + "_r") :+ "__csn2": _*),
      keyAliases.map(a => col(a) <=> col(a + "_r")).reduce(_ && _))
      .drop(keyAliases.map(_ + "_r"): _*)
      .withColumnRenamed("__csn2", "__csn")
    val small = joinedN.filter(col("__csn") <= cap)
      .select(outCols.map(col): _*)
    // materialize the over-cap set ONCE (eager localCheckpoint):
    // every convergence-loop pass below — and the final candidate
    // rank — re-reads these blocks instead of re-running the
    // scan + count-join lineage, so an adversarial hash-clustered
    // key that forces N threshold doublings costs N cheap
    // checkpoint-local jobs, not N full input passes
    // (CappedSampleSpec pins input-pass independence from N). Size
    // is bounded by the over-cap rows only; MEMORY_AND_DISK spills.
    val big = joinedN.filter(col("__csn") > cap).localCheckpoint()
    val overCounts = grpCounts.filter(col("__csn") > cap).localCheckpoint()
    var factor = 2L
    var cand: DataFrame = null
    var done = false
    while (!done) {
      val t = least(lit(hashRange),
        lit(factor) * cap * hashRange / col("__csn") + 1)
      cand = big.filter(col("__csh") < t)
      // a key is short only if it has under cap candidates AND its
      // threshold has room to grow (at t = hashRange every row
      // passes and got = __csn > cap, so termination is structural)
      val candCounts = cand.groupBy(ks: _*).agg(count(lit(1)).as("__got"))
        .toDF(keyAliases.map(_ + "_r") :+ "__got": _*)
      val short = overCounts
        .join(candCounts,
          keyAliases.map(a => col(a) <=> col(a + "_r")).reduce(_ && _),
          "left")
        .filter(coalesce(col("__got"), lit(0L)) < cap)
      if (short.isEmpty) done = true else factor *= 2L
    }
    // the per-key over-cap counts have no consumer past the loop;
    // the `big` checkpoint stays live — `kept` below reads it when
    // the caller consumes the result (blocks free on GC, or the
    // caller can CheckpointRelease.release(big) via the returned
    // plan once consumed)
    CheckpointRelease.release(overCounts)
    val w = Window.partitionBy(ks: _*).orderBy(col("__csh"), tiebreak)
    val kept = cand.withColumn("__csrn", row_number().over(w))
      .filter(col("__csrn") <= cap)
      .select(outCols.map(col): _*)
    small.union(kept)
  }
}
