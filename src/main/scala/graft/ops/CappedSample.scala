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
  *      digest); if a key's hashes cluster above the threshold
  *      (possible, just exponentially unlikely) the threshold
  *      DOUBLES until the key has `cap` candidates, so the result is
  *      EXACT, never sampled: a row with `hash >= t` is
  *      lexicographically greater than every candidate, so once a
  *      key has `cap` candidates the true top-cap is inside them;
  *   4. the rank runs over candidates only — partitions of ~2·cap
  *      rows however large the key was.
  *
  * The doubling search is DECLARATIVE, not a driver loop (round 9 —
  * two prior forms both had scale or correctness defects: a
  * re-filter-and-count loop re-ran the scan + count-join lineage per
  * doubling, and caching/checkpointing the over-cap set to fix that
  * runs an eager action inside plan ASSEMBLY, which completes any
  * upstream `observe()` funnel with empty metrics — found by
  * CurationSpec's domain-cap funnel). Instead, each row computes the
  * smallest doubling EXPONENT at which it becomes a candidate
  * (`hash < t(2^k)` ⟺ `2^k·cap·hashRange ≥ hash·|key|`, exact long
  * arithmetic, so `k = ceil_log2(ceil(hash·|key| / (cap·hashRange)))`
  * — ≤ 64 values however large the key), a per-(key, k) count builds
  * each key's ≤64-bucket candidate histogram, a tiny in-row fold
  * picks the key's first exponent with ≥ cap cumulative candidates,
  * and one join + filter materializes exactly the candidate set the
  * loop would have converged to. One pass, no actions, no caches —
  * the plan composes with `observe()`, streaming foreachBatch, and
  * whatever else wraps it.
  *
  * Output is row-identical to the window form (spec-pinned on
  * adversarial mega-key data), so the DuckDB window oracles keep
  * hash-matching. Equal hashes share an exponent, so a hash-tie at
  * the boundary is never split — the candidate set is a prefix of
  * the (hash, tiebreak) order, exactly like a threshold filter.
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

  /** Minimal doubling exponent for a row with hash `h` in a key of
    * `n` rows: the row passes the factor-f threshold
    * `hash < f·cap·hashRange div n + 1` iff f·cap·hashRange ≥ h·n
    * (exact for non-negative longs), so x = ceil(h·n / (cap·
    * hashRange)) is the minimal REAL factor and the minimal exponent
    * is ceil_log2(x) = length(bin(x−1)) for x > 1 (bit length needs
    * no libm). h ≤ 0 (incl. the null −1 mask) ⇒ exponent 0: always a
    * candidate.
    *
    * h·n overflows a long once n > Long.MaxValue/hashRange (~9e12
    * rows in one key at the default range) — and a wrapped product
    * would collapse some rows' exponents to 0 but not others,
    * silently breaking the hash-prefix exactness argument. So the
    * ceiling is computed WITHOUT that product: with C = cap·hashRange
    * and n = q·C + r (q = n div C, r = n mod C),
    *
    *   ceil(h·n/C) = h·q + ceil(h·r/C)
    *
    * where h·q ≤ n/cap and h·r < hashRange·C both fit a long for any
    * n up to Long.MaxValue, given the cap·hashRange² bound
    * [[perKeyCap]] requires. Spec-pinned against BigInt arithmetic
    * on boundary-adversarial (h, n) pairs. */
  private[ops] def minExponent(h: Column, n: Column, cap: Int,
      hashRange: Long): Column = {
    val bigC = cap * hashRange
    val q = call_function("div", n, lit(bigC))
    val r = n - q * lit(bigC)
    val x = h * q +
      call_function("div", h * r + lit(bigC - 1), lit(bigC))
    when(h <= 0 || x <= 1, lit(0)).otherwise(length(bin(x - 1)))
  }

  def perKeyCap(df: DataFrame, keyCols: Seq[String], hash: Column,
      tiebreak: Column, cap: Int,
      hashRange: Long = 1000000L): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(hashRange > 0, s"hashRange must be positive, got $hashRange")
    // overflow bound for minExponent's h·r term (h < hashRange,
    // r < cap·hashRange): cap·hashRange² must fit a long. Defaults
    // (hashRange = 1e6) allow caps up to ~9.2e6.
    require(cap <= Long.MaxValue / hashRange / hashRange,
      s"cap·hashRange² must fit a long (cap=$cap, hashRange=" +
        s"$hashRange) — lower cap or hashRange")
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
    // nulls-first ascending order — AND are always candidates
    // (exponent 0), never silently dropped.
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

    val big = joinedN.filter(col("__csn") > cap)
      .withColumn("__csb", minExponent(col("__csh"), col("__csn"),
        cap, hashRange))

    // per-key candidate histogram over ≤ 64 exponent buckets, then
    // the key's exponent = first bucket with cumulative count ≥ cap
    // (exists: the total is |key| > cap). The fold runs over a
    // sorted ≤64-element array per over-cap key — driver-free.
    val hist = big.groupBy((ks :+ col("__csb")): _*)
      .agg(count(lit(1)).as("__csc"))
    val keyK = hist.groupBy(ks: _*)
      .agg(sort_array(collect_list(struct(col("__csb"), col("__csc"))))
        .as("__ch"))
      .select((ks :+ aggregate(col("__ch"),
        struct(lit(0L).as("cum"), lit(-1).as("ans")),
        (st, e) => struct(
          (st.getField("cum") + e.getField("__csc")).as("cum"),
          when(st.getField("ans") >= 0, st.getField("ans"))
            .when(st.getField("cum") + e.getField("__csc") >= cap,
              e.getField("__csb"))
            .otherwise(lit(-1)).as("ans")),
        st => st.getField("ans")).as("__cskk")): _*)
      .toDF(keyAliases.map(_ + "_r") :+ "__cskk": _*)

    val cand = big.join(keyK,
        keyAliases.map(a => col(a) <=> col(a + "_r")).reduce(_ && _))
      .filter(col("__csb") <= col("__cskk"))
    val w = Window.partitionBy(ks: _*).orderBy(col("__csh"), tiebreak)
    val kept = cand.withColumn("__csrn", row_number().over(w))
      .filter(col("__csrn") <= cap)
      .select(outCols.map(col): _*)
    small.union(kept)
  }
}
