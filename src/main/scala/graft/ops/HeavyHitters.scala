package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact corpus heavy hitters without a full-vocabulary shuffle.
  *
  * The wordcount-then-filter plan (text_token_histogram) shuffles one
  * (term, partial-count) pair per DISTINCT term per partition — at
  * 100 TB of web text the vocabulary (typos, URLs, hashes, numbers)
  * grows near-linearly with the corpus, so that shuffle carries
  * billions of keys even though the answer ("terms above 1/den of
  * all tokens") has at most `den` rows by definition.
  *
  * Two-pass shape instead:
  *
  *  - Pass A (candidates): each partition runs a Misra-Gries summary
  *    of capacity k = den: stream the partition's tokens, keep ≤ k
  *    counters, decrement all when full. MG guarantees every term
  *    whose PARTITION count exceeds N_p/(k+1) keeps a counter; any
  *    term with GLOBAL count > N/(k+1) must exceed that fraction in
  *    at least one partition (averaging argument), so the union of
  *    per-partition survivors is a SUPERSET of the true heavy
  *    hitters. At most k·partitions candidates leave the mappers —
  *    bounded by configuration, not by data.
  *  - Pass B (exact): re-scan, keep only candidate tokens (broadcast
  *    semi join — the candidate set is small by construction), count
  *    them EXACTLY, and apply the exact integer threshold
  *    `count·den > N`. No approximation survives into the output:
  *    pass B makes the result identical to wordcount-then-filter,
  *    which is what the DuckDB oracle runs.
  *
  * mapPartitions is sanctioned here (SURVEY §7.4 preference (d)):
  * the MG summary is genuine per-partition imperative state that no
  * composition of relational ops expresses without materializing
  * exactly the per-term counts the algorithm exists to avoid.
  */
object HeavyHitters {

  /** Misra-Gries over one iterator: returns the surviving keys. */
  private[ops] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      counters.get(t) match {
        case Some(c) => counters.update(t, c + 1)
        case None =>
          if (counters.size < k) counters.update(t, 1L)
          else {
            // decrement-all; drop zeros. Amortized O(1) per token:
            // each decrement sweep removes ≥1 of k counters and is
            // paid for by the k inserts that filled them.
            val dead = mutable.ArrayBuffer.empty[String]
            counters.mapValuesInPlace((_, c) => c - 1)
            counters.foreach { case (key, c) => if (c == 0) dead += key }
            dead.foreach(counters.remove)
          }
      }
    }
    counters.keysIterator
  }

  /** All terms whose exact count exceeds total/den, with their exact
    * counts. `tokens` must be an array column expression over `docs`.
    * Output: (term, n, total) sorted by n desc, term — deterministic.
    *
    * Exactly TWO corpus scans: pass A emits the MG survivors AND the
    * partition's token count from the same iterator (a null-term
    * sentinel row per partition), so `total` needs no third scan.
    * The pass-A result is bounded (≤ (den+1)·partitions rows) and
    * cached, since both the candidate set and the total read it.
    */
  def heavyHitters(docs: DataFrame, tokens: Column, den: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(tokens).as("term"))
    val passA = Caching.cacheOnce(toks.select(col("term")).as[String]
      .mapPartitions { it =>
        var n = 0L
        // misraGries consumes the iterator fully before returning,
        // so n is final when the sentinel row is built
        val survivors = misraGries(it.map { t => n += 1; t }, den).toArray
        survivors.iterator.map(t => (t, 0L)) ++
          Iterator.single((null: String, n))
      }.toDF("term", "cnt"))
    val candidates = passA.filter(col("term").isNotNull)
      .select(col("term")).distinct()
    val total = passA.filter(col("term").isNull)
      .agg(sum(col("cnt")).as("total"))
    // Pass B: exact counts over candidates only. The candidate set is
    // bounded (den × partitions) → broadcast semi join keeps the big
    // re-scan shuffle-free until the (bounded-key) count.
    toks.join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      // integer threshold: count·den > total — no FP, engine-exact
      .filter(col("n") * den > col("total"))
      .orderBy(col("n").desc, col("term"))
  }
}
