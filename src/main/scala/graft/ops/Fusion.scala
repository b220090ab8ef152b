package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) — combine N independent rankings of
  * the same (query, document) space into one. The standard hybrid-
  * retrieval primitive: a curation pipeline mines hard examples with
  * BOTH a lexical ranker (BM25) and a semantic one (embedding ANN),
  * and RRF is the fusion that needs no score calibration because it
  * consumes only the RANKS:
  *
  *   score(q, d) = Σ_i 1 / (c + rank_i(q, d))    (absent ⇒ 0)
  *
  * (Cormack/Clarke/Buettcher's formulation, c = 60 by convention.)
  *
  * Cross-engine determinism falls out of the inputs: every ranker in
  * this engine emits integer ranks under a deterministic
  * (score DESC, id ASC) contract, so the fused score is a FIXED
  * left-to-right sum of `1.0 / (c + rank)` terms — small-integer
  * division, correctly rounded, bit-identical on any IEEE engine. No
  * fold-order tricks needed: the per-ranker terms are written out in
  * ranker order.
  *
  * Plan shape at 100 TB: each input is already top-k-per-query (an
  * O(queries × k) relation, NOT data-proportional — the expensive
  * candidate generation happened inside the rankers, bounded-heap
  * selected). The fusion full-outer-joins these small relations on
  * (query_id, doc_id) and reselects per query through the
  * bounded-heap `topk_pairs` aggregate. Total shuffle:
  * O(queries × k × rankers).
  */
object Fusion {

  /** Fuse rankings by RRF and return the top-k per query.
    *
    * @param rankings each (query_id, doc_id, rnk) — rnk 1-based;
    *                 one row per (query, doc) per ranker
    * @param k        fused results per query
    * @param c        RRF damping constant (default 60)
    * @return (query_id, rnk, doc_id, score) — rnk 1..k by
    *         (score DESC, doc_id ASC)
    */
  def rrfTopK(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf: no rankings to fuse")
    require(k > 0, s"rrf: k must be positive, got $k")
    require(c >= 0, s"rrf: damping must be non-negative, got $c")
    graft.GraftExtensions.ensure(rankings.head.sparkSession)

    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rnk").cast("double").as(s"__r$i"))
    }
    // Seq-key joins COALESCE the key columns, so a doc present in
    // only one ranking keeps its (query_id, doc_id)
    val joined = tagged.reduce(
      (a, b) => a.join(b, Seq("query_id", "doc_id"), "full_outer"))
    // fixed left-to-right term order — the determinism contract
    val score = rankings.indices
      .map(i => coalesce(lit(1.0) / (lit(c.toDouble) + col(s"__r$i")),
        lit(0.0)))
      .reduceLeft(_ + _)

    joined
      .select(col("query_id"), col("doc_id"), score.as("score"))
      .groupBy(col("query_id"))
      .agg(call_function("topk_pairs", col("score"), col("doc_id"),
        lit(k)).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("doc_id"), col("col.score").as("score"))
  }
}
