package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a tokenized corpus — the lexical
  * complement to the ANN family in [[Similarity]]: a training-data
  * pipeline needs "find the documents about X" (eval-set mining,
  * targeted curation, retrieval-augmented filtering) as much as it
  * needs embedding neighbors.
  *
  * Scoring is the BM25 shape with a RATIONAL idf,
  * `(N - df + 0.5) / (df + 0.5)`, i.e. the argument of the classic
  * `log` idf without the log. Two reasons, both deliberate:
  *  - the log is a per-TERM monotone transform, so for single-term
  *    queries the ranking is identical; for multi-term queries the
  *    rational form weights rare terms more steeply — a documented
  *    scoring variant, not an approximation error;
  *  - `log()` is a libm transcendental whose low bits differ across
  *    engines/platforms, and this engine's contract is that every
  *    query hash-matches a DuckDB oracle bit-for-bit. The rational
  *    form uses only IEEE-exact ops (+ − × ÷), each correctly
  *    rounded, so the same expression tree yields the same bits on
  *    any engine.
  *
  * Float determinism under partitioning: a `sum()` over the per-term
  * contributions would add in shuffle order — different partitionings
  * give different low bits. Instead the per-(query, doc) score folds
  * the contributions in SORTED TERM ORDER (`sort_array` →
  * left-fold), so 32 cores and 1000 executors produce identical
  * doubles, and so does the oracle (`list(contrib ORDER BY term)` +
  * `list_reduce`).
  *
  * Plan shape at 100 TB:
  *  - the query set and its term dictionary are literals → the
  *    token explode filters to matched terms at the SCAN stage; the
  *    (doc, term) tf aggregate carries only matching postings;
  *  - df and the query map are tiny → broadcast joins;
  *  - doc length joins tf on doc_id (co-partitioned hash join, the
  *    only data-proportional shuffle);
  *  - final per-query top-k goes through the bounded-heap
  *    `topk_pairs` aggregate: map-side partial heaps mean the
  *    exchange carries O(queries × k) pairs regardless of how many
  *    documents matched — never a per-query window sort over the
  *    whole posting list.
  */
object Bm25 {

  /** Top-k documents per query by BM25 (rational-idf variant).
    *
    * @param docs    corpus; one row per document
    * @param idCol   document id column name (castable to long)
    * @param toks    tokenized text (array<string> column)
    * @param queries (query_id, terms) — the literal query set;
    *                duplicate terms within one query are counted once
    * @param k       results per query
    * @param k1      BM25 term-frequency saturation (default 1.2)
    * @param b       BM25 length normalization (default 0.75)
    * @return (query_id, rnk, doc_id, score) — rnk 1..k by
    *         (score DESC, doc_id ASC)
    */
  def topK(docs: DataFrame, idCol: String, toks: Column,
           queries: Seq[(Int, Seq[String])], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25: empty query set")
    require(k > 0, s"bm25: k must be positive, got $k")
    val s = docs.sparkSession
    graft.GraftExtensions.ensure(s)
    import s.implicits._

    val terms = queries.flatMap(_._2).distinct
    val qmap = queries
      .flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")

    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      toks.as("__toks"))
    val dl = base.select(col("doc_id"), size(col("__toks")).as("dl"))
    // one row: corpus size and total token count, both needed by
    // every score → broadcast as a 1-row cross join
    val st = dl.agg(count(lit(1)).cast("double").as("n"),
      sum(col("dl")).cast("double").as("s"))

    val tf = base
      .select(col("doc_id"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf has one row per (doc, term) ⇒ per-term row count IS df
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val dlD = col("dl").cast("double")
    // expression tree mirrored verbatim in the oracle SQL: same ops,
    // same association, so the doubles match bit-for-bit
    val idf = (col("n") - dfD + lit(0.5)) / (dfD + lit(0.5))
    val norm = (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (dlD / (col("s") / col("n")))))

    val contribs = tf
      .join(broadcast(dfreq), "term")
      .join(broadcast(qmap), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .select(col("query_id"), col("doc_id"), col("term"),
        (idf * norm).as("contrib"))

    // fixed-order score fold: sort by term, then left-fold from 0.0
    // (0.0 + x is bit-exact x for the positive contribs)
    val scored = contribs
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sort_array(collect_list(struct(col("term"), col("contrib"))))
        .as("cs"))
      .select(col("query_id"), col("doc_id"),
        aggregate(transform(col("cs"), x => x.getField("contrib")),
          lit(0.0), (acc, x) => acc + x).as("score"))

    scored
      .groupBy(col("query_id"))
      .agg(call_function("topk_pairs", col("score"), col("doc_id"),
        lit(k)).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("doc_id"), col("col.score").as("score"))
  }
}
