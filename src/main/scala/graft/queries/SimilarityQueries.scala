package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** ANN similarity-search queries over `embeddings` (SURVEY §7.6).
  * Outputs are (qid, nid, rank) — integer-only, so rank order (not
  * float formatting) is what the oracle checks. */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  // DuckDB-side cosine, same IEEE sequence as Similarity.cosine
  private val sqlNorm =
    """sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                      CAST(embedding AS DOUBLE[])))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // cluster-balanced corpus sampling: ≤ 20 vectors kept per
    // nearest-centroid cell in deterministic hash order — the
    // embedding-space analogue of pipe_domain_cap (one template
    // family can dominate a crawl's CONTENT space while sharing no
    // domain). cellAssign's single aggregate + a per-cell rank.
    "pipe_cluster_balance" -> ((s, dir) =>
      Similarity.clusterBalancedSample(emb(s, dir), "embedding", "vec_id",
        nCells = 16, cap = 20)
        .orderBy(col("vec_id"))),

    // exact brute-force cosine top-5 for the first 100 vectors
    "ann_bruteforce_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(emb(s, dir), "embedding", "vec_id",
        queryPred = col("vec_id") < 100, k = 5)
        .orderBy(col("qid"), col("rank"))),

    // LSH variant: sign bucket on dims 1..8, top-5 within bucket
    "ann_signbucket_topk" -> ((s, dir) =>
      Similarity.signBucketTopK(emb(s, dir), "embedding", "vec_id",
        queryPred = col("vec_id") < 100, k = 5, bits = 8)
        .orderBy(col("qid"), col("rank"))),

    // IVF variant: nearest-centroid cells (deterministic seed
    // centroids), probe only the query's cell
    "ann_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(emb(s, dir), "embedding", "vec_id",
        queryPred = col("vec_id") < 100, k = 5, nCells = 16)
        .orderBy(col("qid"), col("rank"))),

    // multi-probe IVF: queries probe their 3 nearest cells — the
    // FAISS-nprobe recall dial; still an equi-join on cell
    "ann_ivf_multiprobe_topk" -> ((s, dir) =>
      Similarity.ivfTopKMultiProbe(emb(s, dir), "embedding", "vec_id",
        queryPred = col("vec_id") < 100, k = 5, nCells = 16, nProbe = 3)
        .orderBy(col("qid"), col("rank"))),

    // per-label embedding stats: count + norm extremes. min/max are
    // order-independent (unlike double sums), so the aggregate is
    // deterministic under any partitioning and cross-engine exact.
    "emb_label_stats" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"),
          Similarity.norm(col("embedding")).as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("nrm")).as("min_norm"),
          max(col("nrm")).as("max_norm"))
        .orderBy(col("label"))),

    // one Lloyd round of k-means centroid refinement
    // (Similarity.kmeansRefine): decimal-exact element sums make the
    // refined centroids partitioning-independent AND cross-engine
    // hash-matchable. Output = first 8 dims of each refined centroid
    // as (cid, pos, m) rows (scalar columns hash; arrays don't).
    "ann_kmeans_refine" -> ((s, dir) => {
      val refined = Similarity.kmeansRefine(
        emb(s, dir), "embedding", "vec_id", nCells = 16, rounds = 1)
      refined.select(col("cid"), posexplode(col("cvec")))
        .filter(col("pos") < 8)
        .select(col("cid"), col("pos"), col("col").cast("double").as("m"))
        .orderBy(col("cid"), col("pos"))
    }),

    // product-quantization encode (Similarity.pqEncode): 64 dims →
    // 4 subspaces × 16 centroids; output is the (id, j, code) word
    // stream — integer-only, hash-exact across engines
    "ann_pq_encode" -> ((s, dir) =>
      Similarity.pqEncode(emb(s, dir), "embedding", "vec_id",
        dims = 64, m = 4, k = 16)
        .orderBy(col("vec_id"), col("j"))),

    // PQ top-5 via asymmetric distance computation — candidates
    // scored from code words through per-query distance tables
    "ann_pq_topk" -> ((s, dir) =>
      Similarity.pqTopK(emb(s, dir), "embedding", "vec_id",
        queryPred = col("vec_id") < 100, topK = 5, dims = 64,
        m = 4, k = 16)
        .orderBy(col("qid"), col("rank"))),

    // IVF over TRAINED centroids: one Lloyd round of kmeansRefine
    // feeds ivfTopK — the full trained-index serving path, oracle-
    // checked end to end (the decimal-exact refinement is what makes
    // the trained cell space cross-engine reproducible)
    "ann_ivf_trained_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val trained = Similarity.kmeansRefine(e, "embedding", "vec_id",
        nCells = 16, rounds = 1)
      Similarity.ivfTopK(e, "embedding", "vec_id",
        queryPred = col("vec_id") < 100, k = 5, nCells = 16,
        centroids = Some(trained))
        .orderBy(col("qid"), col("rank"))
    }),

    // IVF-pruned PQ top-5 (Similarity.ivfPqTopK): the billion-vector
    // serving composition — cell pruning cuts candidates, ADC code
    // lookup cuts payload; one broadcast join keyed (cell, j, code)
    "ann_ivfpq_topk" -> ((s, dir) =>
      Similarity.ivfPqTopK(emb(s, dir), "embedding", "vec_id",
        queryPred = col("vec_id") < 100, topK = 5, dims = 64,
        m = 4, k = 16, nCells = 16, nProbe = 3)
        .orderBy(col("qid"), col("rank"))),

    // IVF-PQ over a TRAINED codebook: one Lloyd round of
    // trainPqCodebook (decimal-exact per-subspace means — the same
    // cross-engine-reproducible refinement as ann_kmeans_refine)
    // feeds ivfPqTopK — the persisted train→serve codebook lifecycle,
    // oracle-checked end to end
    "ann_ivfpq_trained_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val cb = Similarity.trainPqCodebook(e, "embedding", "vec_id",
        dims = 64, m = 4, k = 16, rounds = 1)
      Similarity.ivfPqTopK(e, "embedding", "vec_id",
        queryPred = col("vec_id") < 100, topK = 5, dims = 64,
        m = 4, k = 16, nCells = 16, nProbe = 3, codebook = Some(cb))
        .orderBy(col("qid"), col("rank"))
    }),

    // int8 symmetric quantization (Similarity.quantizeInt8) — scalar
    // summaries of the code vector (min/max/sum are integer-exact,
    // so the oracle hash-matches without comparing arrays)
    "emb_quantize_int8" -> ((s, dir) =>
      emb(s, dir)
        .select(col("vec_id"),
          Similarity.quantizeInt8(col("embedding")).as("q"))
        .select(col("vec_id"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"))
        .orderBy(col("vec_id")))
,
    // corpus Gram matrix in exact int64 fixed-point
    // (Similarity.gramFixedPoint): the PCA/whitening input, folded
    // per partition into ONE fixed 16 KB accumulator (the MLlib
    // Gramian shape — mapPartitions' canonical justification) where
    // the oracle's dataflow formulation shuffles n·d²/2 exploded
    // index-pair rows. LONG sums of floor-quantized products are
    // commutative, so the two agree bit-for-bit under any
    // partitioning.
    "emb_gram_matrix" -> ((s, dir) =>
      Similarity.gramFixedPoint(emb(s, dir), "embedding")
        .orderBy(col("i"), col("j"))),

    // recall@5 of single-probe IVF vs exact brute force, per query —
    // the meter that justifies (or indicts) an index's recall dial;
    // both inputs are O(queries·k), the meter never sees the corpus
    "ann_ivf_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val exact = Similarity.bruteForceTopK(e, "embedding", "vec_id",
        queryPred = col("vec_id") < 100, k = 5)
      val approx = Similarity.ivfTopK(e, "embedding", "vec_id",
        queryPred = col("vec_id") < 100, k = 5, nCells = 16)
      Similarity.recallAtK(approx, exact, 5).orderBy(col("qid"))
    }),

    // hard-negative mining: docs the semantic ranker surfaces that
    // the lexical ranker does NOT — semantically close, lexically
    // unmatched: exactly the negatives a retrieval model learns most
    // from. Pure anti-join of two already-top-k frames.
    "hybrid_hard_negatives" -> ((s, dir) => {
      val lex = graft.ops.Bm25.topK(
          Tables.load(s, dir, "documents"), "doc_id",
          graft.functions.TextFunctions.tokens(col("text")),
          TextQueries.bm25Queries, 20)
        .select(col("query_id"), col("doc_id"))
      val sem = Similarity.bruteForceTopK(emb(s, dir), "embedding",
          "vec_id", queryPred = col("vec_id").isin(1L, 2L, 3L, 4L), k = 20)
        .select(col("qid").cast("long").as("query_id"),
          col("nid").as("doc_id"), col("rank").as("sem_rank"))
      sem.join(lex.select(col("query_id").cast("long").as("query_id"),
          col("doc_id")), Seq("query_id", "doc_id"), "left_anti")
        .orderBy(col("query_id"), col("sem_rank"))
    }),

    // semantic decontamination: max cosine vs a broadcast eval set
    // (vec_id < 20), flag ≥ 0.45 — catches paraphrased eval leakage
    // the n-gram text_decontaminate can't see
    "emb_decontaminate" -> ((s, dir) =>
      Similarity.semanticContamination(emb(s, dir), "embedding",
        "vec_id", evalPred = col("vec_id") < 20, tau = 0.45)
        .orderBy(col("vec_id"))),

    // attribute-filtered exact ANN: neighbors must share the query's
    // label — the filter IS the join key (Σ|class|² pairs, not
    // corpus²), not a post-filter that can under-fill k
    "ann_filtered_topk" -> ((s, dir) =>
      Similarity.filteredTopK(emb(s, dir), "embedding", "vec_id",
        "label", queryPred = col("vec_id") < 100, k = 5)
        .orderBy(col("qid"), col("rank"))),

    // hybrid retrieval: RRF fusion (ops/Fusion) of a lexical ranker
    // (BM25 top-20, the fixed TextQueries.bm25Queries) with a
    // semantic one (brute-force cosine top-20, anchor vector = the
    // query's id — documents and embeddings share the id space).
    // RRF consumes only the integer ranks, so the fused doubles are
    // trivially cross-engine exact. Both inputs are O(queries·k);
    // the fusion join and re-selection never see the corpus.
    "hybrid_rrf_topk" -> ((s, dir) => {
      val lex = graft.ops.Bm25.topK(
          Tables.load(s, dir, "documents"), "doc_id",
          graft.functions.TextFunctions.tokens(col("text")),
          TextQueries.bm25Queries, 20)
        .select(col("query_id"), col("doc_id"), col("rnk"))
      val sem = Similarity.bruteForceTopK(emb(s, dir), "embedding",
          "vec_id", queryPred = col("vec_id").isin(1L, 2L, 3L, 4L), k = 20)
        .select(col("qid").as("query_id"), col("nid").as("doc_id"),
          col("rank").as("rnk"))
      graft.ops.Fusion.rrfTopK(Seq(lex, sem), k = 10)
        .orderBy(col("query_id"), col("rnk"))
    })
  )

  private val sqlBucket: String = (0 until 8).map { i =>
    s"CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END"
  }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "pipe_cluster_balance" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS cid, v AS cvec, nrm AS cn FROM e
         |  WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT e.vec_id, cent.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, cent.cvec)
         |                   / (e.nrm * cent.cn) DESC, cent.cid) AS crn
         |    FROM e CROSS JOIN cent) x WHERE crn = 1),
         |h AS (
         |  SELECT vec_id, cell,
         |    CAST(concat('0x', substring(
         |      md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |      % 1000000 AS hb
         |  FROM assigned)
         |SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY cell ORDER BY hb, vec_id) AS rn
         |  FROM h) x
         |WHERE rn <= 20 ORDER BY vec_id""".stripMargin,
    "ann_bruteforce_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 100),
         |ranked AS (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, nid, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "ann_ivf_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS cid, v AS cvec, nrm AS cn FROM e
         |  WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, v, nrm, cid AS cell FROM (
         |    SELECT e.vec_id, e.v, e.nrm, cent.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, cent.cvec)
         |                   / (e.nrm * cent.cn) DESC, cent.cid) AS crn
         |    FROM e CROSS JOIN cent) x WHERE crn = 1),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM assigned q JOIN assigned c
         |    ON q.cell = c.cell AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 100),
         |ranked AS (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, nid, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "ann_ivf_multiprobe_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS cid, v AS cvec, nrm AS cn FROM e
         |  WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, v, nrm, cid AS cell FROM (
         |    SELECT e.vec_id, e.v, e.nrm, cent.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, cent.cvec)
         |                   / (e.nrm * cent.cn) DESC, cent.cid) AS crn
         |    FROM e CROSS JOIN cent) x WHERE crn = 1),
         |qprobe AS (
         |  SELECT qid, qv, qn, cid AS cell FROM (
         |    SELECT e.vec_id AS qid, e.v AS qv, e.nrm AS qn, cent.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, cent.cvec)
         |                   / (e.nrm * cent.cn) DESC, cent.cid) AS crn
         |    FROM e CROSS JOIN cent WHERE e.vec_id < 100) x
         |  WHERE crn <= 3),
         |scored AS (
         |  SELECT q.qid, c.vec_id AS nid,
         |    list_dot_product(q.qv, c.v) / (q.qn * c.nrm) AS cos
         |  FROM qprobe q JOIN assigned c
         |    ON q.cell = c.cell AND q.qid <> c.vec_id),
         |ranked AS (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, nid, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "emb_label_stats" ->
      s"""SELECT label, COUNT(*) AS n_vecs,
         | MIN($sqlNorm) AS min_norm,
         | MAX($sqlNorm) AS max_norm
         |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "ann_kmeans_refine" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec,
         |    $sqlNorm AS cn
         |  FROM embeddings WHERE vec_id < 16),
         |base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings),
         |scored AS (
         |  SELECT b.vec_id, c.cid, b.v,
         |    list_dot_product(b.v, c.cvec) / (b.nrm * c.cn) AS ccos
         |  FROM base b CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, v, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn
         |    FROM scored) x WHERE rn = 1),
         |dims AS (
         |  SELECT cell, CAST(i AS INTEGER) - 1 AS pos,
         |    CAST(v[CAST(i AS INTEGER)] AS DECIMAL(28,12)) AS xd
         |  FROM assigned, unnest(range(1, len(v)+1)) AS t(i))
         |SELECT cell AS cid, pos,
         |  CAST(CAST(CAST(SUM(xd) AS DOUBLE) / COUNT(*) AS REAL) AS DOUBLE)
         |    AS m
         |FROM dims WHERE pos < 8 GROUP BY cell, pos
         |ORDER BY cid, pos""".stripMargin,
    "ann_pq_encode" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |subs AS (
         |  SELECT vec_id, CAST(t.j AS INTEGER) AS j,
         |    v[(CAST(t.j AS INTEGER)*16+1):(CAST(t.j AS INTEGER)*16+16)] AS xv
         |  FROM e, (SELECT unnest(range(4)) AS j) t),
         |cb AS (
         |  SELECT j, CAST(vec_id AS INTEGER) AS code, xv AS cv,
         |    list_dot_product(xv, xv) AS cc
         |  FROM subs WHERE vec_id < 16)
         |SELECT vec_id, j, code FROM (
         |  SELECT s.vec_id, s.j, cb.code,
         |    row_number() OVER (PARTITION BY s.vec_id, s.j
         |      ORDER BY (list_dot_product(s.xv, s.xv)
         |        - 2*list_dot_product(s.xv, cb.cv) + cb.cc), cb.code) AS rn
         |  FROM subs s JOIN cb ON s.j = cb.j) x
         |WHERE rn = 1 ORDER BY vec_id, j""".stripMargin,
    "ann_pq_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |subs AS (
         |  SELECT vec_id, CAST(t.j AS INTEGER) AS j,
         |    v[(CAST(t.j AS INTEGER)*16+1):(CAST(t.j AS INTEGER)*16+16)] AS xv
         |  FROM e, (SELECT unnest(range(4)) AS j) t),
         |cb AS (
         |  SELECT j, CAST(vec_id AS INTEGER) AS code, xv AS cv,
         |    list_dot_product(xv, xv) AS cc
         |  FROM subs WHERE vec_id < 16),
         |enc AS (
         |  SELECT vec_id AS nid, j, code FROM (
         |    SELECT s.vec_id, s.j, cb.code,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY (list_dot_product(s.xv, s.xv)
         |          - 2*list_dot_product(s.xv, cb.cv) + cb.cc), cb.code) AS rn
         |    FROM subs s JOIN cb ON s.j = cb.j) x WHERE rn = 1),
         |dtab AS (
         |  SELECT q.vec_id AS qid, q.j, cb.code,
         |    (list_dot_product(q.xv, q.xv)
         |      - 2*list_dot_product(q.xv, cb.cv) + cb.cc) AS dist
         |  FROM subs q JOIN cb ON q.j = cb.j WHERE q.vec_id < 100),
         |pairs AS (
         |  SELECT d.qid, enc.nid,
         |    MAX(CASE WHEN d.j = 0 THEN d.dist END)
         |      + MAX(CASE WHEN d.j = 1 THEN d.dist END)
         |      + MAX(CASE WHEN d.j = 2 THEN d.dist END)
         |      + MAX(CASE WHEN d.j = 3 THEN d.dist END) AS adist
         |  FROM enc JOIN dtab d ON enc.j = d.j AND enc.code = d.code
         |  WHERE d.qid <> enc.nid
         |  GROUP BY d.qid, enc.nid),
         |ranked AS (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
         |  FROM pairs)
         |SELECT qid, nid, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "ann_ivf_trained_topk" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec,
         |    $sqlNorm AS cn
         |  FROM embeddings WHERE vec_id < 16),
         |base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings),
         |scored0 AS (
         |  SELECT b.vec_id, c.cid, b.v,
         |    list_dot_product(b.v, c.cvec) / (b.nrm * c.cn) AS ccos
         |  FROM base b CROSS JOIN cents c),
         |assigned0 AS (
         |  SELECT vec_id, v, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn
         |    FROM scored0) x WHERE rn = 1),
         |dims AS (
         |  SELECT cell, CAST(i AS INTEGER) - 1 AS pos,
         |    CAST(v[CAST(i AS INTEGER)] AS DECIMAL(28,12)) AS xd
         |  FROM assigned0, unnest(range(1, len(v)+1)) AS t(i)),
         |means AS (
         |  SELECT cell AS cid, pos,
         |    CAST(CAST(CAST(SUM(xd) AS DOUBLE) / COUNT(*) AS REAL) AS DOUBLE)
         |      AS m
         |  FROM dims GROUP BY cell, pos),
         |refined0 AS (
         |  SELECT cid, list(m ORDER BY pos) AS cvec FROM means GROUP BY cid),
         |refined AS (
         |  SELECT c.cid, COALESCE(r.cvec, c.cvec) AS cvec
         |  FROM cents c LEFT JOIN refined0 r ON c.cid = r.cid),
         |rcent AS (
         |  SELECT cid, cvec, sqrt(list_dot_product(cvec, cvec)) AS cn
         |  FROM refined),
         |scored AS (
         |  SELECT b.vec_id, r.cid, b.v, b.nrm,
         |    list_dot_product(b.v, r.cvec) / (b.nrm * r.cn) AS ccos
         |  FROM base b CROSS JOIN rcent r),
         |assigned AS (
         |  SELECT vec_id, v, nrm, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn
         |    FROM scored) x WHERE rn = 1),
         |pairs AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM assigned q JOIN assigned c
         |    ON q.cell = c.cell AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 100),
         |ranked AS (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM pairs)
         |SELECT qid, nid, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "ann_ivfpq_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS cid, v AS cvec, nrm AS cn FROM e
         |  WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT e.vec_id, cent.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, cent.cvec)
         |                   / (e.nrm * cent.cn) DESC, cent.cid) AS crn
         |    FROM e CROSS JOIN cent) x WHERE crn = 1),
         |qprobe AS (
         |  SELECT qid, cid AS cell FROM (
         |    SELECT e.vec_id AS qid, cent.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, cent.cvec)
         |                   / (e.nrm * cent.cn) DESC, cent.cid) AS crn
         |    FROM e CROSS JOIN cent WHERE e.vec_id < 100) x
         |  WHERE crn <= 3),
         |subs AS (
         |  SELECT vec_id, CAST(t.j AS INTEGER) AS j,
         |    v[(CAST(t.j AS INTEGER)*16+1):(CAST(t.j AS INTEGER)*16+16)] AS xv
         |  FROM e, (SELECT unnest(range(4)) AS j) t),
         |cb AS (
         |  SELECT j, CAST(vec_id AS INTEGER) AS code, xv AS cv,
         |    list_dot_product(xv, xv) AS cc
         |  FROM subs WHERE vec_id < 16),
         |enc AS (
         |  SELECT vec_id AS nid, j, code FROM (
         |    SELECT s.vec_id, s.j, cb.code,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY (list_dot_product(s.xv, s.xv)
         |          - 2*list_dot_product(s.xv, cb.cv) + cb.cc), cb.code) AS rn
         |    FROM subs s JOIN cb ON s.j = cb.j) x WHERE rn = 1),
         |enccell AS (
         |  SELECT enc.nid, a.cell, enc.j, enc.code
         |  FROM enc JOIN assigned a ON enc.nid = a.vec_id),
         |dtab AS (
         |  SELECT q.vec_id AS qid, q.j, cb.code,
         |    (list_dot_product(q.xv, q.xv)
         |      - 2*list_dot_product(q.xv, cb.cv) + cb.cc) AS dist
         |  FROM subs q JOIN cb ON q.j = cb.j WHERE q.vec_id < 100),
         |pairs AS (
         |  SELECT d.qid, ec.nid,
         |    MAX(CASE WHEN d.j = 0 THEN d.dist END)
         |      + MAX(CASE WHEN d.j = 1 THEN d.dist END)
         |      + MAX(CASE WHEN d.j = 2 THEN d.dist END)
         |      + MAX(CASE WHEN d.j = 3 THEN d.dist END) AS adist
         |  FROM enccell ec
         |    JOIN qprobe p ON ec.cell = p.cell
         |    JOIN dtab d ON d.qid = p.qid AND ec.j = d.j AND ec.code = d.code
         |  WHERE d.qid <> ec.nid
         |  GROUP BY d.qid, ec.nid),
         |ranked AS (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
         |  FROM pairs)
         |SELECT qid, nid, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "ann_ivfpq_trained_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS cid, v AS cvec, nrm AS cn FROM e
         |  WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT e.vec_id, cent.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, cent.cvec)
         |                   / (e.nrm * cent.cn) DESC, cent.cid) AS crn
         |    FROM e CROSS JOIN cent) x WHERE crn = 1),
         |qprobe AS (
         |  SELECT qid, cid AS cell FROM (
         |    SELECT e.vec_id AS qid, cent.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, cent.cvec)
         |                   / (e.nrm * cent.cn) DESC, cent.cid) AS crn
         |    FROM e CROSS JOIN cent WHERE e.vec_id < 100) x
         |  WHERE crn <= 3),
         |subs AS (
         |  SELECT vec_id, CAST(t.j AS INTEGER) AS j,
         |    v[(CAST(t.j AS INTEGER)*16+1):(CAST(t.j AS INTEGER)*16+16)] AS xv
         |  FROM e, (SELECT unnest(range(4)) AS j) t),
         |cb0 AS (
         |  SELECT j, CAST(vec_id AS INTEGER) AS code, xv AS cv,
         |    list_dot_product(xv, xv) AS cc
         |  FROM subs WHERE vec_id < 16),
         |enc0 AS (
         |  SELECT j, code, xv FROM (
         |    SELECT s.j, cb0.code, s.xv,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY (list_dot_product(s.xv, s.xv)
         |          - 2*list_dot_product(s.xv, cb0.cv) + cb0.cc), cb0.code)
         |        AS rn
         |    FROM subs s JOIN cb0 ON s.j = cb0.j) x WHERE rn = 1),
         |cdims AS (
         |  SELECT j, code, CAST(i AS INTEGER) - 1 AS pos,
         |    CAST(xv[CAST(i AS INTEGER)] AS DECIMAL(28,12)) AS xd
         |  FROM enc0, unnest(range(1, len(xv)+1)) AS t(i)),
         |cmeans AS (
         |  SELECT j, code, pos,
         |    CAST(CAST(CAST(SUM(xd) AS DOUBLE) / COUNT(*) AS REAL) AS DOUBLE)
         |      AS mcoord
         |  FROM cdims GROUP BY j, code, pos),
         |next0 AS (
         |  SELECT j, code, list(mcoord ORDER BY pos) AS cv
         |  FROM cmeans GROUP BY j, code),
         |cb AS (
         |  SELECT c.j, c.code, COALESCE(n.cv, c.cv) AS cv,
         |    list_dot_product(COALESCE(n.cv, c.cv), COALESCE(n.cv, c.cv))
         |      AS cc
         |  FROM cb0 c LEFT JOIN next0 n ON c.j = n.j AND c.code = n.code),
         |enc AS (
         |  SELECT vec_id AS nid, j, code FROM (
         |    SELECT s.vec_id, s.j, cb.code,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY (list_dot_product(s.xv, s.xv)
         |          - 2*list_dot_product(s.xv, cb.cv) + cb.cc), cb.code) AS rn
         |    FROM subs s JOIN cb ON s.j = cb.j) x WHERE rn = 1),
         |enccell AS (
         |  SELECT enc.nid, a.cell, enc.j, enc.code
         |  FROM enc JOIN assigned a ON enc.nid = a.vec_id),
         |dtab AS (
         |  SELECT q.vec_id AS qid, q.j, cb.code,
         |    (list_dot_product(q.xv, q.xv)
         |      - 2*list_dot_product(q.xv, cb.cv) + cb.cc) AS dist
         |  FROM subs q JOIN cb ON q.j = cb.j WHERE q.vec_id < 100),
         |pairs AS (
         |  SELECT d.qid, ec.nid,
         |    MAX(CASE WHEN d.j = 0 THEN d.dist END)
         |      + MAX(CASE WHEN d.j = 1 THEN d.dist END)
         |      + MAX(CASE WHEN d.j = 2 THEN d.dist END)
         |      + MAX(CASE WHEN d.j = 3 THEN d.dist END) AS adist
         |  FROM enccell ec
         |    JOIN qprobe p ON ec.cell = p.cell
         |    JOIN dtab d ON d.qid = p.qid AND ec.j = d.j AND ec.code = d.code
         |  WHERE d.qid <> ec.nid
         |  GROUP BY d.qid, ec.nid),
         |ranked AS (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
         |  FROM pairs)
         |SELECT qid, nid, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "emb_quantize_int8" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    CASE WHEN mx = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(v,
        |           x -> CAST(floor(x / mx * 127) AS BIGINT)) END AS q
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |            x -> abs(x))) AS mx
        |        FROM embeddings))
        |SELECT vec_id, list_min(q) AS q_min, list_max(q) AS q_max,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum
        |FROM q ORDER BY vec_id""".stripMargin,
    "emb_gram_matrix" ->
      // the dataflow formulation the kernel replaces: explode to
      // (vec, i, x_i), self-join index pairs i <= j, one aggregate.
      // CAST to DOUBLE before multiplying (float×float fits a double
      // exactly — same product the Scala kernel computes); floor of
      // (product × 1e9) is one deterministic IEEE op on each engine.
      """WITH x AS (
        |  SELECT vec_id, unnest(range(0, len(embedding))) AS i,
        |    embedding FROM embeddings),
        |xv AS (SELECT vec_id, CAST(i AS INTEGER) AS i,
        |         CAST(embedding[i + 1] AS DOUBLE) AS v FROM x),
        |p AS (SELECT a.i AS i, b.i AS j,
        |        SUM(CAST(floor(a.v * b.v * 1000000000.0) AS BIGINT)) AS s
        |      FROM xv a JOIN xv b
        |        ON a.vec_id = b.vec_id AND a.i <= b.i
        |      GROUP BY 1, 2)
        |SELECT i, j, CAST(s AS BIGINT) AS s FROM p ORDER BY i, j""".stripMargin,
    "ann_signbucket_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm,
         |    $sqlBucket AS bucket
         |  FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 100),
         |ranked AS (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, nid, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "ann_ivf_recall" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings),
         |bf0 AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 100),
         |exact AS (SELECT qid, nid FROM (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS r
         |  FROM bf0) x WHERE r <= 5),
         |cent AS (
         |  SELECT vec_id AS cid, v AS cvec, nrm AS cn FROM e
         |  WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, v, nrm, cid AS cell FROM (
         |    SELECT e.vec_id, e.v, e.nrm, cent.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, cent.cvec)
         |                   / (e.nrm * cent.cn) DESC, cent.cid) AS crn
         |    FROM e CROSS JOIN cent) x WHERE crn = 1),
         |iv0 AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM assigned q JOIN assigned c
         |    ON q.cell = c.cell AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 100),
         |approx AS (SELECT qid, nid FROM (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS r
         |  FROM iv0) x WHERE r <= 5)
         |SELECT exact.qid,
         |  CAST(SUM(CASE WHEN approx.nid IS NULL THEN 0 ELSE 1 END)
         |       AS BIGINT) AS n_hit,
         |  CAST(SUM(CASE WHEN approx.nid IS NULL THEN 0 ELSE 1 END)
         |       AS BIGINT) / 5.0 AS recall
         |FROM exact LEFT JOIN approx
         |  ON exact.qid = approx.qid AND exact.nid = approx.nid
         |GROUP BY exact.qid ORDER BY exact.qid""".stripMargin,
    "hybrid_hard_negatives" ->
      s"""WITH dl AS (SELECT doc_id,
         |    len(string_split_regex(trim(text), ' +')) AS dl FROM documents),
         |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |              CAST(SUM(dl) AS DOUBLE) AS s FROM dl),
         |tok AS (SELECT doc_id,
         |    unnest(string_split_regex(trim(text), ' +')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
         |       WHERE term IN ${TextQueries.sqlBm25Terms} GROUP BY 1, 2),
         |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |q(query_id, term) AS (VALUES ${TextQueries.sqlBm25Queries}),
         |cb AS (SELECT q.query_id, tf.doc_id, tf.term,
         |    ((n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         |    * ((CAST(tf AS DOUBLE) * (1.2 + 1.0))
         |       / (CAST(tf AS DOUBLE)
         |          + 1.2 * ((1.0 - 0.75)
         |                   + 0.75 * (CAST(dl AS DOUBLE) / (s / n)))))
         |      AS contrib
         |  FROM q JOIN tf USING (term) JOIN dfq USING (term)
         |       JOIN dl USING (doc_id), st),
         |sc AS (SELECT query_id, doc_id,
         |    list_reduce(list_prepend(0.0, list(contrib ORDER BY term)),
         |                (a, b) -> a + b) AS score
         |  FROM cb GROUP BY 1, 2),
         |lex AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id FROM (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY score DESC, doc_id) AS rnk
         |  FROM sc) x WHERE rnk <= 20),
         |e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings),
         |cos0 AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id IN (1, 2, 3, 4)),
         |sem AS (SELECT query_id, doc_id, rnk AS sem_rank FROM (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, doc_id) AS rnk
         |  FROM cos0) x WHERE rnk <= 20)
         |SELECT s.query_id, s.doc_id, CAST(s.sem_rank AS INTEGER) AS sem_rank
         |FROM sem s
         |WHERE NOT EXISTS (SELECT 1 FROM lex l
         |  WHERE l.query_id = s.query_id AND l.doc_id = s.doc_id)
         |ORDER BY s.query_id, s.sem_rank""".stripMargin,
    "emb_decontaminate" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings)
         |SELECT c.vec_id,
         |  max(list_dot_product(c.v, q.v) / (c.nrm * q.nrm)) AS max_eval_cos,
         |  max(list_dot_product(c.v, q.v) / (c.nrm * q.nrm)) >= 0.45
         |    AS contaminated
         |FROM e c, e q
         |WHERE c.vec_id >= 20 AND q.vec_id < 20
         |GROUP BY c.vec_id
         |ORDER BY c.vec_id""".stripMargin,
    "ann_filtered_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         |    $sqlNorm AS nrm
         |  FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM e q JOIN e c
         |    ON q.label = c.label AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 100),
         |ranked AS (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, nid, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    // mirrors ops/Fusion.rrfTopK over the two rankers: the BM25 CTE
    // chain is TextQueries' text_bm25_topk oracle verbatim (top-20),
    // the cosine chain is ann_bruteforce_topk's (anchors 1..4); the
    // fused score is the same fixed left-to-right
    // 1.0/(60.0 + rank) sum
    "hybrid_rrf_topk" ->
      s"""WITH dl AS (SELECT doc_id,
         |    len(string_split_regex(trim(text), ' +')) AS dl FROM documents),
         |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |              CAST(SUM(dl) AS DOUBLE) AS s FROM dl),
         |tok AS (SELECT doc_id,
         |    unnest(string_split_regex(trim(text), ' +')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
         |       WHERE term IN ${TextQueries.sqlBm25Terms} GROUP BY 1, 2),
         |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |q(query_id, term) AS (VALUES ${TextQueries.sqlBm25Queries}),
         |cb AS (SELECT q.query_id, tf.doc_id, tf.term,
         |    ((n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         |    * ((CAST(tf AS DOUBLE) * (1.2 + 1.0))
         |       / (CAST(tf AS DOUBLE)
         |          + 1.2 * ((1.0 - 0.75)
         |                   + 0.75 * (CAST(dl AS DOUBLE) / (s / n)))))
         |      AS contrib
         |  FROM q JOIN tf USING (term) JOIN dfq USING (term)
         |       JOIN dl USING (doc_id), st),
         |sc AS (SELECT query_id, doc_id,
         |    list_reduce(list_prepend(0.0, list(contrib ORDER BY term)),
         |                (a, b) -> a + b) AS score
         |  FROM cb GROUP BY 1, 2),
         |lex0 AS (SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY score DESC, doc_id) AS rnk
         |  FROM sc),
         |lex AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rnk
         |        FROM lex0 WHERE rnk <= 20),
         |e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, $sqlNorm AS nrm
         |  FROM embeddings),
         |cos0 AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id IN (1, 2, 3, 4)),
         |sem0 AS (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, doc_id) AS rnk
         |  FROM cos0),
         |sem AS (SELECT query_id, doc_id, rnk FROM sem0 WHERE rnk <= 20),
         |f AS (SELECT coalesce(l.query_id, s.query_id) AS query_id,
         |    coalesce(l.doc_id, s.doc_id) AS doc_id,
         |    coalesce(1.0 / (60.0 + CAST(l.rnk AS DOUBLE)), 0.0)
         |      + coalesce(1.0 / (60.0 + CAST(s.rnk AS DOUBLE)), 0.0) AS score
         |  FROM lex l FULL OUTER JOIN sem s
         |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
         |r AS (SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY score DESC, doc_id) AS rnk
         |  FROM f)
         |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, doc_id, score
         |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin
  )
}
