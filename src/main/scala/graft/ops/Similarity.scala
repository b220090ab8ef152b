package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`), SURVEY §7.6.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k, the correctness
  *    baseline. Cost is |Q|×|C|; fine when the query set is bounded.
  *  - [[signBucketTopK]] — LSH by hyperplane-sign bucket (here the
  *    axis-aligned first `bits` dimensions, i.e. fixed hyperplanes —
  *    deterministic and oracle-checkable). Candidates form only
  *    within a bucket: cost |Q|×|C|/2^bits expected. The 100 TB
  *    shape: bucket is a shuffle key, so each bucket's candidates
  *    co-locate on one executor.
  */
object Similarity {

  /** Double dot product of two float-array columns — left-to-right
    * fold, the same IEEE sequence DuckDB's list_dot_product runs.
    * Resolves to the codegen'd native [[graft.functions.DotProduct]]
    * expression (registered by GraftExtensions — all engine sessions
    * enable it). */
  def dot(x: Column, y: Column): Column = call_function("dot_product", x, y)

  /** Reference implementation via higher-order functions — same
    * values as [[dot]] (kept for cross-checking the native kernel). */
  def dotHof(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(x: Column): Column = sqrt(dot(x, x))

  /** Cosine similarity, computed in double as
    * dot/(sqrt(na)*sqrt(nb)) — mirrored exactly in oracle SQL via
    * list_dot_product, so both engines run the same IEEE sequence. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max|x|, code_i = floor(x_i / scale * 127) ∈ [-128, 127].
    * The 4× (fp32) / 8× (fp64) shrink is what makes billion-vector
    * ANN serving fit in memory; at 100 TB this is a narrow
    * projection — no shuffle, fused into the scan stage. All-zero
    * vectors quantize to zeros (scale guard). floor (not round) keeps
    * the arithmetic IEEE-exact and engine-independent. */
  def quantizeInt8(vec: Column): Column = {
    val scale = aggregate(transform(vec, x => abs(x.cast("double"))),
      lit(0.0), (a, x) => greatest(a, x))
    // bind the scale fold ONCE per row (Exprs.bind rationale):
    // inlined, the O(d) max-abs fold re-runs at every one of the 2·d
    // per-element references — measured ~5× on this kernel
    graft.functions.Exprs.bind(scale)(s =>
      transform(vec, x =>
        when(s === 0.0, 0L)
          .otherwise(floor(x.cast("double") / s * 127).cast("long"))))
  }

  /** Exact top-k neighbors per query (cosine), self-pairs excluded.
    * Norms are precomputed per side BEFORE the join — |Q|+|C| norm
    * evaluations instead of |Q|×|C|, identical values. Selection is
    * the bounded-heap `topk_pairs` aggregate, not a window: a
    * per-query window partition holds the query's ENTIRE candidate
    * set (here the corpus — the worst case of the whole ANN family),
    * while the heap ships at most k (cos, id) pairs per query per
    * task into the exchange. Ties break by id inside the aggregate —
    * the identical (cos desc, nid asc) rank contract. */
  def bruteForceTopK(corpus: DataFrame, vecCol: String, idCol: String,
                     queryPred: Column, k: Int): DataFrame = {
    val q = corpus.filter(queryPred).select(col(idCol).as("qid"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("nid"),
      col(vecCol).as("nv"), norm(col(vecCol)).as("nn"))
    topKByScore(
      q.crossJoin(c).filter(col("qid") =!= col("nid"))
        .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn"))),
      col("cos"), k)
  }


  /** Attribute-filtered exact top-k (cosine): neighbors must share
    * the query's value in `attrCol` — the "filtered vector search"
    * serving shape (tenant isolation, same-language neighbors,
    * same-label hard negatives). The filter is not a post-filter on
    * a wider top-k (which can return < k survivors) and not a
    * per-query scan predicate: it becomes the JOIN KEY, so the
    * all-pairs cross join collapses to an equi-join on the attribute
    * — Σ|class|² candidate pairs instead of corpus², the same
    * reduction the sign-bucket/IVF paths get from their synthetic
    * keys, here for free from real metadata. Selection through the
    * bounded-heap `topk_pairs` as everywhere in the family. */
  def filteredTopK(corpus: DataFrame, vecCol: String, idCol: String,
                   attrCol: String, queryPred: Column, k: Int): DataFrame = {
    val q = corpus.filter(queryPred).select(col(idCol).as("qid"),
      col(attrCol).as("__qa"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("nid"),
      col(attrCol).as("__na"), col(vecCol).as("nv"),
      norm(col(vecCol)).as("nn"))
    topKByScore(
      q.join(c, col("__qa") === col("__na") && col("qid") =!= col("nid"))
        .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn"))),
      col("cos"), k)
  }

  /** Semantic decontamination — the embedding twin of
    * [[Dedup.contamination]]'s n-gram overlap: flag corpus vectors
    * whose max cosine against ANY eval-set vector reaches `tau`
    * (paraphrased eval leakage that shares no shingle). The eval set
    * is small by definition → broadcast; cost is one scan at
    * |eval|·d flops per row, no corpus shuffle. `max` (unlike a
    * double sum) is shuffle-order-independent, so the score is exact
    * cross-engine. Returns every non-eval row with its max eval
    * cosine and the ≥-tau flag — the filter AND the audit trail. */
  def semanticContamination(corpus: DataFrame, vecCol: String,
      idCol: String, evalPred: Column, tau: Double): DataFrame =
    semanticContaminationAgainst(corpus.filter(!evalPred),
      corpus.filter(evalPred), vecCol, idCol, tau)

  /** Two-frame form: score `corpus` against a separate eval-vector
    * frame (the curation-stage shape — eval set ships as its own
    * parquet). Same plan: eval broadcasts, one corpus scan. */
  def semanticContaminationAgainst(corpus: DataFrame, evalVecs: DataFrame,
      vecCol: String, idCol: String, tau: Double): DataFrame = {
    val ev = evalVecs.select(col(vecCol).as("__ev"))
      .select(col("__ev"), norm(col("__ev")).as("__en"))
    corpus
      .select(col(idCol), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"))
      .crossJoin(broadcast(ev))
      .groupBy(col(idCol))
      .agg(max(dot(col("__cv"), col("__ev")) / (col("__cn") * col("__en")))
        .as("max_eval_cos"))
      .withColumn("contaminated", col("max_eval_cos") >= lit(tau))
  }

  /** Recall@k of an approximate ANN result against exact ground
    * truth — the quality meter every approximate index needs before
    * its recall dial (nProbe, bits, codebook size) can be tuned on
    * real data instead of faith. Both inputs are (qid, nid[, rank])
    * top-k frames, already O(queries·k): the join and aggregate
    * never see the corpus, so the meter is free to run continuously
    * against a sampled query set at any scale. Integer hit counts ⇒
    * cross-engine exact; recall = n_hit/k exact below 2^53. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"recallAtK: k must be positive, got $k")
    exact.select(col("qid"), col("nid"))
      .join(approx.select(col("qid"), col("nid"))
        .withColumn("__hit", lit(1)), Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg(sum(coalesce(col("__hit"), lit(0))).as("n_hit"))
      .withColumn("recall", col("n_hit") / lit(k.toDouble))
  }

  /** Shared top-k selection for the ANN family: candidates
    * `(qid, nid, score)` reduce through the bounded-heap
    * `topk_pairs` aggregate to `(qid, nid, rank)` with the
    * `(score DESC, nid ASC)` rank contract. A per-qid window sort
    * would colocate each query's whole candidate set in one task
    * (the brute-force case sorts |corpus| rows per query); the heap
    * participates in map-side partial aggregation, so the exchange
    * carries at most k pairs per query per task. For ascending
    * orders (ADC distances) pass the negated score. */
  private[ops] def topKByScore(cand: DataFrame, score: Column,
      k: Int): DataFrame = {
    graft.GraftExtensions.ensure(cand.sparkSession)
    cand
      .groupBy(col("qid"))
      .agg(call_function("topk_pairs", score,
        col("nid").cast("long"), lit(k)).as("__tk"))
      .select(col("qid"), posexplode(col("__tk")))
      .select(col("qid"), col("col.id").as("nid"),
        (col("pos") + 1).as("rank"))
  }

  /** Lloyd k-means refinement of IVF centroids — the distributed
    * "training" loop that upgrades [[ivfTopK]]'s deterministic seed
    * centroids. Per round: (1) assign every vector to its max-cosine
    * centroid (broadcast centroids, one hash-agg argmax — the same
    * assignment plan as ivfTopK), (2) recompute each cell's centroid
    * as the element-wise mean of its members.
    *
    * Determinism: element sums aggregate in DECIMAL(28,12) — double
    * summation is shuffle-order-dependent, so decimal exactness is
    * what makes refined centroids identical across partitionings and
    * cluster sizes (the same discipline as the engine's money
    * aggregates), and what lets a DuckDB oracle hash-match the
    * result. The mean's single double division afterward is
    * IEEE-identical everywhere. Empty cells keep their previous
    * centroid.
    *
    * Cost per round: |C|·nCells narrow flops, one posexplode to
    * (cell, dim) pairs, one hash agg on (cell, dim) — linear in the
    * corpus, no quadratic term. Spherical-k-means objective (sum of
    * member-to-centroid cosines) is non-decreasing per round.
    *
    * The result (`rounds` ≥ 1) is backed by a localCheckpoint: after
    * persisting it (or handing it to a serving call for the last
    * time), call [[CheckpointRelease.release]] on the returned frame
    * to free its blocks; superseded rounds are released internally.
    * `rounds = 0` returns the un-checkpointed seed.
    *
    * @return refined centroid frame (cid, cvec) — drop-in for the
    *         seed frame shape ivfTopK builds internally
    */
  def kmeansRefine(corpus: DataFrame, vecCol: String, idCol: String,
      nCells: Int = 16, rounds: Int = 1): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val seed = corpus.filter(col(idCol) < nCells)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec"))
    var cents = seed
    // each round's eager localCheckpoint CONSUMES the previous
    // round's — release the superseded blocks as we go instead of
    // pinning every round's centroids for the session lifetime
    var prevCp: DataFrame = null
    for (_ <- 0 until rounds) {
      val withNorm = cents.select(col("cid"), col("cvec"),
        norm(col("cvec")).as("cn"))
      val base = corpus.select(col(idCol), col(vecCol),
        norm(col(vecCol)).as("nrm"))
      val assigned = base.crossJoin(broadcast(withNorm))
        .withColumn("ccos",
          dot(col(vecCol), col("cvec")) / (col("nrm") * col("cn")))
        .groupBy(col(idCol))
        .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"),
          col(vecCol).as("v"))).as("best"))
        .select((-col("best.ncid")).as("cell"), col("best.v").as("v"))
      val means = assigned
        .select(col("cell"), posexplode(col("v")))
        .select(col("cell"), col("pos"),
          col("col").cast("double").cast(DecimalType(28, 12)).as("xd"))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("xd")).as("sx"), count(lit(1)).as("n"))
        .select(col("cell"), col("pos"),
          (col("sx").cast("double") / col("n")).cast("float").as("m"))
      val rebuilt = means.groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("next"))
        .select(col("cell").as("cid"), col("next"))
      cents = cents.select(col("cid"), col("cvec").as("prev"))
        .join(rebuilt, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("next"), col("prev")).as("cvec"))
        .localCheckpoint()
      if (prevCp ne null) CheckpointRelease.release(prevCp)
      prevCp = cents
    }
    // ≤ nCells rows by construction (one per seed cid), but the
    // checkpoint erased that from the plan (LogicalRDD) — the no-op
    // limit restores a STRUCTURAL bound, so downstream broadcast()
    // over trained centroids stays provably cardinality-bounded
    // (PlanShapeSpec's suite-wide hint audit)
    cents.limit(nCells)
  }

  /** Nearest-centroid cell assignment — the shared first stage of
    * IVF search ([[ivfTopK]], [[ivfTopKMultiProbe]]) and cell-
    * bucketed semantic dedup (Dedup.embeddingCellPairs). Centroids
    * are the first `nCells` corpus vectors — deterministic (oracle-
    * checkable); swap in [[kmeansRefine]] output for trained cells
    * without changing the plan shape.
    *
    * Argmax cosine, ties to lowest cid — as ONE hash aggregate (max
    * over a (ccos, -cid, payload) struct), not a window: map-side
    * partial agg, no |C|×nCells shuffle sort. Struct comparison is
    * lexicographic, and (ccos, -cid) is unique per (id, cid), so the
    * payload fields never decide the max.
    *
    * @return (idCol, vecCol, nrm, cell)
    */
  /** (cid, cvec, cn): deterministic seed centroids with precomputed
    * norms — one construction shared by [[cellAssign]] and the
    * multi-probe query ranking (they must agree on the cell space). */
  private def centroidFrame(corpus: DataFrame, vecCol: String,
      idCol: String, nCells: Int): DataFrame =
    corpus.filter(col(idCol) < nCells)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        norm(col(vecCol)).as("cn"))

  /** Resolve the cell space: a TRAINED centroid frame (cid, cvec) —
    * e.g. [[kmeansRefine]] output — when provided (norms recomputed
    * here so the caller need not carry them), else the deterministic
    * first-nCells seed. Every IVF entry point takes this, which is
    * what makes the kmeansRefine "drop-in" claim real.
    *
    * Contract: the cell space is AT MOST `nCells` centroids — the
    * limit enforces it structurally, so (a) the broadcast over the
    * centroid frame stays provably bounded for ANY caller frame and
    * (b) `nProbe = nCells` provably probes every cell (the
    * degenerate brute-force bound the specs pin). Pass a frame of
    * AT MOST nCells rows (`kmeansRefine(nCells = n)` produces one);
    * an oversized frame FAILS LOUDLY — truncating it would pick an
    * arbitrary plan-dependent subset, and the entry points that
    * resolve twice (qprobe + cellAssign) could truncate a
    * non-materialized frame to two DIFFERENT subsets, silently
    * missing neighbors. The guard count is driver-side on a
    * centroid-sized frame (kmeansRefine output is checkpointed), so
    * it is cheap. */
  /** True when `df`'s analyzed plan carries a LIMIT ≤ `bound` at the
    * top (possibly under projections) — the shape [[kmeansRefine]] /
    * [[trainPqCodebook]] return. Such a frame is PROVABLY within the
    * cardinality contract, so the defensive validation count() —
    * a whole driver action (plan + schedule, ~100-300 ms at gate
    * scale, one more job on a cluster) per serving call — is skipped
    * (r15). Frames without the structural bound (e.g. parquet
    * round-trips) still pay the count and fail loudly when oversized. */
  private def provablyAtMost(df: DataFrame, bound: Long): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.IntegerLiteral
    import org.apache.spark.sql.catalyst.plans.logical._
    def walk(p: LogicalPlan): Boolean = p match {
      case GlobalLimit(IntegerLiteral(v), _) => v <= bound
      case Project(_, child) => walk(child)
      case SubqueryAlias(_, child) => walk(child)
      case _ => false
    }
    walk(df.queryExecution.analyzed)
  }

  private def resolveCentroids(corpus: DataFrame, vecCol: String,
      idCol: String, nCells: Int, trained: Option[DataFrame]): DataFrame =
    trained.map { t =>
      val sel = t.select(col("cid"), col("cvec"),
        norm(col("cvec")).as("cn"))
      if (!provablyAtMost(t, nCells)) {
        val n = sel.count()
        require(n <= nCells,
          s"trained centroid frame has $n rows but nCells=$nCells — " +
            "refusing to truncate to an arbitrary subset; pass " +
            s"kmeansRefine(nCells = $nCells) output or raise nCells")
      }
      // no-op at runtime (n ≤ nCells verified or proved) but restores
      // the STRUCTURAL cardinality bound after plan nodes that erase
      // it, keeping every broadcast over centroids provably bounded
      // (PlanShapeSpec's suite-wide hint audit)
      sel.limit(nCells)
    }.getOrElse(centroidFrame(corpus, vecCol, idCol, nCells))

  def cellAssign(corpus: DataFrame, vecCol: String, idCol: String,
      nCells: Int, centroids: Option[DataFrame] = None): DataFrame =
    cellAssignWith(corpus, vecCol, idCol,
      resolveCentroids(corpus, vecCol, idCol, nCells, centroids))

  /** [[cellAssign]] against an ALREADY-RESOLVED centroid frame —
    * entry points that need the centroids for their own query-side
    * ranking (multi-probe, IVF-PQ) resolve ONCE and share the frame,
    * instead of paying [[resolveCentroids]]'s trained-path validation
    * count() a second time per serving call. */
  private def cellAssignWith(corpus: DataFrame, vecCol: String,
      idCol: String, cents: DataFrame): DataFrame = {
    corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos",
        dot(col(vecCol), col("cvec")) / (col("nrm") * col("cn")))
      .groupBy(col(idCol))
      .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"),
        col(vecCol).as("v"), col("nrm").as("n"))).as("best"))
      .select(col(idCol), col("best.v").as(vecCol), col("best.n").as("nrm"),
        (-col("best.ncid")).as("cell"))
  }

  /** Cluster-balanced corpus sampling: keep at most `cap` vectors
    * per embedding cluster (nearest-centroid cell), chosen in
    * deterministic hash order — the embedding-space analogue of the
    * per-domain document cap (pipe_domain_cap). Web corpora are
    * wildly imbalanced in CONTENT space too (one template family can
    * be 30% of a crawl while sharing no domain); capping per learned
    * cluster flattens that before training sampling, which is the
    * SemDeDup/DBSCAN-prune family's cheap cousin: no pair
    * computation at all, just assignment + a per-cell rank.
    *
    * Plan: [[cellAssign]]'s one aggregate, then
    * [[CappedSample.perKeyCap]] — a plain per-cell window rank would
    * colocate the mega-cluster (the exact case the cap exists for)
    * in ONE task, since window partitions cannot split; the
    * capped-sample form bounds every stage by `cap` and is
    * row-identical to the rank. md5-derived hash order makes the
    * kept set identical across engines, runs, and partitionings.
    *
    * @return (idCol, cell) — the kept sample
    */
  def clusterBalancedSample(corpus: DataFrame, vecCol: String,
      idCol: String, nCells: Int, cap: Int,
      centroids: Option[DataFrame] = None): DataFrame =
    CappedSample.perKeyCap(
      cellAssign(corpus, vecCol, idCol, nCells, centroids)
        .select(col(idCol), col("cell")),
      Seq("cell"),
      graft.functions.TextFunctions.hashBucket(col(idCol), 1000000),
      col(idCol), cap)

  /** IVF (inverted-file) top-k: vectors are assigned to the cell of
    * their nearest centroid ([[cellAssign]]), and search probes only
    * the query's cell. The probe is an equi-join on cell — the same
    * shuffle-key shape as [[signBucketTopK]], so it scales the same
    * way.
    */
  def ivfTopK(corpus: DataFrame, vecCol: String, idCol: String,
      queryPred: Column, k: Int, nCells: Int = 16,
      centroids: Option[DataFrame] = None): DataFrame = {
    val assigned = cellAssign(corpus, vecCol, idCol, nCells, centroids)
    val q = assigned.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        col("nrm").as("qn"), col("cell"))
    val c = assigned
      .select(col(idCol).as("nid"), col(vecCol).as("nv"),
        col("nrm").as("nn"), col("cell"))
    topKByScore(
      q.join(c, Seq("cell")).filter(col("qid") =!= col("nid"))
        .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn"))),
      col("cos"), k)
  }

  /** Multi-probe IVF top-k: corpus vectors live in ONE cell (their
    * nearest centroid, as [[ivfTopK]]); each QUERY probes its
    * `nProbe` closest cells. Recall rises toward brute-force as
    * nProbe grows while the plan stays an equi-join on cell — probe
    * fan-out multiplies only the query side (|Q|×nProbe rows), never
    * the corpus. This is the standard recall/cost dial of IVF
    * indexes (FAISS nprobe), expressed as a join-key expansion.
    */
  def ivfTopKMultiProbe(corpus: DataFrame, vecCol: String, idCol: String,
      queryPred: Column, k: Int, nCells: Int = 16, nProbe: Int = 2,
      centroids: Option[DataFrame] = None): DataFrame = {
    val cents = resolveCentroids(corpus, vecCol, idCol, nCells, centroids)
    // corpus assignment: one cell per vector (shares the resolved
    // centroid frame — one validation, one construction)
    val assigned = cellAssignWith(corpus, vecCol, idCol, cents)
    // query probe list: nProbe nearest cells per query. The window
    // ranks |Q|×nCells rows — bounded by the query set, not the
    // corpus.
    val qprobe = corpus.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos",
        dot(col("qv"), col("cvec")) / (col("qn") * col("cn")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid"))))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("qv"), col("qn"), col("cid").as("cell"))
    val c = assigned.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      col("nrm").as("nn"), col("cell"))
    // a neighbor lives in exactly one cell, so probing distinct cells
    // can't duplicate (qid, nid) pairs — no dedup needed before rank
    topKByScore(
      qprobe.join(c, Seq("cell")).filter(col("qid") =!= col("nid"))
        .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn"))),
      col("cos"), k)
  }

  /** Product-quantization codebook + encoder. The vector space is
    * split into `m` contiguous subspaces of d/m dims; each subspace
    * gets `k` centroids (deterministically seeded from the first `k`
    * corpus vectors' subvectors — swap in [[kmeansRefine]] output per
    * subspace for trained codebooks; the plan shape is unchanged).
    * A vector's code word is the argmin-L2 centroid per subspace:
    * m small integers replace d floats — the 16-32× shrink that lets
    * billion-vector indexes live in executor memory. Encoding cost is
    * |C|·m·k narrow rows (codebook broadcast, argmin as ONE hash
    * aggregate — map-side partial, no shuffle sort).
    *
    * L2² is computed as xx − 2·xy + yy with per-side norms
    * precomputed BEFORE the join — |C|·m + m·k dot products instead
    * of |C|·m·k, and the exact IEEE sequence DuckDB reproduces.
    * Ties go to the lowest code (min over a (dist, code) struct).
    *
    * @return (id, j, code) — one row per vector per subspace
    */
  /** (id, j, xv, xx): every vector split into its m subvectors, with
    * the per-subvector self-dot precomputed. Shared by the PQ encoder,
    * the codebook, and the ADC distance tables. */
  private def pqSubvectors(df: DataFrame, vecCol: String, idCol: String,
      dims: Int, m: Int): DataFrame = {
    val subLen = dims / m
    require(subLen * m == dims, s"m=$m must divide dims=$dims")
    df.select(col(idCol), posexplode(
        array((0 until m).map(j =>
          slice(col(vecCol), j * subLen + 1, subLen)): _*)))
      .select(col(idCol), col("pos").as("j"), col("col").as("xv"),
        dot(col("col"), col("col")).as("xx"))
  }

  /** PQ codebook (j, code, cv, cc): per-subspace centroids seeded
    * from the first k corpus vectors. One construction shared by
    * [[pqEncode]] and [[pqTopK]] — the encoder and the ADC distance
    * table must never drift onto different codebooks. */
  private def pqCodebook(corpus: DataFrame, vecCol: String, idCol: String,
      dims: Int, m: Int, k: Int): DataFrame =
    pqSubvectors(corpus.filter(col(idCol) < k), vecCol, idCol, dims, m)
      .select(col("j"), col(idCol).cast("int").as("code"),
        col("xv").as("cv"), col("xx").as("cc"))

  /** Train a PQ codebook: per-subspace Lloyd refinement of the
    * deterministic seed ([[pqCodebook]]), exactly the spherical
    * k-means recipe of [[kmeansRefine]] applied independently to each
    * of the m subspaces — assignment is argmin-L2 to the current
    * centroids, the new centroid is the coordinate mean of its
    * members (fixed-scale decimal sums, so the result is
    * partitioning-invariant), and a code that loses all members keeps
    * its previous centroid. `rounds = 0` returns the seed codebook
    * bit-for-bit — the degenerate case the trained≡inline spec pins.
    *
    * Lifecycle: train once, persist the returned (j, code, cv) frame
    * (plain parquet round-trips it), and pass it to
    * [[pqEncode]]/[[pqTopK]]/[[ivfPqTopK]] as `codebook` — serving
    * never re-trains. The result (`rounds` ≥ 1) is backed by a
    * localCheckpoint: after persisting it, call
    * [[CheckpointRelease.release]] on the returned frame to free its
    * executor-storage blocks (superseded intermediate rounds are
    * released internally as training progresses; `rounds = 0`
    * returns the un-checkpointed seed — nothing to release).
    *
    * Cost per round: |C|·m·k narrow rows for the assignment
    * (codebook broadcast, argmin as one hash agg) + one
    * (j, code, pos) mean agg — linear in the corpus.
    *
    * @return (j, code, cv) — m·k rows, structurally bounded
    */
  def trainPqCodebook(corpus: DataFrame, vecCol: String, idCol: String,
      dims: Int, m: Int = 4, k: Int = 16, rounds: Int = 1): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val subs = pqSubvectors(corpus, vecCol, idCol, dims, m)
    var cb = pqCodebook(corpus, vecCol, idCol, dims, m, k)
      .select(col("j"), col("code"), col("cv"))
    // see kmeansRefine: superseded rounds' checkpoint blocks are
    // released as soon as the next round's checkpoint materializes
    var prevCp: DataFrame = null
    for (_ <- 0 until rounds) {
      val withCc = cb.withColumn("cc", dot(col("cv"), col("cv")))
      // (dist, code) is unique per (id, j, candidate), so the xv
      // payload never decides the min — same struct-argmin trick as
      // cellAssign
      val assigned = subs.join(broadcast(withCc), Seq("j"))
        .withColumn("dist",
          col("xx") - lit(2.0) * dot(col("xv"), col("cv")) + col("cc"))
        .groupBy(col(idCol), col("j"))
        .agg(min(struct(col("dist"), col("code"), col("xv").as("v")))
          .as("best"))
        .select(col("j"), col("best.code").as("code"), col("best.v").as("v"))
      val means = assigned
        .select(col("j"), col("code"), posexplode(col("v")))
        .select(col("j"), col("code"), col("pos"),
          col("col").cast("double").cast(DecimalType(28, 12)).as("xd"))
        .groupBy(col("j"), col("code"), col("pos"))
        .agg(sum(col("xd")).as("sx"), count(lit(1)).as("n"))
        .select(col("j"), col("code"), col("pos"),
          (col("sx").cast("double") / col("n")).cast("float").as("mcoord"))
      val rebuilt = means.groupBy(col("j"), col("code"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mcoord")))),
          s => s.getField("mcoord")).as("next"))
      cb = cb.select(col("j"), col("code"), col("cv").as("prev"))
        .join(rebuilt, Seq("j", "code"), "left")
        .select(col("j"), col("code"),
          coalesce(col("next"), col("prev")).as("cv"))
        .localCheckpoint()
      if (prevCp ne null) CheckpointRelease.release(prevCp)
      prevCp = cb
    }
    // structural m·k bound (the checkpoint erased it) — downstream
    // broadcast(codebook) stays provably cardinality-bounded
    cb.limit(m * k)
  }

  /** Resolve the codebook: a TRAINED (j, code, cv) frame — e.g.
    * [[trainPqCodebook]] output, possibly parquet-round-tripped —
    * when provided (cc recomputed here), else the deterministic
    * first-k seed. Same contract as [[resolveCentroids]]: an
    * oversized frame fails loudly instead of being truncated to an
    * arbitrary subset (pqTopK/ivfPqTopK resolve once but the encoder
    * and distance table both consume the result — they must see the
    * SAME codebook). */
  private def resolvePqCodebook(corpus: DataFrame, vecCol: String,
      idCol: String, dims: Int, m: Int, k: Int,
      trained: Option[DataFrame]): DataFrame =
    trained.map { t =>
      val sel = t.select(col("j"), col("code"), col("cv").as("cv"),
        dot(col("cv"), col("cv")).as("cc"))
      // structural-limit frames (trainPqCodebook output) skip the
      // validation action — see provablyAtMost
      if (!provablyAtMost(t, m.toLong * k)) {
        val n = sel.count()
        require(n <= m.toLong * k,
          s"trained PQ codebook has $n rows but m*k=${m * k} — " +
            "refusing to truncate to an arbitrary subset; pass " +
            s"trainPqCodebook(m = $m, k = $k) output or raise m/k")
      }
      sel.limit(m * k)
    }.getOrElse(pqCodebook(corpus, vecCol, idCol, dims, m, k))

  private def pqEncodeWith(subs: DataFrame, codebook: DataFrame,
      idCol: String): DataFrame =
    subs.join(broadcast(codebook), Seq("j"))
      .withColumn("dist",
        col("xx") - lit(2.0) * dot(col("xv"), col("cv")) + col("cc"))
      .groupBy(col(idCol), col("j"))
      .agg(min(struct(col("dist"), col("code"))).as("best"))
      .select(col(idCol), col("j"), col("best.code").as("code"))

  def pqEncode(corpus: DataFrame, vecCol: String, idCol: String,
      dims: Int, m: Int = 4, k: Int = 16,
      codebook: Option[DataFrame] = None): DataFrame =
    pqEncodeWith(pqSubvectors(corpus, vecCol, idCol, dims, m),
      resolvePqCodebook(corpus, vecCol, idCol, dims, m, k, codebook), idCol)

  /** PQ top-k via asymmetric distance computation (ADC): queries stay
    * exact; candidates are scored from their code words through a
    * per-query distance table (table entry (j,c) = L2² of the query's
    * j-th subvector to centroid c). Approximate distance = Σ_j
    * table[j][code_j] — m table lookups per candidate instead of d
    * multiplies, ON TOP of the 16-32× smaller candidate payload:
    * the scan side of this join moves (id, m codes), never vectors.
    * That memory shape — not flop count — is why IVF-PQ is the
    * standard billion-vector layout (FAISS); compose with [[ivfTopK]]
    * cells to also cut the candidate count.
    *
    * The per-pair sum folds in FIXED j order (d0+d1+…, built at plan
    * time) — a conditional-sum pivot, so the double addition sequence
    * is engine- and partitioning-independent (a plain sum(dist) would
    * add in shuffle order and break determinism).
    *
    * @return (qid, nid, rank) — rank by approx distance asc, ties to
    *         lowest nid; self-pairs excluded
    */
  def pqTopK(corpus: DataFrame, vecCol: String, idCol: String,
      queryPred: Column, topK: Int, dims: Int, m: Int = 4,
      k: Int = 16, trainedCodebook: Option[DataFrame] = None): DataFrame = {
    val codebook =
      resolvePqCodebook(corpus, vecCol, idCol, dims, m, k, trainedCodebook)
    val codes = pqEncodeWith(
        pqSubvectors(corpus, vecCol, idCol, dims, m), codebook, idCol)
      .select(col(idCol).as("nid"), col("j"), col("code"))
    // per-query distance table: |Q|·m·k rows, built once per query
    val dtab = pqSubvectors(corpus.filter(queryPred), vecCol, idCol, dims, m)
      .withColumnRenamed(idCol, "qid")
      .join(broadcast(codebook), Seq("j"))
      .select(col("qid"), col("j"), col("code"),
        (col("xx") - lit(2.0) * dot(col("xv"), col("cv")) + col("cc"))
          .as("dist"))
    // ADC: code-word lookup join, then the fixed-order distance fold
    val perJ = (0 until m).map(j =>
      max(when(col("j") === j, col("dist"))).as(s"d$j"))
    // dtab is |Q|·m·k rows (query-bounded) → broadcast; the
    // alternative shuffle would hash |C|·m rows onto only m·k
    // distinct (j, code) keys — a guaranteed skew at scale
    val summed = codes.join(broadcast(dtab), Seq("j", "code"))
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(perJ.head, perJ.tail: _*)
      .select(col("qid"), col("nid"),
        (0 until m).map(j => col(s"d$j")).reduce(_ + _).as("adist"))
    // ascending ADC distance == descending negated distance; double
    // negation is exact, so the (adist ASC, nid ASC) contract holds
    topKByScore(summed, -col("adist"), topK)
  }

  /** IVF-pruned PQ top-k — the billion-vector serving layout (FAISS
    * IVF-PQ, composed per the r5 plan audit): IVF cell pruning cuts
    * the CANDIDATE COUNT (each query probes only its `nProbe`
    * nearest cells, vs [[pqTopK]]'s full-corpus ADC scan) while PQ
    * ADC cuts the CANDIDATE PAYLOAD (m code bytes, never vectors).
    *
    * Plan shape: the corpus-side pass computes each vector's cell
    * AND its code words together, so `cell` travels WITH the codes —
    * no corpus-sized glue join. The per-query distance table is
    * replicated onto the query's probe cells (|Q|·nProbe·m·k rows,
    * query-bounded) and broadcast; joining on (cell, j, code) fuses
    * the IVF pruning INTO the ADC lookup join — one broadcast hash
    * join whose probe side streams the corpus codes exactly once.
    * At 100 TB: corpus never shuffles on a skewed (j, code) key, and
    * ADC work scales with Σ|probed cell| instead of |Q|×|C|.
    *
    * @return (qid, nid, rank) — rank by approx distance asc, ties to
    *         lowest nid; self-pairs excluded
    */
  def ivfPqTopK(corpus: DataFrame, vecCol: String, idCol: String,
      queryPred: Column, topK: Int, dims: Int, m: Int = 4, k: Int = 16,
      nCells: Int = 16, nProbe: Int = 2,
      centroids: Option[DataFrame] = None,
      codebook: Option[DataFrame] = None): DataFrame = {
    val subLen = dims / m
    require(subLen * m == dims, s"m=$m must divide dims=$dims")
    val cb = resolvePqCodebook(corpus, vecCol, idCol, dims, m, k, codebook)
    val cents = resolveCentroids(corpus, vecCol, idCol, nCells, centroids)
    val assigned = cellAssignWith(corpus, vecCol, idCol, cents)
    val subs = assigned.select(col(idCol), col("cell"), posexplode(
        array((0 until m).map(j =>
          slice(col(vecCol), j * subLen + 1, subLen)): _*)))
      .select(col(idCol), col("cell"), col("pos").as("j"),
        col("col").as("xv"), dot(col("col"), col("col")).as("xx"))
    val cellCodes = subs.join(broadcast(cb), Seq("j"))
      .withColumn("dist",
        col("xx") - lit(2.0) * dot(col("xv"), col("cv")) + col("cc"))
      .groupBy(col(idCol), col("cell"), col("j"))
      .agg(min(struct(col("dist"), col("code"))).as("best"))
      .select(col(idCol).as("nid"), col("cell"), col("j"),
        col("best.code").as("code"))
    // probe list: nProbe nearest cells per query — |Q|×nCells rows,
    // bounded by the query set, never the corpus
    val qprobe = corpus.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos",
        dot(col("qv"), col("cvec")) / (col("qn") * col("cn")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid"))))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("cid").as("cell"))
    val dtab = pqSubvectors(corpus.filter(queryPred), vecCol, idCol, dims, m)
      .withColumnRenamed(idCol, "qid")
      .join(broadcast(cb), Seq("j"))
      .select(col("qid"), col("j"), col("code"),
        (col("xx") - lit(2.0) * dot(col("xv"), col("cv")) + col("cc"))
          .as("dist"))
    val dtabCells = dtab.join(qprobe, Seq("qid"))
    val perJ = (0 until m).map(j =>
      max(when(col("j") === j, col("dist"))).as(s"d$j"))
    // a neighbor lives in exactly one cell and qprobe's (qid, cell)
    // pairs are distinct, so the (cell, j, code) join cannot
    // duplicate a (qid, nid, j) contribution
    val summed = cellCodes.join(broadcast(dtabCells), Seq("cell", "j", "code"))
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(perJ.head, perJ.tail: _*)
      .select(col("qid"), col("nid"),
        (0 until m).map(j => col(s"d$j")).reduce(_ + _).as("adist"))
    topKByScore(summed, -col("adist"), topK)
  }

  /** Sign bucket over the first `bits` dimensions: bit i set iff
    * vec[i] > 0. Fixed axis-aligned hyperplanes — deterministic in
    * any engine (random-rotation planes would improve recall but
    * can't be oracle-checked). */
  def signBucket(vec: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      when(element_at(vec, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH top-k: candidates restricted to the query's sign bucket.
    * Equi-join on the bucket id — a hash join, NOT a cross join, so
    * the candidate space shrinks 2^bits-fold. */
  def signBucketTopK(corpus: DataFrame, vecCol: String, idCol: String,
                     queryPred: Column, k: Int, bits: Int = 8): DataFrame = {
    val bucketed = corpus.select(col(idCol), col(vecCol),
      signBucket(col(vecCol), bits).as("bucket"), norm(col(vecCol)).as("nrm"))
    val q = bucketed.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), col("bucket"),
        col("nrm").as("qn"))
    val c = bucketed
      .select(col(idCol).as("nid"), col(vecCol).as("nv"), col("bucket"),
        col("nrm").as("nn"))
    topKByScore(
      q.join(c, Seq("bucket")).filter(col("qid") =!= col("nid"))
        .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn"))),
      col("cos"), k)
  }

  /** Upper-triangular Gram/covariance matrix Σxᵢxⱼ over the corpus,
    * in exact int64 fixed-point: each per-vector product contributes
    * floor(xᵢ·xⱼ·scale) and LONG sums are commutative, so the result
    * is bit-identical under ANY partitioning — unlike a double sum,
    * whose value depends on reduction order. (The products
    * themselves are exact: float×float fits a double.) This is the
    * input to PCA whitening / low-rank projection of the embedding
    * space.
    *
    * Scale shape — the one place the engine drops to mapPartitions,
    * and the canonical justification for it (Spark MLlib's Gramian
    * runs the same way): the dataflow formulation explodes every
    * vector into d(d+1)/2 index-pair rows and shuffles n·d²/2 rows
    * (the DuckDB oracle states exactly that); the kernel instead
    * folds each PARTITION into one fixed d(d+1)/2-long accumulator —
    * per-partition imperative numeric accumulation over a
    * fixed-size buffer, which no declarative operator expresses —
    * and ships partitions × 16 KB to the reduce. The driver sees
    * d²/2 longs, never data.
    *
    * Capacity bound: a cell accumulates up to ~|xᵢ||xⱼ|·scale per
    * row, so exactness requires n·max|x|²·scale < Long.MaxValue —
    * ≈9.2e9 unit-magnitude vectors at the default scale=1e9. The
    * accumulation uses `Math.addExact`, so exceeding the bound fails
    * the job loudly instead of wrapping silently; the remedy is a
    * smaller `scale` (1e6 still gives 6 exact decimal digits and
    * headroom to ~9e12 rows).
    */
  def gramFixedPoint(df: DataFrame, vecCol: String,
      scale: Double = 1e9): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol)).as[Array[Float]]
    val dims = vecs.limit(1).collect()
    if (dims.isEmpty)
      return Seq.empty[(Int, Int, Long)].toDF("i", "j", "s")
    val d = dims.head.length
    val tri = d * (d + 1) / 2
    val partials = vecs.mapPartitions { it =>
      val acc = new Array[Long](tri)
      it.foreach { v =>
        require(v.length == d,
          s"ragged embedding: expected dim $d, got ${v.length}")
        var i = 0
        var idx = 0
        while (i < d) {
          val vi = v(i).toDouble
          var j = i
          while (j < d) {
            // addExact: a unit-magnitude embedding contributes ~scale
            // per row per cell, so past ~Long.MaxValue/scale rows
            // (≈9e9 at the 1e9 default) a plain += would wrap
            // SILENTLY — and correctness here rests on exact sums.
            // The overflow check is a JIT intrinsic (add + jo), not a
            // measurable cost; on overflow fail the job loudly: the
            // fix is a smaller `scale`.
            acc(idx) = Math.addExact(acc(idx),
              math.floor(vi * v(j).toDouble * scale).toLong)
            idx += 1
            j += 1
          }
          i += 1
        }
      }
      Iterator.single(acc)
    }
    val total = partials.reduce { (a, b) =>
      var i = 0
      while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      a
    }
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield (i, j, total(i * d - i * (i - 1) / 2 + (j - i)))
    rows.toDF("i", "j", "s")
  }

  /** Top-`k` principal directions of the (uncentered) second-moment
    * matrix, descending by eigenvalue. Embedding corpora are
    * near-centered, so uncentered PCA — the SVD of the data matrix —
    * is the standard embedding-compression shape (centering would
    * only add a rank-one mean correction).
    *
    * The heavy part is [[gramFixedPoint]] (one distributed pass);
    * the eigensolve is a d×d cyclic Jacobi on the DRIVER — d² doubles
    * (a 64-dim embedding: 32 KB), never data-proportional, and
    * deterministic because the fixed-point Gram is bit-stable under
    * partitioning (a double-summed Gram would make the "same"
    * components drift run to run).
    */
  def pcaComponents(df: DataFrame, vecCol: String, k: Int,
      scale: Double = 1e9): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val tri = gramFixedPoint(df, vecCol, scale)
      .select(col("i"), col("j"), col("s")).as[(Int, Int, Long)].collect()
    if (tri.isEmpty) return Array.empty
    val d = tri.map(_._2).max + 1
    require(k >= 1 && k <= d, s"need 1 <= k <= $d, got $k")
    val a = Array.ofDim[Double](d, d)
    tri.foreach { case (i, j, s) =>
      val v = s.toDouble / scale
      a(i)(j) = v; a(j)(i) = v
    }
    // cyclic Jacobi: rotate away the largest-magnitude off-diagonal
    // entries until convergence; V accumulates the eigenvectors
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-12 && sweep < 100) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-15) {
            off += apq * apq
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // tan of the annihilating rotation; theta == 0 → 45°
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s2 = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s2 * arq
              a(r)(q) = s2 * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s2 * aqr
              a(q)(r) = s2 * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s2 * vrq
              v(r)(q) = s2 * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    order.take(k).map { i =>
      val comp = Array.tabulate(d)(r => v(r)(i))
      // deterministic sign: largest-|coordinate| entry positive
      val m = comp.indices.maxBy(r => math.abs(comp(r)))
      if (comp(m) < 0) comp.map(-_) else comp
    }.toArray
  }

  /** Project the embedding column onto precomputed `components`
    * (from [[pcaComponents]]): adds `outCol` = Array[Double] of
    * length k. The components broadcast as literals into a
    * scan-stage expression — no shuffle, no UDF. */
  def pcaProject(df: DataFrame, vecCol: String,
      components: Array[Array[Double]], outCol: String = "pc"): DataFrame = {
    require(components.nonEmpty, "no components")
    val projections = components.map { comp =>
      aggregate(
        zip_with(col(vecCol), typedLit(comp.toSeq),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
    }
    df.withColumn(outCol, array(projections.toIndexedSeq: _*))
  }
}
