package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.ops.{Components, Dedup}

/** Deduplication queries over `documents` / `embeddings`
  * (SURVEY §7.6). Query-side predicates bound the candidate space so
  * the declared work is constant across scale factors where the
  * algorithm would otherwise be corpus². */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val sqlToks = "string_split_regex(trim(text), ' +')"

  // 60-bit md5 token hash, DuckDB form (mirrors TextFunctions.tokenHash)
  private val sqlTokHash =
    "CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact dedup on md5 fingerprint — shuffles the 32-char digest,
    // not the document bodies.
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactByFingerprint(docs(s, dir), "text", "doc_id")
        .orderBy(col("fp"))),

    // order-insensitive exact dedup: the digest is over the SORTED
    // token multiset, so word-shuffled copies collapse into one group
    "dedup_bag_exact" -> ((s, dir) =>
      Dedup.exactByBagFingerprint(docs(s, dir), "text", "doc_id")
        .orderBy(col("fp"))),

    // MinHash (k=8) + LSH banding (4 bands × 2): candidate pairs
    // share at least one band bucket.
    // repartition after the selective filter: 500 docs land in ONE
    // parquet split, which would serialize the CPU-heavy tokenize+
    // minhash stage onto one core; hash-repartitioning on the GROUP
    // key both spreads that work and satisfies the groupBy's
    // distribution (the agg's own exchange disappears). The shuffled
    // payload is the filtered slice only — at full-corpus scale the
    // scan has thousands of splits and no such repartition is needed
    // (minhashCandidates itself never shuffles raw text).
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashCandidates(
        docs(s, dir).filter(col("doc_id") < 500)
          .repartition(32, col("doc_id")),
        "text", "doc_id")
        .orderBy(col("a"), col("b"))),

    // two-stage near-dup: LSH candidates VERIFIED by exact 3-gram
    // Jaccard computed only for the candidate pairs (the
    // candidate→verify production shape; same bounded-slice
    // repartition rationale as dedup_minhash_lsh above)
    "dedup_lsh_verified" -> ((s, dir) =>
      Dedup.minhashVerifiedPairs(
        docs(s, dir).filter(col("doc_id") < 500)
          .repartition(32, col("doc_id")),
        "text", "doc_id", minJaccard = 0.5)
        .orderBy(col("a"), col("b"))),

    // 16-bit SimHash groups (identical fingerprint = near-dup bucket)
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashCandidates(docs(s, dir), "text", "doc_id")
        .orderBy(col("simhash"))),

    // word-3-gram Jaccard ≥ 0.5 via inverted-index shingle join
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 3000), "text", "doc_id")
        .orderBy(col("a"), col("b"))),

    // CHARACTER-5-gram Jaccard — the dedup shape for space-free
    // scripts (zh/ja/th have no word shingles to hash): charGramText
    // re-spaces the gram stream, so the SAME shingle_hash64 inverted
    // -index plan runs with n=1 (1-"word" shingles = the char grams).
    // Corpus = a bounded documents slice ∪ the real-CJK fixture; the
    // empty-text filter keeps kernel ([""]-token) and relational
    // ([]-gram) empty-doc semantics aligned.
    "dedup_chargram_jaccard" -> ((s, dir) => {
      val c = MultilingualFixture.corpus(s,
          docs(s, dir).filter(col("doc_id") < 150))
        .select(col("doc_id"),
          TextFunctions.charGramText(col("text"), 5).as("text"))
        .filter(length(col("text")) > 0)
      Dedup.ngramJaccardPairs(c, "text", "doc_id", n = 1,
        minJaccard = 0.5)
        .orderBy(col("a"), col("b"))
    }),

    // shingle CONTAINMENT ≥ 0.8 — the doc-inside-doc detector
    // (wire-article-in-portal-wrapper, quote-in-thread): high
    // containment pairs can sit far below any Jaccard threshold
    // when the union is wrapper-dominated. Same inverted-index plan.
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(
        docs(s, dir).filter(col("doc_id") < 3000), "text", "doc_id")
        .orderBy(col("a"), col("b"))),

    // URL-identity dedup (crawl stage 0): canonicalize the synthetic
    // messy URL (tracking params, case, default port, trailing
    // slash, fragment — TextQueries.messyUrl), then exact-dedup on
    // the canonical string. A scan-stage projection + one digest-
    // sized shuffle: the cheapest dedup a crawl pipeline runs, and
    // it happens BEFORE content ever needs fetching or shingling.
    "dedup_url" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          graft.functions.UrlFunctions.canonicalizeUrl(
            TextQueries.messyUrl).as("canon"))
        .groupBy(col("canon"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
        .orderBy(col("canon"))),

    // same, with the 100 TB guard: shingles in > 20 docs are
    // stop-shingles — dropped from the universe before the
    // inverted-index self-join (kills the hot-key quadratic blowup)
    "dedup_ngram_jaccard_capped" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 3000), "text", "doc_id",
        maxDocFreq = Some(20L))
        .orderBy(col("a"), col("b"))),

    // composite training-data prep: quality filter → exact dedup
    // (keep first) → join to embeddings → per-language corpus stats.
    // The end-to-end shape a 100 TB pretraining pipeline runs, as
    // one declarative plan: every stage is pushdown/prune-friendly.
    // pipeline funnel observability: per-stage survival counts of the
    // curation chain (lang-id -> quality -> length band -> exact-dedup
    // keeper) in ONE pass — conditional aggregation over cumulative
    // predicates, not a scan per stage. The dedup flag joins the
    // min-id-per-fingerprint table back (no hint: it is data-
    // proportional; AQE broadcasts while small).
    "pipe_funnel_stats" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val docs = Tables.load(s, dir, "documents")
      val keep = docs
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
      val staged = docs
        .withColumn("fp", fingerprint(col("text")))
        .join(keep, Seq("fp"))
        .select(
          (langId(col("text")) =!= "und").as("s_lang"),
          (qualityScore(col("text")) >= 1.0).as("s_q"),
          col("n_chars").between(50L, 2000L).as("s_len"),
          (col("doc_id") === col("keep_id")).as("s_keep"))
      staged.agg(
        count(lit(1)).as("n_total"),
        sum(when(col("s_lang"), 1L).otherwise(0L)).as("n_lang"),
        sum(when(col("s_lang") && col("s_q"), 1L).otherwise(0L))
          .as("n_quality"),
        sum(when(col("s_lang") && col("s_q") && col("s_len"), 1L)
          .otherwise(0L)).as("n_len"),
        sum(when(col("s_lang") && col("s_q") && col("s_len") &&
          col("s_keep"), 1L).otherwise(0L)).as("n_final"))
    }),

    "pipe_training_prep" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val quality = docs
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .filter(col("q") >= 1.0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("doc_id"))
      val kept = quality
        .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      kept.join(emb, kept("doc_id") === emb("vec_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    }),

    // reproducible train/val/test split (80/10/10): md5-derived
    // bucket per doc — identical across engines, runs, partitionings
    // and (unlike rand()) replayable. Narrow projection: free at any
    // scale.
    "pipe_split_assign" -> ((s, dir) => {
      val b = graft.functions.TextFunctions.hashBucket(col("doc_id"), 100)
      docs(s, dir).select(col("doc_id"),
        when(b < 80, "train").when(b < 90, "val").otherwise("test")
          .as("split"))
        .orderBy(col("doc_id"))
    }),

    // sequence packing for pretraining: docs stream into fixed-
    // capacity token packs (context windows). Greedy first-fit is
    // inherently sequential, so the SCALE shape is pack-within-shard:
    // a deterministic hash shard bounds each window's partition, the
    // running token sum (one window cumsum per shard) assigns
    // pack_id = floor((cumsum - len) / capacity), and packs never
    // cross shards — 32 independent sequential problems instead of
    // one global one. Output = per-pack fill stats.
    "pipe_pack_sequences" -> ((s, dir) => {
      val capacity = 512L
      val shard = graft.functions.TextFunctions.hashBucket(col("doc_id"), 32)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
            .as("n_tok"), shard.as("shard"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("pack_id",
          floor((col("cum") - col("n_tok")) / capacity))
        .groupBy(col("shard"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy(col("shard"), col("pack_id"))
    }),

    // stratified sampling with per-language rates (en 10%, rest 50%)
    // over the same deterministic bucket; output = per-stratum
    // totals. The groupBy shuffles (lang, partial counts) only.
    "pipe_stratified_sample" -> ((s, dir) => {
      val b = graft.functions.TextFunctions.hashBucket(col("doc_id"), 100)
      docs(s, dir)
        .withColumn("sampled",
          when(col("lang") === "en", b < 10).otherwise(b < 50))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
        .orderBy(col("lang"))
    }),

    // temperature-based source mixing (the Gopher/LLaMA data-mix
    // shape): subsample each source at rate ∝ n_s^(α-1), α = 0.5, so
    // kept counts ∝ √n_s — the corpus flattens toward uniform across
    // sources without any source being dropped. The per-source rate
    // derives from two bounded aggregates (counts + global min); the
    // keep decision is a deterministic md5 bucket against an integer
    // ppm threshold — replayable, and exact in any engine (÷ and √
    // are correctly-rounded IEEE ops, then floor to an integer).
    "pipe_source_mix" -> ((s, dir) => {
      val counts = docs(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      val mn = counts.agg(min(col("n_docs")).as("min_docs"))
      val rates = counts.crossJoin(broadcast(mn))
        .select(col("source"), col("n_docs"),
          floor(lit(1000000.0) * sqrt(
            col("min_docs").cast("double") / col("n_docs").cast("double")))
            .as("rate_ppm"))
      val bk = graft.functions.TextFunctions
        .hashBucket(col("doc_id"), 1000000)
      docs(s, dir).select(col("source"), col("doc_id"), bk.as("bk"))
        .join(broadcast(rates), Seq("source"))
        .groupBy(col("source"))
        .agg(max(col("n_docs")).as("n_docs"),
          max(col("rate_ppm")).as("rate_ppm"),
          sum(when(col("bk") < col("rate_ppm"), 1L).otherwise(0L))
            .as("n_kept"))
        .orderBy(col("source"))
    }),

    // per-domain document cap (the C4/CCNet per-domain guard): keep
    // at most K docs per source, chosen by deterministic hash order
    // (md5 bucket, tie → doc_id) so the "random" K are identical
    // across engines, runs, and partitionings. ops/CappedSample: a
    // window rank would colocate the mega-domain — the exact case
    // the cap exists for — in ONE task (window partitions cannot
    // split); the capped-sample form bounds every stage by K via a
    // count + exact iterative hash-threshold prefilter, and stays
    // row-identical to the window form (so this DuckDB window oracle
    // keeps matching).
    "pipe_domain_cap" -> ((s, dir) => {
      val k = 15
      val h = graft.functions.TextFunctions.hashBucket(col("doc_id"), 1000000)
      graft.ops.CappedSample.perKeyCap(
        docs(s, dir).select(col("doc_id"), col("source")),
        Seq("source"), h, col("doc_id"), k)
        .orderBy(col("doc_id"))
    }),

    // global token-budget selection: keep the highest-quality docs
    // until a corpus-wide token budget is spent (the "data-constrained
    // scaling" curation shape). A naive global running sum is one
    // un-partitioned window = one partition doing all the work; the
    // scale shape here is two-pass: quality quantizes into coarse
    // bands (a monotone function of the sort key, so band order IS
    // quality order), per-band token totals (a tiny aggregate)
    // broadcast back as cumulative offsets, and the exact running sum
    // runs per-band in parallel. Token counts are integers — the
    // running sum is exact under any partitioning.
    "pipe_token_budget" -> ((s, dir) => {
      // BandedScan.budgetFilter holds the plan shape (banded two-pass
      // prefix sum, never an un-partitioned window — see its scaladoc
      // for why a constant partition key doesn't dodge that); shared
      // with the curation CLI's token-budget stage.
      val budget = 20000L
      val d = docs(s, dir).select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
          .as("n_tok"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
      graft.ops.BandedScan.budgetFilter(d, qualityCol = "q",
          weightCol = "n_tok", tieCol = "doc_id", budget = budget)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("tok_kept"))
        .orderBy(col("lang"))
    }),

    // embedding-cosine near-dup pairs (≥ 0.35), bounded query side
    "dedup_embedding_cosine" -> ((s, dir) =>
      Dedup.embeddingCosinePairs(
        Tables.load(s, dir, "embeddings"), "embedding", "vec_id",
        threshold = 0.35, queryPred = col("vec_id") < 300)
        .orderBy(col("a"), col("b"))),

    // benchmark decontamination: corpus docs sharing any 3-gram with
    // the eval slice (doc_id % 50 == 0 stands in for the benchmark) —
    // the test-set-leakage guard every training pipeline needs
    "text_decontaminate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "text", "doc_id", n = 3)
        .orderBy(col("id"))
    }),

    // SemDeDup shape: near-dup pairs WITHIN nearest-centroid cells —
    // the unbounded-corpus scale path (corpus² → Σ_cell |cell|²,
    // reached via an equi-join on the cell id)
    "dedup_semantic_cells" -> ((s, dir) =>
      Dedup.embeddingCellPairs(
        Tables.load(s, dir, "embeddings"), "embedding", "vec_id",
        threshold = 0.30, nCells = 16)
        .orderBy(col("a"), col("b"))),

    // candidate pairs → duplicate GROUPS: connected components of the
    // Jaccard candidate graph via iterative min-label propagation
    // (graft.ops.Components — join + hash-agg per round, converges in
    // diameter rounds; near-dup components are near-cliques). The
    // missing last stage of near-dup dedup: transitive closure, one
    // canonical keeper (= min doc id) per component.
    "dedup_group_resolve" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 3000), "text", "doc_id")
      Components.connectedComponents(pairs, "a", "b").orderBy(col("id"))
    }),

    // same transitive closure via alternating large-star/small-star
    // (Kiveris et al.) — the O(log n)-round adversarial-diameter scale
    // path; drop-in output-identical to min-label propagation, so the
    // two share one oracle
    "dedup_group_resolve_star" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 3000), "text", "doc_id")
      Components.connectedComponentsStar(pairs, "a", "b").orderBy(col("id"))
    }),

    // the dedup decision APPLIED: the corpus with non-keeper dup-group
    // members removed (keeper = min id). Candidates → components →
    // anti-join back; the anti-join probe side is (id, group_id)
    // pairs — tiny next to the corpus — so the corpus scan is pruned,
    // never shuffled whole. This is the query a curation run actually
    // ships: the surviving document set.
    "dedup_apply" -> ((s, dir) => {
      val d = docs(s, dir).filter(col("doc_id") < 3000)
      val pairs = Dedup.ngramJaccardPairs(d, "text", "doc_id")
      val drop = Components.connectedComponents(pairs, "a", "b")
        .filter(col("id") =!= col("group_id"))
        .select(col("id").as("doc_id"))
      d.select(col("doc_id"), col("lang"), col("source"))
        .join(drop, Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
    }),

    // per-group dedup decision: keeper id and how many docs it absorbs
    "dedup_group_stats" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 3000), "text", "doc_id")
      Components.groupStats(Components.connectedComponents(pairs, "a", "b"))
        .orderBy(col("group_id"))
    }),

    // pluggable keeper POLICY: instead of min-id, keep the HIGHEST-
    // QUALITY member of each dup group (ties -> lowest id) — argmax as
    // one hash aggregate (max over a (quality, -id) struct), the same
    // pattern as IVF cell assignment. What a real curation pipeline
    // wants: dedup should keep the best copy, not the first crawled.
    "dedup_group_keeper" -> ((s, dir) => {
      val d = docs(s, dir).filter(col("doc_id") < 3000)
      val pairs = Dedup.ngramJaccardPairs(d, "text", "doc_id")
      val comp = Components.connectedComponents(pairs, "a", "b")
      comp.join(d.select(col("doc_id").as("id"),
          graft.functions.TextFunctions.qualityScore(col("text")).as("q")),
          Seq("id"))
        .groupBy(col("group_id"))
        .agg(max(struct(col("q"), (-col("id")).as("nid"))).as("best"),
          count(lit(1)).as("n_members"))
        .select(col("group_id"), (-col("best.nid")).as("keeper_id"),
          col("n_members"))
        .orderBy(col("group_id"))
    }),

    // span-level (substring) duplication stats — Lee et al. 2022:
    // boilerplate/templated SPANS duplicate across otherwise-unique
    // docs, so curation scores span-duplication, not just whole-doc
    // identity. Linear explode → 64-bit-hash shuffles → two hash
    // aggregates; no pairwise candidate space at all.
    "dedup_spans" -> ((s, dir) =>
      Dedup.spanDupStats(docs(s, dir), "text", "doc_id")
        .orderBy(col("id"))),

    // span excision applied (Dedup.spanScrub): duplicated 10-token
    // windows (any alignment, stride 1) are cut out of every doc and
    // the survivors re-concatenate in order — Lee et al.'s exact
    // substring dedup as a dataflow, with the scrubbed corpus as
    // output rather than a score. maxSpanFreq engages the
    // skew-guarded route: this corpus's 31-word vocabulary is
    // boilerplate-saturated by construction (the densest case the
    // one-pass window is weak to), so corpus-hot spans resolve
    // through the map-side-combined hot-span aggregate + broadcast
    // semi-join instead of landing in one sorted window partition.
    // Output-identical to the uncapped form for EVERY cap (DedupSpec
    // pins capped ≡ uncapped on randomized skewed corpora), so the
    // cap is a pure execution-strategy choice, like a join hint.
    "dedup_span_scrub" -> ((s, dir) =>
      Dedup.spanScrub(docs(s, dir), "text", "doc_id",
        maxSpanFreq = Some(32))
        .orderBy(col("id"))),

    // batched model scoring (ops/BatchInfer): rows stream through the
    // "model" in bounded per-partition batches — the mapInPandas
    // inference shape, executor-side end to end. The stub model is
    // row-local (score from n_chars only) so results are
    // partitioning-invariant and the oracle can state the formula;
    // the batching is the transport contract a real model needs.
    "pipe_batch_score" -> ((s, dir) => {
      val scored = graft.ops.BatchInfer.scoreBatches(
        docs(s, dir).select(col("doc_id"), col("n_chars")), batchSize = 64,
        batch => batch.map(r => (r.getAs[Long]("n_chars") % 97).toDouble / 97.0))
      scored.select(col("doc_id"), col("score")).orderBy(col("doc_id"))
    }),

    // approximate string self-join (ops/FuzzyJoin): supplier names
    // within Levenshtein distance 1, via FastSS deletion-neighborhood
    // blocking — an equi-join on deletion keys plus an exact verify
    // filter, never the Θ(n²) cross join the oracle states. The
    // blocking is provably complete for distance ≤ 1 (FuzzyJoinSpec
    // pins it against brute force on random strings).
    "fuzzy_name_pairs" -> ((s, dir) =>
      graft.ops.FuzzyJoin.selfPairs(
        Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name")),
        "s_name", "s_suppkey")
        .orderBy(col("a"), col("b"))),

    // depth-2 deletion neighborhoods (edit distance ≤ 2) on the
    // larger customer table: ~L²/2 keys per row, still a linear
    // blowup, candidates still bucket-local. Query-side bound like
    // the other dedup entries: sequential-id names make matches
    // DENSE (every ≤2-digit-change pairs), so unbounded output
    // grows ~linearly×500 with sf — the bound pins declared work,
    // the operator itself never materializes cross-bucket pairs
    "fuzzy_name_pairs2" -> ((s, dir) =>
      graft.ops.FuzzyJoin.selfPairs(
        Tables.load(s, dir, "customer")
          .filter(col("c_custkey") < 300)
          .select(col("c_custkey"), col("c_name")),
        "c_name", "c_custkey", maxDist = 2)
        .orderBy(col("a"), col("b")))
  )

  /** The dedup_ngram_jaccard candidate-pair SQL as a reusable CTE
    * body (pairs at jaccard ≥ 0.5 over doc_id < 3000). */
  private val jaccardPairsCte: String =
    s"""d AS (SELECT doc_id, $sqlToks AS toks
       |           FROM documents WHERE doc_id < 3000),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    toks[CAST(i AS INTEGER)+1] || ' ' || toks[CAST(i AS INTEGER)+2]
       |      || ' ' || toks[CAST(i AS INTEGER)+3] AS s
       |  FROM d, unnest(range(0, len(toks)-2)) AS t(i)),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS n_inter
       |  FROM sh l JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a, b FROM inter
       |  JOIN sizes sa ON sa.doc_id = a
       |  JOIN sizes sb ON sb.doc_id = b
       |  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
       |        >= 0.5),
       |edges AS (SELECT a AS src, b AS dst FROM pairs
       |          UNION SELECT b, a FROM pairs),
       |reach(v, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, rr.r FROM reach rr JOIN edges e ON e.src = rr.v)""".stripMargin

  private def minhashMins(h: String): String =
    Dedup.MinhashA.zip(Dedup.MinhashB).zipWithIndex.map { case ((a, b), i) =>
      s"MIN(($a*$h+$b)%${Dedup.MinhashP}) AS m$i"
    }.mkString(",\n   ")

  private val simhashVotes: String = (0 until 16).map { i =>
    s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i"
  }.mkString(",\n   ")

  private val simhashCombine: String = (0 until 16).map { i =>
    s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END"
  }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS fp, MIN(doc_id) AS keep_id,
        | COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "dedup_bag_exact" ->
      """SELECT md5(array_to_string(
        |    list_sort(string_split_regex(trim(lower(text)), ' +')), ' '))
        |    AS fp,
        | MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, unnest($sqlToks) AS t
         |  FROM documents WHERE doc_id < 500),
         |h AS (SELECT doc_id, $sqlTokHash % ${Dedup.MinhashP} AS hp FROM tok),
         |m AS (SELECT doc_id,
         |   ${minhashMins("hp")}
         | FROM h GROUP BY doc_id),
         |bands AS (
         | SELECT doc_id, 0 AS band, m0 AS x, m1 AS y FROM m UNION ALL
         | SELECT doc_id, 1, m2, m3 FROM m UNION ALL
         | SELECT doc_id, 2, m4, m5 FROM m UNION ALL
         | SELECT doc_id, 3, m6, m7 FROM m)
         |SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS n_bands
         |FROM bands l JOIN bands r
         |  ON l.band = r.band AND l.x = r.x AND l.y = r.y
         | AND l.doc_id < r.doc_id
         |GROUP BY 1, 2 ORDER BY a, b""".stripMargin,
    "dedup_lsh_verified" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, unnest($sqlToks) AS t
         |  FROM documents WHERE doc_id < 500),
         |h AS (SELECT doc_id, $sqlTokHash % ${Dedup.MinhashP} AS hp FROM tok),
         |m AS (SELECT doc_id,
         |   ${minhashMins("hp")}
         | FROM h GROUP BY doc_id),
         |bands AS (
         | SELECT doc_id, 0 AS band, m0 AS x, m1 AS y FROM m UNION ALL
         | SELECT doc_id, 1, m2, m3 FROM m UNION ALL
         | SELECT doc_id, 2, m4, m5 FROM m UNION ALL
         | SELECT doc_id, 3, m6, m7 FROM m),
         |cand AS (
         | SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         | FROM bands l JOIN bands r
         |   ON l.band = r.band AND l.x = r.x AND l.y = r.y
         |  AND l.doc_id < r.doc_id),
         |d AS (SELECT doc_id, $sqlToks AS toks
         |      FROM documents WHERE doc_id < 500),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    toks[CAST(i AS INTEGER)+1] || ' ' || toks[CAST(i AS INTEGER)+2]
         |      || ' ' || toks[CAST(i AS INTEGER)+3] AS s
         |  FROM d, unnest(range(0, len(toks)-2)) AS t(i)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.a, c.b, COUNT(*) AS n_inter
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.a
         |  JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s
         |  GROUP BY 1, 2)
         |SELECT a, b, n_inter, sa.n AS n_a, sb.n AS n_b,
         |  CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
         |    AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a
         |JOIN sizes sb ON sb.doc_id = b
         |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
         |      >= 0.5
         |ORDER BY a, b""".stripMargin,
    "dedup_simhash" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, unnest($sqlToks) AS t FROM documents),
         |h AS (SELECT doc_id, $sqlTokHash AS h FROM tok),
         |v AS (SELECT doc_id,
         |   $simhashVotes
         | FROM h GROUP BY doc_id),
         |sh AS (SELECT doc_id, $simhashCombine AS simhash FROM v)
         |SELECT simhash, MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
         |FROM sh GROUP BY simhash HAVING COUNT(*) > 1
         |ORDER BY simhash""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, $sqlToks AS toks
         |           FROM documents WHERE doc_id < 3000),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    toks[CAST(i AS INTEGER)+1] || ' ' || toks[CAST(i AS INTEGER)+2]
         |      || ' ' || toks[CAST(i AS INTEGER)+3] AS s
         |  FROM d, unnest(range(0, len(toks)-2)) AS t(i)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS n_inter
         |  FROM sh l JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, n_inter, sa.n AS n_a, sb.n AS n_b,
         |  CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
         |    AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a
         |JOIN sizes sb ON sb.doc_id = b
         |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
         |      >= 0.5
         |ORDER BY a, b""".stripMargin,
    "dedup_chargram_jaccard" ->
      s"""WITH mx AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 150
         |  UNION ALL
         |  SELECT doc_id, text
         |  FROM (VALUES ${MultilingualFixture.sqlValues})
         |       AS f(doc_id, lang, text)),
         |ntt AS (SELECT doc_id,
         |          regexp_replace(trim(text), ' +', '▁', 'g') AS nt
         |        FROM mx),
         |d AS (SELECT doc_id,
         |        CASE WHEN length(nt) = 0 THEN []::VARCHAR[]
         |             WHEN length(nt) < 5 THEN [nt]
         |             ELSE list_transform(range(1, length(nt) - 3),
         |                    i -> substring(nt, i, 5)) END AS toks
         |      FROM ntt),
         |sh AS (SELECT DISTINCT doc_id, s
         |       FROM (SELECT doc_id, unnest(toks) AS s FROM d)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS n_inter
         |  FROM sh l JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, n_inter, sa.n AS n_a, sb.n AS n_b,
         |  CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
         |    AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a
         |JOIN sizes sb ON sb.doc_id = b
         |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
         |      >= 0.5
         |ORDER BY a, b""".stripMargin,
    "dedup_containment" ->
      s"""WITH d AS (SELECT doc_id, $sqlToks AS toks
         |           FROM documents WHERE doc_id < 3000),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    toks[CAST(i AS INTEGER)+1] || ' ' || toks[CAST(i AS INTEGER)+2]
         |      || ' ' || toks[CAST(i AS INTEGER)+3] AS s
         |  FROM d, unnest(range(0, len(toks)-2)) AS t(i)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS n_inter
         |  FROM sh l JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, n_inter, sa.n AS n_a, sb.n AS n_b,
         |  CAST(n_inter AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)
         |    AS containment
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a
         |JOIN sizes sb ON sb.doc_id = b
         |WHERE CAST(n_inter AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)
         |      >= 0.8
         |ORDER BY a, b""".stripMargin,
    "dedup_url" ->
      s"""WITH u AS (SELECT doc_id, ${TextQueries.sqlUrl} AS url
         |           FROM documents),
         |${TextQueries.sqlCanonStages}
         |SELECT canon, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM c GROUP BY canon ORDER BY canon""".stripMargin,
    "dedup_ngram_jaccard_capped" ->
      s"""WITH d AS (SELECT doc_id, $sqlToks AS toks
         |           FROM documents WHERE doc_id < 3000),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    toks[CAST(i AS INTEGER)+1] || ' ' || toks[CAST(i AS INTEGER)+2]
         |      || ' ' || toks[CAST(i AS INTEGER)+3] AS s
         |  FROM d, unnest(range(0, len(toks)-2)) AS t(i)),
         |capped AS (
         |  SELECT doc_id, s FROM (
         |    SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df
         |    FROM sh) x WHERE df <= 20),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id),
         |inter AS (
         |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS n_inter
         |  FROM capped l JOIN capped r ON l.s = r.s AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, n_inter, sa.n AS n_a, sb.n AS n_b,
         |  CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
         |    AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a
         |JOIN sizes sb ON sb.doc_id = b
         |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
         |      >= 0.5
         |ORDER BY a, b""".stripMargin,
    "pipe_training_prep" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, n_chars,
         |    md5(lower(trim(text))) AS fp
         |  FROM documents
         |  WHERE CAST(len(list_filter($sqlToks,
         |          t -> t IN ('the', 'a', 'of', 'and', 'in'))) AS DOUBLE)
         |        / CAST(len($sqlToks) AS DOUBLE)
         |      + CASE WHEN len($sqlToks) BETWEEN 5 AND 500
         |             THEN 1.0 ELSE 0.0 END >= 1.0),
         |kept AS (
         |  SELECT doc_id, lang, n_chars FROM (
         |    SELECT doc_id, lang, n_chars,
         |      row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |    FROM q) x WHERE rn = 1)
         |SELECT lang, COUNT(*) AS n_docs,
         | CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM kept JOIN embeddings ON vec_id = doc_id
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "pipe_split_assign" ->
      """SELECT doc_id,
        | CASE WHEN CAST(concat('0x', substring(
        |        md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80
        |      THEN 'train'
        |      WHEN CAST(concat('0x', substring(
        |        md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90
        |      THEN 'val' ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipe_pack_sequences" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
        |      AS n_tok,
        |    CAST(concat('0x', substring(
        |      md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 32 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT shard, doc_id, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM s)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(floor((cum - n_tok) / 512.0) AS BIGINT) AS pack_id,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1, 2 ORDER BY shard, pack_id""".stripMargin,
    "pipe_stratified_sample" ->
      """WITH b AS (
        |  SELECT lang,
        |    CAST(concat('0x', substring(
        |      md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bk
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_total,
        | CAST(SUM(CASE WHEN (lang = 'en' AND bk < 10)
        |                 OR (lang <> 'en' AND bk < 50)
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM b GROUP BY lang ORDER BY lang""".stripMargin,
    "pipe_domain_cap" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    CAST(concat('0x', substring(
        |      md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 1000000 AS hb
        |  FROM documents)
        |SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY hb, doc_id)
        |      AS rn
        |  FROM h) x
        |WHERE rn <= 15 ORDER BY doc_id""".stripMargin,
    "pipe_token_budget" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang,
         |    CAST(len($sqlToks) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter($sqlToks,
         |           t -> t IN ('the', 'a', 'of', 'and', 'in'))) AS DOUBLE)
         |      / CAST(len($sqlToks) AS DOUBLE)
         |    + CASE WHEN len($sqlToks) BETWEEN 5 AND 500
         |           THEN 1.0 ELSE 0.0 END AS q
         |  FROM documents),
         |c AS (
         |  SELECT lang, n_tok,
         |    SUM(n_tok) OVER (ORDER BY q DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM q)
         |SELECT lang, COUNT(*) AS n_kept,
         |  CAST(SUM(n_tok) AS BIGINT) AS tok_kept
         |FROM c WHERE cum <= 20000
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "pipe_source_mix" ->
      """WITH counts AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        |mn AS (SELECT MIN(n_docs) AS min_docs FROM counts),
        |rates AS (
        |  SELECT source, n_docs,
        |    CAST(floor(1000000.0 * sqrt(
        |      CAST(min_docs AS DOUBLE) / CAST(n_docs AS DOUBLE)))
        |      AS BIGINT) AS rate_ppm
        |  FROM counts, mn),
        |b AS (
        |  SELECT source,
        |    CAST(concat('0x', substring(
        |      md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 1000000 AS bk
        |  FROM documents)
        |SELECT b.source, MAX(n_docs) AS n_docs, MAX(rate_ppm) AS rate_ppm,
        |  CAST(SUM(CASE WHEN bk < rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept
        |FROM b JOIN rates ON b.source = rates.source
        |GROUP BY b.source ORDER BY b.source""".stripMargin,
    // NOTE: concatenation, not an interpolated stripMargin — the CTE
    // body contains SQL `||` at line starts, which a second
    // stripMargin would corrupt.
    "dedup_group_resolve" ->
      ("WITH RECURSIVE " + jaccardPairsCte + "\n" +
        "SELECT v AS id, MIN(r) AS group_id FROM reach\n" +
        "GROUP BY v ORDER BY id"),
    "dedup_group_resolve_star" ->
      ("WITH RECURSIVE " + jaccardPairsCte + "\n" +
        "SELECT v AS id, MIN(r) AS group_id FROM reach\n" +
        "GROUP BY v ORDER BY id"),
    "dedup_apply" ->
      ("WITH RECURSIVE " + jaccardPairsCte + ",\n" +
        "comp AS (SELECT v AS id, MIN(r) AS group_id FROM reach GROUP BY v)\n" +
        "SELECT doc_id, lang, source FROM documents\n" +
        "WHERE doc_id < 3000 AND doc_id NOT IN\n" +
        "  (SELECT id FROM comp WHERE id <> group_id)\n" +
        "ORDER BY doc_id"),
    "dedup_group_stats" ->
      ("WITH RECURSIVE " + jaccardPairsCte + ",\n" +
        "comp AS (SELECT v AS id, MIN(r) AS group_id FROM reach GROUP BY v)\n" +
        "SELECT group_id, COUNT(*) AS n_members FROM comp\n" +
        "GROUP BY group_id ORDER BY group_id"),
    "dedup_group_keeper" ->
      ("WITH RECURSIVE " + jaccardPairsCte + ",\n" +
        "comp AS (SELECT v AS id, MIN(r) AS group_id FROM reach GROUP BY v),\n" +
        "q AS (SELECT doc_id AS id,\n" +
        s"  CAST(len(list_filter($sqlToks, t -> t IN ('the','a','of','and','in'))) AS DOUBLE)\n" +
        s"    / CAST(len($sqlToks) AS DOUBLE)\n" +
        s"  + CASE WHEN len($sqlToks) BETWEEN 5 AND 500 THEN 1.0 ELSE 0.0 END AS q\n" +
        "  FROM documents WHERE doc_id < 3000)\n" +
        "SELECT group_id, keeper_id, n_members FROM (\n" +
        "  SELECT c.group_id,\n" +
        "    FIRST(c.id ORDER BY q.q DESC, c.id) AS keeper_id,\n" +
        "    COUNT(*) AS n_members\n" +
        "  FROM comp c JOIN q ON c.id = q.id GROUP BY c.group_id)\n" +
        "ORDER BY group_id"),
    "dedup_spans" ->
      (s"WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),\n" +
        "e AS (SELECT doc_id, toks,\n" +
        "  unnest(range(0, greatest(CAST(ceil((len(toks) - 10) / 10.0)\n" +
        "    AS BIGINT), 0) + 1)) AS i FROM t),\n" +
        "s AS (SELECT doc_id, CAST(concat('0x', substring(\n" +
        "    md5(array_to_string(toks[i*10+1 : i*10+10], ' ')), 1, 15))\n" +
        "    AS BIGINT) AS sh FROM e),\n" +
        "g AS (SELECT sh, COUNT(DISTINCT doc_id) AS nd FROM s GROUP BY sh)\n" +
        "SELECT s.doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_spans,\n" +
        "  CAST(SUM(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)\n" +
        "    AS n_dup_spans,\n" +
        "  CAST(SUM(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)\n" +
        "    / CAST(COUNT(*) AS DOUBLE) AS dup_ratio\n" +
        "FROM s JOIN g USING (sh) GROUP BY s.doc_id ORDER BY id"),
    "dedup_span_scrub" ->
      // unnest(range(...)) instead of lateral generate_series: DuckDB
      // table functions can't take lateral column params. Stride-1
      // window starts 0..max(len-10,0); 1-based inclusive list slice
      // [start+1, start+10] = 10 tokens, clamped at the list end
      // exactly like Spark's slice()
      (s"WITH d AS (SELECT doc_id, $sqlToks AS toks FROM documents),\n" +
        "s0 AS (SELECT doc_id, toks,\n" +
        "  unnest(range(0, greatest(len(toks) - 10, 0) + 1)) AS start FROM d),\n" +
        "s AS (SELECT doc_id, start,\n" +
        "  array_to_string(toks[start + 1 : start + 10], ' ') AS span FROM s0),\n" +
        "f AS (SELECT span FROM s GROUP BY span HAVING count(*) > 1),\n" +
        "cov AS (SELECT DISTINCT doc_id, pos FROM (\n" +
        "  SELECT s.doc_id, s.start +\n" +
        "    unnest(range(0, len(string_split(s.span, ' ')))) AS pos\n" +
        "  FROM s JOIN f USING (span))),\n" +
        "t0 AS (SELECT doc_id, toks,\n" +
        "  unnest(range(0, len(toks))) AS pos FROM d),\n" +
        "t AS (SELECT doc_id, pos, toks[pos + 1] AS tok FROM t0),\n" +
        "k AS (SELECT t.doc_id, t.pos, t.tok FROM t\n" +
        "      WHERE NOT EXISTS (SELECT 1 FROM cov\n" +
        "        WHERE cov.doc_id = t.doc_id AND cov.pos = t.pos)),\n" +
        "r AS (SELECT doc_id, count(*) AS n_kept,\n" +
        "        string_agg(tok, ' ' ORDER BY pos) AS scrubbed\n" +
        "      FROM k GROUP BY doc_id)\n" +
        "SELECT doc.doc_id AS id, coalesce(r.n_kept, 0) AS n_kept,\n" +
        "  coalesce(r.scrubbed, '') AS scrubbed\n" +
        "FROM documents doc LEFT JOIN r USING (doc_id) ORDER BY id"),
    "pipe_batch_score" ->
      """SELECT doc_id,
        | CAST(n_chars % 97 AS DOUBLE) / 97.0 AS score
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipe_funnel_stats" ->
      s"""WITH keep AS (
         |  SELECT md5(lower(trim(text))) AS fp, MIN(doc_id) AS keep_id
         |  FROM documents GROUP BY 1),
         |staged AS (
         |  SELECT
         |    (CASE
         |      WHEN list_contains($sqlToks, 'der') OR list_contains($sqlToks, 'und') THEN 'de'
         |      WHEN list_contains($sqlToks, 'le') OR list_contains($sqlToks, 'la') THEN 'fr'
         |      WHEN list_contains($sqlToks, 'el') OR list_contains($sqlToks, 'los') THEN 'es'
         |      WHEN list_contains($sqlToks, 'the') OR list_contains($sqlToks, 'a') THEN 'en'
         |      ELSE 'und' END) <> 'und' AS s_lang,
         |    (CAST(len(list_filter($sqlToks, t -> t IN ('the','a','of','and','in'))) AS DOUBLE)
         |       / CAST(len($sqlToks) AS DOUBLE)
         |     + CASE WHEN len($sqlToks) BETWEEN 5 AND 500
         |            THEN 1.0 ELSE 0.0 END) >= 1.0 AS s_q,
         |    d.n_chars BETWEEN 50 AND 2000 AS s_len,
         |    d.doc_id = k.keep_id AS s_keep
         |  FROM documents d JOIN keep k ON md5(lower(trim(d.text))) = k.fp)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         |  CAST(SUM(CASE WHEN s_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
         |  CAST(SUM(CASE WHEN s_lang AND s_q THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_quality,
         |  CAST(SUM(CASE WHEN s_lang AND s_q AND s_len THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_len,
         |  CAST(SUM(CASE WHEN s_lang AND s_q AND s_len AND s_keep
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_final
         |FROM staged""".stripMargin,
    "text_decontaminate" ->
      s"""WITH corp AS (
         |  SELECT doc_id, $sqlToks AS toks FROM documents
         |  WHERE doc_id % 50 <> 0),
         |ev AS (
         |  SELECT doc_id, $sqlToks AS toks FROM documents
         |  WHERE doc_id % 50 = 0),
         |csh AS (
         |  SELECT DISTINCT doc_id,
         |    toks[CAST(i AS INTEGER)+1] || ' ' || toks[CAST(i AS INTEGER)+2]
         |      || ' ' || toks[CAST(i AS INTEGER)+3] AS s
         |  FROM corp, unnest(range(0, len(toks)-2)) AS t(i)),
         |esh AS (
         |  SELECT DISTINCT
         |    toks[CAST(i AS INTEGER)+1] || ' ' || toks[CAST(i AS INTEGER)+2]
         |      || ' ' || toks[CAST(i AS INTEGER)+3] AS s
         |  FROM ev, unnest(range(0, len(toks)-2)) AS t(i)),
         |hits AS (
         |  SELECT csh.doc_id, COUNT(*) AS n_shared
         |  FROM csh JOIN esh ON csh.s = esh.s
         |  GROUP BY csh.doc_id)
         |SELECT c.doc_id AS id,
         |  CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
         |  COALESCE(h.n_shared, 0) > 0 AS contaminated
         |FROM corp c LEFT JOIN hits h ON c.doc_id = h.doc_id
         |ORDER BY id""".stripMargin,
    "dedup_semantic_cells" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
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
        |    FROM e CROSS JOIN cent) x WHERE crn = 1)
        |SELECT l.vec_id AS a, r.vec_id AS b, l.cell,
        |  list_dot_product(l.v, r.v) / (l.nrm * r.nrm) AS cos
        |FROM assigned l JOIN assigned r
        |  ON l.cell = r.cell AND l.vec_id < r.vec_id
        |WHERE list_dot_product(l.v, r.v) / (l.nrm * r.nrm) >= 0.30
        |ORDER BY a, b""".stripMargin,
    "dedup_embedding_cosine" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings)
        |SELECT l.vec_id AS a, r.vec_id AS b,
        |  list_dot_product(l.v, r.v) / (l.nrm * r.nrm) AS cos
        |FROM e l JOIN e r ON l.vec_id < r.vec_id
        |WHERE l.vec_id < 300
        |  AND list_dot_product(l.v, r.v) / (l.nrm * r.nrm) >= 0.35
        |ORDER BY a, b""".stripMargin,
    "fuzzy_name_pairs" ->
      """SELECT a.s_suppkey AS a, b.s_suppkey AS b,
        |  CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY a, b""".stripMargin,
    "fuzzy_name_pairs2" ->
      """SELECT a.c_custkey AS a, b.c_custkey AS b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE a.c_custkey < 300 AND b.c_custkey < 300
        |  AND levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY a, b""".stripMargin
  )
}
