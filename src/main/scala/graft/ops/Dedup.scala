package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines (SURVEY §7.6).
  *
  * Scale design: every variant reduces to (narrow projection) →
  * (shuffle on a dedup key) → (bounded join). Nothing materializes
  * O(n²): candidate pairs only form inside hash buckets (band
  * signature / simhash / shingle), which is the standard LSH route
  * to near-dup detection at 100 TB.
  */
object Dedup {

  /** Exact dedup by content: first (min-id) row wins per distinct
    * key. One hash-partition shuffle on the content key; map-side
    * partial aggregation keeps it linear. */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup on a fingerprint (md5 of normalized content) — the
    * at-scale variant: the 32-char digest shuffles instead of the
    * full document body. */
  def exactByFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Bag-of-words fingerprint: md5 over the lexicographically sorted
    * token multiset — order-insensitive exact dedup. Catches
    * word-shuffled or re-ordered copies that the positional
    * [[graft.functions.TextFunctions.fingerprint]] and positional
    * shingles both miss, at exact-dedup cost: a narrow scan-stage
    * projection, then a groupBy that shuffles the 32-char digest
    * only (token sort is per-row, inside the scan stage). */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(split(trim(lower(text)), " +"))))

  /** [[exactByFingerprint]] with the order-insensitive bag digest. */
  def exactByBagFingerprint(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol), bagFingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash permutation constants (fixed, mirrored in oracle SQL). */
  val MinhashA: Seq[Long] = Seq(937L, 1447L, 2357L, 3499L, 4523L, 5881L, 6761L, 7919L)
  val MinhashB: Seq[Long] = Seq(11L, 97L, 181L, 271L, 367L, 457L, 569L, 653L)
  val MinhashP: Long = 2147483647L // 2^31-1

  /** Per-document MinHash signature (k = 8) over distinct tokens.
    * explode → hash → groupBy(doc) with k min-aggregates: one
    * shuffle, partial mins map-side. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df
      .select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("t"))
      .select(col(idCol), (tokenHash(col("t")) % MinhashP).as("hp"))
    val mins = MinhashA.zip(MinhashB).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("hp") + lit(b)) % MinhashP).as(s"m$i")
    }
    tok.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** MinHash-LSH candidate pairs: band the k=8 signature into 4
    * bands of 2 rows; docs sharing any band's values become a
    * candidate pair. The join key is (band, sig) — candidates form
    * only within buckets, never across the full corpus. */
  /** (id, band, x, y) LSH band rows: the k=8 signature split into 4
    * bands of 2. Banding via posexplode AFTER the aggregate, not a
    * 4-way union of per-band projections: Catalyst collapses union
    * branches into the aggregate, which would split the single 8-min
    * groupBy into FOUR aggregate subtrees (4 scans + 4 tokenize
    * passes + 4 shuffles). A generator over the signature row keeps
    * ONE scan/agg/shuffle. */
  def minhashBands(df: DataFrame, textCol: String, idCol: String): DataFrame =
    minhashSignatures(df, textCol, idCol)
      .select(col(idCol), posexplode(array(
        (0 until 4).map(b =>
          struct(col(s"m${2 * b}").as("x"), col(s"m${2 * b + 1}").as("y"))): _*))
        .as(Seq("band", "bx")))
      .select(col(idCol), col("band"), col("bx.x").as("x"), col("bx.y").as("y"))

  def minhashCandidates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // the self-join's second side resolves to a ReusedExchange over
    // the bands subtree's shuffle — the corpus is tokenized and
    // min-hashed exactly once at any scale, with no cache (exchange
    // reuse spills to shuffle files: the memory-safe behavior at
    // 100 TB).
    val bands = minhashBands(df, textCol, idCol)
    val l = bands.toDF("a", "band", "x", "y")
    val r = bands.toDF("b", "band", "x", "y")
    l.join(r, l("band") === r("band") && l("x") === r("x") &&
        l("y") === r("y") && l("a") < r("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** SimHash (16-bit) over distinct token hashes: per-bit ±1 vote,
    * sign-aggregated. Computed as 16 conditional sums in ONE
    * groupBy — no row blowup, fully codegen'd. */
  def simhash(df: DataFrame, textCol: String, idCol: String, bits: Int = 16): DataFrame = {
    val tok = df
      .select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("t"))
      .select(col(idCol), tokenHash(col("t")).as("h"))
    val votes = (0 until bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val agg = tok.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val sh = (0 until bits).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(idCol), sh.as("simhash"))
  }

  /** SimHash dup groups: identical fingerprints bucket together. */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String): DataFrame =
    simhash(df, textCol, idCol)
      .groupBy(col("simhash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)

  /** N-gram Jaccard near-dup pairs: distinct word-3-gram shingles,
    * inverted-index self-join on shingle, similarity from exact
    * intersection/union counts. `minJaccard` prunes the output;
    * the shingle join bounds the candidate space.
    *
    * `maxDocFreq`: drop shingles appearing in more than that many
    * documents BEFORE the self-join. A corpus-wide hot shingle
    * (boilerplate, license header) pairs every pair of docs that
    * contain it — one such key at 100 TB explodes the inverted-index
    * join quadratically. Capped shingles are removed from the
    * UNIVERSE (intersections and sizes both), i.e. standard
    * stop-shingle semantics: Jaccard over the informative shingles
    * only. The DF-count aggregation shuffles on the same key as the
    * self-join, so AQE reuses the exchange. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, minJaccard: Double = 0.5,
                        maxDocFreq: Option[Long] = None): DataFrame =
    shinglePairStats(df, textCol, idCol, n, maxDocFreq)
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("n_inter"), col("n_a"), col("n_b"),
        col("jaccard"))

  /** Shingle-containment near-dup pairs: containment(A,B) =
    * |A∩B| / min(|A|,|B|) — the doc-inside-doc detector. A long page
    * that embeds a short page verbatim (wire-service article inside
    * a portal wrapper, quoted post inside a thread, mirror + added
    * boilerplate) has LOW Jaccard (the union is dominated by the
    * wrapper) but containment ≈ 1.0, so symmetric-Jaccard pipelines
    * systematically miss exactly the duplication pattern news/forum
    * crawls are full of. Same inverted-index plan and `maxDocFreq`
    * hot-shingle guard as [[ngramJaccardPairs]] — only the final
    * scoring expression differs ([[shinglePairStats]] is shared). */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       n: Int = 3, minContainment: Double = 0.8,
                       maxDocFreq: Option[Long] = None): DataFrame =
    shinglePairStats(df, textCol, idCol, n, maxDocFreq)
      .withColumn("containment", col("n_inter").cast("double") /
        least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("a"), col("b"), col("n_inter"), col("n_a"), col("n_b"),
        col("containment"))

  /** Candidate-pair overlap statistics shared by [[ngramJaccardPairs]]
    * and [[containmentPairs]]: distinct word-n-gram shingles per doc,
    * inverted-index self-join, exact (a, b, n_inter, n_a, n_b). */
  private def shinglePairStats(df: DataFrame, textCol: String,
      idCol: String, n: Int, maxDocFreq: Option[Long]): DataFrame = {
    // Join on a 64-bit hash of the shingle, not the string: long
    // shuffle keys beat variable-length strings, and the (bounded)
    // shingle table is computed once and cached instead of 3× for
    // the two join sides + the size table. Hashes come from the
    // native shingle_hash64 kernel — one byte pass per doc, no
    // interpreted per-shingle lambdas (value-identical to
    // xxhash64(shingle), ShingleHashSpec). Collision odds across
    // ~10^5 distinct shingles are ~1e-12 — the DuckDB oracle joins
    // on the raw string and agrees.
    graft.GraftExtensions.ensure(df.sparkSession)
    val shAll = Caching.cacheOnce(df.select(col(idCol).as("id"),
        explode(call_function("shingle_hash64", col(textCol), lit(n)))
          .as("sh")))
    val sh = maxDocFreq match {
      case Some(cap) =>
        // rows are distinct (id, shingle), so count(*) per shingle IS
        // document frequency
        val dfreq = shAll.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap)
        val capped = Caching.cacheOnce(
          shAll.join(dfreq, "sh").select(col("id"), col("sh")))
        // materialize the capped table, then release the raw one —
        // otherwise every invocation pins TWO copies of the shingle
        // table in executor storage for the session's lifetime
        capped.count()
        shAll.unpersist()
        capped
      case None => shAll
    }
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val l = sh.toDF("a", "sh")
    val r = sh.toDF("b", "sh")
    val inter = l.join(r, l("sh") === r("sh") && l("a") < r("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_inter"))
    // no broadcast hint on the size table: it is per-document (data-
    // proportional), so a hint would pin a growing frame into driver
    // memory at 100×. AQE broadcasts it while small, shuffles when not
    // (same reasoning as q_above_avg_orders).
    inter
      .join(sizes.toDF("a", "n_a"), "a")
      .join(sizes.toDF("b", "n_b"), "b")
  }

  /** Two-stage near-dup detection — candidate generation then
    * verification, the standard production recipe (Spark MLlib's
    * MinHashLSH approxSimilarityJoin has the same shape): (1)
    * MinHash-LSH banding proposes candidate pairs ([[minhashCandidates]]
    * — pairs form only inside band buckets, never corpus²), (2) each
    * candidate is VERIFIED by its exact word-n-gram Jaccard, computed
    * ONLY for the candidate set. LSH alone over-reports (a band is 2
    * of 8 mins — unrelated docs collide); the verify stage makes the
    * output exact w.r.t. the similarity measure while keeping the
    * exact computation candidate-proportional.
    *
    * Stage-2 plan: the pair list joins to A's shingles (shuffle on
    * id), then equi-joins (id, shingle-hash) against B's — a doc's
    * shingles are compared only against its candidates' shingles, and
    * no corpus-hot shingle key ever becomes a join key fanout
    * (contrast [[ngramJaccardPairs]]'s inverted index, which needs
    * `maxDocFreq` for that). Candidates sharing NO shingle simply
    * drop out of the intersection — they can't reach any positive
    * Jaccard threshold.
    *
    * @return (a, b, n_inter, n_a, n_b, jaccard) — the
    *         [[ngramJaccardPairs]] shape, restricted to LSH
    *         candidates and `jaccard ≥ minJaccard`
    */
  def minhashVerifiedPairs(df: DataFrame, textCol: String, idCol: String,
                           n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val cands = minhashCandidates(df, textCol, idCol)
      .select(col("a"), col("b"))
    // same hashed-shingle table as ngramJaccardPairs (the oracle
    // joins on the raw string and agrees; collision odds ~1e-12)
    graft.GraftExtensions.ensure(df.sparkSession)
    val sh = Caching.cacheOnce(df.select(col(idCol).as("id"),
        explode(call_function("shingle_hash64", col(textCol), lit(n)))
          .as("sh")))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = cands
      .join(sh.toDF("a", "sh"), "a")
      .join(sh.toDF("b", "sh"), Seq("b", "sh"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_inter"))
    // size table is data-proportional — no broadcast hint (AQE
    // decides), same reasoning as ngramJaccardPairs
    inter
      .join(sizes.toDF("a", "n_a"), "a")
      .join(sizes.toDF("b", "n_b"), "b")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("n_inter"), col("n_a"), col("n_b"),
        col("jaccard"))
  }

  /** Embedding cosine near-dup pairs; see Similarity.cosine for the
    * exact-parity formula. `queryPred` bounds the left side so the
    * pair space is (bounded q) × corpus, not corpus². */
  def embeddingCosinePairs(df: DataFrame, vecCol: String, idCol: String,
                           threshold: Double, queryPred: Column): DataFrame = {
    import Similarity.{dot, norm}
    val l = df.filter(queryPred).select(col(idCol).as("a"),
      col(vecCol).as("va"), norm(col(vecCol)).as("na"))
    val r = df.select(col(idCol).as("b"),
      col(vecCol).as("vb"), norm(col(vecCol)).as("nb"))
    l.crossJoin(r).filter(col("a") < col("b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any
    * n-gram shingle with an evaluation set — the standard guard
    * against test-set leakage into training data (GPT-3/PaLM-style
    * 13-gram overlap checks; `n` here is a parameter). Returns one
    * row per corpus doc: distinct shared-shingle count + flag.
    *
    * Scale shape: both sides reduce to distinct (doc, shingle-hash)
    * pairs — 64-bit hashes shuffle, never text. The eval set is
    * orders of magnitude smaller than the corpus (that's the use
    * case), so its hash set broadcasts and the probe is a broadcast
    * semi-ish join on the corpus side: no corpus shuffle at all.
    * The final per-doc count is one hash aggregate.
    */
  def contamination(corpus: DataFrame, evalSet: DataFrame, textCol: String,
      idCol: String, n: Int = 3): DataFrame = {
    graft.GraftExtensions.ensure(corpus.sparkSession)
    def hashed(df: DataFrame, out: String) = df
      .select(col(idCol).as(out),
        explode(call_function("shingle_hash64", col(textCol), lit(n)))
          .as("sh"))
    val evalHashes = hashed(evalSet, "eid").select(col("sh")).distinct()
    val hits = hashed(corpus, "id")
      .join(broadcast(evalHashes), Seq("sh"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0L).as("contaminated"))
  }

  /** Span-level (substring) duplication stats — the fine-grained
    * dedup of "Deduplicating Training Data Makes Language Models
    * Better" (Lee et al. 2022), which removes repeated ~50-token
    * SPANS rather than whole documents: boilerplate headers, license
    * blocks and templated passages duplicate across otherwise-unique
    * pages. Each document explodes into non-overlapping `width`-token
    * windows ([[graft.functions.TextFunctions.chunks]] with
    * stride=width: full coverage, partial tail kept); each span
    * reduces to a 60-bit md5-derived hash, a span is "duplicated"
    * when it occurs in more than one distinct document, and each doc
    * gets its duplicated-span ratio — the score a curation pipeline
    * thresholds on (or uses to excise just the repeated spans).
    *
    * Scale shape: documents explode to (doc, span-hash) rows — the
    * 64-bit hash shuffles, never the span text (suffix-array exact
    * substring matching is not expressible as a dataflow; fixed
    * windows are the standard distributed approximation). One hash
    * aggregate builds the span→distinct-doc-count table, one
    * equi-join + hash aggregate scores the docs; both map-side
    * combine, nothing is pairwise-quadratic in the corpus.
    */
  def spanDupStats(df: DataFrame, textCol: String, idCol: String,
      width: Int = 10): DataFrame = {
    import graft.functions.TextFunctions.{chunks, tokenHash}
    graft.GraftExtensions.ensure(df.sparkSession)
    // chunk hashes via the native chunk_hash60 kernel (≡ md5-based
    // tokenHash over chunks(), ChunkHashSpec) — kernel below the
    // explode, per the posexplode re-evaluation pitfall
    val spans = df
      .select(col(idCol).as("id"),
        call_function("chunk_hash60", col(textCol),
          lit(width), lit(width)).as("__ch"))
      .select(col("id"), explode(col("__ch")).as("sh"))
    val freq = spans.groupBy(col("sh"))
      .agg(countDistinct(col("id")).as("nd"))
    spans.join(freq, Seq("sh"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("nd") > 1L, 1L).otherwise(0L)).as("n_dup_spans"))
      .select(col("id"), col("n_spans"), col("n_dup_spans"),
        (col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
          .as("dup_ratio"))
  }

  /** [[spanDupStats]] APPLIED — the second half of Lee et al. 2022:
    * excise every corpus-duplicated span and emit the scrubbed
    * document, instead of only scoring it. Spans here are ALL
    * `width`-token windows (stride 1, so a duplicated passage is
    * caught at any alignment, not only on chunk boundaries); a span
    * is duplicated when it occurs more than once corpus-wide
    * (including twice inside one document — self-repetition is
    * boilerplate too); every token position covered by any
    * duplicated span is dropped and the survivors re-concatenate in
    * original order.
    *
    * Scale shape, all linear in corpus tokens: spans shuffle as
    * 64-bit hashes (one hash aggregate for the frequency table; the
    * span→freq join is data-proportional on BOTH sides, so it is
    * deliberately un-hinted — AQE picks broadcast only while the
    * duplicated-span table is genuinely small). Covered positions
    * explode `width`× the duplicated-span rows only — boilerplate
    * volume, not corpus volume. Reconstruction is one groupBy(doc)
    * with an array_sort over positions: per-doc state is the
    * document's own tokens, never a corpus-global structure. Hash
    * collisions across ~10^5 distinct spans are ~1e-12 and the
    * raw-string DuckDB oracle agrees (same argument as
    * ngramJaccardPairs).
    */
  def spanScrub(df: DataFrame, textCol: String, idCol: String,
      width: Int = 10, maxSpanFreq: Option[Int] = None): DataFrame = {
    graft.GraftExtensions.ensure(df.sparkSession)
    val base = df.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
    // span keys via the native token_window_hash64 kernel — the
    // xxhash64-of-token-slice fold, one byte pass per doc instead of
    // an interpreted lambda + slice allocation per position
    // (value-identical, TokenWindowHashSpec; tokens can't contain
    // the split char, so array equality ≡ the joined string equality
    // the oracle states)
    // kernel array and token count materialize BELOW the explode:
    // expressions in the same projection as a posexplode re-evaluate
    // per EXPLODED row (measured: the re-split alone made the whole
    // query ~3× slower — O(tokens²) regex work per doc)
    val spans = df
      .select(col(idCol).as("id"),
        size(tokens(col(textCol))).as("n"),
        call_function("token_window_hash64", col(textCol), lit(width))
          .as("__wh"))
      .select(col("id"), col("n"),
        posexplode(col("__wh")).as(Seq("start", "sh")))
    // duplicated-span detection as ONE pass: count over a
    // partition-by-sh window instead of aggregate + self-join — the
    // spans subtree (scan + tokenize + hash) would otherwise run
    // twice, because the aggregate's pruned projection defeats
    // exchange reuse (and partial aggregation changes the exchange
    // input, so widening the agg projection can't restore reuse
    // either). Trade-off stated honestly: the window has no map-side
    // combine, so a corpus-hot boilerplate span lands in ONE sorted
    // partition (occurrence-proportional), where the agg+join form
    // would pre-shrink it map-side at the cost of tokenizing the
    // corpus twice — measured here, one tokenize pass wins 2.3×.
    // For boilerplate-saturated corpora, pass `maxSpanFreq`: the
    // capped route below bounds every window partition.
    val wSh = org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))
    val dupSpans = maxSpanFreq match {
      case None =>
        spans.withColumn("cnt", count(lit(1)).over(wSh))
          .filter(col("cnt") > 1L).drop("cnt")
      case Some(cap) =>
        // Skew-guarded route (opt-in, second tokenize pass accepted):
        // a hash aggregate finds spans hotter than `cap` — map-side
        // partial combine shrinks even a corpus-hot span to one row
        // per map partition, so the count itself never skews. Hot
        // spans are duplicated BY DEFINITION (freq > cap ≥ 1), so
        // their positions come straight from the span rows through a
        // broadcast semi-join — no shuffle, no window. Only the
        // anti-joined remainder runs the one-pass window, and there
        // every sh has ≤ cap occurrences: sorted-partition size is
        // bounded by cap × (rows per sh), not by boilerplate volume.
        require(cap >= 1, s"maxSpanFreq must be >= 1, got $cap")
        val hot = spans.groupBy(col("sh"))
          .agg(count(lit(1)).as("hcnt"))
          .filter(col("hcnt") > cap).select(col("sh"))
        val hotCovered = spans.join(broadcast(hot), Seq("sh"), "left_semi")
        val cold = spans.join(broadcast(hot), Seq("sh"), "left_anti")
        val coldDup = cold.withColumn("cnt", count(lit(1)).over(wSh))
          .filter(col("cnt") > 1L).drop("cnt")
        hotCovered.unionByName(coldDup)
    }
    val covered = dupSpans
      // covered = every (doc, pos) under a duplicated span, clamped
      // at the doc end for the sub-width tail of a short document
      .select(col("id"), explode(sequence(col("start"),
        least(col("start") + lit(width - 1), col("n") - 1))).as("pos"))
      .distinct()
    // rebuild per doc from the covered-position SET, not a token
    // explode + anti-join: kept positions = array_except(0..n-1, cov)
    // (preserves first-array order = original order), then one
    // element_at map. Per-doc state is bounded by the longest single
    // document; the only shuffles are the dup-proportional covered
    // aggregate and a one-row-per-doc join.
    val covAgg = covered.groupBy(col("id"))
      .agg(collect_list(col("pos")).as("cov"))
    base.join(covAgg, Seq("id"), "left")
      .withColumn("kept",
        when(col("cov").isNull, sequence(lit(0), size(col("toks")) - 1))
          .otherwise(array_except(
            sequence(lit(0), size(col("toks")) - 1), col("cov"))))
      .select(col("id"), size(col("kept")).cast("long").as("n_kept"),
        concat_ws(" ", transform(col("kept"),
          p => element_at(col("toks"), p + lit(1)))).as("scrubbed"))
  }

  /** Cell-bucketed semantic dedup (the SemDeDup shape): assign every
    * vector to its nearest-centroid cell (Similarity.cellAssign —
    * one broadcast + one hash-agg argmax), then compare pairs ONLY
    * within a cell. Corpus² becomes Σ_cell |cell|² with the pair
    * space reached through an equi-join on the cell id — the
    * unbounded-corpus answer to [[embeddingCosinePairs]], whose
    * query side must stay bounded. Recall is approximate (near-dups
    * straddling a cell boundary are missed — mitigated by more/
    * trained centroids); the candidate-pair plan is exact within
    * cells and deterministic, so it oracle-checks.
    */
  def embeddingCellPairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, nCells: Int = 16): DataFrame = {
    import Similarity.dot
    val assigned = Similarity.cellAssign(df, vecCol, idCol, nCells)
    val l = assigned.select(col("cell"), col(idCol).as("a"),
      col(vecCol).as("va"), col("nrm").as("na"))
    val r = assigned.select(col("cell"), col(idCol).as("b"),
      col(vecCol).as("vb"), col("nrm").as("nb"))
    l.join(r, Seq("cell")).filter(col("a") < col("b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cell"), col("cos"))
  }
}
