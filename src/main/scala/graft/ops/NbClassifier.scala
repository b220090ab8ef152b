package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable Naive-Bayes document classifier — the model-based
  * filtering step of a training-data pipeline (the CCNet / DCLM /
  * FineWeb-Edu shape: train a cheap linear classifier on a labeled
  * seed set, score the whole corpus, keep what clears a threshold).
  * The reference engine ships only row plumbing (qin-cdc has no
  * analytics); this family exists because a corpus curator needs it,
  * same rationale as the dedup/ANN operators.
  *
  * Everything is RELATIONAL — no driver-side class list, no collected
  * vocabulary — so the same algebra runs on 32 cores or 1000
  * executors and mirrors verbatim into the DuckDB oracle:
  *  - training is one (label, token) hash aggregate (map-side partial
  *    combine; the shuffle carries post-combine token counts, never
  *    text bodies);
  *  - the model tables (counts per class, class totals, vocabulary
  *    size) are minCount-pruned and therefore bounded — they sit on
  *    the build side of AQE-decided joins;
  *  - prediction = explode + join + integer vote counting; the only
  *    doubles are single IEEE divisions of exact integers (correctly
  *    rounded, bit-identical on any engine), and ties break on label
  *    order, so results are partitioning-invariant.
  *
  * Smoothing: add-one (Laplace) over the PRUNED vocabulary V, with
  * class token totals N_c summed over the same pruned counts, so
  * per-class probabilities stay a proper distribution:
  * p(w|c) = (cnt_c(w) + 1) / (N_c + V).
  */
object NbClassifier {

  /** Multinomial NB token-count model: (label, token, cnt) with
    * cnt >= minCount. One explode + one hash aggregate; partial
    * aggregation makes the shuffle carry per-partition combined
    * counts. */
  def trainCounts(docs: DataFrame, toks: Column, label: Column,
                  minCount: Int = 2): DataFrame =
    // label materializes in a projection BELOW the Generate: an
    // expression in the same projection as an explode re-evaluates
    // per EXPLODED row, and labels can be expensive (the self-trained
    // quality label tokenizes — measured 3.5× on the gate corpus)
    docs.select(label.as("label"), toks.as("__t"))
      .select(col("label"), explode(col("__t")).as("token"))
      .groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Class doc priors: (label, n_docs). */
  def docPriors(docs: DataFrame, label: Column): DataFrame =
    docs.groupBy(label.as("label")).agg(count(lit(1)).as("n_docs"))

  // 1-row frame (v, plus per-label totals joined where needed):
  // vocabulary size of the pruned model
  private def vocabSize(counts: DataFrame): DataFrame =
    counts.select(col("token")).distinct()
      .agg(count(lit(1)).as("v"))

  private def classTotals(counts: DataFrame): DataFrame =
    counts.groupBy(col("label")).agg(sum(col("cnt")).as("n"))

  /** Multiclass prediction by per-token argmax votes.
    *
    * Each corpus token votes for the class maximizing the smoothed
    * relative frequency (cnt_c + 1) / (N_c + V); the document's
    * prediction is the majority vote. Votes and tallies are exact
    * integers; the per-token comparison divides exact integers once
    * (IEEE-correctly-rounded, so identical in any engine) and breaks
    * ties on label ascending. Tokens outside the model vocabulary
    * fall back to the all-unseen vote (argmax of 1 / (N_c + V), a
    * 1-row frame), so every token votes and n_votes sums to n_tok.
    *
    * Plan shape: the (token × label) grid is |V|·|C| rows — model-
    * sized, not corpus-sized; the corpus-proportional work is one
    * explode + one broadcast-or-shuffle join on token + one (doc,
    * label) count aggregate.
    *
    * @return (doc_id, pred, n_votes, n_tok)
    */
  // per-token argmax vote table (token, vote) — model-sized; shared
  // between the relational predictor and the kernel compile so the
  // smoothed-probability comparison and its tie-break happen in ONE
  // engine plan either way
  private def voteTable(counts: DataFrame): DataFrame = {
    val totals = classTotals(counts)
    val v = vocabSize(counts)
    // full (token, label) grid: unseen-in-class pairs still get the
    // +1 smoothing mass. The right side is the class list — bounded.
    val grid = counts.select(col("token")).distinct()
      .crossJoin(broadcast(totals))
      .join(counts, Seq("token", "label"), "left")
      .crossJoin(broadcast(v))
      .select(col("token"), col("label"),
        ((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("n") + col("v")).cast("double")).as("p"))
    // argmax as ONE hash aggregate, not a per-token window (r15):
    // min over the (−p, label) struct key IS the row_number(p DESC,
    // label ASC) = 1 row — identical choice including ties (−p is an
    // exact sign flip of a positive double; the struct comparison is
    // lexicographic) — and the aggregate partial-combines map-side
    // where the window form shuffled and SORTED the full |V|·|C|
    // grid.
    grid
      .groupBy(col("token"))
      .agg(min_by(col("label"),
        struct((-col("p")).as("np"), col("label"))).as("vote"))
      .select(col("token"), col("vote"))
  }

  // the out-of-vocabulary vote (1 row): every class offers 1/(N_c+V)
  private def oovVoteTable(counts: DataFrame): DataFrame =
    classTotals(counts).crossJoin(broadcast(vocabSize(counts)))
      .select(col("label"),
        (lit(1.0) / (col("n") + col("v")).cast("double")).as("p"))
      .orderBy(col("p").desc, col("label")).limit(1)
      .select(col("label").as("oov_vote"))

  def predictVotes(docs: DataFrame, idCol: String, toks: Column,
                   counts: DataFrame): DataFrame = {
    val voteOf = voteTable(counts)
    val oov = oovVoteTable(counts)

    val tally = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(toks).as("token"))
      .join(voteOf, Seq("token"), "left")
      .crossJoin(broadcast(oov))
      .select(col("doc_id"),
        coalesce(col("vote"), col("oov_vote")).as("vote"))
      .groupBy(col("doc_id"), col("vote"))
      .agg(count(lit(1)).as("n_votes"))
    // per-doc argmax + total over the tally (≤ |classes| rows per
    // doc) as ONE hash aggregate (r15): min over the
    // (−n_votes, vote) struct key IS the row_number(n_votes DESC,
    // vote ASC) = 1 row — identical choice including ties (−n_votes
    // is an exact long negation; struct comparison is lexicographic)
    // — and the aggregate partial-combines map-side where the window
    // form shuffled and SORTED every tally row
    tally
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("n_votes")).as("nn"), col("vote"))).as("best"),
        sum(col("n_votes")).as("n_tok"))
      .select(col("doc_id"), col("best.vote").as("pred"),
        (-col("best.nn")).as("n_votes"), col("n_tok"))
  }

  /** Full multinomial NB in log space: per-class posterior
    * log p(c) + Σ_i log p(w_i|c), argmax with label-ascending
    * tiebreak — the textbook classifier, kept beside the
    * oracle-checkable [[predictVotes]]/[[scoreBinary]] forms because
    * `log()` is a libm transcendental whose low bits differ across
    * ENGINES (so no DuckDB hash-check; pinned by spec instead), but
    * within one JVM it is deterministic, and the per-(doc, class)
    * sum folds the token log-probs IN POSITION ORDER, so results are
    * partitioning-invariant.
    *
    * Plan shape: the corpus-proportional stream is exploded once and
    * joined once against a per-token map of class log-probs
    * (model-bounded build side); the |C|-way expansion happens on
    * the post-join rows, and the per-(doc, class) regroup is the one
    * doc-keyed shuffle.
    *
    * @return (doc_id, pred, logp): logp = winning class posterior
    */
  def predictLog(docs: DataFrame, idCol: String, toks: Column,
                 counts: DataFrame, priors: DataFrame): DataFrame = {
    val totals = classTotals(counts)
    val v = vocabSize(counts)
    val grid = counts.select(col("token")).distinct()
      .crossJoin(broadcast(totals))
      .join(counts, Seq("token", "label"), "left")
      .crossJoin(broadcast(v))
      .select(col("token"), col("label"),
        log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("n") + col("v")).cast("double")).as("lp"))
    val tokMap = grid.groupBy(col("token"))
      .agg(map_from_entries(collect_list(struct(col("label"), col("lp"))))
        .as("lps"))
    // class-side constants: log prior and the all-unseen fallback
    val classes = totals.crossJoin(broadcast(v))
      .join(priors, Seq("label"), "left")
      .select(col("label"),
        log(lit(1.0) / (col("n") + col("v")).cast("double"))
          .as("lp_oov"),
        log(coalesce(col("n_docs"), lit(0L)).cast("double"))
          .as("lp_prior"))

    val pos = docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("__t"))
      .select(col("doc_id"), posexplode(col("__t")).as(Seq("pos", "token")))
    val perClass = pos
      .join(tokMap, Seq("token"), "left")
      .crossJoin(broadcast(classes))
      .select(col("doc_id"), col("label"), col("pos"),
        coalesce(element_at(col("lps"), col("label")), col("lp_oov"))
          .as("lp"),
        col("lp_prior"))
    val post = perClass
      .groupBy(col("doc_id"), col("label"))
      .agg(sort_array(collect_list(struct(col("pos"), col("lp"))))
        .as("ls"),
        first(col("lp_prior")).as("lp_prior"))
      .select(col("doc_id"), col("label"),
        (aggregate(transform(col("ls"), x => x.getField("lp")),
          lit(0.0), (acc, x) => acc + x) + col("lp_prior")).as("logp"))
    post
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("logp").desc, col("label"))))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("label").as("pred"), col("logp"))
  }

  /** Binary NB likelihood-ratio score over a token prefix.
    *
    * score = prior_ratio · Π_i r(w_i) over the first `prefix`
    * tokens, where r(w) = p(w|pos) / p(w|neg) with the smoothed
    * per-class probabilities above; pred = score >= 1. The product
    * folds the per-position ratios IN TOKEN ORDER (sort_array on
    * (pos, r) + left-fold from 1.0), so the double is invariant to
    * partitioning and bit-identical in the oracle's
    * list_reduce(list(... ORDER BY pos)). Every arithmetic op is a
    * single correctly-rounded IEEE ÷ or × of exact integers — no
    * transcendentals (same rationale as Bm25's rational idf: ln()
    * low bits differ across engines).
    *
    * The prefix bound (fastText-style truncation) is ALSO the
    * overflow guard: per-token ratios are bounded by
    * (maxCnt+1)·(N_neg+V)/(N_pos+V), so 40 factors stay far inside
    * double range where an unbounded document could overflow to inf.
    * And it bounds per-doc score cost at 100 TB.
    *
    * @param counts binary model from [[trainCounts]] whose label
    *               column holds exactly two values
    * @param priors (label, n_docs) from [[docPriors]] on the train set
    * @return (doc_id, n_seen, score, pred): n_seen = prefix tokens
    *         found in the model vocabulary
    */
  // 1-row scalars: N_pos, N_neg, V, doc priors
  private def binaryScalars(counts: DataFrame, priors: DataFrame,
      posLabel: String): DataFrame =
    classTotals(counts)
      .agg(sum(when(col("label") === posLabel, col("n")).otherwise(0L))
        .as("n_pos"),
        sum(when(col("label") =!= posLabel, col("n")).otherwise(0L))
          .as("n_neg"))
      .crossJoin(broadcast(vocabSize(counts)))
      .crossJoin(broadcast(priors.agg(
        sum(when(col("label") === posLabel, col("n_docs")).otherwise(0L))
          .as("d_pos"),
        sum(when(col("label") =!= posLabel, col("n_docs")).otherwise(0L))
          .as("d_neg"))))

  // per-token smoothed likelihood-ratio table (model-sized)
  private def binaryRatios(counts: DataFrame, posLabel: String,
      scalars: DataFrame): DataFrame =
    counts
      .groupBy(col("token"))
      .agg(sum(when(col("label") === posLabel, col("cnt")).otherwise(0L))
        .as("c_pos"),
        sum(when(col("label") =!= posLabel, col("cnt")).otherwise(0L))
          .as("c_neg"))
      .crossJoin(broadcast(scalars.select(col("n_pos"), col("n_neg"),
        col("v"))))
      .select(col("token"),
        (((col("c_pos") + lit(1L)).cast("double") /
          (col("n_pos") + col("v")).cast("double")) /
          ((col("c_neg") + lit(1L)).cast("double") /
            (col("n_neg") + col("v")).cast("double"))).as("r"))

  def scoreBinary(docs: DataFrame, idCol: String, toks: Column,
                  counts: DataFrame, priors: DataFrame, posLabel: String,
                  prefix: Int = 40): DataFrame = {
    val scalars = binaryScalars(counts, priors, posLabel)
    val ratios = binaryRatios(counts, posLabel, scalars)

    val pos = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(slice(toks, 1, prefix)).as(Seq("pos", "token")))
    val perTok = pos.join(ratios, Seq("token"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"), col("pos"),
        col("r").isNotNull.cast("long").as("seen"),
        coalesce(col("r"),
          (lit(1.0) / (col("n_pos") + col("v")).cast("double")) /
            (lit(1.0) / (col("n_neg") + col("v")).cast("double"))).as("r"),
        (col("d_pos").cast("double") / col("d_neg").cast("double"))
          .as("prior"))
    perTok
      .groupBy(col("doc_id"))
      .agg(sum(col("seen")).as("n_seen"),
        sort_array(collect_list(struct(col("pos"), col("r")))).as("rs"),
        first(col("prior")).as("prior"))
      .select(col("doc_id"), col("n_seen"),
        (aggregate(transform(col("rs"), x => x.getField("r")),
          lit(1.0), (acc, x) => acc * x) * col("prior")).as("score"))
      .withColumn("pred", col("score") >= 1.0)
  }

  /** Collect the binary model into the kernel's compiled form —
    * size-gated (driver memory: the collect materializes the ratio
    * table on the driver before it broadcasts); the ratios, the
    * out-of-vocabulary default and the prior are all evaluated BY
    * THE ENGINE from the same plan the relational scorer uses, so
    * the doubles are the relational scorer's doubles.
    *
    * @throws ModelTooLargeException when the pruned model exceeds
    *         `maxModelRows` — callers with a relational fallback
    *         catch exactly this; any other failure propagates
    */
  def compileBinary(counts: DataFrame, priors: DataFrame,
      posLabel: String, maxModelRows: Long = 5000000L)
  : (Array[String], Array[Double], Double, Double) = {
    require(maxModelRows < Int.MaxValue, s"bad gate $maxModelRows")
    // cache the training aggregate so its several references inside
    // the one compile plan run once (uncached it re-ran the full
    // (label, token) aggregate 3×, measured as the whole kernel-query
    // overhead); a cache THIS call created is released before
    // returning — the compiled arrays carry everything the kernel
    // needs. repartition(1) pre-cache: see compileVotes.
    val (cached, fresh) = Caching.cacheOnceTracked(counts.repartition(1))
    try {
      val scalars = binaryScalars(cached, priors, posLabel)
      // ONE driver action: ratio rows ∪ the (dflt, prior) scalar row,
      // tagged — the two-action form paid query planning + codegen
      // per action (the dominant fixture-scale cost, r14); every
      // double is still engine-evaluated from the same plans
      val rows = binaryRatios(cached, posLabel, scalars)
        .limit(maxModelRows.toInt + 1)
        .select(lit(1).as("kind"), col("token"), col("r"),
          lit(null).cast("double").as("prior"))
        .unionAll(scalars.select(lit(0).as("kind"),
          lit(null).cast("string").as("token"),
          ((lit(1.0) / (col("n_pos") + col("v")).cast("double")) /
            (lit(1.0) / (col("n_neg") + col("v")).cast("double")))
            .as("r"),
          (col("d_pos").cast("double") / col("d_neg").cast("double"))
            .as("prior")))
        .collect()
      val ratios = rows.filter(_.getInt(0) == 1)
      if (ratios.length > maxModelRows)
        throw new ModelTooLargeException(
          s"nb kernel: model exceeds $maxModelRows tokens — use the " +
            "relational scoreBinary path for unbounded models, or " +
            "raise maxModelRows")
      val sorted = ratios.sortBy(_.getString(1))
      val s = rows.find(_.getInt(0) == 0).get
      (sorted.map(_.getString(1)), sorted.map(_.getDouble(2)),
        s.getDouble(2), s.getDouble(3))
    } finally if (fresh) cached.unpersist(blocking = false)
  }

  /** Broadcast a compiled binary model for the serve path: one
    * torrent distribution per executor instead of a model-sized
    * literal re-serialized with every task binary. The
    * serve-many-batches callers (the `nb-filter` curation stage)
    * broadcast ONCE at assembly and reuse the handle across
    * micro-batches. */
  def broadcastBinary(spark: org.apache.spark.sql.SparkSession,
      model: (Array[String], Array[Double], Double, Double),
      prefix: Int = 40)
  : org.apache.spark.broadcast.Broadcast[graft.functions.NbRatios] =
    spark.sparkContext.broadcast(new graft.functions.NbRatios(
      model._1, model._2, model._3, model._4, prefix))

  /** Scan-stage kernel twin of [[scoreBinary]] for BOUNDED models —
    * one native call per document, no explode/join/regroup.
    * Value-identical when the relational form tokenizes with
    * [[graft.functions.TextFunctions.tokens]] (the kernel hard-codes
    * that contract); docs with NULL text drop, as they do from the
    * relational scorer's explode. Broadcasts the model once and
    * scores through the broadcast transport
    * ([[graft.functions.NbScoreBc]]). */
  def scoreBinaryCompiled(docs: DataFrame, idCol: String,
      textCol: String,
      model: (Array[String], Array[Double], Double, Double),
      prefix: Int = 40): DataFrame =
    scoreBinaryCompiled(docs, idCol, textCol,
      broadcastBinary(docs.sparkSession, model, prefix))

  /** [[scoreBinaryCompiled]] over an already-broadcast model — the
    * per-micro-batch form (no per-call broadcast). */
  def scoreBinaryCompiled(docs: DataFrame, idCol: String,
      textCol: String,
      bc: org.apache.spark.broadcast.Broadcast[graft.functions.NbRatios])
  : DataFrame = {
    val kernel = graft.functions.BroadcastScore.nb(col(textCol), bc)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"), kernel.as("__r"))
      .select(col("doc_id"), col("__r.n_seen").as("n_seen"),
        col("__r.score").as("score"), col("__r.pred").as("pred"))
  }

  /** Collect the multiclass vote model into the kernel's compiled
    * form — (vocab tokens, per-token vote as a label index, labels
    * in the engine's string order, out-of-vocabulary vote index).
    * The per-token argmax, its tie-break, the OOV argmax, and the
    * label ORDERING are all evaluated BY THE ENGINE from the same
    * plans the relational predictor uses ([[voteTable]] /
    * [[oovVoteTable]] / an engine `ORDER BY label`), so the kernel's
    * lowest-index-wins tally tie-break IS the relational
    * `row_number() ... ORDER BY n_votes DESC, vote`.
    *
    * @throws ModelTooLargeException when the pruned vocabulary
    *         exceeds `maxModelRows` — callers with a relational
    *         fallback catch exactly this; any other failure
    *         propagates
    */
  def compileVotes(counts: DataFrame, maxModelRows: Long = 5000000L)
  : (Array[String], Array[Int], Array[String], Int) = {
    require(maxModelRows < Int.MaxValue, s"bad gate $maxModelRows")
    // ONE driver action: labels ∪ vote rows ∪ oov row, tagged. The
    // three-action form (labels, votes, oov) paid query planning +
    // codegen per action — ~0.4-1.5 s each at fixture scale, THE
    // dominant cost of the langid-model gate (r14 Scratch A/B); the
    // union keeps every argmax/tie-break/ordering engine-evaluated
    // exactly as before. The cache still dedupes the six references
    // to the training aggregate inside the one plan.
    // repartition(1) BEFORE caching: the pruned count table is
    // model-bounded (the collect gate enforces it), but cached at
    // the session shuffle partition count every one of the six
    // reads launches that many near-empty tasks per stage — a
    // 1-partition cache reads in one. The training aggregate itself
    // stays parallel (the exchange moves only post-prune model rows).
    // Caveat (r15 advice): an OVER-gate model funnels through this
    // one task while materializing, before the collect gate can
    // throw — callers whose corpus can exceed maxModelRows tokens
    // should use the relational predictVotes path (the documented
    // ModelTooLargeException contract) rather than relying on the
    // kernel compile to fail gracefully.
    val (cached, fresh) = Caching.cacheOnceTracked(counts.repartition(1))
    try {
      val rows = cached.select(col("label")).distinct()
        .select(lit(0).as("kind"), lit(null).cast("string").as("token"),
          col("label"))
        .unionAll(voteTable(cached).limit(maxModelRows.toInt + 1)
          .select(lit(1).as("kind"), col("token"),
            col("vote").as("label")))
        .unionAll(oovVoteTable(cached)
          .select(lit(2).as("kind"), lit(null).cast("string").as("token"),
            col("oov_vote").as("label")))
        .collect()
      // sort labels in UTF-8 BYTE order — exactly the engine's
      // `ORDER BY label` (UTF8String binary) the three-action form
      // delegated; Java String order diverges on supplementary chars
      val labels = rows.filter(_.getInt(0) == 0).map(_.getString(2))
        .sortWith { (a, b) =>
          val (x, y) = (a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val n = math.min(x.length, y.length)
          var i = 0
          while (i < n && x(i) == y(i)) i += 1
          if (i < n) (x(i) & 0xff) < (y(i) & 0xff) else x.length < y.length
        }
      val idx = labels.zipWithIndex.toMap
      val votes = rows.filter(_.getInt(0) == 1)
      if (votes.length > maxModelRows)
        throw new ModelTooLargeException(
          s"nb vote kernel: model exceeds $maxModelRows tokens — use " +
            "the relational predictVotes path for unbounded models, " +
            "or raise maxModelRows")
      val sorted = votes.sortBy(_.getString(1))
      val oov = rows.find(_.getInt(0) == 2).get.getString(2)
      (sorted.map(_.getString(1)), sorted.map(r => idx(r.getString(2))),
        labels, idx(oov))
    } finally if (fresh) cached.unpersist(blocking = false)
  }

  /** Broadcast a compiled vote model for the serve path — one
    * torrent distribution per executor (the [[broadcastBinary]]
    * contract); the `langid-filter mode = "model"` curation stage
    * broadcasts ONCE at assembly and reuses the handle across
    * micro-batches. */
  def broadcastVotes(spark: org.apache.spark.sql.SparkSession,
      model: (Array[String], Array[Int], Array[String], Int))
  : org.apache.spark.broadcast.Broadcast[graft.functions.NbVoteModel] =
    spark.sparkContext.broadcast(new graft.functions.NbVoteModel(
      model._1, model._2, model._3, model._4))

  /** Scan-stage kernel twin of [[predictVotes]] for BOUNDED models —
    * one native tally per document, no explode/join/regroup.
    * Value-identical when the relational form tokenizes with
    * [[graft.functions.TextFunctions.tokens]] (the kernel hard-codes
    * that contract — char-gram callers hand it the re-spaced
    * [[graft.functions.TextFunctions.charGramText]] projection and
    * filter empty gram text, matching the relational explode of an
    * empty gram array); docs with NULL text drop, as they do from
    * the relational explode. */
  def predictVotesCompiled(docs: DataFrame, idCol: String,
      textCol: String,
      bc: org.apache.spark.broadcast.Broadcast[graft.functions.NbVoteModel])
  : DataFrame = {
    val kernel = graft.functions.BroadcastScore.nbVote(col(textCol), bc)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"), kernel.as("__r"))
      .select(col("doc_id"), col("__r.pred").as("pred"),
        col("__r.n_votes").as("n_votes"), col("__r.n_tok").as("n_tok"))
  }
}
