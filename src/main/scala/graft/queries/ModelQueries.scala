package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.ops.{Dsir, LangModel, NbClassifier}

/** Model-based corpus filtering — the trainable-classifier /
  * count-LM scoring family (CCNet / DCLM / FineWeb-Edu shape) over
  * `documents`. Every query's doubles are single correctly-rounded
  * IEEE ops or ordered folds, so every entry hash-checks against
  * DuckDB bit-for-bit (the Bm25 discipline).
  */
object ModelQueries {

  // scan widened to half the session slots when the parquet arrives
  // as fewer splits (gate-scale files are ONE row-group, so every
  // corpus featurize otherwise runs single-task; a no-op on real
  // multi-split inputs — ops/Spread scaladoc has the r14 A/B).
  // Filters above still push below the exchange to the scan.
  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.ops.Spread.auto(Tables.load(s, dir, "documents"))

  private def toks = TextFunctions.tokens(col("text"))

  // oracle-side tokenizer, mirrored from TextFunctions.tokens
  private val sqlToks = "string_split_regex(trim(text), ' +')"
  private val sqlStop = "('the', 'a', 'of', 'and', 'in')"
  // oracle-side quality label, mirrored from the text_quality pair
  private val sqlQualityLabel =
    s"""CASE WHEN CAST(len(list_filter($sqlToks, t -> t IN $sqlStop))
       |          AS DOUBLE) / CAST(len($sqlToks) AS DOUBLE)
       |        + CASE WHEN len($sqlToks) BETWEEN 5 AND 500
       |               THEN 1.0 ELSE 0.0 END >= 1.08
       |     THEN 'pos' ELSE 'neg' END""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NB training table: one (label, token) hash aggregate with
    // map-side combine; minCount prune bounds the model
    "model_nb_counts" -> ((s, dir) =>
      NbClassifier.trainCounts(docs(s, dir), toks, col("lang"), minCount = 2)
        .orderBy(col("label"), col("token"))),

    // multiclass language prediction by exact per-token argmax votes
    // (trained and scored on the corpus; lang is the supervision)
    "model_nb_predict" -> ((s, dir) => {
      val d = docs(s, dir)
      val counts = NbClassifier.trainCounts(d, toks, col("lang"), 2)
      NbClassifier.predictVotes(d, "doc_id", toks, counts)
        .orderBy(col("doc_id"))
    }),

    // binary NB likelihood-ratio score, en vs rest, over a 40-token
    // prefix (the fastText-style truncation that also bounds the
    // ratio product inside double range)
    "model_nb_binary" -> ((s, dir) => {
      val d = docs(s, dir)
      val lab = when(col("lang") === "en", lit("pos")).otherwise(lit("neg"))
      val counts = NbClassifier.trainCounts(d, toks, lab, 2)
      val priors = NbClassifier.docPriors(d, lab)
      NbClassifier.scoreBinary(d, "doc_id", toks, counts, priors,
        posLabel = "pos", prefix = 40)
        .orderBy(col("doc_id"))
    }),

    // the compiled kernel twin of model_nb_binary — same oracle, so
    // kernel ≡ relational ≡ DuckDB is a standing three-way agreement
    "model_nb_kernel" -> ((s, dir) => {
      val d = docs(s, dir)
      val lab = when(col("lang") === "en", lit("pos")).otherwise(lit("neg"))
      val counts = NbClassifier.trainCounts(d, toks, lab, 2)
      val priors = NbClassifier.docPriors(d, lab)
      NbClassifier.scoreBinaryCompiled(d, "doc_id", "text",
        NbClassifier.compileBinary(counts, priors, "pos"), prefix = 40)
        .orderBy(col("doc_id"))
    }),

    // classifier EVALUATION: the confusion matrix of the vote
    // classifier against the lang supervision — the per-class
    // precision/recall raw material a curator reads before trusting
    // a model filter. All integers; two model-sized aggregates on
    // top of the prediction plan.
    "model_nb_confusion" -> ((s, dir) => {
      val d = docs(s, dir)
      val counts = NbClassifier.trainCounts(d, toks, col("lang"), 2)
      NbClassifier.predictVotes(d, "doc_id", toks, counts)
        .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred"))
    }),

    // binary-classifier EVALUATION at the decision threshold:
    // tp/fp/tn/fn of the en-vs-rest likelihood-ratio classifier —
    // one conditional aggregate over the scored corpus
    "model_nb_eval_binary" -> ((s, dir) => {
      val d = docs(s, dir)
      val lab = when(col("lang") === "en", lit("pos")).otherwise(lit("neg"))
      val counts = NbClassifier.trainCounts(d, toks, lab, 2)
      val priors = NbClassifier.docPriors(d, lab)
      NbClassifier.scoreBinary(d, "doc_id", toks, counts, priors,
        posLabel = "pos", prefix = 40)
        .join(d.select(col("doc_id"),
          (col("lang") === "en").as("is_pos")), Seq("doc_id"))
        .agg(
          sum(when(col("pred") && col("is_pos"), 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("pred") && !col("is_pos"), 1L).otherwise(0L))
            .as("fp"),
          sum(when(!col("pred") && !col("is_pos"), 1L).otherwise(0L))
            .as("tn"),
          sum(when(!col("pred") && col("is_pos"), 1L).otherwise(0L))
            .as("fn"))
    }),

    // SELF-TRAINED quality classifier (the DCLM shape: no external
    // labels — the heuristic quality score labels a seed split, NB
    // generalizes it to token evidence)
    "model_nb_quality" -> ((s, dir) => {
      val d = docs(s, dir)
      val lab = when(TextFunctions.qualityScore(col("text")) >= 1.08,
        lit("pos")).otherwise(lit("neg"))
      val counts = NbClassifier.trainCounts(d, toks, lab, 2)
      val priors = NbClassifier.docPriors(d, lab)
      NbClassifier.scoreBinary(d, "doc_id", toks, counts, priors,
        posLabel = "pos", prefix = 40)
        .orderBy(col("doc_id"))
    }),

    // pruned bigram model table (stupid-backoff training IS
    // counting — Brants et al. 2007)
    "model_lm_bigrams" -> ((s, dir) =>
      LangModel.bigrams(docs(s, dir), toks, minCount = 2)
        .orderBy(col("w1"), col("w2"))),

    // per-doc mean stupid-backoff transition score + hit counts
    "model_lm_score" -> ((s, dir) => {
      val d = docs(s, dir)
      val uni = LangModel.unigrams(d, toks)
      val big = LangModel.bigrams(d, toks, minCount = 2)
      LangModel.score(d, "doc_id", toks, uni, big)
        .orderBy(col("doc_id"))
    }),

    // trigram LM with two-level backoff (trigram → bigram → smoothed
    // unigram), the CCNet-grade fluency signal
    "model_lm_trigram" -> ((s, dir) => {
      val d = docs(s, dir)
      val uni = LangModel.unigrams(d, toks)
      val big = LangModel.bigrams(d, toks, minCount = 2)
      val tri = LangModel.trigrams(d, toks, minCount = 2)
      LangModel.scoreTrigram(d, "doc_id", toks, uni, big, tri)
        .orderBy(col("doc_id"))
    }),

    // the compiled kernel twin of model_lm_score — same oracle, so
    // kernel ≡ relational ≡ DuckDB is a standing three-way agreement
    "model_lm_kernel" -> ((s, dir) => {
      val d = docs(s, dir)
      val uni = LangModel.unigrams(d, toks)
      val big = LangModel.bigrams(d, toks, minCount = 2)
      LangModel.scoreCompiled(d, "doc_id", "text", uni, big)
        .orderBy(col("doc_id"))
    }),

    // CCNet-style corpus bucketing: head/middle/tail by LM-score
    // quartiles. The cutoffs come from the banded distributed
    // selection (ops/ExactQuantiles — bit-identical to
    // quantile_cont), NOT a global sort: at 100 TB the corpus never
    // sorts, it aggregates a histogram and ranks two bands.
    "model_lm_buckets" -> ((s, dir) => {
      val d = docs(s, dir)
      val uni = LangModel.unigrams(d, toks)
      val big = LangModel.bigrams(d, toks, minCount = 2)
      // cacheOnce: the scoring subtree feeds BOTH the quantile
      // cutoffs and the labeling pass — uncached it executes twice
      val scored = graft.ops.Caching.cacheOnce(
        LangModel.score(d, "doc_id", toks, uni, big)
          .select(col("doc_id"), col("mean_p")))
      val cuts = graft.ops.ExactQuantiles.percentiles(
        scored.withColumn("__g", lit(1)), "__g",
        Seq("mean_p" -> Seq(0.25, 0.75)))
        .groupBy(col("__g"))
        .agg(max(when(col("p") === 0.25, col("value"))).as("c25"),
          max(when(col("p") === 0.75, col("value"))).as("c75"))
        .drop("__g")
      scored.crossJoin(broadcast(cuts))
        .select(col("doc_id"), col("mean_p"),
          when(col("mean_p") > col("c75"), "head")
            .when(col("mean_p") >= col("c25"), "middle")
            .otherwise("tail").as("bucket"))
        .orderBy(col("doc_id"))
    }),

    // per-language LM scoring (the CCNet per-group form): every
    // document scored against ITS OWN language's model — count
    // tables keyed by (lang, ngram), trained in one pass
    "model_lm_score_by_lang" -> ((s, dir) => {
      val d = docs(s, dir)
      val uni = LangModel.unigramsBy(d, col("lang"), toks)
      val big = LangModel.bigramsBy(d, col("lang"), toks, minCount = 2)
      LangModel.scoreBy(d, "doc_id", col("lang"), toks, uni, big)
        .withColumnRenamed("g", "lang")
        .orderBy(col("doc_id"))
    }),

    // the compiled model-BANK kernel twin of model_lm_score_by_lang
    // (one broadcast holding every language's model, one native call
    // per doc against its own language) — same oracle, so
    // kernel ≡ relational ≡ DuckDB is a standing three-way agreement
    "model_lm_perlang_kernel" -> ((s, dir) => {
      val d = docs(s, dir)
      val uni = LangModel.unigramsBy(d, col("lang"), toks)
      val big = LangModel.bigramsBy(d, col("lang"), toks, minCount = 2)
      val bank = LangModel.broadcastBank(s,
        LangModel.compileModelBy(uni, big))
      LangModel.scoreByCompiled(d, "doc_id", "text", "lang", bank)
        .withColumnRenamed("g", "lang")
        .orderBy(col("doc_id"))
    }),

    // per-language trigram twin: each document walks ITS OWN
    // language's two-level backoff ladder
    "model_lm_trigram_by_lang" -> ((s, dir) => {
      val d = docs(s, dir)
      val uni = LangModel.unigramsBy(d, col("lang"), toks)
      val big = LangModel.bigramsBy(d, col("lang"), toks, minCount = 2)
      val tri = LangModel.trigramsBy(d, col("lang"), toks, minCount = 2)
      LangModel.scoreTrigramBy(d, "doc_id", col("lang"), toks,
        uni, big, tri)
        .withColumnRenamed("g", "lang")
        .orderBy(col("doc_id"))
    }),

    // the model-bank kernel twin of model_lm_trigram_by_lang — same
    // oracle (kernel ≡ relational ≡ DuckDB three-way agreement)
    "model_lm_perlang3_kernel" -> ((s, dir) => {
      val d = docs(s, dir)
      val uni = LangModel.unigramsBy(d, col("lang"), toks)
      val big = LangModel.bigramsBy(d, col("lang"), toks, minCount = 2)
      val tri = LangModel.trigramsBy(d, col("lang"), toks, minCount = 2)
      val bank = LangModel.broadcastBank(s,
        LangModel.compileModelBy(uni, big, Some(tri)))
      LangModel.scoreTrigramByCompiled(d, "doc_id", "text", "lang", bank)
        .withColumnRenamed("g", "lang")
        .orderBy(col("doc_id"))
    }),

    // the ACTUAL CCNet recipe: one LM per language (count tables
    // keyed by (lang, ngram), trained in one pass), every document
    // scored against ITS OWN language's model, and head/middle/tail
    // cut WITHIN language — a fluent-but-rare-language doc is judged
    // against its peers, not the majority language's distribution
    "model_lm_buckets_by_lang" -> ((s, dir) => {
      val d = docs(s, dir)
      val uni = LangModel.unigramsBy(d, col("lang"), toks)
      val big = LangModel.bigramsBy(d, col("lang"), toks, minCount = 2)
      // cacheOnce: the scoring subtree feeds BOTH the per-lang
      // cutoffs and the labeling pass
      val scored = graft.ops.Caching.cacheOnce(
        LangModel.scoreBy(d, "doc_id", col("lang"), toks, uni, big)
          .select(col("doc_id"), col("g").as("lang"), col("mean_p")))
      val cuts = graft.ops.ExactQuantiles.percentiles(
        scored, "lang", Seq("mean_p" -> Seq(0.25, 0.75)))
        .groupBy(col("lang"))
        .agg(max(when(col("p") === 0.25, col("value"))).as("c25"),
          max(when(col("p") === 0.75, col("value"))).as("c75"))
      scored.join(broadcast(cuts), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("mean_p"),
          when(col("mean_p") > col("c75"), "head")
            .when(col("mean_p") >= col("c25"), "middle")
            .otherwise("tail").as("bucket"))
        .orderBy(col("doc_id"))
    }),

    // —— space-free-script (CJK/Thai) mode: the SAME LM/NB algebra
    // over character n-grams (the fastText/CCNet fallback
    // tokenization — whitespace tokens don't exist in zh/ja/th), on
    // REAL zh/ja/th/ko sample text (MultilingualFixture ∪ documents,
    // carried inline through both engines) ——

    "model_lm_chargram_by_lang" -> ((s, dir) => {
      // constant slice: a char-5-gram stream is ~5x the word stream,
      // and the gate's job is correctness, not corpus-scale timing
      // (SCALE.md carries the scale shape); < 2000 covers ALL of
      // sf0.01, so driver-gate hashes are unchanged
      val c = MultilingualFixture.corpus(s,
        docs(s, dir).filter(col("doc_id") < 2000))
      val ct = TextFunctions.charNgrams(col("text"), 5)
      val uni = LangModel.unigramsBy(c, col("lang"), ct)
      val big = LangModel.bigramsBy(c, col("lang"), ct, minCount = 2)
      LangModel.scoreBy(c, "doc_id", col("lang"), ct, uni, big)
        .withColumnRenamed("g", "lang")
        .orderBy(col("doc_id"))
    }),

    // bank-kernel twin: char-gram models ride the SAME broadcast
    // model bank — charGramText re-spaces the gram stream (grams are
    // space-free by the ▁ normalization), so the kernel's tokenizer
    // recovers exactly charNgrams(text) and char-gram mode is a
    // projection, not a kernel fork
    "model_lm_chargram_kernel" -> ((s, dir) => {
      val c0 = MultilingualFixture.corpus(s,
        docs(s, dir).filter(col("doc_id") < 2000))
      val ct = TextFunctions.charNgrams(col("text"), 5)
      val uni = LangModel.unigramsBy(c0, col("lang"), ct)
      val big = LangModel.bigramsBy(c0, col("lang"), ct, minCount = 2)
      val bank = LangModel.broadcastBank(s,
        LangModel.compileModelBy(uni, big))
      val c = c0.withColumn("__gt",
        TextFunctions.charGramText(col("text"), 5))
      LangModel.scoreByCompiled(c, "doc_id", "__gt", "lang", bank)
        .withColumnRenamed("g", "lang")
        .select(col("doc_id"), col("lang"), col("n_trans"),
          col("n_hits"), col("mean_p"))
        .orderBy(col("doc_id"))
    }),

    // char-trigram language ID — the fastText shape: NB argmax votes
    // over character trigrams, the signal that survives scripts with
    // no whitespace tokens
    "model_nb_chargram" -> ((s, dir) => {
      val c = MultilingualFixture.corpus(s,
        docs(s, dir).filter(col("doc_id") < 2000))
      val ct = TextFunctions.charNgrams(col("text"), 3)
      val counts = NbClassifier.trainCounts(c, ct, col("lang"), 2)
      NbClassifier.predictVotes(c, "doc_id", ct, counts)
        .orderBy(col("doc_id"))
    }),

    // the TRAINED language-ID serve path (langid-filter mode =
    // "model"): the same NB char-trigram classifier, predicted
    // through the compiled vote kernel — one broadcast tally per
    // document over re-spaced gram text, no explode, no vote-table
    // join. Same oracle as model_nb_chargram: the kernel must agree
    // bit-for-bit (votes are exact integers; the per-token argmax
    // and tie-breaks were decided by the engine at compile)
    "text_langid_model" -> ((s, dir) => {
      val c = MultilingualFixture.corpus(s,
        docs(s, dir).filter(col("doc_id") < 2000))
      val ct = TextFunctions.charNgrams(col("text"), 3)
      val counts = NbClassifier.trainCounts(c, ct, col("lang"), 2)
      val bc = NbClassifier.broadcastVotes(s,
        NbClassifier.compileVotes(counts))
      NbClassifier.predictVotesCompiled(
        c.withColumn("__gt", TextFunctions.charGramText(col("text"), 3))
          .filter(length(col("__gt")) > 0),
        "doc_id", "__gt", bc)
        .orderBy(col("doc_id"))
    }),

    // the COMPLETE CCNet recipe — per-language models AND
    // per-language tokenization: space-free languages (ja/th/zh
    // here) tokenize as char-5-grams, the rest as words, all
    // trained in ONE (lang, ngram)-keyed aggregate and scored
    // against their own language's model under its own regime
    "model_lm_auto_by_lang" -> ((s, dir) => {
      val c = MultilingualFixture.corpus(s, docs(s, dir))
      val at = when(col("lang").isin("ja", "th", "zh"),
        TextFunctions.charNgrams(col("text"), 5))
        .otherwise(TextFunctions.tokens(col("text")))
      val uni = LangModel.unigramsBy(c, col("lang"), at)
      val big = LangModel.bigramsBy(c, col("lang"), at, minCount = 2)
      LangModel.scoreBy(c, "doc_id", col("lang"), at, uni, big)
        .withColumnRenamed("g", "lang")
        .orderBy(col("doc_id"))
    }),

    // bank-kernel twin: the mixed-regime bank is still ONE broadcast
    // — the kernel text is per-language re-spaced gram text or the
    // raw text, a conditional projection
    "model_lm_auto_kernel" -> ((s, dir) => {
      val c0 = MultilingualFixture.corpus(s, docs(s, dir))
      val at = when(col("lang").isin("ja", "th", "zh"),
        TextFunctions.charNgrams(col("text"), 5))
        .otherwise(TextFunctions.tokens(col("text")))
      val uni = LangModel.unigramsBy(c0, col("lang"), at)
      val big = LangModel.bigramsBy(c0, col("lang"), at, minCount = 2)
      val bank = LangModel.broadcastBank(s,
        LangModel.compileModelBy(uni, big))
      val c = c0.withColumn("__gt",
        when(col("lang").isin("ja", "th", "zh"),
          TextFunctions.charGramText(col("text"), 5))
          .otherwise(col("text")))
      LangModel.scoreByCompiled(c, "doc_id", "__gt", "lang", bank)
        .withColumnRenamed("g", "lang")
        .select(col("doc_id"), col("lang"), col("n_trans"),
          col("n_hits"), col("mean_p"))
        .orderBy(col("doc_id"))
    }),

    // char-gram DSIR: importance weights toward the zh split over
    // char-5-gram features — DSIR for a space-free-script target
    // corpus. Featurized DIRECTLY from the charNgrams array
    // (featuresToks): the ~6×-inflated re-spaced gram string never
    // materializes only to be re-split — value-identical (the gram
    // array IS what the word tokenizer recovers from that string),
    // same oracle, roughly half the relational path's cost
    "model_dsir_chargram" -> ((s, dir) => {
      val c = MultilingualFixture.corpus(s,
          docs(s, dir).filter(col("doc_id") < 2000))
        .select(col("doc_id"), col("lang"),
          TextFunctions.charNgrams(col("text"), 5).as("toks"))
        .filter(size(col("toks")) > 0)
      // self-corpus form (r14): literal backoff scalars from a
      // tokenize-count pass — the training featurize runs ONCE
      Dsir.weightsSplitSelfToks(c, "doc_id", col("toks"),
        col("lang") === "zh", 1024)
        .orderBy(col("doc_id"))
    }),

    // compiled-kernel twin: the dense ratio array scores re-spaced
    // gram text through the SAME dsir_score kernel word mode uses
    // (char mode is a projection) — this gate pins the char SERVE
    // path the way model_lm_chargram_kernel pins the LM bank.
    // Identical oracle to model_dsir_chargram.
    "model_dsir_chargram_kernel" -> ((s, dir) => {
      val c0 = MultilingualFixture.corpus(s,
        docs(s, dir).filter(col("doc_id") < 2000))
      val train = c0
        .select(col("doc_id"), col("lang"),
          TextFunctions.charNgrams(col("text"), 5).as("toks"))
        .filter(size(col("toks")) > 0)
      val model = Dsir.bucketCountsSplitToks(train, col("toks"),
        col("lang") === "zh", 1024)
      val bc = Dsir.broadcastSplit(s, Dsir.compileSplit(model, 1024))
      val serve = c0
        .withColumn("__gt", TextFunctions.charGramText(col("text"), 5))
        .filter(length(col("__gt")) > 0)
      Dsir.weightsSplitCompiled(serve, "doc_id", "__gt", bc)
        .orderBy(col("doc_id"))
    }),

    // DSIR importance weights: target = the en split, raw = whole
    // corpus — the flagged-subset case, so BOTH bucket models come
    // from ONE featurize + conditional aggregate pass
    "model_dsir_weights" -> ((s, dir) => {
      val d = docs(s, dir)
      // self-corpus form (r14): one featurize pass, not two
      Dsir.weightsSplitSelf(d, "doc_id", "text",
        col("lang") === "en", 1024)
        .orderBy(col("doc_id"))
    }),

    // the compiled kernel twin of model_dsir_weights — same oracle;
    // the dense per-bucket ratio array replaces explode + join +
    // regroup with one native call per document
    "model_dsir_kernel" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = Dsir.bucketCountsSplit(d, "text",
        col("lang") === "en", 1024)
      Dsir.weightsSplitCompiled(d, "doc_id", "text",
        Dsir.compileSplit(model, 1024))
        .orderBy(col("doc_id"))
    }),

    // DSIR resampling: global top-50 by importance weight —
    // TakeOrderedAndProject, never a corpus sort
    "model_dsir_topk" -> ((s, dir) => {
      val d = docs(s, dir)
      // self-corpus form (r14): one featurize pass, not two
      Dsir.resampleTopK(
        Dsir.weightsSplitSelf(d, "doc_id", "text",
          col("lang") === "en", 1024), 50)
    }))

  val oracle: Map[String, String] = Map(

    "model_nb_counts" ->
      s"""SELECT lang AS label, token, COUNT(*) AS cnt
         |FROM (SELECT lang, unnest($sqlToks) AS token FROM documents)
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |ORDER BY label, token""".stripMargin,

    // mirrors NbClassifier.predictVotes: same smoothed-p expression
    // tree, same (p DESC, label) / (n_votes DESC, vote) tiebreaks
    "model_nb_predict" -> (sqlNbPredict +
      """
        |SELECT pr.doc_id, pr.pred, pr.n_votes, nt.n_tok
        |FROM pr JOIN nt USING (doc_id) ORDER BY doc_id""".stripMargin),

    // the confusion matrix over the same prediction chain
    "model_nb_confusion" -> (sqlNbPredict +
      """
        |SELECT d.lang, pr.pred, COUNT(*) AS n
        |FROM pr JOIN documents d USING (doc_id)
        |GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin),

    // mirrors NbClassifier.scoreBinary: same smoothing, same default
    // ratio for out-of-vocabulary tokens, same position-ordered
    // left-fold from 1.0 then one prior multiply
    "model_nb_binary" -> (sqlNbBinary("CASE WHEN lang = 'en' " +
      "THEN 'pos' ELSE 'neg' END") +
      """
        |SELECT doc_id, n_seen, score, pred FROM res
        |ORDER BY doc_id""".stripMargin),

    // identical oracle to model_nb_binary: the kernel must agree
    // with the relational algebra bit-for-bit
    "model_nb_kernel" -> (sqlNbBinary("CASE WHEN lang = 'en' " +
      "THEN 'pos' ELSE 'neg' END") +
      """
        |SELECT doc_id, n_seen, score, pred FROM res
        |ORDER BY doc_id""".stripMargin),

    // tp/fp/tn/fn of the same binary chain against the lang truth
    "model_nb_eval_binary" -> (sqlNbBinary("CASE WHEN lang = 'en' " +
      "THEN 'pos' ELSE 'neg' END") +
      """
        |SELECT
        |  CAST(SUM(CASE WHEN res.pred AND d.lang = 'en'
        |           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(SUM(CASE WHEN res.pred AND d.lang <> 'en'
        |           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(SUM(CASE WHEN NOT res.pred AND d.lang <> 'en'
        |           THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |  CAST(SUM(CASE WHEN NOT res.pred AND d.lang = 'en'
        |           THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |FROM res JOIN documents d USING (doc_id)""".stripMargin),

    // same algebra as model_nb_binary with the self-computed label
    "model_nb_quality" -> (sqlNbBinary(sqlQualityLabel) +
      """
        |SELECT doc_id, n_seen, score, pred FROM res
        |ORDER BY doc_id""".stripMargin),

    "model_lm_bigrams" ->
      s"""WITH t AS (SELECT $sqlToks AS toks FROM documents),
         |b AS (SELECT toks[i + 1] AS w1, toks[i + 2] AS w2
         |  FROM (SELECT toks,
         |          unnest(range(0, greatest(len(toks) - 1, 0))) AS i
         |        FROM t))
         |SELECT w1, w2, COUNT(*) AS cnt FROM b GROUP BY 1, 2
         |HAVING COUNT(*) >= 2 ORDER BY w1, w2""".stripMargin,

    // mirrors LangModel.score: bigram path cnt(v w)/cnt(v), backoff
    // 0.4·(cnt(w)+1)/(N+V), position-ordered sum fold, one division
    // for the mean
    "model_lm_score" -> (sqlLmScore +
      """
        |SELECT doc_id, n_trans, n_hits, mean_p FROM w
        |ORDER BY doc_id""".stripMargin),

    // identical oracle to model_lm_score: the kernel must agree with
    // the relational algebra bit-for-bit
    "model_lm_kernel" -> (sqlLmScore +
      """
        |SELECT doc_id, n_trans, n_hits, mean_p FROM w
        |ORDER BY doc_id""".stripMargin),

    // CCNet head/middle/tail by quartiles of the LM score
    // (quantile_cont ≙ the engine's banded exact selection)
    "model_lm_buckets" -> (sqlLmScore +
      """,
        |q AS (SELECT quantile_cont(mean_p, 0.25) AS c25,
        |             quantile_cont(mean_p, 0.75) AS c75 FROM w)
        |SELECT doc_id, mean_p,
        |  CASE WHEN mean_p > c75 THEN 'head'
        |       WHEN mean_p >= c25 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM w, q ORDER BY doc_id""".stripMargin),

    // mirrors LangModel.scoreBy: the score algebra with every model
    // join keyed by lang, per-lang backoff scalars
    "model_lm_score_by_lang" -> (sqlLmScoreByLang +
      """
        |SELECT doc_id, lang, n_trans, n_hits, mean_p FROM w
        |ORDER BY doc_id""".stripMargin),

    // identical oracle: the model-bank kernel must agree with the
    // relational per-language algebra bit-for-bit
    "model_lm_perlang_kernel" -> (sqlLmScoreByLang +
      """
        |SELECT doc_id, lang, n_trans, n_hits, mean_p FROM w
        |ORDER BY doc_id""".stripMargin),

    // mixed-regime CCNet: per-language tokenizer routing — same
    // chain, toks chosen per language
    "model_lm_auto_by_lang" -> (sqlLmAutoByLang +
      """
        |SELECT doc_id, lang, n_trans, n_hits, mean_p FROM w
        |ORDER BY doc_id""".stripMargin),

    // identical oracle: the mixed-regime bank kernel must agree with
    // the relational routed algebra bit-for-bit
    "model_lm_auto_kernel" -> (sqlLmAutoByLang +
      """
        |SELECT doc_id, lang, n_trans, n_hits, mean_p FROM w
        |ORDER BY doc_id""".stripMargin),

    // the char-gram CCNet fallback: same per-language algebra, toks
    // = sliding char-5-grams over ▁-marked text, corpus = documents
    // ∪ the real-CJK fixture
    "model_lm_chargram_by_lang" -> (sqlLmChargramByLang +
      """
        |SELECT doc_id, lang, n_trans, n_hits, mean_p FROM w
        |ORDER BY doc_id""".stripMargin),

    // identical oracle: the bank kernel over re-spaced gram text
    // must agree with the relational char-gram algebra bit-for-bit
    "model_lm_chargram_kernel" -> (sqlLmChargramByLang +
      """
        |SELECT doc_id, lang, n_trans, n_hits, mean_p FROM w
        |ORDER BY doc_id""".stripMargin),

    // char-trigram langid votes (mirrors model_nb_predict's chain
    // over the char tokenizer + fixture corpus)
    "model_nb_chargram" -> (sqlNbChargram +
      """
        |SELECT pr.doc_id, pr.pred, pr.n_votes, nt.n_tok
        |FROM pr JOIN nt USING (doc_id) ORDER BY doc_id""".stripMargin),

    // identical oracle: the compiled vote kernel must agree
    // bit-for-bit with the relational predictor
    "text_langid_model" -> (sqlNbChargram +
      """
        |SELECT pr.doc_id, pr.pred, pr.n_votes, nt.n_tok
        |FROM pr JOIN nt USING (doc_id) ORDER BY doc_id""".stripMargin),

    "model_dsir_chargram" -> (sqlDsirChargram +
      """
        |SELECT doc_id, n_feat, weight FROM w ORDER BY doc_id"""
        .stripMargin),

    // identical oracle: the compiled kernel over re-spaced gram text
    // must agree bit-for-bit with the array-featurized relational form
    "model_dsir_chargram_kernel" -> (sqlDsirChargram +
      """
        |SELECT doc_id, n_feat, weight FROM w ORDER BY doc_id"""
        .stripMargin),

    // mirrors LangModel.scoreTrigramBy: the trigram ladder with
    // every model join keyed by lang, per-lang backoff scalars
    "model_lm_trigram_by_lang" -> (sqlLmScore3ByLang +
      """
        |SELECT doc_id, lang, n_win, n_tri_hits, n_big_hits, mean_p
        |FROM w ORDER BY doc_id""".stripMargin),

    // identical oracle: the bank kernel must agree bit-for-bit
    "model_lm_perlang3_kernel" -> (sqlLmScore3ByLang +
      """
        |SELECT doc_id, lang, n_win, n_tri_hits, n_big_hits, mean_p
        |FROM w ORDER BY doc_id""".stripMargin),

    // per-language twin of model_lm_buckets: the same score algebra
    // with every model join keyed by lang, quartile cutoffs per lang
    "model_lm_buckets_by_lang" -> (sqlLmScoreByLang +
      """,
        |q AS (SELECT lang, quantile_cont(mean_p, 0.25) AS c25,
        |             quantile_cont(mean_p, 0.75) AS c75
        |      FROM w GROUP BY 1)
        |SELECT w.doc_id, w.lang, w.mean_p,
        |  CASE WHEN w.mean_p > q.c75 THEN 'head'
        |       WHEN w.mean_p >= q.c25 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM w JOIN q USING (lang) ORDER BY w.doc_id""".stripMargin),

    // mirrors LangModel.scoreTrigram: same two-level CASE, same
    // pruned-table denominators, same ordered fold
    "model_lm_trigram" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |uni AS (SELECT token, COUNT(*) AS cnt
         |  FROM (SELECT unnest(toks) AS token FROM t) GROUP BY 1),
         |sc AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
         |              COUNT(*) AS v FROM uni),
         |big AS (SELECT w1, w2, COUNT(*) AS cnt FROM (
         |    SELECT toks[i + 1] AS w1, toks[i + 2] AS w2
         |    FROM (SELECT toks,
         |            unnest(range(0, greatest(len(toks) - 1, 0))) AS i
         |          FROM t))
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |tri AS (SELECT w1, w2, w3, COUNT(*) AS cnt FROM (
         |    SELECT toks[i + 1] AS w1, toks[i + 2] AS w2,
         |           toks[i + 3] AS w3
         |    FROM (SELECT toks,
         |            unnest(range(0, greatest(len(toks) - 2, 0))) AS i
         |          FROM t))
         |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2),
         |wins AS (SELECT doc_id, i AS pos, toks[i + 1] AS w1,
         |                toks[i + 2] AS w2, toks[i + 3] AS w3
         |  FROM (SELECT doc_id, toks,
         |          unnest(range(0, greatest(len(toks) - 2, 0))) AS i
         |        FROM t)),
         |p AS (SELECT w.doc_id, w.pos,
         |    CASE WHEN tg.cnt IS NOT NULL AND cx.cnt IS NOT NULL
         |         THEN 1 ELSE 0 END AS tri_hit,
         |    CASE WHEN (tg.cnt IS NULL OR cx.cnt IS NULL)
         |          AND bg.cnt IS NOT NULL AND um.cnt IS NOT NULL
         |         THEN 1 ELSE 0 END AS big_hit,
         |    CASE WHEN tg.cnt IS NOT NULL AND cx.cnt IS NOT NULL
         |         THEN CAST(tg.cnt AS DOUBLE) / CAST(cx.cnt AS DOUBLE)
         |         WHEN bg.cnt IS NOT NULL AND um.cnt IS NOT NULL
         |         THEN 0.4 * (CAST(bg.cnt AS DOUBLE)
         |                     / CAST(um.cnt AS DOUBLE))
         |         ELSE (CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)) *
         |           (CAST(COALESCE(ul.cnt, 0) + 1 AS DOUBLE)
         |            / CAST(sc.n_total + sc.v AS DOUBLE)) END AS p
         |  FROM wins w
         |    LEFT JOIN tri tg ON w.w1 = tg.w1 AND w.w2 = tg.w2
         |                    AND w.w3 = tg.w3
         |    LEFT JOIN big cx ON w.w1 = cx.w1 AND w.w2 = cx.w2
         |    LEFT JOIN big bg ON w.w2 = bg.w1 AND w.w3 = bg.w2
         |    LEFT JOIN uni um ON w.w2 = um.token
         |    LEFT JOIN uni ul ON w.w3 = ul.token, sc),
         |pd AS (SELECT doc_id, COUNT(*) AS n_win,
         |    CAST(SUM(tri_hit) AS BIGINT) AS n_tri_hits,
         |    CAST(SUM(big_hit) AS BIGINT) AS n_big_hits,
         |    list_reduce(list_prepend(0.0, list(p ORDER BY pos)),
         |                (a, b) -> a + b)
         |      / CAST(COUNT(*) AS DOUBLE) AS mean_p
         |  FROM p GROUP BY 1)
         |SELECT d.doc_id, COALESCE(pd.n_win, 0) AS n_win,
         |  COALESCE(pd.n_tri_hits, 0) AS n_tri_hits,
         |  COALESCE(pd.n_big_hits, 0) AS n_big_hits,
         |  COALESCE(pd.mean_p, 0.0) AS mean_p
         |FROM (SELECT DISTINCT doc_id FROM documents) d
         |LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,

    // mirrors Dsir.weights: same md5 bucket hash, same smoothing,
    // same position-ordered ratio fold from 1.0
    "model_dsir_weights" -> (sqlDsirWeights +
      "\nSELECT doc_id, n_feat, weight FROM w ORDER BY doc_id"),

    // identical oracle: the kernel must agree bit-for-bit
    "model_dsir_kernel" -> (sqlDsirWeights +
      "\nSELECT doc_id, n_feat, weight FROM w ORDER BY doc_id"),

    "model_dsir_topk" -> (sqlDsirWeights +
      """
        |SELECT CAST(row_number() OVER (ORDER BY weight DESC, doc_id)
        |            AS INTEGER) AS rnk, doc_id, weight
        |FROM w ORDER BY weight DESC, doc_id LIMIT 50""".stripMargin))

  /** Shared binary-NB CTE chain, parameterized by the label
    * expression, ending in `res(doc_id, n_seen, score, pred)` — the
    * binary, self-trained-quality, and eval oracles differ only in
    * the tail. */
  private def sqlNbBinary(labelExpr: String): String =
    s"""WITH lab AS (SELECT doc_id, $labelExpr AS label,
       |    $sqlToks AS toks FROM documents),
       |tok AS (SELECT label, unnest(toks) AS token FROM lab),
       |cnts AS (SELECT label, token, COUNT(*) AS cnt FROM tok
       |         GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |vv AS (SELECT COUNT(DISTINCT token) AS v FROM cnts),
       |sc AS (SELECT
       |    CAST(SUM(CASE WHEN label = 'pos' THEN cnt ELSE 0 END)
       |         AS BIGINT) AS n_pos,
       |    CAST(SUM(CASE WHEN label <> 'pos' THEN cnt ELSE 0 END)
       |         AS BIGINT) AS n_neg
       |  FROM cnts),
       |pri AS (SELECT
       |    CAST(SUM(CASE WHEN label = 'pos' THEN 1 ELSE 0 END)
       |         AS BIGINT) AS d_pos,
       |    CAST(SUM(CASE WHEN label <> 'pos' THEN 1 ELSE 0 END)
       |         AS BIGINT) AS d_neg
       |  FROM lab),
       |rat AS (SELECT token,
       |    (CAST(SUM(CASE WHEN label = 'pos' THEN cnt ELSE 0 END) + 1
       |          AS DOUBLE) / CAST(sc.n_pos + vv.v AS DOUBLE))
       |    / (CAST(SUM(CASE WHEN label <> 'pos' THEN cnt ELSE 0 END) + 1
       |            AS DOUBLE) / CAST(sc.n_neg + vv.v AS DOUBLE)) AS r
       |  FROM cnts, sc, vv GROUP BY token, sc.n_pos, sc.n_neg, vv.v),
       |pos AS (SELECT doc_id, i AS pos, pt[i + 1] AS token
       |  FROM (SELECT doc_id, list_slice(toks, 1, 40) AS pt,
       |          unnest(range(0, len(list_slice(toks, 1, 40)))) AS i
       |        FROM lab)),
       |pt AS (SELECT p.doc_id, p.pos,
       |    CASE WHEN rat.r IS NOT NULL THEN 1 ELSE 0 END AS seen,
       |    COALESCE(rat.r,
       |      (1.0 / CAST(sc.n_pos + vv.v AS DOUBLE))
       |        / (1.0 / CAST(sc.n_neg + vv.v AS DOUBLE))) AS r
       |  FROM pos p LEFT JOIN rat USING (token), sc, vv),
       |agg AS (SELECT doc_id, CAST(SUM(seen) AS BIGINT) AS n_seen,
       |    list_reduce(list_prepend(1.0, list(r ORDER BY pos)),
       |                (a, b) -> a * b) AS prod
       |  FROM pt GROUP BY 1),
       |res AS (SELECT agg.doc_id, agg.n_seen,
       |    agg.prod * (CAST(pri.d_pos AS DOUBLE)
       |                / CAST(pri.d_neg AS DOUBLE)) AS score,
       |    agg.prod * (CAST(pri.d_pos AS DOUBLE)
       |                / CAST(pri.d_neg AS DOUBLE)) >= 1.0 AS pred
       |  FROM agg, pri)""".stripMargin

  /** Shared vote-prediction CTE chain ending in `pr(doc_id, pred,
    * n_votes)` and `nt(doc_id, n_tok)` — the predict and confusion
    * oracles differ only in the tail. */
  /** Parametric NB vote-predict chain: `ctCtes` must end in a CTE
    * `ct(doc_id, lang, toks)` — the word-token and char-trigram
    * (langid) oracles differ only in this head. */
  private def sqlNbPredictOver(ctCtes: String): String =
    s"""WITH $ctCtes,
       |tok AS (SELECT lang AS label, unnest(toks) AS token FROM ct),
       |cnts AS (SELECT label, token, COUNT(*) AS cnt FROM tok
       |         GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |tot AS (SELECT label, CAST(SUM(cnt) AS BIGINT) AS n FROM cnts
       |        GROUP BY 1),
       |vv AS (SELECT COUNT(DISTINCT token) AS v FROM cnts),
       |grid AS (SELECT t.token, l.label,
       |    CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE)
       |      / CAST(l.n + vv.v AS DOUBLE) AS p
       |  FROM (SELECT DISTINCT token FROM cnts) t
       |  CROSS JOIN tot l
       |  LEFT JOIN cnts c ON c.token = t.token AND c.label = l.label,
       |  vv),
       |vote AS (SELECT token, label AS vote FROM (
       |    SELECT token, label, row_number() OVER (
       |      PARTITION BY token ORDER BY p DESC, label) AS rnk
       |    FROM grid) WHERE rnk = 1),
       |oov AS (SELECT label AS oov_vote FROM (
       |    SELECT label, 1.0 / CAST(n + v AS DOUBLE) AS p
       |    FROM tot, vv) ORDER BY p DESC, oov_vote LIMIT 1),
       |doctok AS (SELECT doc_id, unnest(toks) AS token FROM ct),
       |voted AS (SELECT d.doc_id,
       |    COALESCE(vt.vote, (SELECT oov_vote FROM oov)) AS vote
       |  FROM doctok d LEFT JOIN vote vt USING (token)),
       |tal AS (SELECT doc_id, vote, COUNT(*) AS n_votes FROM voted
       |        GROUP BY 1, 2),
       |pr AS (SELECT doc_id, vote AS pred, n_votes FROM (
       |    SELECT doc_id, vote, n_votes, row_number() OVER (
       |      PARTITION BY doc_id ORDER BY n_votes DESC, vote) AS rnk
       |    FROM tal) WHERE rnk = 1),
       |nt AS (SELECT doc_id, CAST(SUM(n_votes) AS BIGINT) AS n_tok
       |       FROM tal GROUP BY 1)""".stripMargin

  private lazy val sqlNbPredict: String = sqlNbPredictOver(
    s"ct AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents)")

  private lazy val sqlNbChargram: String = sqlNbPredictOver(
    s"""mx AS (${MultilingualFixture.sqlCorpusBounded}),
       |ntt AS (SELECT doc_id, lang, $sqlCharNorm AS nt FROM mx),
       |ct AS (SELECT doc_id, lang, ${sqlCharToks(3)} AS toks
       |       FROM ntt)""".stripMargin)

  /** Shared LM-score CTE chain ending in `w(doc_id, n_trans,
    * n_hits, mean_p)` — the score and bucket oracles differ only in
    * the tail. */
  private lazy val sqlLmScore: String =
    s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
       |uni AS (SELECT token, COUNT(*) AS cnt
       |  FROM (SELECT unnest(toks) AS token FROM t) GROUP BY 1),
       |sc AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
       |              COUNT(*) AS v FROM uni),
       |big AS (SELECT w1, w2, COUNT(*) AS cnt FROM (
       |    SELECT toks[i + 1] AS w1, toks[i + 2] AS w2
       |    FROM (SELECT toks,
       |            unnest(range(0, greatest(len(toks) - 1, 0))) AS i
       |          FROM t))
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |tr AS (SELECT doc_id, i AS pos, toks[i + 1] AS w1,
       |              toks[i + 2] AS w2
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(0, greatest(len(toks) - 1, 0))) AS i
       |        FROM t)),
       |p AS (SELECT tr.doc_id, tr.pos,
       |    CASE WHEN b.cnt IS NOT NULL AND up.cnt IS NOT NULL
       |         THEN 1 ELSE 0 END AS hit,
       |    CASE WHEN b.cnt IS NOT NULL AND up.cnt IS NOT NULL
       |         THEN CAST(b.cnt AS DOUBLE) / CAST(up.cnt AS DOUBLE)
       |         ELSE 0.4 * (CAST(COALESCE(uc.cnt, 0) + 1 AS DOUBLE)
       |                     / CAST(sc.n_total + sc.v AS DOUBLE)) END AS p
       |  FROM tr LEFT JOIN big b ON tr.w1 = b.w1 AND tr.w2 = b.w2
       |       LEFT JOIN uni up ON tr.w1 = up.token
       |       LEFT JOIN uni uc ON tr.w2 = uc.token, sc),
       |pd AS (SELECT doc_id, COUNT(*) AS n_trans,
       |    CAST(SUM(hit) AS BIGINT) AS n_hits,
       |    list_reduce(list_prepend(0.0, list(p ORDER BY pos)),
       |                (a, b) -> a + b)
       |      / CAST(COUNT(*) AS DOUBLE) AS mean_p
       |  FROM p GROUP BY 1),
       |w AS (SELECT d.doc_id, COALESCE(pd.n_trans, 0) AS n_trans,
       |    COALESCE(pd.n_hits, 0) AS n_hits,
       |    COALESCE(pd.mean_p, 0.0) AS mean_p
       |  FROM (SELECT DISTINCT doc_id FROM documents) d
       |  LEFT JOIN pd USING (doc_id))""".stripMargin

  /** Shared PER-LANGUAGE LM-score CTE chain ending in `w(doc_id,
    * lang, n_trans, n_hits, mean_p)` — the score-by-lang, perlang
    * kernel, and per-lang bucket oracles differ only in the tail. */
  /** Parametric per-language LM chain: `tCtes` must end in a CTE
    * `t(doc_id, lang, toks)`; `restoreFrom` names the relation whose
    * DISTINCT (doc_id, lang) set restores unscoreable docs. The
    * word-token and char-gram oracles differ ONLY in these heads. */
  private def sqlLmByLangChain(tCtes: String, restoreFrom: String)
  : String =
    s"""WITH $tCtes,
       |uni AS (SELECT lang, token, COUNT(*) AS cnt
       |  FROM (SELECT lang, unnest(toks) AS token FROM t)
       |  GROUP BY 1, 2),
       |sc AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_total,
       |              COUNT(*) AS v FROM uni GROUP BY 1),
       |big AS (SELECT lang, w1, w2, COUNT(*) AS cnt FROM (
       |    SELECT lang, toks[i + 1] AS w1, toks[i + 2] AS w2
       |    FROM (SELECT lang, toks,
       |            unnest(range(0, greatest(len(toks) - 1, 0))) AS i
       |          FROM t))
       |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2),
       |tr AS (SELECT doc_id, lang, i AS pos, toks[i + 1] AS w1,
       |              toks[i + 2] AS w2
       |  FROM (SELECT doc_id, lang, toks,
       |          unnest(range(0, greatest(len(toks) - 1, 0))) AS i
       |        FROM t)),
       |p AS (SELECT tr.doc_id, tr.lang, tr.pos,
       |    CASE WHEN b.cnt IS NOT NULL AND up.cnt IS NOT NULL
       |         THEN 1 ELSE 0 END AS hit,
       |    CASE WHEN b.cnt IS NOT NULL AND up.cnt IS NOT NULL
       |         THEN CAST(b.cnt AS DOUBLE) / CAST(up.cnt AS DOUBLE)
       |         ELSE 0.4 * (CAST(COALESCE(uc.cnt, 0) + 1 AS DOUBLE)
       |                     / CAST(sc.n_total + sc.v AS DOUBLE)) END AS p
       |  FROM tr
       |    LEFT JOIN big b ON tr.lang = b.lang AND tr.w1 = b.w1
       |                   AND tr.w2 = b.w2
       |    LEFT JOIN uni up ON tr.lang = up.lang AND tr.w1 = up.token
       |    LEFT JOIN uni uc ON tr.lang = uc.lang AND tr.w2 = uc.token
       |    JOIN sc ON tr.lang = sc.lang),
       |pd AS (SELECT doc_id, lang, COUNT(*) AS n_trans,
       |    CAST(SUM(hit) AS BIGINT) AS n_hits,
       |    list_reduce(list_prepend(0.0, list(p ORDER BY pos)),
       |                (a, b) -> a + b)
       |      / CAST(COUNT(*) AS DOUBLE) AS mean_p
       |  FROM p GROUP BY 1, 2),
       |w AS (SELECT d.doc_id, d.lang,
       |    COALESCE(pd.n_trans, 0) AS n_trans,
       |    COALESCE(pd.n_hits, 0) AS n_hits,
       |    COALESCE(pd.mean_p, 0.0) AS mean_p
       |  FROM (SELECT DISTINCT doc_id, lang FROM $restoreFrom) d
       |  LEFT JOIN pd USING (doc_id, lang))""".stripMargin

  private lazy val sqlLmScoreByLang: String = sqlLmByLangChain(
    s"t AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents)",
    "documents")

  // char-gram oracle tokenizer, mirrored from
  // TextFunctions.charNgrams: spaces normalize to U+2581, then
  // sliding codepoint windows (length/substring are
  // codepoint-positional in BOTH engines — verified on Han, kana,
  // Hangul, and Thai-with-combining-marks samples)
  private def sqlCharNorm =
    "regexp_replace(trim(text), ' +', '\u2581', 'g')"
  private def sqlCharToks(n: Int): String =
    s"""(CASE WHEN length(nt) = 0 THEN []::VARCHAR[]
       |      WHEN length(nt) < $n THEN [nt]
       |      ELSE list_transform(range(1, length(nt) - ${n - 2}),
       |             i -> substring(nt, i, $n)) END)""".stripMargin

  private lazy val sqlLmAutoByLang: String = sqlLmByLangChain(
    s"""mx AS (${MultilingualFixture.sqlCorpus}),
       |ntt AS (SELECT doc_id, lang, text, $sqlCharNorm AS nt FROM mx),
       |t AS (SELECT doc_id, lang,
       |        CASE WHEN lang IN ('ja', 'th', 'zh')
       |             THEN ${sqlCharToks(5)}
       |             ELSE string_split_regex(trim(text), ' +') END
       |          AS toks
       |      FROM ntt)""".stripMargin,
    "mx")

  private lazy val sqlLmChargramByLang: String = sqlLmByLangChain(
    s"""mx AS (${MultilingualFixture.sqlCorpusBounded}),
       |ntt AS (SELECT doc_id, lang, $sqlCharNorm AS nt FROM mx),
       |t AS (SELECT doc_id, lang, ${sqlCharToks(5)} AS toks
       |      FROM ntt)""".stripMargin,
    "mx")

  /** Shared PER-LANGUAGE trigram CTE chain ending in `w(doc_id,
    * lang, n_win, n_tri_hits, n_big_hits, mean_p)` — the relational
    * and bank-kernel oracles differ only in the tail. */
  private lazy val sqlLmScore3ByLang: String =
    s"""WITH t AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents),
       |uni AS (SELECT lang, token, COUNT(*) AS cnt
       |  FROM (SELECT lang, unnest(toks) AS token FROM t)
       |  GROUP BY 1, 2),
       |sc AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_total,
       |              COUNT(*) AS v FROM uni GROUP BY 1),
       |big AS (SELECT lang, w1, w2, COUNT(*) AS cnt FROM (
       |    SELECT lang, toks[i + 1] AS w1, toks[i + 2] AS w2
       |    FROM (SELECT lang, toks,
       |            unnest(range(0, greatest(len(toks) - 1, 0))) AS i
       |          FROM t))
       |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2),
       |tri AS (SELECT lang, w1, w2, w3, COUNT(*) AS cnt FROM (
       |    SELECT lang, toks[i + 1] AS w1, toks[i + 2] AS w2,
       |           toks[i + 3] AS w3
       |    FROM (SELECT lang, toks,
       |            unnest(range(0, greatest(len(toks) - 2, 0))) AS i
       |          FROM t))
       |  GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 2),
       |wins AS (SELECT doc_id, lang, i AS pos, toks[i + 1] AS w1,
       |                toks[i + 2] AS w2, toks[i + 3] AS w3
       |  FROM (SELECT doc_id, lang, toks,
       |          unnest(range(0, greatest(len(toks) - 2, 0))) AS i
       |        FROM t)),
       |p AS (SELECT w.doc_id, w.lang, w.pos,
       |    CASE WHEN tg.cnt IS NOT NULL AND cx.cnt IS NOT NULL
       |         THEN 1 ELSE 0 END AS tri_hit,
       |    CASE WHEN (tg.cnt IS NULL OR cx.cnt IS NULL)
       |          AND bg.cnt IS NOT NULL AND um.cnt IS NOT NULL
       |         THEN 1 ELSE 0 END AS big_hit,
       |    CASE WHEN tg.cnt IS NOT NULL AND cx.cnt IS NOT NULL
       |         THEN CAST(tg.cnt AS DOUBLE) / CAST(cx.cnt AS DOUBLE)
       |         WHEN bg.cnt IS NOT NULL AND um.cnt IS NOT NULL
       |         THEN 0.4 * (CAST(bg.cnt AS DOUBLE)
       |                     / CAST(um.cnt AS DOUBLE))
       |         ELSE (CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)) *
       |           (CAST(COALESCE(ul.cnt, 0) + 1 AS DOUBLE)
       |            / CAST(sc.n_total + sc.v AS DOUBLE)) END AS p
       |  FROM wins w
       |    LEFT JOIN tri tg ON w.lang = tg.lang AND w.w1 = tg.w1
       |                    AND w.w2 = tg.w2 AND w.w3 = tg.w3
       |    LEFT JOIN big cx ON w.lang = cx.lang AND w.w1 = cx.w1
       |                    AND w.w2 = cx.w2
       |    LEFT JOIN big bg ON w.lang = bg.lang AND w.w2 = bg.w1
       |                    AND w.w3 = bg.w2
       |    LEFT JOIN uni um ON w.lang = um.lang AND w.w2 = um.token
       |    LEFT JOIN uni ul ON w.lang = ul.lang AND w.w3 = ul.token
       |    JOIN sc ON w.lang = sc.lang),
       |pd AS (SELECT doc_id, lang, COUNT(*) AS n_win,
       |    CAST(SUM(tri_hit) AS BIGINT) AS n_tri_hits,
       |    CAST(SUM(big_hit) AS BIGINT) AS n_big_hits,
       |    list_reduce(list_prepend(0.0, list(p ORDER BY pos)),
       |                (a, b) -> a + b)
       |      / CAST(COUNT(*) AS DOUBLE) AS mean_p
       |  FROM p GROUP BY 1, 2),
       |w AS (SELECT d.doc_id, d.lang,
       |    COALESCE(pd.n_win, 0) AS n_win,
       |    COALESCE(pd.n_tri_hits, 0) AS n_tri_hits,
       |    COALESCE(pd.n_big_hits, 0) AS n_big_hits,
       |    COALESCE(pd.mean_p, 0.0) AS mean_p
       |  FROM (SELECT DISTINCT doc_id, lang FROM documents) d
       |  LEFT JOIN pd USING (doc_id, lang))""".stripMargin

  /** Shared DSIR-weight CTE chain ending in `w(doc_id, n_feat,
    * weight)` — the weights and top-k oracles differ only in the
    * final projection. */
  /** Parametric DSIR chain: `tCtes` must end in a CTE
    * `t(doc_id, lang, toks)`; `targetLang` names the flagged target
    * split. Word and char-gram oracles differ only in these. */
  private def sqlDsirChain(tCtes: String, targetLang: String): String =
    s"""WITH $tCtes,
       |f AS (SELECT doc_id, lang, list_concat(
       |    list_transform(toks, tk ->
       |      CAST(concat('0x', substring(md5(tk), 1, 15)) AS BIGINT)
       |        % 1024),
       |    list_transform(range(0, greatest(len(toks) - 1, 0)), i ->
       |      CAST(concat('0x', substring(
       |          md5(toks[i + 1] || ' ' || toks[i + 2]), 1, 15))
       |        AS BIGINT) % 1024)) AS feats
       |  FROM t),
       |tc AS (SELECT bucket, COUNT(*) AS cnt FROM (
       |    SELECT unnest(feats) AS bucket FROM f
       |    WHERE lang = '$targetLang')
       |  GROUP BY 1),
       |rc AS (SELECT bucket, COUNT(*) AS cnt FROM (
       |    SELECT unnest(feats) AS bucket FROM f) GROUP BY 1),
       |sc AS (SELECT (SELECT CAST(SUM(cnt) AS BIGINT) FROM tc) AS n_t,
       |              (SELECT CAST(SUM(cnt) AS BIGINT) FROM rc) AS n_r),
       |rat AS (SELECT COALESCE(tc.bucket, rc.bucket) AS bucket,
       |    (CAST(COALESCE(tc.cnt, 0) + 1 AS DOUBLE)
       |       / CAST(sc.n_t + 1024 AS DOUBLE))
       |    / (CAST(COALESCE(rc.cnt, 0) + 1 AS DOUBLE)
       |       / CAST(sc.n_r + 1024 AS DOUBLE)) AS r
       |  FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket, sc),
       |pos AS (SELECT doc_id, i AS pos, pf[i + 1] AS bucket
       |  FROM (SELECT doc_id, list_slice(feats, 1, 40) AS pf,
       |          unnest(range(0, len(list_slice(feats, 1, 40)))) AS i
       |        FROM f)),
       |pr AS (SELECT p.doc_id, p.pos,
       |    COALESCE(rat.r,
       |      (1.0 / CAST(sc.n_t + 1024 AS DOUBLE))
       |        / (1.0 / CAST(sc.n_r + 1024 AS DOUBLE))) AS r
       |  FROM pos p LEFT JOIN rat USING (bucket), sc),
       |w AS (SELECT doc_id, COUNT(*) AS n_feat,
       |    list_reduce(list_prepend(1.0, list(r ORDER BY pos)),
       |                (a, b) -> a * b) AS weight
       |  FROM pr GROUP BY 1)""".stripMargin

  private lazy val sqlDsirWeights: String = sqlDsirChain(
    s"t AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents)",
    "en")

  // char-gram DSIR: toks = char-5-grams, so the "bigram" features
  // are gram TRANSITIONS — the hashed feature space a zh/ja/th
  // target corpus actually has (word features don't exist there).
  // Empty texts yield zero grams and drop from BOTH engines (the
  // Spark query filters length > 0 to keep tokens("") == [] parity).
  private lazy val sqlDsirChargram: String = sqlDsirChain(
    s"""mx AS (${MultilingualFixture.sqlCorpusBounded}),
       |ntt AS (SELECT doc_id, lang, $sqlCharNorm AS nt FROM mx),
       |t AS (SELECT doc_id, lang, ${sqlCharToks(5)} AS toks
       |      FROM ntt WHERE length(nt) > 0)""".stripMargin,
    "zh")
}
