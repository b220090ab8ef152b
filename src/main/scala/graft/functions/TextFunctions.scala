package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis primitives for large-scale training-data pipelines
  * (SURVEY §7.6). All are pure narrow column expressions — codegen'd,
  * no shuffle, no UDFs — so they cost a projection at any scale.
  *
  * Cross-engine determinism notes (oracle parity):
  *  - token hashing routes through md5 (identical across engines)
  *    rather than xxhash/murmur (engine-specific seeds);
  *  - ratios are double divisions of exact integers (IEEE-identical
  *    everywhere).
  */
object TextFunctions {

  /** Whitespace tokenizer; trim first so trailing separators don't
    * produce empty tokens. */
  def tokens(text: Column): Column = split(trim(text), " +")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Document fingerprint: canonical md5 of the normalized text.
    * (The reference hashes rows with Go hashstructure,
    * outputs/kafka/kafka_utils.go:258-276; md5 is the cross-engine
    * equivalent for content identity.) */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** 60-bit stable token hash: first 15 hex chars of md5, base-16.
    * Fits a signed long; identical in any engine with md5. */
  def tokenHash(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast(LongType)

  /** Stopword list used by quality scoring / language id. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "in")

  /** Token-array "let" — see [[Exprs.bind]] for why: multi-reference
    * token expressions (shingles: ~3·n refs, langId: 8 refs) would
    * re-run the regex split per reference otherwise. */
  private def letTokens(text: Column)(f: Column => Column): Column =
    Exprs.bind(tokens(text))(f)

  private def stopwordRatioOf(ts: Column): Column =
    size(filter(ts, t => t.isin(stopwords: _*))).cast("double") /
      size(ts).cast("double")

  /** Count of stopword tokens. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  /** Stopword ratio — double division of exact ints. */
  def stopwordRatio(text: Column): Column = letTokens(text)(stopwordRatioOf)

  /** Mean token length (chars, excluding separators). */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(trim(text), " ", "")).cast("double") /
      tokenCount(text).cast("double")

  /** N-gram (word-shingle) array, 1-indexed element_at. Documents
    * shorter than n tokens yield an EMPTY array — without the guard,
    * sequence(1, size-n+1) would descend through 0 and
    * element_at(ts, 0) throws. Token array let-bound ([[Exprs.bind]]
    * rationale): the rewrite alone was a measured ~20× on the corpus
    * shingle stage. */
  def shingles(text: Column, n: Int = 3): Column =
    flatten(transform(array(tokens(text)), ts =>
      when(size(ts) < n, array().cast("array<string>"))
        .otherwise(
          transform(sequence(lit(1), size(ts) - (n - 1)),
            i => concat_ws(" ",
              (0 until n).map(k => element_at(ts, i + k)): _*)))))

  /** Language-id heuristic: marker-word lookup, first match wins.
    * A real pipeline would use character-n-gram profiles; the marker
    * chain is the deterministic, oracle-checkable core of that
    * approach. Whitespace-token based, so BLIND to space-free
    * scripts — [[langIdScript]] layers the CJK/Thai script detection
    * on top. */
  def langId(text: Column): Column = letTokens(text) { ts =>
    when(array_contains(ts, "der") || array_contains(ts, "und"), "de")
      .when(array_contains(ts, "le") || array_contains(ts, "la"), "fr")
      .when(array_contains(ts, "el") || array_contains(ts, "los"), "es")
      .when(array_contains(ts, "the") || array_contains(ts, "a"), "en")
      .otherwise("und")
  }

  /** Character n-grams over space-marked text — the fastText/CCNet
    * fallback tokenization for space-free scripts (zh/ja/th), where
    * the whitespace [[tokens]] would return one giant "token" per
    * sentence and every word-token operator (LM scoring, NB
    * features, shingle dedup) silently degrades. Spaces normalize to
    * U+2581 '▁' (the sentencepiece convention) so every gram is
    * SPACE-FREE — the compiled-kernel key contract holds by
    * construction and char-gram models ride the same broadcast
    * banks as word models. A document shorter than n chars yields
    * itself as one gram; empty text yields no grams; null stays
    * null (explodes to zero rows, like [[tokens]] of null).
    *
    * Cross-engine: `length`/`substring` are codepoint-positional in
    * both Spark (UTF8String) and DuckDB, verified on Han, kana,
    * Hangul, and Thai-with-combining-marks samples — the oracle
    * mirror is `list_transform(range(1, length(t)-n+2),
    * i -> substring(t, i, n))`. Pure narrow expression: a sliding
    * window costs one projection at any scale, like [[shingles]].
    *
    * Positions are CODEPOINTS, deliberately not grapheme clusters:
    * Thai combining vowels and Indic matras split mid-grapheme
    * (CharNgramSpec pins the exact windows on น้ำ). This matches
    * fastText's char n-grams, and it is the only segmentation both
    * engines share exactly — grapheme boundaries are ICU-version-
    * dependent, so a grapheme mode could never be oracle-checked;
    * it is intentionally NOT implemented. */
  def charNgrams(text: Column, n: Int = 5): Column = {
    require(n > 0, s"charNgrams: need n > 0, got $n")
    // native one-pass kernel (CharNgramsUtf8) — value-identical to
    // the composed trim/regexp_replace/substr form (CharNgramSpec
    // pins the equality), but O(text bytes) instead of the O(L²)
    // per-window substr walk, inside whole-stage codegen
    org.apache.spark.sql.graftbridge.GraftColumnBridge.column(
      CharNgramsUtf8(
        org.apache.spark.sql.graftbridge.GraftColumnBridge
          .expression(text),
        org.apache.spark.sql.catalyst.expressions.Literal(n)))
  }

  /** The char-gram stream re-spaced into whitespace-token text:
    * `tokens(charGramText(t, n)) == charNgrams(t, n)` (grams are
    * space-free by the ▁ normalization), so EVERY word-token
    * operator — the compiled LM/NB kernels, the shingle_hash64
    * dedup kernel (n=1), BM25 — runs in char-gram mode with zero
    * changes: char-gram mode is a projection, not an operator
    * family fork. Null text stays null (kernels take their
    * null-restore path, matching the relational explode-of-null). */
  def charGramText(text: Column, n: Int = 5): Column =
    when(text.isNotNull, concat_ws(" ", charNgrams(text, n)))

  /** Characters of `text` inside a literal script range — counted by
    * length delta under global removal, the construction that is
    * identical in any regex engine (the class uses LITERAL range
    * endpoints, not \\u escapes, because Java and RE2 spell escapes
    * differently). */
  private def scriptCount(text: Column, rangeClass: String): Column =
    length(text) - length(regexp_replace(text, rangeClass, ""))

  // literal BMP script ranges (kana = Hiragana+Katakana U+3041-30FF;
  // Han = CJK Unified U+4E00-9FFF; Thai U+0E01-0E5B; Hangul
  // syllables U+AC00-D7A3)
  private val kanaClass = "[ぁ-ヿ]"
  private val hanClass = "[一-鿿]"
  private val thaiClass = "[ก-๛]"
  private val hangulClass = "[가-힣]"

  /** Script-aware language id — the layer the word-marker [[langId]]
    * cannot see: space-free scripts are detected by character-block
    * membership (the only reliable signal a heuristic has for CJK —
    * kana appears ONLY in Japanese, so kana wins over Han; Han with
    * no kana reads as Chinese; Hangul and Thai are unambiguous
    * blocks). Scripts decided first, then the word-marker chain for
    * the space-delimited rest. Deterministic and SQL-expressible
    * (length-delta regexp counts), so oracle-checkable. */
  def langIdScript(text: Column): Column =
    Exprs.bind(coalesce(text, lit(""))) { t =>
      when(scriptCount(t, kanaClass) > 0, "ja")
        .when(scriptCount(t, hangulClass) > 0, "ko")
        .when(scriptCount(t, thaiClass) > 0, "th")
        .when(scriptCount(t, hanClass) > 0, "zh")
        .otherwise(langId(t))
    }

  /** Composite quality score in [0,2]: stopword ratio (fluency
    * proxy) + non-degenerate-length band bonus. Deterministic double
    * math. */
  def qualityScore(text: Column): Column = letTokens(text)(ts =>
    stopwordRatioOf(ts) +
      when(size(ts).between(5, 500), lit(1.0)).otherwise(lit(0.0)))

  /** Overlapping token-window chunks — the RAG/pretraining prep step
    * that splits long documents into model-context-sized pieces.
    * Chunk i covers tokens [i·stride, i·stride + size); the final
    * window is the last one that still starts inside the document,
    * so short docs yield exactly one (possibly short) chunk. Token
    * array let-bound ([[Exprs.bind]]); pure narrow expression, the
    * row blowup happens only when the caller explodes.
    *
    * @return array<string>: each chunk re-joined with single spaces
    */
  def chunks(text: Column, width: Int, stride: Int): Column = {
    require(width > 0 && stride > 0 && stride <= width,
      s"need 0 < stride <= width, got width=$width stride=$stride")
    Exprs.bind(tokens(text)) { ts =>
      transform(
        sequence(lit(0),
          greatest(ceil((size(ts) - width).cast("double") / stride),
            lit(0)).cast("long")),
        i => concat_ws(" ",
          slice(ts, (i * stride + 1).cast("int"), lit(width))))
    }
  }

  /** Deterministic per-key bucket in [0, buckets): md5-derived, so
    * identical across engines, runs, and partitionings — the
    * primitive under reproducible train/val/test splits and
    * stratified sampling (rand()-based sampling is neither
    * replayable nor cross-engine checkable). */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(tokenHash(key.cast("string")), lit(buckets.toLong))

  /** Luhn checksum validity of a digit string — the verification
    * step behind payment-card PII detection: a regex alone flags
    * every 13–19-digit run, but only ~10% of random runs pass Luhn,
    * so checking the checksum is what separates "redact this" from
    * drowning the scrubber in phone numbers and ids. Pure fold over
    * the reversed digits (double every 2nd, subtract 9 above 9, sum
    * % 10) as a codegen'd higher-order aggregate — scan-stage cost,
    * no UDF. Non-digit characters are the caller's problem (feed it
    * `regexp_extract_all("[0-9]{13,19}")` output). */
  def luhnValid(digits: Column): Column = Exprs.bind(reverse(digits)) { r =>
    (aggregate(
      sequence(lit(1), length(r)),
      lit(0L),
      (acc, i) => {
        val d = (ascii(r.substr(i, lit(1))) - 48).cast(LongType)
        acc + when(pmod(i, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }) % 10) === 0
  }
}
