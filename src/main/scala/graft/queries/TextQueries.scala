package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.ops.Multimodal

/** Text-analysis + multimodal-plumbing queries over `documents`
  * (SURVEY §7.6). */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // oracle-side tokenizer, mirrored from TextFunctions.tokens
  private val sqlToks = "string_split_regex(trim(text), ' +')"
  private val sqlStop = "('the', 'a', 'of', 'and', 'in')"

  // hex byte-assembly helpers shared by the multimodal blob builders
  // (one definition — a carry bug fixed in one place fixes both)
  private def hex2(c: org.apache.spark.sql.Column) =
    lpad(hex(c.cast("long")), 2, "0")
  private def be32(c: org.apache.spark.sql.Column) =
    lpad(hex(c.cast("long")), 8, "0")
  private def le16(c: org.apache.spark.sql.Column) =
    concat(hex2(pmod(c, lit(256))), hex2(floor(c / 256)))
  private def le32(c: org.apache.spark.sql.Column) =
    concat(hex2(pmod(c, lit(256))), hex2(pmod(floor(c / 256), lit(256))),
      hex2(pmod(floor(c / 65536), lit(256))),
      hex2(pmod(floor(c / 16777216), lit(256))))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact heavy hitters via two-pass Misra-Gries: bounded candidate
    // sketches per partition, then exact counts over candidates only —
    // the 100 TB substitute for the full-vocabulary wordcount shuffle.
    // Pass B makes the output EXACT, so the oracle is plain
    // wordcount + integer threshold.
    "text_heavy_hitters" -> ((s, dir) =>
      graft.ops.HeavyHitters.heavyHitters(
        docs(s, dir), TextFunctions.tokens(col("text")), den = 500)),

    // lexical-diversity + LM-rarity quality signals: type-token
    // ratio (Gopher's unique-word fraction rule) and the fraction of
    // a doc's bigrams that are corpus-rare (count ≤ 2) — the
    // cheap-to-compute stand-in for LM-perplexity filtering (a doc
    // made of bigrams no other doc uses is gibberish or gold; either
    // way the curator wants the signal). TTR is scan-stage only
    // (array_distinct per row, no shuffle); rarity is one bigram-hash
    // count aggregate + an inverted-index join back — the shuffle
    // carries 64-bit hashes, not text. All-integer counts; the two
    // divisions are single IEEE ops, exact on both engines.
    "text_lexical_stats" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val d = docs(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      val base = d.select(col("doc_id"), size(col("toks")).as("n_tok"),
        size(array_distinct(col("toks"))).as("n_unique"))
      // bigram hashes via the native token_window_hash64 kernel
      // (value-identical to the xxhash64-of-slice fold). The kernel
      // emits ONE whole-doc window for docs under 2 tokens (slice
      // clamping); this query's contract is NO bigrams there — the
      // guard drops it. Kernel + sizes materialize BELOW the explode
      // (same-projection expressions re-run per exploded row).
      val bg = docs(s, dir)
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).as("__nt"),
          call_function("token_window_hash64", col("text"), lit(2))
            .as("__wh"))
        .select(col("doc_id"), explode(
          when(col("__nt") < 2,
            array().cast(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)))
            .otherwise(col("__wh")))
          .as("bh"))
      val cnt = bg.groupBy(col("bh")).agg(count(lit(1)).as("c"))
      val pd = bg.join(cnt, Seq("bh")).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("c") <= 2L, 1L).otherwise(0L)).as("n_rare"))
      base.join(pd, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tok"), col("n_unique"),
          (col("n_unique").cast("double") / col("n_tok").cast("double"))
            .as("ttr"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("n_rare"), lit(0L)).as("n_rare"),
          when(coalesce(col("n_bigrams"), lit(0L)) === 0L, lit(0.0))
            .otherwise(col("n_rare").cast("double") /
              col("n_bigrams").cast("double")).as("rare_frac"))
        .orderBy(col("doc_id"))
    }),

    // token counting + quality-signal ratios (ints + IEEE-exact
    // double divisions)
    "text_token_stats" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.stopwordCount(col("text")).as("n_stop"),
        TextFunctions.stopwordRatio(col("text")).as("stop_ratio"),
        TextFunctions.meanTokenLen(col("text")).as("mean_tok_len"))
        .orderBy(col("doc_id"))),

    // md5 content fingerprint (rolling-hash stand-in; cross-engine)
    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    // marker-word language id vs the labeled lang column
    "text_langid" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    // script-aware language id over real zh/ja/th/ko text — the
    // layer the marker-word heuristic cannot see (whitespace tokens
    // don't exist in space-free scripts); corpus = documents ∪ the
    // inline multilingual fixture, in both engines
    "text_langid_cjk" -> ((s, dir) =>
      MultilingualFixture.corpus(s, docs(s, dir)).select(
        col("doc_id"), col("lang"),
        TextFunctions.langIdScript(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    // composite quality score
    "text_quality" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    // per-source curation dashboard (web-corpus domain stats): docs,
    // exact-dup rate (fingerprint), mean quality — the numbers a
    // curation run reports per domain before filtering decisions.
    // One narrow projection + two hash aggregates.
    "text_source_stats" -> ((s, dir) => {
      val d = docs(s, dir).select(col("source"), col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.qualityScore(col("text")).as("q"))
      val keep = d.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"))
      d.join(keep, Seq("fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L))
            .as("n_dups"),
          // decimal-exact mean: double sums are shuffle-order-
          // dependent; sum in DECIMAL then one double division
          (sum(col("q").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
            .cast("double") / count(lit(1))).as("mean_quality"))
        .orderBy(col("source"))
    }),

    // context-window chunking (RAG/pretraining prep): 32-token
    // windows, stride 24 (8-token overlap); chunk identity via md5 so
    // the oracle checks content, not just counts
    "text_chunking" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      docs(s, dir).select(col("doc_id"),
        posexplode(call_function("shingle_utf8", col("text"),
          lit(32), lit(24))))
        .select(col("doc_id"), col("pos").as("cid"),
          size(split(col("col"), " ", -1)).as("n_tok"),
          md5(col("col")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("cid"))
    }),

    // Gopher-style repetition filter: fraction of duplicate 3-gram
    // shingles per doc (1 - distinct/total). Counts are order-free,
    // so cross-engine exact. Distinct count = size of the native
    // shingle_hash64 kernel's output (one byte pass — no shingle
    // strings ever materialize); total count is arithmetic on the
    // token count (the kernel is empty under 3 tokens, matching
    // shingles()'s empty-array contract).
    "text_repetition" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      // null text keeps a NULL shingle count (the oracle's len(NULL)
      // and the pre-kernel size(shingles()) both yield NULL —
      // greatest() alone would skip the null and report 0)
      // sort (id, text) FIRST so the shingle kernel runs once, above
      // the exchange (see multimodal_ppm_stats)
      docs(s, dir).select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"),
          when(col("text").isNotNull,
            greatest(size(TextFunctions.tokens(col("text"))) - 2, lit(0)))
            .as("n_shingles"),
          size(call_function("shingle_hash64", col("text"), lit(3)))
            .as("n_unique"))
        .select(col("doc_id"), col("n_shingles"), col("n_unique"),
          when(col("n_shingles") > 0,
            lit(1.0) - col("n_unique").cast("double")
              / col("n_shingles").cast("double"))
            .otherwise(lit(0.0)).as("rep_ratio"))
    }),

    // MassiveText-style top-n-gram coverage: the fraction of a doc's
    // characters covered by its single most frequent word 2-gram
    // (high fraction = boilerplate/templated text; the published
    // repetition-filter family's other half next to text_repetition's
    // duplicate-shingle fraction). Top-1 per doc as a hash-agg argmin
    // over (-cnt, gram) — map-side partial agg, ties to the
    // lexicographically smallest gram, no per-doc sort.
    "text_top_ngram_frac" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      docs(s, dir).select(col("doc_id"), col("n_chars"),
          explode(call_function("shingle_utf8", col("text"),
            lit(2), lit(1))).as("g"))
        .groupBy(col("doc_id"), col("n_chars"), col("g"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"), col("n_chars"))
        .agg(min(struct((-col("cnt")).as("nc"), col("g"),
          col("cnt"))).as("top"))
        .select(col("doc_id"),
          col("top.g").as("top_gram"),
          col("top.cnt").as("n_occ"),
          ((col("top.cnt") * length(col("top.g"))).cast("double")
            / col("n_chars").cast("double")).as("top_frac"))
        .orderBy(col("doc_id"))
    }),

    // per-language length-outlier filter (curation: drop docs whose
    // char count sits beyond ±2σ of their language's distribution).
    // Two bounded aggregates: exact integer moments per language
    // (count as long; Σx / Σx² in DECIMAL(38,0) — a long Σx² silently
    // wraps once a shard crosses 2^63, exactly the corpus sizes this
    // is for; DuckDB's HUGEINT sums are the same exact width), then
    // a broadcast join back and a scan-stage keep decision. The
    // z-score test is algebraically rearranged to multiplication —
    // |x−μ| ≤ 2σ times n² gives (n·x−Σx)² ≤ 4·(n·Σx²−(Σx)²), with
    // exact-int operands lifted to double identically in both
    // engines — no division, no sqrt, no NaN edge on a
    // constant-length language.
    "text_length_outliers" -> ((s, dir) => {
      val m = docs(s, dir).groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        sum(col("n_chars").cast("decimal(38,0)")).as("sx"),
        sum(col("n_chars").cast("decimal(38,0)") * col("n_chars"))
          .as("sxx"))
      docs(s, dir).select(col("lang"), col("n_chars"))
        .join(broadcast(m), Seq("lang"))
        .select(col("lang"),
          ((col("n").cast("double") * col("n_chars").cast("double")
            - col("sx").cast("double"))
            * (col("n").cast("double") * col("n_chars").cast("double")
              - col("sx").cast("double"))
            <= lit(4.0)
              * (col("n").cast("double") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double")))
            .as("kept"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy(col("lang"))
    }),

    // BPE-ish regex token counting (word pieces / numbers / symbols)
    "text_bpe_tokens" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("n_bpe"))
        .orderBy(col("doc_id"))),

    // BPE vocabulary induction over the corpus: the corpus-
    // proportional wordCounts reduction feeds the delta-maintained
    // trainer (driver-local fast path below 2M distinct words — the
    // production-tokenizer shape). 1200 merges at real-vocabulary
    // scale; deterministic (exact integer counts, code-point tie
    // order), so the output table is stable across partitionings.
    // Training rounds are inherently sequential, but DuckDB's
    // recursive CTE carries the trainer state one iteration per row,
    // so the gate hash-checks this against a full second
    // implementation (sqlBpeTrainCte); the algorithm is additionally
    // pinned by BpeTrainSpec's three-way differential (local ==
    // distributed delta == full recount == textbook reference).
    "text_bpe_vocab" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      graft.ops.BpeTrain.train(
        graft.ops.BpeTrain.wordCounts(docs(s, dir), "text"), 1200)
        .orderBy(col("rank"))
    }),

    // BPE ENCODE with the trained vocabulary via the native
    // bpe_encode kernel: per-word cost bounded by the word length,
    // independent of the 1000-rule table (the interpreted HOF form
    // would be a 1000-deep expression tree). Scan-stage projection —
    // the rule table ships inside the expression, no join.
    "text_bpe_encode" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val d = docs(s, dir)
      // 40 merges: the synthetic corpus has a small closed
      // vocabulary (≈90 productive merges at sf0.01), and a larger
      // vocab degenerately absorbs every word into one token —
      // 40 keeps the per-word split non-trivial so the output
      // actually exercises partial merges
      val rules = graft.ops.BpeTrain.train(
        graft.ops.BpeTrain.wordCounts(d, "text"), 40)
        .orderBy(col("rank")).select(col("left"), col("right"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      d.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .select(col("doc_id"),
          graft.ops.BpeTrain.encodeNative(col("w"), rules).as("e"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(size(col("e"))).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // polynomial rolling-hash fingerprint via the native codegen
    // expression (graft.functions.RollingHash)
    "text_rolling_fp" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        call_function("rolling_hash", col("text")).as("rfp"))
        .orderBy(col("doc_id"))),

    // multimodal CONTENT SNIFF — the decide-before-decoding triage a
    // crawl runs on arbitrary blobs: magic-byte mime over every
    // format the codec family parses (each lane builds a REAL blob
    // via that format's native fixture, so the probe fires on true
    // bytes, not labels) + exact byte statistics for the raw-text
    // lane (printable/zero/distinct counts — the integer-exact
    // entropy proxy; a Shannon entropy's log is not oracle-stable)
    "multimodal_sniff" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      // narrow sort below the kernels (see multimodal_ppm_stats)
      val base = docs(s, dir).select(id, col("text"))
        .filter(id < 400).orderBy(id)
      val lane = pmod(id, lit(9))
      val w = (pmod(id, lit(12)) + 7).cast("int")
      val h = (pmod(id, lit(6)) + 5).cast("int")
      val blob =
        when(lane === 0, call_function("png_fixture",
          id.cast("long"), w, h))
        .when(lane === 1, call_function("jpeg_fixture", id.cast("long"),
          ((pmod(id, lit(6)) + 1) * 8).cast("int"),
          ((pmod(id, lit(4)) + 1) * 8).cast("int")))
        .when(lane === 2, call_function("gif_fixture",
          id.cast("long"), w, h))
        .when(lane === 3, call_function("bmp_fixture",
          id.cast("long"), w, h))
        .when(lane === 4, call_function("tiff_fixture", id.cast("long"),
          w, (pmod(id, lit(9)) + 3).cast("int")))
        .when(lane === 5, call_function("mp4_fixture", id.cast("long"),
          lit(320), lit(240), (pmod(id, lit(24)) + 1).cast("int")))
        .when(lane === 6, call_function("flac_fixture", id.cast("long")))
        .when(lane === 7, call_function("mp3_fixture", id.cast("long"),
          (pmod(id, lit(20)) + 1).cast("int")))
        .otherwise(Multimodal.asBlob(col("text")))
      base.select(id, Multimodal.sniff(blob).as("sn"))
        .select(id, col("sn.mime").as("mime"),
          when(col("sn.mime") === "application/octet-stream",
            col("sn.n_bytes")).as("n_bytes"),
          when(col("sn.mime") === "application/octet-stream",
            col("sn.n_printable")).as("n_printable"),
          when(col("sn.mime") === "application/octet-stream",
            col("sn.n_zero")).as("n_zero"),
          when(col("sn.mime") === "application/octet-stream",
            col("sn.n_distinct")).as("n_distinct"))
    }),

    // multimodal: blob + SYNTHETIC metadata over the text-as-blob
    // fixture corpus (the schema/plumbing contract under test; the
    // honest content-dispatch decode is gated by multimodal_sniff)
    "multimodal_meta" -> ((s, dir) =>
      Multimodal.withSyntheticMedia(docs(s, dir), "text")
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          col("media.mime").as("mime"),
          col("media.width").as("width"),
          col("media.height").as("height"),
          col("media.n_frames").as("n_frames"))
        .orderBy(col("doc_id"))),

    // multimodal: frame sampling (stride 4) + per-frame features
    // through the BatchInfer batched-model transport (the default
    // deterministic fingerprint model keeps it oracle-checkable; a
    // real vision tower slots in as a callback)
    "multimodal_framesample" -> ((s, dir) =>
      Multimodal.withFrameFeatures(
        Multimodal.sampleFrames(
          Multimodal.withSyntheticMedia(
            docs(s, dir).filter(col("doc_id") < 200), "text")),
        "payload", "frame_idx")
        .select(col("doc_id"), col("frame_idx"), col("frame_fp"))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // multimodal: REAL header decode. Each row constructs genuine
    // PNG (signature + IHDR) or canonical WAV (RIFF/fmt/data) header
    // BYTES from doc_id arithmetic, and Multimodal.headerDecode
    // parses them back — big/little-endian byte math over BinaryType.
    // The oracle computes the expected fields directly from doc_id
    // and never parses, so agreement proves the parser.
    "multimodal_real_header" -> ((s, dir) => {
      val id = col("doc_id")
      val w = pmod(id, lit(512)) + 16
      val h = pmod(id * 3, lit(384)) + 16
      // PNG: signature, IHDR length 13, "IHDR", w, h, bit depth 8,
      // color 6, compression/filter/interlace 0, CRC placeholder
      val pngHex = concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        be32(w), be32(h), lit("0806000000" + "00000000"))
      val ch = lit(1) + floor(pmod(id, lit(4)) / 2)
      val sr = lit(8000) + pmod(id, lit(8)) * 1000
      val blockAlign = ch * 2 // 16-bit samples
      val nSamp = lit(100) + pmod(id, lit(50))
      val dataBytes = nSamp * blockAlign
      // canonical 44-byte WAV header: RIFF size, WAVE, fmt(16, PCM),
      // channels, sample rate, byte rate, block align, bits, data size
      val wavHex = concat(lit("52494646"), le32(dataBytes + 36),
        lit("57415645" + "666D7420" + "10000000" + "0100"),
        le16(ch), le32(sr), le32(sr * blockAlign), le16(blockAlign),
        lit("1000" + "64617461"), le32(dataBytes))
      val blob = unhex(when(pmod(id, lit(2)) === 0, pngHex).otherwise(wavHex))
      // STAGED projections: blob → hdr → fields. Inlining everything
      // into one select duplicates the (large) construction+parse
      // tree into every output column — the optimizer then spends
      // seconds per run walking a 10k-node plan (measured: 8s plan
      // time vs 0.9s execution). Each stage's outputs reference an
      // ATTRIBUTE of the previous one, and CollapseProject keeps the
      // stages separate because the referenced aliases are non-cheap
      // and used more than once.
      docs(s, dir).select(id).orderBy(id) // narrow sort below the build
        .select(id, blob.as("blob"))
        .select(id, Multimodal.headerDecode(col("blob")).as("hdr"))
        .select(id,
          col("hdr.mime").as("mime"),
          col("hdr.width").as("width"),
          col("hdr.height").as("height"),
          col("hdr.n_frames").as("n_frames"),
          col("hdr.sample_rate").as("sample_rate"),
          col("hdr.channels").as("channels"))
    })
    ,
    // multimodal: REAL per-sample audio feature extraction. Each row
    // builds a full WAV (header + constant-amplitude 16-bit PCM data)
    // and the native wav_rms kernel consumes every sample. Constant
    // samples make the RMS analytically a/32768 in EXACT IEEE
    // arithmetic (a is a multiple of 4096, so x, x², the running sum,
    // the mean, and the sqrt are all dyadic-exact), so the oracle
    // computes the expectation from doc_id without parsing a byte —
    // agreement proves the sample loop.
    "multimodal_wav_rms" -> ((s, dir) => {
      val id = col("doc_id")
      val amp = pmod(id, lit(8)) * 4096 // 0..28672, fits signed 16-bit
      val nSamp = lit(50) + pmod(id, lit(50))
      val dataBytes = nSamp * 2
      val wavHex = concat(lit("52494646"), le32(dataBytes + 36),
        lit("57415645" + "666D7420" + "10000000" + "0100" + "0100"),
        le32(lit(8000)), le32(lit(16000)), lit("0200" + "1000" + "64617461"),
        le32(dataBytes),
        repeat(le16(amp), nSamp.cast("int")))
      // staged projections (see multimodal_real_header: keeps the
      // plan small instead of duplicating the construction tree)
      docs(s, dir).select(id).orderBy(id) // narrow sort below the build
        .select(id, unhex(wavHex).as("blob"))
        .select(id, call_function("wav_rms", col("blob")).as("rms"))
    }),

    // URL canonicalization (crawl-dedup stage 0): each row builds a
    // messy-but-realistic URL from its columns (case-variant scheme/
    // host, www., default port, trailing slash, tracking params,
    // fragment) and UrlFunctions.canonicalizeUrl collapses the
    // aliases. The oracle mirrors every rule in DuckDB SQL, so the
    // canonical string — not just a count — is cross-checked.
    "text_url_normalize" -> ((s, dir) => {
      val id = col("doc_id")
      docs(s, dir).select(id, messyUrl.as("url"))
        .select(id, col("url"),
          graft.functions.UrlFunctions.canonicalizeUrl(col("url"))
            .as("canon"))
        .orderBy(id)
    }),

    // PII detection with checksum verification: 13–19-digit runs are
    // extracted by regex, then VALIDATED with the Luhn checksum (the
    // payment-card check) — the step that separates "card number,
    // redact" from phone numbers/ids that a bare regex would flag.
    // Candidates are synthesized from doc_id (the corpus text has no
    // digits), both engines run their own Luhn fold over the same
    // derived strings, so agreement proves the extraction AND the
    // checksum arithmetic. Scan-stage only — no shuffle, no UDF.
    "text_pii_luhn" -> ((s, dir) => {
      val id = col("doc_id")
      val c1 = lpad(pmod(id * 7919 + 123456789L, lit(10000000000000000L))
        .cast("string"), 16, "0")
      val c2 = lpad(pmod(id * 104729 + 87654321L, lit(10000000000000L))
        .cast("string"), 13, "0")
      val blob = concat(lit("contact 42 office card "), c1,
        lit(" alt "), c2, lit(" end"))
      docs(s, dir).select(id, blob.as("t"))
        .select(id, explode(regexp_extract_all(col("t"),
          lit("[0-9]{13,19}"), lit(0))).as("cand"))
        .select(id, col("cand"),
          TextFunctions.luhnValid(col("cand")).as("luhn_valid"))
        .orderBy(id, col("cand"))
    }),

    // REAL full-file image decode (Multimodal.ppmStats): each row
    // synthesizes a P6 PPM — variable-width ASCII dims (7..18 x
    // 4..8 crosses the 1/2-digit boundary, so the header state
    // machine is genuinely exercised) + a doc_id-derived raster —
    // and the engine parses the BYTES back: header fold + per-channel
    // exact integer sums over every raster byte via byte_at_u8. The
    // oracle recomputes the sums from the GENERATOR arithmetic, so
    // agreement proves the parser read what was written. No codec
    // library, no UDF — O(bytes) scan-stage work.
    "multimodal_ppm_stats" -> ((s, dir) => {
      val id = col("doc_id")
      val w = pmod(id, lit(12)) + 7
      val h = pmod(id, lit(5)) + 4
      val n = w * h * 3
      val header = concat(lit("P6\n"), w.cast("string"), lit(" "),
        h.cast("string"), lit("\n255\n"))
      val rasterHex = array_join(transform(sequence(lit(0L), n - 1),
        j => lpad(hex(pmod(id * 7 + j * 13, lit(256))), 2, "0")), "")
      val blob = unhex(concat(hex(header), rasterHex))
      // NARROW sort first, kernels above it: orderBy-last would make
      // the range partitioner's sampling pass evaluate the blob
      // build + decode a second time — measured 3.9 s of the 27 s
      // sf3 point before this rewrite (the r7 cdc-payload lesson,
      // SCALE.md; sampling is only free when an AQE-materialized
      // exchange sits between the kernel and the sort)
      docs(s, dir).select(id).orderBy(id)
        .select(id, blob.as("blob"))
        .select(id, Multimodal.ppmStats(col("blob")).as("st"))
        .select(id, col("st.width").as("width"),
          col("st.height").as("height"), col("st.n_pix").as("n_pix"),
          col("st.r_sum").as("r_sum"), col("st.g_sum").as("g_sum"),
          col("st.b_sum").as("b_sum"))
    }),

    // REAL PNG raster decode with JDK-only zlib (functions/PngStats):
    // each row builds a REAL compressed PNG — genuine Deflater IDAT
    // stream split across two chunks, CRC32'd chunks, scanline y
    // filtered with type y%5 so every image exercises all five PNG
    // filters — over the SAME doc_id raster arithmetic as the PPM
    // fixture, then the engine decodes the bytes back: chunk walk →
    // Inflater → per-scanline un-filter → exact channel sums. The
    // oracle recomputes the sums from the generator arithmetic, so
    // agreement proves the whole encode→inflate→unfilter path
    // reconstructed the raster (and PngStatsSpec pins the decoder
    // against the JDK's independent ImageIO codec both directions).
    "multimodal_png_stats" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      // narrow sort below the kernels (see multimodal_ppm_stats)
      docs(s, dir).select(id).orderBy(id)
        .select(id,
          call_function("png_stats", call_function("png_fixture",
            id.cast("long"),
            (pmod(id, lit(12)) + 7).cast("int"),
            (pmod(id, lit(6)) + 5).cast("int"))).as("st"))
        .select(id, col("st.width").as("width"),
          col("st.height").as("height"), col("st.n_pix").as("n_pix"),
          col("st.r_sum").as("r_sum"), col("st.g_sum").as("g_sum"),
          col("st.b_sum").as("b_sum"))
    }),

    // HTML → text extraction (functions/HtmlText): the boilerplate-
    // removal step between WARC records and every quality stage. Each
    // row builds a deterministic page (head/style dropped, blocks vs
    // inlines, named + numeric entities, attribute soup) and the
    // oracle constructs the EXPECTED extraction directly — the
    // extractor's edge cases are pinned in HtmlTextSpec; the gate
    // proves the common shape end to end.
    "text_html_extract" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      val html = concat(
        lit("<html><head><title>skip</title><style>p{}</style></head>"),
        lit("<body><h1>Header "), id, lit("</h1>"),
        lit("<p>one "), id, lit(" &amp; two</p>"),
        lit("<script>var x = 1;</script>"),
        lit("<p>three &#189; <b>four</b></p> tail</body></html>"))
      docs(s, dir).select(id).orderBy(id)
        .select(id, html.as("html"))
        .select(id, call_function("html_text", col("html")).as("text"))
        .select(id, col("text"), length(col("text")).as("n_chars"))
    }),

    // the full Common Crawl pipeline at the gate: WARC records →
    // response HTML → html_text → token counts. The oracle
    // reconstructs the extracted text from the fixture arithmetic
    // (WarcFixture body text is k repeats of a known phrase; head —
    // and the title inside it — drops).
    "pipe_warc_text" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      docs(s, dir).select(id).filter(id < 300).orderBy(id)
        .select(id, explode(call_function("warc_records",
          call_function("warc_fixture", id.cast("long"),
            (pmod(id, lit(5)) + 1).cast("int")))).as("r"))
        .filter(col("r.rec_type") === "response")
        .select(id, col("r.target_uri").as("uri"),
          call_function("html_text",
            col("r.payload").cast("string")).as("text"))
        .select(id, col("uri"), col("text"),
          size(split(col("text"), " ")).as("n_tokens"))
        .orderBy(id, col("uri"))
    }),

    // WebDataset ingestion end-to-end (functions/TarCodec): each row
    // is a REAL ustar shard (checksummed headers, 512-alignment, pax
    // and directory entries to skip) holding 3 samples of
    // png+txt+cls members; tar_entries walks it, substring slices
    // members out of the blob, png_stats decodes the image member,
    // and the sample reassembles by key — the standard multimodal
    // training-data format, parsed for real at the gate. Oracle
    // recomputes dims/label/text-length/red-sum from the generator
    // arithmetic.
    "pipe_webdataset_ingest" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      docs(s, dir).select(id).filter(id < 200).orderBy(id)
        .select(id, call_function("tar_fixture", id.cast("long"),
          lit(3).cast("int")).as("shard"))
        .select(id, col("shard"),
          explode(call_function("tar_entries", col("shard"))).as("e"))
        .select(id, col("shard"),
          substring_index(col("e.name"), ".", 1).as("key"),
          substring_index(col("e.name"), ".", -1).as("ext"),
          expr("substring(shard, e.offset + 1, e.size)").as("payload"))
        .groupBy(id, col("key"))
        .agg(
          min(when(col("ext") === "png",
            call_function("png_stats", col("payload")).getField("width")))
            .as("png_w"),
          min(when(col("ext") === "png",
            call_function("png_stats", col("payload")).getField("height")))
            .as("png_h"),
          min(when(col("ext") === "png",
            call_function("png_stats", col("payload")).getField("r_sum")))
            .as("png_r_sum"),
          min(when(col("ext") === "cls", col("payload").cast("string")))
            .as("label"),
          min(when(col("ext") === "txt", length(col("payload"))))
            .as("txt_len"))
        .orderBy(id, col("key"))
    }),

    // Common Crawl-shape WARC ingestion (functions/WarcCodec): each
    // row is a REAL ISO 28500 stream — request/response/metadata
    // records, and per-record-gzip transport on odd ids (the .warc.gz
    // convention, walked through the JDK inflater) — exploded to
    // response records with SQL-side title extraction. The oracle
    // reconstructs the deterministic HTML and its byte length.
    "pipe_warc_ingest" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      docs(s, dir).select(id).filter(id < 300).orderBy(id)
        .select(id, explode(call_function("warc_records",
          call_function("warc_fixture", id.cast("long"),
            (pmod(id, lit(5)) + 1).cast("int")))).as("r"))
        .filter(col("r.rec_type") === "response")
        .select(id, col("r.target_uri").as("uri"),
          col("r.content_length").as("content_length"),
          regexp_extract(col("r.payload").cast("string"),
            "<title>([^<]*)</title>", 1).as("title"))
        .orderBy(id, col("uri"))
    }),

    // REAL FLAC metadata decode (functions/AudioMeta): the block walk
    // + STREAMINFO's byte-straddling bit fields (20-bit sample rate,
    // 3-bit channels, 5-bit bits, 36-bit total samples). Oracle
    // recomputes every field from the fixture arithmetic; the packing
    // itself is pinned against hand-assembled bytes in AudioMetaSpec.
    "multimodal_flac_meta" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      docs(s, dir).select(id).orderBy(id)
        .select(id,
          call_function("flac_meta", call_function("flac_fixture",
            id.cast("long"))).as("m"))
        .select(id, col("m.sample_rate").as("sample_rate"),
          col("m.channels").as("channels"),
          col("m.bits_per_sample").as("bits_per_sample"),
          col("m.total_samples").as("total_samples"),
          col("m.duration_ms").as("duration_ms"),
          col("m.n_blocks").as("n_blocks"))
    }),

    // REAL MP3 metadata decode (functions/AudioMeta): ID3v2 syncsafe
    // skip + a full Layer III frame walk with table-driven lengths
    // (version/bitrate/sample-rate/padding all id-derived, padding
    // ALTERNATING per frame so lengths genuinely vary), ID3v1
    // trailer tolerated. Duration comes from per-frame sample counts
    // — the walk's point vs filesize/bitrate guessing.
    "multimodal_mp3_meta" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      docs(s, dir).select(id).orderBy(id)
        .select(id,
          call_function("mp3_meta", call_function("mp3_fixture",
            id.cast("long"), (pmod(id, lit(20)) + 1).cast("int"))).as("m"))
        .select(id, col("m.mpeg_version").as("mpeg_version"),
          col("m.bitrate_kbps").as("bitrate_kbps"),
          col("m.sample_rate").as("sample_rate"),
          col("m.channels").as("channels"),
          col("m.n_frames").as("n_frames"),
          col("m.duration_ms").as("duration_ms"))
    }),

    // REAL TIFF decode (functions/TiffCodec): both byte orders by id
    // parity, IFD tag walk with inline-or-offset values, multi-strip
    // raster assembly, multi-page chains (n_pages counts the IFDs,
    // id%4==0 files carry two). Gray on id%3==0 — exercising both
    // photometric shapes at the gate. Oracle recomputes channel sums
    // from the generator arithmetic; TiffStatsSpec pins the codec
    // both directions against ImageIO's independent TIFF plugin.
    "multimodal_tiff_stats" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      // narrow sort below the kernels (see multimodal_ppm_stats)
      docs(s, dir).select(id).orderBy(id)
        .select(id,
          call_function("tiff_stats", call_function("tiff_fixture",
            id.cast("long"),
            (pmod(id, lit(12)) + 7).cast("int"),
            (pmod(id, lit(9)) + 3).cast("int"))).as("st"))
        .select(id, col("st.width").as("width"),
          col("st.height").as("height"),
          col("st.channels").as("channels"),
          col("st.n_pages").as("n_pages"),
          col("st.n_pix").as("n_pix"),
          col("st.r_sum").as("r_sum"), col("st.g_sum").as("g_sum"),
          col("st.b_sum").as("b_sum"))
    }),

    // REAL BMP raster decode (functions/BmpCodec): bottom-up BGR rows
    // with 4-byte padding (top-down on id%5==0), decoded back into
    // exact channel sums. w = id%12+7 sweeps every padding residue.
    // The oracle recomputes from the generator arithmetic; BmpStatsSpec
    // pins the codec both directions against ImageIO (lossless, so
    // the foreign-writer comparison is exact, and positional reads
    // pin the row-direction handling).
    "multimodal_bmp_stats" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      // narrow sort below the kernels (see multimodal_ppm_stats)
      docs(s, dir).select(id).orderBy(id)
        .select(id,
          call_function("bmp_stats", call_function("bmp_fixture",
            id.cast("long"),
            (pmod(id, lit(12)) + 7).cast("int"),
            (pmod(id, lit(6)) + 5).cast("int"))).as("st"))
        .select(id, col("st.width").as("width"),
          col("st.height").as("height"),
          col("st.channels").as("channels"),
          col("st.n_pix").as("n_pix"),
          col("st.r_sum").as("r_sum"), col("st.g_sum").as("g_sum"),
          col("st.b_sum").as("b_sum"))
    }),

    // frame sampling driven by REAL container metadata: the stride-4
    // frame expansion (the multimodal_framesample shape) running on
    // n_frames values parsed out of genuine MP4 box trees rather than
    // the opaque-blob stub — the integration the curation pipeline
    // uses to budget per-video work. Bounded explode: nf ≤ 24.
    "multimodal_mp4_framesample" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      docs(s, dir).select(id).filter(id < 200).orderBy(id)
        .select(id,
          call_function("mp4_meta", call_function("mp4_fixture",
            id.cast("long"), lit(320), lit(240),
            (pmod(id, lit(24)) + 1).cast("int"))).as("m"))
        .select(id, col("m.n_frames").as("n_frames"))
        .select(id, col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(4L)))
            .as("frame_idx"))
        .orderBy(id, col("frame_idx"))
    }),

    // REAL baseline JPEG decode (functions/JpegCodec — canonical
    // Huffman entropy decoding, byte unstuffing, DRI/RST predictor
    // resets, dequant, double-precision IDCT): each row builds a real
    // JPEG whose raster is constant per 8x8 block, which makes the
    // decode EXACT in every conformant decoder (a DC-only block's
    // IDCT is a constant — T.81's rounding freedom never engages), so
    // the oracle recomputes sums from the generator arithmetic while
    // the stream still exercises DC-difference coding, category bit
    // emission, stuffing, and (id%3==0) restart markers. Arbitrary-
    // content decode is pinned against ImageIO per-pixel (±1, the
    // conformance bound) in JpegStatsSpec.
    "multimodal_jpeg_stats" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      // narrow sort below the kernels (see multimodal_ppm_stats)
      docs(s, dir).select(id).orderBy(id)
        .select(id,
          call_function("jpeg_stats", call_function("jpeg_fixture",
            id.cast("long"),
            ((pmod(id, lit(6)) + 1) * 8).cast("int"),
            ((pmod(id, lit(4)) + 1) * 8).cast("int"))).as("st"))
        .select(id, col("st.width").as("width"),
          col("st.height").as("height"),
          col("st.channels").as("channels"),
          col("st.n_pix").as("n_pix"),
          col("st.r_sum").as("r_sum"), col("st.g_sum").as("g_sum"),
          col("st.b_sum").as("b_sum"))
    }),

    // REAL GIF raster decode with a from-scratch LZW decompressor
    // (functions/GifCodec — variable-width codes, clear/EOI,
    // 4096-entry dictionary, the spec's deferred growth off-by-one):
    // each row builds a real GIF89a — 256-entry palette + LZW-encoded
    // raster over the PPM/PNG generator arithmetic, a skipped
    // graphic-control extension, a comment extension, and a second
    // 2x2 local-color-table frame on id%4==0 — and gif_stats decodes
    // the bytes back into frame counts and exact per-channel sums.
    // The oracle recomputes palette[index(j)] sums from the generator
    // arithmetic; GifStatsSpec pins the codec both directions against
    // the JDK's independent ImageIO GIF codec.
    "multimodal_gif_stats" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      // narrow sort below the kernels (see multimodal_ppm_stats)
      docs(s, dir).select(id).orderBy(id)
        .select(id,
          call_function("gif_stats", call_function("gif_fixture",
            id.cast("long"),
            (pmod(id, lit(12)) + 7).cast("int"),
            (pmod(id, lit(6)) + 5).cast("int"))).as("st"))
        .select(id, col("st.width").as("width"),
          col("st.height").as("height"),
          col("st.n_frames").as("n_frames"),
          col("st.n_pix").as("n_pix"),
          col("st.r_sum").as("r_sum"), col("st.g_sum").as("g_sum"),
          col("st.b_sum").as("b_sum"))
    }),

    // REAL G.711 audio decode (telephony μ-law/A-law, ITU's public
    // spec): each row builds a companded 8-bit WAV the way real
    // encoders write them — 18-byte fmt chunk (cbSize=0) + a fact
    // chunk BEFORE data, so the kernel's RIFF chunk walk is exercised
    // at the gate, not just in specs — and wav_rms expands every
    // sample through the G.711 segment tables to 16-bit linear before
    // the RMS fold. Constant samples make the RMS |decoded|/32768 in
    // EXACT IEEE arithmetic, so the oracle recomputes the companding
    // arithmetic in SQL and never parses a byte; the tables
    // themselves are pinned against the JDK's independent javax.sound
    // codecs in WavRmsSpec.
    "multimodal_wav_g711_rms" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      val v = pmod(id, lit(256))
      val fmtCode = when(pmod(id, lit(2)) === 1, 6).otherwise(7)
      val nSamp = lit(50) + pmod(id, lit(25)) * 2 // even: no pad byte
      val wavHex = concat(
        lit("52494646"), le32(nSamp + 50), lit("57415645"),
        lit("666D7420"), le32(lit(18)), le16(fmtCode), le16(lit(1)),
        le32(lit(8000)), le32(lit(8000)), le16(lit(1)), le16(lit(8)),
        le16(lit(0)),
        lit("66616374"), le32(lit(4)), le32(nSamp),
        lit("64617461"), le32(nSamp),
        repeat(hex2(v), nSamp.cast("int")))
      // staged projections + narrow sort below the kernel (the
      // multimodal_wav_rms shape)
      docs(s, dir).select(id).orderBy(id)
        .select(id, fmtCode.as("fmt"), unhex(wavHex).as("blob"))
        .select(id, col("fmt"),
          call_function("wav_rms", col("blob")).as("rms"))
    }),

    // REAL MP4 / ISO-BMFF metadata walk (functions/Mp4Codec): each
    // row builds a genuinely spec-compliant MP4 — size-chained nested
    // boxes, v0/v1 FullBoxes by id residue, an audio trak BEFORE the
    // video trak on odd ids (handler-based selection, not position),
    // frame count split across two stts runs, a 64-bit-largesize mdat
    // on id%3==0, unknown boxes to skip — and mp4_meta walks the tree
    // back out: brand, track count, timescale, duration, 16.16 dims,
    // stts frame total, stsd codec. The oracle recomputes every field
    // from the generator arithmetic, so agreement proves the box walk
    // (and Mp4MetaSpec pins the parser against hand-assembled
    // byte-level fixtures the builder never touched).
    "multimodal_mp4_meta" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val id = col("doc_id")
      // narrow sort below the kernels (see multimodal_ppm_stats)
      docs(s, dir).select(id).orderBy(id)
        .select(id,
          call_function("mp4_meta", call_function("mp4_fixture",
            id.cast("long"),
            (pmod(id, lit(640)) + 16).cast("int"),
            (pmod(id * 3, lit(480)) + 16).cast("int"),
            (pmod(id, lit(24)) + 1).cast("int"))).as("m"))
        .select(id, col("m.brand").as("brand"),
          col("m.n_tracks").as("n_tracks"),
          col("m.timescale").as("timescale"),
          col("m.duration_ms").as("duration_ms"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.n_frames").as("n_frames"), col("m.codec").as("codec"))
    }),

    // Unicode NFC normalization (functions/NfcNormalize — the stage
    // that must run BEFORE hash dedup/shingling: composed vs
    // decomposed accents are byte-different, render-identical
    // strings, so un-normalized corpora under-deduplicate). Each doc
    // gets a synthetic messy-unicode string (decomposed e+U+0301,
    // composed U+00E9, double-accented, pure ASCII); both engines
    // normalize independently and the canonical string, codepoint
    // counts, and changed flag all cross-check (java.text.Normalizer
    // vs DuckDB's utf8proc — same TR15 forms).
    "text_unicode_nfc" -> ((s, dir) => {
      val id = col("doc_id")
      val raw = element_at(array(nfcSamples.map(lit): _*),
        (pmod(id, lit(4)) + 1).cast("int"))
      docs(s, dir).select(id, raw.as("raw"))
        .select(id, col("raw"),
          call_function("nfc_normalize", col("raw")).as("norm"))
        .select(id, length(col("raw")).as("raw_cp"),
          length(col("norm")).as("norm_cp"), col("norm"),
          (col("norm") =!= col("raw")).as("changed"))
        .orderBy(id)
    }),

    // one-pass blocklist / canary-phrase matching: the native
    // Aho-Corasick expression (functions/MultiMatch) finds every
    // blocklist pattern in ONE scan of each document — O(text+hits),
    // independent of pattern count — where the oracle (and a naive
    // pipeline) runs #patterns contains() scans. Byte-level exact
    // substring semantics: "ector t" matches mid-word, and the
    // overlapping patterns ("fast table" / "table value") each
    // report independently.
    "text_blocklist_hits" -> ((s, dir) => {
      val id = col("doc_id")
      docs(s, dir).select(id,
        explode(call_function("multi_match", col("text"),
          array(blocklist.map(lit): _*))).as("pat_id"))
        .orderBy(id, col("pat_id"))
    }),

    // blocklist FILTER (the curation stage form): survivors are the
    // docs matching NO pattern, via multi_match_any — which
    // EARLY-EXITS at the first hit instead of enumerating matches
    // it is about to discard. Same automaton, boolean output.
    "text_blocklist_filter" -> ((s, dir) => {
      val id = col("doc_id")
      docs(s, dir)
        .filter(!call_function("multi_match_any", col("text"),
          array(blocklist.map(lit): _*)))
        .select(id)
        .orderBy(id)
    }),

    // TF-IDF-style top terms: per-doc term frequency × corpus
    // document frequency, top-3 terms per doc ranked (tf desc, df
    // asc, term asc — rarer-in-corpus breaks tf ties). All-integer
    // scoring: the idf ORDERING is what the ranking needs, and
    // integer (tf, df) ranks identically to tf·log(N/df) without
    // cross-engine libm log() drift. explode → two hash aggregates →
    // join → per-doc top-k: every stage map-side-combines and
    // shuffles bounded keys.
    "text_tfidf_top_terms" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      val tf = docs(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      // tf has one row per (doc, term) ⇒ count per term IS doc freq
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      tf.join(dfreq, "term")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // BM25 keyword retrieval (rational-idf variant — see ops/Bm25
    // for the scoring + determinism contract): top-10 docs for each
    // of four fixed queries. Query terms filter the token explode at
    // the scan; df/query-map broadcast; per-query top-k through the
    // bounded-heap topk_pairs aggregate (shuffle O(queries·k), never
    // a posting-list window sort).
    "text_bm25_topk" -> ((s, dir) =>
      graft.ops.Bm25.topK(docs(s, dir), "doc_id",
          TextFunctions.tokens(col("text")), bm25Queries, 10)
        .orderBy(col("query_id"), col("rnk")))
  )

  /** Fixed BM25 demo query set over the corpus vocabulary — mixed
    * df (rare-ish "fast" vs stopword-grade "the") exercises the idf
    * spread; [[sqlBm25Queries]] is the VALUES mirror. */
  private[queries] val bm25Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("fast", "hash", "join"),
    2 -> Seq("slow", "table", "scan"),
    3 -> Seq("vector", "agg", "stream"),
    4 -> Seq("the", "spark", "query"))

  private[queries] val sqlBm25Queries: String = bm25Queries
    .flatMap { case (qid, ts) => ts.map(t => s"($qid,'$t')") }
    .mkString(", ")

  private[queries] val sqlBm25Terms: String = bm25Queries
    .flatMap(_._2).distinct.map(t => s"'$t'").mkString("(", ",", ")")

  /** Messy-unicode samples for text_unicode_nfc, built from \\u
    * escapes so no editor/tool can silently normalize them: [0]
    * decomposed e+COMBINING ACUTE, [1] the composed U+00E9 twin
    * (same NFC), [2] decomposed diaeresis + ring, [3] pure ASCII
    * (the fast-path identity). Interpolated RAW into the oracle SQL
    * — the bytes, not an escape syntax, cross the engine boundary. */
  private[queries] val nfcSamples: Seq[String] = Seq(
    "café menu", "café menu",
    "Angström Å unit", "plain ascii text")

  /** Blocklist for text_blocklist_hits — phrases over the corpus
    * vocabulary, chosen to exercise overlap ("fast table" vs "table
    * value" share a word), mid-word byte matching ("ector t"), a
    * single-token pattern ("vector"), and a guaranteed miss. */
  private[queries] val blocklist: Seq[String] = Seq(
    "slow fast", "fast table", "table value", "value table",
    "agg row scan", "vector", "ector t", "zz-never-matches", "a a the")

  /** The synthetic messy URL both text_url_normalize and dedup_url
    * build over a `documents` row (Column form; [[sqlUrl]] is the
    * DuckDB mirror — one rule set, two renderings). */
  private[queries] def messyUrl: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(
      lit("HTTPS://WWW."), col("source"), lit(".Example.COM:443/Cat/"),
      pmod(id, lit(5)).cast("string"),
      when(pmod(id, lit(3)) === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&b="), pmod(id, lit(4)).cast("string"),
      lit("&a="), pmod(id, lit(3)).cast("string"),
      when(pmod(id, lit(4)) === 0, lit("&gclid=x")).otherwise(lit("")),
      lit("#sec"), pmod(id, lit(7)).cast("string"))
  }

  /** DuckDB rendering of [[messyUrl]]. Line-trailing `||` only: this
    * fragment is re-embedded in s"..".stripMargin oracle templates,
    * and a line STARTING with `||` would lose its first pipe to the
    * outer stripMargin. */
  private[queries] val sqlUrl: String =
    """'HTTPS://WWW.' || source || '.Example.COM:443/Cat/' ||
      | CAST(doc_id % 5 AS VARCHAR) ||
      | CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
      | '?utm_source=feed&b=' || CAST(doc_id % 4 AS VARCHAR) ||
      | '&a=' || CAST(doc_id % 3 AS VARCHAR) ||
      | CASE WHEN doc_id % 4 = 0 THEN '&gclid=x' ELSE '' END ||
      | '#sec' || CAST(doc_id % 7 AS VARCHAR)""".stripMargin

  /** DuckDB mirror of UrlFunctions.canonicalizeUrl: CTE stages over a
    * relation `u(doc_id, url)`; the final expression is `canon`. */
  private[queries] val sqlCanonStages: String =
    """p AS (SELECT doc_id, url,
      |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      |    AS scheme,
      |  regexp_replace(lower(regexp_extract(url, '://([^/?#:]*)', 1)),
      |    '^www\.', '') AS host,
      |  regexp_extract(url, '://[^/?#:]*:([0-9]+)', 1) AS port,
      |  regexp_replace(regexp_extract(url, '://[^/?#]*(/[^?#]*)', 1),
      |    '/+$', '') AS path0,
      |  regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS q
      |  FROM u),
      |k AS (SELECT doc_id, url, scheme, host, port, path0,
      |  list_sort(list_filter(string_split(q, '&'),
      |    x -> x <> '' AND NOT starts_with(string_split(x, '=')[1], 'utm_')
      |      AND string_split(x, '=')[1] NOT IN ('fbclid', 'gclid', 'ref')))
      |    AS kept
      |  FROM p),
      |c AS (SELECT doc_id, url,
      |  scheme || '://' || host ||
      |  CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
      |         OR (scheme = 'https' AND port = '443')
      |       THEN '' ELSE ':' || port END ||
      |  CASE WHEN path0 = '' THEN '/' ELSE path0 END ||
      |  CASE WHEN len(kept) = 0 THEN ''
      |       ELSE '?' || array_to_string(kept, '&') END AS canon
      |  FROM k)""".stripMargin

  /** DuckDB second-implementation BPE trainer: a recursive CTE whose
    * working table is ONE row carrying the whole trainer state (the
    * word table as a list column + the rule just emitted). Each
    * iteration re-derives adjacent-pair counts with list lambdas
    * (sort + run-length fold = the GROUP BY), picks the best pair
    * under the exact trainer tie-break (freq DESC, left ASC, right
    * ASC — DuckDB VARCHAR order is binary UTF-8 = code-point order,
    * matching Spark UTF8String), and rewrites every word with one
    * left-to-right non-overlapping merge pass (list_reduce; after a
    * merge the new tail symbol is left||right ≠ left, so the fold
    * cannot re-merge into a just-merged token — the same argument
    * that makes BpeTrain.mergePair's justMerged flag redundant).
    * Stops when the best pair's count < 2 or maxMerges is reached —
    * BpeTrain.train's contract, derived independently from the
    * trainer's documented semantics, NOT from its code path. The
    * corpus feeding it is ~30 distinct words, so the single-row
    * state stays tiny at every scale factor. */
  private[queries] def sqlBpeTrainCte(maxMerges: Int): String =
    s"""WITH RECURSIVE
       |wc AS (
       |  SELECT w AS word, count(*)::BIGINT AS cnt
       |  FROM (SELECT unnest($sqlToks) AS w FROM documents)
       |  WHERE len(w) > 0
       |  GROUP BY w
       |),
       |init AS (
       |  SELECT list({'s': string_split(word, ''), 'c': cnt}
       |              ORDER BY word) AS words
       |  FROM wc
       |),
       |bpe AS (
       |  SELECT 0 AS rnk, words,
       |         CAST(NULL AS STRUCT(l VARCHAR, r VARCHAR, f BIGINT)) AS rule
       |  FROM init
       |  UNION ALL
       |  SELECT rnk + 1,
       |         list_transform(words, w -> CASE WHEN len(w.s) < 2 THEN w ELSE
       |           {'s': list_reduce(list_transform(w.s, x -> [x]),
       |                   (acc, x) -> CASE WHEN acc[-1] = best.l AND x[1] = best.r
       |                               THEN acc[:len(acc)-1] || [best.l || best.r]
       |                               ELSE acc || x END),
       |            'c': w.c} END),
       |         best
       |  FROM (
       |    SELECT rnk, words,
       |      CASE WHEN len(grouped) = 0 THEN NULL ELSE
       |        {'l': list_sort(list_transform(grouped,
       |                g -> {'nf': -g.f, 'l': g.l, 'r': g.r}))[1].l,
       |         'r': list_sort(list_transform(grouped,
       |                g -> {'nf': -g.f, 'l': g.l, 'r': g.r}))[1].r,
       |         'f': -list_sort(list_transform(grouped,
       |                g -> {'nf': -g.f, 'l': g.l, 'r': g.r}))[1].nf}
       |      END AS best
       |    FROM (
       |      SELECT rnk, words,
       |        CASE WHEN len(pairs) = 0
       |          THEN CAST([] AS STRUCT(l VARCHAR, r VARCHAR, f BIGINT)[])
       |          ELSE list_reduce(
       |            list_transform(list_sort(pairs),
       |              p -> [{'l': p.l, 'r': p.r, 'f': p.c}]),
       |            (acc, x) -> CASE
       |              WHEN acc[-1].l = x[1].l AND acc[-1].r = x[1].r
       |              THEN acc[:len(acc)-1] ||
       |                [{'l': x[1].l, 'r': x[1].r, 'f': acc[-1].f + x[1].f}]
       |              ELSE acc || x END)
       |        END AS grouped
       |      FROM (
       |        SELECT rnk, words,
       |          flatten(list_transform(words, w ->
       |            list_transform(range(1, len(w.s)),
       |              i -> {'l': w.s[i], 'r': w.s[i+1], 'c': w.c}))) AS pairs
       |        FROM bpe
       |      )
       |    )
       |  )
       |  WHERE rnk < $maxMerges AND best.f >= 2
       |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_bpe_vocab" ->
      (sqlBpeTrainCte(1200) +
        """
          |SELECT rnk::INTEGER AS rank, rule.l AS "left", rule.r AS "right",
          |  rule.l || rule.r AS merged, rule.f AS freq
          |FROM bpe WHERE rnk >= 1 ORDER BY rank""".stripMargin),
    // train 40 rules, then encode each DISTINCT word by replaying the
    // rule table in rank order (one merge pass per rule — the
    // sequential contract applyMerges/bpe_encode implement), and join
    // the per-word token counts back to the exploded corpus
    "text_bpe_encode" ->
      (sqlBpeTrainCte(40) +
        s""",
           |rules AS (
           |  SELECT list({'l': rule.l, 'r': rule.r} ORDER BY rnk) AS rl
           |  FROM bpe WHERE rnk >= 1
           |),
           |dw AS (
           |  SELECT DISTINCT w
           |  FROM (SELECT unnest($sqlToks) AS w FROM documents)
           |  WHERE len(w) > 0
           |),
           |enc AS (
           |  SELECT w, len(
           |    list_reduce(
           |      [CAST({'s': string_split(w, ''), 'l': NULL, 'r': NULL}
           |            AS STRUCT(s VARCHAR[], l VARCHAR, r VARCHAR))] ||
           |      list_transform(rl, q -> {'s': NULL, 'l': q.l, 'r': q.r}),
           |      (acc, x) -> {'s': CASE WHEN len(acc.s) < 2 THEN acc.s ELSE
           |          list_reduce(list_transform(acc.s, y -> [y]),
           |            (a2, y) -> CASE WHEN a2[-1] = x.l AND y[1] = x.r
           |                       THEN a2[:len(a2)-1] || [x.l || x.r]
           |                       ELSE a2 || y END) END,
           |        'l': NULL, 'r': NULL}
           |    ).s)::BIGINT AS n_tok
           |  FROM dw, rules
           |),
           |docw AS (
           |  SELECT doc_id, unnest($sqlToks) AS w FROM documents
           |)
           |SELECT d.doc_id, count(*)::BIGINT AS n_words,
           |  CAST(sum(e.n_tok) AS BIGINT) AS n_bpe_tokens
           |FROM docw d JOIN enc e ON d.w = e.w
           |WHERE len(d.w) > 0
           |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin),
    // same generator arithmetic as the PPM oracle, different height
    // modulus (h = id%6+5 keeps every fixture ≥ 5 rows so all five
    // PNG filter types appear in every image)
    "multimodal_png_stats" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(doc_id % 12 + 7 AS BIGINT) AS w,
        |    CAST(doc_id % 6 + 5 AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(w * h AS BIGINT) AS n_pix,
        |  CAST(list_sum(list_transform(range(0, w*h*3),
        |    j -> CASE WHEN j % 3 = 0 THEN (doc_id*7 + j*13) % 256
        |         ELSE 0 END)) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, w*h*3),
        |    j -> CASE WHEN j % 3 = 1 THEN (doc_id*7 + j*13) % 256
        |         ELSE 0 END)) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(range(0, w*h*3),
        |    j -> CASE WHEN j % 3 = 2 THEN (doc_id*7 + j*13) % 256
        |         ELSE 0 END)) AS BIGINT) AS b_sum
        |FROM d ORDER BY doc_id""".stripMargin,
    "multimodal_ppm_stats" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(doc_id % 12 + 7 AS BIGINT) AS w,
        |    CAST(doc_id % 5 + 4 AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(w * h AS BIGINT) AS n_pix,
        |  CAST(list_sum(list_transform(range(0, w*h*3),
        |    j -> CASE WHEN j % 3 = 0 THEN (doc_id*7 + j*13) % 256
        |         ELSE 0 END)) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, w*h*3),
        |    j -> CASE WHEN j % 3 = 1 THEN (doc_id*7 + j*13) % 256
        |         ELSE 0 END)) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(range(0, w*h*3),
        |    j -> CASE WHEN j % 3 = 2 THEN (doc_id*7 + j*13) % 256
        |         ELSE 0 END)) AS BIGINT) AS b_sum
        |FROM d ORDER BY doc_id""".stripMargin,
    // the oracle CONSTRUCTS the expected extraction: head/style/
    // script content gone, h1/p boundaries as paragraph breaks,
    // entities decoded, whitespace collapsed, the trailing bare text
    // separated by the single </p> newline
    "text_html_extract" ->
      """WITH t AS (SELECT doc_id,
        |    'Header ' || doc_id || chr(10) || chr(10) ||
        |    'one ' || doc_id || ' & two' || chr(10) || chr(10) ||
        |    'three ½ four' || chr(10) || 'tail' AS text
        |  FROM documents)
        |SELECT doc_id, text, CAST(length(text) AS INTEGER) AS n_chars
        |FROM t ORDER BY doc_id""".stripMargin,
    // response i's extracted text is k = i%4+1 repeats of the crawl
    // phrase, right-trimmed (the head — title included — drops)
    "pipe_warc_text" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 5 + 1 AS INTEGER) AS np
        |    FROM documents WHERE doc_id < 300),
        |p AS (SELECT doc_id, i FROM d, unnest(range(0, np)) AS t(i)),
        |e AS (SELECT doc_id, i,
        |    rtrim(repeat('crawl text ' || doc_id || ' ' || i || ' ',
        |      CAST(i % 4 + 1 AS INTEGER))) AS text
        |  FROM p)
        |SELECT doc_id,
        |  'https://example.com/' || doc_id || '/' || i AS uri,
        |  text,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        |FROM e ORDER BY doc_id, uri""".stripMargin,
    // per shard: 3 samples; sample i has a png of dims (i%5+3, i%4+3)
    // built from generator id*31+i, label (id+i)%10, and the literal
    // sample text — all recomputable without touching a tar byte
    "pipe_webdataset_ingest" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        |s AS (SELECT doc_id, i FROM d, unnest([0,1,2]) AS t(i)),
        |e AS (SELECT doc_id, i,
        |    CAST(i % 5 + 3 AS BIGINT) AS w,
        |    CAST(i % 4 + 3 AS BIGINT) AS h,
        |    doc_id * 31 + i AS pid
        |  FROM s)
        |SELECT doc_id, lpad(CAST(i AS VARCHAR), 6, '0') AS key,
        |  CAST(w AS INTEGER) AS png_w, CAST(h AS INTEGER) AS png_h,
        |  CAST(list_sum(list_transform(range(0, w*h*3),
        |    j -> CASE WHEN j % 3 = 0 THEN (pid*7 + j*13) % 256
        |         ELSE 0 END)) AS BIGINT) AS png_r_sum,
        |  CAST((doc_id + i) % 10 AS VARCHAR) AS label,
        |  CAST(length('sample ' || i || ' of shard ' || doc_id)
        |    AS INTEGER) AS txt_len
        |FROM e ORDER BY doc_id, key""".stripMargin,
    // response record i of page i: deterministic HTML reconstructed
    // in SQL, so the byte length and title cross-check the record
    // walk (and the per-record-gzip inflation on odd ids)
    "pipe_warc_ingest" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 5 + 1 AS INTEGER) AS np
        |    FROM documents WHERE doc_id < 300),
        |p AS (SELECT doc_id, i FROM d, unnest(range(0, np)) AS t(i)),
        |h AS (SELECT doc_id, i,
        |    '<html><head><title>doc ' || doc_id || '-' || i ||
        |    '</title></head><body>' ||
        |    repeat('crawl text ' || doc_id || ' ' || i || ' ',
        |      CAST(i % 4 + 1 AS INTEGER)) || '</body></html>' AS html
        |  FROM p)
        |SELECT doc_id,
        |  'https://example.com/' || doc_id || '/' || i AS uri,
        |  CAST(length(html) AS BIGINT) AS content_length,
        |  'doc ' || doc_id || '-' || i AS title
        |FROM h ORDER BY doc_id, uri""".stripMargin,
    // fixture arithmetic: sr = 8000+(id%12)*4000, ch = 1+id%8,
    // bps = 8+id%17, total = id*1000+1, 3 metadata blocks
    "multimodal_flac_meta" ->
      """WITH d AS (SELECT doc_id,
        |    8000 + (doc_id % 12) * 4000 AS sr,
        |    doc_id * 1000 + 1 AS total
        |  FROM documents)
        |SELECT doc_id, CAST(sr AS INTEGER) AS sample_rate,
        |  CAST(1 + doc_id % 8 AS INTEGER) AS channels,
        |  CAST(8 + doc_id % 17 AS INTEGER) AS bits_per_sample,
        |  CAST(total AS BIGINT) AS total_samples,
        |  CAST((total * 1000) // sr AS BIGINT) AS duration_ms,
        |  CAST(3 AS INTEGER) AS n_blocks
        |FROM d ORDER BY doc_id""".stripMargin,
    // fixture arithmetic: MPEG1 on even ids (1152 samples/frame, the
    // 44.1k-family tables), MPEG2 on odd (576, the 22.05k family);
    // bitrate index 1+id%14, rate index id%3, mono on id%7==0
    "multimodal_mp3_meta" ->
      """WITH d AS (SELECT doc_id,
        |    (doc_id % 2 = 0) AS v1,
        |    CAST(doc_id % 14 AS INTEGER) + 1 AS bri,
        |    CAST(doc_id % 3 AS INTEGER) + 1 AS sri,
        |    doc_id % 20 + 1 AS nf
        |  FROM documents),
        |e AS (SELECT doc_id, v1, nf,
        |    CASE WHEN v1 THEN
        |      ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[bri]
        |    ELSE
        |      ([8,16,24,32,40,48,56,64,80,96,112,128,144,160])[bri]
        |    END AS br,
        |    CASE WHEN v1 THEN ([44100,48000,32000])[sri]
        |    ELSE ([22050,24000,16000])[sri] END AS sr,
        |    CASE WHEN v1 THEN 1152 ELSE 576 END AS spf
        |  FROM d)
        |SELECT doc_id,
        |  CAST(CASE WHEN v1 THEN 1 ELSE 2 END AS INTEGER) AS mpeg_version,
        |  CAST(br AS INTEGER) AS bitrate_kbps,
        |  CAST(sr AS INTEGER) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 2 END AS INTEGER)
        |    AS channels,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST((spf * nf * 1000) // sr AS BIGINT) AS duration_ms
        |FROM e ORDER BY doc_id""".stripMargin,
    // RGB pages use the three-channel generator; gray pages (id%3==0)
    // sum the b-channel generator into all three outputs
    "multimodal_tiff_stats" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(doc_id % 12 + 7 AS BIGINT) AS w,
        |    CAST(doc_id % 9 + 3 AS BIGINT) AS h,
        |    (doc_id % 3 = 0) AS gray
        |  FROM documents)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(CASE WHEN gray THEN 1 ELSE 3 END AS INTEGER) AS channels,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 1 END AS INTEGER)
        |    AS n_pages,
        |  CAST(w * h AS BIGINT) AS n_pix,
        |  CAST(list_sum(list_transform(range(0, w*h),
        |    j -> CASE WHEN gray THEN (doc_id*7 + j*13) % 256
        |         ELSE (doc_id*3 + j*7) % 256 END)) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, w*h),
        |    j -> CASE WHEN gray THEN (doc_id*7 + j*13) % 256
        |         ELSE (doc_id*5 + j*11) % 256 END)) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(range(0, w*h),
        |    j -> (doc_id*7 + j*13) % 256)) AS BIGINT) AS b_sum
        |FROM d ORDER BY doc_id""".stripMargin,
    // pixel j: r = (id*3+j*7)%256, g = (id*5+j*11)%256,
    // b = (id*7+j*13)%256 — padding/row-direction cancel out of sums
    "multimodal_bmp_stats" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(doc_id % 12 + 7 AS BIGINT) AS w,
        |    CAST(doc_id % 6 + 5 AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels,
        |  CAST(w * h AS BIGINT) AS n_pix,
        |  CAST(list_sum(list_transform(range(0, w*h),
        |    j -> (doc_id*3 + j*7) % 256)) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, w*h),
        |    j -> (doc_id*5 + j*11) % 256)) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(range(0, w*h),
        |    j -> (doc_id*7 + j*13) % 256)) AS BIGINT) AS b_sum
        |FROM d ORDER BY doc_id""".stripMargin,
    "multimodal_mp4_framesample" ->
      """WITH d AS (SELECT doc_id, doc_id % 24 + 1 AS nf
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(f AS BIGINT) AS frame_idx
        |FROM d, unnest(range(0, nf, 4)) AS t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // block k of the DC-only jpeg fixture decodes to the constant
    // (id*7 + k*13) % 256 over its 64 pixels, exactly
    "multimodal_jpeg_stats" ->
      """WITH d AS (SELECT doc_id,
        |    (doc_id % 6 + 1) * 8 AS w,
        |    (doc_id % 4 + 1) * 8 AS h
        |  FROM documents),
        |s AS (SELECT doc_id, w, h,
        |    CAST(list_sum(list_transform(range(0, (w//8)*(h//8)),
        |      k -> 64 * ((doc_id*7 + k*13) % 256))) AS BIGINT) AS gsum
        |  FROM d)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(w * h AS BIGINT) AS n_pix,
        |  gsum AS r_sum, gsum AS g_sum, gsum AS b_sum
        |FROM s ORDER BY doc_id""".stripMargin,
    // palette[pixel-index] sums recomputed from the gif_fixture
    // generator arithmetic: index(j) = (id*7+j*13)%256, palette[i] =
    // ((id*3+i*7)%256, (id*5+i*11)%256, (id*7+i*13)%256)
    "multimodal_gif_stats" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(doc_id % 12 + 7 AS BIGINT) AS w,
        |    CAST(doc_id % 6 + 5 AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 1 END AS INTEGER)
        |    AS n_frames,
        |  CAST(w * h AS BIGINT) AS n_pix,
        |  CAST(list_sum(list_transform(range(0, w*h),
        |    j -> (doc_id*3 + ((doc_id*7 + j*13) % 256) * 7) % 256))
        |    AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, w*h),
        |    j -> (doc_id*5 + ((doc_id*7 + j*13) % 256) * 11) % 256))
        |    AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(range(0, w*h),
        |    j -> (doc_id*7 + ((doc_id*7 + j*13) % 256) * 13) % 256))
        |    AS BIGINT) AS b_sum
        |FROM d ORDER BY doc_id""".stripMargin,
    // the G.711 companding arithmetic recomputed in SQL: for a
    // constant sample byte the RMS is |decoded|/32768 exactly (the
    // |μ-law| value needs no sign branch: |±(t-132)| = t-132; A-law's
    // |±t| = t), so integer segment math + one exact dyadic division
    // reproduce the kernel's double bit-for-bit
    "multimodal_wav_g711_rms" ->
      """WITH d AS (SELECT doc_id, doc_id % 256 AS v,
        |    CASE WHEN doc_id % 2 = 1 THEN 6 ELSE 7 END AS fmt
        |  FROM documents),
        |e AS (SELECT doc_id, fmt,
        |    CASE WHEN fmt = 6 THEN
        |      CASE ((xor(v, 85) // 16) % 8)
        |        WHEN 0 THEN (xor(v, 85) % 16) * 16 + 8
        |        WHEN 1 THEN (xor(v, 85) % 16) * 16 + 264
        |        ELSE ((xor(v, 85) % 16) * 16 + 264)
        |          * (1 << (CAST((xor(v, 85) // 16) % 8 AS INTEGER) - 1))
        |      END
        |    ELSE
        |      (((255 - v) % 16) * 8 + 132)
        |        * (1 << CAST(((255 - v) // 16) % 8 AS INTEGER)) - 132
        |    END AS lin
        |  FROM d)
        |SELECT doc_id, CAST(fmt AS INTEGER) AS fmt,
        |  CAST(lin AS DOUBLE) / 32768.0 AS rms
        |FROM e ORDER BY doc_id""".stripMargin,
    // every field recomputed from the mp4_fixture generator
    // arithmetic (timescale/delta/duration derive from doc_id; the
    // duration_ms division is exact integer floor on both engines)
    "multimodal_mp4_meta" ->
      """WITH d AS (SELECT doc_id,
        |    doc_id % 640 + 16 AS w,
        |    (doc_id * 3) % 480 + 16 AS h,
        |    doc_id % 24 + 1 AS nf,
        |    600 + (doc_id % 10) * 100 AS ts,
        |    100 + doc_id % 50 AS delta
        |  FROM documents)
        |SELECT doc_id, 'isom' AS brand,
        |  CAST(1 + doc_id % 2 AS INTEGER) AS n_tracks,
        |  CAST(ts AS INTEGER) AS timescale,
        |  CAST((nf * delta * 1000) // ts AS BIGINT) AS duration_ms,
        |  CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  'avc1' AS codec
        |FROM d ORDER BY doc_id""".stripMargin,
    "text_unicode_nfc" ->
      (s"""WITH r AS (SELECT doc_id,
         |  CASE CAST(doc_id % 4 AS INTEGER)
         |    WHEN 0 THEN '${nfcSamples(0)}'
         |    WHEN 1 THEN '${nfcSamples(1)}'
         |    WHEN 2 THEN '${nfcSamples(2)}'
         |    ELSE '${nfcSamples(3)}' END AS raw
         |  FROM documents)
         |SELECT doc_id, CAST(length(raw) AS INTEGER) AS raw_cp,
         |  CAST(length(nfc_normalize(raw)) AS INTEGER) AS norm_cp,
         |  nfc_normalize(raw) AS norm,
         |  nfc_normalize(raw) <> raw AS changed
         |FROM r ORDER BY doc_id""").stripMargin,
    "text_blocklist_hits" ->
      (blocklist.zipWithIndex.map { case (p, i) =>
        s"SELECT doc_id, $i AS pat_id FROM documents WHERE contains(text, '$p')"
      }.mkString("WITH hits AS (\n", "\nUNION ALL ", ")\n") +
        "SELECT doc_id, pat_id FROM hits ORDER BY doc_id, pat_id"),
    "text_blocklist_filter" ->
      ("SELECT doc_id FROM documents WHERE NOT (" +
        blocklist.map(p => s"contains(text, '$p')").mkString(" OR ") +
        ") ORDER BY doc_id"),
    "text_url_normalize" ->
      s"""WITH u AS (SELECT doc_id, $sqlUrl AS url FROM documents),
         |$sqlCanonStages
         |SELECT doc_id, url, canon FROM c ORDER BY doc_id""".stripMargin,
    "text_pii_luhn" ->
      """WITH cand AS (
        |  SELECT doc_id, lpad(CAST((doc_id * 7919 + 123456789)
        |    % 10000000000000000 AS VARCHAR), 16, '0') AS cand
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, lpad(CAST((doc_id * 104729 + 87654321)
        |    % 10000000000000 AS VARCHAR), 13, '0')
        |  FROM documents),
        |d AS (SELECT doc_id, cand, reverse(cand) AS r FROM cand),
        |g AS (SELECT doc_id, cand, i,
        |        CAST(substring(r, CAST(i AS INTEGER), 1) AS BIGINT) AS dg
        |      FROM d, unnest(range(1, length(r) + 1)) AS t(i)),
        |s AS (SELECT doc_id, cand,
        |        SUM(CASE WHEN i % 2 = 0 THEN
        |              CASE WHEN 2 * dg > 9 THEN 2 * dg - 9 ELSE 2 * dg END
        |            ELSE dg END) AS tot
        |      FROM g GROUP BY doc_id, cand)
        |SELECT doc_id, cand, (tot % 10 = 0) AS luhn_valid
        |FROM s ORDER BY doc_id, cand""".stripMargin,
    "text_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest($sqlToks) AS term FROM documents),
         |tot AS (SELECT COUNT(*) AS total FROM tok)
         |SELECT term, COUNT(*) AS n, (SELECT total FROM tot) AS total
         |FROM tok GROUP BY term
         |HAVING COUNT(*) * 500 > (SELECT total FROM tot)
         |ORDER BY n DESC, term""".stripMargin,
    "text_tfidf_top_terms" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($sqlToks) AS term
         |  FROM documents WHERE doc_id < 200),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |r AS (
         |  SELECT doc_id, term, tf, df,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tf DESC, df ASC, term ASC) AS rnk
         |  FROM tf JOIN dfreq USING (term))
         |SELECT doc_id, term, tf, df, rnk FROM r WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin,
    // mirrors ops/Bm25.topK verbatim: same rational-idf expression
    // tree (constants written as the same arithmetic — `(1.2 + 1.0)`,
    // `(1.0 - 0.75)` — so both engines round identically), same
    // sorted-term left-fold from 0.0, same (score DESC, doc_id) rank
    "text_bm25_topk" ->
      s"""WITH dl AS (SELECT doc_id, len($sqlToks) AS dl FROM documents),
         |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |              CAST(SUM(dl) AS DOUBLE) AS s FROM dl),
         |tok AS (SELECT doc_id, unnest($sqlToks) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
         |       WHERE term IN $sqlBm25Terms GROUP BY 1, 2),
         |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |q(query_id, term) AS (VALUES $sqlBm25Queries),
         |c AS (SELECT q.query_id, tf.doc_id, tf.term,
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
         |  FROM c GROUP BY 1, 2),
         |r AS (SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY score DESC, doc_id) AS rnk
         |  FROM sc)
         |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, doc_id, score
         |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "text_lexical_stats" ->
      s"""WITH d AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |base AS (SELECT doc_id, len(toks) AS n_tok,
         |  len(list_distinct(toks)) AS n_unique FROM d),
         |b0 AS (SELECT doc_id, toks,
         |  unnest(range(0, greatest(len(toks) - 1, 0))) AS i FROM d),
         |bg AS (SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] AS big
         |       FROM b0),
         |cnt AS (SELECT big, count(*) AS c FROM bg GROUP BY 1),
         |pd AS (SELECT bg.doc_id, count(*) AS n_bigrams,
         |         CAST(sum(CASE WHEN cnt.c <= 2 THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_rare
         |       FROM bg JOIN cnt USING (big) GROUP BY 1)
         |SELECT base.doc_id, n_tok, n_unique,
         |  CAST(n_unique AS DOUBLE) / CAST(n_tok AS DOUBLE) AS ttr,
         |  coalesce(n_bigrams, 0) AS n_bigrams,
         |  coalesce(n_rare, 0) AS n_rare,
         |  CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0.0
         |       ELSE CAST(n_rare AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         |  END AS rare_frac
         |FROM base LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_token_stats" ->
      s"""SELECT doc_id,
         | len($sqlToks) AS n_tokens,
         | len(list_filter($sqlToks, t -> t IN $sqlStop)) AS n_stop,
         | CAST(len(list_filter($sqlToks, t -> t IN $sqlStop)) AS DOUBLE)
         |   / CAST(len($sqlToks) AS DOUBLE) AS stop_ratio,
         | CAST(length(replace(trim(text), ' ', '')) AS DOUBLE)
         |   / CAST(len($sqlToks) AS DOUBLE) AS mean_tok_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id, lang,
         | CASE
         |  WHEN list_contains($sqlToks, 'der') OR list_contains($sqlToks, 'und') THEN 'de'
         |  WHEN list_contains($sqlToks, 'le') OR list_contains($sqlToks, 'la') THEN 'fr'
         |  WHEN list_contains($sqlToks, 'el') OR list_contains($sqlToks, 'los') THEN 'es'
         |  WHEN list_contains($sqlToks, 'the') OR list_contains($sqlToks, 'a') THEN 'en'
         |  ELSE 'und' END AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,
    // langIdScript mirror: length-delta script counts with LITERAL
    // range endpoints (Java and RE2 spell \u escapes differently,
    // literal chars are identical); kana beats Han (kana appears
    // only in Japanese), then Hangul, Thai, Han, then the
    // word-marker chain over the same coalesced text
    "text_langid_cjk" ->
      s"""WITH mx AS (${MultilingualFixture.sqlCorpus}),
         |c AS (SELECT doc_id, lang, coalesce(text, '') AS t FROM mx),
         |ct AS (SELECT doc_id, lang, t,
         |         string_split_regex(trim(t), ' +') AS tk FROM c)
         |SELECT doc_id, lang,
         | CASE
         |  WHEN length(t) - length(regexp_replace(t, '[ぁ-ヿ]', '', 'g')) > 0 THEN 'ja'
         |  WHEN length(t) - length(regexp_replace(t, '[가-힣]', '', 'g')) > 0 THEN 'ko'
         |  WHEN length(t) - length(regexp_replace(t, '[ก-๛]', '', 'g')) > 0 THEN 'th'
         |  WHEN length(t) - length(regexp_replace(t, '[一-鿿]', '', 'g')) > 0 THEN 'zh'
         |  WHEN list_contains(tk, 'der') OR list_contains(tk, 'und') THEN 'de'
         |  WHEN list_contains(tk, 'le') OR list_contains(tk, 'la') THEN 'fr'
         |  WHEN list_contains(tk, 'el') OR list_contains(tk, 'los') THEN 'es'
         |  WHEN list_contains(tk, 'the') OR list_contains(tk, 'a') THEN 'en'
         |  ELSE 'und' END AS lang_pred
         |FROM ct ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id,
         | CAST(len(list_filter($sqlToks, t -> t IN $sqlStop)) AS DOUBLE)
         |   / CAST(len($sqlToks) AS DOUBLE)
         | + CASE WHEN len($sqlToks) BETWEEN 5 AND 500
         |        THEN 1.0 ELSE 0.0 END AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_source_stats" ->
      s"""WITH d AS (
         |  SELECT source, doc_id, md5(lower(trim(text))) AS fp,
         |    CAST(len(list_filter($sqlToks, t -> t IN $sqlStop)) AS DOUBLE)
         |      / CAST(len($sqlToks) AS DOUBLE)
         |    + CASE WHEN len($sqlToks) BETWEEN 5 AND 500
         |           THEN 1.0 ELSE 0.0 END AS q
         |  FROM documents),
         |keep AS (SELECT fp, MIN(doc_id) AS keep_id FROM d GROUP BY fp)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN d.doc_id <> k.keep_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dups,
         |  CAST(SUM(CAST(q AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
         |    AS mean_quality
         |FROM d JOIN keep k ON d.fp = k.fp
         |GROUP BY source ORDER BY source""".stripMargin,
    "text_chunking" ->
      s"""WITH d AS (
         |  SELECT doc_id, $sqlToks AS toks FROM documents),
         |k AS (
         |  SELECT doc_id, toks,
         |    GREATEST(CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT), 0)
         |      AS kmax
         |  FROM d),
         |c AS (
         |  SELECT doc_id, CAST(t.i AS INTEGER) AS cid,
         |    array_to_string(
         |      toks[CAST(t.i*24+1 AS INTEGER):CAST(t.i*24+32 AS INTEGER)],
         |      ' ') AS chunk
         |  FROM k, unnest(range(0, kmax + 1)) AS t(i))
         |SELECT doc_id, cid,
         |  CAST(len(string_split(chunk, ' ')) AS INTEGER) AS n_tok,
         |  md5(chunk) AS chunk_md5
         |FROM c ORDER BY doc_id, cid""".stripMargin,
    "text_length_outliers" ->
      """WITH m AS (
        |  SELECT lang, COUNT(*) AS n,
        |    SUM(n_chars) AS sx,
        |    SUM(n_chars * n_chars) AS sxx
        |  FROM documents GROUP BY lang)
        |SELECT d.lang, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN
        |    (CAST(n AS DOUBLE) * CAST(n_chars AS DOUBLE)
        |       - CAST(sx AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(n_chars AS DOUBLE)
        |       - CAST(sx AS DOUBLE))
        |    <= 4.0 * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents d JOIN m ON d.lang = m.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "text_top_ngram_frac" ->
      s"""WITH d AS (SELECT doc_id, n_chars, $sqlToks AS toks
         |           FROM documents),
         |g AS (
         |  SELECT doc_id, n_chars,
         |    toks[CAST(i AS INTEGER)+1] || ' ' || toks[CAST(i AS INTEGER)+2]
         |      AS g
         |  FROM d, unnest(range(0, greatest(len(toks) - 1, 0))) AS t(i)),
         |c AS (SELECT doc_id, n_chars, g, COUNT(*) AS cnt
         |      FROM g GROUP BY 1, 2, 3),
         |r AS (SELECT *, row_number()
         |        OVER (PARTITION BY doc_id ORDER BY cnt DESC, g) AS rn
         |      FROM c)
         |SELECT doc_id, g AS top_gram, cnt AS n_occ,
         |  CAST(cnt * length(g) AS DOUBLE) / CAST(n_chars AS DOUBLE)
         |    AS top_frac
         |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    list_transform(range(0, greatest(len($sqlToks) - 2, 0)),
         |      i -> $sqlToks[CAST(i AS INTEGER)+1] || ' ' ||
         |           $sqlToks[CAST(i AS INTEGER)+2] || ' ' ||
         |           $sqlToks[CAST(i AS INTEGER)+3]) AS sh
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(sh) AS INTEGER) AS n_shingles,
         |  CAST(len(list_distinct(sh)) AS INTEGER) AS n_unique,
         |  CASE WHEN len(sh) > 0
         |    THEN 1.0 - CAST(len(list_distinct(sh)) AS DOUBLE)
         |           / CAST(len(sh) AS DOUBLE)
         |    ELSE 0.0 END AS rep_ratio
         |FROM d ORDER BY doc_id""".stripMargin,
    "text_bpe_tokens" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |      AS INTEGER) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_rolling_fp" ->
      """SELECT doc_id,
        | list_reduce(
        |   list_prepend(0::BIGINT,
        |     list_transform(regexp_extract_all(text, '.'),
        |                    c -> unicode(c)::BIGINT)),
        |   (h, b) -> (h * 131 + b) % 2147483647) AS rfp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_sniff" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id < 400),
        |b AS (SELECT doc_id,
        |        hex(CAST(text AS BLOB)) AS hx,
        |        octet_length(CAST(text AS BLOB)) AS n,
        |        doc_id % 9 AS lane FROM d),
        |st AS (SELECT doc_id, lane, n,
        |        list_transform(range(1, n + 1),
        |          i -> CAST(concat('0x', substring(hx,
        |                 CAST(2*i-1 AS INTEGER), 2)) AS INTEGER))
        |          AS bytes
        |       FROM b)
        |SELECT doc_id,
        |  CASE lane WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
        |    WHEN 2 THEN 'image/gif' WHEN 3 THEN 'image/bmp'
        |    WHEN 4 THEN 'image/tiff' WHEN 5 THEN 'video/mp4'
        |    WHEN 6 THEN 'audio/flac' WHEN 7 THEN 'audio/mpeg'
        |    ELSE 'application/octet-stream' END AS mime,
        |  CASE WHEN lane = 8 THEN CAST(n AS BIGINT) END AS n_bytes,
        |  CASE WHEN lane = 8 THEN CAST(len(list_filter(bytes,
        |    v -> (v >= 32 AND v <= 126) OR v IN (9, 10, 13)))
        |    AS BIGINT) END AS n_printable,
        |  CASE WHEN lane = 8 THEN CAST(len(list_filter(bytes,
        |    v -> v = 0)) AS BIGINT) END AS n_zero,
        |  CASE WHEN lane = 8 THEN CAST(len(list_distinct(bytes))
        |    AS INTEGER) END AS n_distinct
        |FROM st ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        | octet_length(CAST(text AS BLOB)) AS n_bytes,
        | CASE WHEN octet_length(CAST(text AS BLOB)) % 3 = 0 THEN 'image/png'
        |      WHEN octet_length(CAST(text AS BLOB)) % 3 = 1 THEN 'audio/wav'
        |      ELSE 'video/mp4' END AS mime,
        | CAST(64 + octet_length(CAST(text AS BLOB)) % 576 AS INTEGER) AS width,
        | CAST(64 + (octet_length(CAST(text AS BLOB)) * 7) % 448 AS INTEGER) AS height,
        | CAST(1 + octet_length(CAST(text AS BLOB)) % 16 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_framesample" ->
      """WITH m AS (
        |  SELECT doc_id, text,
        |    1 + octet_length(CAST(text AS BLOB)) % 16 AS n_frames
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
        |  md5(text || ':' || CAST(f AS VARCHAR)) AS frame_fp
        |FROM m, unnest(range(0, n_frames, 4)) AS t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "multimodal_wav_rms" ->
      """SELECT doc_id,
        | CAST((doc_id % 8) * 4096 AS DOUBLE) / 32768.0 AS rms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_real_header" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'image/png'
        |      ELSE 'audio/wav' END AS mime,
        | CASE WHEN doc_id % 2 = 0
        |      THEN CAST(doc_id % 512 + 16 AS INTEGER) END AS width,
        | CASE WHEN doc_id % 2 = 0
        |      THEN CAST((doc_id * 3) % 384 + 16 AS INTEGER) END AS height,
        | CASE WHEN doc_id % 2 = 0 THEN CAST(1 AS INTEGER)
        |      ELSE CAST(100 + doc_id % 50 AS INTEGER) END AS n_frames,
        | CASE WHEN doc_id % 2 = 1
        |      THEN CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) END AS sample_rate,
        | CASE WHEN doc_id % 2 = 1
        |      THEN CAST(1 + (doc_id % 4) // 2 AS INTEGER) END AS channels
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
