package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing, SURVEY §7.6.
  *
  * Blobs are opaque `BinaryType` payloads with a typed metadata
  * struct. [[decode]] is a REAL content dispatch: magic-byte
  * detection routes every format the native codec family parses
  * (JPEG/PNG/GIF/BMP/TIFF/PPM/MP4/FLAC/MP3/WAV) to its kernel for
  * header metadata, and true unknowns get [[sniff]]'s exact byte
  * statistics instead of a guess. Text-as-blob TEST corpora go
  * through [[syntheticMediaMeta]] — an explicit fixture generator
  * (the `png_fixture` pattern), never a decode path.
  *
  * 100 TB notes: blobs never shuffle — metadata extraction and frame
  * sampling are narrow projections; any grouping happens on the
  * small extracted-metadata columns. Real pipelines read blobs via
  * `spark.read.format("binaryFile")` with
  * `spark.sql.files.maxPartitionBytes` sized so one partition's
  * blobs fit executor memory.
  */
object Multimodal {

  /** Metadata struct carried beside every blob. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Build a blob column from any string column (test harness: the
    * documents table's text stands in for media bytes). */
  def asBlob(c: Column): Column = c.cast(BinaryType)

  /** Synthetic media metadata for TEXT-AS-BLOB fixtures — the
    * `png_fixture` pattern applied to metadata: a deterministic
    * (mime, dims, frame count) derived from the byte length, so the
    * frame-sampling / batched-inference harness has known frame
    * counts over the text-only gate corpus and the DuckDB oracle
    * reproduces them from `octet_length`. This is a test-data
    * GENERATOR, not a decode: production blobs go through
    * [[decode]], whose unknown branch reports honest byte
    * statistics instead of inventing dimensions. */
  def syntheticMediaMeta(blob: Column): Column = {
    val n = length(blob)
    struct(
      when(pmod(n, lit(3)) === 0, "image/png")
        .when(pmod(n, lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      (lit(64) + pmod(n, lit(576))).cast(IntegerType).as("width"),
      (lit(64) + pmod(n * 7, lit(448))).cast(IntegerType).as("height"),
      (lit(1) + pmod(n, lit(16))).cast(IntegerType).as("n_frames"))
  }

  // ---- real header parsing (pure byte math over BinaryType via the
  // native codegen'd byte_at_u8 expression — one bounds-checked array
  // access per byte, no per-byte hex-string round-trip; see
  // graft.functions.ByteAtU8) ----

  /** Unsigned byte at 1-based position `pos` (NULL out of range). */
  private def u8(blob: Column, pos: Int): Column =
    call_function("byte_at_u8", blob, lit(pos)).cast(LongType)

  /** Big-endian u32 at 1-based `pos` (PNG uses network order). */
  private def beU32(blob: Column, pos: Int): Column =
    u8(blob, pos) * 16777216L + u8(blob, pos + 1) * 65536L +
      u8(blob, pos + 2) * 256L + u8(blob, pos + 3)

  /** Little-endian u16/u32 at 1-based `pos` (RIFF/WAV order). */
  private def leU16(blob: Column, pos: Int): Column =
    u8(blob, pos) + u8(blob, pos + 1) * 256L
  private def leU32(blob: Column, pos: Int): Column =
    u8(blob, pos) + u8(blob, pos + 1) * 256L +
      u8(blob, pos + 2) * 65536L + u8(blob, pos + 3) * 16777216L

  /** PNG: 8-byte signature 89 50 4E 47 0D 0A 1A 0A (binary-literal
    * equality — no hex stringification). */
  def isPng(blob: Column): Column =
    substring(blob, 1, 8) === lit(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47,
      0x0d, 0x0a, 0x1a, 0x0a))

  /** WAV: "RIFF" …size… "WAVE". */
  def isWav(blob: Column): Column =
    substring(blob, 1, 4) === lit("RIFF".getBytes) &&
      substring(blob, 9, 4) === lit("WAVE".getBytes)

  /** P6 PPM (binary RGB) probe: "P6" magic. */
  def isPpm(blob: Column): Column =
    substring(blob, 1, 2) === lit("P6".getBytes)

  /** MP4 / ISO-BMFF probe: an `ftyp` box first (bytes 5-8). */
  def isMp4(blob: Column): Column =
    substring(blob, 5, 4) === lit("ftyp".getBytes)

  /** JPEG: SOI + marker prefix FF D8 FF. */
  def isJpeg(blob: Column): Column =
    substring(blob, 1, 3) ===
      lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte))

  /** GIF: "GIF8" (87a/89a). */
  def isGif(blob: Column): Column =
    substring(blob, 1, 4) === lit("GIF8".getBytes)

  /** BMP: "BM" + header plausibility — the 2-byte ASCII prefix alone
    * would sniff any "BM..."-leading TEXT blob as an image (making
    * downstream lanes data-dependent). Cheap discriminators from the
    * 14-byte file header: minimum length for a file header + core
    * DIB header (26), the two reserved fields (bytes 7-10) REQUIRED
    * zero by the format — text never contains NULs — and a nonzero
    * little-endian size field. */
  def isBmp(blob: Column): Column =
    substring(blob, 1, 2) === lit("BM".getBytes) &&
      length(blob) >= 26 &&
      u8(blob, 7) === 0 && u8(blob, 8) === 0 &&
      u8(blob, 9) === 0 && u8(blob, 10) === 0 &&
      (u8(blob, 3) + u8(blob, 4) + u8(blob, 5) + u8(blob, 6)) > 0

  /** TIFF: little-endian "II*\0" or big-endian "MM\0*". */
  def isTiff(blob: Column): Column =
    substring(blob, 1, 4) === lit(Array[Byte](0x49, 0x49, 0x2a, 0x00)) ||
      substring(blob, 1, 4) === lit(Array[Byte](0x4d, 0x4d, 0x00, 0x2a))

  /** FLAC: "fLaC" stream marker. */
  def isFlac(blob: Column): Column =
    substring(blob, 1, 4) === lit("fLaC".getBytes)

  /** MP3: ID3v2 tag, or a bare MPEG frame sync (FF Ex/Fx). */
  def isMp3(blob: Column): Column =
    substring(blob, 1, 3) === lit("ID3".getBytes) ||
      (u8(blob, 1) === 0xff && u8(blob, 2) >= 0xe0)

  /** gzip member: 1F 8B. */
  def isGzip(blob: Column): Column =
    substring(blob, 1, 2) === lit(Array[Byte](0x1f, 0x8b.toByte))

  /** WARC record head: "WARC/". */
  def isWarc(blob: Column): Column =
    substring(blob, 1, 5) === lit("WARC/".getBytes)

  /** ustar tar: magic at byte offset 258 (1-based). */
  def isTar(blob: Column): Column =
    substring(blob, 258, 5) === lit("ustar".getBytes)

  /** Content-sniffed mime over every format the codec family
    * parses, by MAGIC BYTES — extensions and labels lie; bytes
    * don't (the mislabeled-extension case is pinned in
    * MultimodalSpec). Probe order is most-specific first; kana-rule
    * analog: a JPEG's FF D8 FF would also pass the bare-MP3
    * frame-sync probe, so image probes run before audio. */
  def sniffMime(blob: Column): Column =
    when(isPng(blob), "image/png")
      .when(isJpeg(blob), "image/jpeg")
      .when(isGif(blob), "image/gif")
      .when(isTiff(blob), "image/tiff")
      .when(isPpm(blob), "image/x-portable-pixmap")
      .when(isWav(blob), "audio/wav")
      .when(isFlac(blob), "audio/flac")
      .when(isMp4(blob), "video/mp4")
      .when(isGzip(blob), "application/gzip")
      .when(isWarc(blob), "application/warc")
      .when(isTar(blob), "application/x-tar")
      .when(isBmp(blob), "image/bmp")
      .when(isMp3(blob), "audio/mpeg")
      .otherwise("application/octet-stream")

  /** Content sniff: magic-byte mime + exact byte statistics
    * ([[graft.functions.ByteStats]] — printable/zero/distinct
    * counts; integer-exact, so oracle-checkable where a Shannon
    * entropy's `log` is not). The triage a 100 TB crawl runs on
    * blobs BEFORE deciding which decoder (if any) to spend cycles
    * on; one scan-stage projection, blobs never shuffle. */
  def sniff(blob: Column): Column = {
    val st = call_function("byte_stats", blob)
    struct(
      sniffMime(blob).as("mime"),
      st.getField("n_bytes").as("n_bytes"),
      st.getField("n_printable").as("n_printable"),
      st.getField("n_zero").as("n_zero"),
      st.getField("n_distinct").as("n_distinct"),
      // empty blob -> NULL ratio, not 0/0 = NaN (NaN poisons every
      // downstream comparison silently)
      when(st.getField("n_bytes") > 0,
        st.getField("n_printable").cast(DoubleType) /
          st.getField("n_bytes").cast(DoubleType)).as("printable_ratio"))
  }

  /** Unsigned byte at a COLUMN position (1-based). */
  private def u8c(blob: Column, pos: Column): Column =
    call_function("byte_at_u8", blob, pos.cast(IntegerType)).cast(LongType)

  /** REAL P6 PPM decode — the whole file, not just a header probe,
    * with no codec library and no UDF: the ASCII header's three
    * VARIABLE-WIDTH decimal fields (`P6 <w> <h> <maxval>`, any
    * single-byte whitespace) and exact per-channel raster sums over
    * every pixel byte, in ONE native whole-stage-codegen kernel
    * ([[graft.functions.PpmStats]], the [[graft.functions.WavRms]]
    * shape) — O(bytes) with a ~ns/byte constant, fused into the
    * scan stage.
    *
    * Returns `struct(width, height, n_pix, r_sum, g_sum, b_sum)`;
    * NULL when the blob is not P6, the header exceeds 24 bytes
    * (dims past 7 total digits), maxval != 255 (2-byte samples), a
    * `#` comment appears (rare in machine-written files), or the
    * raster is truncated. Exact integer sums keep the result
    * engine-independent — the oracle reproduces them from the blob
    * GENERATOR's arithmetic, so agreement proves the parser read
    * the bytes it was supposed to. */
  def ppmStats(blob: Column): Column =
    call_function("ppm_stats", blob)

  /** Round-8 higher-order-function form of [[ppmStats]] — RETAINED
    * ONLY as the executable spec the native kernel is differential-
    * tested against (PpmStatsSpec runs both on randomized + crafted
    * blobs and asserts identical rows). Do not call it from queries:
    * Catalyst evaluates HOF lambdas interpreted per element, which
    * made this form 251 s at sf0.1 vs sub-second for the kernel —
    * see [[graft.functions.PpmStats]]. */
  private[graft] def ppmStatsHof(blob: Column): Column = {
    val hdrMax = 24
    // header fold state: ph (0=w,1=h,2=maxval,3=done), acc, inNum
    // (0/1), w, h, mx, off (1-based first raster byte once ph=3)
    val init = struct(lit(0L).as("ph"), lit(0L).as("acc"),
      lit(0L).as("inNum"), lit(0L).as("w"), lit(0L).as("h"),
      lit(0L).as("mx"), lit(0L).as("off"))
    val folded = aggregate(sequence(lit(3), lit(hdrMax)), init, (st, p) => {
      val b = u8c(blob, p)
      val isDigit = b >= 48L && b <= 57L
      val isWs = b === 32L || b === 9L || b === 10L || b === 13L
      val committing = st.getField("ph") < 3L &&
        isWs && st.getField("inNum") === 1L
      val newPh = when(committing, st.getField("ph") + 1L)
        .otherwise(st.getField("ph"))
      // ph 9 = poisoned (a '#' comment byte: its content could
      // contain digits that would accumulate into fields — refuse
      // rather than misparse); ph >= 3 states are terminal
      when(st.getField("ph") >= 3L || b.isNull, st)
        .when(b === 35L, struct(lit(9L).as("ph"),
          st.getField("acc").as("acc"), st.getField("inNum").as("inNum"),
          st.getField("w").as("w"), st.getField("h").as("h"),
          st.getField("mx").as("mx"), st.getField("off").as("off")))
        .otherwise(struct(
        newPh.as("ph"),
        when(st.getField("ph") === 3L, st.getField("acc"))
          .when(isDigit, st.getField("acc") * 10L + (b - 48L))
          .when(committing, 0L)
          .otherwise(st.getField("acc")).as("acc"),
        when(isDigit, 1L).when(isWs, 0L)
          .otherwise(st.getField("inNum")).as("inNum"),
        when(committing && st.getField("ph") === 0L, st.getField("acc"))
          .otherwise(st.getField("w")).as("w"),
        when(committing && st.getField("ph") === 1L, st.getField("acc"))
          .otherwise(st.getField("h")).as("h"),
        when(committing && st.getField("ph") === 2L, st.getField("acc"))
          .otherwise(st.getField("mx")).as("mx"),
        when(committing && newPh === 3L, p + 1L)
          .otherwise(st.getField("off")).as("off")))
    })
    val ok = isPpm(blob) && folded.getField("ph") === 3L &&
      folded.getField("mx") === 255L &&
      folded.getField("w") > 0L && folded.getField("h") > 0L &&
      // the channel-sum fold materializes a sequence of 3·w·h
      // positions; a HOSTILE header claiming absurd dims must not
      // allocate it (the truncation check alone runs after the
      // sequence exists). 16M pixels = a 48MB raster — generous for
      // real PPMs, tiny for the executor.
      folded.getField("w") * folded.getField("h") <= 16777216L
    val stats = {
      val w = folded.getField("w")
      val h = folded.getField("h")
      val off = folded.getField("off")
      val nBytes = w * h * 3L
      val complete = length(blob).cast(LongType) >= off + nBytes - 1L
      val sums = aggregate(sequence(lit(0L), nBytes - 1L),
        struct(lit(0L).as("r"), lit(0L).as("g"), lit(0L).as("b")),
        (s, j) => {
          val v = u8c(blob, off + j)
          struct(
            (s.getField("r") + when(pmod(j, lit(3L)) === 0L, v)
              .otherwise(0L)).as("r"),
            (s.getField("g") + when(pmod(j, lit(3L)) === 1L, v)
              .otherwise(0L)).as("g"),
            (s.getField("b") + when(pmod(j, lit(3L)) === 2L, v)
              .otherwise(0L)).as("b"))
        })
      when(complete, struct(
        w.cast(IntegerType).as("width"), h.cast(IntegerType).as("height"),
        (w * h).as("n_pix"), sums.getField("r").as("r_sum"),
        sums.getField("g").as("g_sum"), sums.getField("b").as("b_sum")))
    }
    when(ok, stats)
  }

  /** Schema of [[headerDecode]]'s parsed-header struct. */
  val headerSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType)))

  /** REAL header decode — no stub, no codec dependency:
    *
    *  - PNG: width/height are the big-endian u32s at IHDR offsets
    *    16/20 (the IHDR chunk is mandated to come first by the spec).
    *  - WAV: channels (fmt offset 22), sample rate (24), block align
    *    (32) and data-chunk size (40) in the canonical 44-byte
    *    RIFF/fmt/data layout; n_frames = data bytes / block align
    *    (samples per channel). Non-canonical chunk orders (LIST
    *    before data, etc.) would need a chunk walk — out of scope for
    *    a header probe.
    *
    * Anything else: application/octet-stream with null fields. */
  def headerDecode(blob: Column): Column = {
    val nullI = lit(null).cast(IntegerType)
    val pngW = beU32(blob, 17).cast(IntegerType)
    val pngH = beU32(blob, 21).cast(IntegerType)
    val wavCh = leU16(blob, 23).cast(IntegerType)
    val wavSr = leU32(blob, 25).cast(IntegerType)
    val wavBlockAlign = leU16(blob, 33)
    val wavDataBytes = leU32(blob, 41)
    val wavFrames = (wavDataBytes / wavBlockAlign).cast(IntegerType)
    struct(
      when(isPng(blob), "image/png")
        .when(isWav(blob), "audio/wav")
        .otherwise("application/octet-stream").as("mime"),
      when(isPng(blob), pngW).otherwise(nullI).as("width"),
      when(isPng(blob), pngH).otherwise(nullI).as("height"),
      when(isPng(blob), lit(1)).when(isWav(blob), wavFrames)
        .otherwise(nullI).as("n_frames"),
      when(isWav(blob), wavSr).otherwise(nullI).as("sample_rate"),
      when(isWav(blob), wavCh).otherwise(nullI).as("channels"))
  }

  /** REAL MP4 / ISO-BMFF metadata — the full box walk (ftyp/moov/
    * mvhd/trak/tkhd/hdlr/stsd/stts, 32/64-bit sizes, v0/v1 FullBoxes)
    * as a native scan-stage kernel. See [[graft.functions.Mp4Meta]];
    * requires [[graft.GraftExtensions]] functions on the session. */
  def mp4Meta(blob: Column): Column = call_function("mp4_meta", blob)

  /** Production decode: REAL metadata for EVERY format the native
    * codec family parses, routed by magic bytes to the format's
    * kernel; unknowns report their sniffed mime with NULL
    * dimensions — never invented ones. A VALID parse is required,
    * not just the signature probe: a blob whose bytes 5-8 happen to
    * read "ftyp" but isn't a box tree falls through to the honest
    * unknown branch (codegen subexpression elimination evaluates
    * each kernel once). */
  def decode(blob: Column): Column = {
    val nullI = lit(null).cast(IntegerType)
    def meta(mime: String, w: Column, h: Column, nf: Column) =
      struct(lit(mime).as("mime"), w.cast(IntegerType).as("width"),
        h.cast(IntegerType).as("height"),
        nf.cast(IntegerType).as("n_frames"))
    val m4 = mp4Meta(blob)
    val jp = call_function("jpeg_stats", blob)
    val gf = call_function("gif_stats", blob)
    val bm = call_function("bmp_stats", blob)
    val tf = call_function("tiff_stats", blob)
    val pp = call_function("ppm_stats", blob)
    val fl = call_function("flac_meta", blob)
    val m3 = call_function("mp3_meta", blob)
    when(isPng(blob) || isWav(blob), {
      val h = headerDecode(blob)
      struct(h.getField("mime").as("mime"),
        h.getField("width").as("width"),
        h.getField("height").as("height"),
        h.getField("n_frames").as("n_frames"))
    }).when(isJpeg(blob) && jp.isNotNull, meta("image/jpeg",
        jp.getField("width"), jp.getField("height"), lit(1)))
      .when(isGif(blob) && gf.isNotNull, meta("image/gif",
        gf.getField("width"), gf.getField("height"),
        gf.getField("n_frames")))
      .when(isTiff(blob) && tf.isNotNull, meta("image/tiff",
        tf.getField("width"), tf.getField("height"),
        tf.getField("n_pages")))
      .when(isPpm(blob) && pp.isNotNull, meta("image/x-portable-pixmap",
        pp.getField("width"), pp.getField("height"), lit(1)))
      .when(isMp4(blob) && m4.isNotNull, meta("video/mp4",
        m4.getField("width"), m4.getField("height"),
        m4.getField("n_frames")))
      .when(isFlac(blob) && fl.isNotNull, meta("audio/flac",
        nullI, nullI, fl.getField("n_blocks")))
      .when(isBmp(blob) && bm.isNotNull, meta("image/bmp",
        bm.getField("width"), bm.getField("height"), lit(1)))
      .when(isMp3(blob) && m3.isNotNull, meta("audio/mpeg",
        nullI, nullI, m3.getField("n_frames")))
      .otherwise(struct(sniffMime(blob).as("mime"),
        nullI.as("width"), nullI.as("height"), nullI.as("n_frames")))
  }

  /** Attach blob + HONEST decoded metadata ([[decode]]). Callers
    * must [[graft.GraftExtensions]].ensure the session (the codec
    * kernels resolve by name). */
  def withMedia(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", asBlob(col(srcCol)))
      .withColumn("media", decode(col("payload")))

  /** Attach blob + SYNTHETIC metadata ([[syntheticMediaMeta]]) — the
    * text-as-blob fixture harness for the frame-sampling gate
    * queries; never a decode path. */
  def withSyntheticMedia(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", asBlob(col(srcCol)))
      .withColumn("media", syntheticMediaMeta(col("payload")))

  /** Frame sampling: one output row per sampled frame index, stride
    * `every`. posexplode of a bounded sequence — row expansion is
    * n_frames/every per blob, a narrow op (no shuffle). */
  def sampleFrames(df: DataFrame, every: Int = 4): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), col("media.n_frames") - 1, lit(every))))

  /** Per-frame feature extraction through the [[BatchInfer]] batched
    * transport — THE external-model integration point: frame rows
    * reach the model callback in bounded batches (the shape a real
    * vision tower needs to amortize per-call overhead), entirely
    * executor-side, and a deployment swaps in its model by passing
    * its own callback — no plan change, no code change elsewhere.
    *
    * The default model is the deterministic md5 frame fingerprint
    * (value-identical to `md5(concat(blob, ':', frame_idx))`, so the
    * gate query still hash-checks against its DuckDB oracle): no
    * vision model ships in this library — features from pixels are
    * an external-model boundary by design, same as BM25 is not an
    * embedding model. The callback must be row-local
    * (partitioning-invariance contract, see [[BatchInfer]]). */
  def withFrameFeatures(df: DataFrame, blobCol: String, idxCol: String,
      outCol: String = "frame_fp", batchSize: Int = 64,
      model: Option[Seq[org.apache.spark.sql.Row] => Seq[Any]] = None)
  : DataFrame = {
    val blobAt = df.schema.fieldIndex(blobCol)
    val idxAt = df.schema.fieldIndex(idxCol)
    val m = model.getOrElse { batch: Seq[org.apache.spark.sql.Row] =>
      batch.map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(r.getAs[Array[Byte]](blobAt))
        md.update(':'.toByte)
        md.update(String.valueOf(r.getInt(idxAt))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.digest().map(b => f"$b%02x").mkString
      }
    }
    BatchInfer.inferBatches(df, batchSize, outCol,
      org.apache.spark.sql.types.StringType, m)
  }
}
