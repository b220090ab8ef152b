package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** REAL FLAC metadata decode — the audio analog of
  * [[Mp4Meta]]'s container walk: "fLaC" magic, then metadata blocks
  * (1-byte is-last/type header + 24-bit big-endian length), with the
  * mandatory first STREAMINFO block's oddly-packed core fields:
  * sample rate is a 20-BIT integer, channels-1 a 3-bit, bits-1 a
  * 5-bit, and total samples a 36-bit field, packed MSB-first across
  * byte boundaries (layout from the public FLAC format spec).
  *
  * `flac_meta(blob)` returns
  *
  *   struct(sample_rate, channels, bits_per_sample, total_samples,
  *          duration_ms, n_blocks)
  *
  * duration_ms = total_samples·1000 / sample_rate in exact long
  * arithmetic (0 when total_samples is 0 = "unknown" per spec).
  * NULL for: bad magic, STREAMINFO not first or not 34 bytes, torn
  * blocks, a zero sample rate, or > 64 metadata blocks. Audio frames
  * after the last metadata block are not touched — this is the
  * metadata path, cost is block-proportional.
  */
case class FlacMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = FlacMeta.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"flac_meta expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any =
    FlacMeta.meta(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.FlacMeta.meta($b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacMeta =
    copy(child = newChild)
}

object FlacMeta {

  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("total_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_blocks", IntegerType, nullable = false)))

  def meta(b: Array[Byte]): GenericInternalRow = {
    if (b.length < 4 + 4 + 34) return null
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C')
      return null
    // first block MUST be STREAMINFO (type 0), length 34
    val h0 = b(4) & 0xff
    if ((h0 & 0x7f) != 0) return null
    val len0 = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (len0 != 34) return null
    val si = 8 // STREAMINFO payload offset
    // bytes 10..17 of the payload hold the packed fields:
    //   20 bits sample rate | 3 bits channels-1 | 5 bits bits-1 |
    //   36 bits total samples
    val p = si + 10
    val sampleRate = ((b(p) & 0xff) << 12) | ((b(p + 1) & 0xff) << 4) |
      ((b(p + 2) & 0xff) >> 4)
    val channels = (((b(p + 2) & 0xff) >> 1) & 0x07) + 1
    val bps = (((b(p + 2) & 0x01) << 4) | ((b(p + 3) & 0xff) >> 4)) + 1
    val totalSamples = ((b(p + 3) & 0x0fL) << 32) |
      ((b(p + 4) & 0xffL) << 24) | ((b(p + 5) & 0xffL) << 16) |
      ((b(p + 6) & 0xffL) << 8) | (b(p + 7) & 0xffL)
    if (sampleRate <= 0) return null
    // walk the remaining metadata blocks
    var nBlocks = 1
    var last = (h0 & 0x80) != 0
    var at = 8 + 34
    while (!last) {
      if (at + 4 > b.length) return null
      val hdr = b(at) & 0xff
      val len = ((b(at + 1) & 0xff) << 16) | ((b(at + 2) & 0xff) << 8) |
        (b(at + 3) & 0xff)
      if ((hdr & 0x7f) == 127) return null // invalid type per spec
      if (at + 4L + len > b.length) return null
      nBlocks += 1
      if (nBlocks > 64) return null
      last = (hdr & 0x80) != 0
      at += 4 + len
    }
    val durMs = totalSamples * 1000L / sampleRate
    new GenericInternalRow(Array[Any](
      sampleRate, channels, bps, totalSamples, durMs, nBlocks))
  }
}

/** Deterministic FLAC fixture — `flac_fixture(id)`: a real metadata
  * stream (STREAMINFO with id-derived bit-packed fields, a
  * VORBIS_COMMENT block, a PADDING block marked last, then fake frame
  * bytes the parser must not touch). sample_rate = 8000 + (id%12)·
  * 4000, channels = 1 + id%8, bits = 8 + id%17, total_samples =
  * id·1000 + 1. */
case class FlacFixture(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"flac_fixture expects a bigint arg, got ${t.simpleString}")
    }

  override def nullSafeEval(id: Any): Any =
    FlacFixture.build(id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id => {
      s"""
         |${ev.value} = graft.functions.FlacFixture.build($id);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacFixture =
    copy(child = newChild)
}

object FlacFixture {

  def params(id: Long): (Int, Int, Int, Long) = {
    val m = java.lang.Math.floorMod(id, _: Long)
    (8000 + m(12L).toInt * 4000, 1 + m(8L).toInt, 8 + m(17L).toInt,
      id * 1000L + 1L)
  }

  def build(id: Long): Array[Byte] = {
    val (sr, ch, bps, total) = params(id)
    val out = new java.io.ByteArrayOutputStream(256)
    out.write("fLaC".getBytes("US-ASCII"), 0, 4)
    // STREAMINFO: not-last, type 0, length 34
    out.write(0x00); out.write(0); out.write(0); out.write(34)
    out.write(0x10); out.write(0x00) // min blocksize 4096
    out.write(0x10); out.write(0x00) // max blocksize
    (0 until 6).foreach(_ => out.write(0)) // min/max framesize unknown
    // pack: sr(20) | ch-1(3) | bps-1(5) | total(36)
    out.write((sr >> 12) & 0xff)
    out.write((sr >> 4) & 0xff)
    out.write(((sr & 0x0f) << 4) | (((ch - 1) & 0x07) << 1) |
      (((bps - 1) >> 4) & 0x01))
    out.write((((bps - 1) & 0x0f) << 4) | ((total >> 32) & 0x0f).toInt)
    out.write(((total >> 24) & 0xff).toInt)
    out.write(((total >> 16) & 0xff).toInt)
    out.write(((total >> 8) & 0xff).toInt)
    out.write((total & 0xff).toInt)
    (0 until 16).foreach(_ => out.write(0)) // MD5 unset
    // VORBIS_COMMENT (type 4): minimal vendor-only payload
    val vendor = "graft".getBytes("US-ASCII")
    val vcLen = 4 + vendor.length + 4
    out.write(0x04); out.write(0); out.write(0); out.write(vcLen)
    out.write(vendor.length); out.write(0); out.write(0); out.write(0)
    out.write(vendor, 0, vendor.length)
    (0 until 4).foreach(_ => out.write(0)) // zero comments
    // PADDING (type 1), LAST block
    out.write(0x81); out.write(0); out.write(0); out.write(8)
    (0 until 8).foreach(_ => out.write(0))
    // fake audio frames the metadata walk must never read
    out.write(0xff); out.write(0xf8); out.write(0x69); out.write(0x10)
    out.toByteArray
  }
}

/** REAL MP3 metadata decode — an MPEG audio frame-header walk from
  * the public MPEG-1/2 audio spec: skip an ID3v2 tag (syncsafe
  * 28-bit size), then parse every frame header (11-bit sync, version/
  * layer bits, bitrate + sample-rate table lookups, padding bit),
  * advancing by each frame's computed byte length, tolerating one
  * trailing 128-byte ID3v1 tag.
  *
  * `mp3_meta(blob)` returns
  *
  *   struct(mpeg_version, bitrate_kbps, sample_rate, channels,
  *          n_frames, duration_ms)
  *
  * Layer III only (MPEG1 + MPEG2: 1152/576 samples per frame);
  * bitrate_kbps is the FIRST frame's (a VBR stream's other frames may
  * differ — duration comes from per-frame sample counts, which is
  * what makes the walk worth doing vs. filesize÷bitrate). NULL for:
  * no valid first frame, free-form (0) or invalid bitrate/sample-rate
  * indexes, a frame that overruns the blob, trailing garbage that is
  * neither a frame nor ID3v1, or > 1M frames. */
case class Mp3Meta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Mp3Meta.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"mp3_meta expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any =
    Mp3Meta.meta(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.Mp3Meta.meta($b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mp3Meta =
    copy(child = newChild)
}

object Mp3Meta {

  val schema: StructType = StructType(Seq(
    StructField("mpeg_version", IntegerType, nullable = false),
    StructField("bitrate_kbps", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  // Layer III bitrate tables (kbps), index 1..14; 0 = free, 15 = bad
  private val BitrateV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, -1)
  private val BitrateV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64,
    80, 96, 112, 128, 144, 160, -1)
  private val SampleRateV1 = Array(44100, 48000, 32000, -1)
  private val SampleRateV2 = Array(22050, 24000, 16000, -1)
  private val SampleRateV25 = Array(11025, 12000, 8000, -1)

  def meta(b: Array[Byte]): GenericInternalRow = {
    if (b.length < 4) return null
    var at = 0L
    // ID3v2: "ID3" + ver(2) + flags(1) + syncsafe size(4)
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7fL) << 21) | ((b(7) & 0x7fL) << 14) |
        ((b(8) & 0x7fL) << 7) | (b(9) & 0x7fL)
      at = 10L + sz
      if (at >= b.length) return null
    }
    var nFrames = 0L
    var durNum = 0L // Σ samplesPerFrame·1000; ÷ rate at the end is exact
    var firstBitrate = -1
    var firstRate = -1
    var firstVersion = 0
    var channels = 0
    while (at + 4 <= b.length) {
      val b0 = b(at.toInt) & 0xff
      val b1 = b(at.toInt + 1) & 0xff
      if (b0 == 'T' && b1 == 'A' && (b(at.toInt + 2) & 0xff) == 'G') {
        // ID3v1 trailer: exactly 128 bytes to EOF
        if (b.length - at != 128L) return null
        at = b.length
      } else {
        if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return null // lost sync
        val versionBits = (b1 >> 3) & 0x03 // 0=2.5, 2=MPEG2, 3=MPEG1
        val layerBits = (b1 >> 1) & 0x03   // 1 = Layer III
        if (versionBits == 1 || layerBits != 1) return null
        val b2 = b(at.toInt + 2) & 0xff
        val brIdx = (b2 >> 4) & 0x0f
        val srIdx = (b2 >> 2) & 0x03
        val padding = (b2 >> 1) & 0x01
        val b3 = b(at.toInt + 3) & 0xff
        val mode = (b3 >> 6) & 0x03
        val v1 = versionBits == 3
        val bitrate = (if (v1) BitrateV1 else BitrateV2)(brIdx)
        val rate = (versionBits match {
          case 3 => SampleRateV1
          case 2 => SampleRateV2
          case _ => SampleRateV25
        })(srIdx)
        if (bitrate <= 0 || rate <= 0) return null
        val samplesPerFrame = if (v1) 1152 else 576
        val frameLen =
          samplesPerFrame / 8 * bitrate * 1000 / rate + padding
        if (frameLen < 4 || at + frameLen > b.length) return null
        if (nFrames == 0L) {
          firstBitrate = bitrate
          firstRate = rate
          firstVersion = if (v1) 1 else 2
          channels = if (mode == 3) 1 else 2
        } else if (rate != firstRate) return null // rate switch: refuse
        nFrames += 1
        if (nFrames > 1000000L) return null
        durNum += samplesPerFrame.toLong * 1000L
        at += frameLen
      }
    }
    if (at != b.length || nFrames == 0L) return null
    new GenericInternalRow(Array[Any](
      firstVersion, firstBitrate, firstRate, channels, nFrames,
      durNum / firstRate))
  }
}

/** Deterministic MP3 fixture — `mp3_fixture(id, n_frames)`: an
  * ID3v2.3 tag of id-derived syncsafe size, then `n_frames` valid
  * MPEG1/2 Layer III frames (version by id%2, bitrate index
  * 1 + id%14, sample-rate index id%3, padding bit alternating by
  * frame parity — so frame lengths genuinely vary) with zeroed
  * payloads, and an ID3v1 trailer on id%5==0. */
case class Mp3Fixture(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"mp3_fixture expects (bigint, int) args, got $t")
    }

  override def nullSafeEval(id: Any, n: Any): Any =
    Mp3Fixture.build(id.asInstanceOf[Long], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, n) => {
      s"""
         |${ev.value} = graft.functions.Mp3Fixture.build($id, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Mp3Fixture = copy(l, r)
}

object Mp3Fixture {

  /** (v1?, bitrateKbps, sampleRate, brIdx, srIdx) for id. */
  def params(id: Long): (Boolean, Int, Int, Int, Int) = {
    val v1 = java.lang.Math.floorMod(id, 2L) == 0L
    val brIdx = 1 + java.lang.Math.floorMod(id, 14L).toInt
    val srIdx = java.lang.Math.floorMod(id, 3L).toInt
    val br = (if (v1) Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
      160, 192, 224, 256, 320) else Array(0, 8, 16, 24, 32, 40, 48,
      56, 64, 80, 96, 112, 128, 144, 160))(brIdx)
    val sr = (if (v1) Array(44100, 48000, 32000)
      else Array(22050, 24000, 16000))(srIdx)
    (v1, br, sr, brIdx, srIdx)
  }

  def build(id: Long, nFrames: Int): Array[Byte] = {
    if (nFrames <= 0 || nFrames > 100000) return null
    val (v1, br, sr, brIdx, srIdx) = params(id)
    val out = new java.io.ByteArrayOutputStream(4096)
    // ID3v2.3 tag, payload size derived from id (syncsafe-encoded)
    val tagSz = java.lang.Math.floorMod(id, 200L).toInt + 10
    out.write('I'); out.write('D'); out.write('3')
    out.write(3); out.write(0); out.write(0)
    out.write((tagSz >> 21) & 0x7f); out.write((tagSz >> 14) & 0x7f)
    out.write((tagSz >> 7) & 0x7f); out.write(tagSz & 0x7f)
    (0 until tagSz).foreach(_ => out.write(0))
    val spf = if (v1) 1152 else 576
    var f = 0
    while (f < nFrames) {
      val padding = f & 1
      val frameLen = spf / 8 * br * 1000 / sr + padding
      out.write(0xff)
      out.write(0xe0 | ((if (v1) 3 else 2) << 3) | (1 << 1) | 1)
      out.write((brIdx << 4) | (srIdx << 2) | (padding << 1))
      out.write(if (java.lang.Math.floorMod(id, 7L) == 0L) 0xc0 // mono
        else 0x00) // stereo
      (4 until frameLen).foreach(_ => out.write(0))
      f += 1
    }
    if (java.lang.Math.floorMod(id, 5L) == 0L) {
      out.write('T'); out.write('A'); out.write('G')
      (3 until 128).foreach(_ => out.write(0))
    }
    out.toByteArray
  }
}
