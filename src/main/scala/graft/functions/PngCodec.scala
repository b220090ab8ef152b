package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** REAL PNG raster decode with JDK-only zlib — the round-10 verdict's
  * "complete the raster path" item: the larger of the two disclosed
  * media-codec stubs becomes a real kernel, no new dependencies
  * (`java.util.zip.Inflater` ships in the JDK; PNG's IDAT stream is
  * RFC-1950 zlib).
  *
  * `png_stats(blob)` walks the chunk stream (IHDR first, as the spec
  * mandates; all IDAT payloads concatenated until IEND), inflates,
  * un-filters every scanline (all five PNG filter types: None, Sub,
  * Up, Average, Paeth — integer-exact per the spec's reconstruction
  * functions), and returns exact per-channel sums over the
  * reconstructed raster:
  *
  *   struct(width, height, channels, n_pix, r_sum, g_sum, b_sum, a_sum)
  *
  * Supported: 8-bit depth, color types 0 (grayscale: r=g=b=gray sum,
  * a_sum=0), 2 (RGB: a_sum=0) and 6 (RGBA), non-interlaced. NULL for
  * anything else, and for: bad signature, IHDR not first, hostile
  * dims (non-positive or > 16M pixels — the [[PpmStats]] guard), a
  * malformed chunk stream, a zlib stream that fails to inflate or
  * inflates to the wrong byte count, or a filter byte outside 0..4.
  * Chunk CRCs are NOT verified (documented: this kernel is a raster
  * reader, not an integrity checker — the zlib stream's own Adler32
  * IS verified by Inflater, which covers the payload bytes).
  *
  * Exact integer sums keep the result engine-independent: the gate
  * oracle reproduces them from the fixture GENERATOR's arithmetic,
  * so agreement proves signature→IHDR→inflate→unfilter read the
  * bytes they were supposed to. PngStatsSpec additionally pins the
  * decoder against the JDK's INDEPENDENT codec both ways (ImageIO
  * decodes [[PngFixture]]'s output; this kernel decodes ImageIO's).
  *
  * Scale shape: one kernel dispatch per blob, O(compressed +
  * raster) per row with primitive locals, fused into the scan
  * projection — blobs never shuffle (the [[graft.ops.Multimodal]]
  * contract).
  */
case class PngStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PngStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"png_stats expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any = {
    val v = PngStats.stats(blob.asInstanceOf[Array[Byte]])
    if (v == null) null else PngStats.toRow(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val v = ctx.freshName("png")
      s"""
         |long[] $v = graft.functions.PngStats.stats($b);
         |if ($v == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.PngStats.toRow($v);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PngStats =
    copy(child = newChild)
}

object PngStats {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_pix", LongType, nullable = false),
    StructField("r_sum", LongType, nullable = false),
    StructField("g_sum", LongType, nullable = false),
    StructField("b_sum", LongType, nullable = false),
    StructField("a_sum", LongType, nullable = false)))

  def toRow(v: Array[Long]): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      v(0).toInt, v(1).toInt, v(2).toInt, v(3), v(4), v(5), v(6), v(7)))

  private final val Sig = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47,
    0x0d, 0x0a, 0x1a, 0x0a)

  private def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** `[w, h, channels, n_pix, r_sum, g_sum, b_sum, a_sum]`, or null
    * for every reject case in the class doc. */
  def stats(b: Array[Byte]): Array[Long] = {
    if (b.length < 8 + 25) return null
    var i = 0
    while (i < 8) { if (b(i) != Sig(i)) return null; i += 1 }
    // IHDR must be the first chunk: 13-byte payload
    if (beU32(b, 8) != 13L || b(12) != 'I' || b(13) != 'H' ||
      b(14) != 'D' || b(15) != 'R') return null
    val w = beU32(b, 16)
    val h = beU32(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val compression = b(26) & 0xff
    val filterMethod = b(27) & 0xff
    val interlace = b(28) & 0xff
    if (w <= 0L || h <= 0L || w * h > 16777216L) return null
    if (bitDepth != 8 || compression != 0 || filterMethod != 0 ||
      interlace != 0) return null
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case _ => return null
    }
    // chunk walk: collect IDAT payload slices until IEND
    var at = 8 + 4 + 4 + 13 + 4 // past IHDR's CRC
    var idatLen = 0L
    val idatOff = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var sawEnd = false
    while (!sawEnd) {
      if (at + 8 > b.length) return null // torn chunk header
      val len = beU32(b, at)
      if (len > Int.MaxValue - 8L || at + 8L + len + 4L > b.length)
        return null // hostile length / torn payload
      val t0 = b(at + 4); val t1 = b(at + 5)
      val t2 = b(at + 6); val t3 = b(at + 7)
      if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
        idatOff += ((at + 8, len.toInt))
        idatLen += len
      } else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
        sawEnd = true
      }
      at += 8 + len.toInt + 4
    }
    if (idatLen == 0L) return null
    val zdata = new Array[Byte](idatLen.toInt)
    var zp = 0
    idatOff.foreach { case (off, len) =>
      System.arraycopy(b, off, zdata, zp, len); zp += len
    }
    // inflate (zlib-wrapped; Inflater verifies the Adler32 trailer)
    val bpp = channels // bytes per pixel at bit depth 8
    val stride = (w * bpp).toInt
    val expected = (h * (1L + stride)).toInt
    val raw = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(zdata)
      var got = 0
      var stuck = false
      var overflow = false
      val spare = new Array[Byte](64)
      while (!inf.finished() && !stuck && !overflow) {
        if (got < expected) {
          val n = inf.inflate(raw, got, expected - got)
          got += n
          if (n == 0) stuck = true // truncated / stalled stream
        } else {
          // drive the inflater through the Adler32 trailer (a bad
          // checksum throws DataFormatException here); any ACTUAL
          // extra raster bytes mean the IHDR dims lied
          val n = inf.inflate(spare, 0, spare.length)
          if (n > 0) overflow = true else if (!inf.finished()) stuck = true
        }
      }
      if (!inf.finished() || got != expected || overflow) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // unfilter in place (per-scanline filter byte + spec recon fns)
    var r = 0L; var g = 0L; var bl = 0L; var a = 0L
    var row = 0
    var prevRow = -1 // raw offset of previous RECON scanline start
    while (row < h) {
      val base = row * (1 + stride)
      val ft = raw(base) & 0xff
      if (ft > 4) return null
      var x = 0
      while (x < stride) {
        val cur = raw(base + 1 + x) & 0xff
        val left = if (x >= bpp) raw(base + 1 + x - bpp) & 0xff else 0
        val up = if (prevRow >= 0) raw(prevRow + 1 + x) & 0xff else 0
        val upLeft =
          if (prevRow >= 0 && x >= bpp) raw(prevRow + 1 + x - bpp) & 0xff
          else 0
        val recon = ft match {
          case 0 => cur
          case 1 => (cur + left) & 0xff
          case 2 => (cur + up) & 0xff
          case 3 => (cur + ((left + up) >> 1)) & 0xff
          case _ => // Paeth
            val p = left + up - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left
              else if (pb <= pc) up else upLeft
            (cur + pred) & 0xff
        }
        raw(base + 1 + x) = recon.toByte
        channels match {
          case 1 => r += recon; g += recon; bl += recon
          case 3 =>
            val c = x % 3
            if (c == 0) r += recon else if (c == 1) g += recon
            else bl += recon
          case _ =>
            val c = x % 4
            if (c == 0) r += recon else if (c == 1) g += recon
            else if (c == 2) bl += recon else a += recon
        }
        x += 1
      }
      prevRow = base
      row += 1
    }
    Array(w, h, channels.toLong, w * h, r, g, bl, a)
  }
}

/** Deterministic PNG fixture builder — `png_fixture(id, w, h)`:
  * a REAL spec-compliant PNG (signature, IHDR, two IDAT chunks with
  * a genuine Deflater stream + Adler32, per-chunk CRC32 via
  * `java.util.zip.CRC32`, IEND) over the same generator arithmetic
  * the PPM fixture uses — RGB pixel byte j = (id*7 + j*13) mod 256 —
  * with scanline y filtered with type y mod 5, so EVERY image of
  * height ≥ 5 exercises all five filters on the decode side.
  *
  * This is the gate-query fixture generator (the PPM query builds
  * its blobs in SQL hex; DEFLATE cannot be assembled that way), not
  * a general encoder — but the PNGs are real: PngStatsSpec feeds
  * them to the JDK's ImageIO and asserts pixel-identical decodes,
  * so the fixture and the kernel cannot share a compensating bug. */
case class PngFixture(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"png_fixture expects (bigint, int, int) args, got $t")
    }

  override def nullSafeEval(id: Any, w: Any, h: Any): Any =
    PngFixture.build(id.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, w, h) => {
      s"""
         |${ev.value} = graft.functions.PngFixture.build($id, $w, $h);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): PngFixture = copy(f, s, t)
}

object PngFixture {

  /** RGB raster byte j (row-major, channel-interleaved) for image id. */
  @inline private def px(id: Long, j: Long): Int =
    (((id * 7L + j * 13L) % 256L + 256L) % 256L).toInt

  /** Filter one scanline with `ft` (forward direction: the encoder
    * SUBTRACTS the predictor the decoder adds back). */
  private def filterRow(recon: Array[Byte], prev: Array[Byte],
      ft: Int, bpp: Int): Array[Byte] = {
    val n = recon.length
    val out = new Array[Byte](n)
    var x = 0
    while (x < n) {
      val cur = recon(x) & 0xff
      val left = if (x >= bpp) recon(x - bpp) & 0xff else 0
      val up = if (prev != null) prev(x) & 0xff else 0
      val upLeft = if (prev != null && x >= bpp) prev(x - bpp) & 0xff else 0
      val f = ft match {
        case 0 => cur
        case 1 => (cur - left) & 0xff
        case 2 => (cur - up) & 0xff
        case 3 => (cur - ((left + up) >> 1)) & 0xff
        case _ =>
          val p = left + up - upLeft
          val pa = math.abs(p - left)
          val pb = math.abs(p - up)
          val pc = math.abs(p - upLeft)
          val pred = if (pa <= pb && pa <= pc) left
            else if (pb <= pc) up else upLeft
          (cur - pred) & 0xff
      }
      out(x) = f.toByte
      x += 1
    }
    out
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      payload: Array[Byte]): Unit = {
    val len = payload.length
    out.write((len >>> 24) & 0xff); out.write((len >>> 16) & 0xff)
    out.write((len >>> 8) & 0xff); out.write(len & 0xff)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(payload, 0, len)
    val crc = new java.util.zip.CRC32()
    crc.update(tb, 0, 4)
    crc.update(payload, 0, len)
    val c = crc.getValue
    out.write(((c >>> 24) & 0xff).toInt); out.write(((c >>> 16) & 0xff).toInt)
    out.write(((c >>> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
  }

  /** Encode the deterministic RGB fixture for (id, w, h); null for
    * non-positive or >4096-wide/tall dims (fixtures are small by
    * contract — the generator materializes the raster). */
  def build(id: Long, w: Int, h: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val bpp = 3
    val stride = w * bpp
    val filtered = new java.io.ByteArrayOutputStream(h * (stride + 1))
    var prev: Array[Byte] = null
    var y = 0
    while (y < h) {
      val recon = new Array[Byte](stride)
      var x = 0
      while (x < stride) {
        recon(x) = px(id, y.toLong * stride + x).toByte
        x += 1
      }
      val ft = y % 5
      filtered.write(ft)
      filtered.write(filterRow(recon, prev, ft, bpp), 0, stride)
      prev = recon
      y += 1
    }
    val raw = filtered.toByteArray
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw)
    def_.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    var zlen = 0
    while (!def_.finished())
      zlen += def_.deflate(zbuf, zlen, zbuf.length - zlen)
    def_.end()
    val out = new java.io.ByteArrayOutputStream(zlen + 128)
    out.write(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
      0x1a, 0x0a), 0, 8)
    val ihdr = new Array[Byte](13)
    def be(v: Int, off: Int): Unit = {
      ihdr(off) = ((v >>> 24) & 0xff).toByte
      ihdr(off + 1) = ((v >>> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >>> 8) & 0xff).toByte
      ihdr(off + 3) = (v & 0xff).toByte
    }
    be(w, 0); be(h, 4)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: RGB
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk(out, "IHDR", ihdr)
    // two IDAT chunks when the stream allows — multi-IDAT
    // concatenation is part of what the decoder must handle
    val split = if (zlen > 1) zlen / 2 else zlen
    chunk(out, "IDAT", java.util.Arrays.copyOfRange(zbuf, 0, split))
    if (split < zlen)
      chunk(out, "IDAT", java.util.Arrays.copyOfRange(zbuf, split, zlen))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
