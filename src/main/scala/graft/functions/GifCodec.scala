package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** REAL GIF raster decode with a from-scratch LZW decompressor — the
  * second compressed-image codec beside [[PngStats]], and unlike PNG
  * it cannot lean on a JDK inflater: GIF's variable-width LZW
  * (LSB-first bit packing, growing code sizes, clear/EOI codes,
  * 4096-entry dictionary, the spec's deferred code-size off-by-one)
  * is implemented here from the GIF89a specification, a public
  * document.
  *
  * `gif_stats(blob)` parses the header + logical screen descriptor,
  * global color table, every extension block (skipped by sub-block
  * chain), every image descriptor (counting frames), and LZW-decodes
  * the FIRST frame's index stream, mapping indices through the
  * applicable (local-else-global) color table into exact per-channel
  * sums:
  *
  *   struct(width, height, n_frames, n_pix, r_sum, g_sum, b_sum)
  *
  * width/height are the logical screen's; n_pix and the sums are the
  * first frame's. Interlace is accepted (row reordering permutes rows
  * only — channel SUMS are order-invariant, so no deinterlace pass is
  * needed for statistics). NULL for: bad signature, torn blocks, a
  * frame with no applicable color table, LZW streams that are corrupt
  * (code > next), end prematurely, or decode to the wrong pixel
  * count, missing trailer, or hostile dims (> 16M pixels/frame — the
  * [[PpmStats]] guard).
  *
  * Pinned both directions against the JDK's INDEPENDENT ImageIO GIF
  * codec in GifStatsSpec (ImageIO decodes [[GifFixture]]'s output;
  * this kernel decodes ImageIO-encoded GIFs), so the fixture encoder
  * and this decoder cannot share a compensating bug.
  *
  * Scale shape: one fused O(compressed + raster) dispatch per blob in
  * the scan stage; blobs never shuffle (the Multimodal contract).
  */
case class GifStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GifStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"gif_stats expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any = {
    val v = GifStats.stats(blob.asInstanceOf[Array[Byte]])
    if (v == null) null else GifStats.toRow(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val v = ctx.freshName("gif")
      s"""
         |long[] $v = graft.functions.GifStats.stats($b);
         |if ($v == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.GifStats.toRow($v);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GifStats =
    copy(child = newChild)
}

object GifStats {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_pix", LongType, nullable = false),
    StructField("r_sum", LongType, nullable = false),
    StructField("g_sum", LongType, nullable = false),
    StructField("b_sum", LongType, nullable = false)))

  def toRow(v: Array[Long]): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      v(0).toInt, v(1).toInt, v(2).toInt, v(3), v(4), v(5), v(6)))

  @inline private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** `[w, h, n_frames, n_pix, r_sum, g_sum, b_sum]` or null. */
  def stats(b: Array[Byte]): Array[Long] = {
    // "GIF87a" | "GIF89a"
    if (b.length < 13 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != '8' || (b(4) != '7' && b(4) != '9') || b(5) != 'a')
      return null
    val sw = leU16(b, 6)
    val sh = leU16(b, 8)
    val packed = b(10) & 0xff
    var at = 13
    var gctOff = -1
    var gctEntries = 0
    if ((packed & 0x80) != 0) {
      gctEntries = 1 << ((packed & 0x07) + 1)
      gctOff = at
      at += 3 * gctEntries
      if (at > b.length) return null
    }
    var nFrames = 0
    var nPix = 0L
    var rSum = 0L; var gSum = 0L; var bSum = 0L
    var sawTrailer = false
    while (!sawTrailer) {
      if (at >= b.length) return null // ran off the end: torn file
      val block = b(at) & 0xff
      at += 1
      block match {
        case 0x3b => sawTrailer = true
        case 0x21 => // extension: label + sub-block chain
          if (at >= b.length) return null
          at += 1
          at = skipSubBlocks(b, at)
          if (at < 0) return null
        case 0x2c => // image descriptor
          if (at + 9 > b.length) return null
          val fw = leU16(b, at + 4)
          val fh = leU16(b, at + 6)
          val ipacked = b(at + 8) & 0xff
          at += 9
          var ctOff = gctOff
          var ctEntries = gctEntries
          if ((ipacked & 0x80) != 0) { // local color table
            ctEntries = 1 << ((ipacked & 0x07) + 1)
            ctOff = at
            at += 3 * ctEntries
            if (at > b.length) return null
          }
          nFrames += 1
          if (nFrames == 1) {
            if (ctOff < 0) return null // no applicable color table
            if (fw <= 0 || fh <= 0 || fw.toLong * fh > 16777216L)
              return null
            val idx = decodeFirstFrame(b, at, fw.toLong * fh)
            if (idx == null) return null
            nPix = fw.toLong * fh
            var i = 0
            while (i < idx.length) {
              val c = idx(i) & 0xff
              if (c >= ctEntries) return null // index outside palette
              val o = ctOff + 3 * c
              rSum += b(o) & 0xff
              gSum += b(o + 1) & 0xff
              bSum += b(o + 2) & 0xff
              i += 1
            }
          }
          // skip (or re-skip) the LZW data: min-code byte + sub-blocks
          if (at >= b.length) return null
          at += 1
          at = skipSubBlocks(b, at)
          if (at < 0) return null
        case _ => return null // unknown top-level block
      }
    }
    Array(sw.toLong, sh.toLong, nFrames.toLong, nPix, rSum, gSum, bSum)
  }

  /** Advance past a sub-block chain (len byte + payload, 0 ends);
    * -1 when torn. */
  private def skipSubBlocks(b: Array[Byte], start: Int): Int = {
    var at = start
    while (true) {
      if (at >= b.length) return -1
      val len = b(at) & 0xff
      at += 1
      if (len == 0) return at
      at += len
      if (at > b.length) return -1
    }
    -1 // unreachable
  }

  /** LZW-decode the frame whose min-code byte sits at `at`; returns
    * exactly `expected` palette indices or null (corrupt/mismatched
    * stream). GIF LZW: LSB-first bit packing across concatenated
    * sub-blocks, initial code size minCode+1, clear = 1<<minCode,
    * EOI = clear+1, dictionary ≤ 4096 entries, code size grows when
    * the next entry would not fit (the decoder grows at
    * next == (1<<size), one entry AFTER the encoder added it — the
    * spec's deferred off-by-one). */
  private def decodeFirstFrame(b: Array[Byte], start: Int,
      expected: Long): Array[Byte] = {
    if (start >= b.length) return null
    val minCode = b(start) & 0xff
    if (minCode < 2 || minCode > 11) return null
    // concatenate the sub-block payload bounds
    var at = start + 1
    var total = 0
    while (true) {
      if (at >= b.length) return null
      val len = b(at) & 0xff
      at += 1
      if (len == 0) {
        // second pass copies; first pass just measured
        val data = new Array[Byte](total)
        var src = start + 1
        var dst = 0
        var done = false
        while (!done) {
          val l = b(src) & 0xff
          src += 1
          if (l == 0) done = true
          else {
            System.arraycopy(b, src, data, dst, l)
            src += l; dst += l
          }
        }
        return lzw(data, minCode, expected)
      }
      at += len
      total += len
      if (at > b.length) return null
    }
    null // unreachable
  }

  private def lzw(data: Array[Byte], minCode: Int,
      expected: Long): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Short](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected.toInt)
    var outN = 0
    var codeSize = minCode + 1
    var next = eoi + 1
    var prev = -1
    var bitPos = 0L
    val bitEnd = data.length.toLong * 8
    var firstOfPrev = 0

    @inline def readCode(): Int = {
      if (bitPos + codeSize > bitEnd) return -1
      var v = 0
      var i = 0
      while (i < codeSize) {
        val p = bitPos + i
        val byte = data((p >> 3).toInt) & 0xff
        v |= ((byte >> (p & 7).toInt) & 1) << i
        i += 1
      }
      bitPos += codeSize
      v
    }

    var ended = false
    while (!ended) {
      val code = readCode()
      if (code < 0) return null // ran out of bits before EOI
      if (code == clear) {
        codeSize = minCode + 1
        next = eoi + 1
        prev = -1
      } else if (code == eoi) {
        ended = true
      } else {
        if (outN >= out.length && expected > 0) return null // too many
        var sp = 0
        if (prev == -1) {
          // first code after clear must be a literal
          if (code >= clear) return null
          out(outN) = code.toByte; outN += 1
          firstOfPrev = code
        } else if (code < next && code < 4096) {
          if (code >= clear && code < eoi + 1) return null // clear/eoi range
          // walk the chain onto the stack
          var c = code
          while (c >= eoi + 1) {
            stack(sp) = suffix(c); sp += 1
            c = prefix(c) & 0xffff
          }
          if (c >= clear) return null
          val first = c
          if (outN + sp + 1 > out.length) return null
          out(outN) = c.toByte; outN += 1
          while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
          if (next < 4096) {
            prefix(next) = prev.toShort
            suffix(next) = first.toByte
            next += 1
          }
          firstOfPrev = first
        } else if (code == next && next < 4096) {
          // KwKwK case: prev string + its first char
          var c = prev
          while (c >= eoi + 1) {
            stack(sp) = suffix(c); sp += 1
            c = prefix(c) & 0xffff
          }
          if (c >= clear) return null
          val first = c
          if (outN + sp + 2 > out.length) return null
          out(outN) = c.toByte; outN += 1
          while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
          out(outN) = first.toByte; outN += 1
          prefix(next) = prev.toShort
          suffix(next) = first.toByte
          next += 1
          firstOfPrev = first
        } else {
          return null // corrupt: code beyond dictionary
        }
        prev = code
        // deferred growth: decoder grows when the NEXT entry to add
        // would not fit in codeSize bits
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
    }
    if (outN.toLong != expected) return null
    out
  }
}

/** Deterministic GIF fixture builder — `gif_fixture(id, w, h)`: a
  * REAL GIF89a file with a genuine from-scratch LZW ENCODER (growing
  * code sizes, dictionary resets at 4096 — the encode side of
  * [[GifStats]]'s decoder, written against the same public spec but
  * sharing no tables with it):
  *
  *  - 256-entry global color table: palette[i] = ((id·3 + i·7) % 256,
  *    (id·5 + i·11) % 256, (id·7 + i·13) % 256)
  *  - pixel index at j = (id·7 + j·13) % 256 (the PPM/PNG raster
  *    arithmetic family, so oracles recompute sums the same way)
  *  - a graphic-control extension before the frame (sub-block-skip
  *    exercise) and a comment extension after it
  *  - a second 2×2 frame with a LOCAL 4-entry color table when
  *    id % 4 == 0 (frame counting + local-table skip; stats still
  *    come from frame 1)
  *
  * GifStatsSpec feeds these to ImageIO and asserts pixel-identical
  * decodes, so encoder and decoder cannot share a compensating bug. */
case class GifFixture(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"gif_fixture expects (bigint, int, int) args, got $t")
    }

  override def nullSafeEval(id: Any, w: Any, h: Any): Any =
    GifFixture.build(id.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, w, h) => {
      s"""
         |${ev.value} = graft.functions.GifFixture.build($id, $w, $h);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): GifFixture = copy(f, s, t)
}

object GifFixture {

  @inline private def mod256(v: Long): Int =
    ((v % 256L + 256L) % 256L).toInt

  /** LZW-encode `pixels` (byte palette indices) with `minCode`-bit
    * roots: emits clear, codes with growing widths (the encoder grows
    * one entry EARLIER than the decoder reads — the spec pairing),
    * resets at dictionary-full, ends with EOI; packs LSB-first. */
  private[functions] def lzwEncode(pixels: Array[Byte],
      minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val bits = new java.io.ByteArrayOutputStream(pixels.length)
    var bitBuf = 0L
    var bitN = 0
    var codeSize = minCode + 1

    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitN
      bitN += codeSize
      while (bitN >= 8) {
        bits.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitN -= 8
      }
    }

    // (prefixCode << 8 | pixel) -> code
    var dict = new java.util.HashMap[Integer, Integer](8192)
    var next = eoi + 1
    emit(clear)
    if (pixels.length > 0) {
      var cur = pixels(0) & 0xff
      var i = 1
      while (i < pixels.length) {
        val c = pixels(i) & 0xff
        val key = Integer.valueOf((cur << 8) | c)
        val hit = dict.get(key)
        if (hit != null) {
          cur = hit.intValue()
        } else {
          emit(cur)
          if (next < 4096) {
            dict.put(key, Integer.valueOf(next))
            next += 1
            // encoder grows when the entry it JUST added no longer
            // fits — one entry before the decoder does
            if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          } else {
            // dictionary full: reset both sides
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer](8192)
            next = eoi + 1
            codeSize = minCode + 1
          }
          cur = c
        }
        i += 1
      }
      emit(cur)
    }
    emit(eoi)
    if (bitN > 0) bits.write((bitBuf & 0xff).toInt)
    bits.toByteArray
  }

  private def subBlocks(out: java.io.ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val len = math.min(255, data.length - off)
      out.write(len)
      out.write(data, off, len)
      off += len
    }
    out.write(0)
  }

  /** Encode the deterministic fixture for (id, w, h); null for
    * non-positive or > 4096-wide/tall dims (fixture contract). */
  def build(id: Long, w: Int, h: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val out = new java.io.ByteArrayOutputStream(w * h + 1024)
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    // logical screen: w, h LE; packed: GCT present, 8-bit color res,
    // 256-entry table; background 0; aspect 0
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0x80 | 0x70 | 0x07); out.write(0); out.write(0)
    var i = 0
    while (i < 256) {
      out.write(mod256(id * 3 + i.toLong * 7))
      out.write(mod256(id * 5 + i.toLong * 11))
      out.write(mod256(id * 7 + i.toLong * 13))
      i += 1
    }
    // graphic control extension (sub-block skip exercise)
    out.write(0x21); out.write(0xf9)
    out.write(4); out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(0)
    // frame 1: full-screen, global table, not interlaced
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0)
    val pixels = new Array[Byte](w * h)
    var j = 0
    while (j < pixels.length) {
      pixels(j) = mod256(id * 7 + j.toLong * 13).toByte
      j += 1
    }
    out.write(8) // LZW min code size for 256-color roots
    subBlocks(out, lzwEncode(pixels, 8))
    // comment extension after the frame
    out.write(0x21); out.write(0xfe)
    subBlocks(out, "graft fixture".getBytes("US-ASCII"))
    if (java.lang.Math.floorMod(id, 4L) == 0L) {
      // frame 2: 2×2 with a LOCAL 4-entry color table
      out.write(0x2c)
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(2); out.write(0); out.write(2); out.write(0)
      out.write(0x80 | 0x01) // local table, 4 entries
      var k = 0
      while (k < 4) {
        out.write(mod256(id + k)); out.write(mod256(id + k + 1))
        out.write(mod256(id + k + 2))
        k += 1
      }
      out.write(2) // min code size 2 for 4-color roots
      subBlocks(out, lzwEncode(Array[Byte](0, 1, 2, 3), 2))
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
