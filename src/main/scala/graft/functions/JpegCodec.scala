package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** REAL baseline JPEG decode — the third compressed-image codec
  * beside [[PngStats]] (zlib) and [[GifStats]] (LZW), and the most
  * involved: canonical Huffman entropy decoding (DC categories +
  * AC run/size with EOB/ZRL), byte-unstuffing (FF 00), restart
  * markers (DRI/RSTn with DC-predictor resets), dequantization,
  * a double-precision 2-D IDCT, 1–2× chroma sampling factors with
  * box upsampling, and JFIF YCbCr→RGB conversion — all from the
  * public ITU T.81 specification, no codec libraries.
  *
  * `jpeg_stats(blob)` returns
  *
  *   struct(width, height, channels, n_pix, r_sum, g_sum, b_sum)
  *
  * with exact integer channel sums over the reconstructed raster
  * (grayscale sums as r=g=b). Supported: SOF0/SOF1 (baseline +
  * extended sequential Huffman), 8-bit precision, 1 or 3 components,
  * sampling factors 1–2, DRI/RST, multi-table DQT/DHT segments,
  * APPn/COM skipped. NULL for: progressive/arithmetic/hierarchical
  * SOFs, 12-bit precision, 16-bit quant tables, missing tables, torn
  * streams, invalid Huffman codes, coefficient overruns, or hostile
  * dims (> 16M pixels — the [[PpmStats]] guard).
  *
  * Honesty note on exactness: IDCT rounding is implementation-defined
  * within T.81's conformance bounds, so two correct decoders may
  * differ by ±1 per sample on AC-heavy content. The gate oracle
  * therefore uses DC-ONLY fixtures ([[JpegFixture]]), whose IDCT is
  * EXACT in every conformant decoder (a DC-only block reconstructs to
  * a constant), while JpegStatsSpec differentials this decoder
  * against the JDK's independent ImageIO codec: exact on DC-only
  * content both directions, per-pixel ±1 on arbitrary content.
  *
  * Scale shape: one fused O(bytes + pixels) dispatch per blob in the
  * scan stage; blobs never shuffle (the Multimodal contract).
  */
case class JpegStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = JpegStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"jpeg_stats expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any = {
    val v = JpegStats.stats(blob.asInstanceOf[Array[Byte]])
    if (v == null) null else JpegStats.toRow(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val v = ctx.freshName("jpg")
      s"""
         |long[] $v = graft.functions.JpegStats.stats($b);
         |if ($v == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.JpegStats.toRow($v);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegStats =
    copy(child = newChild)
}

object JpegStats {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_pix", LongType, nullable = false),
    StructField("r_sum", LongType, nullable = false),
    StructField("g_sum", LongType, nullable = false),
    StructField("b_sum", LongType, nullable = false)))

  def toRow(v: Array[Long]): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      v(0).toInt, v(1).toInt, v(2).toInt, v(3), v(4), v(5), v(6)))

  /** Zig-zag index → natural (row-major) index. */
  private[functions] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // IDCT basis: cosTab(u)(x) = c(u)·cos((2x+1)uπ/16), c(0)=1/√2 else 1
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table in the T.81 decode form. */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // mincode/maxcode/valptr indexed by code length 1..16
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val syms: Array[Int] = symbols
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  private final class Reader(b: Array[Byte], private var at: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var corrupt = false

    def pos: Int = at

    /** Next entropy bit; marker bytes are NOT consumed here — hitting
      * one mid-symbol marks the stream corrupt. */
    def bit(): Int = {
      if (bitCnt == 0) {
        if (at >= b.length) { corrupt = true; return 0 }
        var byte = b(at) & 0xff
        at += 1
        if (byte == 0xff) {
          if (at >= b.length) { corrupt = true; return 0 }
          val next = b(at) & 0xff
          if (next == 0x00) at += 1 // stuffed FF
          else { at -= 1; corrupt = true; return 0 } // a real marker
          byte = 0xff
        }
        bitBuf = byte
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l)) {
          val idx = h.valPtr(l) + code - h.minCode(l)
          if (idx < 0 || idx >= h.syms.length) { corrupt = true; return 0 }
          return h.syms(idx)
        }
        code = (code << 1) | bit()
        l += 1
        if (corrupt) return 0
      }
      corrupt = true
      0
    }

    /** Receive-and-extend: s magnitude bits → signed value. */
    def extend(s: Int): Int = {
      if (s == 0) return 0
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | bit(); i += 1 }
      if (corrupt) return 0
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(n: Int): Boolean = {
      bitCnt = 0
      if (at + 2 > b.length) return false
      if ((b(at) & 0xff) != 0xff || (b(at + 1) & 0xff) != (0xd0 | n))
        return false
      at += 2
      true
    }
  }

  private final class Component {
    var id = 0
    var h = 1
    var v = 1
    var tq = 0
    var dcTbl = 0
    var acTbl = 0
    var pred = 0
    var plane: Array[Byte] = _ // decoded samples, planeW × planeH
    var planeW = 0
    var planeH = 0
  }

  /** Decoded image for the spec differential: sample planes are
    * already IDCT'd + level-shifted; `rgb(x, y)` applies box chroma
    * upsampling + JFIF color conversion. */
  private[functions] final class Decoded(val w: Int, val h: Int,
      val nComp: Int, comps: Array[Component], hMax: Int, vMax: Int) {
    /** Packed 0xRRGGBB at full resolution (gray replicated). */
    def rgb(x: Int, y: Int): Int = {
      if (nComp == 1) {
        val v = sample(0, x, y)
        (v << 16) | (v << 8) | v
      } else {
        val yy = sample(0, x, y)
        val cb = sample(1, x, y)
        val cr = sample(2, x, y)
        val r = clamp8(math.floor(yy + 1.402 * (cr - 128) + 0.5).toInt)
        val g = clamp8(math.floor(yy - 0.344136 * (cb - 128) -
          0.714136 * (cr - 128) + 0.5).toInt)
        val b = clamp8(math.floor(yy + 1.772 * (cb - 128) + 0.5).toInt)
        (r << 16) | (g << 8) | b
      }
    }
    private def sample(ci: Int, x: Int, y: Int): Int = {
      val c = comps(ci)
      val sx = x * c.h / hMax
      val sy = y * c.v / vMax
      c.plane(sy * c.planeW + sx) & 0xff
    }
    private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  }

  /** Full decode, or null for every reject case in the class doc. */
  private[functions] def decode(b: Array[Byte]): Decoded = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return null
    var at = 2
    val qt = Array.ofDim[Int](4, 64)
    val qtSeen = new Array[Boolean](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var w = 0; var h = 0
    var comps: Array[Component] = null
    var restartInterval = 0
    var sofSeen = false

    def u16(off: Int): Int = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

    while (true) {
      // expect a marker; tolerate fill bytes (FF FF ... xx)
      if (at + 2 > b.length) return null
      if ((b(at) & 0xff) != 0xff) return null
      var m = b(at + 1) & 0xff
      at += 2
      while (m == 0xff) {
        if (at >= b.length) return null
        m = b(at) & 0xff
        at += 1
      }
      m match {
        case 0xd9 => return null // EOI before any scan
        case mm if mm >= 0xe0 && mm <= 0xef || mm == 0xfe => // APPn/COM
          if (at + 2 > b.length) return null
          val len = u16(at)
          if (len < 2 || at + len > b.length) return null
          at += len
        case 0xdb => // DQT
          if (at + 2 > b.length) return null
          val len = u16(at)
          if (len < 2 || at + len > b.length) return null
          var p = at + 2
          val end = at + len
          while (p < end) {
            val pqTq = b(p) & 0xff
            val pq = pqTq >> 4
            val tq = pqTq & 0x0f
            if (pq != 0 || tq > 3 || p + 1 + 64 > end) return null
            var i = 0
            while (i < 64) { qt(tq)(i) = b(p + 1 + i) & 0xff; i += 1 }
            qtSeen(tq) = true
            p += 65
          }
          at = end
        case 0xc4 => // DHT
          if (at + 2 > b.length) return null
          val len = u16(at)
          if (len < 2 || at + len > b.length) return null
          var p = at + 2
          val end = at + len
          while (p < end) {
            val tcTh = b(p) & 0xff
            val tc = tcTh >> 4
            val th = tcTh & 0x0f
            if (tc > 1 || th > 3 || p + 17 > end) return null
            val counts = new Array[Int](16)
            var total = 0
            var i = 0
            while (i < 16) {
              counts(i) = b(p + 1 + i) & 0xff; total += counts(i); i += 1
            }
            if (total > 256 || p + 17 + total > end) return null
            val symbols = new Array[Int](total)
            i = 0
            while (i < total) { symbols(i) = b(p + 17 + i) & 0xff; i += 1 }
            val tbl = new Huff(counts, symbols)
            if (tc == 0) dcTables(th) = tbl else acTables(th) = tbl
            p += 17 + total
          }
          at = end
        case 0xdd => // DRI
          if (at + 4 > b.length) return null
          val len = u16(at)
          if (len != 4) return null
          restartInterval = u16(at + 2)
          at += len
        case 0xc0 | 0xc1 => // SOF0 / SOF1
          if (sofSeen) return null
          if (at + 2 > b.length) return null
          val len = u16(at)
          if (len < 8 || at + len > b.length) return null
          val prec = b(at + 2) & 0xff
          h = u16(at + 3)
          w = u16(at + 5)
          val n = b(at + 7) & 0xff
          if (prec != 8 || (n != 1 && n != 3)) return null
          if (w <= 0 || h <= 0 || w.toLong * h > 16777216L) return null
          if (len != 8 + 3 * n) return null
          comps = Array.fill(n)(new Component)
          var i = 0
          while (i < n) {
            val c = comps(i)
            c.id = b(at + 8 + 3 * i) & 0xff
            val hv = b(at + 9 + 3 * i) & 0xff
            c.h = hv >> 4; c.v = hv & 0x0f
            c.tq = b(at + 10 + 3 * i) & 0xff
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3)
              return null
            i += 1
          }
          sofSeen = true
          at += len
        case mm if mm >= 0xc2 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8 =>
          return null // progressive/arithmetic/lossless/hierarchical
        case 0xda => // SOS — decode the scan, then expect EOI
          if (!sofSeen || comps == null) return null
          if (at + 2 > b.length) return null
          val len = u16(at)
          val ns = b(at + 2) & 0xff
          if (ns != comps.length || len != 6 + 2 * ns) return null
          var i = 0
          while (i < ns) {
            val cid = b(at + 3 + 2 * i) & 0xff
            val tb = b(at + 4 + 2 * i) & 0xff
            val c = comps.find(_.id == cid).orNull
            if (c == null) return null
            c.dcTbl = tb >> 4; c.acTbl = tb & 0x0f
            if (c.dcTbl > 3 || c.acTbl > 3 ||
              dcTables(c.dcTbl) == null || acTables(c.acTbl) == null ||
              !qtSeen(c.tq)) return null
            i += 1
          }
          // baseline spectral selection bytes: Ss=0 Se=63 Ah/Al=0
          val ss = b(at + 3 + 2 * ns) & 0xff
          val se = b(at + 4 + 2 * ns) & 0xff
          val aa = b(at + 5 + 2 * ns) & 0xff
          if (ss != 0 || se != 63 || aa != 0) return null
          at += len
          return decodeScan(b, at, w, h, comps, qt, dcTables, acTables,
            restartInterval)
        case _ => return null // TEM/DNL/unknown
      }
    }
    null // unreachable
  }

  private def decodeScan(b: Array[Byte], at: Int, w: Int, h: Int,
      comps: Array[Component], qt: Array[Array[Int]],
      dcTables: Array[Huff], acTables: Array[Huff],
      restartInterval: Int): Decoded = {
    var hMax = 1; var vMax = 1
    comps.foreach { c =>
      hMax = math.max(hMax, c.h); vMax = math.max(vMax, c.v)
    }
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      if (c.planeW.toLong * c.planeH > 4L * 16777216L) return null
      c.plane = new Array[Byte](c.planeW * c.planeH)
      c.pred = 0
    }
    val r = new Reader(b, at)
    val coef = new Array[Int](64)
    val outBlk = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var rstN = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.restart(rstN)) return null
        rstN = (rstN + 1) & 7
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = r.decode(dcTables(c.dcTbl))
            if (r.corrupt || t > 15) return null
            val diff = r.extend(t)
            if (r.corrupt) return null
            c.pred += diff
            coef(0) = c.pred * qt(c.tq)(0)
            // AC
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = r.decode(acTables(c.acTbl))
              if (r.corrupt) return null
              val run = rs >> 4
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += run
                if (k > 63) return null
                coef(Zigzag(k)) = r.extend(size) * qt(c.tq)(k)
                if (r.corrupt) return null
                k += 1
              }
            }
            idct(coef, outBlk)
            // place block
            val px = (mx * c.h + bx) * 8
            val py = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              val rowOff = (py + yy) * c.planeW + px
              while (xx < 8) {
                c.plane(rowOff + xx) = outBlk(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // after the scan: byte-align and expect EOI (fill FFs tolerated)
    var p = r.pos
    // skip any residual stuffing zero? (bit reader leaves pos at the
    // next unread byte; a conformant stream now has FF D9)
    while (p + 1 < b.length && (b(p) & 0xff) == 0xff &&
      (b(p + 1) & 0xff) == 0xff) p += 1
    if (p + 2 > b.length || (b(p) & 0xff) != 0xff ||
      (b(p + 1) & 0xff) != 0xd9) return null
    new Decoded(w, h, comps.length, comps, hMax, vMax)
  }

  /** Dequantized coefficients (natural order) → level-shifted,
    * clamped samples; double-precision separable basis, round =
    * floor(x + 0.5). Exact for DC-only blocks by construction. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    // rows then columns, tmp in doubles
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cv = coef(y * 8 + u)
          if (cv != 0) s += cv * CosTab(u)(x)
          u += 1
        }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          s += tmp(v * 8 + x) * CosTab(v)(yy)
          v += 1
        }
        val p = math.floor(0.25 * s + 128.0 + 0.5).toInt
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
  }

  /** `[w, h, channels, n_pix, r_sum, g_sum, b_sum]` or null. */
  def stats(b: Array[Byte]): Array[Long] = {
    val d = decode(b)
    if (d == null) return null
    var r = 0L; var g = 0L; var bl = 0L
    var y = 0
    while (y < d.h) {
      var x = 0
      while (x < d.w) {
        val p = d.rgb(x, y)
        r += (p >> 16) & 0xff
        g += (p >> 8) & 0xff
        bl += p & 0xff
        x += 1
      }
      y += 1
    }
    Array(d.w.toLong, d.h.toLong, d.nComp.toLong, d.w.toLong * d.h, r, g, bl)
  }
}

/** Deterministic JPEG fixture builder — `jpeg_fixture(id, w, h)`: a
  * REAL baseline JPEG (SOI, JFIF APP0, DQT, SOF0, DHT, optional DRI,
  * SOS, Huffman-coded entropy data with restart markers, EOI) whose
  * raster is CONSTANT within each 8×8 block: block k's gray value is
  * (id·7 + k·13) % 256, dims are multiples of 8. DC-only blocks make
  * the decode EXACT in every conformant decoder (the IDCT of a
  * DC-only block is a constant — rounding freedom never engages), so
  * the gate oracle recomputes sums from the generator arithmetic
  * while the encoder still exercises real DC-difference Huffman
  * coding, category/extend bit emission, byte stuffing, and (on
  * id % 3 == 0) DRI/RSTn handling with predictor resets.
  *
  * The DC Huffman table is T.81's Annex K luminance table; the AC
  * table is a minimal 1-symbol table (EOB at code length 1) — legal,
  * and ImageIO decodes these files exactly (JpegStatsSpec pins it). */
case class JpegFixture(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"jpeg_fixture expects (bigint, int, int) args, got $t")
    }

  override def nullSafeEval(id: Any, w: Any, h: Any): Any =
    JpegFixture.build(id.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, w, h) => {
      s"""
         |${ev.value} = graft.functions.JpegFixture.build($id, $w, $h);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): JpegFixture = copy(f, s, t)
}

object JpegFixture {

  // T.81 Annex K.3.3.1 luminance DC: counts per length 1..16, then
  // the 12 category symbols in order
  private val DcCounts =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcSymbols = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** (code, length) for each DC category under the canonical
    * assignment of [[DcCounts]]. */
  private val DcCodes: Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](12)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < DcCounts(l - 1)) {
        out(DcSymbols(k)) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          buf = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad to byte boundary with 1-bits (the T.81 convention). */
    def flush(): Unit = {
      while (n != 0) put(1, 1)
    }
  }

  @inline private def mod256(v: Long): Int =
    ((v % 256L + 256L) % 256L).toInt

  def build(id: Long, w: Int, h: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || w % 8 != 0 || h % 8 != 0 ||
      w > 4096 || h > 4096) return null
    val out = new java.io.ByteArrayOutputStream(w * h / 4 + 1024)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    // JFIF APP0
    marker(0xe0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version
    out.write(0); u16(1); u16(1) // no density units, 1:1
    out.write(0); out.write(0) // no thumbnail
    // DQT: table 0, all ones (identity quantization)
    marker(0xdb); u16(2 + 65)
    out.write(0x00)
    var i = 0
    while (i < 64) { out.write(1); i += 1 }
    // SOF0: 8-bit, h, w, 1 component (gray), 1x1 sampling, table 0
    marker(0xc0); u16(8 + 3)
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    // DHT: DC table 0 (Annex K luminance) + minimal AC table 0
    marker(0xc4); u16(2 + 17 + 12 + 17 + 1)
    out.write(0x00)
    DcCounts.foreach(out.write)
    DcSymbols.foreach(out.write)
    out.write(0x10)
    out.write(1); (2 to 16).foreach(_ => out.write(0))
    out.write(0x00) // the single AC symbol: EOB, code '0' at length 1
    // DRI on id % 3 == 0: restart every 2 MCUs
    val dri = if (java.lang.Math.floorMod(id, 3L) == 0L) 2 else 0
    if (dri > 0) { marker(0xdd); u16(4); u16(dri) }
    // SOS
    marker(0xda); u16(6 + 2)
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    // entropy: one DC-only block per 8×8 tile, raster MCU order
    val bw = new BitWriter(out)
    val bxN = w / 8
    val byN = h / 8
    var pred = 0
    var k = 0
    var rstN = 0
    while (k < bxN * byN) {
      if (dri > 0 && k > 0 && k % dri == 0) {
        bw.flush()
        marker(0xd0 | rstN)
        rstN = (rstN + 1) & 7
        pred = 0
      }
      val v = mod256(id * 7 + k.toLong * 13)
      val dc = 8 * (v - 128) // DC-only: F(0,0) = 8·(v − 128), qt = 1
      var diff = dc - pred
      pred = dc
      // category + magnitude bits (T.81 receive/extend inverse)
      var cat = 0
      var mag = math.abs(diff)
      while (mag != 0) { cat += 1; mag >>= 1 }
      val (code, len) = DcCodes(cat)
      bw.put(code, len)
      if (cat > 0) {
        val bits = if (diff >= 0) diff else diff + (1 << cat) - 1
        bw.put(bits, cat)
      }
      bw.put(0, 1) // EOB (AC table: symbol 0x00 at code '0')
      k += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
