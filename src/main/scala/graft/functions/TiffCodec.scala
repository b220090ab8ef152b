package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** REAL TIFF decode — the format whose quirks are structural rather
  * than entropy-coded: BOTH byte orders ("II" little-endian /
  * "MM" big-endian declared in the header, applying to every field
  * after it), an IFD tag walk (12-byte entries with inline-or-offset
  * values by type and count), strip-assembled rasters, and
  * multi-page files (chained IFDs). Layout from the public TIFF 6.0
  * specification.
  *
  * `tiff_stats(blob)` returns
  *
  *   struct(width, height, channels, n_pages, n_pix, r_sum, g_sum, b_sum)
  *
  * width/height/channels/sums are the FIRST page's (raster assembled
  * across its strips, exact integer channel sums; gray sums as
  * r=g=b); n_pages counts the IFD chain. Supported: uncompressed
  * (Compression=1), 8 bits per sample, 1 or 3 samples per pixel,
  * chunky planar config, any strip layout. NULL for: other
  * compressions/bit depths/planar configs, torn IFDs or strips,
  * missing mandatory tags, hostile dims (> 16M pixels), or an IFD
  * chain longer than 64 pages (a loop bomb, not a document).
  *
  * Pinned both directions against the JDK's independent ImageIO TIFF
  * codec in TiffStatsSpec; the gate oracle recomputes sums from the
  * [[TiffFixture]] generator arithmetic.
  */
case class TiffStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TiffStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"tiff_stats expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any = {
    val v = TiffStats.stats(blob.asInstanceOf[Array[Byte]])
    if (v == null) null else TiffStats.toRow(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val v = ctx.freshName("tif")
      s"""
         |long[] $v = graft.functions.TiffStats.stats($b);
         |if ($v == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.TiffStats.toRow($v);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TiffStats =
    copy(child = newChild)
}

object TiffStats {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_pages", IntegerType, nullable = false),
    StructField("n_pix", LongType, nullable = false),
    StructField("r_sum", LongType, nullable = false),
    StructField("g_sum", LongType, nullable = false),
    StructField("b_sum", LongType, nullable = false)))

  def toRow(v: Array[Long]): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      v(0).toInt, v(1).toInt, v(2).toInt, v(3).toInt, v(4), v(5), v(6),
      v(7)))

  private final val MaxPages = 64

  /** `[w, h, channels, n_pages, n_pix, r, g, b]` or null. */
  def stats(b: Array[Byte]): Array[Long] = {
    if (b.length < 8) return null
    val le =
      if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else return null

    def u16(off: Long): Int = {
      val o = off.toInt
      if (o < 0 || o + 2 > b.length) return -1
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    }
    def u32(off: Long): Long = {
      val o = off.toInt
      if (o < 0 || o + 4 > b.length) return -1L
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    }

    if (u16(2) != 42) return null
    var ifd = u32(4)
    if (ifd < 8L) return null

    // first pass: count pages; remember the first IFD
    val firstIfd = ifd
    var pages = 0
    while (ifd != 0L) {
      pages += 1
      if (pages > MaxPages) return null
      val n = u16(ifd)
      if (n <= 0) return null
      val next = u32(ifd + 2 + 12L * n)
      if (next < 0L) return null
      ifd = next
    }

    // decode page 1
    val n = u16(firstIfd)
    var w = -1L; var h = -1L
    var bits = 8L // default per spec
    var comp = 1L
    var spp = 1L // SamplesPerPixel default
    var rowsPerStrip = -1L
    var planar = 1L
    var stripOffTag: (Long, Int, Long) = null // (count, type, valueOff)
    var stripCntTag: (Long, Int, Long) = null
    var bitsTag: (Long, Int, Long) = null
    var i = 0
    while (i < n) {
      val e = firstIfd + 2 + 12L * i
      val tag = u16(e)
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      if (tag < 0 || typ < 0 || cnt < 0L) return null
      val typeSize = typ match {
        case 1 | 2 | 6 | 7 => 1L // BYTE/ASCII/SBYTE/UNDEF
        case 3 | 8 => 2L         // SHORT
        case 4 | 9 => 4L         // LONG
        case _ => 8L
      }
      val inline = typeSize * cnt <= 4L
      val valOff = if (inline) e + 8 else u32(e + 8)
      if (valOff < 0L) return null
      def scalar(): Long = typ match {
        case 3 => u16(valOff).toLong
        case 4 => u32(valOff)
        case _ => -1L
      }
      tag match {
        case 256 => w = scalar()
        case 257 => h = scalar()
        case 258 => bitsTag = (cnt, typ, valOff)
        case 259 => comp = scalar()
        case 277 => spp = scalar()
        case 278 => rowsPerStrip = scalar()
        case 273 => stripOffTag = (cnt, typ, valOff)
        case 279 => stripCntTag = (cnt, typ, valOff)
        case 284 => planar = scalar()
        case _ => () // ignore the rest (photometric, resolution, ...)
      }
      i += 1
    }
    if (w <= 0L || h <= 0L || w * h > 16777216L) return null
    if (comp != 1L || planar != 1L) return null
    if (spp != 1L && spp != 3L) return null
    if (stripOffTag == null) return null
    // BitsPerSample: every sample must be 8
    if (bitsTag != null) {
      val (cnt, typ, off) = bitsTag
      if (typ != 3) return null
      var k = 0L
      while (k < cnt) {
        if (u16(off + 2 * k) != 8) return null
        k += 1L
      }
      bits = 8L
    }
    if (bits != 8L) return null
    if (rowsPerStrip <= 0L) rowsPerStrip = h // spec default: 2^32-1 ≙ all
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val (soCnt, soTyp, soOff) = stripOffTag
    if (soCnt != nStrips || (soTyp != 3 && soTyp != 4)) return null
    // StripByteCounts is technically mandatory; tolerate absence by
    // deriving from geometry (uncompressed strips are exact-size)
    val rowBytes = w * spp
    var r = 0L; var g = 0L; var bl = 0L
    var s = 0L
    while (s < nStrips) {
      val off =
        if (soTyp == 3) u16(soOff + 2 * s).toLong else u32(soOff + 4 * s)
      if (off < 0L) return null
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
      val bytes = rows * rowBytes
      if (off + bytes > b.length) return null
      if (stripCntTag != null) {
        val (cc, ct, co) = stripCntTag
        if (cc != nStrips) return null
        val declared =
          if (ct == 3) u16(co + 2 * s).toLong
          else if (ct == 4) u32(co + 4 * s)
          else return null
        if (declared != bytes) return null // lying byte counts
      }
      var j = 0L
      val base = off.toInt
      while (j < bytes) {
        val v = b(base + j.toInt) & 0xff
        if (spp == 1L) { r += v; g += v; bl += v }
        else (j % 3).toInt match {
          case 0 => r += v
          case 1 => g += v
          case _ => bl += v
        }
        j += 1L
      }
      s += 1L
    }
    Array(w, h, spp, pages.toLong, w * h, r, g, bl)
  }
}

/** Deterministic TIFF fixture builder — `tiff_fixture(id, w, h)`: a
  * REAL TIFF 6.0 file over the shared generator arithmetic (pixel j
  * row-major: r=(id·3+j·7)%256, g=(id·5+j·11)%256, b=(id·7+j·13)%256;
  * grayscale g=(id·7+j·13)%256 when id%3==0):
  *
  *  - LITTLE-endian ("II") on even ids, BIG-endian ("MM") on odd —
  *    every multi-byte field flips with it
  *  - multi-strip raster (RowsPerStrip = 4) with real StripOffsets/
  *    StripByteCounts arrays (typ LONG, offset-stored)
  *  - RGB pages carry an offset-stored 3×SHORT BitsPerSample array
  *  - a SECOND 2×2 page chained from the first IFD when id%4==0 */
case class TiffFixture(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"tiff_fixture expects (bigint, int, int) args, got $t")
    }

  override def nullSafeEval(id: Any, w: Any, h: Any): Any =
    TiffFixture.build(id.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, w, h) => {
      s"""
         |${ev.value} = graft.functions.TiffFixture.build($id, $w, $h);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): TiffFixture = copy(f, s, t)
}

object TiffFixture {

  @inline private def mod256(v: Long): Int =
    ((v % 256L + 256L) % 256L).toInt

  private final class W(le: Boolean) {
    val out = new java.io.ByteArrayOutputStream(4096)
    def size: Int = out.size()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit =
      if (le) { u8(v); u8(v >> 8) } else { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit =
      if (le) { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt)
        u8((v >> 24).toInt) }
      else { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt)
        u8(v.toInt) }
    def bytes(a: Array[Byte]): Unit = out.write(a, 0, a.length)
  }

  private final val RowsPerStrip = 4

  def build(id: Long, w: Int, h: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val le = java.lang.Math.floorMod(id, 2L) == 0L
    val gray = java.lang.Math.floorMod(id, 3L) == 0L
    val twoPages = java.lang.Math.floorMod(id, 4L) == 0L
    val spp = if (gray) 1 else 3
    val wr = new W(le)
    wr.bytes(if (le) "II".getBytes("US-ASCII") else "MM".getBytes("US-ASCII"))
    wr.u16(42)

    // layout: header(8) | page1 strips | page1 aux arrays | IFD1 |
    //         [page2 strip | IFD2]
    val rowBytes = w * spp
    val nStrips = (h + RowsPerStrip - 1) / RowsPerStrip
    val stripOff = new Array[Long](nStrips)
    val stripCnt = new Array[Long](nStrips)
    var pos = 8L
    var s = 0
    while (s < nStrips) {
      val rows = math.min(RowsPerStrip, h - s * RowsPerStrip)
      stripOff(s) = pos
      stripCnt(s) = rows.toLong * rowBytes
      pos += stripCnt(s)
      s += 1
    }
    val stripOffArr = pos; pos += 4L * nStrips
    val stripCntArr = pos; pos += 4L * nStrips
    val bitsArr = if (gray) -1L else { val p = pos; pos += 6L; p }
    val ifd1 = pos
    val nEntries1 = 9 // same tag set either way; 258 is inline for gray
    pos += 2L + 12L * nEntries1 + 4L
    // optional page 2: 2×2 gray, one strip
    val p2w = 2; val p2h = 2
    val page2Strip = if (twoPages) { val p = pos; pos += p2w.toLong * p2h; p }
      else -1L
    val ifd2 = if (twoPages) pos else 0L

    wr.u32(ifd1)
    // page-1 raster (row-major from top; strips in order)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (gray) {
          wr.u8(mod256(id * 7 + (y.toLong * w + x) * 13))
        } else {
          val j = y.toLong * w + x
          wr.u8(mod256(id * 3 + j * 7))
          wr.u8(mod256(id * 5 + j * 11))
          wr.u8(mod256(id * 7 + j * 13))
        }
        x += 1
      }
      y += 1
    }
    // aux arrays
    stripOff.foreach(wr.u32)
    stripCnt.foreach(wr.u32)
    if (!gray) { wr.u16(8); wr.u16(8); wr.u16(8) }
    // IFD1
    def entry(tag: Int, typ: Int, cnt: Long, value: Long): Unit = {
      wr.u16(tag); wr.u16(typ); wr.u32(cnt)
      typ match {
        case 3 if cnt == 1L => wr.u16(value.toInt); wr.u16(0)
        case _ => wr.u32(value)
      }
    }
    wr.u16(nEntries1)
    entry(256, 4, 1L, w.toLong)            // ImageWidth
    entry(257, 4, 1L, h.toLong)            // ImageLength
    if (!gray) entry(258, 3, 3L, bitsArr)  // BitsPerSample (offset)
    else entry(258, 3, 1L, 8L)             // inline SHORT
    entry(259, 3, 1L, 1L)                  // Compression: none
    entry(262, 3, 1L, if (gray) 1L else 2L) // Photometric
    // count-1 LONG values are INLINE per spec (a 1-strip page stores
    // the offset itself in the value field, not a pointer)
    entry(273, 4, nStrips.toLong,
      if (nStrips == 1) stripOff(0) else stripOffArr) // StripOffsets
    entry(277, 3, 1L, spp.toLong)          // SamplesPerPixel
    entry(278, 3, 1L, RowsPerStrip.toLong) // RowsPerStrip
    entry(279, 4, nStrips.toLong,
      if (nStrips == 1) stripCnt(0) else stripCntArr) // StripByteCounts
    wr.u32(ifd2)
    if (twoPages) {
      // page-2 raster then its IFD (single strip, gray, inline-able)
      var k = 0
      while (k < p2w * p2h) { wr.u8(mod256(id + k)); k += 1 }
      wr.u16(7)
      entry(256, 4, 1L, p2w.toLong)
      entry(257, 4, 1L, p2h.toLong)
      entry(258, 3, 1L, 8L)
      entry(259, 3, 1L, 1L)
      entry(273, 4, 1L, page2Strip)
      entry(277, 3, 1L, 1L)
      entry(278, 3, 1L, p2h.toLong)
      wr.u32(0L)
    }
    wr.out.toByteArray
  }
}
