package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** REAL BMP raster decode — the uncompressed member of the
  * still-image codec family (JPEG/PNG/GIF decode real compression;
  * BMP's quirks are structural instead: little-endian everything,
  * BGR channel order, 4-byte row padding, bottom-up vs top-down row
  * direction via the sign of the height field, and a raster offset
  * that may skip past extended headers). Format layout from the
  * public Windows BITMAPINFOHEADER documentation.
  *
  * `bmp_stats(blob)` returns
  *
  *   struct(width, height, channels, n_pix, r_sum, g_sum, b_sum)
  *
  * Supported: "BM" files with an info header of ≥ 40 bytes
  * (BITMAPINFOHEADER and its V4/V5 extensions — skipped via the
  * header's own size field), 24-bit BGR and 32-bit BGRx, BI_RGB
  * (uncompressed) only, either row direction (sums are additionally
  * row-order-invariant, but width/height must still read correctly).
  * NULL for: other signatures/bit depths/compressions, palette
  * formats, rasters that do not fit the blob, hostile dims (> 16M
  * pixels — the [[PpmStats]] guard).
  *
  * Pinned against the JDK's independent ImageIO BMP codec both
  * directions in BmpStatsSpec; the gate oracle recomputes sums from
  * the [[BmpFixture]] generator arithmetic.
  */
case class BmpStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BmpStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bmp_stats expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any = {
    val v = BmpStats.stats(blob.asInstanceOf[Array[Byte]])
    if (v == null) null else BmpStats.toRow(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val v = ctx.freshName("bmp")
      s"""
         |long[] $v = graft.functions.BmpStats.stats($b);
         |if ($v == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.BmpStats.toRow($v);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BmpStats =
    copy(child = newChild)
}

object BmpStats {

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

  @inline private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  @inline private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  @inline private def leI32(b: Array[Byte], off: Int): Int =
    leU32(b, off).toInt

  /** `[w, h, channels, n_pix, r_sum, g_sum, b_sum]` or null. */
  def stats(b: Array[Byte]): Array[Long] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val dataOff = leU32(b, 10)
    val hdrSize = leU32(b, 14)
    if (hdrSize < 40L || 14L + hdrSize > b.length) return null
    val w = leI32(b, 18)
    val hRaw = leI32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val planes = leU16(b, 26)
    val bpp = leU16(b, 28)
    val compression = leU32(b, 30)
    if (planes != 1 || (bpp != 24 && bpp != 32) || compression != 0L)
      return null
    if (w <= 0 || h <= 0 || w.toLong * h > 16777216L) return null
    val bytesPerPx = bpp / 8
    val stride = ((w.toLong * bytesPerPx + 3L) / 4L) * 4L
    if (dataOff < 14L + hdrSize ||
      dataOff + stride * h > b.length) return null
    var r = 0L; var g = 0L; var bl = 0L
    var row = 0
    while (row < h) {
      // sums are row-order-invariant; topDown only matters for
      // callers reading pixels positionally (BmpStatsSpec pins the
      // direction via ImageIO on asymmetric rasters)
      val base = (dataOff + stride * row).toInt
      var x = 0
      while (x < w) {
        val o = base + x * bytesPerPx
        bl += b(o) & 0xff
        g += b(o + 1) & 0xff
        r += b(o + 2) & 0xff
        x += 1
      }
      row += 1
    }
    val _ = topDown
    Array(w.toLong, h.toLong, bytesPerPx.toLong, w.toLong * h, r, g, bl)
  }
}

/** Deterministic BMP fixture builder — `bmp_fixture(id, w, h)`: a
  * REAL 24-bit BITMAPINFOHEADER BMP over the shared generator
  * arithmetic — pixel j (row-major from the TOP-left, channel order
  * r,g,b in the generator) has r = (id·3 + j·7) % 256,
  * g = (id·5 + j·11) % 256, b = (id·7 + j·13) % 256 — written
  * BOTTOM-UP with 4-byte row padding (the format's defaults), as
  * BGR, i.e. every structural quirk engaged. Top-down (negative
  * height) variant when id % 5 == 0. */
case class BmpFixture(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bmp_fixture expects (bigint, int, int) args, got $t")
    }

  override def nullSafeEval(id: Any, w: Any, h: Any): Any =
    BmpFixture.build(id.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, w, h) => {
      s"""
         |${ev.value} = graft.functions.BmpFixture.build($id, $w, $h);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): BmpFixture = copy(f, s, t)
}

object BmpFixture {

  @inline private def mod256(v: Long): Int =
    ((v % 256L + 256L) % 256L).toInt

  def build(id: Long, w: Int, h: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val stride = ((w * 3 + 3) / 4) * 4
    val dataOff = 54
    val size = dataOff + stride * h
    val out = new Array[Byte](size)
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def le32(off: Int, v: Long): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, size.toLong)
    le32(10, dataOff.toLong)
    le32(14, 40L) // BITMAPINFOHEADER
    val topDown = java.lang.Math.floorMod(id, 5L) == 0L
    le32(18, w.toLong)
    le32(22, if (topDown) (-h).toLong & 0xffffffffL else h.toLong)
    le16(26, 1)
    le16(28, 24)
    le32(30, 0L) // BI_RGB
    le32(34, (stride * h).toLong)
    le32(38, 2835L); le32(42, 2835L) // 72 dpi
    // raster: generator pixel j is TOP-left row-major; storage row
    // order depends on direction
    var sy = 0
    while (sy < h) {
      val gy = if (topDown) sy else h - 1 - sy // generator row
      val base = dataOff + stride * sy
      var x = 0
      while (x < w) {
        val j = gy.toLong * w + x
        out(base + 3 * x) = mod256(id * 7 + j * 13).toByte     // B
        out(base + 3 * x + 1) = mod256(id * 5 + j * 11).toByte // G
        out(base + 3 * x + 2) = mod256(id * 3 + j * 7).toByte  // R
        x += 1
      }
      sy += 1
    }
    out
  }
}
