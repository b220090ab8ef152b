package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential spec for the native [[JpegStats]] baseline decoder
  * against the JDK's INDEPENDENT ImageIO JPEG codec.
  *
  * Exactness contract (see the [[JpegStats]] doc): IDCT rounding is
  * implementation-defined within T.81 conformance, so the comparisons
  * are stratified:
  *
  *  - DC-ONLY content ([[JpegFixture]]): EXACT both directions — the
  *    IDCT of a DC-only block is a constant, so every conformant
  *    decoder must agree bit-for-bit. ImageIO decodes the fixture's
  *    files to the same rasters the generator arithmetic predicts.
  *  - Arbitrary content (ImageIO-ENCODED grayscale and
  *    constant-chroma color JPEGs): per-pixel tolerance ±1 per
  *    channel against ImageIO's own read-back — the conformance-bound
  *    comparison two independent IDCTs allow.
  *
  * Plus reject pins: progressive SOF2 (ImageIO-written), truncation,
  * torn entropy data, missing tables.
  */
class JpegStatsSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.ensure(spark)

  private def statsOf(blobs: Seq[Array[Byte]]): Seq[Row] =
    blobs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "blob")
      .select($"i", call_function("jpeg_stats", $"blob").as("st"))
      .orderBy($"i").collect()
      .map(r => if (r.isNullAt(1)) null else r.getStruct(1)).toSeq

  private def imageioRead(jpg: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(jpg))
    assert(img != null, "ImageIO could not read the JPEG")
    img
  }

  private def imageioEncode(img: java.awt.image.BufferedImage,
      progressive: Boolean = false, quality: Float = 0.9f): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    param.setProgressiveMode(
      if (progressive) javax.imageio.ImageWriteParam.MODE_DEFAULT
      else javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("DC-only fixtures: jpeg_stats equals the generator arithmetic " +
    "exactly, including the DRI/RST files") {
    // id 0,3,9 → DRI present; others → no restart markers
    val cases = Seq((0L, 8, 8), (1L, 48, 32), (3L, 40, 24), (7L, 16, 8),
      (9L, 48, 16), (424242L, 32, 32))
    val blobs = cases.map { case (id, w, h) => JpegFixture.build(id, w, h) }
    blobs.foreach(b => assert(b != null))
    val got = statsOf(blobs)
    cases.zip(got).foreach { case ((id, w, h), st) =>
      assert(st != null, s"id=$id")
      var expect = 0L
      for (k <- 0 until (w / 8) * (h / 8))
        expect += 64L * ((((id * 7 + k.toLong * 13) % 256) + 256) % 256)
      assert(st.getInt(0) == w && st.getInt(1) == h, s"id=$id dims")
      assert(st.getInt(2) == 1, s"id=$id channels")
      assert(st.getLong(3) == w.toLong * h, s"id=$id n_pix")
      assert(st.getLong(4) == expect && st.getLong(5) == expect &&
        st.getLong(6) == expect, s"id=$id sums")
    }
  }

  test("DC-only fixtures: ImageIO (independent decoder) reconstructs " +
    "the identical raster, pixel for pixel") {
    for ((id, w, h) <- Seq((0L, 24, 16), (5L, 48, 32), (13L, 8, 8))) {
      val img = imageioRead(JpegFixture.build(id, w, h))
      assert(img.getWidth == w && img.getHeight == h)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w) {
        val k = (y / 8) * (w / 8) + (x / 8)
        val v = ((((id * 7 + k.toLong * 13) % 256) + 256) % 256).toInt
        assert(raster.getSample(x, y, 0) == v, s"id=$id ($x,$y)")
      }
    }
  }

  test("arbitrary grayscale content (ImageIO-encoded): per-pixel " +
    "agreement within the T.81 IDCT conformance bound") {
    val rnd = new Random(17)
    for ((w, h) <- Seq((8, 8), (31, 17), (64, 48), (129, 65))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
      val jpg = imageioEncode(img)
      val back = imageioRead(jpg).getRaster
      val dec = JpegStats.decode(jpg)
      assert(dec != null, s"${w}x$h must parse")
      assert(dec.w == w && dec.h == h && dec.nComp == 1)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val mine = dec.rgb(x, y) & 0xff
        val ref = back.getSample(x, y, 0)
        maxDiff = math.max(maxDiff, math.abs(mine - ref))
      }
      assert(maxDiff <= 1, s"${w}x$h maxDiff=$maxDiff")
    }
  }

  test("color content with constant chroma (ImageIO-encoded, " +
    "subsampled): per-pixel agreement within the conformance bound") {
    val rnd = new Random(23)
    for ((w, h) <- Seq((16, 16), (33, 21), (80, 60))) {
      // R=G=B content → Cb=Cr=128 everywhere, so chroma upsampling
      // strategy (ImageIO's filtered vs this kernel's box) cannot
      // diverge; what remains is the luma IDCT + color convert
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = rnd.nextInt(256)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val jpg = imageioEncode(img)
      val back = imageioRead(jpg)
      val dec = JpegStats.decode(jpg)
      assert(dec != null, s"${w}x$h must parse")
      assert(dec.nComp == 3, s"${w}x$h components")
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val mine = (dec.rgb(x, y) >> (8 * c)) & 0xff
        val ref = (back.getRGB(x, y) >> (8 * c)) & 0xff
        maxDiff = math.max(maxDiff, math.abs(mine - ref))
      }
      assert(maxDiff <= 1, s"${w}x$h maxDiff=$maxDiff")
    }
  }

  test("reject paths: progressive, truncation, torn entropy") {
    // ImageIO-written PROGRESSIVE jpeg (SOF2): out of baseline scope,
    // must be null — never a garbage decode
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new Random(5)
    for (y <- 0 until 32; x <- 0 until 32)
      img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    assert(JpegStats.stats(imageioEncode(img, progressive = true)) == null)
    // truncation at every region of a good fixture
    val good = JpegFixture.build(11L, 32, 24)
    assert(JpegStats.stats(good) != null)
    for (cut <- Seq(1, 3, 20, 100, 180, good.length / 2, good.length - 1))
      assert(JpegStats.stats(good.take(cut)) == null, s"cut at $cut")
    // entropy bit corruption: either null (invalid code/marker) or a
    // decode whose dims are still the declared ones (wrong pixels are
    // conformant for corrupt-but-decodable bits; structure is not)
    val flip = good.clone()
    flip(good.length - 4) = (flip(good.length - 4) ^ 0x55).toByte
    val st = JpegStats.stats(flip)
    if (st != null) assert(st(0) == 32L && st(1) == 24L)
    // not a JPEG
    assert(JpegStats.stats("plain text".getBytes) == null)
    assert(JpegStats.stats(Array.emptyByteArray) == null)
  }

  test("interpreted path agrees with codegen") {
    val b = JpegFixture.build(21L, 24, 16)
    val direct = JpegStats.stats(b)
    val Seq(st) = statsOf(Seq(b))
    assert(direct != null && st != null)
    assert(st.getLong(4) == direct(4) && st.getInt(0) == direct(0).toInt)
  }
}
