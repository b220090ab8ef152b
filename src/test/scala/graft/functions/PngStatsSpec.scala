package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential spec for the native [[PngStats]] decoder against the
  * JDK's INDEPENDENT PNG codec (javax.imageio), both directions:
  *
  *  - ImageIO DECODES [[PngFixture]]'s output and the per-channel
  *    sums must match `png_stats` — so the fixture encoder and the
  *    kernel cannot share a compensating bug;
  *  - `png_stats` DECODES ImageIO-ENCODED images (gray / RGB / RGBA,
  *    randomized rasters) — a fully foreign encoder exercising
  *    whatever filter choices ImageIO makes.
  *
  * Plus reject-path pins: truncated blobs, bad filter bytes, lying
  * IHDR dims, corrupted zlib (Adler32), interlaced flag, unsupported
  * bit depth / color type / palette.
  */
class PngStatsSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.ensure(spark)

  private def statsOf(blobs: Seq[Array[Byte]]): Seq[Row] =
    blobs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "blob")
      .select($"i", call_function("png_stats", $"blob").as("st"))
      .orderBy($"i").collect()
      .map(r => if (r.isNullAt(1)) null else r.getStruct(1)).toSeq

  /** Channel sums via ImageIO (independent decoder). Returns
    * (w, h, rSum, gSum, bSum, aSum) with gray rendered as r=g=b. */
  private def imageioSums(png: Array[Byte]): (Int, Int, Long, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not read the PNG")
    var r = 0L; var g = 0L; var b = 0L; var a = 0L
    val raster = img.getRaster
    val nBands = raster.getNumBands
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        if (nBands == 1) {
          val v = raster.getSample(x, y, 0)
          r += v; g += v; b += v
        } else {
          r += raster.getSample(x, y, 0)
          g += raster.getSample(x, y, 1)
          b += raster.getSample(x, y, 2)
          if (nBands >= 4) a += raster.getSample(x, y, 3)
        }
        x += 1
      }
      y += 1
    }
    (img.getWidth, img.getHeight, r, g, b, a)
  }

  private def imageioEncode(w: Int, h: Int, imgType: Int,
      rnd: Random): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w; band <- 0 until raster.getNumBands)
      raster.setSample(x, y, band, rnd.nextInt(256))
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  test("fixture PNGs: png_stats equals the generator arithmetic AND " +
    "ImageIO's independent decode") {
    val cases = Seq((0L, 7, 5), (1L, 18, 6), (42L, 12, 10), (9999L, 7, 9))
    val blobs = cases.map { case (id, w, h) => PngFixture.build(id, w, h) }
    blobs.foreach(b => assert(b != null))
    val sts = statsOf(blobs)
    cases.zip(blobs).zip(sts).foreach { case (((id, w, h), png), st) =>
      assert(st != null, s"fixture ($id,$w,$h) decoded NULL")
      // generator arithmetic
      var er = 0L; var eg = 0L; var eb = 0L
      var j = 0L
      val n = w.toLong * h * 3
      while (j < n) {
        val v = (id * 7 + j * 13) % 256
        (j % 3) match {
          case 0 => er += v
          case 1 => eg += v
          case _ => eb += v
        }
        j += 1
      }
      assert((st.getInt(0), st.getInt(1), st.getInt(2)) == ((w, h, 3)))
      assert(st.getLong(3) == w.toLong * h)
      assert((st.getLong(4), st.getLong(5), st.getLong(6)) == ((er, eg, eb)))
      // independent decoder agrees
      val (iw, ih, ir, ig, ib, _) = imageioSums(png)
      assert((iw, ih, ir, ig, ib) == ((w, h, er, eg, eb)))
    }
  }

  test("png_stats decodes ImageIO-encoded gray/RGB/RGBA images " +
    "(foreign encoder, randomized rasters)") {
    val rnd = new Random(11)
    val cases = Seq(
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY -> 1,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR -> 3,
      java.awt.image.BufferedImage.TYPE_4BYTE_ABGR -> 4)
    for ((imgType, nch) <- cases; (w, h) <- Seq((1, 1), (13, 7), (64, 33))) {
      val png = imageioEncode(w, h, imgType, rnd)
      val st = statsOf(Seq(png)).head
      assert(st != null, s"ImageIO PNG type=$imgType ${w}x$h decoded NULL")
      val (iw, ih, ir, ig, ib, ia) = imageioSums(png)
      assert((st.getInt(0), st.getInt(1), st.getInt(2)) == ((iw, ih, nch)))
      assert((st.getLong(4), st.getLong(5), st.getLong(6)) == ((ir, ig, ib)))
      if (nch == 4) assert(st.getLong(7) == ia)
    }
  }

  test("reject paths: every malformed blob decodes NULL, never wrong") {
    val good = PngFixture.build(7L, 9, 6)
    def mut(f: Array[Byte] => Array[Byte]): Array[Byte] = f(good.clone())
    val bad = Seq(
      Array[Byte](1, 2, 3), // too short
      mut { b => b(0) = 0; b }, // bad signature
      good.dropRight(9), // torn IEND
      good.take(40), // torn IDAT
      mut { b => b(24) = 16; b }, // bit depth 16
      mut { b => b(25) = 3; b }, // palette color type
      mut { b => b(28) = 1; b }, // interlaced
      mut { b => // lying dims: height+1 makes the stream short
        b(23) = (b(23) + 1).toByte; b },
      mut { b => // corrupt a zlib byte mid-IDAT: inflate/Adler fails
        b(50) = (b(50) ^ 0x5a).toByte; b })
    statsOf(bad).zipWithIndex.foreach { case (st, i) =>
      assert(st == null, s"malformed blob $i decoded non-NULL: $st")
    }
    // the unmutated original still decodes (mut worked on clones)
    assert(statsOf(Seq(good)).head != null)
  }

  test("multi-IDAT concatenation is real: fixtures split the stream") {
    // count IDAT chunks in a fixture — the builder writes two
    val png = PngFixture.build(3L, 16, 8)
    var at = 8
    var idats = 0
    var done = false
    while (!done && at + 8 <= png.length) {
      val len = ((png(at) & 0xff) << 24) | ((png(at + 1) & 0xff) << 16) |
        ((png(at + 2) & 0xff) << 8) | (png(at + 3) & 0xff)
      val typ = new String(png, at + 4, 4, "US-ASCII")
      if (typ == "IDAT") idats += 1
      if (typ == "IEND") done = true
      at += 8 + len + 4
    }
    assert(idats == 2, s"expected 2 IDAT chunks, found $idats")
  }
}
