package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential spec for [[TiffStats]] against the JDK's independent
  * ImageIO TIFF codec (shipped since Java 9), both directions, across
  * BOTH byte orders, strip layouts, and multi-page chains. */
class TiffStatsSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.ensure(spark)

  private def statsOf(blobs: Seq[Array[Byte]]): Seq[Row] =
    blobs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "blob")
      .select($"i", call_function("tiff_stats", $"blob").as("st"))
      .orderBy($"i").collect()
      .map(r => if (r.isNullAt(1)) None.orNull else r.getStruct(1)).toSeq

  private def generatorSums(id: Long, w: Int, h: Int): (Long, Long, Long) = {
    val gray = java.lang.Math.floorMod(id, 3L) == 0L
    var r = 0L; var g = 0L; var b = 0L
    var j = 0L
    while (j < w.toLong * h) {
      if (gray) {
        val v = (((id * 7 + j * 13) % 256) + 256) % 256
        r += v; g += v; b += v
      } else {
        r += (((id * 3 + j * 7) % 256) + 256) % 256
        g += (((id * 5 + j * 11) % 256) + 256) % 256
        b += (((id * 7 + j * 13) % 256) + 256) % 256
      }
      j += 1L
    }
    (r, g, b)
  }

  test("fixture TIFFs: tiff_stats equals generator arithmetic AND " +
    "ImageIO decodes the identical raster, both endiannesses") {
    // ids cover LE/BE (id%2), gray/RGB (id%3), 1/2 pages (id%4)
    for ((id, w, h) <- Seq((0L, 10, 9), (1L, 7, 5), (2L, 16, 4),
        (3L, 5, 11), (4L, 20, 13), (7L, 8, 8), (12L, 33, 21))) {
      val tif = TiffFixture.build(id, w, h)
      assert(tif != null)
      val Seq(st) = statsOf(Seq(tif))
      assert(st != null, s"id=$id")
      val (er, eg, eb) = generatorSums(id, w, h)
      val gray = id % 3 == 0
      assert(st.getInt(0) == w && st.getInt(1) == h, s"id=$id dims")
      assert(st.getInt(2) == (if (gray) 1 else 3), s"id=$id spp")
      assert(st.getInt(3) == (if (id % 4 == 0) 2 else 1), s"id=$id pages")
      assert(st.getLong(4) == w.toLong * h)
      assert(st.getLong(5) == er && st.getLong(6) == eg &&
        st.getLong(7) == eb, s"id=$id sums")
      // ImageIO positional read of page 1 (independent decoder)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(tif))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"id=$id imageio")
      for (y <- 0 until h; x <- 0 until w) {
        val j = y.toLong * w + x
        if (gray) {
          // raster sample, not getRGB: getRGB gamma-converts linear
          // gray to sRGB (the PngStatsSpec lesson)
          val v = ((((id * 7 + j * 13) % 256) + 256) % 256).toInt
          assert(img.getRaster.getSample(x, y, 0) == v, s"id=$id ($x,$y)")
        } else {
          val expect = (((((id * 3 + j * 7) % 256) << 16) |
            (((id * 5 + j * 11) % 256) << 8) |
            ((id * 7 + j * 13) % 256)).toInt)
          assert((img.getRGB(x, y) & 0xffffff) == expect, s"id=$id ($x,$y)")
        }
      }
    }
  }

  test("tiff_stats decodes ImageIO-written TIFFs (foreign writer, " +
    "gray and RGB)") {
    val rnd = new Random(41)
    for ((w, h, gray) <- Seq((5, 4, false), (31, 17, true),
        (64, 40, false))) {
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        if (gray) {
          val v = rnd.nextInt(256)
          img.getRaster.setSample(x, y, 0, v)
          er += v; eg += v; eb += v
        } else {
          val p = rnd.nextInt(1 << 24)
          img.setRGB(x, y, p)
          er += (p >> 16) & 0xff; eg += (p >> 8) & 0xff; eb += p & 0xff
        }
      }
      val bos = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "tiff", bos))
      val Seq(st) = statsOf(Seq(bos.toByteArray))
      assert(st != null, s"${w}x$h gray=$gray must parse " +
        "(uncompressed default writer)")
      assert(st.getInt(0) == w && st.getInt(1) == h)
      assert(st.getLong(5) == er && st.getLong(6) == eg &&
        st.getLong(7) == eb, s"${w}x$h gray=$gray sums (lossless)")
    }
  }

  test("reject paths") {
    val good = TiffFixture.build(5L, 12, 9)
    assert(statsOf(Seq(good)).head != null)
    for (cut <- Seq(1, 7, 50, good.length / 2, good.length - 1))
      assert(statsOf(Seq(good.take(cut))).head == null, s"cut at $cut")
    val sig = good.clone(); sig(0) = 'X'
    assert(statsOf(Seq(sig)).head == null)
    val badMagic = good.clone(); badMagic(2) = 9
    assert(statsOf(Seq(badMagic)).head == null)
    // IFD loop bomb: first IFD's next pointer → itself
    val loop = TiffFixture.build(1L, 4, 4) // LE? id=1 → BE
    // find: header says IFD offset at bytes 4..7 (BE)
    val ifdOff = ((loop(4) & 0xff) << 24) | ((loop(5) & 0xff) << 16) |
      ((loop(6) & 0xff) << 8) | (loop(7) & 0xff)
    val n = ((loop(ifdOff) & 0xff) << 8) | (loop(ifdOff + 1) & 0xff)
    val nextPtr = ifdOff + 2 + 12 * n
    loop(nextPtr) = ((ifdOff >> 24) & 0xff).toByte
    loop(nextPtr + 1) = ((ifdOff >> 16) & 0xff).toByte
    loop(nextPtr + 2) = ((ifdOff >> 8) & 0xff).toByte
    loop(nextPtr + 3) = (ifdOff & 0xff).toByte
    assert(statsOf(Seq(loop)).head == null, "IFD loop must be rejected")
    assert(statsOf(Seq("not a tiff".getBytes)).head == null)
  }

  test("interpreted path agrees with codegen") {
    val b = TiffFixture.build(6L, 11, 7)
    val direct = TiffStats.stats(b)
    val Seq(st) = statsOf(Seq(b))
    assert(direct != null && st != null && st.getLong(5) == direct(5) &&
      st.getInt(3) == direct(3).toInt)
  }
}
