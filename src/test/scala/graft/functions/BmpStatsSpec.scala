package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential spec for [[BmpStats]] against the JDK's independent
  * ImageIO BMP codec, both directions, plus positional row-direction
  * pins (bottom-up vs top-down) on asymmetric rasters. */
class BmpStatsSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.ensure(spark)

  private def statsOf(blobs: Seq[Array[Byte]]): Seq[Row] =
    blobs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "blob")
      .select($"i", call_function("bmp_stats", $"blob").as("st"))
      .orderBy($"i").collect()
      .map(r => if (r.isNullAt(1)) None.orNull else r.getStruct(1)).toSeq

  private def generatorSums(id: Long, w: Int, h: Int): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var j = 0L
    while (j < w.toLong * h) {
      r += (((id * 3 + j * 7) % 256) + 256) % 256
      g += (((id * 5 + j * 11) % 256) + 256) % 256
      b += (((id * 7 + j * 13) % 256) + 256) % 256
      j += 1
    }
    (r, g, b)
  }

  test("fixture BMPs: bmp_stats equals generator arithmetic AND " +
    "ImageIO decodes the identical raster positionally") {
    // id 0,5 → top-down; widths crossing each padding residue 0..3
    for ((id, w, h) <- Seq((0L, 5, 4), (1L, 6, 3), (2L, 7, 5),
        (3L, 8, 2), (5L, 13, 7), (42L, 32, 20))) {
      val bmp = BmpFixture.build(id, w, h)
      assert(bmp != null)
      val Seq(st) = statsOf(Seq(bmp))
      assert(st != null, s"id=$id")
      val (er, eg, eb) = generatorSums(id, w, h)
      assert(st.getInt(0) == w && st.getInt(1) == h, s"id=$id dims")
      assert(st.getInt(2) == 3 && st.getLong(3) == w.toLong * h)
      assert(st.getLong(4) == er && st.getLong(5) == eg &&
        st.getLong(6) == eb, s"id=$id sums")
      // positional: ImageIO must place generator pixel j at its
      // TOP-left row-major position regardless of stored direction
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bmp))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val j = y.toLong * w + x
        val expect = ((((id * 3 + j * 7) % 256) << 16) |
          (((id * 5 + j * 11) % 256) << 8) |
          ((id * 7 + j * 13) % 256)).toInt
        assert((img.getRGB(x, y) & 0xffffff) == expect,
          s"id=$id ($x,$y) direction/padding")
      }
    }
  }

  test("bmp_stats decodes ImageIO-encoded BMPs (foreign writer)") {
    val rnd = new Random(31)
    for ((w, h) <- Seq((5, 4), (31, 17), (100, 60))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt(1 << 24))
      val bos = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", bos))
      val bmp = bos.toByteArray
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        er += (p >> 16) & 0xff; eg += (p >> 8) & 0xff; eb += p & 0xff
      }
      val Seq(st) = statsOf(Seq(bmp))
      assert(st != null, s"${w}x$h must parse")
      assert(st.getInt(0) == w && st.getInt(1) == h)
      assert(st.getLong(4) == er && st.getLong(5) == eg &&
        st.getLong(6) == eb, s"${w}x$h sums (BMP is lossless)")
    }
  }

  test("reject paths") {
    val good = BmpFixture.build(9L, 10, 8)
    assert(statsOf(Seq(good)).head != null)
    for (cut <- Seq(1, 13, 53, good.length / 2, good.length - 1))
      assert(statsOf(Seq(good.take(cut))).head == null, s"cut at $cut")
    val sig = good.clone(); sig(1) = 'N'
    assert(statsOf(Seq(sig)).head == null)
    val bpp8 = good.clone(); bpp8(28) = 8 // palette format
    assert(statsOf(Seq(bpp8)).head == null)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assert(statsOf(Seq(rle)).head == null)
    assert(statsOf(Seq("not a bmp".getBytes)).head == null)
  }

  test("interpreted path agrees with codegen") {
    val b = BmpFixture.build(17L, 9, 6)
    val direct = BmpStats.stats(b)
    val Seq(st) = statsOf(Seq(b))
    assert(direct != null && st != null && st.getLong(4) == direct(4))
  }
}
