package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential spec for the native [[GifStats]] LZW decoder against
  * the JDK's INDEPENDENT GIF codec (javax.imageio), both directions:
  *
  *  - ImageIO DECODES [[GifFixture]]'s output and the per-channel
  *    sums must match `gif_stats` — so the fixture's LZW encoder and
  *    the kernel's LZW decoder cannot share a compensating bug;
  *  - `gif_stats` DECODES ImageIO-ENCODED GIFs (randomized palettes
  *    and rasters, including ones big enough to exercise code-size
  *    growth and whatever clear-code strategy ImageIO uses).
  *
  * Plus reject-path pins: truncation everywhere, corrupt codes,
  * missing trailer, missing color table, wrong pixel counts.
  */
class GifStatsSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.ensure(spark)

  private def statsOf(blobs: Seq[Array[Byte]]): Seq[Row] =
    blobs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "blob")
      .select($"i", call_function("gif_stats", $"blob").as("st"))
      .orderBy($"i").collect()
      .map(r => if (r.isNullAt(1)) null else r.getStruct(1)).toSeq

  /** First-frame channel sums via ImageIO (independent decoder). */
  private def imageioSums(gif: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(gif))
    assert(img != null, "ImageIO could not read the GIF")
    var r = 0L; var g = 0L; var b = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        r += (rgb >> 16) & 0xff
        g += (rgb >> 8) & 0xff
        b += rgb & 0xff
        x += 1
      }
      y += 1
    }
    (img.getWidth, img.getHeight, r, g, b)
  }

  private def generatorSums(id: Long, w: Int, h: Int): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var j = 0
    while (j < w * h) {
      val idx = (((id * 7 + j.toLong * 13) % 256) + 256) % 256
      r += (((id * 3 + idx * 7) % 256) + 256) % 256
      g += (((id * 5 + idx * 11) % 256) + 256) % 256
      b += (((id * 7 + idx * 13) % 256) + 256) % 256
      j += 1
    }
    (r, g, b)
  }

  test("fixture GIFs: gif_stats equals the generator arithmetic AND " +
    "ImageIO's independent decode") {
    // ids cover the second-frame branch (id%4==0) and not; dims big
    // enough that 9->10-bit code growth happens (w*h > ~500 distinct
    // additions) and small single-digit ones
    val cases = Seq((0L, 7, 5), (1L, 40, 30), (42L, 64, 48), (7L, 3, 2),
      (99999L, 100, 80))
    val blobs = cases.map { case (id, w, h) => GifFixture.build(id, w, h) }
    blobs.foreach(b => assert(b != null))
    val got = statsOf(blobs)
    cases.zip(blobs).zip(got).foreach { case (((id, w, h), blob), st) =>
      assert(st != null, s"id=$id")
      val (er, eg, eb) = generatorSums(id, w, h)
      assert(st.getInt(0) == w && st.getInt(1) == h, s"id=$id dims")
      assert(st.getInt(2) == (if (id % 4 == 0) 2 else 1), s"id=$id frames")
      assert(st.getLong(3) == w.toLong * h, s"id=$id n_pix")
      assert(st.getLong(4) == er && st.getLong(5) == eg &&
        st.getLong(6) == eb, s"id=$id sums")
      // ImageIO decodes the same file: first frame, same sums
      val (iw, ih, ir, ig, ib) = imageioSums(blob)
      assert(iw == w && ih == h, s"id=$id imageio dims")
      assert(ir == er && ig == eg && ib == eb, s"id=$id imageio sums")
    }
  }

  /** ImageIO GIF encode with explicit interlace control. The default
    * writer interlaces, and the JDK READER mis-deinterlaces small
    * heights (drops/garbles rows — observed: a 5×4 interlaced file
    * reads back with a zeroed row and a lost one), so the
    * foreign-codec differential pins against NON-interlaced output
    * and interlace itself is pinned by sum-invariance below. */
  private def imageioEncode(img: java.awt.image.BufferedImage,
      interlace: Boolean): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(
      if (interlace) javax.imageio.ImageWriteParam.MODE_DEFAULT
      else javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("gif_stats decodes ImageIO-encoded GIFs (foreign LZW encoder)") {
    val rnd = new Random(7)
    for ((w, h) <- Seq((5, 4), (33, 21), (120, 90), (256, 200))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt(1 << 24))
      val gif = imageioEncode(img, interlace = false)
      // GIF quantizes to ≤256 colors — compare against ImageIO's own
      // read-back of its file, not the source raster
      val (iw, ih, ir, ig, ib) = imageioSums(gif)
      val Seq(st) = statsOf(Seq(gif))
      assert(st != null, s"${w}x$h must parse")
      assert(st.getInt(0) == iw && st.getInt(1) == ih)
      assert(st.getLong(3) == iw.toLong * ih)
      assert(st.getLong(4) == ir && st.getLong(5) == ig &&
        st.getLong(6) == ib, s"${w}x$h sums vs ImageIO")
      // interlace permutes rows only: channel sums must be invariant
      // (this pins the kernel's interlace acceptance WITHOUT trusting
      // the JDK reader's buggy deinterlace path)
      val Seq(stI) = statsOf(Seq(imageioEncode(img, interlace = true)))
      assert(stI != null, s"${w}x$h interlaced must parse")
      assert(stI.getLong(4) == st.getLong(4) &&
        stI.getLong(5) == st.getLong(5) &&
        stI.getLong(6) == st.getLong(6), s"${w}x$h interlace invariance")
    }
  }

  test("dictionary-reset path: a raster that fills all 4096 codes " +
    "roundtrips") {
    // random 256-color noise at 160x120 = 19200 px forces the
    // encoder's dict-full clear + the decoder's reset handling
    val rnd = new Random(13)
    val w = 160; val h = 120
    val pixels = Array.fill(w * h)(rnd.nextInt(256).toByte)
    val enc = GifFixture.lzwEncode(pixels, 8)
    // decode through the public surface: wrap in a minimal GIF
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0xf7); out.write(0); out.write(0)
    for (i <- 0 until 256) { out.write(i); out.write(i); out.write(i) }
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0)
    out.write(8)
    var off = 0
    while (off < enc.length) {
      val len = math.min(255, enc.length - off)
      out.write(len); out.write(enc, off, len)
      off += len
    }
    out.write(0)
    out.write(0x3b)
    val Seq(st) = statsOf(Seq(out.toByteArray))
    assert(st != null, "dict-reset stream must decode")
    // grayscale palette: every channel sum = sum of pixel indices
    val expect = pixels.map(_ & 0xff).map(_.toLong).sum
    assert(st.getLong(4) == expect && st.getLong(5) == expect &&
      st.getLong(6) == expect)
  }

  test("reject paths") {
    val good = GifFixture.build(3L, 20, 15)
    assert(statsOf(Seq(good)).head != null)
    // truncation at every region: header, GCT, descriptor, LZW, trailer
    for (cut <- Seq(4, 12, 300, 700, good.length / 2, good.length - 1))
      assert(statsOf(Seq(good.take(cut))).head == null, s"cut at $cut")
    // bad signature
    val sig = good.clone(); sig(4) = '6'
    assert(statsOf(Seq(sig)).head == null)
    // corrupt LZW: flip bits mid-stream → wrong pixel count or
    // code-beyond-dictionary, both null (never garbage sums)
    val corrupt = good.clone()
    corrupt(good.length - 20) = 0xff.toByte
    corrupt(good.length - 21) = 0xff.toByte
    val st = statsOf(Seq(corrupt)).head
    // either rejected outright, or the flip landed in a comment
    // extension — then sums must still be the true ones
    if (st != null) {
      val (er, eg, eb) = generatorSums(3L, 20, 15)
      assert(st.getLong(4) == er && st.getLong(5) == eg &&
        st.getLong(6) == eb)
    }
    // no color table at all: GCT flag off, frame without local table
    val noCt = good.clone()
    noCt(10) = (noCt(10) & 0x7f).toByte // clear GCT flag — but table
    // bytes still follow, so the walk misparses them as blocks → null
    assert(statsOf(Seq(noCt)).head == null)
    // not a GIF
    assert(statsOf(Seq("plain text".getBytes)).head == null)
    assert(statsOf(Seq(Array.emptyByteArray)).head == null)
  }

  test("interpreted path agrees with codegen") {
    val b = GifFixture.build(11L, 31, 17)
    val direct = GifStats.stats(b)
    val Seq(st) = statsOf(Seq(b))
    assert(direct != null && st != null)
    assert(st.getLong(4) == direct(4) && st.getLong(5) == direct(5) &&
      st.getLong(6) == direct(6) && st.getInt(2) == direct(2).toInt)
  }
}
