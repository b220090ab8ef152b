package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // A REAL, complete 1x1 transparent PNG file (the canonical minimal
  // PNG) — checked-in fixture bytes, not synthesized by the code
  // under test.
  private val png1x1: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8" +
      "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")

  /** Canonical 44-byte WAV header + PCM payload. */
  private def wav(channels: Int, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val blockAlign = channels * 2 // 16-bit
    val dataBytes = nSamples * blockAlign
    val b = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    b.putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    b.array()
  }

  private def decodeOne(blob: Array[Byte]) =
    Seq(Tuple1(blob)).toDF("payload")
      .select(Multimodal.headerDecode(col("payload")).as("m"))
      .select("m.mime", "m.width", "m.height", "m.n_frames",
        "m.sample_rate", "m.channels")
      .collect().head

  test("binaryFile source -> headerDecode: the media ingest path") {
    // SURVEY §7.6: media lands in the lake as raw files; the ingest
    // path is spark.read.format("binaryFile") (path, length, content)
    // -> header decode in the scan stage. Blobs never shuffle.
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("binfiles").toString
    Files.write(Paths.get(dir, "a.png"), png1x1)
    Files.write(Paths.get(dir, "b.wav"), wav(1, 16000, 7))
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{png,wav}").load(dir)
      .select(col("path"), col("length"),
        Multimodal.headerDecode(col("content")).as("m"))
      .select(col("path"), col("m.mime"), col("m.width"),
        col("m.sample_rate"))
      .orderBy(col("path"))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "image/png" && rows(0).getInt(2) == 1)
    assert(rows(1).getString(1) == "audio/wav" && rows(1).getInt(3) == 16000)
  }

  test("binaryFile source -> the full codec family: every format " +
    "decodes from real files on disk") {
    import java.nio.file.{Files, Paths}
    import graft.functions.{BmpFixture, GifFixture, JpegFixture, Mp4Fixture, PngFixture}
    graft.GraftExtensions.ensure(spark)
    val dir = Files.createTempDirectory("media").toString
    Files.write(Paths.get(dir, "a.png"), PngFixture.build(1L, 20, 10))
    Files.write(Paths.get(dir, "b.gif"), GifFixture.build(2L, 16, 12))
    Files.write(Paths.get(dir, "c.jpg"), JpegFixture.build(3L, 24, 16))
    Files.write(Paths.get(dir, "d.bmp"), BmpFixture.build(4L, 9, 7))
    Files.write(Paths.get(dir, "e.mp4"), Mp4Fixture.build(5L, 320, 240, 12))
    val df = spark.read.format("binaryFile").load(dir)
      .select(col("path"),
        call_function("png_stats", col("content")).as("png"),
        call_function("gif_stats", col("content")).as("gif"),
        call_function("jpeg_stats", col("content")).as("jpg"),
        call_function("bmp_stats", col("content")).as("bmp"),
        call_function("mp4_meta", col("content")).as("mp4"))
      .withColumn("fmt", element_at(split(col("path"), "\\."), -1))
      .orderBy(col("path"))
    val byFmt = df.collect().map(r => r.getString(6) -> r).toMap
    // exactly the matching kernel decodes; the other four return null
    assert(byFmt("png").getStruct(1).getInt(0) == 20)
    assert(byFmt("gif").getStruct(2).getInt(0) == 16)
    assert(byFmt("jpg").getStruct(3).getInt(0) == 24)
    assert(byFmt("bmp").getStruct(4).getInt(0) == 9)
    assert(byFmt("mp4").getStruct(5).getInt(4) == 320)
    for ((fmt, r) <- byFmt; i <- 1 to 5) {
      val matches = Map("png" -> 1, "gif" -> 2, "jpg" -> 3,
        "bmp" -> 4, "mp4" -> 5)(fmt)
      if (i != matches) assert(r.isNullAt(i), s"$fmt column $i")
    }
  }

  test("headerDecode parses a real PNG's IHDR width/height") {
    val r = decodeOne(png1x1)
    assert(r.getString(0) == "image/png")
    assert(r.getInt(1) == 1 && r.getInt(2) == 1)
    assert(r.getInt(3) == 1) // single frame
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("headerDecode parses a real WAV's fmt/data chunks") {
    val r = decodeOne(wav(channels = 2, sampleRate = 44100, nSamples = 10))
    assert(r.getString(0) == "audio/wav")
    assert(r.isNullAt(1) && r.isNullAt(2))
    assert(r.getInt(3) == 10) // data bytes / block align
    assert(r.getInt(4) == 44100)
    assert(r.getInt(5) == 2)
  }

  test("headerDecode: mono 8kHz WAV") {
    val r = decodeOne(wav(channels = 1, sampleRate = 8000, nSamples = 123))
    assert(r.getString(0) == "audio/wav" && r.getInt(3) == 123 &&
      r.getInt(4) == 8000 && r.getInt(5) == 1)
  }

  test("headerDecode: unknown bytes → octet-stream, null fields") {
    val r = decodeOne("just some text".getBytes("UTF-8"))
    assert(r.getString(0) == "application/octet-stream")
    (1 to 5).foreach(i => assert(r.isNullAt(i)))
  }

  test("decode routes real media to the parser, unknowns to honest " +
    "null dims; the synthetic generator stays fixture-only") {
    graft.GraftExtensions.ensure(spark)
    val rows = Seq(Tuple1(png1x1), Tuple1("plain text".getBytes("UTF-8")))
      .toDF("payload")
      .select(Multimodal.decode(col("payload")).as("m"))
      .select("m.mime", "m.width").collect()
    assert(rows(0).getString(0) == "image/png" && rows(0).getInt(1) == 1)
    // honest unknown: octet-stream mime, NULL width — dimensions are
    // never invented (the synthetic path is withSyntheticMedia, an
    // explicit fixture harness)
    assert(rows(1).getString(0) == "application/octet-stream" &&
      rows(1).isNullAt(1))
    val synth = Seq(Tuple1("plain text")).toDF("text")
    val sm = Multimodal.withSyntheticMedia(synth, "text")
      .select(col("media.width")).head()
    assert(sm.getInt(0) >= 64) // the generator's 64..639 band
  }

  // ---- real P6 PPM decode ----

  private def ppm(header: String, raster: Array[Byte]): Array[Byte] =
    header.getBytes("US-ASCII") ++ raster

  test("ppmStats parses variable-width headers and sums every channel") {
    // 2x2: pixels (1,2,3)(4,5,6)(7,8,9)(10,11,12)
    val small = ppm("P6\n2 2\n255\n", (1 to 12).map(_.toByte).toArray)
    // 12x3 exercises multi-digit width; bytes j % 251
    val wide = ppm("P6\n12 3\n255\n",
      (0 until 12 * 3 * 3).map(j => (j % 251).toByte).toArray)
    val df = Seq((1L, small), (2L, wide)).toDF("id", "blob")
    val out = df.select($"id", Multimodal.ppmStats($"blob").as("s"))
      .select($"id", $"s.width", $"s.height", $"s.n_pix",
        $"s.r_sum", $"s.g_sum", $"s.b_sum")
      .as[(Long, Int, Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == (1L, 2, 2, 4L, 1L + 4 + 7 + 10, 2L + 5 + 8 + 11,
      3L + 6 + 9 + 12))
    val expect = (c: Int) =>
      (0 until 12 * 3 * 3).filter(_ % 3 == c).map(_ % 251).sum.toLong
    assert(out(2L) == (2L, 12, 3, 36L, expect(0), expect(1), expect(2)))
  }

  test("ppmStats refuses what it cannot decode exactly") {
    val good = ppm("P6\n1 1\n255\n", Array[Byte](9, 9, 9))
    val comment = ppm("P6\n# 4 4\n1 1\n255\n", Array[Byte](9, 9, 9))
    val maxval = ppm("P6\n1 1\n65535\n", Array[Byte](9, 9, 9, 9, 9, 9))
    val truncated = ppm("P6\n2 2\n255\n", Array[Byte](1, 2, 3))
    val notPpm = "P5\n1 1\n255\nx".getBytes("US-ASCII")
    val df = Seq((1L, good), (2L, comment), (3L, maxval),
      (4L, truncated), (5L, notPpm)).toDF("id", "blob")
    val out = df.select($"id", Multimodal.ppmStats($"blob").isNull.as("n"))
      .as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true,
      5L -> true))
  }

  test("sniff: bytes beat labels — a mislabeled extension is " +
    "classified by content, and unknowns get honest byte stats") {
    graft.GraftExtensions.ensure(spark)
    // a file NAMED .png whose bytes are a WAV, and vice versa — the
    // crawl reality sniffing exists for
    val rows = Seq(
      ("img.png", wav(1, 8000, 4)),
      ("clip.wav", png1x1),
      ("notes.txt", "plain ascii text\n".getBytes("US-ASCII")),
      ("blob.bin", Array[Byte](0, 0, 1, 2, 0, 3, 0)))
    val df = rows.toDF("name", "blob")
    val got = df.select($"name", Multimodal.sniff($"blob").as("s"))
      .select($"name", $"s.mime", $"s.n_printable", $"s.n_zero",
        $"s.n_distinct")
      .as[(String, String, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("img.png")._2 == "audio/wav")   // extension lies
    assert(got("clip.wav")._2 == "image/png")  // both directions
    val txt = got("notes.txt")
    assert(txt._2 == "application/octet-stream" && txt._3 == 17L &&
      txt._4 == 0L)
    val bin = got("blob.bin")
    assert(bin._2 == "application/octet-stream" && bin._3 == 0L &&
      bin._4 == 4L && bin._5 == 4)
    // empty blob: zero counts and a NULL ratio (never 0/0 = NaN)
    val empty = Seq(("e", Array.empty[Byte])).toDF("name", "blob")
      .select(Multimodal.sniff($"blob").as("s"))
      .select($"s.n_bytes", $"s.n_distinct", $"s.printable_ratio")
      .head()
    assert(empty.getLong(0) == 0L && empty.getInt(1) == 0 &&
      empty.isNullAt(2))
    // decode routes the same bytes to the REAL kernels: the
    // mislabeled "png" decodes as WAV with true sample math
    val dec = df.filter($"name" === "img.png")
      .select(Multimodal.decode($"blob").as("m"))
      .select($"m.mime", $"m.n_frames").as[(String, Int)].head()
    assert(dec == ("audio/wav", 4))
    // and a true unknown reports NULL dims — never invented ones
    val unk = df.filter($"name" === "blob.bin")
      .select(Multimodal.decode($"blob").as("m"))
      .select($"m.mime", $"m.width".isNull, $"m.n_frames".isNull)
      .as[(String, Boolean, Boolean)].head()
    assert(unk == ("application/octet-stream", true, true))
  }

}
