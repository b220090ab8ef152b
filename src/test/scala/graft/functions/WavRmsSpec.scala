package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WavRmsSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical 44-byte WAV header + 16-bit LE PCM samples. */
  private def wav(samples: Seq[Short], channels: Int = 1,
      sampleRate: Int = 8000): Array[Byte] = {
    val dataBytes = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataBytes)
    buf.put("WAVE".getBytes); buf.put("fmt ".getBytes)
    buf.putInt(16); buf.putShort(1) // PCM
    buf.putShort(channels.toShort); buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2)
    buf.putShort((channels * 2).toShort); buf.putShort(16)
    buf.put("data".getBytes); buf.putInt(dataBytes)
    samples.foreach(buf.putShort)
    buf.array()
  }

  private def rmsOf(blobs: Seq[Array[Byte]]): Seq[Option[Double]] =
    blobs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "blob")
      .select($"i", call_function("wav_rms", $"blob").as("r"))
      .orderBy($"i").select($"r").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  test("constant-amplitude PCM gives RMS = A/32768 exactly") {
    val a: Short = 16384
    val Seq(r) = rmsOf(Seq(wav(Seq.fill(100)(a))))
    assert(math.abs(r.get - 0.5) < 1e-12)
  }

  test("alternating +A/-A has the same RMS as constant A") {
    val s = (0 until 100).map(i => if (i % 2 == 0) 8192 else -8192)
      .map(_.toShort)
    val Seq(r) = rmsOf(Seq(wav(s)))
    assert(math.abs(r.get - 0.25) < 1e-12)
  }

  test("silence is 0; empty data chunk is 0; non-WAV is null") {
    val Seq(sil, empty, notWav) = rmsOf(Seq(
      wav(Seq.fill(10)(0.toShort)),
      wav(Seq.empty),
      "not a wav at all, just bytes".getBytes))
    assert(sil.contains(0.0) && empty.contains(0.0) && notWav.isEmpty)
  }

  test("truncated payload clamps to present samples (no over-read)") {
    val full = wav(Seq.fill(100)(16384.toShort))
    val truncated = full.take(44 + 10) // 5 whole samples
    val Seq(r) = rmsOf(Seq(truncated))
    assert(math.abs(r.get - 0.5) < 1e-12)
  }

  test("non-canonical layouts are null, not garbage") {
    val base = wav(Seq.fill(20)(16384.toShort))
    // 18-byte fmt chunk (WAVE_FORMAT_EXTENSIBLE-ish): data id shifts
    val fmt18 = base.clone(); fmt18(16) = 18
    // non-PCM audio format (3 = IEEE float)
    val floatFmt = base.clone(); floatFmt(20) = 3
    // a LIST chunk where 'data' should be
    val listChunk = base.clone()
    listChunk(36) = 'L'; listChunk(37) = 'I'; listChunk(38) = 'S'
    listChunk(39) = 'T'
    val Seq(a, b, c) = rmsOf(Seq(fmt18, floatFmt, listChunk))
    assert(a.isEmpty && b.isEmpty && c.isEmpty,
      s"non-canonical WAVs must be null: $a $b $c")
  }

  test("interpreted path agrees with codegen") {
    val b = wav((1 to 50).map(i => (i * 300).toShort))
    val expected = WavRms.rms(b)
    val Seq(r) = rmsOf(Seq(b))
    assert(r.get == expected)
  }

  /** G.711 WAV: 18-byte fmt (cbSize=0) + a `fact` chunk before
    * `data` — the layout real telephony encoders write. */
  private def g711Wav(fmtCode: Int, samples: Array[Byte]): Array[Byte] = {
    val n = samples.length
    val buf = ByteBuffer.allocate(12 + 26 + 12 + 8 + n)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(4 + 26 + 12 + 8 + n)
    buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(18)
    buf.putShort(fmtCode.toShort); buf.putShort(1) // mono
    buf.putInt(8000); buf.putInt(8000)
    buf.putShort(1); buf.putShort(8); buf.putShort(0) // cbSize
    buf.put("fact".getBytes); buf.putInt(4); buf.putInt(n)
    buf.put("data".getBytes); buf.putInt(n)
    buf.put(samples)
    buf.array()
  }

  test("G.711 decode tables match the JDK's independent javax.sound " +
    "codecs over all 256 byte values") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    def jdkDecode(enc: AudioFormat.Encoding, v: Int): Short = {
      val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
      val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false) // 16-bit LE
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(Array(v.toByte)), src, 1)
      val out = AudioSystem.getAudioInputStream(dst, in)
      val two = out.readAllBytes()
      assert(two.length == 2)
      (((two(0) & 0xff) | (two(1) << 8)).toShort)
    }
    for (v <- 0 until 256) {
      assert(WavRms.UlawTable(v) ==
        jdkDecode(AudioFormat.Encoding.ULAW, v), s"ulaw($v)")
      assert(WavRms.AlawTable(v) ==
        jdkDecode(AudioFormat.Encoding.ALAW, v), s"alaw($v)")
    }
  }

  test("constant-byte G.711 gives RMS = |decoded|/32768 exactly, " +
    "through the fact-chunk + 18-byte-fmt walk") {
    for ((fmtCode, table) <- Seq((7, WavRms.UlawTable),
        (6, WavRms.AlawTable)); v <- Seq(0, 1, 42, 127, 128, 200, 255)) {
      val b = g711Wav(fmtCode, Array.fill(64)(v.toByte))
      val Seq(r) = rmsOf(Seq(b))
      assert(r.isDefined, s"fmt=$fmtCode v=$v must parse")
      assert(r.get == math.abs(table(v).toInt) / 32768.0,
        s"fmt=$fmtCode v=$v")
    }
  }

  test("randomized G.711 payload: kernel RMS equals a naive " +
    "table-decode fold") {
    val rnd = new scala.util.Random(11)
    for (fmtCode <- Seq(6, 7)) {
      val samples = Array.fill(777)(rnd.nextInt(256).toByte)
      val table = if (fmtCode == 6) WavRms.AlawTable else WavRms.UlawTable
      val expected = math.sqrt(samples.map { s =>
        val x = table(s & 0xff) / 32768.0; x * x
      }.sum / samples.length)
      val Seq(r) = rmsOf(Seq(g711Wav(fmtCode, samples)))
      assert(r.get == expected, s"fmt=$fmtCode")
    }
  }

  test("chunk walk: PCM behind LIST/fact chunks now parses; odd-size " +
    "chunks advance word-aligned; G.711 with wrong bit width is null") {
    // PCM file with a 7-byte LIST chunk (odd size → pad byte) between
    // fmt and data
    val pcm = wav(Seq.fill(10)(16384.toShort))
    val buf = ByteBuffer.allocate(pcm.length + 8 + 7 + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(pcm, 0, 36) // RIFF..WAVE + fmt chunk
    buf.put("LIST".getBytes); buf.putInt(7)
    buf.put("INFOxyz".getBytes); buf.put(0.toByte) // word-align pad
    buf.put(pcm, 36, pcm.length - 36) // data chunk
    val shifted = buf.array()
    // G.711 claiming 16 bits per sample: malformed → null
    val bad = g711Wav(7, Array.fill(8)(5.toByte))
    bad(34) = 16
    val Seq(a, b) = rmsOf(Seq(shifted, bad))
    assert(a.contains(0.5), s"LIST-shifted PCM must parse: $a")
    assert(b.isEmpty, "g711 with 16 bits must be null")
  }
}
