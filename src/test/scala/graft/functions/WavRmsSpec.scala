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
}
