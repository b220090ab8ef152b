package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[FlacMeta]] and [[Mp3Meta]]. No JDK codec exists for either
  * format, so the pins are: hand-assembled byte cases with offsets
  * computed in the test text (independent of the fixture builders),
  * fixture roundtrips across every branching residue, and reject
  * paths. The bit-packing (FLAC's 20-bit sample rate straddling byte
  * boundaries; MP3's syncsafe ID3 size and table-driven frame
  * lengths) is exactly what these hand cases nail down. */
class AudioMetaSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.ensure(spark)

  private def one(fn: String, b: Array[Byte]): Row = {
    val r = Seq(Tuple1(b)).toDF("blob")
      .select(call_function(fn, $"blob").as("m")).head()
    if (r.isNullAt(0)) null else r.getStruct(0)
  }

  test("FLAC: hand-assembled STREAMINFO — 44.1kHz stereo 16-bit, " +
    "1s of audio") {
    // sr=44100=0x0AC44 (20 bits), ch-1=1 (3 bits), bps-1=15 (5 bits),
    // total=44100 (36 bits). Packed bytes 10..17 of the payload:
    //   sr>>12 = 0x0A; (sr>>4)&0xff = 0xC4;
    //   ((sr&0xF)<<4)|((ch-1)<<1)|((bps-1)>>4) = 0x40|0x02|0x00 = 0x42
    //   (((bps-1)&0xF)<<4)|(total>>32) = 0xF0
    //   total bytes: 0x00 0x00 0xAC 0x44
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes)
    out.write(0x80); out.write(0); out.write(0); out.write(34) // last
    out.write(0x10); out.write(0); out.write(0x10); out.write(0)
    (0 until 6).foreach(_ => out.write(0))
    Seq(0x0a, 0xc4, 0x42, 0xf0, 0x00, 0x00, 0xac, 0x44).foreach(out.write)
    (0 until 16).foreach(_ => out.write(0))
    val m = one("flac_meta", out.toByteArray)
    assert(m != null)
    assert(m.getInt(0) == 44100 && m.getInt(1) == 2 && m.getInt(2) == 16)
    assert(m.getLong(3) == 44100L && m.getLong(4) == 1000L)
    assert(m.getInt(5) == 1)
  }

  test("FLAC fixture roundtrip across residues; frames never read") {
    for (id <- 0L to 25L) {
      val (sr, ch, bps, total) = FlacFixture.params(id)
      val m = one("flac_meta", FlacFixture.build(id))
      assert(m != null, s"id=$id")
      assert(m.getInt(0) == sr && m.getInt(1) == ch &&
        m.getInt(2) == bps, s"id=$id fields")
      assert(m.getLong(3) == total, s"id=$id total")
      assert(m.getLong(4) == total * 1000L / sr, s"id=$id duration")
      assert(m.getInt(5) == 3, s"id=$id blocks")
    }
  }

  test("FLAC reject paths") {
    val good = FlacFixture.build(7L)
    assert(one("flac_meta", good) != null)
    for (cut <- Seq(3, 7, 20, 45))
      assert(one("flac_meta", good.take(cut)) == null, s"cut $cut")
    val sig = good.clone(); sig(0) = 'F'
    assert(one("flac_meta", sig) == null)
    // STREAMINFO not first (type byte patched to PADDING)
    val notFirst = good.clone(); notFirst(4) = 0x01
    assert(one("flac_meta", notFirst) == null)
    // torn follow-on block: declared length overruns
    val torn = good.clone()
    torn(4 + 4 + 34 + 3) = 0x7f.toByte // vorbis block length low byte
    assert(one("flac_meta", torn) == null)
    assert(one("flac_meta", "not flac".getBytes) == null)
  }

  test("MP3: hand-assembled single MPEG1 Layer III frame — 128kbps " +
    "44.1kHz stereo, no ID3") {
    // header FF FB 92 00: sync, v1+L3+no-crc, brIdx=9(128k),
    // srIdx=0(44100), padding=1 → len = 144·128000/44100+1 = 418
    val len = 144 * 128000 / 44100 + 1
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte; b(1) = 0xfb.toByte; b(2) = 0x92.toByte; b(3) = 0
    val m = one("mp3_meta", b)
    assert(m != null)
    assert(m.getInt(0) == 1 && m.getInt(1) == 128 &&
      m.getInt(2) == 44100 && m.getInt(3) == 2)
    assert(m.getLong(4) == 1L)
    assert(m.getLong(5) == 1152L * 1000L / 44100L)
  }

  test("MP3 fixture roundtrip: ID3v2 skip, varying padding, ID3v1 " +
    "trailer, mono/stereo, both MPEG versions") {
    for (id <- 0L to 20L; nf <- Seq(1, 7)) {
      val (v1, br, sr, _, _) = Mp3Fixture.params(id)
      val m = one("mp3_meta", Mp3Fixture.build(id, nf))
      assert(m != null, s"id=$id nf=$nf")
      assert(m.getInt(0) == (if (v1) 1 else 2), s"id=$id version")
      assert(m.getInt(1) == br && m.getInt(2) == sr, s"id=$id tables")
      assert(m.getInt(3) == (if (id % 7 == 0) 1 else 2), s"id=$id ch")
      assert(m.getLong(4) == nf.toLong, s"id=$id frames")
      val spf = if (v1) 1152L else 576L
      assert(m.getLong(5) == spf * nf * 1000L / sr, s"id=$id duration")
    }
  }

  test("MP3 reject paths") {
    val good = Mp3Fixture.build(3L, 5)
    assert(one("mp3_meta", good) != null)
    // truncation mid-frame and mid-ID3
    for (cut <- Seq(5, 50, good.length - 3))
      assert(one("mp3_meta", good.take(cut)) == null, s"cut $cut")
    // garbage between frames (lost sync)
    val junk = good ++ Array[Byte](1, 2, 3)
    assert(one("mp3_meta", junk) == null)
    // free-form bitrate (index 0) rejected
    val free = Mp3Fixture.build(2L, 1)
    // find first frame: after ID3 tag
    val tagSz = ((free(6) & 0x7f) << 21) | ((free(7) & 0x7f) << 14) |
      ((free(8) & 0x7f) << 7) | (free(9) & 0x7f)
    free(10 + tagSz + 2) = (free(10 + tagSz + 2) & 0x0f).toByte
    assert(one("mp3_meta", free) == null)
    assert(one("mp3_meta", "not an mp3".getBytes) == null)
  }
}
