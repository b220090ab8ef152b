package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the [[Mp4Meta]] box walk.
  *
  *  - Against an INDEPENDENT test-side assembler (ByteBuffer-based,
  *    written to the spec text, sharing no code with [[Mp4Fixture]]):
  *    a minimal golden file, v1 FullBoxes, audio-first track order,
  *    fallback selection for video-less files, size==0 trailing
  *    boxes, unknown-box skipping.
  *  - Fixture↔kernel roundtrip across every id residue class the
  *    fixture branches on (2/3/5/7 moduli), on BOTH eval paths
  *    (direct interpreted call and whole-stage-codegen SQL).
  *  - Reject paths: truncation at every interesting byte, lying
  *    sizes, size < header, stts entry counts past the payload,
  *    box-count bombs, missing moov/mvhd.
  */
class Mp4MetaSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.ensure(spark)

  // ---- independent assembler (deliberately structured differently
  // from Mp4Fixture: flat ByteBuffer writes, sizes patched after) ----

  private def asmBox(typ: String, children: Array[Byte]*): Array[Byte] = {
    val n = 8 + children.map(_.length).sum
    val bb = ByteBuffer.allocate(n)
    bb.putInt(n)
    bb.put(typ.getBytes("US-ASCII"))
    children.foreach(bb.put)
    bb.array()
  }

  private def u32(vs: Long*): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => bb.putInt(v.toInt))
    bb.array()
  }

  private def u16(vs: Int*): Array[Byte] = {
    val bb = ByteBuffer.allocate(2 * vs.length)
    vs.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  private def u64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).putLong(v).array()

  private def zeros(n: Int): Array[Byte] = new Array[Byte](n)

  /** Short-form (parser-minimal) boxes: the walk requires offsets, not
    * full spec lengths, so these stop at the last field it reads. */
  private def asmMvhd0(ts: Long, dur: Long): Array[Byte] =
    asmBox("mvhd", u32(0), u32(0, 0), u32(ts), u32(dur))

  private def asmMvhd1(ts: Long, dur: Long): Array[Byte] =
    asmBox("mvhd", Array[Byte](1, 0, 0, 0), u64(0), u64(0), u32(ts), u64(dur))

  private def asmTkhd0(w: Int, h: Int): Array[Byte] =
    asmBox("tkhd", u32(0), u32(0, 0, 1, 0, 0), zeros(8),
      u16(0, 0, 0, 0), zeros(36), u32(w.toLong << 16), u32(h.toLong << 16))

  private def asmTkhd1(w: Int, h: Int): Array[Byte] =
    asmBox("tkhd", Array[Byte](1, 0, 0, 0), u64(0), u64(0), u32(1, 0),
      u64(0), zeros(8), u16(0, 0, 0, 0), zeros(36),
      u32(w.toLong << 16), u32(h.toLong << 16))

  private def asmHdlr(handler: String): Array[Byte] =
    asmBox("hdlr", u32(0), u32(0), handler.getBytes("US-ASCII"))

  private def asmStsd(codec: String): Array[Byte] =
    asmBox("stsd", u32(0), u32(1),
      asmBox(codec, zeros(8))) // 16-byte stub entry: size+4cc+8 filler

  private def asmStts(runs: (Long, Long)*): Array[Byte] =
    asmBox("stts", u32(0), u32(runs.length.toLong),
      u32(runs.flatMap(r => Seq(r._1, r._2)): _*))

  private def asmTrak(handler: String, codec: String, w: Int, h: Int,
      frames: Seq[(Long, Long)], tkhdV1: Boolean = false): Array[Byte] =
    asmBox("trak",
      if (tkhdV1) asmTkhd1(w, h) else asmTkhd0(w, h),
      asmBox("mdia",
        asmHdlr(handler),
        asmBox("minf", asmBox("stbl", asmStsd(codec), asmStts(frames: _*)))))

  private def asmFtyp(brand: String): Array[Byte] =
    asmBox("ftyp", brand.getBytes("US-ASCII"), u32(512))

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val bb = ByteBuffer.allocate(parts.map(_.length).sum)
    parts.foreach(bb.put)
    bb.array()
  }

  private def rowOf(b: Array[Byte]): Row = {
    val r = Seq(Tuple1(b)).toDF("blob")
      .select(call_function("mp4_meta", $"blob").as("m")).head()
    if (r.isNullAt(0)) null else r.getStruct(0)
  }

  test("golden hand-assembled file: every field") {
    val f = cat(
      asmFtyp("isom"),
      asmBox("moov",
        asmMvhd0(1000L, 5000L),
        asmTrak("vide", "avc1", 320, 240, Seq((3L, 100L), (4L, 100L)))),
      // size==0 mdat: extends to end (must be accepted as last box)
      cat(u32(0), "mdat".getBytes("US-ASCII"), zeros(11)))
    val m = rowOf(f)
    assert(m != null)
    assert(m.getString(0) == "isom")
    assert(m.getInt(1) == 1)       // n_tracks
    assert(m.getInt(2) == 1000)    // timescale
    assert(m.getLong(3) == 5000L)  // duration_ms
    assert(m.getInt(4) == 320 && m.getInt(5) == 240)
    assert(m.getLong(6) == 7L)     // 3 + 4 across two stts runs
    assert(m.getString(7) == "avc1")
  }

  test("v1 mvhd + v1 tkhd offsets") {
    val f = cat(
      asmFtyp("mp42"),
      asmBox("moov",
        asmMvhd1(90000L, 450000L),
        asmTrak("vide", "hvc1", 1920, 1080, Seq((240L, 375L)),
          tkhdV1 = true)))
    val m = rowOf(f)
    assert(m != null)
    assert(m.getString(0) == "mp42")
    assert(m.getInt(2) == 90000)
    assert(m.getLong(3) == 5000L) // 450000/90000 s = 5 s
    assert(m.getInt(4) == 1920 && m.getInt(5) == 1080)
    assert(m.getLong(6) == 240L)
    assert(m.getString(7) == "hvc1")
  }

  test("selects the first VIDEO track, not the first track") {
    val f = cat(asmFtyp("isom"), asmBox("moov",
      asmMvhd0(600L, 1200L),
      asmTrak("soun", "mp4a", 0, 0, Seq((99L, 1024L))),
      asmTrak("vide", "av01", 640, 360, Seq((48L, 25L)))))
    val m = rowOf(f)
    assert(m.getInt(1) == 2)
    assert(m.getInt(4) == 640 && m.getInt(5) == 360)
    assert(m.getLong(6) == 48L)
    assert(m.getString(7) == "av01")
  }

  test("video-less file falls back to the first track; no ftyp → null brand") {
    val f = asmBox("moov",
      asmMvhd0(600L, 600L),
      asmTrak("soun", "mp4a", 0, 0, Seq((99L, 1024L))))
    val m = rowOf(f)
    assert(m != null)
    assert(m.isNullAt(0))          // no ftyp anywhere
    assert(m.getInt(1) == 1)
    assert(m.getLong(6) == 99L)
    assert(m.getString(7) == "mp4a")
  }

  test("unknown boxes are skipped at every level") {
    val f = cat(
      asmBox("skip", zeros(7)),
      asmFtyp("isom"),
      asmBox("uuid", zeros(16)),
      asmBox("moov",
        asmBox("udta", zeros(3)),
        asmMvhd0(1000L, 1000L),
        asmBox("trak",
          asmBox("free"),
          asmTkhd0(64, 32),
          asmBox("mdia",
            asmBox("free", zeros(5)),
            asmHdlr("vide"),
            asmBox("minf",
              asmBox("free"),
              asmBox("stbl", asmStsd("avc1"), asmStts((7L, 1L))))))))
    val m = rowOf(f)
    assert(m != null && m.getInt(4) == 64 && m.getLong(6) == 7L)
  }

  test("reject paths: torn, lying, hostile") {
    val good = cat(asmFtyp("isom"), asmBox("moov",
      asmMvhd0(1000L, 1000L),
      asmTrak("vide", "avc1", 16, 16, Seq((1L, 1L)))))
    assert(rowOf(good) != null)
    // truncation anywhere inside the tree → null, never a crash
    for (cut <- Seq(3, 9, 17, 40, good.length / 2, good.length - 1))
      assert(rowOf(good.take(cut)) == null, s"cut at $cut")
    // no moov
    assert(rowOf(asmFtyp("isom")) == null)
    // moov but no mvhd
    assert(rowOf(cat(asmFtyp("isom"),
      asmBox("moov", asmTrak("vide", "avc1", 16, 16, Seq((1L, 1L)))))) == null)
    // child size overflowing its parent
    val lying = good.clone()
    lying(16 + 3) = 127 // ftyp is 16 bytes; moov size's low byte → huge
    assert(rowOf(lying) == null)
    // size < 8 (and not 0/1)
    val tiny = good.clone()
    tiny(16 + 3) = 5
    assert(rowOf(tiny) == null)
    // stts entry count past the payload
    val f = cat(asmFtyp("isom"), asmBox("moov",
      asmMvhd0(1000L, 1000L),
      asmBox("trak", asmTkhd0(16, 16), asmBox("mdia", asmHdlr("vide"),
        asmBox("minf", asmBox("stbl",
          asmBox("stts", u32(0), u32(1000000L), u32(1L, 1L))))))))
    assert(rowOf(f) == null)
    // box-count bomb: 5000 8-byte boxes
    val bomb = cat((asmFtyp("isom") +:
      (1 to 5000).map(_ => asmBox("free"))): _*)
    assert(rowOf(bomb) == null)
    // empty / sub-minimal
    assert(rowOf(Array.emptyByteArray) == null)
    assert(rowOf(zeros(15)) == null)
  }

  test("fixture roundtrip across all residue classes, codegen ≡ interpreted") {
    // ids cover the 2/3/5/7 branch moduli (incl. 0 and a 210-multiple
    // hitting all special branches at once)
    val ids = (0L to 30L) ++ Seq(209L, 210L, 211L, 419L, 420L, 99999L)
    val rows = ids.map { id =>
      (id, (id % 640 + 16).toInt, ((id * 3) % 480 + 16).toInt,
        (id % 24 + 1).toInt)
    }
    val df = rows.toDF("id", "w", "h", "nf")
      .select($"id", $"w", $"h", $"nf",
        call_function("mp4_meta", call_function("mp4_fixture",
          $"id", $"w", $"h", $"nf")).as("m"))
      .orderBy($"id")
    val got = df.collect()
    got.zip(rows.sortBy(_._1)).foreach { case (r, (id, w, h, nf)) =>
      val m = r.getStruct(4)
      assert(m != null, s"id=$id")
      val ts = 600L + (id % 10L) * 100L
      val delta = 100L + id % 50L
      assert(m.getString(0) == "isom", s"id=$id")
      assert(m.getInt(1) == (1 + id % 2).toInt, s"id=$id n_tracks")
      assert(m.getInt(2) == ts.toInt, s"id=$id ts")
      assert(m.getLong(3) == nf * delta * 1000L / ts, s"id=$id dur")
      assert(m.getInt(4) == w && m.getInt(5) == h, s"id=$id dims")
      assert(m.getLong(6) == nf.toLong, s"id=$id frames")
      assert(m.getString(7) == "avc1", s"id=$id codec")
      // interpreted path must agree with the codegen'd one
      val direct = Mp4Meta.meta(Mp4Fixture.build(id, w, h, nf))
      assert(direct != null && direct.getLong(3) == m.getLong(3) &&
        direct.getInt(4) == m.getInt(4), s"id=$id interpreted≡codegen")
    }
  }

  test("Multimodal.decode routes valid MP4s to the real parser and " +
    "unknowns to the honest sniff branch") {
    val df = Seq(
      (1L, Mp4Fixture.build(5L, 320, 240, 10)),
      (2L, "plain text that is definitely not a box tree".getBytes("UTF-8"))
    ).toDF("id", "payload")
      .select($"id", graft.ops.Multimodal.decode($"payload").as("media"))
      .orderBy($"id")
    val rs = df.collect()
    val mp4 = rs(0).getStruct(1)
    assert(mp4.getString(0) == "video/mp4")
    assert(mp4.getInt(1) == 320 && mp4.getInt(2) == 240)
    assert(mp4.getInt(3) == 10)
    val unk = rs(1).getStruct(1)
    // honest unknown: sniffed mime, NULL dims — never invented
    assert(unk.getString(0) == "application/octet-stream")
    assert(unk.isNullAt(1) && unk.isNullAt(3))
    assert(!rs(1).isNullAt(1))
  }
}
