package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL MP4 / ISO-BMFF container metadata — the VIDEO leg of the
  * multimodal path, completing what [[graft.ops.Multimodal]] round 10
  * left as the one remaining synthetic media branch: PNG and WAV
  * already parse for real; video now does too. This is the
  * ffprobe-class metadata walk (ISO/IEC 14496-12's box grammar is a
  * public spec), NOT frame decoding — H.264 entropy decode stays out
  * of scope for a container with no codec libraries, exactly like the
  * JPEG DCT path. What a 100 TB curation pipeline actually needs from
  * video blobs at the SQL layer is this: dimensions, duration, frame
  * counts, codec ids — the group-by/filter columns.
  *
  * `mp4_meta(blob)` walks the box tree: `ftyp` (major brand), `moov`
  * → `mvhd` (timescale, duration; FullBox versions 0 AND 1) → each
  * `trak` → `tkhd` (16.16 fixed-point width/height; v0 and v1) +
  * `mdia/hdlr` (handler fourcc) + `mdia/minf/stbl/stsd` (first
  * sample-entry fourcc = codec) + `stbl/stts` (Σ sample_count =
  * frame count). The reported width/height/codec/n_frames come from
  * the first VIDEO (`hdlr` = 'vide') track, falling back to the
  * first track for video-less files; n_tracks counts all traks.
  *
  * Box grammar handled in full: 32-bit sizes, `size == 1` + 64-bit
  * largesize, `size == 0` box-extends-to-end (top level only, as the
  * spec restricts), unknown boxes skipped by size. NULL for: no box
  * structure, torn/overflowing sizes, size < header, missing `moov`
  * or `mvhd`, or hostile inputs (nesting > 8, > 4096 boxes — real
  * metadata trees are tens of boxes; a size-loop bomb is not).
  *
  * Returns `struct(brand, n_tracks, timescale, duration_ms, width,
  * height, n_frames, codec)`; `duration_ms` is
  * `duration * 1000 / timescale` in exact long arithmetic (the
  * oracle reproduces the same integer division). Field-level nulls:
  * brand when no `ftyp`, width/height/codec/n_frames when the file
  * has no tracks.
  *
  * Scale shape: one fused O(boxes) dispatch per blob inside the scan
  * projection — the raster/mdat payload is SKIPPED by size, never
  * touched, so cost is metadata-proportional; blobs never shuffle
  * (the Multimodal contract).
  */
case class Mp4Meta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Mp4Meta.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"mp4_meta expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any =
    Mp4Meta.meta(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.Mp4Meta.meta($b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
    copy(child = newChild)
}

object Mp4Meta {

  val schema: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", LongType),
    StructField("codec", StringType)))

  private final val MaxBoxes = 4096
  private final val MaxDepth = 8

  @inline private def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  @inline private def beU64(b: Array[Byte], off: Int): Long =
    (beU32(b, off) << 32) | beU32(b, off + 4)

  @inline private def fourcc(b: Array[Byte], off: Int): Int =
    (((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff))

  private final val FTYP = cc("ftyp"); private final val MOOV = cc("moov")
  private final val MVHD = cc("mvhd"); private final val TRAK = cc("trak")
  private final val TKHD = cc("tkhd"); private final val MDIA = cc("mdia")
  private final val HDLR = cc("hdlr"); private final val MINF = cc("minf")
  private final val STBL = cc("stbl"); private final val STSD = cc("stsd")
  private final val STTS = cc("stts"); private final val VIDE = cc("vide")

  private def cc(s: String): Int =
    ((s.charAt(0) << 24) | (s.charAt(1) << 16) |
      (s.charAt(2) << 8) | s.charAt(3))

  private def ccStr(v: Int): UTF8String = {
    val a = new Array[Byte](4)
    a(0) = ((v >>> 24) & 0xff).toByte; a(1) = ((v >>> 16) & 0xff).toByte
    a(2) = ((v >>> 8) & 0xff).toByte; a(3) = (v & 0xff).toByte
    UTF8String.fromBytes(a)
  }

  /** Per-parse mutable state: one instance per `meta` call (the
    * expression is evaluated per row; no shared state escapes). */
  private final class Walk(b: Array[Byte]) {
    var boxes = 0
    var bad = false
    // mvhd
    var sawMvhd = false
    var timescale = 0L
    var duration = 0L
    // ftyp
    var brand = -1
    // per-file track tally + selected (first video, else first) track
    var nTracks = 0
    var selIsVideo = false
    var selSet = false
    var selW = -1L; var selH = -1L
    var selCodec = -1
    var selFrames = -1L

    // current-trak scratch, committed at trak end
    private var tW = -1L; private var tH = -1L
    private var tHandler = -1
    private var tCodec = -1
    private var tFrames = -1L

    /** Walk children of [from, to); `depth` 0 = file level. Returns
      * false on malformed structure (poisons the parse). */
    def walk(from: Int, to: Int, depth: Int, inTrak: Boolean): Boolean = {
      if (depth > MaxDepth) { bad = true; return false }
      var at = from
      while (at < to && !bad) {
        boxes += 1
        if (boxes > MaxBoxes) { bad = true; return false }
        if (at + 8 > to) { bad = true; return false } // torn header
        val size32 = beU32(b, at)
        var header = 8
        var sz: Long = size32
        if (size32 == 0L) {
          // box extends to end of enclosing scope (top level per spec;
          // accept anywhere — it must still be the LAST box)
          sz = (to - at).toLong
        } else if (size32 == 1L) {
          if (at + 16 > to) { bad = true; return false }
          sz = beU64(b, at + 8)
          header = 16
        }
        if (sz < header || at + sz > to) { bad = true; return false }
        val typ = fourcc(b, at + 4)
        val pOff = at + header           // payload start
        val pEnd = at + sz.toInt         // payload end (sz ≤ to ≤ Int range)
        typ match {
          case FTYP if depth == 0 =>
            if (pEnd - pOff >= 4 && brand == -1) brand = fourcc(b, pOff)
          case MOOV if depth == 0 =>
            if (!walk(pOff, pEnd, depth + 1, inTrak = false)) return false
          case MVHD =>
            if (!readMvhd(pOff, pEnd)) { bad = true; return false }
          case TRAK =>
            tW = -1L; tH = -1L; tHandler = -1; tCodec = -1; tFrames = -1L
            if (!walk(pOff, pEnd, depth + 1, inTrak = true)) return false
            commitTrak()
          case MDIA | MINF | STBL if inTrak =>
            if (!walk(pOff, pEnd, depth + 1, inTrak = true)) return false
          case TKHD if inTrak =>
            if (!readTkhd(pOff, pEnd)) { bad = true; return false }
          case HDLR if inTrak =>
            if (pEnd - pOff >= 12 && tHandler == -1)
              tHandler = fourcc(b, pOff + 8)
          case STSD if inTrak =>
            // version/flags(4) entry_count(4) then first entry box
            if (pEnd - pOff >= 16 && beU32(b, pOff + 4) >= 1L &&
              tCodec == -1)
              tCodec = fourcc(b, pOff + 12)
          case STTS if inTrak =>
            if (!readStts(pOff, pEnd)) { bad = true; return false }
          case _ => () // unknown / payload box: skip by size
        }
        at = pEnd
      }
      if (at != to) { bad = true; return false } // last box overflowed
      true
    }

    private def readMvhd(p: Int, end: Int): Boolean = {
      if (end - p < 4) return false
      val v = b(p) & 0xff
      if (v == 0) {
        if (end - p < 20) return false
        timescale = beU32(b, p + 12)
        duration = beU32(b, p + 16)
      } else if (v == 1) {
        if (end - p < 32) return false
        timescale = beU32(b, p + 20)
        duration = beU64(b, p + 24)
      } else return false
      sawMvhd = true
      true
    }

    private def readTkhd(p: Int, end: Int): Boolean = {
      if (end - p < 4) return false
      val v = b(p) & 0xff
      val (wOff, hOff) =
        if (v == 0) (76, 80)
        else if (v == 1) (88, 92)
        else return false
      if (end - p < hOff + 4) return false
      // 16.16 fixed point → integer part
      tW = beU32(b, p + wOff) >>> 16
      tH = beU32(b, p + hOff) >>> 16
      true
    }

    private def readStts(p: Int, end: Int): Boolean = {
      if (end - p < 8) return false
      val n = beU32(b, p + 4)
      if (n > ((end - p - 8) / 8).toLong) return false // lies about entries
      var i = 0L
      var total = 0L
      while (i < n) {
        total += beU32(b, p + 8 + (i * 8).toInt)
        i += 1L
      }
      tFrames = total
      true
    }

    private def commitTrak(): Unit = {
      nTracks += 1
      val isVideo = tHandler == VIDE
      // first video track wins; before any video track, first track
      if (!selSet || (isVideo && !selIsVideo)) {
        selSet = true
        selIsVideo = isVideo
        selW = tW; selH = tH
        selCodec = tCodec
        selFrames = tFrames
      }
    }
  }

  /** Parse, or null for every reject case in the class doc. */
  def meta(b: Array[Byte]): GenericInternalRow = {
    if (b == null || b.length < 16) return null
    val w = new Walk(b)
    if (!w.walk(0, b.length, 0, inTrak = false) || w.bad) return null
    if (!w.sawMvhd || w.timescale <= 0L) return null
    val durMs = w.duration * 1000L / w.timescale
    new GenericInternalRow(Array[Any](
      if (w.brand == -1) null else ccStr(w.brand),
      w.nTracks,
      w.timescale.toInt,
      durMs,
      if (w.selW < 0L) null else w.selW.toInt,
      if (w.selH < 0L) null else w.selH.toInt,
      if (w.selFrames < 0L) null else w.selFrames,
      if (w.selCodec == -1) null else ccStr(w.selCodec)))
  }
}

/** Deterministic MP4 fixture builder — `mp4_fixture(id, w, h,
  * n_frames)`: a REAL spec-compliant ISO-BMFF file over doc_id
  * arithmetic (the [[PngFixture]] pattern; DEFLATE-free, but the box
  * tree is genuinely nested and size-chained, so the parser must do
  * real size math to find anything):
  *
  *  - `ftyp` (isom, two compatible brands)
  *  - `moov` with a `free` box FIRST (unknown-skip exercise), `mvhd`
  *    — version 1 when id % 5 == 0, else version 0 — and one or two
  *    `trak`s: an AUDIO trak (mp4a, hdlr 'soun') placed BEFORE the
  *    video trak when id % 2 == 1, so the parser proves it selects
  *    by handler, not position
  *  - the video trak: `tkhd` (version 1 when id % 7 == 0) carrying
  *    the 16.16 dims, `hdlr` 'vide', full `minf/stbl` with an
  *    86-byte avc1 VisualSampleEntry in `stsd` and the frame count
  *    split across TWO `stts` runs (summation exercise)
  *  - `mdat` in the 64-bit-largesize form when id % 3 == 0
  *
  * Derived values (the gate oracle recomputes these from doc_id):
  * timescale = 600 + (id%10)·100, frame delta = 100 + id%50,
  * duration = n_frames·delta, n_tracks = 1 + id%2, brand isom,
  * codec avc1. */
case class Mp4Fixture(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (LongType, IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"mp4_fixture expects (bigint, int, int, int) args, got $t")
    }

  override def nullSafeEval(id: Any, w: Any, h: Any, nf: Any): Any =
    Mp4Fixture.build(id.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int], nf.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, w, h, nf) => {
      s"""
         |${ev.value} = graft.functions.Mp4Fixture.build($id, $w, $h, $nf);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Mp4Fixture = copy(f, s, t, q)
}

object Mp4Fixture {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)

  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val n = payload.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(8 + n)
    out.write(be32(8L + n), 0, 4)
    out.write(typ.getBytes("US-ASCII"), 0, 4)
    payload.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  private def fullBox(typ: String, version: Int,
      payload: Array[Byte]*): Array[Byte] =
    box(typ, (Array[Byte](version.toByte, 0, 0, 0) +: payload): _*)

  /** FullBox with explicit 24-bit flags (url/vmhd set flag bits). */
  private def fullBoxF(typ: String, version: Int, flags: Int,
      payload: Array[Byte]*): Array[Byte] =
    box(typ, (Array[Byte](version.toByte, ((flags >>> 16) & 0xff).toByte,
      ((flags >>> 8) & 0xff).toByte, (flags & 0xff).toByte) +: payload): _*)

  /** Build the fixture; null for out-of-contract dims/frames (the
    * fixture materializes nothing data-proportional, the bounds just
    * keep 16.16 fixed-point and stts arithmetic honest). */
  def build(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || w > 65535 || h > 65535 ||
      nFrames <= 0 || nFrames > 1000000) return null
    val ts = 600L + java.lang.Math.floorMod(id, 10L) * 100L
    val delta = 100L + java.lang.Math.floorMod(id, 50L)
    val dur = nFrames * delta

    val mvhd =
      if (java.lang.Math.floorMod(id, 5L) == 0L)
        fullBox("mvhd", 1, be64(0), be64(0), be32(ts), be64(dur),
          be32(0x00010000L), be16(0x0100), be16(0),
          be32(0), be32(0), matrix, new Array[Byte](24), be32(3))
      else
        fullBox("mvhd", 0, be32(0), be32(0), be32(ts), be32(dur),
          be32(0x00010000L), be16(0x0100), be16(0),
          be32(0), be32(0), matrix, new Array[Byte](24), be32(3))

    def tkhd(trackId: Int, tw: Int, th: Int): Array[Byte] =
      if (java.lang.Math.floorMod(id, 7L) == 0L)
        fullBox("tkhd", 1, be64(0), be64(0), be32(trackId), be32(0),
          be64(dur), new Array[Byte](8), be16(0), be16(0),
          be16(if (tw == 0) 0x0100 else 0), be16(0), matrix,
          be32(tw.toLong << 16), be32(th.toLong << 16))
      else
        fullBox("tkhd", 0, be32(0), be32(0), be32(trackId), be32(0),
          be32(dur), new Array[Byte](8), be16(0), be16(0),
          be16(if (tw == 0) 0x0100 else 0), be16(0), matrix,
          be32(tw.toLong << 16), be32(th.toLong << 16))

    def mdhd(scale: Long, d: Long): Array[Byte] =
      fullBox("mdhd", 0, be32(0), be32(0), be32(scale), be32(d),
        be16(0x55c4), be16(0)) // und language, pre_defined

    def hdlr(handler: String): Array[Byte] =
      fullBox("hdlr", 0, be32(0), handler.getBytes("US-ASCII"),
        new Array[Byte](12), "graft\u0000".getBytes("US-ASCII"))

    val dinf = box("dinf",
      fullBox("dref", 0, be32(1),
        fullBoxF("url ", 0, 1))) // flags=1: media is self-contained

    // 86-byte VisualSampleEntry (ISO 14496-12 §12.1.3): avc1 shell
    val avc1 = box("avc1",
      new Array[Byte](6), be16(1),            // reserved, data_ref_idx
      be16(0), be16(0), be32(0), be32(0), be32(0), // pre_defined/reserved
      be16(w), be16(h),                        // width, height
      be32(0x00480000L), be32(0x00480000L),    // 72 dpi h/v
      be32(0),                                 // reserved
      be16(1),                                 // frame_count
      new Array[Byte](32),                     // compressorname
      be16(24), be16(0xffff))                  // depth, pre_defined = -1
    // 36-byte AudioSampleEntry: mp4a shell
    val mp4a = box("mp4a",
      new Array[Byte](6), be16(1),
      new Array[Byte](8), be16(2), be16(16), be16(0), be16(0),
      be32(8000L << 16))

    // frame count split across two stts runs when possible
    val n1 = nFrames / 2
    val stts =
      if (n1 >= 1 && nFrames - n1 >= 1)
        fullBox("stts", 0, be32(2), be32(n1), be32(delta),
          be32(nFrames - n1), be32(delta))
      else
        fullBox("stts", 0, be32(1), be32(nFrames), be32(delta))

    def stblOf(entry: Array[Byte], sttsBox: Array[Byte]): Array[Byte] =
      box("stbl",
        fullBox("stsd", 0, be32(1), entry),
        sttsBox,
        fullBox("stsc", 0, be32(0)),
        fullBox("stsz", 0, be32(0), be32(0)),
        fullBox("stco", 0, be32(0)))

    val videoTrak = box("trak",
      tkhd(1, w, h),
      box("mdia",
        mdhd(ts, dur),
        hdlr("vide"),
        box("minf",
          fullBoxF("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0)),
          dinf,
          stblOf(avc1, stts))))

    val audioTrak = box("trak",
      tkhd(2, 0, 0),
      box("mdia",
        mdhd(8000L, dur * 8000L / ts),
        hdlr("soun"),
        box("minf",
          fullBox("smhd", 0, be16(0), be16(0)),
          dinf,
          stblOf(mp4a, fullBox("stts", 0, be32(1), be32(nFrames),
            be32(1024))))))

    val traks: Seq[Array[Byte]] =
      if (java.lang.Math.floorMod(id, 2L) == 1L) Seq(audioTrak, videoTrak)
      else Seq(videoTrak)

    val moov = box("moov",
      (box("free", "skip me".getBytes("US-ASCII")) +: mvhd +: traks): _*)

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(512),
      "isom".getBytes("US-ASCII"), "mp42".getBytes("US-ASCII"))

    val mdatPayload = be64(id) // 8 arbitrary payload bytes
    val mdat =
      if (java.lang.Math.floorMod(id, 3L) == 0L) {
        // 64-bit largesize form: size=1, type, largesize, payload
        val out = new java.io.ByteArrayOutputStream(16 + mdatPayload.length)
        out.write(be32(1), 0, 4)
        out.write("mdat".getBytes("US-ASCII"), 0, 4)
        out.write(be64(16L + mdatPayload.length), 0, 8)
        out.write(mdatPayload, 0, mdatPayload.length)
        out.toByteArray
      } else box("mdat", mdatPayload)

    val out = new java.io.ByteArrayOutputStream(
      ftyp.length + moov.length + mdat.length)
    out.write(ftyp, 0, ftyp.length)
    out.write(moov, 0, moov.length)
    out.write(mdat, 0, mdat.length)
    out.toByteArray
  }

  /** Identity transform matrix (9 × 32-bit fixed). */
  private val matrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)
}
