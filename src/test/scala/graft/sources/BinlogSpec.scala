package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.ChangeEvent
import graft.sources.Binlog.{Type => T}

/** Test-side binlog v4 ENCODER + decoder spec.
  *
  * The encoder below is written from the same public format document
  * as the decoder but lives only in tests; to guard against a
  * *symmetrically* misread spec, the suite anchors on golden byte
  * fixtures whose expected values come from the MySQL internals
  * manual itself (the packed-decimal worked example) and on
  * hand-assembled hex for framing/bitmap order.
  */
object BinlogWriter {
  final class Buf {
    val b = new ArrayBuffer[Byte]()
    def u8(v: Int): Buf = { b += (v & 0xff).toByte; this }
    def u16(v: Int): Buf = { u8(v); u8(v >> 8) }
    def u24(v: Int): Buf = { u8(v); u8(v >> 8); u8(v >> 16) }
    def u32(v: Long): Buf = { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
    def u48(v: Long): Buf = { u32(v); u16((v >> 32).toInt) }
    def u64(v: Long): Buf = { u32(v); u32(v >> 32) }
    def be(v: Long, n: Int): Buf = { var i = n - 1; while (i >= 0) { u8((v >> (8 * i)).toInt); i -= 1 }; this }
    def raw(a: Array[Byte]): Buf = { b ++= a; this }
    def lenenc(v: Long): Buf =
      if (v < 0xfb) u8(v.toInt)
      else if (v <= 0xffff) { u8(0xfc); u16(v.toInt) }
      else if (v <= 0xffffff) { u8(0xfd); u24(v.toInt) }
      else { u8(0xfe); u64(v) }
    def bitmap(bits: Seq[Boolean]): Buf = {
      val bytes = new Array[Byte]((bits.length + 7) / 8)
      bits.zipWithIndex.foreach { case (set, i) =>
        if (set) bytes(i / 8) = (bytes(i / 8) | (1 << (i % 8))).toByte
      }
      raw(bytes)
    }
    def result: Array[Byte] = b.toArray
  }

  private val dig2bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)

  /** NEWDECIMAL encode (sign-flipped BE base-10^9 groups). */
  def decimal(s: String, precision: Int, scale: Int): Array[Byte] = {
    val neg = s.startsWith("-")
    val abs = if (neg) s.substring(1) else s
    val (ip, fp0) = abs.span(_ != '.')
    val fp = fp0.stripPrefix(".").padTo(scale, '0')
    require(fp.length == scale, s"scale mismatch: $s vs $scale")
    val intg = precision - scale
    val ipPad = ("0" * (intg - ip.length)) + ip
    val intg0 = intg / 9; val intgx = intg - intg0 * 9
    val frac0 = scale / 9; val fracx = scale - frac0 * 9
    val out = new Buf
    var p = 0
    if (intgx > 0) { out.be(ipPad.substring(0, intgx).toLong, dig2bytes(intgx)); p = intgx }
    (0 until intg0).foreach { i => out.be(ipPad.substring(p + i * 9, p + i * 9 + 9).toLong, 4) }
    (0 until frac0).foreach { i => out.be(fp.substring(i * 9, i * 9 + 9).toLong, 4) }
    if (fracx > 0) out.be(fp.substring(frac0 * 9).toLong, dig2bytes(fracx))
    val a = out.result
    a(0) = (a(0) ^ 0x80).toByte // sign bit: 1 = positive
    if (neg) a.indices.foreach(i => a(i) = (~a(i)).toByte)
    a
  }

  def datetime2(year: Int, month: Int, day: Int, h: Int, m: Int, s: Int): Array[Byte] = {
    val ym = year * 13 + month
    val v = (1L << 39) | (ym.toLong << 22) | (day.toLong << 17) | (h.toLong << 12) | (m.toLong << 6) | s
    new Buf().be(v, 5).result
  }

  sealed trait Val
  case object Null extends Val
  final case class V(bytes: Array[Byte]) extends Val
  def v(b: Buf): V = V(b.result)

  final case class Col(typ: Int, meta: Int, nullable: Boolean = true)

  /** Assemble a whole binlog file from (type, body) event payloads.
    * `legacyFde` = a 5.1–5.5-style FDE: NO checksum-alg byte at all
    * (it appeared in 5.6.1), post-header entries deliberately
    * nonzero so positional alg-byte sniffing would misread them. */
  def file(events: Seq[(Int, Array[Byte])], crc: Boolean = true,
      serverVersion: String = "8.0.36-graft",
      legacyFde: Boolean = false): Array[Byte] = {
    require(!(legacyFde && crc), "pre-5.6 servers cannot write CRCs")
    val out = new ArrayBuffer[Byte]()
    out ++= Binlog.Magic
    var pos = 4L
    def emit(typ: Int, body: Array[Byte], ts: Long = 1700000000L): Unit = {
      val size = 19 + body.length + (if (crc) 4 else 0)
      pos += size
      val h = new Buf().u32(ts).u8(typ).u32(1).u32(size).u32(pos).u16(0)
      val frame = h.result ++ body
      out ++= frame
      if (crc) {
        val c = new CRC32; c.update(frame, 0, frame.length)
        out ++= new Buf().u32(c.getValue).result
      }
    }
    // FORMAT_DESCRIPTION first: version 4, padded server version,
    // create ts, header len 19, post-header-len array (39 entries),
    // checksum algorithm byte (modern servers only).
    val sv = serverVersion.getBytes(UTF_8).padTo(50, 0.toByte)
    val fde = new Buf().u16(4).raw(sv).u32(1700000000L).u8(19)
    (1 to 39).foreach(i => fde.u8(if (legacyFde) 1 else 0))
    if (!legacyFde) fde.u8(if (crc) 1 else 0)
    emit(Binlog.FormatDescriptionEvent, fde.result)
    events.foreach { case (t, b) => emit(t, b) }
    out.toArray
  }

  def tableMap(tableId: Long, db: String, table: String, cols: Seq[Col],
      unsignedNumeric: Seq[Boolean] = Nil, names: Seq[String] = Nil,
      junkTlv: Boolean = false): Array[Byte] = {
    val b = new Buf().u48(tableId).u16(1)
    b.u8(db.length).raw(db.getBytes(UTF_8)).u8(0)
    b.u8(table.length).raw(table.getBytes(UTF_8)).u8(0)
    b.lenenc(cols.length)
    cols.foreach(c => b.u8(c.typ))
    val meta = new Buf
    cols.foreach { c =>
      c.typ match {
        case T.Float | T.Double | T.Blob | T.Json => meta.u8(c.meta)
        case T.Varchar | T.VarString => meta.u16(c.meta)
        case T.String | T.Enum | T.Set | T.Bit | T.NewDecimal =>
          meta.u8((c.meta >> 8) & 0xff).u8(c.meta & 0xff)
        case T.Timestamp2 | T.Datetime2 | T.Time2 => meta.u8(c.meta)
        case _ => ()
      }
    }
    val mb = meta.result
    b.lenenc(mb.length).raw(mb)
    b.bitmap(cols.map(_.nullable))
    // optional metadata TLVs (binlog_row_metadata)
    if (junkTlv) { b.u8(99).lenenc(3).raw(Array[Byte](9, 9, 9)) }
    if (unsignedNumeric.nonEmpty) {
      val bytes = new Array[Byte]((unsignedNumeric.length + 7) / 8)
      unsignedNumeric.zipWithIndex.foreach { case (set, i) =>
        if (set) bytes(i / 8) = (bytes(i / 8) | (0x80 >> (i % 8))).toByte
      }
      b.u8(1).lenenc(bytes.length).raw(bytes)
    }
    if (names.nonEmpty) {
      val payload = new Buf
      names.foreach { n =>
        val nb = n.getBytes(UTF_8); payload.lenenc(nb.length).raw(nb)
      }
      val pb = payload.result
      b.u8(4).lenenc(pb.length).raw(pb)
    }
    b.result
  }

  def rows(eventType: Int, tableId: Long, nCols: Int,
      images: Seq[Seq[Val]]): Array[Byte] = {
    val b = new Buf().u48(tableId).u16(0)
    if (eventType >= Binlog.WriteRowsV2)
      b.u16(2) // v2 extra-data: just its own length field
    b.lenenc(nCols)
    b.bitmap(Seq.fill(nCols)(true))
    if (eventType == Binlog.UpdateRowsV2 || eventType == Binlog.UpdateRowsV1)
      b.bitmap(Seq.fill(nCols)(true))
    images.foreach { img =>
      b.bitmap(img.map(_ == Null))
      img.foreach { case V(bytes) => b.raw(bytes); case Null => () }
    }
    b.result
  }

  def gtid(sid: Array[Byte], gno: Long): Array[Byte] =
    new Buf().u8(0).raw(sid).u64(gno).result

  def previousGtids(sets: Seq[(Array[Byte], Seq[(Long, Long)])]): Array[Byte] = {
    val b = new Buf().u64(sets.length)
    sets.foreach { case (sid, ivs) =>
      b.raw(sid).u64(ivs.length)
      ivs.foreach { case (start, stopEx) => b.u64(start).u64(stopEx) }
    }
    b.result
  }

  def query(db: String, sql: String): Array[Byte] =
    new Buf().u32(7).u32(0).u8(db.length).u16(0).u16(0)
      .raw(db.getBytes(UTF_8)).u8(0).raw(sql.getBytes(UTF_8)).result

  def xid(id: Long): Array[Byte] = new Buf().u64(id).result

  /** Inner-event byte stream for a TRANSACTION_PAYLOAD: 19-byte
    * headers, payload-relative next_pos, NO checksums — matching how
    * the server writes the wrapped events. */
  def innerStream(events: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    var pos = 0L
    events.foreach { case (t, b) =>
      val size = 19 + b.length
      pos += size
      out ++= new Buf().u32(1700000000L).u8(t).u32(1).u32(size).u32(pos)
        .u16(0).result
      out ++= b
    }
    out.toArray
  }

  /** TRANSACTION_PAYLOAD body: lenenc (type, length, value) TLV
    * header closed by END_MARK, then the (optionally ZSTD) payload —
    * the MySQL libbinlogevents on-the-wire layout. */
  def transactionPayload(inner: Array[Byte], zstd: Boolean,
      algorithmOverride: Option[Long] = None): Array[Byte] = {
    val payload =
      if (zstd) com.github.luben.zstd.Zstd.compress(inner, 3) else inner
    val b = new Buf()
    def fld(t: Long, value: Long): Unit = {
      val vb = new Buf().lenenc(value).result
      b.lenenc(t).lenenc(vb.length.toLong).raw(vb)
    }
    fld(2, algorithmOverride.getOrElse(if (zstd) 0L else 255L))
    if (zstd) fld(3, inner.length.toLong)
    fld(1, payload.length.toLong)
    b.lenenc(0).raw(payload)
    b.result
  }

  /** ROWS body with EXPLICIT present-bitmaps — the
    * binlog_row_image=MINIMAL shape where the before image carries
    * only PK columns and the after image only changed columns. Each
    * image Seq must list exactly the PRESENT columns' values. */
  def rowsPartial(eventType: Int, tableId: Long,
      present1: Seq[Boolean], present2: Seq[Boolean],
      images: Seq[Seq[Val]]): Array[Byte] = {
    val n = present1.length
    val b = new Buf().u48(tableId).u16(0)
    if (eventType >= Binlog.WriteRowsV2) b.u16(2)
    b.lenenc(n)
    b.bitmap(present1)
    if (eventType == Binlog.UpdateRowsV2 || eventType == Binlog.UpdateRowsV1)
      b.bitmap(present2)
    val isUpd = eventType == Binlog.UpdateRowsV2 ||
      eventType == Binlog.UpdateRowsV1
    images.zipWithIndex.foreach { case (img, idx) =>
      val present = if (isUpd && idx % 2 == 1) present2 else present1
      require(img.length == present.count(identity),
        s"image ${img.length} values != ${present.count(identity)} present")
      b.bitmap(img.map(_ == Null))
      img.foreach { case V(bytes) => b.raw(bytes); case Null => () }
    }
    b.result
  }

  /** MariaDB GTID_EVENT body: seqno(8) domain(4) flags(1); the
    * server id rides in the event header. */
  def mariaGtid(domain: Long, seqno: Long): Array[Byte] =
    new Buf().u64(seqno).u32(domain).u8(0).result

  /** MariaDB GTID_LIST_EVENT body: count(4, low 28 bits) then
    * (domain, server, seqno) triples. */
  def mariaGtidList(entries: Seq[(Long, Long, Long)]): Array[Byte] = {
    val b = new Buf().u32(entries.length.toLong)
    entries.foreach { case (d, s, q) => b.u32(d).u32(s).u64(q) }
    b.result
  }

  /** Split a composed binlog file (magic + frames) into the verbatim
    * event frames a dump stream carries (shared by the wire-session
    * and e2e suites — one frame-walk implementation). */
  def splitFrames(fileBytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    var off = 4
    while (off < fileBytes.length) {
      val size = new Binlog.Cursor(fileBytes, off + 9).u32().toInt
      out += java.util.Arrays.copyOfRange(fileBytes, off, off + size)
      off += size
    }
    out.toSeq
  }

  /** Server-generated dump-start ROTATE: ts 0, LOG_EVENT_ARTIFICIAL_F,
    * body = 8-byte pos + file name, CRC'd like every streamed frame. */
  def artificialRotate(file: String, pos: Long): Array[Byte] = {
    val body = new Buf().u64(pos).raw(file.getBytes(UTF_8)).result
    val size = 19 + body.length + 4
    val frame = new Buf().u32(0L).u8(Binlog.RotateEvent).u32(77L).u32(size)
      .u32(0L).u16(BinlogClient.ArtificialFlag).result ++ body
    val c = new CRC32; c.update(frame, 0, frame.length)
    frame ++ new Buf().u32(c.getValue).result
  }
}

class BinlogSpec extends AnyFunSuite {
  import BinlogWriter._

  private val sidA = Array.tabulate(16)(i => (i + 1).toByte)
  private val sidAStr = "01020304-0506-0708-090a-0b0c0d0e0f10"

  // ---- golden fixtures (values from the public format doc) -----------

  test("golden: packed decimal worked example from the MySQL manual") {
    // DECIMAL(14,4) 1234567890.1234 → 81 0D FB 38 D2 04 D2
    val bytes = Array(0x81, 0x0d, 0xfb, 0x38, 0xd2, 0x04, 0xd2).map(_.toByte)
    assert(Binlog.decodeDecimal(new Binlog.Cursor(bytes, 0), 14, 4) == "1234567890.1234")
    assert(decimal("1234567890.1234", 14, 4).toSeq == bytes.toSeq)
    // and its negation is the bitwise NOT
    val neg = bytes.map(b => (~b).toByte)
    assert(Binlog.decodeDecimal(new Binlog.Cursor(neg, 0), 14, 4) == "-1234567890.1234")
  }

  test("golden: null bitmap is little-endian within bytes") {
    // 2 columns, row (42, NULL): null bitmap must be 0b00000010
    val cols = Seq(Col(T.Long, 0), Col(T.Long, 0))
    val body = rows(Binlog.WriteRowsV2, 7, 2, Seq(Seq(v(new Buf().u32(42)), Null)))
    // body: tid(6) flags(2) extra(2) colcount(1) present(1) null(1) value(4)
    assert((body(12) & 0xff) == 0x02)
    val tm = Binlog.decodeTableMap(tableMap(7, "d", "t", cols))
    val decoded = Binlog.decodeRows(body, Binlog.WriteRowsV2, tm)
    assert(decoded.images.head.toSeq == Seq(Some("42"), None))
  }

  test("golden: date packs day|month<<5|year<<9") {
    val b = new Buf().u24((2024 << 9) | (2 << 5) | 29).result
    assert(Binlog.decodeValue(new Binlog.Cursor(b, 0), T.Date, 0) == "2024-02-29")
  }

  // ---- framing + checksum --------------------------------------------

  test("framing: magic, FDE-first, CRC32 verified, bodies stripped of CRC") {
    val f = file(Seq(Binlog.XidEvent -> xid(9L)))
    val evs = Binlog.rawEvents(f)
    assert(evs.map(_.header.eventType) == Vector(Binlog.FormatDescriptionEvent, Binlog.XidEvent))
    assert(evs(1).body.length == 8)
    // corrupt one payload byte → CRC mismatch
    val bad = f.clone(); bad(bad.length - 6) = (bad(bad.length - 6) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](Binlog.rawEvents(bad))
    assert(e.getMessage.contains("CRC mismatch"))
  }

  test("framing: checksum-off files parse; unknown alg rejected") {
    val f = file(Seq(Binlog.XidEvent -> xid(9L)), crc = false)
    assert(Binlog.rawEvents(f).length == 2)
    val notBinlog = "PKjunk".getBytes(UTF_8)
    assert(intercept[IllegalArgumentException](
      Binlog.rawEvents(notBinlog)).getMessage.contains("magic"))
  }

  // ---- full decode ----------------------------------------------------

  private def mkFile(events: Seq[(Int, Array[Byte])]): Array[Byte] = file(events)

  private val allTypesCols = Seq(
    Col(T.Tiny, 0), Col(T.Short, 0), Col(T.Int24, 0), Col(T.Long, 0),
    Col(T.LongLong, 0), Col(T.Float, 4), Col(T.Double, 8),
    Col(T.NewDecimal, (12 << 8) | 2), Col(T.Varchar, 300), Col(T.Varchar, 10),
    Col(T.String, (T.String << 8) | 10), Col(T.Blob, 2), Col(T.Bit, ((12 % 8) << 8) | (12 / 8)),
    Col(T.Year, 0), Col(T.Date, 0), Col(T.Datetime2, 0), Col(T.Timestamp2, 0),
    Col(T.Time2, 0), Col(T.String, (T.Enum << 8) | 1))

  private def allTypesRow: Seq[Val] = Seq(
    v(new Buf().u8(-5 & 0xff)),                       // tinyint -5
    v(new Buf().u16(-1000 & 0xffff)),                 // smallint -1000
    v(new Buf().u24(70000)),                          // mediumint
    v(new Buf().u32(-2000000000L & 0xffffffffL)),     // int
    v(new Buf().u64(9007199254740993L)),              // bigint
    v(new Buf().u32(java.lang.Float.floatToIntBits(1.5f).toLong & 0xffffffffL)),
    v(new Buf().u64(java.lang.Double.doubleToLongBits(-2.25))),
    V(decimal("-1234567.89", 12, 2)),
    v(new Buf().u16(3).raw("abc".getBytes(UTF_8))),   // varchar(300): 2-byte len
    v(new Buf().u8(2).raw("hi".getBytes(UTF_8))),     // varchar(10): 1-byte len
    v(new Buf().u8(4).raw("char".getBytes(UTF_8))),   // char(10)
    {
      val blob = "txt_β".getBytes(UTF_8)
      v(new Buf().u16(blob.length).raw(blob))         // text (blob, 2-byte len)
    },
    V(new Buf().be(0xabc, 2).result),                 // bit(12)
    v(new Buf().u8(2024 - 1900)),                     // year
    v(new Buf().u24((2024 << 9) | (12 << 5) | 31)),   // date
    V(datetime2(2023, 7, 15, 12, 34, 56)),            // datetime(0)
    V(new Buf().be(1700000000L, 4).result),           // timestamp(0)
    V(new Buf().be(0x800000L + ((13L << 12) | (14 << 6) | 15), 3).result), // time 13:14:15
    v(new Buf().u8(2)))                               // enum index 2

  private val allTypesExpected = Map(
    "c01" -> "-5", "c02" -> "-1000", "c03" -> "70000", "c04" -> "-2000000000",
    "c05" -> "9007199254740993", "c06" -> "1.5", "c07" -> "-2.25",
    "c08" -> "-1234567.89", "c09" -> "abc", "c10" -> "hi", "c11" -> "char",
    "c12" -> "txt_β", "c13" -> "2748", "c14" -> "2024", "c15" -> "2024-12-31",
    "c16" -> "2023-07-15 12:34:56", "c17" -> "2023-11-14 22:13:20",
    "c18" -> "13:14:15", "c19" -> "2")

  private val colNames = (1 to 19).map(i => f"c$i%02d")

  test("decode: every supported scalar type round-trips through a WRITE_ROWS") {
    val f = mkFile(Seq(
      Binlog.GtidEvent -> gtid(sidA, 1),
      Binlog.TableMapEvent -> tableMap(11, "db1", "t1", allTypesCols),
      Binlog.WriteRowsV2 -> rows(Binlog.WriteRowsV2, 11, 19, Seq(allTypesRow)),
      Binlog.XidEvent -> xid(1)))
    val evs = Binlog.changeEvents(f, Map(("db1", "t1") -> colNames))
    assert(evs.length == 1)
    val e = evs.head
    assert(e.op == ChangeEvent.Insert && e.db == "db1" && e.table == "t1")
    assert(e.pos == s"$sidAStr:1")
    assert(e.after == allTypesExpected)
    assert(e.before == null)
  }

  test("decode: update pairs before/after at stride 2; delete carries full image") {
    val cols = Seq(Col(T.Long, 0), Col(T.Varchar, 20))
    val names = Map(("db1", "t1") -> Seq("id", "name"))
    def r(id: Int, s: String) =
      Seq(v(new Buf().u32(id.toLong)), v(new Buf().u8(s.length).raw(s.getBytes(UTF_8))))
    val f = mkFile(Seq(
      Binlog.GtidEvent -> gtid(sidA, 5),
      Binlog.TableMapEvent -> tableMap(3, "db1", "t1", cols),
      Binlog.UpdateRowsV2 -> rows(Binlog.UpdateRowsV2, 3, 2,
        Seq(r(1, "old"), r(1, "new"), r(2, "x"), r(2, "y"))),
      Binlog.DeleteRowsV2 -> rows(Binlog.DeleteRowsV2, 3, 2, Seq(r(2, "y"))),
      Binlog.XidEvent -> xid(2)))
    val evs = Binlog.changeEvents(f, names)
    assert(evs.map(_.op) == Vector("update", "update", "delete"))
    assert(evs(0).before == Map("id" -> "1", "name" -> "old"))
    assert(evs(0).after == Map("id" -> "1", "name" -> "new"))
    assert(evs(1).after == Map("id" -> "2", "name" -> "y"))
    assert(evs(2).after == Map("id" -> "2", "name" -> "y") && evs(2).before == null)
    assert(evs.map(_.seq) == Vector(1L, 2L, 3L))
  }

  test("decode: v1 ROWS events (5.1-5.5, no extra-data field) decode identically") {
    val cols = Seq(Col(T.Long, 0), Col(T.Varchar, 20))
    val names = Map(("db1", "t1") -> Seq("id", "name"))
    def r(id: Int, s: String) =
      Seq(v(new Buf().u32(id.toLong)), v(new Buf().u8(s.length).raw(s.getBytes(UTF_8))))
    val f = mkFile(Seq(
      Binlog.TableMapEvent -> tableMap(3, "db1", "t1", cols),
      Binlog.WriteRowsV1 -> rows(Binlog.WriteRowsV1, 3, 2, Seq(r(1, "ann"))),
      Binlog.UpdateRowsV1 -> rows(Binlog.UpdateRowsV1, 3, 2, Seq(r(1, "ann"), r(1, "anna"))),
      Binlog.DeleteRowsV1 -> rows(Binlog.DeleteRowsV1, 3, 2, Seq(r(1, "anna")))))
    val evs = Binlog.changeEvents(f, names)
    assert(evs.map(_.op) == Vector("insert", "update", "delete"))
    assert(evs(1).before == Map("id" -> "1", "name" -> "ann"))
    assert(evs(1).after == Map("id" -> "1", "name" -> "anna"))
  }

  test("decode: NULLs drop out of the image map (sparse row images)") {
    val cols = Seq(Col(T.Long, 0), Col(T.Varchar, 20), Col(T.Long, 0))
    val f = mkFile(Seq(
      Binlog.TableMapEvent -> tableMap(3, "d", "t", cols),
      Binlog.WriteRowsV2 -> rows(Binlog.WriteRowsV2, 3, 3,
        Seq(Seq(v(new Buf().u32(1)), Null, Null)))))
    val evs = Binlog.changeEvents(f, Map(("d", "t") -> Seq("a", "b", "c")))
    assert(evs.head.after == Map("a" -> "1"))
  }

  test("decode: unrouted tables are skipped; routed arity mismatch fails loudly") {
    val cols = Seq(Col(T.Long, 0))
    val f = mkFile(Seq(
      Binlog.TableMapEvent -> tableMap(3, "d", "skipme", cols),
      Binlog.WriteRowsV2 -> rows(Binlog.WriteRowsV2, 3, 1, Seq(Seq(v(new Buf().u32(1)))))))
    assert(Binlog.changeEvents(f, Map(("d", "other") -> Seq("a"))).isEmpty)
    val e = intercept[IllegalArgumentException](
      Binlog.changeEvents(f, Map(("d", "skipme") -> Seq("a", "b"))))
    assert(e.getMessage.contains("configured columns"))
  }

  test("decode: DDL emits op=ddl; BEGIN and shadow-table DDL are filtered") {
    val f = mkFile(Seq(
      Binlog.QueryEvent -> query("db1", "BEGIN"),
      Binlog.QueryEvent -> query("db1", "ALTER TABLE t1 ADD COLUMN x INT"),
      Binlog.QueryEvent -> query("db1", "ALTER TABLE _t1_gho ADD COLUMN x INT"),
      Binlog.QueryEvent -> query("db1", "DROP TABLE tp_123_del_t1")))
    val evs = Binlog.changeEvents(f, Map.empty)
    assert(evs.length == 1)
    assert(evs.head.op == "ddl" && evs.head.db == "db1")
    assert(evs.head.after("sql") == "ALTER TABLE t1 ADD COLUMN x INT")
  }

  test("decode: GTID set accumulates across transactions; PREVIOUS_GTIDS seeds it") {
    val sidB = Array.tabulate(16)(i => (0x20 + i).toByte)
    val cols = Seq(Col(T.Long, 0))
    def ins(id: Long) = rows(Binlog.WriteRowsV2, 3, 1, Seq(Seq(v(new Buf().u32(id)))))
    val f = mkFile(Seq(
      Binlog.PreviousGtidsEvent -> previousGtids(Seq(sidA -> Seq((1L, 4L)))), // 1-3
      Binlog.TableMapEvent -> tableMap(3, "d", "t", cols),
      Binlog.GtidEvent -> gtid(sidA, 4),
      Binlog.WriteRowsV2 -> ins(1),
      Binlog.XidEvent -> xid(1),
      Binlog.GtidEvent -> gtid(sidB, 1),
      Binlog.WriteRowsV2 -> ins(2),
      Binlog.XidEvent -> xid(2)))
    val evs = Binlog.changeEvents(f, Map(("d", "t") -> Seq("a")))
    assert(evs(0).pos == s"$sidAStr:1-4")
    val sidBStr = "20212223-2425-2627-2829-2a2b2c2d2e2f"
    assert(evs(1).pos == s"$sidAStr:1-4,$sidBStr:1")
  }

  test("decode: binary JSON column renders canonical JSON text") {
    // {"a":1} in JSONB: small object, inlined int16 — hand-assembled
    val jsonb = Array(0x00, 0x01, 0x00, 0x0c, 0x00, 0x0b, 0x00, 0x01, 0x00,
      0x05, 0x01, 0x00, 'a'.toInt).map(_.toByte)
    val cols = Seq(Col(T.Json, 4))
    val body = rows(Binlog.WriteRowsV2, 3, 1,
      Seq(Seq(v(new Buf().u32(jsonb.length.toLong).raw(jsonb)))))
    val f = mkFile(Seq(Binlog.TableMapEvent -> tableMap(3, "d", "t", cols),
      Binlog.WriteRowsV2 -> body))
    val evs = Binlog.changeEvents(f, Map(("d", "t") -> Seq("a")))
    assert(evs.head.after("a") == """{"a":1}""")
  }

  test("decode: SIGNEDNESS metadata TLV flips integer decode to unsigned") {
    val cols = Seq(Col(T.Tiny, 0), Col(T.Varchar, 10), Col(T.Long, 0), Col(T.LongLong, 0))
    // numeric columns in order: tiny, long, longlong → unsigned bits (1,0,1)
    val tm = tableMap(3, "d", "t", cols, unsignedNumeric = Seq(true, false, true))
    def allFF(n: Int) = v(new Buf().raw(Array.fill(n)(0xff.toByte)))
    val body = rows(Binlog.WriteRowsV2, 3, 4, Seq(Seq(
      allFF(1), v(new Buf().u8(1).raw("x".getBytes(UTF_8))), allFF(4), allFF(8))))
    val f = mkFile(Seq(Binlog.TableMapEvent -> tm, Binlog.WriteRowsV2 -> body))
    val evs = Binlog.changeEvents(f, Map(("d", "t") -> Seq("a", "s", "b", "c")))
    assert(evs.head.after == Map(
      "a" -> "255", "s" -> "x", "b" -> "-1", "c" -> "18446744073709551615"))
  }

  test("decode: COLUMN_NAME TLV makes segments self-describing ('*' routing)") {
    val cols = Seq(Col(T.Long, 0), Col(T.Varchar, 10))
    val tm = tableMap(3, "d", "t", cols, names = Seq("id", "name"), junkTlv = true)
    val body = rows(Binlog.WriteRowsV2, 3, 2, Seq(Seq(
      v(new Buf().u32(7)), v(new Buf().u8(3).raw("kim".getBytes(UTF_8))))))
    val f = mkFile(Seq(Binlog.TableMapEvent -> tm, Binlog.WriteRowsV2 -> body))
    // '*' = take names from the wire (junk TLV must be skipped)
    val evs = Binlog.changeEvents(f, Map(("d", "t") -> Seq("*")))
    assert(evs.head.after == Map("id" -> "7", "name" -> "kim"))
    // '*' without the TLV fails loudly
    val bare = mkFile(Seq(
      Binlog.TableMapEvent -> tableMap(3, "d", "t", cols),
      Binlog.WriteRowsV2 -> body))
    val e = intercept[IllegalStateException](
      Binlog.changeEvents(bare, Map(("d", "t") -> Seq("*"))))
    assert(e.getMessage.contains("COLUMN_NAME"))
  }

  test("decode: unknown auxiliary event types (heartbeat etc.) skip cleanly") {
    val cols = Seq(Col(T.Long, 0))
    val f = mkFile(Seq(
      27 -> Array[Byte](1, 2, 3), // HEARTBEAT-ish: size-framed, content opaque
      Binlog.TableMapEvent -> tableMap(3, "d", "t", cols),
      3 -> Array.emptyByteArray,  // STOP
      Binlog.WriteRowsV2 -> rows(Binlog.WriteRowsV2, 3, 1, Seq(Seq(v(new Buf().u32(5)))))))
    val evs = Binlog.changeEvents(f, Map(("d", "t") -> Seq("a")))
    assert(evs.map(_.after) == Vector(Map("a" -> "5")))
  }

  test("decode: negative TIME2 and zero date") {
    val neg = new Buf().be(0x800000L - ((1L << 12) | (2 << 6) | 3), 3).result
    assert(Binlog.decodeValue(new Binlog.Cursor(neg, 0), T.Time2, 0) == "-01:02:03")
    val zero = new Buf().u24(0).result
    assert(Binlog.decodeValue(new Binlog.Cursor(zero, 0), T.Date, 0) == "0000-00-00")
  }

  test("decode: odd fsp DATETIME(3)/TIME(3) and fractional negative TIME") {
    // DATETIME(3) '2023-07-15 12:34:56.789': frac bytes = 2, value = 78900
    val dt = datetime2(2023, 7, 15, 12, 34, 56) ++ new Buf().be(7890L, 2).result
    assert(Binlog.decodeValue(new Binlog.Cursor(dt, 0), T.Datetime2, 3) ==
      "2023-07-15 12:34:56.789")
    // TIMESTAMP(6)
    val ts = new Buf().be(1700000000L, 4).be(123456L, 3).result
    assert(Binlog.decodeValue(new Binlog.Cursor(ts, 0), T.Timestamp2, 6) ==
      "2023-11-14 22:13:20.123456")
    // TIME(3) positive 01:02:03.450 — one 5-byte big-endian value
    val packed = (1L << 12) | (2 << 6) | 3
    val pos5 = new Buf().be(((0x800000L + packed) << 16) | 4500L, 5).result
    assert(Binlog.decodeValue(new Binlog.Cursor(pos5, 0), T.Time2, 3) == "01:02:03.450")
    // TIME(3) negative -00:00:00.001: total = offset - 0.1ms units
    val neg5 = new Buf().be((0x800000L << 16) - 10L, 5).result
    assert(Binlog.decodeValue(new Binlog.Cursor(neg5, 0), T.Time2, 3) == "-00:00:00.001")
  }

  test("framing: pre-5.6 FDE has no checksum-alg byte; version gates detection") {
    // legacy FDE with nonzero post-header entries — positional
    // sniffing would read alg=1 (spurious CRC) here
    val cols = Seq(Col(T.Long, 0))
    val f = file(Seq(
      Binlog.TableMapEvent -> tableMap(3, "d", "t", cols),
      Binlog.WriteRowsV1 -> rows(Binlog.WriteRowsV1, 3, 1, Seq(Seq(v(new Buf().u32(42)))))),
      crc = false, serverVersion = "5.5.62-log", legacyFde = true)
    val evs = Binlog.changeEvents(f, Map(("d", "t") -> Seq("a")))
    assert(evs.head.after == Map("a" -> "42"))
  }

  // ---- GtidSet merge semantics ----------------------------------------

  test("GtidSet: out-of-order adds merge into canonical intervals") {
    val g = new Binlog.GtidSet
    Seq(5L, 1L, 3L, 2L, 4L, 10L, 5L).foreach(g.add("s", _))
    assert(g.render == "s:1-5:10")
    g.add("s", 9L); g.add("s", 8L); g.add("s", 7L); g.add("s", 6L)
    assert(g.render == "s:1-10")
  }

  test("GtidSet: multiple sids render comma-separated in first-seen order") {
    val g = new Binlog.GtidSet
    g.add("b", 1); g.add("a", 2); g.add("b", 2)
    assert(g.render == "b:1-2,a:2")
  }

  test("decode: binlog_row_image=MINIMAL — sparse before/after images") {
    // MINIMAL: update before image = PK columns only, after image =
    // changed columns only; the present-bitmaps say which. Absent
    // columns must drop out of the maps (None), NOT decode garbage.
    val cols = Seq(Col(T.Long, 0), Col(T.Long, 0), Col(T.Varchar, 10))
    val tm = tableMap(3, "d", "t", cols)
    val body = rowsPartial(Binlog.UpdateRowsV2, 3,
      present1 = Seq(true, false, false),   // before: id only
      present2 = Seq(false, true, true),    // after: v + s changed
      images = Seq(
        Seq(v(new Buf().u32(7))),                                  // before
        Seq(v(new Buf().u32(42)),
          v(new Buf().u8(2).raw("hi".getBytes(UTF_8))))))          // after
    val f = mkFile(Seq(Binlog.TableMapEvent -> tm,
      Binlog.UpdateRowsV2 -> body))
    val evs = Binlog.changeEvents(f, Map(("d", "t") -> Seq("id", "v", "s")))
    assert(evs.length == 1 && evs.head.op == "update")
    assert(evs.head.before == Map("id" -> "7"))
    assert(evs.head.after == Map("v" -> "42", "s" -> "hi"))
    // delete under MINIMAL: PK-only single image
    val del = rowsPartial(Binlog.DeleteRowsV2, 3,
      present1 = Seq(true, false, false), present2 = Nil,
      images = Seq(Seq(v(new Buf().u32(9)))))
    val f2 = mkFile(Seq(Binlog.TableMapEvent -> tm,
      Binlog.DeleteRowsV2 -> del))
    val evs2 = Binlog.changeEvents(f2, Map(("d", "t") -> Seq("id", "v", "s")))
    assert(evs2.head.op == "delete" && evs2.head.after == Map("id" -> "9"))
  }

  // ---- TRANSACTION_PAYLOAD (MySQL 8.0.20+ compression) ----------------

  private def txInner(ids: Long*) = {
    val cols = Seq(Col(T.Long, 0))
    Seq(Binlog.QueryEvent -> query("d", "BEGIN"),
      Binlog.TableMapEvent -> tableMap(3, "d", "t", cols)) ++
      ids.map(id => Binlog.WriteRowsV2 ->
        rows(Binlog.WriteRowsV2, 3, 1, Seq(Seq(v(new Buf().u32(id)))))) :+
      (Binlog.XidEvent -> xid(9))
  }

  test("decode: ZSTD transaction payload ≡ the same transaction uncompressed") {
    val names = Map(("d", "t") -> Seq("a"))
    val plain = mkFile(Seq(Binlog.GtidEvent -> gtid(sidA, 1)) ++ txInner(1, 2))
    val compressed = mkFile(Seq(
      Binlog.GtidEvent -> gtid(sidA, 1),
      Binlog.TransactionPayloadEvent ->
        transactionPayload(innerStream(txInner(1, 2)), zstd = true)))
    val a = Binlog.changeEvents(plain, names)
    val b = Binlog.changeEvents(compressed, names)
    assert(a == b, s"\nplain: $a\npayload: $b")
    assert(b.map(_.after("a")) == Vector("1", "2"))
    assert(b.forall(_.pos == s"$sidAStr:1"))
  }

  test("decode: uncompressed (NONE) transaction payload decodes too") {
    val compressed = mkFile(Seq(
      Binlog.TransactionPayloadEvent ->
        transactionPayload(innerStream(txInner(7)), zstd = false)))
    val evs = Binlog.changeEvents(compressed, Map(("d", "t") -> Seq("a")))
    assert(evs.map(_.after("a")) == Vector("7"))
  }

  test("decode: unknown payload compression algorithm fails loudly") {
    val f = mkFile(Seq(Binlog.TransactionPayloadEvent ->
      transactionPayload(innerStream(txInner(1)), zstd = false,
        algorithmOverride = Some(7L))))
    val e = intercept[IllegalStateException](
      Binlog.changeEvents(f, Map(("d", "t") -> Seq("a"))))
    assert(e.getMessage.contains("compression algorithm 7"))
  }

  test("payload byte-range seqs stay unique, monotone, inside the wrapper") {
    val names = Map(("d", "t") -> Seq("a"))
    val f = mkFile(Seq(
      Binlog.TransactionPayloadEvent ->
        transactionPayload(innerStream(txInner(1, 2, 3)), zstd = true),
      Binlog.TableMapEvent -> tableMap(3, "d", "t", Seq(Col(T.Long, 0))),
      Binlog.WriteRowsV2 ->
        rows(Binlog.WriteRowsV2, 3, 1, Seq(Seq(v(new Buf().u32(99)))))))
    val evs = Binlog.changeEventsByteRange(f, names, 0L, 0L, Long.MaxValue)
    val seqs = evs.map(_.seq)
    assert(evs.map(_.after("a")) == Vector("1", "2", "3", "99"))
    assert(seqs == seqs.sorted && seqs.distinct == seqs, seqs.toString)
    // the payload rows' seqs live inside the wrapper's byte span, so
    // they can never collide with the NEXT event's offset-based seqs
    val wrapperOff = Binlog.rawEvents(f)
      .find(_.header.eventType == Binlog.TransactionPayloadEvent).get.offset
    val wrapperSize = Binlog.rawEvents(f)
      .find(_.header.eventType == Binlog.TransactionPayloadEvent)
      .get.header.eventSize
    assert(seqs.take(3).forall(s =>
      s >= wrapperOff && s < wrapperOff + wrapperSize))
  }

  // ---- MariaDB dialect ------------------------------------------------

  test("decode: MariaDB GTIDs render domain-server-seqno; GTID_LIST seeds") {
    val cols = Seq(Col(T.Long, 0))
    def ins(id: Long) =
      rows(Binlog.WriteRowsV2, 3, 1, Seq(Seq(v(new Buf().u32(id)))))
    val f = mkFile(Seq(
      Binlog.MariaGtidListEvent -> mariaGtidList(Seq((0L, 1L, 41L))),
      Binlog.TableMapEvent -> tableMap(3, "d", "t", cols),
      Binlog.MariaGtidEvent -> mariaGtid(0, 42),
      Binlog.WriteRowsV2 -> ins(1),
      Binlog.MariaGtidEvent -> mariaGtid(5, 7),
      Binlog.WriteRowsV2 -> ins(2)))
    val evs = Binlog.changeEvents(f, Map(("d", "t") -> Seq("a")))
    // file() writes server id 1 in every header
    assert(evs(0).pos == "0-1-42")
    assert(evs(1).pos == "0-1-42,5-1-7")
    // gtid_slave_pos allows ONE GTID per domain: a GTID_LIST seeded
    // with two servers in the same domain (failover history) must
    // collapse to the max-seqno entry, or resume via
    // @slave_connect_state is rejected by the server
    val f3 = mkFile(Seq(
      Binlog.MariaGtidListEvent ->
        mariaGtidList(Seq((0L, 1L, 42L), (0L, 2L, 50L), (3L, 9L, 7L))),
      Binlog.TableMapEvent -> tableMap(3, "d", "t", cols),
      Binlog.MariaGtidEvent -> mariaGtid(0, 41), // stale seqno: ignored
      Binlog.WriteRowsV2 -> ins(1)))
    val evs3 = Binlog.changeEvents(f3, Map(("d", "t") -> Seq("a")))
    assert(evs3(0).pos == "0-2-50,3-9-7")
    // ANNOTATE_ROWS / BINLOG_CHECKPOINT are informational: skipped
    val f2 = mkFile(Seq(
      Binlog.MariaAnnotateRowsEvent -> "INSERT INTO t VALUES (1)".getBytes(UTF_8),
      Binlog.MariaBinlogCheckpointEvent ->
        new Buf().u32(13L).raw("binlog.000001".getBytes(UTF_8)).result))
    assert(Binlog.changeEvents(f2, Map.empty).isEmpty)
  }

  test("decode: MariaDB encrypted and per-event-compressed binlogs fail loudly") {
    val enc = mkFile(Seq(Binlog.MariaStartEncryptionEvent ->
      new Buf().u8(1).u32(1L).raw(new Array[Byte](12)).result))
    val e1 = intercept[IllegalStateException](Binlog.changeEvents(enc, Map.empty))
    assert(e1.getMessage.contains("encrypt"))
    val comp = mkFile(Seq(166 -> new Buf().u48(3).u16(0).result))
    val e2 = intercept[IllegalStateException](Binlog.changeEvents(comp, Map.empty))
    assert(e2.getMessage.contains("compression"))
  }
}
