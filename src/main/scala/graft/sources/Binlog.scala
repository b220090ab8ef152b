package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.zip.CRC32

import scala.collection.mutable

import graft.cdc.ChangeEvent
import graft.meta.DdlParser

/** MySQL binlog **wire-format** decoder (binlog-v4 file format).
  *
  * The reference delegates this layer to the go-mysql replication
  * library and only dispatches decoded events
  * (`inputs/mysql/mysql_replication.go:38-65`); a complete engine
  * needs the decode itself. This is a from-scratch implementation of
  * the publicly documented binlog v4 format (MySQL internals manual,
  * "Binary log versions" / "Row-based replication events"):
  *
  *  - file magic `0xfe 'b' 'i' 'n'`, 19-byte v4 event headers;
  *  - FORMAT_DESCRIPTION with checksum-algorithm negotiation and
  *    CRC32 verification of every event when enabled;
  *  - TABLE_MAP (column types + per-type metadata + nullability);
  *  - WRITE/UPDATE/DELETE_ROWS v1 and v2 (columns-present bitmaps,
  *    per-image null bitmaps, before/after pairing
  *    ≙ `inputs/mysql/msg.go:30-54`; the reference dispatches all
  *    three versions, `mysql_replication.go:96-104`);
  *  - GTID / PREVIOUS_GTIDS tracking into a rendered GTID-set
  *    watermark (≙ the XID ctl msg, `inputs/mysql/msg.go:76-84`);
  *  - QUERY (DDL) with the reference's BEGIN + shadow-table noise
  *    filters (`inputs/mysql/mysql_replication.go:136-185`);
  *  - ROTATE / XID / ANONYMOUS_GTID.
  *
  * Column decode covers the reference's scalar type system (SURVEY
  * §1.3): all signed integer widths, FLOAT/DOUBLE, NEWDECIMAL (the
  * packed base-10^9 format, exact-scale rendering), VARCHAR /
  * VAR_STRING / STRING (incl. the split-metadata real-type trick),
  * ENUM/SET, BLOB/TEXT, BIT, YEAR, DATE, binary JSON (via [[Jsonb]]),
  * and the fractional-second temporal types DATETIME2 / TIMESTAMP2 /
  * TIME2 at every fsp 0–6 (incl. odd — DATETIME(3) is the common ORM
  * default — and negative TIME2 with fractions). Unsupported
  * encodings (PARTIAL_JSON diffs) fail loudly rather than guessing —
  * the same fail-fast stance the replication layer takes on arity
  * mismatch (`mysql_replication.go:88-91`).
  *
  * Values decode to strings because the generic pre-routing stream is
  * `Map[String,String]` (see [[graft.cdc.ChangeEvent]]); typed decode
  * happens at routing exactly as for the JSONL changelog.
  *
  * Scale note: a binlog *segment* is the natural parallelism unit
  * (one file = one task in [[BinlogFiles.changeEvents]]); segments
  * are bounded by `max_binlog_size` (≤1 GiB), so per-task memory is
  * bounded by configuration, not data volume.
  */
object Binlog {

  // ---- event type codes (binlog spec) ----------------------------------
  val QueryEvent = 2
  val RotateEvent = 4
  val FormatDescriptionEvent = 15
  val XidEvent = 16
  val TableMapEvent = 19
  val WriteRowsV1 = 23
  val UpdateRowsV1 = 24
  val DeleteRowsV1 = 25
  val WriteRowsV2 = 30
  val UpdateRowsV2 = 31
  val DeleteRowsV2 = 32
  val GtidEvent = 33
  val AnonymousGtidEvent = 34
  val PreviousGtidsEvent = 35
  /** MySQL 8.0.20+ `binlog_transaction_compression`: one event
    * wrapping a whole (ZSTD-compressed) transaction. */
  val TransactionPayloadEvent = 40

  // ---- MariaDB dialect event codes (MariaDB KB, "Replication
  // Protocol"): MariaDB forked the numbering space at 160 ----------------
  val MariaAnnotateRowsEvent = 160
  val MariaBinlogCheckpointEvent = 161
  val MariaGtidEvent = 162
  val MariaGtidListEvent = 163
  val MariaStartEncryptionEvent = 164
  val MariaQueryCompressedEvent = 165
  val MariaCompressedRowsFirst = 166 // WRITE/UPDATE/DELETE_ROWS_COMPRESSED_V1
  val MariaCompressedRowsLast = 168

  // ---- column type codes (MySQL protocol) ------------------------------
  object Type {
    val Tiny = 1; val Short = 2; val Long = 3; val Float = 4; val Double = 5
    val Null = 6; val Timestamp = 7; val LongLong = 8; val Int24 = 9
    val Date = 10; val Year = 13; val Varchar = 15; val Bit = 16
    val Timestamp2 = 17; val Datetime2 = 18; val Time2 = 19
    val Json = 245; val NewDecimal = 246; val Enum = 247; val Set = 248
    val Blob = 252; val VarString = 253; val String = 254
  }

  val Magic: Array[Byte] = Array(0xfe.toByte, 'b'.toByte, 'i'.toByte, 'n'.toByte)

  final case class Header(
      timestamp: Long,    // unix seconds
      eventType: Int,
      serverId: Long,
      eventSize: Int,     // incl. 19-byte header and (if enabled) CRC
      nextPos: Long,
      flags: Int)

  /** One decoded frame; `body` excludes the trailing CRC32 when the
    * stream is checksummed (already verified). `offset` is the
    * event's start byte in the segment — the binlog's own position
    * coordinate (what `SHOW BINLOG EVENTS` calls Pos). */
  final case class Event(header: Header, body: Array[Byte], offset: Long = 0L)

  final case class TableMap(
      tableId: Long,
      db: String,
      table: String,
      types: Array[Int],
      meta: Array[Int],
      nullable: Array[Boolean],
      // from binlog_row_metadata=FULL optional TLVs (8.0+), when present:
      unsigned: Array[Boolean] = Array.empty, // per column (false when absent)
      columnNames: Option[Seq[String]] = None) {
    def isUnsigned(i: Int): Boolean = i < unsigned.length && unsigned(i)
  }

  /** Little-endian cursor over an event body. All reads bound-check
    * via the underlying array (an over-read is a malformed event and
    * should throw, not wrap). */
  final class Cursor(val buf: Array[Byte], var off: Int) {
    def remaining: Int = buf.length - off
    def u8(): Int = { val v = buf(off) & 0xff; off += 1; v }
    def i8(): Int = { val v = buf(off).toInt; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def i16(): Int = u16().toShort.toInt
    def u24(): Int = u8() | (u8() << 8) | (u8() << 16)
    def i24(): Int = { val v = u24(); if ((v & 0x800000) != 0) v | 0xff000000 else v }
    def u32(): Long = u24().toLong | ((u8().toLong) << 24)
    def i32(): Int = u32().toInt
    def u48(): Long = u32() | ((u16().toLong) << 32)
    def i64(): Long = u32() | (u32() << 32)
    /** Big-endian unsigned read of n ≤ 8 bytes. */
    def be(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (buf(off + i) & 0xffL); i += 1 }
      off += n
      v
    }
    def bytes(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(buf, off, off + n); off += n; a
    }
    def lenenc(): Long = u8() match {
      case 0xfc => u16().toLong
      case 0xfd => u24().toLong
      case 0xfe => i64()
      case v if v < 0xfb => v.toLong
      case v => throw new IllegalArgumentException(s"invalid length-encoded prefix 0x${v.toHexString}")
    }
  }

  // ---- framing ---------------------------------------------------------

  /** Split a binlog file into events, verifying the magic, the FDE's
    * checksum negotiation, and (when CRC32 is on) every event's CRC. */
  def rawEvents(bytes: Array[Byte]): Vector[Event] = {
    require(bytes.length >= 4 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, 4), Magic),
      "not a binlog file: bad magic")
    val out = Vector.newBuilder[Event]
    var off = 4
    var crc32On = false
    var first = true
    while (off < bytes.length) {
      require(bytes.length - off >= 19, s"truncated event header at $off")
      val c = new Cursor(bytes, off)
      val h = Header(c.u32(), c.u8(), c.u32(), c.u32().toInt, c.u32(), c.u16())
      require(h.eventSize >= 19 && off + h.eventSize <= bytes.length,
        s"truncated event (type ${h.eventType}, size ${h.eventSize}) at $off")
      if (first) {
        require(h.eventType == FormatDescriptionEvent,
          s"first event must be FORMAT_DESCRIPTION, got ${h.eventType}")
        // FDE payload: 2 version, 50 server-version, 4 create-ts,
        // 1 header-len, post-header-len array [, 1 checksum-alg
        // [, 4 CRC]]. The checksum-alg byte exists only on servers
        // ≥ 5.6.1 (when event checksums were introduced) — on a
        // 5.1–5.5 FDE the tail bytes are post-header-len entries, so
        // reading fixed positions there would misdetect. Gate on the
        // server-version string the FDE carries for exactly this
        // purpose; an unparseable version assumes modern.
        val sv = new String(bytes, off + 21, 50, UTF_8).takeWhile(_ != '\u0000')
        val modern = """^(\d+)\.(\d+)\.(\d+)""".r.findFirstMatchIn(sv)
          .forall(m => Ordering[(Int, Int, Int)].gteq(
            (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt), (5, 6, 1)))
        val end = off + h.eventSize
        crc32On = modern && (bytes(end - 5) & 0xff) == 1
        if (modern && !crc32On) require((bytes(end - 1) & 0xff) == 0,
          s"unsupported binlog checksum algorithm ${bytes(end - 1) & 0xff}")
        first = false
      }
      val bodyEnd = off + h.eventSize - (if (crc32On) 4 else 0)
      if (crc32On) {
        val crc = new CRC32
        crc.update(bytes, off, h.eventSize - 4)
        val stored = new Cursor(bytes, bodyEnd).u32()
        require(crc.getValue == stored,
          f"CRC mismatch on event type ${h.eventType} at $off: computed ${crc.getValue}%08x stored $stored%08x")
      }
      out += Event(h, java.util.Arrays.copyOfRange(bytes, off + 19, bodyEnd), off)
      off += h.eventSize
    }
    out.result()
  }

  /** Frame-walk the events INSIDE a decompressed transaction
    * payload: no magic, no FDE negotiation, and no per-event CRC —
    * MySQL writes the wrapped events checksum-free (the wrapper's
    * own CRC already covered the compressed bytes). */
  private[sources] def innerEvents(bytes: Array[Byte]): Vector[Event] = {
    val out = Vector.newBuilder[Event]
    var off = 0
    while (off < bytes.length) {
      require(bytes.length - off >= 19,
        s"truncated payload event header at $off")
      val c = new Cursor(bytes, off)
      val h = Header(c.u32(), c.u8(), c.u32(), c.u32().toInt, c.u32(), c.u16())
      require(h.eventSize >= 19 && off + h.eventSize <= bytes.length,
        s"truncated payload event (type ${h.eventType}, size ${h.eventSize}) at $off")
      out += Event(h,
        java.util.Arrays.copyOfRange(bytes, off + 19, off + h.eventSize), off)
      off += h.eventSize
    }
    out.result()
  }

  // TRANSACTION_PAYLOAD on-the-wire field codes (MySQL
  // libbinlogevents control_events.h, Transaction_payload_event):
  // lenenc (type, length, value) fields, header closed by END_MARK.
  private val OtwHeaderEndMark = 0L
  private val OtwPayloadSizeField = 1L
  private val OtwCompressionTypeField = 2L
  private val OtwUncompressedSizeField = 3L
  private val CompressionZstd = 0L
  private val CompressionNone = 255L

  /** Decode a TRANSACTION_PAYLOAD body to the uncompressed inner
    * event bytes. ZSTD (algorithm 0) and NONE (255) are the
    * documented algorithms; anything else fails loudly. */
  private[sources] def decodeTransactionPayload(body: Array[Byte]): Array[Byte] = {
    val c = new Cursor(body, 0)
    var compression = CompressionNone
    var payloadSize = -1L
    var uncompressedSize = -1L
    var end = false
    while (!end) {
      c.lenenc() match {
        case OtwHeaderEndMark => end = true
        case t =>
          val vc = new Cursor(c.bytes(c.lenenc().toInt), 0)
          t match {
            case OtwPayloadSizeField => payloadSize = vc.lenenc()
            case OtwCompressionTypeField => compression = vc.lenenc()
            case OtwUncompressedSizeField => uncompressedSize = vc.lenenc()
            case _ => () // unknown TLV fields are skippable by design
          }
      }
    }
    val payload =
      if (payloadSize >= 0) c.bytes(payloadSize.toInt) else c.bytes(c.remaining)
    compression match {
      case CompressionNone => payload
      case CompressionZstd =>
        require(uncompressedSize >= 0,
          "ZSTD transaction payload without an uncompressed-size field")
        com.github.luben.zstd.Zstd.decompress(payload, uncompressedSize.toInt)
      case other => throw new IllegalStateException(
        s"unsupported transaction payload compression algorithm $other " +
          "(ZSTD=0 and NONE=255 are the documented values) — set " +
          "binlog_transaction_compression_level_zstd or disable " +
          "binlog_transaction_compression on the master")
    }
  }

  // ---- TABLE_MAP -------------------------------------------------------

  def decodeTableMap(body: Array[Byte]): TableMap = {
    val c = new Cursor(body, 0)
    val tableId = c.u48()
    c.u16() // flags
    val dbLen = c.u8(); val db = new String(c.bytes(dbLen), UTF_8); c.u8() // NUL
    val tLen = c.u8(); val table = new String(c.bytes(tLen), UTF_8); c.u8() // NUL
    val n = c.lenenc().toInt
    val types = Array.tabulate(n)(_ => c.u8())
    c.lenenc() // metadata block length (redundant with per-type sizes)
    val meta = new Array[Int](n)
    var i = 0
    while (i < n) {
      meta(i) = types(i) match {
        case Type.Float | Type.Double | Type.Blob | Type.Json => c.u8()
        case Type.Varchar | Type.VarString => c.u16()
        // STRING packs (real-type, length); BIT packs (bits%8, bytes).
        // Both are a big-endian-ish byte pair — keep as (b0<<8)|b1.
        case Type.String | Type.Enum | Type.Set => (c.u8() << 8) | c.u8()
        case Type.Bit => (c.u8() << 8) | c.u8()
        case Type.NewDecimal => (c.u8() << 8) | c.u8() // (precision, scale)
        case Type.Timestamp2 | Type.Datetime2 | Type.Time2 => c.u8() // fsp
        case _ => 0
      }
      i += 1
    }
    val nullable = readBitmap(c, n)

    // Optional metadata TLVs (binlog_row_metadata; public row-event
    // spec): [type u8][len lenenc][payload]… after the null bitmap.
    // SIGNEDNESS(1) carries one MSB-first bit per NUMERIC column;
    // COLUMN_NAME(4) carries lenenc-prefixed names for every column
    // (=FULL) — a self-describing segment needs no external column
    // list. Unknown TLV types skip by length.
    val numericIdx = types.indices.filter(i => isNumericType(types(i)))
    var unsigned = Array.fill(n)(false)
    var colNames: Option[Seq[String]] = None
    while (c.remaining > 0) {
      val t = c.u8()
      val len = c.lenenc().toInt
      val end = c.off + len
      t match {
        case 1 => // SIGNEDNESS: bit i (MSB-first) = numeric column i unsigned
          val bits = c.bytes(len)
          numericIdx.zipWithIndex.foreach { case (col, bi) =>
            if ((bits(bi / 8) & (0x80 >> (bi % 8))) != 0) unsigned(col) = true
          }
        case 4 => // COLUMN_NAME: lenenc-length strings, one per column
          val ns = Vector.newBuilder[String]
          while (c.off < end) {
            val l = c.lenenc().toInt
            ns += new String(c.bytes(l), UTF_8)
          }
          val named = ns.result()
          require(named.length == n,
            s"COLUMN_NAME TLV carries ${named.length} names for $n columns in $db.$table")
          colNames = Some(named)
        case _ => ()
      }
      c.off = end
    }
    TableMap(tableId, db, table, types, meta, nullable, unsigned, colNames)
  }

  private def isNumericType(t: Int): Boolean = t match {
    case Type.Tiny | Type.Short | Type.Int24 | Type.Long | Type.LongLong |
         Type.Float | Type.Double | Type.NewDecimal | Type.Year => true
    case _ => false
  }

  /** Binlog bitmaps are little-endian within each byte: column i is
    * bit (i % 8) of byte (i / 8). */
  private def readBitmap(c: Cursor, n: Int): Array[Boolean] = {
    val bytes = c.bytes((n + 7) / 8)
    Array.tabulate(n)(i => (bytes(i / 8) & (1 << (i % 8))) != 0)
  }

  // ---- ROWS events -----------------------------------------------------

  /** One decoded row image: value per *table* column; None = SQL NULL,
    * absent columns (not in the present bitmap) also None. */
  type RowImage = Array[Option[String]]

  final case class Rows(
      tableId: Long,
      // insert/delete: one image per row. update: (before, after) pairs.
      images: Seq[RowImage],
      pairs: Seq[(RowImage, RowImage)])

  private def isUpdate(t: Int): Boolean = t == UpdateRowsV2 || t == UpdateRowsV1
  private[sources] def isRows(t: Int): Boolean =
    t >= WriteRowsV1 && t <= DeleteRowsV1 || t >= WriteRowsV2 && t <= DeleteRowsV2

  def decodeRows(body: Array[Byte], eventType: Int, tm: TableMap): Rows = {
    val c = new Cursor(body, 0)
    val tableId = c.u48()
    c.u16() // flags
    if (eventType >= WriteRowsV2) { // v1 (5.1-5.5) has no extra-data field
      val extraLen = c.u16() // v2 extra-data length, includes its own 2 bytes
      require(extraLen >= 2, s"bad ROWS extra-data length $extraLen")
      c.bytes(extraLen - 2)
    }
    val n = c.lenenc().toInt
    require(n == tm.types.length,
      s"ROWS column count $n != TABLE_MAP ${tm.types.length} for ${tm.db}.${tm.table}")
    val present1 = readBitmap(c, n)
    val present2 = if (isUpdate(eventType)) readBitmap(c, n) else present1
    val images = Vector.newBuilder[RowImage]
    val pairs = Vector.newBuilder[(RowImage, RowImage)]
    while (c.remaining > 0) {
      if (isUpdate(eventType)) {
        val before = readImage(c, tm, present1)
        val after = readImage(c, tm, present2)
        pairs += ((before, after))
      } else {
        images += readImage(c, tm, present1)
      }
    }
    Rows(tableId, images.result(), pairs.result())
  }

  private def readImage(c: Cursor, tm: TableMap, present: Array[Boolean]): RowImage = {
    val nPresent = present.count(identity)
    val nullBits = readBitmap(c, nPresent)
    val out = new Array[Option[String]](tm.types.length)
    var i = 0
    var pi = 0
    while (i < tm.types.length) {
      out(i) =
        if (!present(i)) None
        else {
          val isNull = nullBits(pi); pi += 1
          if (isNull) None
          else Some(decodeValue(c, tm.types(i), tm.meta(i), tm.isUnsigned(i)))
        }
      i += 1
    }
    out
  }

  // ---- scalar value decode --------------------------------------------

  private val dig2bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)

  def decodeValue(c: Cursor, typ: Int, meta: Int,
      unsigned: Boolean = false): String = typ match {
    // integer signedness comes from the SIGNEDNESS metadata TLV when
    // the server logs it (binlog_row_metadata); without it the wire
    // bytes are ambiguous and the decode defaults to signed — the
    // same default the reference's replication library takes
    case Type.Tiny => (if (unsigned) c.u8() else c.i8()).toString
    case Type.Short => (if (unsigned) c.u16() else c.i16()).toString
    case Type.Int24 => (if (unsigned) c.u24() else c.i24()).toString
    case Type.Long => (if (unsigned) c.u32() else c.i32().toLong).toString
    case Type.LongLong =>
      if (unsigned) java.lang.Long.toUnsignedString(c.i64()) else c.i64().toString
    case Type.Year => { val v = c.u8(); if (v == 0) "0000" else (1900 + v).toString }
    case Type.Float => java.lang.Float.intBitsToFloat(c.i32()).toString
    case Type.Double => java.lang.Double.longBitsToDouble(c.i64()).toString
    case Type.Date =>
      val v = c.u24()
      val d = v & 31; val m = (v >> 5) & 15; val y = v >> 9
      f"$y%04d-$m%02d-$d%02d"
    case Type.Datetime2 => decodeDatetime2(c, meta)
    case Type.Timestamp2 => decodeTimestamp2(c, meta)
    case Type.Time2 => decodeTime2(c, meta)
    case Type.Varchar | Type.VarString =>
      val len = if (meta < 256) c.u8() else c.u16()
      new String(c.bytes(len), UTF_8)
    case Type.String | Type.Enum | Type.Set => decodeStringFamily(c, typ, meta)
    case Type.Blob =>
      val len = meta match {
        case 1 => c.u8().toLong
        case 2 => c.u16().toLong
        case 3 => c.u24().toLong
        case 4 => c.u32()
        case m => throw new IllegalArgumentException(s"bad BLOB length-bytes metadata $m")
      }
      new String(c.bytes(len.toInt), UTF_8) // ≙ deserialize() []uint8→string (mysql_utils.go:50-63)
    case Type.Bit =>
      // metadata bytes are (bits % 8, bits / 8) — Field_bit::do_save_field_metadata
      val nbits = ((meta >> 8) & 0xff) + (meta & 0xff) * 8
      java.lang.Long.toUnsignedString(c.be((nbits + 7) / 8))
    case Type.NewDecimal => decodeDecimal(c, (meta >> 8) & 0xff, meta & 0xff)
    case Type.Json =>
      // meta = length-bytes of the size prefix (4 on modern servers);
      // payload is the in-row JSONB blob → canonical JSON text, the
      // same shape the reference hands downstream for json columns
      // (mysql_utils.go:55-62)
      val len = meta match {
        case 1 => c.u8().toLong
        case 2 => c.u16().toLong
        case 3 => c.u24().toLong
        case 4 => c.u32()
        case m => throw new IllegalArgumentException(s"bad JSON length-bytes metadata $m")
      }
      Jsonb.decode(c.bytes(len.toInt))
    case t => throw new UnsupportedOperationException(s"unsupported binlog column type $t")
  }

  /** STRING metadata splits the real type across the two metadata
    * bytes when the declared length > 255 (public row-event spec). */
  private def decodeStringFamily(c: Cursor, typ: Int, meta: Int): String = {
    var realType = typ
    var maxLen = meta & 0xff
    val b0 = (meta >> 8) & 0xff
    if (b0 > 0) {
      if ((b0 & 0x30) != 0x30) {
        realType = b0 | 0x30
        maxLen = (meta & 0xff) | (((b0 & 0x30) ^ 0x30) << 4)
      } else {
        realType = b0
      }
    }
    realType match {
      case Type.Enum =>
        (if (maxLen == 1) c.u8() else c.u16()).toString // 1-based index
      case Type.Set =>
        var v = 0L; var i = 0
        while (i < maxLen) { v |= (c.u8().toLong << (8 * i)); i += 1 }
        java.lang.Long.toUnsignedString(v) // member bitmask
      case _ =>
        val len = if (maxLen > 255) c.u16() else c.u8()
        new String(c.bytes(len), UTF_8)
    }
  }

  /** NEWDECIMAL: sign-flipped big-endian base-10^9 groups, leading /
    * trailing partial groups stored in the minimal byte width.
    * Rendered at exact declared scale (matches the engine-wide
    * exact-decimal stance). */
  def decodeDecimal(c: Cursor, precision: Int, scale: Int): String = {
    val intg = precision - scale
    val intg0 = intg / 9; val intgx = intg - intg0 * 9
    val frac0 = scale / 9; val fracx = scale - frac0 * 9
    val binSize = intg0 * 4 + dig2bytes(intgx) + frac0 * 4 + dig2bytes(fracx)
    val raw = c.bytes(binSize)
    val positive = (raw(0) & 0x80) != 0
    raw(0) = (raw(0) ^ 0x80).toByte
    if (!positive) { var i = 0; while (i < raw.length) { raw(i) = (~raw(i)).toByte; i += 1 } }
    val rc = new Cursor(raw, 0)
    val sb = new StringBuilder
    if (intgx > 0) sb.append(rc.be(dig2bytes(intgx)).toString)
    var i = 0
    while (i < intg0) {
      val g = rc.be(4)
      sb.append(if (sb.isEmpty) g.toString else f"$g%09d")
      i += 1
    }
    if (sb.isEmpty) sb.append("0")
    val intPart = sb.toString.dropWhile(_ == '0') match { case "" => "0"; case s => s }
    val fb = new StringBuilder
    i = 0
    while (i < frac0) { fb.append(f"${rc.be(4)}%09d"); i += 1 }
    if (fracx > 0) {
      val g = rc.be(dig2bytes(fracx))
      fb.append(s"%0${fracx}d".format(g))
    }
    val sign = if (positive) "" else "-"
    if (scale == 0) s"$sign$intPart" else s"$sign$intPart.${fb.toString}"
  }

  /** Fractional-seconds suffix shared by DATETIME2/TIMESTAMP2:
    * ceil(fsp/2) big-endian bytes holding the fraction at 2·n-digit
    * resolution; odd fsp (DATETIME(3) — the common ORM default)
    * renders the leading fsp digits (the trailing packed digit is
    * always zero for in-spec values). */
  private def readFrac(c: Cursor, fsp: Int): String = {
    require(fsp >= 0 && fsp <= 6, s"invalid fractional-seconds precision $fsp")
    if (fsp == 0) ""
    else {
      val n = (fsp + 1) / 2
      val v = c.be(n)
      "." + s"%0${2 * n}d".format(v).take(fsp)
    }
  }

  private def decodeDatetime2(c: Cursor, fsp: Int): String = {
    val v = c.be(5) // 1 sign, 17 yyyymm (year*13+month), 5 day, 5 hr, 6 min, 6 sec
    val ym = ((v >> 22) & 0x1ffff).toInt
    val year = ym / 13; val month = ym % 13
    val day = ((v >> 17) & 0x1f).toInt
    val hour = ((v >> 12) & 0x1f).toInt
    val min = ((v >> 6) & 0x3f).toInt
    val sec = (v & 0x3f).toInt
    f"$year%04d-$month%02d-$day%02d $hour%02d:$min%02d:$sec%02d" + readFrac(c, fsp)
  }

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  private def decodeTimestamp2(c: Cursor, fsp: Int): String =
    tsFmt.format(Instant.ofEpochSecond(c.be(4))) + readFrac(c, fsp)

  /** TIME2: the packed time AND its fraction form ONE (3+n)-byte
    * big-endian integer offset by 2^(23+8n), so negative durations
    * borrow through the fraction correctly. */
  private def decodeTime2(c: Cursor, fsp: Int): String = {
    require(fsp >= 0 && fsp <= 6, s"invalid fractional-seconds precision $fsp")
    val n = (fsp + 1) / 2
    val total = c.be(3 + n)
    val delta = total - (1L << (23 + 8 * n))
    val (sign, abs) = if (delta >= 0) ("", delta) else ("-", -delta)
    val packed = abs >> (8 * n)
    val h = (packed >> 12) & 0x3ff; val m = (packed >> 6) & 0x3f; val s = packed & 0x3f
    val frac =
      if (fsp == 0) ""
      else "." + s"%0${2 * n}d".format(abs & ((1L << (8 * n)) - 1)).take(fsp)
    f"$sign$h%02d:$m%02d:$s%02d$frac"
  }

  // ---- GTID set --------------------------------------------------------

  /** Merged-interval GTID set; appends of consecutive gnos are O(1),
    * arbitrary inserts merge locally. Render matches the canonical
    * `uuid:a-b[:c-d],uuid2:…` form the reference persists as its
    * position string (`inputs/mysql/mysql_position.go:37-54`). */
  final class GtidSet {
    private val sids = mutable.LinkedHashMap[String, mutable.ArrayBuffer[(Long, Long)]]()

    def add(sid: String, gno: Long): Unit = {
      val iv = sids.getOrElseUpdate(sid, mutable.ArrayBuffer.empty)
      val idx = iv.lastIndexWhere(_._1 <= gno)
      if (idx >= 0 && gno <= iv(idx)._2) return // already covered
      if (idx >= 0 && iv(idx)._2 + 1 == gno) iv(idx) = (iv(idx)._1, gno)
      else iv.insert(idx + 1, (gno, gno))
      val at = if (idx >= 0 && iv(idx)._2 >= gno) idx else idx + 1
      if (at + 1 < iv.length && iv(at)._2 + 1 == iv(at + 1)._1) {
        iv(at) = (iv(at)._1, iv(at + 1)._2)
        iv.remove(at + 1)
      }
    }

    /** Insert a whole [start, stopExclusive) interval in one splice —
      * PREVIOUS_GTIDS seeds can span millions of gnos, so this must
      * not degrade to per-gno adds. */
    def addInterval(sid: String, start: Long, stopExclusive: Long): Unit = {
      if (stopExclusive <= start) return
      val iv = sids.getOrElseUpdate(sid, mutable.ArrayBuffer.empty)
      val a = start; val b = stopExclusive - 1
      // all intervals touching [a-1, b+1] merge with the new one
      val lo = iv.indexWhere(_._2 >= a - 1) match { case -1 => iv.length; case i => i }
      var hi = lo
      while (hi < iv.length && iv(hi)._1 <= b + 1) hi += 1
      val merged =
        if (lo == hi) (a, b)
        else (math.min(a, iv(lo)._1), math.max(b, iv(hi - 1)._2))
      iv.remove(lo, hi - lo)
      iv.insert(lo, merged)
    }

    // MariaDB dialect: GTID = domain-server-seqno; the executed set
    // keeps the max-seqno GTID per DOMAIN — MariaDB's gtid_slave_pos
    // form ("0-1-42,1-2-7") allows at most one GTID per domain, so a
    // server-id change within a domain (failover, multi-server
    // GTID_LIST seed) must replace, not accumulate: seqnos are
    // per-domain monotone across servers on a healthy topology, and a
    // two-GTIDs-per-domain pos would be rejected at resume by
    // `@slave_connect_state`.
    private val maria = mutable.LinkedHashMap[Long, (Long, Long)]()

    def addMaria(domain: Long, serverId: Long, seqno: Long): Unit =
      maria.get(domain) match {
        case Some((_, q)) if q >= seqno => ()
        case _ => maria(domain) = (serverId, seqno)
      }

    /** A stream is one dialect or the other; when MariaDB GTIDs are
      * present they ARE the position (a MySQL-uuid set never coexists
      * on the same master). */
    def render: String =
      if (maria.nonEmpty)
        maria.iterator.map { case (d, (s, q)) => s"$d-$s-$q" }.mkString(",")
      else
        sids.iterator.map { case (sid, iv) =>
          sid + ":" + iv.map { case (a, b) => if (a == b) s"$a" else s"$a-$b" }.mkString(":")
        }.mkString(",")
  }

  private def sidString(b: Array[Byte]): String = {
    val hex = b.map(x => f"${x & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
  }

  // ---- event stream → ChangeEvents ------------------------------------

  /** Decode a whole binlog segment into [[ChangeEvent]]s.
    *
    * `names` supplies column names per routed (db, table) — the
    * binlog carries types but not names, exactly why the reference
    * pairs the stream with a meta snapshot (`mysql_meta.go:32-69`).
    * Unrouted tables are skipped (≙ drop-if-unrouted,
    * `mysql_replication.go:83-86`); arity mismatch fails loudly
    * (`mysql_replication.go:88-91`). DDL (QUERY) events emit
    * `op="ddl"` rows for [[graft.streaming.SchemaEvolution]], with
    * BEGIN and online-schema-change shadow-table noise filtered
    * (`mysql_replication.go:136-185`).
    *
    * @param seqBase base for the monotone per-event sequence; callers
    *        decoding segment k of a series pass a disjoint base so
    *        seqs stay globally monotone (file order = binlog order).
    */
  def changeEvents(
      bytes: Array[Byte],
      names: Map[(String, String), Seq[String]],
      seqBase: Long = 0L): Vector[ChangeEvent] = {
    var seq = seqBase
    // counter-based seqs: dense, no byte-space constraint — a
    // compressed transaction may emit arbitrarily many rows
    emitCore(bytes, names, (_, _) => { seq += 1; seq }, _ => true,
      boundedSeqSpace = false)
  }

  /** Byte-position variant for the streaming source: an event is
    * emitted iff its start byte ∈ [fromByte, untilByte), and each
    * row's seq is `segBase | (eventStartByte + rowIdx)` — unique
    * (rows-per-event < event size in bytes) and monotone in binlog
    * order, so offsets over BYTES (computable from file sizes alone,
    * no decode) imply exactly-once over events. GTID/TABLE_MAP state
    * replays from the segment head regardless of the range: ROWS
    * events may sit arbitrarily far after the TABLE_MAP they need. */
  def changeEventsByteRange(
      bytes: Array[Byte],
      names: Map[(String, String), Seq[String]],
      segBase: Long,
      fromByte: Long,
      untilByte: Long): Vector[ChangeEvent] =
    emitCore(bytes, names, (off, row) => segBase | (off + row),
      off => off >= fromByte && off < untilByte,
      boundedSeqSpace = true)

  private def emitCore(
      bytes: Array[Byte],
      names: Map[(String, String), Seq[String]],
      mkSeq: (Long, Int) => Long,
      inRange: Long => Boolean,
      boundedSeqSpace: Boolean): Vector[ChangeEvent] = {
    val tableMaps = mutable.Map[Long, TableMap]()
    val gtids = new GtidSet
    val out = Vector.newBuilder[ChangeEvent]

    def img(tm: TableMap, cols: Seq[String], r: RowImage): Map[String, String] =
      cols.iterator.zipWithIndex.flatMap { case (name, i) =>
        r(i).map(name -> _)
      }.toMap

    // One event's handling, factored so TRANSACTION_PAYLOAD can
    // replay its decompressed inner events through the same path.
    // `seqOf(i)` assigns row i's sequence; `inR` is the byte-range
    // decision (inner events inherit the WRAPPER's offset for both —
    // the wrapper is the unit the stream positions/offsets know).
    def handle(ev: Event, seqOf: Int => Long, inR: Boolean): Unit = {
      val ts = new java.sql.Timestamp(ev.header.timestamp * 1000L)
      ev.header.eventType match {
        case FormatDescriptionEvent | RotateEvent | XidEvent | AnonymousGtidEvent => ()
        case GtidEvent =>
          val c = new Cursor(ev.body, 0)
          c.u8() // flags
          val sid = sidString(c.bytes(16))
          gtids.add(sid, c.i64())
        case PreviousGtidsEvent =>
          val c = new Cursor(ev.body, 0)
          val nSids = c.i64()
          var i = 0L
          while (i < nSids) {
            val sid = sidString(c.bytes(16))
            val nIv = c.i64()
            var j = 0L
            while (j < nIv) { gtids.addInterval(sid, c.i64(), c.i64()); j += 1 }
            i += 1
          }
        // MariaDB dialect: GTID is (domain, server_id from the
        // header, seqno); GTID_LIST seeds the executed set at the
        // segment head (≙ PREVIOUS_GTIDS)
        case MariaGtidEvent =>
          val c = new Cursor(ev.body, 0)
          val seqno = c.i64()
          val domain = c.u32()
          gtids.addMaria(domain, ev.header.serverId, seqno)
        case MariaGtidListEvent =>
          val c = new Cursor(ev.body, 0)
          val n = (c.u32() & 0x0fffffffL).toInt // low 28 bits = count
          var i = 0
          while (i < n) {
            val domain = c.u32(); val server = c.u32(); val seqno = c.i64()
            gtids.addMaria(domain, server, seqno)
            i += 1
          }
        case MariaAnnotateRowsEvent | MariaBinlogCheckpointEvent =>
          () // SQL-text annotation / checkpoint marker: informational
        case MariaStartEncryptionEvent => throw new IllegalStateException(
          "encrypted binlog (MariaDB START_ENCRYPTION) is unsupported — " +
            "decoding would need the key file; disable encrypt_binlog " +
            "for the replication user")
        case t if t == MariaQueryCompressedEvent ||
            (t >= MariaCompressedRowsFirst && t <= MariaCompressedRowsLast) =>
          throw new IllegalStateException(
            s"MariaDB per-event compression (event type $t) is unsupported — " +
              "set log_bin_compress=OFF on the master")
        case TransactionPayloadEvent =>
          // MySQL 8.0.20+ binlog_transaction_compression: the whole
          // transaction (BEGIN..COMMIT minus its GTID event) arrives
          // as one ZSTD-compressed wrapper. Decompress and replay the
          // inner events through this same handler. Inner rows number
          // sequentially across the payload under the WRAPPER's
          // offset. Only the BYTE-OFFSET seq scheme (the streaming
          // source) needs the dense numbering to stay inside the
          // wrapper's byte footprint — past it, row seqs would
          // collide with the next event's and per-key compaction
          // order could invert, so that path fails loudly with the
          // workaround. The counter-based batch path (changeEvents /
          // BinlogFiles) has no such constraint and ingests
          // arbitrarily large compressed transactions.
          var cum = 0
          val limit = ev.header.eventSize
          val inner = innerEvents(decodeTransactionPayload(ev.body))
          inner.foreach { ie =>
            handle(ie, _ => {
              require(!boundedSeqSpace || cum < limit,
                s"transaction payload at offset ${ev.offset} emits more " +
                  s"rows ($cum) than its wrapper spans bytes ($limit): " +
                  "the streaming source's byte-offset sequence space " +
                  "cannot stay unique — ingest this segment through the " +
                  "batch binlog-files path, or disable " +
                  "binlog_transaction_compression for ultra-compressible " +
                  "bulk loads")
              val s = seqOf(cum); cum += 1; s
            }, inR)
          }
        case TableMapEvent =>
          val tm = decodeTableMap(ev.body)
          tableMaps(tm.tableId) = tm
        case QueryEvent =>
          val c = new Cursor(ev.body, 0)
          c.u32(); c.u32() // thread id, exec time
          val schemaLen = c.u8()
          c.u16() // error code
          val statusLen = c.u16()
          c.bytes(statusLen)
          val db = new String(c.bytes(schemaLen), UTF_8); c.u8() // NUL
          val sql = new String(c.bytes(c.remaining), UTF_8)
          val upper = sql.trim.toUpperCase
          val shadow = DdlParser.parse(sql, db).exists {
            case (_, stmts) => stmts.exists(s => DdlParser.isShadowTable(s.table))
          }
          if (upper != "BEGIN" && upper != "COMMIT" && !shadow && inR) {
            out += ChangeEvent(db, "", graft.streaming.SchemaEvolution.DdlOp, ts,
              gtids.render, seqOf(0), 0, Map("sql" -> sql), null)
          }
        case t if isRows(t) =>
          val tmPre = {
            val c = new Cursor(ev.body, 0)
            val id = c.u48()
            tableMaps.getOrElse(id,
              throw new IllegalStateException(s"ROWS event for unknown table id $id (no TABLE_MAP seen)"))
          }
          names.get((tmPre.db, tmPre.table)) match {
            case None => () // unrouted table: skip
            case Some(conf) if inR =>
              // "*" = take names from the COLUMN_NAME metadata TLV —
              // a binlog_row_metadata=FULL segment is self-describing
              val cols =
                if (conf == Seq("*")) tmPre.columnNames.getOrElse(
                  throw new IllegalStateException(
                    s"routed ${tmPre.db}.${tmPre.table} is configured '*' but the " +
                      "segment carries no COLUMN_NAME metadata " +
                      "(needs binlog_row_metadata=FULL on the server)"))
                else conf
              require(cols.length == tmPre.types.length,
                s"routed ${tmPre.db}.${tmPre.table} has ${cols.length} configured columns " +
                  s"but the binlog TABLE_MAP carries ${tmPre.types.length}")
              val rows = decodeRows(ev.body, t, tmPre)
              val pos = gtids.render
              if (isUpdate(t)) {
                rows.pairs.zipWithIndex.foreach { case ((before, after), i) =>
                  out += ChangeEvent(tmPre.db, tmPre.table, ChangeEvent.Update, ts,
                    pos, seqOf(i), 0,
                    img(tmPre, cols, after), img(tmPre, cols, before))
                }
              } else {
                val op = if (t == WriteRowsV2 || t == WriteRowsV1) ChangeEvent.Insert
                  else ChangeEvent.Delete
                rows.images.zipWithIndex.foreach { case (r, i) =>
                  out += ChangeEvent(tmPre.db, tmPre.table, op, ts,
                    pos, seqOf(i), 0, img(tmPre, cols, r), null)
                }
              }
            case Some(_) => () // routed but outside this batch's byte range
          }
        case other =>
          () // unknown/auxiliary event types are skippable by design (header carries the size)
      }
    }

    for (ev <- rawEvents(bytes))
      handle(ev, i => mkSeq(ev.offset, i), inRange(ev.offset))
    out.result()
  }
}
