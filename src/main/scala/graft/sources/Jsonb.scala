package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** MySQL binary JSON ("JSONB") decoder — the in-row storage format
  * JSON columns arrive in over the binlog (public format: MySQL
  * source `sql/json_binary.h` documentation block / internals manual
  * "JSON storage format").
  *
  * Renders canonical JSON text, which is what the reference's
  * deserialize step hands downstream for json columns
  * (`inputs/mysql/mysql_utils.go:50-63` — []uint8 → string). Key
  * order is storage order (MySQL sorts object keys by length then
  * bytes at write time; we preserve whatever is stored).
  *
  * Supported: small/large objects and arrays (u16/u32 headers),
  * inlined scalars, literals, all int widths, double, utf8 strings
  * (varint length), and opaque values carrying NEWDECIMAL (rendered
  * as a bare decimal number, reusing [[Binlog.decodeDecimal]]).
  * Full-image values only — `binlog_row_value_options=PARTIAL_JSON`
  * diffs are rejected loudly (non-default server config).
  */
object Jsonb {

  // type bytes
  private val SmallObject = 0x00
  private val LargeObject = 0x01
  private val SmallArray = 0x02
  private val LargeArray = 0x03
  private val Literal = 0x04
  private val Int16 = 0x05
  private val UInt16 = 0x06
  private val Int32 = 0x07
  private val UInt32 = 0x08
  private val Int64 = 0x09
  private val UInt64 = 0x0a
  private val DoubleT = 0x0b
  private val StringT = 0x0c
  private val Opaque = 0x0f

  /** Decode a whole JSONB blob (as stored in a row image) to JSON
    * text. An empty blob is SQL NULL-adjacent — MySQL never stores
    * it for a non-null JSON value — so callers handle null before
    * calling; we reject it loudly. */
  def decode(blob: Array[Byte]): String = {
    require(blob.nonEmpty, "empty JSONB blob")
    value(blob, blob(0) & 0xff, 1)
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong) | (u16(b, o + 2).toLong << 16)
  private def i64(b: Array[Byte], o: Int): Long =
    u32(b, o) | (u32(b, o + 4) << 32)

  /** Variable-length int: 7 bits per byte, high bit = continuation. */
  private def varint(b: Array[Byte], o: Int): (Int, Int) = {
    var len = 0; var shift = 0; var i = o
    while ({
      val x = b(i) & 0xff
      len |= (x & 0x7f) << shift
      shift += 7; i += 1
      (x & 0x80) != 0
    }) ()
    (len, i)
  }

  /** Decode the value whose *payload* starts at `o`; for container
    * types `o` is the base that in-container offsets are relative to. */
  private def value(b: Array[Byte], typ: Int, o: Int): String = typ match {
    case SmallObject => container(b, o, large = false, obj = true)
    case LargeObject => container(b, o, large = true, obj = true)
    case SmallArray => container(b, o, large = false, obj = false)
    case LargeArray => container(b, o, large = true, obj = false)
    case Literal => (b(o) & 0xff) match {
      case 0 => "null"
      case 1 => "true"
      case 2 => "false"
      case v => throw new IllegalArgumentException(s"bad JSONB literal $v")
    }
    case Int16 => u16(b, o).toShort.toString
    case UInt16 => u16(b, o).toString
    case Int32 => u32(b, o).toInt.toString
    case UInt32 => u32(b, o).toString
    case Int64 => i64(b, o).toString
    case UInt64 => java.lang.Long.toUnsignedString(i64(b, o))
    case DoubleT => java.lang.Double.longBitsToDouble(i64(b, o)).toString
    case StringT =>
      val (len, dataOff) = varint(b, o)
      quote(new String(b, dataOff, len, UTF_8))
    case Opaque =>
      val fieldType = b(o) & 0xff
      val (len, dataOff) = varint(b, o + 1)
      fieldType match {
        case Binlog.Type.NewDecimal =>
          val precision = b(dataOff) & 0xff
          val scale = b(dataOff + 1) & 0xff
          Binlog.decodeDecimal(
            new Binlog.Cursor(b, dataOff + 2), precision, scale)
        case t => throw new UnsupportedOperationException(
          s"opaque JSONB field type $t unsupported (len=$len)")
      }
    case t => throw new UnsupportedOperationException(
      s"JSONB type 0x${t.toHexString} unsupported " +
        "(PARTIAL_JSON diffs and dates-in-json are out of scope)")
  }

  private def container(b: Array[Byte], base: Int, large: Boolean, obj: Boolean): String = {
    val w = if (large) 4 else 2
    def word(o: Int): Int =
      if (large) u32(b, o).toInt else u16(b, o)
    val count = word(base)
    // word(base + w) is total size in bytes — not needed for decode
    var o = base + 2 * w
    val keys: IndexedSeq[String] =
      if (!obj) IndexedSeq.empty
      else {
        val ks = (0 until count).map { i =>
          val keyOff = word(o + i * (w + 2))
          val keyLen = u16(b, o + i * (w + 2) + w)
          new String(b, base + keyOff, keyLen, UTF_8)
        }
        o += count * (w + 2)
        ks
      }
    val vals = (0 until count).map { i =>
      val entry = o + i * (1 + w)
      val typ = b(entry) & 0xff
      typ match {
        // inlined in the entry itself (small containers inline 16-bit
        // scalars; large containers inline 32-bit too)
        case Literal | Int16 | UInt16 => value(b, typ, entry + 1)
        case Int32 | UInt32 if large => value(b, typ, entry + 1)
        case _ =>
          val off = word(entry + 1)
          value(b, typ, base + off)
      }
    }
    if (obj) keys.zip(vals).map { case (k, v) => s"${quote(k)}:$v" }.mkString("{", ",", "}")
    else vals.mkString("[", ",", "]")
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }
}
