package graft.sources

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import scala.collection.mutable.ArrayBuffer

/** MySQL client/server **wire protocol** primitives — the layer the
  * reference delegates to the go-mysql driver underneath its
  * `replication.BinlogSyncer` (`inputs/mysql/mysql_replication.go:
  * 25-37` configures host/port/user/password and never sees a byte).
  * A complete engine needs the protocol itself; this is a
  * from-scratch implementation of the publicly documented MySQL
  * client/server protocol (MySQL internals manual, "Client/Server
  * Protocol"): packet framing, the v10 handshake, both standard
  * password scrambles, OK/ERR/EOF envelopes, text resultsets, and
  * the replication commands (COM_REGISTER_SLAVE, COM_BINLOG_DUMP,
  * COM_BINLOG_DUMP_GTID).
  *
  * Pure byte-level functions plus a tiny blocking [[PacketIO]];
  * session logic (auth flow, query round-trips, the dump loop) lives
  * in [[BinlogClient]]. Everything here is driver-side control-plane
  * I/O: the data plane stays the relay-segment files the DSv2 source
  * reads ([[BinlogStreamSource]]), so executors never hold sockets.
  */
object MySqlWire {

  // ---- capability flags (protocol constants) ---------------------------
  val ClientLongPassword = 0x00000001L
  val ClientFoundRows = 0x00000002L
  val ClientLongFlag = 0x00000004L
  val ClientConnectWithDb = 0x00000008L
  val ClientProtocol41 = 0x00000200L
  val ClientSecureConnection = 0x00008000L
  val ClientPluginAuth = 0x00080000L
  val ClientPluginAuthLenencData = 0x00200000L

  /** Capabilities this client advertises. EOF-terminated resultsets
    * (no CLIENT_DEPRECATE_EOF) keep the parse to one shape. */
  val ClientCapabilities: Long =
    ClientLongPassword | ClientLongFlag | ClientProtocol41 |
      ClientSecureConnection | ClientPluginAuth

  // ---- command bytes ---------------------------------------------------
  val ComQuit = 0x01
  val ComQuery = 0x03
  val ComPing = 0x0e
  val ComBinlogDump = 0x12
  val ComRegisterSlave = 0x15
  val ComBinlogDumpGtid = 0x1e

  /** COM_BINLOG_DUMP* flags (MySQL source, sql/rpl_binlog_sender). */
  val BinlogDumpNonBlock = 0x01
  val BinlogThroughPosition = 0x02
  val BinlogThroughGtid = 0x04

  val NativePasswordPlugin = "mysql_native_password"
  val CachingSha2Plugin = "caching_sha2_password"

  val MaxPacketPayload = 0xffffff // 16 MiB − 1: the framing split point

  // ---- little-endian byte builder (the write twin of Binlog.Cursor) ----
  final class ByteWriter {
    private val b = ArrayBuffer.empty[Byte]
    def u8(v: Int): ByteWriter = { b += (v & 0xff).toByte; this }
    def u16(v: Int): ByteWriter = { u8(v); u8(v >> 8) }
    def u24(v: Int): ByteWriter = { u8(v); u8(v >> 8); u8(v >> 16) }
    def u32(v: Long): ByteWriter = {
      u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt)
    }
    def u64(v: Long): ByteWriter = { u32(v); u32(v >>> 32) }
    def raw(a: Array[Byte]): ByteWriter = { b ++= a; this }
    def str(s: String): ByteWriter = raw(s.getBytes(UTF_8))
    def strNul(s: String): ByteWriter = { str(s); u8(0) }
    def lenenc(v: Long): ByteWriter =
      if (v < 0xfb) u8(v.toInt)
      else if (v < 0x10000) { u8(0xfc); u16(v.toInt) }
      else if (v < 0x1000000) { u8(0xfd); u24(v.toInt) }
      else { u8(0xfe); u64(v) }
    def result: Array[Byte] = b.toArray
  }

  // ---- packet framing --------------------------------------------------

  /** Blocking packet reader/writer: 3-byte little-endian payload
    * length + 1-byte sequence id, payloads ≥ 16 MiB − 1 split into
    * continuation packets (a terminating packet is any with payload
    * < 0xffffff, per the protocol's framing rule). Sequence ids are
    * checked on read and auto-incremented on write; command
    * boundaries reset them via [[resetSeq]]. */
  final class PacketIO(in: InputStream, out: OutputStream) {
    private var seq = 0
    def resetSeq(): Unit = seq = 0
    def expectedSeq: Int = seq

    private def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new EOFException(
          s"connection closed mid-packet ($off of $n bytes)")
        off += r
      }
      buf
    }

    def read(): Array[Byte] = {
      var total = ArrayBuffer.empty[Byte]
      var more = true
      while (more) {
        val h = readFully(4)
        val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
        val got = h(3) & 0xff
        if (got != (seq & 0xff)) throw new IllegalStateException(
          s"packet sequence mismatch: expected ${seq & 0xff}, got $got")
        seq += 1
        total ++= readFully(len)
        more = len == MaxPacketPayload
      }
      total.toArray
    }

    def write(payload: Array[Byte]): Unit = {
      var off = 0
      // A payload of exactly n·0xffffff bytes needs a trailing empty
      // packet to terminate the sequence — hence do-while.
      var first = true
      while (first || off < payload.length ||
          (payload.length % MaxPacketPayload == 0 && payload.nonEmpty &&
            off == payload.length && payloadEndedOnBoundary(payload, off))) {
        first = false
        val n = math.min(MaxPacketPayload, payload.length - off)
        out.write(Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
          ((n >> 16) & 0xff).toByte, (seq & 0xff).toByte))
        out.write(payload, off, n)
        seq += 1
        off += n
        if (n < MaxPacketPayload) off = payload.length + 1 // terminated
      }
      out.flush()
    }

    private def payloadEndedOnBoundary(p: Array[Byte], off: Int): Boolean =
      off == p.length && p.length % MaxPacketPayload == 0

    /** Send a command packet (sequence restarts at 0 per command). */
    def command(payload: Array[Byte]): Unit = { resetSeq(); write(payload) }
  }

  // ---- handshake -------------------------------------------------------

  final case class Handshake(
      protocolVersion: Int,
      serverVersion: String,
      threadId: Long,
      scramble: Array[Byte], // 20 bytes (part1 ++ part2, NUL stripped)
      capabilities: Long,
      charset: Int,
      statusFlags: Int,
      authPlugin: String)

  /** Parse Protocol::HandshakeV10 (the server greeting). */
  def parseHandshake(p: Array[Byte]): Handshake = {
    if (p.nonEmpty && (p(0) & 0xff) == 0xff) {
      val e = parseErr(p)
      throw new IllegalStateException(s"server rejected connection: ${e.code} ${e.message}")
    }
    val c = new Binlog.Cursor(p, 0)
    val proto = c.u8()
    require(proto == 10, s"unsupported handshake protocol version $proto")
    val svEnd = p.indexOf(0.toByte, c.off)
    val serverVersion = new String(p, c.off, svEnd - c.off, UTF_8)
    c.off = svEnd + 1
    val threadId = c.u32()
    val part1 = c.bytes(8)
    c.u8() // filler
    val capLow = c.u16().toLong
    var charset = 0
    var status = 0
    var capHigh = 0L
    var authDataLen = 0
    var part2 = Array.emptyByteArray
    var plugin = NativePasswordPlugin
    if (c.remaining > 0) {
      charset = c.u8()
      status = c.u16()
      capHigh = c.u16().toLong
      authDataLen = c.u8()
      c.bytes(10) // reserved
      val caps = capLow | (capHigh << 16)
      if ((caps & ClientSecureConnection) != 0) {
        val n = math.max(13, authDataLen - 8)
        part2 = c.bytes(math.min(n, c.remaining))
        // trailing NUL terminator is not scramble material
        if (part2.nonEmpty && part2.last == 0) part2 = part2.dropRight(1)
      }
      if ((caps & ClientPluginAuth) != 0 && c.remaining > 0) {
        val end = p.indexOf(0.toByte, c.off)
        val stop = if (end < 0) p.length else end
        plugin = new String(p, c.off, stop - c.off, UTF_8)
      }
    }
    Handshake(proto, serverVersion, threadId, part1 ++ part2,
      capLow | (capHigh << 16), charset, status, plugin)
  }

  /** Build Protocol::HandshakeResponse41. */
  def handshakeResponse(
      user: String,
      authResponse: Array[Byte],
      authPlugin: String,
      database: Option[String] = None,
      capabilities: Long = ClientCapabilities): Array[Byte] = {
    val caps = capabilities | (if (database.isDefined) ClientConnectWithDb else 0L)
    val w = new ByteWriter()
      .u32(caps)
      .u32(MaxPacketPayload.toLong) // max packet size
      .u8(33) // utf8_general_ci
    w.raw(new Array[Byte](23)) // zero filler
    w.strNul(user)
    if ((caps & ClientPluginAuthLenencData) != 0)
      w.lenenc(authResponse.length.toLong).raw(authResponse)
    else
      w.u8(authResponse.length).raw(authResponse)
    database.foreach(w.strNul)
    if ((caps & ClientPluginAuth) != 0) w.strNul(authPlugin)
    w.result
  }

  // ---- auth scrambles --------------------------------------------------

  private def digest(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance(alg)
    parts.foreach(md.update)
    md.digest()
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** mysql_native_password token:
    * `SHA1(pwd) XOR SHA1(scramble ++ SHA1(SHA1(pwd)))`. The server
    * stores `SHA1(SHA1(pwd))` and verifies by recovering `SHA1(pwd)`
    * from the token and hashing once more. Empty password → empty
    * token (protocol rule). */
  def nativePasswordToken(password: String, scramble: Array[Byte]): Array[Byte] =
    if (password.isEmpty) Array.emptyByteArray
    else {
      val s1 = digest("SHA-1", password.getBytes(UTF_8))
      xor(s1, digest("SHA-1", scramble.take(20), digest("SHA-1", s1)))
    }

  /** caching_sha2_password fast-path token:
    * `SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) ++ scramble)`. */
  def cachingSha2Token(password: String, scramble: Array[Byte]): Array[Byte] =
    if (password.isEmpty) Array.emptyByteArray
    else {
      val s1 = digest("SHA-256", password.getBytes(UTF_8))
      xor(s1, digest("SHA-256", digest("SHA-256", s1), scramble.take(20)))
    }

  def tokenFor(plugin: String, password: String, scramble: Array[Byte]): Array[Byte] =
    plugin match {
      case NativePasswordPlugin => nativePasswordToken(password, scramble)
      case CachingSha2Plugin => cachingSha2Token(password, scramble)
      case other => throw new IllegalArgumentException(
        s"unsupported auth plugin '$other' (supported: " +
          s"$NativePasswordPlugin, $CachingSha2Plugin)")
    }

  // ---- generic response envelopes --------------------------------------

  final case class Ok(affectedRows: Long, lastInsertId: Long,
      statusFlags: Int, warnings: Int)
  final case class Err(code: Int, sqlState: String, message: String)

  final class MySqlErrorException(val err: Err)
    extends RuntimeException(s"MySQL error ${err.code} (${err.sqlState}): ${err.message}")

  def isOk(p: Array[Byte]): Boolean = p.nonEmpty && (p(0) & 0xff) == 0x00
  def isErr(p: Array[Byte]): Boolean = p.nonEmpty && (p(0) & 0xff) == 0xff
  /** EOF packets are 0xfe with payload < 9 bytes (longer 0xfe-lead
    * packets are AuthSwitchRequest / lenenc-int 8-byte prefixes). */
  def isEof(p: Array[Byte]): Boolean =
    p.nonEmpty && (p(0) & 0xff) == 0xfe && p.length < 9

  def parseOk(p: Array[Byte]): Ok = {
    require(isOk(p) || (p.nonEmpty && (p(0) & 0xff) == 0xfe), "not an OK packet")
    val c = new Binlog.Cursor(p, 1)
    val affected = c.lenenc()
    val lastId = c.lenenc()
    val status = if (c.remaining >= 2) c.u16() else 0
    val warnings = if (c.remaining >= 2) c.u16() else 0
    Ok(affected, lastId, status, warnings)
  }

  def parseErr(p: Array[Byte]): Err = {
    require(isErr(p), "not an ERR packet")
    val c = new Binlog.Cursor(p, 1)
    val code = c.u16()
    // protocol-41 ERR carries '#' + 5-byte SQL state before the text
    val (state, msgOff) =
      if (c.remaining > 0 && p(c.off) == '#') {
        (new String(p, c.off + 1, 5, UTF_8), c.off + 6)
      } else ("HY000", c.off)
    Err(code, state, new String(p, msgOff, p.length - msgOff, UTF_8))
  }

  /** Raise on ERR, pass anything else through. */
  def orThrow(p: Array[Byte]): Array[Byte] =
    if (isErr(p)) throw new MySqlErrorException(parseErr(p)) else p

  // ---- auth continuation packets ---------------------------------------

  /** AuthSwitchRequest: 0xfe + plugin name NUL + fresh scramble. */
  final case class AuthSwitch(plugin: String, scramble: Array[Byte])

  def isAuthSwitch(p: Array[Byte]): Boolean =
    p.nonEmpty && (p(0) & 0xff) == 0xfe && p.length >= 9

  def parseAuthSwitch(p: Array[Byte]): AuthSwitch = {
    require(isAuthSwitch(p), "not an AuthSwitchRequest")
    val end = p.indexOf(0.toByte, 1)
    val plugin = new String(p, 1, end - 1, UTF_8)
    var data = java.util.Arrays.copyOfRange(p, end + 1, p.length)
    if (data.nonEmpty && data.last == 0) data = data.dropRight(1)
    AuthSwitch(plugin, data)
  }

  /** AuthMoreData (0x01 lead): caching_sha2's in-band continuation.
    * 0x03 = fast_auth_success (an OK follows); 0x04 = full auth
    * required (needs TLS or RSA key exchange — out of scope, loud). */
  def isAuthMoreData(p: Array[Byte]): Boolean =
    p.nonEmpty && (p(0) & 0xff) == 0x01

  // ---- commands --------------------------------------------------------

  def comQuery(sql: String): Array[Byte] =
    new ByteWriter().u8(ComQuery).str(sql).result

  def comQuit: Array[Byte] = new ByteWriter().u8(ComQuit).result
  def comPing: Array[Byte] = new ByteWriter().u8(ComPing).result

  /** COM_REGISTER_SLAVE — announces this client in `SHOW REPLICAS`;
    * hostname/user/password report fields are conventionally empty. */
  def comRegisterSlave(serverId: Long, port: Int = 0): Array[Byte] =
    new ByteWriter().u8(ComRegisterSlave).u32(serverId)
      .u8(0) // hostname len
      .u8(0) // user len
      .u8(0) // password len
      .u16(port)
      .u32(0L) // replication rank (unused)
      .u32(0L) // master id (unused)
      .result

  /** COM_BINLOG_DUMP — stream from an explicit (file, pos). */
  def comBinlogDump(serverId: Long, file: String, pos: Long,
      nonBlock: Boolean = false): Array[Byte] =
    new ByteWriter().u8(ComBinlogDump)
      .u32(pos)
      .u16(if (nonBlock) BinlogDumpNonBlock else 0)
      .u32(serverId)
      .str(file)
      .result

  /** COM_BINLOG_DUMP_GTID — stream everything not in `executed`
    * (sid → closed [start, stop] interval list), the auto-position
    * mode the reference uses (`StartSyncGTID`,
    * `mysql_replication.go:40-45`). */
  def comBinlogDumpGtid(serverId: Long,
      executed: Seq[(Array[Byte], Seq[(Long, Long)])]): Array[Byte] = {
    val gtidData = {
      val w = new ByteWriter().u64(executed.length.toLong)
      executed.foreach { case (sid, ivs) =>
        require(sid.length == 16, "GTID SID must be 16 bytes")
        w.raw(sid).u64(ivs.length.toLong)
        // wire intervals are [start, stopExclusive)
        ivs.foreach { case (a, b) => w.u64(a).u64(b + 1) }
      }
      w.result
    }
    new ByteWriter().u8(ComBinlogDumpGtid)
      .u16(BinlogThroughGtid)
      .u32(serverId)
      .u32(0L) // filename length (empty: server resolves from GTID set)
      .u64(4L) // position
      .u32(gtidData.length.toLong)
      .raw(gtidData)
      .result
  }

  /** Render a `uuid:1-5:7,uuid2:1-3` GTID-set string to the dump
    * command's binary SID blocks. */
  def parseGtidSetString(s: String): Seq[(Array[Byte], Seq[(Long, Long)])] =
    if (s.trim.isEmpty) Nil
    else s.split(",").toSeq.map { part =>
      val fields = part.trim.split(":")
      val sidHex = fields.head.replace("-", "")
      require(sidHex.length == 32, s"bad GTID SID '${fields.head}'")
      val sid = sidHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      val ivs = fields.tail.toSeq.map { iv =>
        iv.split("-") match {
          case Array(a) => (a.toLong, a.toLong)
          case Array(a, b) => (a.toLong, b.toLong)
          case _ => throw new IllegalArgumentException(s"bad GTID interval '$iv'")
        }
      }
      (sid, ivs)
    }

  // ---- text resultsets -------------------------------------------------

  /** One text-protocol resultset: column names + rows of nullable
    * strings (0xfb = SQL NULL). EOF-terminated shape (this client
    * never advertises CLIENT_DEPRECATE_EOF). */
  final case class ResultSet(columns: Seq[String], rows: Seq[Seq[Option[String]]])

  def readResultSet(io: PacketIO): ResultSet = {
    val first = orThrow(io.read())
    if (isOk(first)) return ResultSet(Nil, Nil) // DML/SET: no rows
    val nCols = new Binlog.Cursor(first, 0).lenenc().toInt
    val cols = (0 until nCols).map { _ =>
      val p = orThrow(io.read())
      // ColumnDefinition41: catalog, schema, table, org_table, name,
      // org_name — all lenenc strings; we only need `name` (5th).
      val c = new Binlog.Cursor(p, 0)
      var name = ""
      var i = 0
      while (i < 5) { name = lenencString(c); i += 1 }
      name
    }
    skipEof(io) // column-definition terminator
    val rows = Vector.newBuilder[Seq[Option[String]]]
    var done = false
    while (!done) {
      val p = orThrow(io.read())
      if (isEof(p)) done = true
      else {
        val c = new Binlog.Cursor(p, 0)
        rows += (0 until nCols).map { _ =>
          if ((p(c.off) & 0xff) == 0xfb) { c.off += 1; None }
          else Some(lenencString(c))
        }
      }
    }
    ResultSet(cols, rows.result())
  }

  private def lenencString(c: Binlog.Cursor): String = {
    val n = c.lenenc().toInt
    new String(c.bytes(n), UTF_8)
  }

  private def skipEof(io: PacketIO): Unit = {
    val p = orThrow(io.read())
    require(isEof(p), "expected EOF packet after column definitions")
  }
}
