package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Driver-side binlog **relay**: tails a master through
  * [[BinlogClient]] and appends the received event frames verbatim
  * into local segment files named exactly like the master's
  * (`binlog.000001`, …) — a replica relay log. The existing
  * `graft-binlog` DSv2 source ([[BinlogStreamSource]]) then serves
  * executors from those segments with byte-position offsets,
  * checkpoint resume, and admission control unchanged.
  *
  * This is the Spark-native decomposition of the reference's
  * in-process tail→channel→sink loop (`inputs/mysql/
  * mysql_replication.go:38-65`): the unpartitionable, stateful TCP
  * session stays on the driver as pure byte relay (no decode), and
  * ALL decode/route/transform work happens in executor tasks over
  * replayable files. Relay throughput is sequential appends — the
  * socket, not this layer, is the bottleneck.
  *
  * Exactly-once across restarts, with no sidecar state to trust:
  *  - frames append atomically-in-practice (whole-frame writes,
  *    flushed); a torn tail from a crash is TRUNCATED to the
  *    whole-frame prefix before resuming;
  *  - the resume coordinate derives from the relay itself — the last
  *    relayed frame's `next_pos` header field IS the master position
  *    (frames are verbatim master bytes), and the segment's own file
  *    name names the master file;
  *  - a fresh mid-file bootstrap writes a `relay.start` marker so an
  *    FDE-only segment (crash before the first data frame) cannot
  *    under-state the resume position and replay the master file's
  *    head into the relay.
  *
  * The server's artificial frames (the dump-start fake ROTATE) steer
  * segment naming but are never written — same filtering a replica's
  * relay-log writer performs. Real ROTATEs are appended (they end a
  * binlog file on the master, too) and then switch segments; each
  * new segment starts with the master's own FDE for that file, so
  * every relay segment is independently decodable by [[Binlog]] —
  * magic, FDE checksum negotiation, CRC-verified frames.
  */
final class BinlogRelay(
    dir: Path,
    clientFactory: () => BinlogClient,
    start: BinlogRelay.Start,
    retryBackoffMs: Long = 1000L,
    maxRetries: Int = -1, // <0 = retry forever
    stopAtEof: Boolean = false) {

  import BinlogRelay._

  Files.createDirectories(dir)

  private val appended = new AtomicLong(0L)
  private val lastErr = new AtomicReference[Throwable](null)
  @volatile private var running = false
  @volatile private var thread: Thread = null

  def appendedFrames: Long = appended.get()
  def lastError: Option[Throwable] = Option(lastErr.get())

  /** Where a (re)start must resume: derived from the relay segments
    * themselves, floored by the bootstrap marker (see class doc).
    * Walks segments newest-first, skipping degenerate ones (a crash
    * can leave a magic-only file); a trailing ROTATE maps to the
    * next file's head. `Binlog.rawEvents` does the frame walk, so
    * CRC handling (rotate bodies carry one when the stream is
    * checksummed) matches the decoder exactly. */
  def resumeCoordinate(): Option[(String, Long)] = {
    val marker = readMarker(dir)
    val fromSegments = segments(dir).reverseIterator.flatMap { seg =>
      val bytes = Files.readAllBytes(seg)
      val prefix = wholeFramePrefix(bytes)
      if (prefix < bytes.length) truncate(seg, prefix) // torn tail
      Binlog.rawEvents(java.util.Arrays.copyOf(bytes, prefix)).lastOption.map { ev =>
        if (ev.header.eventType == Binlog.RotateEvent) {
          // crash between appending the rotate and creating the next
          // segment: resume at the rotate's target
          val c = new Binlog.Cursor(ev.body, 0)
          val pos = c.i64()
          (new String(ev.body, 8, ev.body.length - 8, UTF_8), pos)
        } else (seg.getFileName.toString, ev.header.nextPos)
      }
    }.nextOption()
    (fromSegments, marker) match {
      case (Some((f, p)), Some((mf, mp))) if f == mf => Some((f, math.max(p, mp)))
      case (Some((f, p)), Some((mf, mp))) =>
        // disagreeing files: the higher segment number is later
        if (segNumber(mf) > segNumber(f)) Some((mf, mp)) else Some((f, p))
      case (Some(fp), None) => Some(fp)
      case (None, m) => m
    }
  }

  def startRelay(): Unit = synchronized {
    require(!running, "relay already running")
    running = true
    thread = new Thread(() => runLoop(), s"binlog-relay-$dir")
    thread.setDaemon(true)
    thread.start()
  }

  def stopRelay(): Unit = {
    running = false
    val t = thread
    if (t != null) { t.interrupt(); t.join(10000) }
  }

  /** Blocks until the relay thread exits (test/available-now use). */
  def awaitTermination(timeoutMs: Long): Boolean = {
    val t = thread
    if (t == null) true else { t.join(timeoutMs); !t.isAlive }
  }

  private def runLoop(): Unit = {
    var attempts = 0
    while (running) {
      try {
        relayOnce()
        attempts = 0
        if (stopAtEof) { running = false; return }
      } catch {
        case _: InterruptedException => running = false; return
        case e: Throwable if running =>
          lastErr.set(e)
          attempts += 1
          if (maxRetries >= 0 && attempts > maxRetries) { running = false; throw e }
          try Thread.sleep(retryBackoffMs * attempts)
          catch { case _: InterruptedException => running = false; return }
      }
    }
  }

  /** One connect→dump→append session; returns on clean EOF. */
  private def relayOnce(): Unit = {
    val client = clientFactory()
    try {
      val resumed = resumeCoordinate()
      val (frames, startFile) = (start, resumed) match {
        case (Gtid(set), None) =>
          // first-ever GTID start: the SERVER resolves the file; the
          // marker is written when the artificial ROTATE names it
          (client.dumpGtid(set), null: String)
        case (MariaGtid(pos), None) =>
          // MariaDB dialect: position registers via session vars,
          // server resolves the file (same marker discipline)
          (client.dumpGtidMaria(pos), null: String)
        case _ =>
          val (file, pos) = resumed.getOrElse(bootstrap(client))
          writeMarker(dir, file, pos)
          (client.dump(file, pos), file)
      }
      var out: SegmentOut = null
      var currentFile = startFile
      try {
        for (f <- frames; if running) {
          if (f.artificial) {
            // dump-start fake ROTATE names the file being served and
            // carries the exact start position — the authoritative
            // bootstrap marker for every mode
            if (f.eventType == Binlog.RotateEvent) {
              val (tf, tp) = f.rotateTarget
              currentFile = tf
              writeMarker(dir, tf, tp)
            }
          } else f.eventType match {
            case Binlog.FormatDescriptionEvent =>
              if (out == null) out = openSegmentChecked(currentFile)
              // resuming mid-file: the local segment already holds an
              // FDE — the re-sent one would corrupt frame positions
              if (out.size <= 4) { out.append(f.bytes); appended.incrementAndGet() }
            case Binlog.RotateEvent =>
              if (out == null) out = openSegmentChecked(currentFile)
              out.append(f.bytes); appended.incrementAndGet()
              out.close(); out = null
              currentFile = f.rotateTarget._1
            case _ =>
              if (out == null) out = openSegmentChecked(currentFile)
              out.append(f.bytes); appended.incrementAndGet()
          }
        }
      } finally if (out != null) out.close()
    } finally client.close()
  }

  private def openSegmentChecked(file: String): SegmentOut = {
    require(file != null,
      "binlog dump sent data before the artificial ROTATE that names the file")
    openSegment(file)
  }

  /** First-ever start with no explicit coordinate: the master's
    * current position (≙ `mysql_position.go:127-148` fallback). */
  private def bootstrap(client: BinlogClient): (String, Long) = start match {
    case FilePos(f, p) => (f, p)
    case MasterCurrent =>
      val (f, p, _) = client.masterStatus(); (f, p)
    case g @ (Gtid(_) | MariaGtid(_)) =>
      // unreachable by construction: relayOnce serves first-ever GTID
      // starts via the dump call directly (the SERVER resolves the
      // file), and resumed sessions never reach bootstrap — keep
      // that invariant loud instead of shipping dead marker logic
      throw new IllegalStateException(
        s"bootstrap() reached with $g — GTID starts are resolved by " +
          "the master in relayOnce, not bootstrapped locally")
  }

  private def openSegment(file: String): SegmentOut = {
    val p = dir.resolve(file)
    if (!Files.exists(p))
      Files.write(p, Binlog.Magic)
    new SegmentOut(p)
  }
}

object BinlogRelay {

  sealed trait Start
  /** Explicit master coordinate (deploy-time bootstrap). */
  final case class FilePos(file: String, pos: Long) extends Start
  /** Auto-position from an executed-GTID-set string (reference mode). */
  final case class Gtid(executedSet: String) extends Start
  /** MariaDB auto-position: `domain-server-seqno[,...]` registered
    * via `@slave_connect_state` (no COM_BINLOG_DUMP_GTID dialect). */
  final case class MariaGtid(gtidPos: String) extends Start
  /** Start at the master's current tail (only post-start changes). */
  case object MasterCurrent extends Start

  private[sources] final class SegmentOut(p: Path) {
    var size: Long = Files.size(p)
    private val out = new BufferedOutputStream(
      new FileOutputStream(p.toFile, true), 1 << 16)
    def append(bytes: Array[Byte]): Unit = {
      out.write(bytes); out.flush(); size += bytes.length
    }
    def close(): Unit = out.close()
  }

  /** Numeric suffix of a `<base>.<digits>` segment name (-1 if none). */
  private[sources] def segNumber(name: String): Long = {
    val i = name.lastIndexOf('.')
    if (i > 0 && i < name.length - 1 && name.substring(i + 1).forall(_.isDigit))
      name.substring(i + 1).toLong
    else -1L
  }

  /** `<base>.<digits>` segments in the relay dir, suffix-ascending. */
  private[sources] def segments(dir: Path): Vector[Path] = {
    if (!Files.exists(dir)) return Vector.empty
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(f => Files.isRegularFile(f) && segNumber(f.getFileName.toString) >= 0)
        .toVector
        .sortBy(f => segNumber(f.getFileName.toString))
    } finally s.close()
  }

  /** Largest whole-frame boundary ≤ length (19-byte headers only). */
  private[sources] def wholeFramePrefix(bytes: Array[Byte]): Int = {
    if (bytes.length < 4) return bytes.length
    var off = 4
    while (off + 19 <= bytes.length) {
      val size = new Binlog.Cursor(bytes, off + 9).u32().toInt
      if (size < 19 || off + size > bytes.length) return off
      off += size
    }
    off
  }

  private def truncate(p: Path, to: Long): Unit = {
    val ch = java.nio.channels.FileChannel.open(p, java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(to) finally ch.close()
  }

  // -- bootstrap marker: lower bound for the resume position ------------
  private def markerPath(dir: Path) = dir.resolve("relay.start")

  private[sources] def writeMarker(dir: Path, file: String, pos: Long): Unit = {
    val tmp = dir.resolve("relay.start.tmp")
    Files.write(tmp, s"$file:$pos".getBytes(UTF_8))
    Files.move(tmp, markerPath(dir), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private[sources] def readMarker(dir: Path): Option[(String, Long)] = {
    val p = markerPath(dir)
    if (!Files.exists(p)) None
    else new String(Files.readAllBytes(p), UTF_8).split(":", 2) match {
      case Array(f, pos) => Some((f, pos.toLong))
      case _ => None
    }
  }
}
