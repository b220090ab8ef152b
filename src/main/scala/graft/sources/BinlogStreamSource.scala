package graft.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.ChangeEvent

/** Streaming DSv2 source over a directory of binary binlog segments
  * — the streaming twin of [[BinlogFiles]] (batch) on top of the
  * [[Binlog]] wire decoder; the DSv2 shape mirrors `graft-changelog`.
  *
  * Offsets are BYTE positions packed as `segmentNumber << 40 |
  * bytePos` (a segment is ≤ `max_binlog_size` ≤ 1 GiB < 2^40):
  * exactly MySQL's own (file, pos) replication coordinate, keyed to
  * each segment's own numeric suffix — never a listing position —
  * so binlog purge and suffix growth can't remap a checkpoint.
  * latestOffset needs the directory listing plus an INCREMENTAL
  * whole-frame header walk (19-byte headers of new events only), so
  * per-trigger control-plane cost is proportional to new data, a
  * GROWING active segment is served incrementally, and committed
  * offsets always land on event-frame boundaries — a torn in-flight
  * append is outside every offset window until its frame completes.
  * Each served event's `seq` is its packed start byte (+ row index),
  * so seqs are globally monotone and stable across retries —
  * exactly-once composes with the checkpointed offset log the same
  * way the JSONL source's dense seqs do.
  *
  * Segment-name order must be rotation order (binlog.000001…), the
  * invariant MySQL's own naming provides. Decode state (TABLE_MAP,
  * GTID set) replays from each segment's head — events reference
  * table maps arbitrarily far back, so serving bytes [b, b') still
  * walks headers from byte 4; per-trigger cost is one segment scan,
  * bounded by `max_binlog_size`, and value decode runs only for
  * in-range events.
  *
  * Options: `path` (dir), `tables` ("db.t:c1|c2,…" — routes AND
  * names columns; "db.t:*" routes and takes names from the
  * COLUMN_NAME metadata TLV of `binlog_row_metadata=FULL` segments),
  * `filePrefix` (default "binlog." — MySQL-style numeric-suffix
  * segment names), `maxBytesPerTrigger`, `startOffset` ("latest" or
  * "<segmentIndex>:<bytePos>" — position bootstrap; a checkpoint
  * always wins).
  */
class BinlogStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-binlog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeEvent.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // DSv2 options are case-insensitive — wrap before lookup
    val opts = new CaseInsensitiveStringMap(properties)
    def req(k: String): String = Option(opts.get(k)).getOrElse(
      throw new IllegalArgumentException(s"graft-binlog requires option '$k'" +
        (if (k == "tables") " (db.table:col1|col2,…) — the binlog carries " +
          "types but not column names" else "")))
    new BinlogStreamTable(
      req("path"),
      BinlogStreamSource.parseTables(req("tables")),
      Option(opts.get("filePrefix")).getOrElse("binlog."),
      Option(opts.get("maxBytesPerTrigger")).map(_.toLong),
      Option(opts.get("startOffset")))
  }
}

object BinlogStreamSource {
  /** "db.table:col1|col2,db2.t:a|b" → routing/name map. */
  def parseTables(s: String): Map[(String, String), Seq[String]] =
    s.split(",").map { entry =>
      val Array(qual, cols) = entry.split(":", 2)
      val Array(db, t) = qual.split("\\.", 2)
      (db, t) -> cols.split("\\|").toSeq
    }.toMap

  /** One listed segment: `number` is the segment's own numeric
    * suffix (binlog.000007 → 7) — offsets key to THIS, never to a
    * position in the listing, so purging old segments (normal
    * `PURGE BINARY LOGS` retention) or the suffix growing past six
    * digits cannot remap a checkpoint onto the wrong file. `served`
    * is the whole-frame prefix — the only bytes an offset may cover. */
  final case class Segment(number: Int, file: String, served: Long)

  /** Rotation-ordered (numeric-suffix-ordered) segment listing. */
  def segments(path: String, prefix: String): Vector[Segment] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Vector.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.startsWith(prefix))
        .map { f =>
          val suffix = f.getFileName.toString.drop(prefix.length)
          require(suffix.nonEmpty && suffix.forall(_.isDigit),
            s"segment name '${f.getFileName}' has no numeric suffix after '$prefix'")
          Segment(suffix.toInt, f.toString, framePrefix(f.toString))
        }
        .toVector.sortBy(_.number)
      finally s.close()
    }
  }

  // (file → (sizeSeen, boundary)) — incremental whole-frame-prefix
  // walk. Offsets may only advance to event-frame boundaries: a size
  // sampled mid-append would otherwise commit an offset past a torn
  // frame's start byte, and that frame could never be served (its
  // start would sit below every later batch's range). The walk reads
  // 19-byte headers only, resuming from the last known boundary, so
  // per-trigger cost is proportional to NEW events — same contract
  // as the JSONL source's cached tail watermark.
  private val prefixCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]

  def framePrefix(file: String): Long = {
    val size = Files.size(Paths.get(file))
    prefixCache.get(file) match {
      case Some((seen, boundary)) if seen == size => boundary
      case prior =>
        val start = math.max(prior.map(_._2).getOrElse(4L), 4L)
        val boundary = if (size < 4) 0L else walkFrames(file, start, size)
        prefixCache.put(file, (size, boundary))
        boundary
    }
  }

  private def walkFrames(file: String, from: Long, size: Long): Long = {
    val raf = new java.io.RandomAccessFile(file, "r")
    try {
      val header = new Array[Byte](13)
      var off = from
      var done = false
      while (!done && off + 19 <= size) {
        raf.seek(off)
        raf.readFully(header)
        val evSize = (header(9) & 0xffL) | ((header(10) & 0xffL) << 8) |
          ((header(11) & 0xffL) << 16) | ((header(12) & 0xffL) << 24)
        if (evSize < 19 || off + evSize > size) done = true
        else off += evSize
      }
      off
    } finally raf.close()
  }

  def pack(seg: Int, byte: Long): Long = (seg.toLong << 40) | byte
  def segOf(packed: Long): Int = (packed >> 40).toInt
  def byteOf(packed: Long): Long = packed & ((1L << 40) - 1)
}

final class BinlogStreamTable(path: String,
    names: Map[(String, String), Seq[String]],
    prefix: String, maxBytes: Option[Long],
    startOffset: Option[String] = None)
  extends Table with SupportsRead {

  override def name(): String = s"binlog($path)"
  override def schema(): StructType = ChangeEvent.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ChangeEvent.schema
      override def description(): String = s"graft-binlog($path)"
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new BinlogMicroBatchStream(path, names, prefix, maxBytes, startOffset)
    }
}

final class BinlogMicroBatchStream(path: String,
    names: Map[(String, String), Seq[String]],
    prefix: String, maxBytes: Option[Long],
    startOffset: Option[String] = None)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {
  import BinlogStreamSource._

  private def segs: Vector[Segment] = segments(path, prefix)

  private def tail(ss: Vector[Segment]): Long =
    if (ss.isEmpty) 0L else pack(ss.last.number, ss.last.served)

  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(tail(segs))

  /** Position bootstrap ≙ the reference's meta.db → config
    * start-gtid → current-position chain (`mysql_position.go:37-54`):
    * an existing CHECKPOINT always wins (Spark only calls this on a
    * fresh start); `startOffset=latest` begins at the current tail
    * (only post-start events); `startOffset=<seg>:<byte>` deploys
    * mid-log at an explicit replication coordinate; default replays
    * from the first segment. */
  override def initialOffset(): Offset = startOffset match {
    case Some(s) if s.equalsIgnoreCase("latest") => SeqOffset(tail(segs))
    case Some(coord) => coord.split(":", 2) match {
      case Array(seg, byte) => SeqOffset(pack(seg.toInt, byte.toLong))
      case _ => throw new IllegalArgumentException(
        s"startOffset must be 'latest' or '<segmentIndex>:<bytePos>', got '$coord'")
    }
    case None => SeqOffset(0L)
  }
  override def latestOffset(): Offset = SeqOffset(tail(segs))
  override def reportLatestOffset(): Offset = SeqOffset(tail(segs))

  /** Admission control in BYTES — the unit the offset coordinate is
    * denominated in, so a cap bounds per-trigger decode work
    * directly (≙ the reference's bounded batch buffers). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val ss = segs
    val target = availableNowTarget.getOrElse(tail(ss))
    maxBytes match {
      case None => SeqOffset(target)
      case Some(budget) =>
        // advance ≤ budget bytes toward target, over the LISTED
        // segments ≥ the start segment number (purged numbers simply
        // aren't listed). A byte cap may land mid-event within the
        // served prefix; ranges partition by event START byte, so a
        // straddling event is served by whichever batch owns its
        // start — no loss, no duplication.
        val startSeg = segOf(start.asInstanceOf[SeqOffset].seq)
        val startByte = byteOf(start.asInstanceOf[SeqOffset].seq)
        val tSeg = segOf(target); val tByte = byteOf(target)
        var remaining = budget
        var out = start.asInstanceOf[SeqOffset].seq
        ss.iterator
          .filter(sg => sg.number >= startSeg && sg.number <= tSeg)
          .takeWhile(_ => remaining > 0)
          .foreach { sg =>
            val from = if (sg.number == startSeg) startByte else 0L
            val end = if (sg.number == tSeg) tByte else sg.served
            if (end > from) {
              val take = math.min(end - from, remaining)
              out = pack(sg.number, from + take)
              remaining -= take
            } else if (sg.number < tSeg) {
              // fully-consumed (or empty) earlier segment: step past
              out = math.max(out, pack(sg.number, end))
            }
          }
        SeqOffset(math.min(out, target))
    }
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].seq
    val e = end.asInstanceOf[SeqOffset].seq
    if (e <= s) return Array.empty
    segs.iterator
      .filter(sg => sg.number >= segOf(s) && sg.number <= segOf(e))
      .flatMap { sg =>
        val from = if (sg.number == segOf(s)) byteOf(s) else 0L
        val until = if (sg.number == segOf(e)) byteOf(e) else Long.MaxValue
        if (until <= from) None
        else Some(BinlogPartition(sg.file, sg.number, from, until, names): InputPartition)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BinlogReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class BinlogPartition(file: String, segNumber: Int,
    fromByte: Long, untilByte: Long,
    names: Map[(String, String), Seq[String]]) extends InputPartition

final class BinlogReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new BinlogPartitionReader(p.asInstanceOf[BinlogPartition])
}

final class BinlogPartitionReader(p: BinlogPartition)
  extends PartitionReader[InternalRow] {

  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(ChangeEvent.schema)

  // The file may have grown past this batch's range by read time and
  // may end in a torn in-flight append: clamp to whole event frames
  // (header walk only), then let the byte range select by event
  // START offset. Offset windows are always event-boundary-aligned
  // because the server appends whole frames and latestOffset samples
  // size between appends (same complete-record assumption as the
  // JSONL source's complete-line contract).
  private val rows: Iterator[InternalRow] = {
    val all = Files.readAllBytes(Paths.get(p.file))
    val clamped = java.util.Arrays.copyOfRange(all, 0,
      if (all.length < 4) 0 else wholeEventsPrefix(all))
    if (clamped.length < 4) Iterator.empty // segment not yet past its magic
    else Binlog.changeEventsByteRange(clamped, p.names,
      BinlogStreamSource.pack(p.segNumber, 0L), p.fromByte, p.untilByte)
      .iterator.map { ev =>
        toCatalyst(org.apache.spark.sql.Row(ev.db, ev.table, ev.op, ev.ts,
          ev.pos, ev.seq, ev.tableVersion, ev.after, ev.before))
          .asInstanceOf[InternalRow]
      }
  }

  /** Largest event-frame boundary ≤ file length (headers only). */
  private def wholeEventsPrefix(bytes: Array[Byte]): Int = {
    var off = 4
    while (off + 19 <= bytes.length) {
      val size = new Binlog.Cursor(bytes, off + 9).u32().toInt
      if (size < 19 || off + size > bytes.length) return off
      off += size
    }
    off
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
