package graft.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.ChangeEvent

/** DataSource V2 changelog source — the engine's analog of the
  * reference's binlog tailer (`inputs/mysql/mysql_replication.go:
  * 38-65` + GTID position tracking, `inputs/mysql/mysql_position.go`).
  *
  * Reads JSON-lines changelog files (one ChangeEvent per line, with a
  * monotone `seq`) and serves them to Structured Streaming in
  * `(startSeq, endSeq]` micro-batches. The `seq` high-watermark IS
  * the offset — checkpointed by the engine exactly like the
  * reference persists its GTID set (resume-from-checkpoint replaces
  * the bbolt meta.db). `maxEventsPerTrigger` gives the bounded-
  * channel backpressure (≙ channel cap 10240, `app/server.go:81`).
  *
  * A production deployment would swap the file tail for a binlog
  * client connection inside the same MicroBatchStream contract; the
  * offset/commit/partition plumbing here is the real thing.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft-changelog")
  *   .option("path", dir).option("maxEventsPerTrigger", "1000").load()
  * }}}
  */
class ChangelogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-changelog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeEvent.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // DataFrameReader options are case-insensitive per the DSv2
    // contract — wrap before lookup so .option("PATH", …) works.
    val opts = new CaseInsensitiveStringMap(properties)
    new ChangelogTable(opts.get("path"),
      Option(opts.get("maxEventsPerTrigger")).map(_.toLong),
      Option(opts.get("startSeq")),
      Option(opts.get("onCorrupt")).getOrElse("fail"))
  }
}

final class ChangelogTable(path: String, maxPerTrigger: Option[Long],
    startSeq: Option[String] = None, onCorrupt: String = "fail")
  extends Table with SupportsRead {

  require(path != null, "option 'path' is required")
  require(Set("fail", "skip", "mark")(onCorrupt),
    s"onCorrupt must be fail|skip|mark, got '$onCorrupt'")

  override def name(): String = s"changelog($path)"
  override def schema(): StructType = ChangeEvent.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChangelogScanBuilder(path, maxPerTrigger, startSeq, onCorrupt)
}

/** Filter pushdown (SupportsPushDownFilters): `db`/`table` equality
  * predicates — exactly the routing filter every pipeline applies
  * (`Pipeline.routed`, ≙ the reference's router lookup,
  * `metas/routers.go:48-60`) — reach the READER, which then skips
  * unrouted lines before the Catalyst row conversion. On a changelog
  * carrying many tables, a per-table query pays decode cost only for
  * its own table's events.
  *
  * All filters are also returned as residuals: Spark re-applies them
  * above the scan, so the pushdown is a pure optimization and every
  * other predicate shape stays correct untouched. */
final class ChangelogScanBuilder(path: String, maxPerTrigger: Option[Long],
    startSeq: Option[String], onCorrupt: String = "fail")
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  import org.apache.spark.sql.sources.{EqualTo, Filter}

  private var accepted: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter {
      case EqualTo(a, _: String) => a == "db" || a == "table"
      case _ => false
    }
    filters // everything stays a residual (source filter = optimization)
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = {
    val dbEq = accepted.collectFirst { case EqualTo("db", v: String) => v }
    val tableEq = accepted.collectFirst { case EqualTo("table", v: String) => v }
    new ChangelogScanImpl(path, maxPerTrigger, startSeq, dbEq, tableEq,
      onCorrupt)
  }
}

final class ChangelogScanImpl(path: String, maxPerTrigger: Option[Long],
    startSeq: Option[String], dbEq: Option[String], tableEq: Option[String],
    onCorrupt: String = "fail")
  extends Scan {
  override def readSchema(): StructType = ChangeEvent.schema
  override def description(): String = {
    val pushed = (dbEq.map(v => s"db=$v") ++ tableEq.map(v => s"table=$v"))
      .mkString(",")
    s"graft-changelog $path pushed=[$pushed]"
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangelogMicroBatchStream(path, maxPerTrigger, startSeq, dbEq, tableEq,
      onCorrupt)
  override def toBatch: Batch = new ChangelogBatch(path, dbEq, tableEq,
    onCorrupt)
}

/** Offset = highest `seq` served (inclusive) — the GTID-set analog. */
final case class SeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

final class ChangelogMicroBatchStream(path: String, maxPerTrigger: Option[Long],
    startSeq: Option[String] = None, dbEq: Option[String] = None,
    tableEq: Option[String] = None, onCorrupt: String = "fail")
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  private def maxSeqOnDisk: Long = ChangelogFiles.maxSeq(path)

  /** Trigger.AvailableNow: snapshot the tail watermark once; batches
    * then drain up to it (in maxPerTrigger slices) and the query
    * terminates — the reference's "catch up then exit" replay mode. */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(maxSeqOnDisk)

  /** Position bootstrap priority chain ≙ `inputs/mysql/
    * mysql_position.go:37-54,127-148` (meta.db → config `start-gtid`
    * → `SELECT @@gtid_executed`):
    *
    *  1. an existing CHECKPOINT always wins — Spark only calls
    *     initialOffset() on a fresh start (≙ meta.db position);
    *  2. `startSeq=<n>` serves events with seq > n — deploy mid-log
    *     without replaying history (≙ config start-gtid);
    *  3. `startSeq=latest` starts at the current tail — only events
    *     appended after query start (≙ bootstrapping the position
    *     from the source's current @@gtid_executed);
    *  4. default −1 — full history replay from the first event (the
    *     engine's backfill improvement over the reference, which
    *     silently starts from "now").
    */
  override def initialOffset(): Offset = startSeq match {
    case Some(s) if s.equalsIgnoreCase("latest") => SeqOffset(maxSeqOnDisk)
    case Some(n) => SeqOffset(n.toLong)
    case None => SeqOffset(-1L)
  }

  override def latestOffset(): Offset = SeqOffset(maxSeqOnDisk)

  override def reportLatestOffset(): Offset = SeqOffset(maxSeqOnDisk)

  /** Admission control: serve at most maxEventsPerTrigger seqs per
    * batch (seqs are dense in this source). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[SeqOffset].seq
    val max = availableNowTarget.getOrElse(maxSeqOnDisk)
    maxPerTrigger match {
      case Some(m) => SeqOffset(math.min(from + m, max))
      case None => SeqOffset(max)
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].seq
    val e = end.asInstanceOf[SeqOffset].seq
    // prune files that can't contain the range: append-only files
    // whose cached tail watermark is at or below the batch start
    // hold only already-served seqs.
    ChangelogFiles.list(path)
      .filter(f => ChangelogFiles.fileMaxSeq(f) > s)
      .map(f => ChangelogPartition(f, s, e, dbEq, tableEq, onCorrupt)
        : InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangelogReaderFactory

  /** ≙ position persisted after flush — the engine's commit log
    * already made the offset durable; files are immutable so there
    * is nothing to release. */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

final class ChangelogBatch(path: String, dbEq: Option[String] = None,
    tableEq: Option[String] = None, onCorrupt: String = "fail") extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    ChangelogFiles.list(path).map(f =>
      ChangelogPartition(f, Long.MinValue, Long.MaxValue, dbEq, tableEq,
        onCorrupt): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ChangelogReaderFactory
}

/** One partition per changelog file; the reader filters the
  * (startSeq, endSeq] range. Files are the unit of parallelism —
  * a sharded deployment writes one file per source shard. */
final case class ChangelogPartition(file: String, startSeq: Long, endSeq: Long,
    dbEq: Option[String] = None, tableEq: Option[String] = None,
    onCorrupt: String = "fail")
  extends InputPartition

final class ChangelogReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ChangelogReader(p.asInstanceOf[ChangelogPartition])
}

final class ChangelogReader(p: ChangelogPartition)
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(ChangeEvent.schema)
  private val stream = Files.lines(Paths.get(p.file))
  private val lines = stream.iterator().asScala.filter(_.nonEmpty)
  private var current: InternalRow = _

  /** Corrupt-line policy (option `onCorrupt`) — the part of a CDC
    * source the happy path never shows. A binlog/changelog line that
    * fails to decode has three sane treatments, and which is right
    * depends on the deployment:
    *
    *  - `fail` (default): stop the stream with the offending file +
    *    line. Matches the reference engine (a decode error kills the
    *    sync) — no silent data loss, ever.
    *  - `skip`: drop the line (with an executor-side log). For
    *    best-effort analytics feeds where one poison line must not
    *    halt a fleet.
    *  - `mark`: emit the line as a `__corrupt__` op event carrying
    *    the raw text in `before["raw"]` — the dead-letter-queue
    *    shape: downstream routes `op == "__corrupt__"` to a DLQ sink
    *    with a plain filter, on the SAME exactly-once stream. Only
    *    possible when the line's `seq` is recoverable (regex over
    *    the raw text if JSON parse failed): without a seq the event
    *    can't sit deterministically inside an offset window, so
    *    replay after failover could duplicate or drop it — those
    *    lines fail the stream even under `mark`.
    */
  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()
      val parsed =
        try Some(mapper.readValue(line, classOf[JMap[String, Object]]))
        catch { case scala.util.control.NonFatal(_) => None }
      val seqOpt = parsed.flatMap(m =>
        try Some(m.get("seq").toString.toLong)
        catch { case scala.util.control.NonFatal(_) => None })
        .orElse(ChangelogFiles.seqOfRaw(line))
      seqOpt match {
        case None => p.onCorrupt match {
          case "skip" =>
            ChangelogReader.log.warn(
              s"skipping corrupt changelog line (no seq) in ${p.file}")
          case _ => throw new IllegalStateException(
            s"corrupt changelog line with unrecoverable seq in ${p.file}: " +
              line.take(120) +
              (if (p.onCorrupt == "mark")
                " (onCorrupt=mark needs a parseable seq for exactly-once)"
              else " (set onCorrupt=skip|mark to continue past it)"))
        }
        case Some(seq) =>
          // seqs are monotone within an append-only file: past the
          // range end nothing further can match — stop instead of
          // parsing the rest of the log.
          if (seq > p.endSeq) return false
          if (seq > p.startSeq) {
            val converted: Option[InternalRow] = parsed match {
              case Some(m) if matchesPushed(m) =>
                try Some(convert(m, seq))
                catch { case scala.util.control.NonFatal(e) =>
                  corruptOrThrow(line, seq, e) }
              case Some(_) => None // filtered out by pushed predicate
              case None =>
                corruptOrThrow(line, seq,
                  new IllegalStateException("unparseable JSON"))
            }
            converted match {
              case Some(row) => current = row; return true
              case None => // skipped — keep scanning
            }
          }
      }
    }
    false
  }

  /** mark → a `__corrupt__` event with the raw line preserved;
    * skip → None (logged); fail → rethrow with context. */
  private def corruptOrThrow(line: String, seq: Long,
      e: Throwable): Option[InternalRow] = p.onCorrupt match {
    case "mark" =>
      val ext = org.apache.spark.sql.Row("", "", "__corrupt__", null, null,
        seq, 0, null, Map("raw" -> line))
      Some(toCatalyst(ext).asInstanceOf[InternalRow])
    case "skip" =>
      ChangelogReader.log.warn(
        s"skipping corrupt changelog line seq=$seq in ${p.file}: " +
          e.getMessage)
      None
    case _ => throw new IllegalStateException(
      s"corrupt changelog line seq=$seq in ${p.file}: ${line.take(120)} " +
        "(set onCorrupt=skip|mark to continue past it)", e)
  }

  /** Pushed routing predicate: unrouted lines are skipped HERE —
    * before the (comparatively expensive) Catalyst row conversion —
    * so a per-table query over a many-table changelog pays decode
    * cost only for its own events. Spark still re-applies the filter
    * above the scan (it was returned as a residual), so this is
    * purely an optimization. */
  private def matchesPushed(m: JMap[String, Object]): Boolean =
    p.dbEq.forall(v => String.valueOf(m.get("db")) == v) &&
      p.tableEq.forall(v => String.valueOf(m.get("table")) == v)

  private def asMap(o: Object): Map[String, String] = o match {
    case null => null
    case jm: JMap[_, _] => jm.asScala.map { case (k, v) =>
      k.toString -> (if (v == null) null else v.toString)
    }.toMap
    case _ => null
  }

  private def convert(m: JMap[String, Object], seq: Long): InternalRow = {
    val ts = m.get("ts") match {
      case null => null
      case n: Number => new java.sql.Timestamp(n.longValue())
      case s =>
        val str = s.toString
        // accept both 'yyyy-MM-dd HH:mm:ss[.f]' and ISO-8601
        try java.sql.Timestamp.valueOf(str)
        catch {
          case _: IllegalArgumentException =>
            java.sql.Timestamp.from(java.time.Instant.parse(str))
        }
    }
    val ext = org.apache.spark.sql.Row(
      m.get("db").toString, m.get("table").toString, m.get("op").toString,
      ts, Option(m.get("pos")).map(_.toString).orNull, seq,
      m.get("tableVersion") match {
        case null => 0
        case n: Number => n.intValue()
      },
      asMap(m.get("after")), asMap(m.get("before")))
    toCatalyst(ext).asInstanceOf[InternalRow]
  }

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}

object ChangelogReader {
  private[sources] val log =
    org.slf4j.LoggerFactory.getLogger(classOf[ChangelogReader])
}

object ChangelogFiles {
  def list(path: String): Seq[String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Nil
    else if (Files.isRegularFile(p)) Seq(p.toString)
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".jsonl"))
        .map(_.toString).toVector.sorted
      finally s.close()
    }
  }

  private val mapper = new ObjectMapper()

  // (file, size) -> max seq; changelog files are append-only, so a
  // file whose size hasn't changed keeps its cached watermark. This
  // makes the per-trigger latestOffset() cost proportional to NEW
  // bytes, not total log size (the naive rescan is quadratic over a
  // stream's lifetime).
  private val tailCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]

  private val seqRe = """"seq"\s*:\s*(-?\d+)""".r

  /** Last-resort seq extraction from a raw (possibly corrupt) line —
    * what lets `onCorrupt=mark` keep exactly-once accounting for
    * lines whose JSON no longer parses. */
  def seqOfRaw(line: String): Option[Long] =
    seqRe.findFirstMatchIn(line).map(_.group(1).toLong)

  /** Per-file tail watermark, cached by (path, size). Corrupt lines
    * must not break offset tracking (the reader's onCorrupt policy
    * decides their fate — the WATERMARK's job is only the max seq of
    * servable lines), so the scan degrades per line: JSON parse →
    * regex seq → ignore. */
  def fileMaxSeq(f: String): Long = {
    val size = Files.size(Paths.get(f))
    tailCache.get(f) match {
      case Some((sz, m)) if sz == size => m
      case _ =>
        val stream = Files.lines(Paths.get(f))
        val m =
          try stream.iterator().asScala.filter(_.nonEmpty).foldLeft(-1L) {
            (acc, line) =>
              val seq =
                try mapper.readValue(line, classOf[JMap[String, Object]])
                  .get("seq").toString.toLong
                catch { case scala.util.control.NonFatal(_) =>
                  seqOfRaw(line).getOrElse(-1L) }
              math.max(acc, seq)
          } finally stream.close()
        tailCache.put(f, (size, m))
        m
    }
  }

  /** Scan the tail watermark. The max seq is the source's
    * "current GTID". */
  def maxSeq(path: String): Long =
    list(path).foldLeft(-1L)((acc, f) => math.max(acc, fileMaxSeq(f)))
}
