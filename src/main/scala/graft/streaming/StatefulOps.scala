package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators — capabilities SURVEY §2 lists as
  * newly *available* on Spark (the reference has no event-time,
  * watermarks, windows, or keyed state at all):
  *
  *  - watermarked streaming dedup (at-least-once → effectively-once
  *    by event id within the lateness bound),
  *  - event-time tumbling/sliding aggregates,
  *  - custom keyed state via flatMapGroupsWithState (gap-based
  *    sessionization, the streaming twin of CdcQueries'
  *    cdc_sessionize batch query).
  *
  * At scale, all three shuffle once on their key and keep state in
  * the state store — for 100 TB streams configure the RocksDB state
  * store provider so state spills off-heap
  * (`spark.sql.streaming.stateStore.providerClass`).
  */
object StatefulOps {

  /** Drop duplicate events by `idCols` arriving within the watermark
    * delay (replay suppression for at-least-once sources). */
  def streamingDedup(df: DataFrame, idCols: Seq[String],
      eventTimeCol: String, delay: String): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Event-time tumbling counts per group. */
  def windowedCounts(df: DataFrame, eventTimeCol: String, groupCol: String,
      windowLen: String, delay: String): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowLen), col(groupCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(groupCol), col("n"))

  /** Native gap-based session windows — the declarative twin of
    * [[sessionSummaries]]: same semantics (a session closes when the
    * gap since the last event exceeds `gap`), but state merging lives
    * in Spark's session-window operator instead of user
    * flatMapGroupsWithState code, so it gets watermark-driven state
    * eviction and the RocksDB store for free — prefer this form; the
    * explicit-state twin exists for semantics Spark can't express. */
  def sessionWindowCounts(df: DataFrame, eventTimeCol: String,
      keyCol: String, gap: String, delay: String): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(col(keyCol), session_window(col(eventTimeCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n_events"))

  /** Stream-stream INNER join bounded to a time interval: each left
    * event pairs with right events sharing `keyCols` whose event time
    * lies within [leftTs - before, leftTs + after]. Right-side
    * columns come back `r_`-prefixed.
    *
    * Both sides are watermarked, and the time bound is part of the
    * join condition — that pair is what lets Spark GC join state:
    * buffered rows older than (watermark - bound) can never match
    * again and are evicted, so state is proportional to the traffic
    * inside the interval, not the stream history. Without the bound a
    * stream-stream join buffers FOREVER — the unscalable shape this
    * operator exists to prevent. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, delay: String,
      before: String, after: String): DataFrame = {
    val r0 = right.columns.foldLeft(right)(
      (d, c) => d.withColumnRenamed(c, s"r_$c"))
    val l = left.withWatermark(leftTs, delay)
    val r = r0.withWatermark(s"r_$rightTs", delay)
    val keyEq = keyCols.map(k => col(k) === col(s"r_$k")).reduce(_ && _)
    val bound =
      col(s"r_$rightTs") >= col(leftTs) - expr(s"INTERVAL $before") &&
        col(s"r_$rightTs") <= col(leftTs) + expr(s"INTERVAL $after")
    l.join(r, keyEq && bound)
  }

  /** Incremental materialized aggregate view — the CDC→OLAP pattern
    * the whole reference pipeline exists to feed, closed end-to-end
    * inside the engine: a keyed streaming aggregate in UPDATE mode
    * emits only the keys whose aggregate CHANGED each micro-batch,
    * and those rows upsert into a [[graft.streaming.Pipeline.BatchSink]]
    * (envelope: op=insert, seq=batchId as the monotone version — a
    * replayed batch rewrites the same keys with the same values, so
    * the sink stays idempotent under at-least-once delivery).
    *
    * The lake table is then always the exact aggregate-of-history for
    * every key ever touched, maintained at per-batch cost
    * O(changed keys), never O(all keys) — the property that makes a
    * 100 TB materialized view affordable to keep fresh.
    *
    * @param aggregated an unresolved streaming groupBy().agg() frame
    *                   whose grouping columns form `target`'s PK
    */
  def materializedView(aggregated: DataFrame,
      target: graft.meta.TableDef, sink: Pipeline.BatchSink,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("3 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    aggregated.writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink.write(
          batch.withColumn("op", lit("insert")).withColumn("seq", lit(id)),
          target, id)
      }
      .trigger(trigger).start()

  final case class UserEvent(userId: Long, tsMs: Long)
  final case class SessionSummary(userId: Long, nSessions: Int, nEvents: Long)
  final case class SessState(lastTsMs: Long, nSessions: Int, nEvents: Long)

  /** Gap-based sessionization with explicit keyed state
    * (flatMapGroupsWithState): a new session starts when the gap to
    * the previous event exceeds `gapMs`. Emits the running summary
    * per key each batch (update mode). */
  def sessionSummaries(events: Dataset[UserEvent], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessState, SessionSummary](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[SessState]) =>
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0, 0L))
          batch.toSeq.sortBy(_.tsMs).foreach { e =>
            val newSession =
              st.lastTsMs == Long.MinValue || e.tsMs - st.lastTsMs > gapMs
            st = SessState(e.tsMs,
              st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(st)
          Iterator.single(SessionSummary(userId, st.nSessions, st.nEvents))
      }
  }

  // seq (the changelog position / event id) breaks event-time ties:
  // without it, equal-ts events would process in shuffle-delivery
  // order and the emitted transitions/stages would be
  // nondeterministic — and diverge from the batch twins, which order
  // by (ts, event_id)
  final case class FunnelEvent(userId: Long, tsNs: Long, seq: Long,
      eventType: String)
  final case class FunnelState(times: Seq[Long])
  final case class FunnelProgress(userId: Long, stage: Int)

  /** Streaming ordered funnel — the continuous twin of the batch
    * `q_event_funnel` query: per user, the earliest time each stage
    * was reached STRICTLY AFTER the previous stage. Keyed state is k
    * longs per user (the per-stage first-qualifying times), so state
    * size is users × stages — never event-history-proportional.
    *
    * In-order contract: events must arrive per user in event-time
    * order across batches (within a batch they are sorted here); a
    * straggler older than an already-recorded stage time is ignored
    * — the price every streaming funnel pays, bounded in practice by
    * the source's per-key seq-monotone delivery. Equivalence with
    * the batch query under that contract is spec-pinned
    * (StreamingTwinsSpec). Emits each user's current stage per
    * batch (update mode). */
  def funnelStream(events: Dataset[FunnelEvent],
      stages: Seq[String]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty, "need at least one funnel stage")
    val k = stages.size
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent],
            state: GroupState[FunnelState]) =>
          val times = state.getOption.map(_.times.toArray)
            .getOrElse(Array.fill(k)(Long.MinValue))
          // ascending event time ⇒ the first qualifying hit per stage
          // IS that stage's min qualifying time
          batch.toSeq.sortBy(e => (e.tsNs, e.seq)).foreach { e =>
            val i = stages.indexOf(e.eventType)
            if (i >= 0 && times(i) == Long.MinValue) {
              val prevOk = i == 0 ||
                (times(i - 1) != Long.MinValue && e.tsNs > times(i - 1))
              if (prevOk) times(i) = e.tsNs
            }
          }
          state.update(FunnelState(times.toSeq))
          Iterator.single(FunnelProgress(uid,
            times.segmentLength(_ != Long.MinValue, 0)))
      }
  }

  final case class Transition(userId: Long, prevType: String, nextType: String)
  final case class LastEvent(tsNs: Long, eventType: String)

  /** Streaming consecutive-event transitions — the continuous twin of
    * the batch `q_event_transitions` query's pre-aggregation: keyed
    * state is ONE (ts, type) per user (the last event seen), each
    * arriving event emits its (prev → next) pair. Append mode: pairs
    * are immutable facts, so any downstream count — batch over the
    * sink, or a windowed streaming aggregate — reconstructs the
    * transition matrix. Same in-order contract as [[funnelStream]].
    */
  def transitionsStream(events: Dataset[FunnelEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent],
            state: GroupState[LastEvent]) =>
          var last = state.getOption.orNull
          val out = Seq.newBuilder[Transition]
          batch.toSeq.sortBy(e => (e.tsNs, e.seq)).foreach { e =>
            if (last != null)
              out += Transition(uid, last.eventType, e.eventType)
            last = LastEvent(e.tsNs, e.eventType)
          }
          if (last != null) state.update(last)
          out.result().iterator
      }
  }

  final case class VersionEvent(
      key: Long, seq: Long, tsMs: Long, value: String, op: String)
  final case class ClosedVersion(key: Long, seq: Long, value: String,
      validFrom: Long, validTo: Long)
  final case class Scd2State(seq: Long, tsMs: Long, value: String,
      live: Boolean)

  /** Streaming SCD-2: the continuous twin of
    * [[graft.operators.Scd2]]. Keyed state holds each key's OPEN
    * version; every arriving event CLOSES it (valid_to = the new
    * event's time) and — unless it is a delete — opens its own.
    *
    * Append mode emits only the closed versions: they are immutable
    * facts, so the sink's accumulated output IS the history table,
    * with no in-place updates required of the sink (works on plain
    * append-only parquet). The open versions live in the state store
    * (RocksDB at scale) — serve "current" from the compacted upsert
    * target the pipeline already maintains, not from this stream.
    *
    * Events are applied in `seq` order within a batch; cross-batch
    * order is the source's offset order (the changelog source is
    * seq-monotone per key by contract). */
  def scd2Stream(events: Dataset[VersionEvent]): Dataset[ClosedVersion] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Scd2State, ClosedVersion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[VersionEvent],
            state: GroupState[Scd2State]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ClosedVersion]
          var st = state.getOption
          batch.toSeq.sortBy(_.seq).foreach { e =>
            st.filter(_.live).foreach { cur =>
              out += ClosedVersion(key, cur.seq, cur.value, cur.tsMs, e.tsMs)
            }
            st = Some(Scd2State(e.seq, e.tsMs, e.value, live = e.op != "delete"))
          }
          // deletes REMOVE state (not a dead tombstone): state stays
          // O(live keys) on delete-heavy churn; a later insert on the
          // key simply opens fresh with nothing to close — the same
          // observable behavior a tombstone would give
          st match {
            case Some(cur) if cur.live => state.update(cur)
            case _ => if (state.exists) state.remove()
          }
          out.iterator
      }
  }
}
