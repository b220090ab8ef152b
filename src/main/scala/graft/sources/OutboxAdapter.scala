package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Transactional-outbox event router (the publicly documented
  * Debezium "outbox event router" pattern): services write domain
  * events into an `outbox` table INSIDE their business transaction —
  * (id, aggregatetype, aggregateid, payload-JSON) — and CDC turns
  * those inserts into reliably-ordered domain events without
  * dual-write races. The router re-shapes the outbox table's change
  * envelope into the DOMAIN event envelope:
  *
  *   - destination table = `aggregatetype` (one logical stream per
  *     aggregate), so the existing per-table routing/sinks fan the
  *     events out unchanged;
  *   - the after image = the PAYLOAD re-parsed (scalars stringified,
  *     same pre-routing contract as every envelope adapter), with
  *     the aggregate id injected as `id` — the natural pk for
  *     compaction and sink partitioning;
  *   - non-insert ops drop: outbox rows are write-once by contract
  *     (services may DELETE them for space — that is transport
  *     housekeeping, not a domain event).
  *
  * Narrow projection over the already-decoded envelope: fuses into
  * the stream stage, no shuffle, works identically on batch frames
  * and structured-streaming micro-batches.
  */
object OutboxAdapter {

  def route(envelope: DataFrame, typeCol: String = "aggregatetype",
      idCol: String = "aggregateid", payloadCol: String = "payload")
      : DataFrame = {
    val after = col("after")
    envelope
      .filter(col("op") === graft.cdc.ChangeEvent.Insert)
      .select(
        col("db"),
        after(typeCol).as("table"),
        col("op"), col("ts"), col("pos"), col("seq"), col("tableVersion"),
        map_concat(
          // the injected pk wins over a payload field of the same name
          // (map_concat's default dedup policy is EXCEPTION — filter,
          // don't collide)
          map_filter(coalesce(
            from_json(after(payloadCol), MapType(StringType, StringType)),
            map().cast(MapType(StringType, StringType))),
            (k, _) => k =!= "id"),
          map(lit("id"), after(idCol))).as("after"),
        lit(null).cast(MapType(StringType, StringType)).as("before"))
  }
}
