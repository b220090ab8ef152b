package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-2 (type-2 slowly-changing dimension) builder: turns a CDC
  * event stream — insert/update/delete rows per key, totally ordered
  * by a monotone sequence — into version-interval rows
  * `[valid_from, valid_to)` with an `is_current` flag.
  *
  * This is the missing half of the reference's CDC pipeline: the
  * reference lands the LATEST row per key into the target
  * (compaction, `outputs/mysql/mysql.go` upsert path) and discards
  * history; a warehouse consumer usually wants the history table the
  * as-of join ([[graft.ops.AsOfJoin]]) probes. Build it once from
  * the same event stream:
  *
  *  - every non-delete event opens a version at its own timestamp;
  *  - the NEXT event on the same key (any op, delete included)
  *    closes it: `valid_to = lead(ts)`;
  *  - delete events emit no version themselves — they only bound the
  *    previous version, so a deleted key has no current row;
  *  - `is_current = valid_to IS NULL`.
  *
  * Cost shape: ONE shuffle on the key + one per-partition sort (the
  * lead window) — identical to the as-of join's cost, and the only
  * order that scales: history per key is unbounded, but it never
  * leaves its partition. Ties on `ts` are resolved by the monotone
  * `seqCol` (the GTID-analog), so output is deterministic under any
  * partitioning.
  */
object Scd2 {

  /** @param events  CDC frame carrying `keys`, `tsCol`, `seqCol`,
    *                `opCol` and `payload` columns
    * @param keys    entity key columns
    * @param tsCol   event-time column (any orderable type; Long ns
    *                in this engine's testdata convention)
    * @param seqCol  monotone per-stream sequence (orders same-ts
    *                events; REQUIRED unique per key for determinism)
    * @param payload columns carried into the version rows
    * @param opCol   op column; rows with value `delete` close the
    *                prior version and emit none themselves */
  def build(events: DataFrame, keys: Seq[String], tsCol: String,
      seqCol: String, payload: Seq[String],
      opCol: String = "op"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol))
    events
      .withColumn("__valid_to", lead(col(tsCol), 1).over(w))
      // filter AFTER the window: a delete must still close its
      // predecessor, so it has to be present when lead() runs
      .filter(col(opCol) =!= "delete")
      .select(keys.map(col) ++ Seq(col(seqCol)) ++ payload.map(col) ++ Seq(
        col(tsCol).as("valid_from"),
        col("__valid_to").as("valid_to"),
        col("__valid_to").isNull.as("is_current")): _*)
  }
}
