package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The corrupt-record policy shared by the CDC envelope adapters
  * ([[DebeziumAdapter]], [[MaxwellAdapter]]) — one implementation so
  * the fail/skip/mark semantics, the `__corrupt__` DLQ shape, and
  * the error-message contract cannot drift between wire formats.
  *
  *  - `fail` (default): evaluation raises with the offending payload
  *    prefix — a feed must lose data loudly.
  *  - `skip`: bad records are dropped.
  *  - `mark`: bad records become `__corrupt__` events carrying the
  *    raw payload in `before["raw"]` for DLQ routing on the same
  *    exactly-once stream.
  */
private[sources] object EnvelopePolicy {

  /** @param bad     predicate marking unusable records
    * @param opMapped op column for good records
    * @param before   before-image column for good records
    * @param db,table envelope identity columns (null-coalesced for
    *                 marked records, whose envelope may be absent)
    * @param label    wire-format name used in the fail message
    * @return (policed frame, op, before, db, table) to project from
    */
  def apply(parsed: DataFrame, jsonCol: String, label: String,
      bad: Column, opMapped: Column, before: Column,
      db: Column, table: Column, onCorrupt: String)
      : (DataFrame, Column, Column, Column, Column) = {
    require(Set("fail", "skip", "mark")(onCorrupt),
      s"onCorrupt must be fail|skip|mark, got '$onCorrupt'")
    onCorrupt match {
      case "skip" => (parsed.filter(!bad), opMapped, before, db, table)
      case "mark" => (parsed,
        when(bad, lit("__corrupt__")).otherwise(opMapped),
        when(bad, map(lit("raw"), col(jsonCol))).otherwise(before),
        coalesce(db, lit("")), coalesce(table, lit("")))
      case _ => (parsed,
        when(bad, raise_error(concat(
          lit(s"corrupt/unsupported $label record "),
          lit("(set onCorrupt=skip|mark to continue): "),
          substring(col(jsonCol), 1, 120))).cast("string"))
          .otherwise(opMapped),
        before, db, table)
    }
  }
}
