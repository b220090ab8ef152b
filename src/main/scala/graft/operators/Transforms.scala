package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-table column transforms — the reference's `Transform` surface
  * (`core/transform.go:3-6`: configure once, then mutate-or-drop each
  * message) re-expressed as composable `DataFrame => DataFrame`
  * functions. Narrow operations only: no shuffle, fully codegen'd,
  * so they cost a projection regardless of data volume.
  *
  * Reference operators covered:
  *  - rename-column  (`transforms/trans_rename_column.go:62-74`)
  *  - delete-column  (`transforms/trans_delete_column.go:37-47`)
  *  - drop-hook      (`transforms/transforms.go:63-71` — a transform
  *    returning true drops the message; here an explicit predicate)
  *  - column mapper  (`core/meta.go:38-104` — source→target column
  *    list, positional or same-name)
  *  - delete-sign    (`outputs/starrocks/starrocks_utils.go:39-69` —
  *    virtual 0/1 op column for primary-key stream loads)
  *  - table routing  (`metas/routers.go:48-60` — keep only routed
  *    (db, table) pairs)
  */
object Transforms {

  /** Sensitive-column masking — the transform every CDC deployment
    * adds the day compliance reads the topic list (Debezium ships it
    * as an SMT; the reference's Transform chain has no equivalent, a
    * gap this closes). Three modes, all scan-stage projections:
    *   - `hash`: sha256 hex — deterministic, so masked values still
    *     JOIN and GROUP (the referential-integrity-preserving mask)
    *   - `partial`: keep the last `keep` chars, star the rest (card
    *     and phone tails); values at or under `keep` chars mask
    *     FULLY — echoing a short secret because it is short is
    *     exactly the leak the mask exists to stop
    *   - `redact`: constant `"***"` — no length or equality signal
    * Nulls stay null in every mode (a null is not a secret, and
    * sinks rely on null-vs-present for sparse images). */
  def maskColumn(c: Column, mode: String, keep: Int = 4): Column = {
    require(keep >= 0, s"maskColumn: keep must be non-negative, got $keep")
    mode match {
      case "hash" => sha2(c.cast("string"), 256)
      case "partial" =>
        val s = c.cast("string")
        // (?s): mask newlines too — an unmasked byte is a leak
        when(c.isNull, lit(null).cast("string"))
          .when(length(s) <= keep, regexp_replace(s, "(?s).", "*"))
          .otherwise(concat(
            regexp_replace(s.substr(lit(1), length(s) - keep), "(?s).", "*"),
            s.substr(length(s) - keep + 1, lit(keep))))
      case "redact" => when(c.isNull, lit(null).cast("string"))
        .otherwise(lit("***"))
      case other => throw new IllegalArgumentException(
        s"maskColumn: unknown mode '$other' (hash|partial|redact)")
    }
  }

  /** Apply [[maskColumn]] to each named column (missing columns are
    * a no-op, matching the other transforms' silent-skip contract). */
  def maskColumns(masks: (String, String)*): DataFrame => DataFrame = df =>
    masks.foldLeft(df) { case (d, (name, mode)) =>
      if (d.columns.contains(name))
        d.withColumn(name, maskColumn(col(name), mode))
      else d
    }

  /** Rename columns `(from -> to)*`. Missing sources are a no-op,
    * matching the reference's silent skip on absent columns. */
  def renameColumn(pairs: (String, String)*): DataFrame => DataFrame = df =>
    pairs.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** Drop columns (reference delete-column transform). */
  def deleteColumn(cols: String*): DataFrame => DataFrame =
    df => df.drop(cols: _*)

  /** The reference's drop-if-true hook: rows where `pred` is true are
    * REMOVED from the stream. */
  def dropWhere(pred: Column): DataFrame => DataFrame =
    df => df.filter(!pred)

  /** Keep-side filter (general WHERE — absent in the reference, free
    * in Spark; declared so configs can express it). */
  def keepWhere(pred: Column): DataFrame => DataFrame =
    df => df.filter(pred)

  /** Positional source→target column mapping: select the source
    * columns in order and alias each to the target name
    * (`core/meta.go:78-104` map-mapper semantics; same-name mapping is
    * the degenerate case src==tgt). */
  def columnMapper(src: Seq[String], tgt: Seq[String]): DataFrame => DataFrame = {
    require(src.length == tgt.length, s"mapper arity: $src vs $tgt")
    df => df.select(src.zip(tgt).map { case (s, t) => col(s).as(t) }: _*)
  }

  /** Column mapper for envelope-shaped frames: maps data columns
    * positionally but carries the pipeline metadata columns
    * (op/seq/pos/ts — Pipeline.routed's full metadata contract)
    * through — a bare [[columnMapper]] would drop them and break
    * compaction/sinks downstream (the kafka sink reads ts). */
  def envelopeColumnMapper(src: Seq[String], tgt: Seq[String],
      meta: Seq[String] = Seq("op", "seq", "pos", "ts")): DataFrame => DataFrame = {
    require(src.length == tgt.length, s"mapper arity: $src vs $tgt")
    df => {
      val kept = meta.filter(df.columns.contains)
      df.select(src.zip(tgt).map { case (s, t) => col(s).as(t) } ++
        kept.map(col): _*)
    }
  }

  /** Virtual `_delete_sign_` column: 1 for deletes, 0 otherwise —
    * the StarRocks/Doris primary-key-model convention. */
  def deleteSign(opCol: Column, deleteOp: String = "delete"): Column =
    when(opCol === deleteOp, lit(1)).otherwise(lit(0))

  /** Append the delete-sign column under its reference name. */
  def withDeleteSign(opCol: String = "op"): DataFrame => DataFrame =
    df => df.withColumn("_delete_sign_", deleteSign(col(opCol)))

  /** Table-routing predicate over a changelog envelope: keep only
    * events whose (db, table) has a route. On a cluster this filter
    * sits directly on the source scan so unrouted tables are pruned
    * before any shuffle. */
  def routeTables(routes: Set[(String, String)],
                  dbCol: String = "db", tableCol: String = "table"): DataFrame => DataFrame = {
    val pred = routes.toSeq
      .map { case (d, t) => col(dbCol) === d && col(tableCol) === t }
      .reduceOption(_ || _).getOrElse(lit(false))
    df => df.filter(pred)
  }

  /** Dimension enrichment — the lookup-join every real CDC consumer
    * bolts on (absent in the reference, which has no joins at all):
    * left-join a dimension snapshot onto the event stream, keeping
    * unmatched events (they carry nulls — an enrichment must never
    * DROP events, or the sink diverges from the source table).
    *
    * Works identically on batch frames and streaming ones (Spark's
    * stream-static join needs no watermark — the static side is
    * re-read per micro-batch, so a refreshed dim snapshot is picked
    * up automatically). `broadcastDim` (default) is correct for
    * bounded dims; pass false for data-proportional dims and let AQE
    * decide.
    *
    * @param keys (streamCol, dimCol) equality pairs
    * @param proj dim columns to carry onto the stream (all if empty)
    */
  def enrich(dim: DataFrame, keys: Seq[(String, String)],
      proj: Seq[String] = Nil, broadcastDim: Boolean = true)
      : DataFrame => DataFrame = {
    require(keys.nonEmpty, "enrich needs at least one join key pair")
    df => {
      val wanted =
        if (proj.isEmpty) dim else dim.select(
          (keys.map(_._2) ++ proj).distinct.map(col): _*)
      val d = if (broadcastDim) broadcast(wanted) else wanted
      val cond = keys.map { case (sc, dc) => df(sc) === d(dc) }
        .reduce(_ && _)
      // drop the dim-side key columns after the join: enrichment adds
      // attributes, it must not duplicate keys into the envelope
      keys.map(_._2).foldLeft(df.join(d, cond, "left"))((j, dc) =>
        j.drop(d(dc)))
    }
  }

  /** Changed-column extraction over an update event's before/after
    * maps: the sorted list of keys whose value differs (null-safe on
    * both sides — a column appearing in only one map counts as
    * changed). Downstream consumers use this for audit trails and
    * for building sparse column-level updates instead of full-row
    * upserts. One fused scan-stage pass over the map buffers
    * ([[graft.functions.MapChangedKeys]]) — no shuffle, no
    * intermediate arrays; the function self-registers on the active
    * session, so callers on a plain SparkSession (no
    * `spark.sql.extensions=graft.GraftExtensions`) keep working.
    */
  def changedColumns(before: Column, after: Column): Column = {
    // the old formulation was pure built-ins and worked on ANY
    // session; the native function must not silently narrow that
    // contract to extension-configured sessions
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.GraftExtensions.ensure)
    // [[changedColumnsHof]] is the four-operator reference pipeline
    // this replaced — kept as the spec's equivalence cross-check
    call_function("map_changed_keys", before, after)
  }

  /** Reference formulation of [[changedColumns]] via built-in
    * higher-order functions — semantically identical (spec-pinned),
    * ~10× slower per row (three intermediate arrays + interpreted
    * lambdas), retained as the cross-check oracle. */
  def changedColumnsHof(before: Column, after: Column): Column = {
    val keys = array_sort(array_union(map_keys(before), map_keys(after)))
    // element_at returns null for absent keys; null-safe inequality
    // makes add/remove show up as changes
    filter(keys, k => !(element_at(before, k) <=> element_at(after, k)))
  }

  /** Chain transforms in order — the reference's IterateTransforms
    * fold (`transforms/transforms.go:63-71`). */
  def chain(ts: (DataFrame => DataFrame)*): DataFrame => DataFrame =
    df => ts.foldLeft(df)((d, t) => t(d))
}
