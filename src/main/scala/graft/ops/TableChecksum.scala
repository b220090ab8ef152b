package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Source<->target consistency verification for replicated tables —
  * the `pt-table-checksum` shape the reference pipeline family
  * assumes users run out-of-band (qin-cdc syncs MySQL->StarRocks but
  * ships no way to PROVE the sides agree; this closes that gap).
  *
  * The table is cut into pk-range chunks (`chunk = pk div
  * chunkSize` — pure arithmetic, no global sort, no window), and
  * each chunk reduces to `(n_rows, sum of rowHash)` where the row
  * hash is a 60-bit md5 digest of the row's canonical column
  * rendering. The sum is ORDER-INDEPENDENT, so the two sides can
  * scan in any partitioning and the comparison stays exact; 60-bit
  * hashes summed in DECIMAL(38,0) cannot overflow below ~10^18 rows
  * per chunk.
  *
  * Scale shape: each side is ONE scan feeding a map-side-combinable
  * hash aggregate (partial sums per partition), and the shuffle
  * carries `#chunks` rows, not table rows. [[diff]]'s join is on the
  * chunk id — both sides are chunk-denominated, so at 100 TB the
  * whole comparison moves O(table/chunkSize) rows. A mismatched
  * chunk names the pk range to re-sync (re-read just that range with
  * a smaller chunkSize to bisect further — the pt-table-checksum
  * recovery loop).
  *
  * Column rendering is the CALLER's contract (pass columns already
  * cast to exact, engine-stable types — decimals at the data's true
  * scale, timestamps as integer epoch micros); [[rowHash]] then
  * seals them with NUL-sentinel nulls and a U+0001 separator so
  * `("a", null)` and `(null, "a")` cannot collide.
  */
object TableChecksum {

  /** Integral division on longs (`div`, truncating toward zero —
    * DuckDB's `//` semantics, verified: `-7 // 2 = -3`). The r8 form
    * `(pk / n).cast(Long)` promoted to DOUBLE first, which silently
    * loses exactness above 2^53 — a wrong chunk id there produces
    * false divergences in exactly the cross-engine verification the
    * row hashes exist for. */
  private def longDiv(p: Column, n: Long): Column =
    call_function("div", p.cast(LongType), lit(n))

  /** 60-bit md5 row digest over canonical renderings. Nulls become
    * U+0000 (distinct from any cast output), fields join on U+0001 —
    * both mirrored exactly in the DuckDB oracle (`chr(0)`/`chr(1)`,
    * where DuckDB's chr(0) is likewise a 1-char NUL string). */
  def rowHash(rendered: Seq[Column]): Column = {
    val joined = concat_ws("\u0001",
      rendered.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)
    conv(substring(md5(joined), 1, 15), 16, 10).cast(LongType)
  }

  /** xxhash64-based row digest — the fast path when BOTH sides are
    * this engine (the usual production deployment: source checksum
    * job and target checksum job run the same library). xxhash64 is
    * whole-stage-codegen native with no digest/hex-string
    * allocation; [[rowHash]]'s md5 form exists for CROSS-engine
    * verification, where the hash must be computable by the other
    * engine. Masked into [0, 2^60) so the same no-overflow-below-
    * 10^18-rows-per-chunk sum bound holds. Same NUL/U+0001 sealing.
    * Pass to [[chunkChecksums]]/[[incrementalChecksums]] via their
    * `hashFn` parameter — BOTH sides (and any maintained ledger)
    * must use the same function, or every chunk diverges. */
  def fastRowHash(rendered: Seq[Column]): Column = {
    val joined = concat_ws("\u0001",
      rendered.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)
    pmod(xxhash64(joined), lit(1152921504606846976L)) // 2^60
  }

  /** Per-chunk (n_rows, checksum, pk_min, pk_max) for one side.
    *
    * @param pk        numeric primary-key column (chunking key)
    * @param rendered  canonically-rendered columns to digest
    *                  (include the pk itself to catch pk drift)
    */
  def chunkChecksums(df: DataFrame, pk: Column, rendered: Seq[Column],
                     chunkSize: Long,
                     hashFn: Seq[Column] => Column = rowHash): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    df.select(longDiv(pk, chunkSize).as("chunk"),
        pk.cast(LongType).as("__pk"),
        hashFn(rendered).cast(DecimalType(38, 0)).as("__h"))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__h")).as("checksum"),
        min(col("__pk")).as("pk_min"), max(col("__pk")).as("pk_max"))
  }

  /** One Merkle-style rollup level: `fanout` child chunks collapse
    * into one parent (chunk div fanout), sums and row counts adding,
    * pk ranges unioning. Comparing two sides top-down — parents
    * first, then [[diff]] only inside mismatched parents' child
    * ranges — turns a full-table audit into O(log) chunk-list
    * exchanges when divergence is localized (the common case: a few
    * poison rows, one bad backfill range). Apply repeatedly for more
    * levels; checksums stay exact at every level because the row
    * hashes sum associatively. */
  def rollup(checksums: DataFrame, fanout: Long): DataFrame = {
    require(fanout > 1, s"fanout must exceed 1, got $fanout")
    checksums
      .groupBy(longDiv(col("chunk"), fanout).as("chunk"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("checksum")).cast(DecimalType(38, 0)).as("checksum"),
        min(col("pk_min")).as("pk_min"), max(col("pk_max")).as("pk_max"))
  }

  /** Incremental checksum MAINTENANCE from a changelog — continuous
    * verification without rescanning: each change event contributes
    * signed deltas to its chunk's `(n_rows, checksum)`, and
    * `baseline + accumulated deltas == fresh [[chunkChecksums]] of
    * the target` iff the pipeline applied every change exactly once.
    * Contributions per op (the sum telescopes, so replays/reorders
    * within a key are visible as non-zero residue):
    *   - insert:  +hash(after),  rows +1, in chunk(after pk)
    *   - update:  +hash(after) in chunk(after pk) AND −hash(before)
    *              in chunk(before pk) — a pk-moving update
    *              transfers the row between chunks
    *   - delete:  −hash(before), rows −1, in chunk(before pk)
    * Any other op (e.g. `replace`, whose semantics depend on target
    * state the stream does not carry) FAILS LOUDLY — silently
    * skipping an op class would make every later verification lie.
    *
    * One scan: each event emits its (≤2) contributions through a
    * single explode, then the same map-side-combinable per-chunk
    * aggregate as [[chunkChecksums]]. Applied to a changelog that
    * starts from an empty table, the deltas EQUAL the final state's
    * checksums (spec-pinned); in production the same aggregate runs
    * as a streaming update-mode query maintaining the running sums.
    *
    * @return (chunk, d_rows, d_sum)
    */
  def incrementalChecksums(changes: DataFrame, op: Column,
      afterPk: Column, afterRendered: Seq[Column],
      beforePk: Column, beforeRendered: Seq[Column],
      chunkSize: Long,
      hashFn: Seq[Column] => Column = rowHash): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    def chunkOf(pk: Column) = longDiv(pk, chunkSize)
    val h = DecimalType(38, 0)
    // updates carry +1 on the after side and -1 on the before side:
    // for the usual in-place update the two cancel inside the
    // aggregate, while a pk-MOVING update correctly transfers the
    // row count between chunks
    val pos = when(op.isin("insert", "update"),
      struct(chunkOf(afterPk).as("chunk"),
        hashFn(afterRendered).cast(h).as("d_sum"),
        lit(1L).as("d_rows")))
    val neg = when(op.isin("update", "delete"),
      struct(chunkOf(beforePk).as("chunk"),
        (-hashFn(beforeRendered)).cast(h).as("d_sum"),
        lit(-1L).as("d_rows")))
    // the op guard lives INSIDE the exploded expression (a separate
    // guard column would be pruned away before it could fire)
    val contribs = when(op.isin("insert", "update", "delete"),
      filter(array(pos, neg), c => c.isNotNull))
      .otherwise(raise_error(concat(
        lit("incrementalChecksums: unsupported op '"), op,
        lit("' — only insert/update/delete carry the images needed " +
          "to maintain checksums"))))
    changes
      .select(explode(contribs).as("c"))
      .groupBy(col("c.chunk").as("chunk"))
      .agg(sum(col("c.d_rows")).as("d_rows"), sum(col("c.d_sum")).as("d_sum"))
  }

  /** Chunk-level comparison of two [[chunkChecksums]] outputs.
    * Returns ONLY the divergent chunks, each with a status naming
    * what diverged — the re-sync worklist. Matching chunks (the
    * overwhelming majority on a healthy pipeline) never leave the
    * join. */
  def diff(src: DataFrame, tgt: DataFrame): DataFrame = {
    val s = src.select(col("chunk"), col("n_rows").as("src_rows"),
      col("checksum").as("src_sum"))
    val t = tgt.select(col("chunk"), col("n_rows").as("tgt_rows"),
      col("checksum").as("tgt_sum"))
    s.join(t, Seq("chunk"), "full_outer")
      .withColumn("status",
        when(col("src_rows").isNull, lit("missing_in_source"))
          .when(col("tgt_rows").isNull, lit("missing_in_target"))
          .when(col("src_rows") =!= col("tgt_rows"), lit("row_count"))
          .when(col("src_sum") =!= col("tgt_sum"), lit("checksum"))
          .otherwise(lit("ok")))
      .filter(col("status") =!= "ok")
      .select(col("chunk"), col("src_rows"), col("tgt_rows"),
        col("src_sum"), col("tgt_sum"), col("status"))
  }
}
