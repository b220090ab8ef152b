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

  /** 60-bit md5 row digest over canonical renderings. Nulls become
    * U+0000 (distinct from any cast output), fields join on U+0001 —
    * both mirrored exactly in the DuckDB oracle (`chr(0)`/`chr(1)`,
    * where DuckDB's chr(0) is likewise a 1-char NUL string). */
  def rowHash(rendered: Seq[Column]): Column = {
    val joined = concat_ws("\u0001",
      rendered.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)
    conv(substring(md5(joined), 1, 15), 16, 10).cast(LongType)
  }

  /** Per-chunk (n_rows, checksum, pk_min, pk_max) for one side.
    *
    * @param pk        numeric primary-key column (chunking key)
    * @param rendered  canonically-rendered columns to digest
    *                  (include the pk itself to catch pk drift)
    */
  def chunkChecksums(df: DataFrame, pk: Column, rendered: Seq[Column],
                     chunkSize: Long): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    df.select((pk.cast(LongType) / chunkSize).cast(LongType).as("chunk"),
        pk.cast(LongType).as("__pk"),
        rowHash(rendered).cast(DecimalType(38, 0)).as("__h"))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__h")).as("checksum"),
        min(col("__pk")).as("pk_min"), max(col("__pk")).as("pk_max"))
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
