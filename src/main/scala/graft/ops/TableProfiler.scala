package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-scan table profiling (the Deequ/Great-Expectations shape):
  * per-column row count, null count, exact distinct count, and
  * min/max, emitted as one long-format row per column.
  *
  * Plan shape — one scan, one explode, TWO HASH aggregates:
  *
  *   (col_id, value) long rows
  *     → groupBy(col_id, value).count            // distinct values
  *     → groupBy(col_id).agg(stats over values)  // 1 row per column
  *
  * The naive alternative — every statistic in one wide aggregate
  * (`count_distinct` × k columns) — plans as an Expand(×k+1) feeding
  * a SORT aggregate, because string min/max buffers are immutable and
  * kick the whole aggregate off the hash path; measured 6.0s vs 1.5s
  * at sf0.1 for 5 lineitem columns (the residual cost is the rows×k
  * explode feeding the level-1 hash aggregate, which partial-combines
  * map-side). Here the first level is a pure
  * count (mutable buffer → HashAggregate with map-side partial
  * combine), and the only sort-based aggregate left runs over the
  * DISTINCT values, not the row count — at 100 TB that is the
  * difference between sorting the table ×k and sorting its value
  * domains.
  *
  * Values travel in a typed slot per family — integrals as LONG,
  * float/double as DOUBLE (hash-aggregate key normalization gives the
  * SQL equality semantics: −0.0 = 0.0, one NaN group), everything
  * else as its STRING rendering (exact for decimals, ISO for
  * timestamps — injective and, for ISO, order-isomorphic). Decimals
  * fill BOTH the double slot (numeric min/max) and the string slot
  * (exact distinctness beyond double precision).
  */
object TableProfiler {

  /** Long-format profile: one row per requested column with
    * (col_name, n_rows, n_null, n_distinct, min_num, max_num,
    *  min_str, max_str). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val nullL = lit(null).cast(LongType)
    val nullD = lit(null).cast(DoubleType)
    val nullS = lit(null).cast(StringType)
    val slices = cols.map { c =>
      val (vint, vnum, vstr) = df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          (col(c).cast(LongType), nullD, nullS)
        case FloatType | DoubleType =>
          (nullL, col(c).cast(DoubleType), nullS)
        case _: DecimalType =>
          (nullL, col(c).cast(DoubleType), col(c).cast(StringType))
        case _ =>
          (nullL, nullD, col(c).cast(StringType))
      }
      struct(lit(c).as("cid"), vint.as("vint"), vnum.as("vnum"),
        vstr.as("vstr"))
    }
    val long = df.select(explode(array(slices: _*)).as("s")).select(col("s.*"))
    val distincts = long
      .groupBy(col("cid"), col("vint"), col("vnum"), col("vstr"))
      .agg(count(lit(1)).as("cnt"))
    val isNullVal =
      col("vint").isNull && col("vnum").isNull && col("vstr").isNull
    val stats = distincts.groupBy(col("cid")).agg(
      sum(col("cnt")).as("n_rows"),
      coalesce(sum(when(isNullVal, col("cnt"))), lit(0L)).as("n_null"),
      count(when(!isNullVal, lit(1))).as("n_distinct"),
      min(coalesce(col("vnum"), col("vint").cast(DoubleType))).as("min_num"),
      max(coalesce(col("vnum"), col("vint").cast(DoubleType))).as("max_num"),
      min(col("vstr")).as("min_str"), max(col("vstr")).as("max_str"))
    // string min/max is only meaningful for non-numeric columns (for
    // decimals the string slot is the distinct-count transport)
    val numericCols = cols.filter { c =>
      df.schema(c).dataType match {
        case _: NumericType => true
        case _ => false
      }
    }
    val strSlot = (c: Column) =>
      if (numericCols.isEmpty) c
      else when(col("cid").isin(numericCols: _*), nullS).otherwise(c)
    stats.select(
      col("cid").as("col_name"), col("n_rows"), col("n_null"),
      col("n_distinct"), col("min_num"), col("max_num"),
      strSlot(col("min_str")).as("min_str"),
      strSlot(col("max_str")).as("max_str"))
  }
}
