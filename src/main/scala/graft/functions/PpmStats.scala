package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Full P6 PPM decode — header state machine plus exact per-channel
  * raster sums — as ONE native codegen kernel over the blob bytes.
  *
  * This replaces the round-8 higher-order-function form (a 22-step
  * `aggregate()` header fold with a 7-field struct state, then a
  * per-raster-byte `aggregate(sequence(0, 3wh-1))` channel fold).
  * Catalyst evaluates HOF lambdas INTERPRETED, per element, with the
  * struct state rebuilt at every step — the r8 driver bench measured
  * that form at 251 s at sf0.1 when no other query exceeded 6.2 s,
  * and the `sequence()` it folds over materializes up to 48M boxed
  * Longs (~384 MB transient per row) before a single byte is summed.
  * This kernel is the [[WavRms]] shape instead: one Java loop with
  * primitive locals, whole-stage-codegen'd, zero allocation beyond
  * the 6-slot result, O(bytes) with a ~ns/byte constant.
  *
  * Semantics are pinned byte-for-byte to the HOF form (kept as
  * `Multimodal.ppmStatsHof`, differential-tested on randomized and
  * crafted blobs by PpmStatsSpec):
  *
  *  - `P6` magic required; header bytes 3..24 (1-based) parse three
  *    variable-width ASCII decimal fields (width, height, maxval) —
  *    digits accumulate, any of space/TAB/LF/CR commits a field;
  *  - NULL for: non-P6 blobs, a `#` comment byte (its content could
  *    contain digits that would misparse — refuse, don't guess),
  *    headers not complete within 24 bytes (dims past 7 total
  *    digits), maxval != 255 (2-byte samples), non-positive dims,
  *    width*height > 16M pixels (hostile-header guard: a 48 MB
  *    raster is generous for real PPMs), or a truncated raster;
  *  - otherwise `struct(width, height, n_pix, r_sum, g_sum, b_sum)`
  *    with exact integer channel sums over every raster byte.
  *
  * Registered as SQL function `ppm_stats` by [[graft.GraftExtensions]].
  */
case class PpmStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PpmStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"ppm_stats expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any = {
    val v = PpmStats.stats(blob.asInstanceOf[Array[Byte]])
    if (v == null) null else PpmStats.toRow(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val v = ctx.freshName("ppm")
      s"""
         |long[] $v = graft.functions.PpmStats.stats($b);
         |if ($v == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.PpmStats.toRow($v);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PpmStats =
    copy(child = newChild)
}

object PpmStats {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_pix", LongType, nullable = false),
    StructField("r_sum", LongType, nullable = false),
    StructField("g_sum", LongType, nullable = false),
    StructField("b_sum", LongType, nullable = false)))

  /** Pack the kernel's `long[6]` into an InternalRow (shared by the
    * interpreted and codegen paths). */
  def toRow(v: Array[Long]): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      v(0).toInt, v(1).toInt, v(2), v(3), v(4), v(5)))

  private final val HdrMax = 24 // last 1-based header byte examined

  /** Shared kernel: `[w, h, n_pix, r_sum, g_sum, b_sum]`, or null
    * for every reject case in the class doc. One pass, no
    * allocation. The header cap keeps every accumulator far from
    * Long overflow: the three fields share ≤ 15 digits, so
    * `w*h < 10^15` before the 16M-pixel guard even applies. */
  def stats(b: Array[Byte]): Array[Long] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return null
    // header state machine over 1-based bytes 3..24: ph = which
    // field commits next (0=w, 1=h, 2=maxval, 3=done, 9=poisoned
    // by a '#' comment), digits accumulate in acc, whitespace with
    // inNum set commits
    var ph = 0
    var acc = 0L
    var inNum = false
    var w = 0L; var h = 0L; var mx = 0L; var off = 0L
    var p = 3
    val pMax = if (b.length < HdrMax) b.length else HdrMax
    while (p <= pMax && ph < 3) {
      val v = b(p - 1) & 0xff
      if (v == '#') ph = 9
      else {
        val isDigit = v >= '0' && v <= '9'
        val isWs = v == ' ' || v == '\t' || v == '\n' || v == '\r'
        if (isWs && inNum) { // committing
          if (ph == 0) w = acc
          else if (ph == 1) h = acc
          else { mx = acc; off = p + 1L }
          ph += 1
          acc = 0L
        } else if (isDigit) acc = acc * 10L + (v - '0')
        if (isDigit) inNum = true else if (isWs) inNum = false
      }
      p += 1
    }
    if (ph != 3 || mx != 255L || w <= 0L || h <= 0L ||
      w * h > 16777216L) return null
    val nPix = w * h
    val nBytes = (nPix * 3L).toInt
    if (b.length < off + nBytes - 1L) return null // truncated raster
    var r = 0L; var g = 0L; var bl = 0L
    var i = (off - 1L).toInt // 0-based first raster byte
    val end = i + nBytes
    var c = 0
    while (i < end) {
      val v = b(i) & 0xff
      if (c == 0) r += v else if (c == 1) g += v else bl += v
      c += 1
      if (c == 3) c = 0
      i += 1
    }
    Array(w, h, nPix, r, g, bl)
  }
}
