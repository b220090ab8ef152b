package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Exact byte statistics of an UNKNOWN blob — the
  * content-sniffing fallback when no magic signature matches
  * ([[graft.ops.Multimodal.sniff]]): is this thing text, compressed
  * data, or binary junk? One native pass ([[WavRms]] shape —
  * whole-stage codegen, primitive locals, zero allocation beyond the
  * 4-slot result):
  *
  *  - `n_bytes` — payload length;
  *  - `n_printable` — bytes in 0x20-0x7E plus TAB/LF/CR (the
  *    ASCII-text detector: ratio ≈ 1 ⇒ text);
  *  - `n_zero` — NUL count (sparse/padded binary detector);
  *  - `n_distinct` — distinct byte values, 0-256 (the
  *    integer-exact entropy proxy: ~all 256 present ⇒ compressed or
  *    encrypted; a few dozen ⇒ structured text. A true Shannon
  *    entropy needs `log`, which is not correctly-rounded across
  *    engines — this stays oracle-checkable where entropy cannot).
  *
  * All counts are exact integers, so the DuckDB oracle reproduces
  * them bit-for-bit from the same bytes (hex-decode + list folds).
  * Registered as SQL function `byte_stats` by
  * [[graft.GraftExtensions]]. NULL blob → NULL.
  */
case class ByteStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ByteStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"byte_stats expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any =
    ByteStats.toRow(ByteStats.stats(blob.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val v = ctx.freshName("bst")
      s"""
         |long[] $v = graft.functions.ByteStats.stats($b);
         |${ev.value} = graft.functions.ByteStats.toRow($v);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)
}

object ByteStats {

  val schema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_printable", LongType, nullable = false),
    StructField("n_zero", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))

  def toRow(v: Array[Long]): GenericInternalRow =
    new GenericInternalRow(Array[Any](v(0), v(1), v(2), v(3).toInt))

  /** `[n_bytes, n_printable, n_zero, n_distinct]` — one pass, a
    * 256-slot seen table, no allocation beyond it. */
  def stats(b: Array[Byte]): Array[Long] = {
    val seen = new Array[Boolean](256)
    var printable = 0L
    var zeros = 0L
    var distinct = 0L
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      if ((v >= 0x20 && v <= 0x7e) || v == '\t' || v == '\n' || v == '\r')
        printable += 1
      if (v == 0) zeros += 1
      if (!seen(v)) { seen(v) = true; distinct += 1 }
      i += 1
    }
    Array(b.length.toLong, printable, zeros, distinct)
  }
}
