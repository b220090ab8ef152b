package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Unsigned byte read from a binary column at a 1-based position —
  * the primitive under [[graft.ops.Multimodal]]'s media-header field
  * math (PNG big-endian u32s, WAV little-endian u16/u32s compose from
  * it with plain integer arithmetic).
  *
  * Replaces the `conv(hex(substring(blob, pos, 1)), 16, 10)` chain,
  * which allocates a one-byte array plus a hex string and runs a
  * radix parse PER BYTE READ. This is a single bounds-checked array
  * access fused into whole-stage codegen — the §7.4(b) custom-
  * Expression path, same as [[DotProduct]].
  *
  * Out-of-range positions yield NULL (the substring chain yields an
  * empty-string parse → NULL as well, so composed header math agrees
  * on truncated blobs).
  *
  * Registered as SQL function `byte_at_u8` by [[graft.GraftExtensions]].
  */
case class ByteAtU8(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  // Always nullable: out-of-range reads yield NULL regardless of the
  // children's nullability (see DotProduct for why this must not be
  // derived — a literal-false isNull lvalue breaks nullSafeCodeGen).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"byte_at_u8 expects (binary, int) args, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override def nullSafeEval(blob: Any, pos: Any): Any = {
    val bytes = blob.asInstanceOf[Array[Byte]]
    val p = pos.asInstanceOf[Int]
    if (p < 1 || p > bytes.length) null
    else bytes(p - 1) & 0xff
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, pos) => {
      s"""
         |if ($pos < 1 || $pos > $blob.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $blob[$pos - 1] & 0xff;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteAtU8 =
    copy(left = newLeft, right = newRight)
}
