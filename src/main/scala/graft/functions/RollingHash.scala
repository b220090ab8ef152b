package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Polynomial rolling hash over a string's bytes:
  * h_i = (h_{i-1} · B + b_i) mod P with B = 131, P = 2^31−1, as a
  * single fused loop in whole-stage codegen (h < 2^31 so h·B + b
  * fits a long exactly — no 128-bit arithmetic needed).
  * Document fingerprinting for chunk identity / shift detection —
  * cheaper than md5 (no allocation, no digest), and the incremental
  * form lets a content-defined chunker slide windows in O(1)/byte.
  *
  * Registered as SQL function `rolling_hash` by
  * [[graft.GraftExtensions]].
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  import RollingHash.{B, P}

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * B + (bytes(i) & 0xffL)) % P
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${B}L + ($bytes[$i] & 0xffL)) % ${P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val B = 131L
  val P = 2147483647L // 2^31-1
}
