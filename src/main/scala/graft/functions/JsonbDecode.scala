package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `jsonb_decode(binary) → string`: MySQL binary-JSON (JSONB) blob →
  * canonical JSON text, via [[graft.sources.Jsonb]] — the same
  * decoder the binlog sources use for JSON columns, exposed on the
  * SQL surface so raw CDC payloads landed in a lake table (e.g. a
  * binary `payload` column of archived row images) can be projected
  * without re-running ingestion.
  *
  * Strict by construction: a malformed blob fails the query loudly —
  * the engine's corrupt-data tolerance lives in the sources'
  * fail/skip/mark policy, not in silent NULLs mid-query. Codegen is
  * a single static call fused into whole-stage codegen (§7.4(b),
  * same shape as [[WavRms]]).
  *
  * Registered as SQL function `jsonb_decode` by [[graft.GraftExtensions]].
  */
case class JsonbDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jsonb_decode expects a binary arg, got ${other.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any =
    UTF8String.fromString(
      graft.sources.Jsonb.decode(blob.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.sources.Jsonb.decode($b));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JsonbDecode =
    copy(child = newChild)
}
