package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two float-array columns, accumulated in
  * double, left-to-right — bit-identical to the
  * `aggregate(zip_with(...))` lambda pipeline it replaces, but
  * whole-stage-codegen'd: one fused loop over the two ArrayData
  * buffers instead of interpreted higher-order functions
  * materializing an intermediate array per row. This is the §7.4(b)
  * path: a custom Catalyst Expression (with doGenCode) beats a UDF,
  * which beats everything else, for a hot scalar kernel that runs
  * |Q|×|C| times inside ANN joins.
  *
  * Registered as SQL function `dot_product` by [[graft.GraftExtensions]].
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // Always nullable: mismatched array lengths yield NULL regardless of
  // input nullability. Deriving from the children would let
  // nullSafeCodeGen emit isNull as a literal `false` lvalue (Janino
  // compile error → codegen fallback) and break the interpreted
  // contract (same pattern as Spark's ElementAt).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_product expects array<float> args, got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  // Mismatched lengths yield NULL — the same result as the
  // zip_with/aggregate reference pipeline (zip_with null-pads the
  // shorter array, poisoning the sum), so the native kernel and the
  // HOF cross-check agree on malformed embeddings too.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
