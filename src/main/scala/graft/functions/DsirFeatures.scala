package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `dsir_feature_buckets(toks, B)` → array<bigint>: the DSIR hashed
  * n-gram feature array of one document — unigram buckets in
  * position order, then adjacent-pair (space-joined) bigram buckets
  * in position order, each `md5_hash60(feature) % B` — computed in
  * ONE pass over the token array. VALUE-IDENTICAL to the composed
  * form ([[graft.ops.Dsir.featuresToks]]'s former body:
  * `transform(toks, md5…) ++ transform(concat_ws pairs, md5…)`,
  * DsirSpec pins the equality), but without materializing a joined
  * pair STRING per bigram or walking the array through two
  * interpreted higher-order transforms: the pair digest streams
  * `w1 ⊕ ' ' ⊕ w2` straight into one thread-local MessageDigest.
  * The training featurizer hashes every token and bigram of the
  * corpus, so this is its per-task hot loop (optimization guide
  * §1.2 step 2).
  *
  * Null semantics mirror the composed form exactly: null `toks` →
  * null; a null ELEMENT yields a null unigram bucket (md5 of null is
  * null) while pair joins skip nulls like `concat_ws` (both null →
  * md5 of the empty string).
  */
case class DsirFeatureBuckets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "dsir_feature_buckets bucket space must be foldable (literal)")
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        "dsir_feature_buckets expects (array<string>, int), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  @transient private lazy val buckets: Int = {
    val b = right.eval().asInstanceOf[Int]
    require(b > 0, s"dsir_feature_buckets: bucket space $b must be > 0")
    b
  }

  override def nullSafeEval(t: Any, b: Any): Any =
    DsirFeatureBuckets.featurize(t.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("dsirBuckets",
      java.lang.Integer.valueOf(buckets), "java.lang.Integer")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.DsirFeatureBuckets" +
        s".featurize($t, $b.intValue());")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DsirFeatureBuckets = copy(left = l, right = r)
}

object DsirFeatureBuckets {

  /** Unigram buckets in position order, then bigram buckets — one
    * pass, byte-level digests, no pair-string materialization. */
  def featurize(toks: ArrayData, buckets: Int): ArrayData = {
    val n = toks.numElements()
    val big = if (n >= 2) n - 1 else 0
    val out = new Array[Any](n + big)
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i))
        bytes(i) = toks.getUTF8String(i).getBytes
      // null element: bytes(i) stays null
      i += 1
    }
    val bl = buckets.toLong
    i = 0
    while (i < n) {
      if (bytes(i) != null)
        out(i) = Md5Hash60.hash60Bytes(bytes(i)) % bl
      // else null unigram bucket (md5 of a null token is null)
      i += 1
    }
    i = 0
    while (i < big) {
      out(n + i) = Md5Hash60.hash60Pair(bytes(i), bytes(i + 1)) % bl
      i += 1
    }
    new GenericArrayData(out)
  }
}
