package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled DSIR importance-weight table — the serving-side kernel
  * of [[graft.ops.Dsir]], completing the kernel-twin family
  * ([[LmScore2]], [[NbScore]]): the bucket space is FIXED (B
  * entries), so the whole model is a dense double array indexed by
  * `md5_hash60(feature) % B` — not even a hash map — pre-filled with
  * the smoothed empty-bucket default. Scoring tokenizes
  * (`split(trim, " +")`, the shared kernel contract), hashes the
  * first `prefix` features (unigrams in position order, then
  * space-joined bigrams — the same canonical order the relational
  * featurizer emits) and folds the ratios from 1.0. The ratio
  * doubles arrive engine-evaluated from the same plan the relational
  * scorer uses, so weights are bit-identical to
  * [[graft.ops.Dsir.weightsSplit]] and to the DuckDB oracle.
  */
final class DsirRatios(ratios: Array[Double], prefix: Int)
    extends Serializable {

  require(prefix > 0, s"dsir_score: prefix must be positive, got $prefix")
  private val b = ratios.length

  private def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    if (lo >= hi) return Array("")
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    var i = lo
    var start = lo
    while (i < hi) {
      if (s.charAt(i) == ' ') {
        out += s.substring(start, i)
        while (i < hi && s.charAt(i) == ' ') i += 1
        start = i
      } else i += 1
    }
    out += s.substring(start, hi)
    out.toArray
  }

  private def ratioOf(f: String): Double =
    ratios((Md5Hash60.hash60(UTF8String.fromString(f)) % b).toInt)

  /** (n_feat, weight) ≡ Dsir.weightsSplit. */
  def score(text: UTF8String): InternalRow = {
    val ts = tokenize(text)
    var acc = 1.0
    var n = 0L
    var i = 0
    // unigram features first (position order)...
    while (i < ts.length && n < prefix) {
      acc *= ratioOf(ts(i))
      n += 1L
      i += 1
    }
    // ...then bigram features, continuing the canonical order
    i = 0
    while (i + 1 < ts.length && n < prefix) {
      acc *= ratioOf(ts(i) + " " + ts(i + 1))
      n += 1L
      i += 1
    }
    InternalRow(n, acc)
  }
}

/** `dsir_score(text, ratios, prefix)` → struct<n_feat:bigint,
  * weight:double>: whole-model DSIR importance weighting in one
  * kernel call per document; `ratios` is the dense per-bucket
  * literal array (its length IS the bucket space B). Registered by
  * [[graft.GraftExtensions]]. */
case class DsirScore(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_feat", LongType, nullable = false),
    StructField("weight", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(DoubleType, _), IntegerType) =>
        if (second.foldable && third.foldable)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "dsir_score model array and prefix must be foldable " +
            "(literal) — the model is fixed at plan time")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "dsir_score expects (string, array<double>, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  @transient private lazy val model: DsirRatios = {
    val arr = second.eval().asInstanceOf[ArrayData]
    require(arr != null, "dsir_score: ratios must not be null")
    new DsirRatios(arr.toDoubleArray(),
      third.eval().asInstanceOf[Int])
  }

  override def nullSafeEval(t: Any, r: Any, p: Any): Any =
    model.score(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirRatios", model,
      classOf[DsirRatios].getName)
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"${ev.value} = $ref.score($t);")
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): DsirScore =
    copy(first = f, second = s, third = t)
}
