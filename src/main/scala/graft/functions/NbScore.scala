package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled binary-NB likelihood-ratio table — the serving-side
  * kernel of [[graft.ops.NbClassifier.scoreBinary]], the
  * [[LmScore2]]/[[BpeEncode]] playbook applied to the classifier.
  *
  * The per-token ratios arrive PRE-COMPUTED as doubles (collected
  * from the same relational plan that the join form uses, so the
  * IEEE divisions happened once, identically); the kernel only
  * replays the position-ordered fold from 1.0 and the final prior
  * multiply over a token prefix — bit-identical to the relational
  * scorer and to the DuckDB oracle, with the same
  * `split(trim(text), " +")` tokenizer contract as [[LmModel]].
  */
final class NbRatios(keys: Array[String], ratios: Array[Double],
    dflt: Double, prior: Double, prefix: Int) extends Serializable {

  require(keys.length == ratios.length,
    s"nb_score: ${keys.length} keys vs ${ratios.length} ratios")
  require(prefix > 0, s"nb_score: prefix must be positive, got $prefix")

  private val m = new java.util.HashMap[String, java.lang.Double](
    keys.length * 2)
  locally {
    var i = 0
    while (i < keys.length) { m.put(keys(i), ratios(i)); i += 1 }
  }

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

  /** (n_seen, score, pred) ≡ NbClassifier.scoreBinary. */
  def score(text: UTF8String): InternalRow = {
    val ts = tokenize(text)
    val n = math.min(ts.length, prefix)
    var seen = 0L
    var acc = 1.0
    var i = 0
    while (i < n) {
      val r = m.get(ts(i))
      if (r != null) { seen += 1L; acc *= r.doubleValue() }
      else acc *= dflt
      i += 1
    }
    val s = acc * prior
    InternalRow(seen, s, s >= 1.0)
  }
}

/** `nb_score(text, keys, ratios, params)` → struct<n_seen:bigint,
  * score:double, pred:boolean>: whole-model binary-NB scoring in one
  * kernel call per document; `params` is the foldable literal
  * [default_ratio, prior_ratio, prefix]. Registered by
  * [[graft.GraftExtensions]]. */
case class NbScore(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_seen", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("pred", BooleanType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType,
      fourth.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(DoubleType, _),
          ArrayType(DoubleType, _)) =>
        if (second.foldable && third.foldable && fourth.foldable)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "nb_score model arrays must be foldable (literal) — the " +
            "model is fixed at plan time")
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "nb_score expects (string, array<string>, array<double>, " +
          s"array<double>), got (${a.simpleString}, ${b.simpleString}, " +
          s"${c.simpleString}, ${d.simpleString})")
    }

  @transient private lazy val model: NbRatios = {
    val keysArr = second.eval().asInstanceOf[ArrayData]
    require(keysArr != null, "nb_score: keys must not be null")
    val keys = Array.tabulate(keysArr.numElements()) { i =>
      val s = keysArr.getUTF8String(i)
      require(s != null, "nb_score: keys must not contain null")
      s.toString
    }
    val ratiosArr = third.eval().asInstanceOf[ArrayData]
    require(ratiosArr != null, "nb_score: ratios must not be null")
    val params = fourth.eval().asInstanceOf[ArrayData].toDoubleArray()
    require(params.length == 3,
      s"nb_score: params must be [default, prior, prefix], got " +
        s"${params.length} values")
    new NbRatios(keys, ratiosArr.toDoubleArray(),
      params(0), params(1), params(2).toInt)
  }

  override def nullSafeEval(t: Any, k: Any, r: Any, p: Any): Any =
    model.score(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbRatios", model,
      classOf[NbRatios].getName)
    nullSafeCodeGen(ctx, ev, (t, _, _, _) =>
      s"${ev.value} = $ref.score($t);")
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): NbScore =
    copy(first = f, second = s, third = t, fourth = q)
}
