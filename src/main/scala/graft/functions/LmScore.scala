package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled stupid-backoff LM scoring table — the serving-side
  * kernel of [[graft.ops.LangModel]], the [[BpeEncode]] playbook
  * applied to LM scoring.
  *
  * The relational scorer (`LangModel.score`/`scoreTrigram` — retained
  * as the general path and the differential reference) explodes the
  * corpus to window granularity, joins the model tables, and
  * regroups by document for the order-fixed fold: the right shape
  * when the model is UNBOUNDED, but a minCount-pruned production
  * model fits comfortably in executor memory, and the join pipeline
  * then pays explode + N hash joins + a doc-keyed shuffle for what
  * is per-document-local arithmetic. This kernel compiles the model
  * ONCE per plan from one foldable (keys, counts) literal pair —
  * n-gram order read off each key's space count, unambiguous because
  * the tokenizer splits on spaces — into hash tables shipped inside
  * the expression; scoring is one pass per document: no explode, no
  * join, no shuffle.
  *
  * Arithmetic is BIT-IDENTICAL to the relational form (spec-pinned,
  * and both hash-check against the same DuckDB oracle): the same
  * correctly-rounded IEEE divides/multiplies, the same
  * transition-order left-fold from 0.0, the same tokenizer contract
  * (`split(trim(text), " +")`).
  */
final class LmModel(keys: Array[String], cnts: Array[Long],
    alpha: Double) extends Serializable {

  require(keys.length == cnts.length,
    s"lm model: ${keys.length} keys vs ${cnts.length} counts")

  private val uni = new java.util.HashMap[String, Long]()
  private val big = new java.util.HashMap[String, Long]()
  private val tri = new java.util.HashMap[String, Long]()
  locally {
    var i = 0
    while (i < keys.length) {
      val k = keys(i)
      var spaces = 0
      var j = 0
      while (j < k.length) { if (k.charAt(j) == ' ') spaces += 1; j += 1 }
      (spaces: @annotation.switch) match {
        case 0 => uni.put(k, cnts(i))
        case 1 => big.put(k, cnts(i))
        case 2 => tri.put(k, cnts(i))
        case n => throw new IllegalArgumentException(
          s"lm model: key '$k' has $n spaces — only 1..3-grams")
      }
      i += 1
    }
  }
  private val nTotal: Long = {
    var s = 0L
    uni.forEach((_, c) => s += c)
    s
  }
  private val v: Long = uni.size().toLong
  private val denom: Double = (nTotal + v).toDouble

  /** `split(trim(text), " +")` replicated exactly: strip leading and
    * trailing 0x20, split on runs of 0x20 — an all-space or empty
    * string yields the single empty token, like Spark's split. */
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

  private def uniCnt(w: String): Long = {
    val c = uni.get(w)
    if (c == 0L && !uni.containsKey(w)) 0L else c
  }

  /** Bigram scoring ≡ LangModel.score: (n_trans, n_hits, mean_p). */
  def score2(text: UTF8String): InternalRow = {
    val ts = tokenize(text)
    val n = ts.length - 1
    if (n < 1) return InternalRow(0L, 0L, 0.0)
    var hits = 0L
    var acc = 0.0
    var i = 0
    while (i < n) {
      val w1 = ts(i)
      val w2 = ts(i + 1)
      val kb = w1 + " " + w2
      val p =
        if (big.containsKey(kb) && uni.containsKey(w1)) {
          hits += 1L
          big.get(kb).toDouble / uni.get(w1).toDouble
        } else alpha * ((uniCnt(w2) + 1L).toDouble / denom)
      acc += p
      i += 1
    }
    InternalRow(n.toLong, hits, acc / n.toDouble)
  }

  /** Trigram scoring ≡ LangModel.scoreTrigram:
    * (n_win, n_tri_hits, n_big_hits, mean_p). */
  def score3(text: UTF8String): InternalRow = {
    val ts = tokenize(text)
    val n = ts.length - 2
    if (n < 1) return InternalRow(0L, 0L, 0L, 0.0)
    var triHits = 0L
    var bigHits = 0L
    var acc = 0.0
    var i = 0
    while (i < n) {
      val w1 = ts(i)
      val w2 = ts(i + 1)
      val w3 = ts(i + 2)
      val kTri = w1 + " " + w2 + " " + w3
      val kCtx = w1 + " " + w2
      val kBg = w2 + " " + w3
      val p =
        if (tri.containsKey(kTri) && big.containsKey(kCtx)) {
          triHits += 1L
          tri.get(kTri).toDouble / big.get(kCtx).toDouble
        } else if (big.containsKey(kBg) && uni.containsKey(w2)) {
          bigHits += 1L
          alpha * (big.get(kBg).toDouble / uni.get(w2).toDouble)
        } else alpha * alpha * ((uniCnt(w3) + 1L).toDouble / denom)
      acc += p
      i += 1
    }
    InternalRow(n.toLong, triHits, bigHits, acc / n.toDouble)
  }
}

/** Per-language compiled LM bank — one [[LmModel]] per group key,
  * the serve-side form of [[graft.ops.LangModel.scoreBy]] (the CCNet
  * per-language recipe): each document scores against ITS OWN
  * language's model in one kernel call; a document whose group has
  * no model returns the relational form's restored (0, 0, 0.0) row.
  * Ships as ONE broadcast value ([[LmScoreByBc]]). */
final class LmModelBank(keys: Array[String], models: Array[LmModel])
    extends Serializable {

  require(keys.length == models.length,
    s"lm bank: ${keys.length} keys vs ${models.length} models")

  private val m = new java.util.HashMap[String, LmModel](keys.length * 2)
  locally {
    var i = 0
    while (i < keys.length) { m.put(keys(i), models(i)); i += 1 }
  }

  def score2(text: UTF8String, g: UTF8String): InternalRow = {
    val model = m.get(g.toString)
    if (model == null) InternalRow(0L, 0L, 0.0) else model.score2(text)
  }

  def score3(text: UTF8String, g: UTF8String): InternalRow = {
    val model = m.get(g.toString)
    if (model == null) InternalRow(0L, 0L, 0L, 0.0)
    else model.score3(text)
  }
}

private[functions] trait LmScoreBase extends QuaternaryExpression {

  def kernelName: String

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType,
      fourth.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(LongType, _),
          DoubleType) =>
        if (second.foldable && third.foldable && fourth.foldable)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$kernelName model arrays and alpha must be foldable " +
            "(literal) — the model is fixed at plan time")
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$kernelName expects (string, array<string>, array<bigint>, " +
          s"double), got (${a.simpleString}, ${b.simpleString}, " +
          s"${c.simpleString}, ${d.simpleString})")
    }

  @transient protected lazy val model: LmModel = {
    val keysArr = second.eval().asInstanceOf[ArrayData]
    require(keysArr != null, s"$kernelName: keys must not be null")
    val keys = Array.tabulate(keysArr.numElements()) { i =>
      val s = keysArr.getUTF8String(i)
      require(s != null, s"$kernelName: keys must not contain null")
      s.toString
    }
    val cntArr = third.eval().asInstanceOf[ArrayData]
    require(cntArr != null, s"$kernelName: counts must not be null")
    new LmModel(keys, cntArr.toLongArray(),
      fourth.eval().asInstanceOf[Double])
  }
}

/** `lm_score2(text, keys, counts, alpha)` → struct<n_trans:bigint,
  * n_hits:bigint, mean_p:double>: whole-model stupid-backoff bigram
  * scoring in one kernel call per document; `keys` carries unigrams
  * and space-joined bigrams in one literal array. Registered by
  * [[graft.GraftExtensions]]. */
case class LmScore2(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends LmScoreBase {

  override def kernelName: String = "lm_score2"

  override def dataType: DataType = StructType(Seq(
    StructField("n_trans", LongType, nullable = false),
    StructField("n_hits", LongType, nullable = false),
    StructField("mean_p", DoubleType, nullable = false)))

  override def nullSafeEval(t: Any, k: Any, c: Any, a: Any): Any =
    model.score2(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmModel", model, classOf[LmModel].getName)
    nullSafeCodeGen(ctx, ev, (t, _, _, _) =>
      s"${ev.value} = $ref.score2($t);")
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): LmScore2 =
    copy(first = f, second = s, third = t, fourth = q)
}

/** `lm_score3(text, keys, counts, alpha)` → struct<n_win,
  * n_tri_hits, n_big_hits, mean_p>: trigram two-level-backoff
  * scoring, one kernel call per document; `keys` carries unigrams,
  * bigrams and trigrams (space-joined) in one literal array.
  * Registered by [[graft.GraftExtensions]]. */
case class LmScore3(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends LmScoreBase {

  override def kernelName: String = "lm_score3"

  override def dataType: DataType = StructType(Seq(
    StructField("n_win", LongType, nullable = false),
    StructField("n_tri_hits", LongType, nullable = false),
    StructField("n_big_hits", LongType, nullable = false),
    StructField("mean_p", DoubleType, nullable = false)))

  override def nullSafeEval(t: Any, k: Any, c: Any, a: Any): Any =
    model.score3(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmModel", model, classOf[LmModel].getName)
    nullSafeCodeGen(ctx, ev, (t, _, _, _) =>
      s"${ev.value} = $ref.score3($t);")
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): LmScore3 =
    copy(first = f, second = s, third = t, fourth = q)
}
