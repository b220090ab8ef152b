package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-grams of a document as ONE native byte pass:
  * `char_ngrams_utf8(text, n)` ≡ the composed
  * [[TextFunctions.charNgrams]] Catalyst form — value-identical by
  * construction (same `trim` of 0x20 runs at the edges, space runs
  * inside normalize to one ▁ U+2581, windows slide by CODEPOINT with
  * the same short-text/empty/null contract; CharNgramSpec pins the
  * equality on randomized multilingual inputs).
  *
  * Why a kernel: the composed form computes each window with
  * `substring(t, i, n)`, and UTF8String codepoint indexing walks the
  * bytes FROM THE START for every i — O(L²) per document, evaluated
  * interpreted inside a higher-order `transform`, and re-evaluated in
  * every subtree that references the gram stream (the char-gram
  * LM/NB/DSIR gate queries train unigrams, bigrams AND score off the
  * same expression). This pass records the codepoint start offsets
  * once while normalizing, then each gram is one bounded byte slice:
  * O(L·n_bytes) total, inside whole-stage codegen — measured ~4-7×
  * on the char-gram query family (OPTIMIZATION_r14.md).
  *
  * NULL text → NULL. `n` must be a positive int literal.
  */
case class CharNgramsUtf8(left: Expression, right: Expression)
  extends BinaryExpression {

  private lazy val n: Int = {
    require(right.foldable, "char_ngrams_utf8: n must be a literal")
    val v = right.eval().asInstanceOf[Int]
    require(v > 0, s"char_ngrams_utf8: n must be positive, got $v")
    v
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "char_ngrams_utf8"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        // foldability/positivity enforced at ANALYSIS time (r15
        // advice): a SQL caller with a non-literal or non-positive n
        // gets a clear analysis error, not an opaque eval-time
        // require (same discipline as DsirFeatureBuckets)
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(
            "char_ngrams_utf8: n must be a literal")
        else right.eval() match {
          case null => TypeCheckResult.TypeCheckFailure(
            "char_ngrams_utf8: n must not be null")
          case v: Integer if v <= 0 => TypeCheckResult.TypeCheckFailure(
            s"char_ngrams_utf8: n must be positive, got $v")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"char_ngrams_utf8 expects (string, int), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(t: Any, nv: Any): Any =
    CharNgramsUtf8.ngrams(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) => {
      s"${ev.value} = graft.functions.CharNgramsUtf8.ngrams($t, $n);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CharNgramsUtf8 =
    copy(left = newLeft, right = newRight)
}

object CharNgramsUtf8 {

  private val EMPTY = new GenericArrayData(new Array[Any](0))
  // U+2581 LOWER ONE EIGHTH BLOCK '▁' (the sentencepiece space mark)
  private val MARK = Array[Byte](0xE2.toByte, 0x96.toByte, 0x81.toByte)

  /** Shared kernel for the interpreted and codegen paths. */
  def ngrams(text: UTF8String, n: Int): ArrayData = {
    val b = text.getBytes
    var lo = 0
    var hi = b.length
    // trim(text): leading/trailing 0x20 only — the Spark contract
    while (lo < hi && b(lo) == 0x20) lo += 1
    while (hi > lo && b(hi - 1) == 0x20) hi -= 1
    if (lo == hi) return EMPTY
    // normalize space runs to ▁ while recording codepoint starts;
    // worst case every input byte is a lone space → 3 bytes out
    val buf = new Array[Byte]((hi - lo) * 3)
    var starts = new Array[Int](math.min(hi - lo, 64) + 1)
    var cp = 0
    var m = 0
    var i = lo
    while (i < hi) {
      if (cp + 1 >= starts.length) {
        starts = java.util.Arrays.copyOf(starts, starts.length * 2)
      }
      starts(cp) = m
      cp += 1
      if (b(i) == 0x20) {
        buf(m) = MARK(0); buf(m + 1) = MARK(1); buf(m + 2) = MARK(2)
        m += 3
        while (i < hi && b(i) == 0x20) i += 1
      } else {
        // clamped like UTF8String's own walkers on a truncated tail
        val end = math.min(i + UTF8String.numBytesForFirstByte(b(i)), hi)
        while (i < end) { buf(m) = b(i); m += 1; i += 1 }
      }
    }
    starts(cp) = m
    if (cp < n) {
      return new GenericArrayData(
        Array[Any](UTF8String.fromBytes(buf, 0, m)))
    }
    val out = new Array[Any](cp - n + 1)
    var j = 0
    while (j < out.length) {
      out(j) =
        UTF8String.fromBytes(buf, starts(j), starts(j + n) - starts(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
