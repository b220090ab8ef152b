package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Stride-1 token-window hashes of a document in ONE native pass:
  * `token_window_hash64(text, w)` ≡
  * `transform(sequence(0, greatest(n_tok − w, 0)),
  *            i -> xxhash64(slice(tokens, i + 1, w)))`
  * — value-identical by construction: same whitespace tokenization
  * as `split(trim(text), " +")`, and the same element-fold Spark's
  * `xxhash64` applies to an `array<string>` (each token's bytes
  * hashed with the running result as seed, from seed 42).
  * TokenWindowHashSpec pins the equality on randomized inputs.
  *
  * This is [[ShingleHash64]]'s sibling for the span-scrub path
  * (Lee et al. duplicated-span excision), whose composed form
  * evaluates an interpreted lambda per position and allocates a
  * `slice` array per window — O(tokens · w) allocations on the
  * corpus scan. The kernel hashes each window straight off the
  * byte offsets: zero per-window allocation. Short documents
  * (fewer than w tokens) produce exactly one window over all their
  * tokens, like `slice`'s clamping. Position i of the output is the
  * window starting at token i (the `posexplode` contract upstream).
  */
case class TokenWindowHash64(left: Expression, right: Expression)
  extends BinaryExpression {

  private lazy val w: Int = {
    require(right.foldable, "token_window_hash64: width must be a literal")
    val v = right.eval().asInstanceOf[Int]
    require(v > 0, s"token_window_hash64: width must be positive, got $v")
    v
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "token_window_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"token_window_hash64 expects (string, int), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(t: Any, nv: Any): Any =
    TokenWindowHash64.hashes(t.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) => {
      s"${ev.value} = graft.functions.TokenWindowHash64.hashes($t, $w);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TokenWindowHash64 =
    copy(left = newLeft, right = newRight)
}

object TokenWindowHash64 {

  /** Shared kernel for the interpreted and codegen paths. */
  def hashes(text: UTF8String, w: Int): ArrayData = {
    val bytes = text.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    var nTok = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    if (lo == hi) {
      starts(0) = lo; ends(0) = lo; nTok = 1
    } else {
      var i = lo
      while (i < hi) {
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = i
        while (i < hi && bytes(i) != ' ') i += 1
        ends(nTok) = i
        nTok += 1
        while (i < hi && bytes(i) == ' ') i += 1
      }
    }
    // positions 0..max(nTok − w, 0), inclusive — one window minimum
    val count = math.max(nTok - w, 0) + 1
    val out = new Array[Long](count)
    var s = 0
    while (s < count) {
      // Spark's xxhash64(array<string>): fold, each element hashed
      // with the running result as seed
      var h = 42L
      var k = s
      val end = math.min(s + w, nTok)
      while (k < end) {
        h = XXH64.hashUnsafeBytes(bytes,
          Platform.BYTE_ARRAY_OFFSET + starts(k), ends(k) - starts(k), h)
        k += 1
      }
      out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }
}
