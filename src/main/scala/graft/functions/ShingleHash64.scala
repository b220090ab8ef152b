package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle hashes of a document, as ONE native
  * pass over the text bytes: `shingle_hash64(text, n)` ≡
  * `array_distinct(shingles(text, n))` mapped through `xxhash64` —
  * value-identical by construction (same whitespace tokenization,
  * same single-space joining, Spark's own XXH64 with its seed 42
  * over the same UTF-8 bytes; ShingleHashSpec pins the equality on
  * randomized inputs).
  *
  * Why a kernel: the composed form is the corpus-scan hot path of
  * the whole n-gram dedup family (Jaccard, containment,
  * decontamination), and Catalyst evaluates its nested
  * `transform`/`concat_ws` lambdas INTERPRETED — per shingle, it
  * allocates a token array, n element_at lookups, and a joined
  * string, then hashes it. This expression tokenizes once (byte
  * scan for space runs, leading/trailing spaces trimmed — exactly
  * `split(trim(text), " +")`), rebuilds each shingle into one
  * reused buffer, and hashes in place: O(text bytes · n) with zero
  * per-shingle allocation, inside whole-stage codegen. The PPM/WAV
  * kernels' lesson applied to the text family.
  *
  * Output order is first occurrence (like `array_distinct`); every
  * consumer explodes into joins/aggregates, so order is immaterial.
  * NULL text → NULL. `n` must be a positive literal.
  */
case class ShingleHash64(left: Expression, right: Expression)
  extends BinaryExpression {

  private lazy val n: Int = {
    require(right.foldable, "shingle_hash64: n must be a literal")
    val v = right.eval().asInstanceOf[Int]
    require(v > 0, s"shingle_hash64: n must be positive, got $v")
    v
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "shingle_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hash64 expects (string, int), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(t: Any, nv: Any): Any =
    ShingleHash64.hashes(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) => {
      s"${ev.value} = graft.functions.ShingleHash64.hashes($t, $n);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleHash64 =
    copy(left = newLeft, right = newRight)
}

object ShingleHash64 {

  private val EMPTY = new GenericArrayData(Array.emptyLongArray)

  /** Shared kernel for the interpreted and codegen paths. */
  def hashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // trim ' ' only — the semantics of trim() the composed form uses
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    // token boundaries: maximal runs of non-space bytes. An
    // all-space/empty text splits to ONE empty token (Java split
    // semantics) — fewer than n tokens either way unless n == 1.
    var nTok = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    if (lo == hi) {
      starts(0) = lo; ends(0) = lo; nTok = 1
    } else {
      var i = lo
      while (i < hi) {
        // i is at a non-space byte (runs of spaces skipped below)
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
    val count = nTok - n + 1
    if (count <= 0) return EMPTY
    // one reusable buffer; a shingle can never exceed the trimmed
    // text length (tokens + single separators)
    val buf = new Array[Byte](hi - lo)
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var nOut = 0
    var s = 0
    while (s < count) {
      var len = 0
      var k = 0
      while (k < n) {
        if (k > 0) { buf(len) = ' '; len += 1 }
        val tl = ends(s + k) - starts(s + k)
        System.arraycopy(bytes, starts(s + k), buf, len, tl)
        len += tl
        k += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET,
        len, 42L)
      if (seen.add(h)) { out(nOut) = h; nOut += 1 }
      s += 1
    }
    new GenericArrayData(
      if (nOut == count) out else java.util.Arrays.copyOf(out, nOut))
  }
}
