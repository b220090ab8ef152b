package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-window STRINGS of a document in one native pass:
  * `shingle_utf8(text, n, stride)` covers both composed forms —
  *  - `stride = 1` ≡ [[TextFunctions.shingles]] (all n-grams, EMPTY
  *    array under n tokens);
  *  - `stride ≥ 1` with the chunk bound ≡ [[TextFunctions.chunks]]
  *    (positions `i·stride`, `i = 0..max(ceil((n_tok−w)/stride),0)`,
  *    last chunk clamped).
  *
  * The two contracts differ ONLY in the short-document case (shingles
  * yields nothing, chunks yields one clamped window), which is
  * exactly the `stride = 1` vs `chunked` distinction the third
  * argument selects: stride 1 → shingle semantics, else chunk
  * semantics. Tokenization and joining match the composed forms
  * byte-for-byte (split on space runs, trim spaces, single-space
  * join), so outputs are string-identical — pinned by
  * ShingleUtf8Spec.
  *
  * The sibling of [[ShingleHash64]]/[[ChunkHash60]] for consumers
  * that need the window TEXT itself (top-n-gram reporting, chunk
  * fingerprints for humans): the per-window string must exist in the
  * output, but the interpreted lambda + element_at churn around
  * building it does not.
  */
case class ShingleUtf8(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  private lazy val w: Int = literalPositive(second, "n")
  private lazy val st: Int = {
    val v = literalPositive(third, "stride")
    require(v <= w, s"shingle_utf8: stride must be <= n, got $v > $w")
    v
  }

  private def literalPositive(e: Expression, what: String): Int = {
    require(e.foldable, s"shingle_utf8: $what must be a literal")
    val v = e.eval().asInstanceOf[Int]
    require(v > 0, s"shingle_utf8: $what must be positive, got $v")
    v
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "shingle_utf8"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"shingle_utf8 expects (string, int, int), got " +
          s"${a.simpleString}, ${b.simpleString}, ${c.simpleString}")
    }

  override def nullSafeEval(t: Any, wv: Any, sv: Any): Any =
    ShingleUtf8.windows(t.asInstanceOf[UTF8String], w, st)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _, _) => {
      s"${ev.value} = graft.functions.ShingleUtf8.windows($t, $w, $st);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ShingleUtf8 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ShingleUtf8 {

  private val EMPTY = new GenericArrayData(new Array[Any](0))

  /** Shared kernel for the interpreted and codegen paths. */
  def windows(text: UTF8String, w: Int, stride: Int): ArrayData = {
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
    // stride 1 → shingle semantics (EMPTY under w tokens); else the
    // chunk bound (one clamped window minimum)
    val count =
      if (stride == 1) nTok - w + 1
      else math.max(math.ceil((nTok - w).toDouble / stride).toInt, 0) + 1
    if (count <= 0) return EMPTY
    val buf = new Array[Byte](hi - lo)
    val out = new Array[Any](count)
    var c = 0
    while (c < count) {
      val s = c * stride
      val end = math.min(s + w, nTok)
      var len = 0
      var k = s
      while (k < end) {
        if (k > s) { buf(len) = ' '; len += 1 }
        val tl = ends(k) - starts(k)
        System.arraycopy(bytes, starts(k), buf, len, tl)
        len += tl
        k += 1
      }
      // copyOfRange: fromBytes REFERENCES the array — reusing buf
      // without the copy would corrupt every earlier window
      out(c) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, 0, len))
      c += 1
    }
    new GenericArrayData(out)
  }
}
