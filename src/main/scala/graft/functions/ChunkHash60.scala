package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5 chunk hashes of a document in ONE native pass:
  * `chunk_hash60(text, width, stride)` ≡
  * `transform(chunks(text, width, stride), tokenHash)` — the
  * [[TextFunctions.tokenHash]] contract (md5 of the space-joined
  * chunk, first 15 hex digits parsed base-16, i.e. the digest's top
  * 60 bits) over [[TextFunctions.chunks]]' windows (positions
  * `i·stride`, `i = 0..max(ceil((n_tok − width)/stride), 0)`, slice
  * clamped at the end). ChunkHashSpec pins the value parity.
  *
  * The composed form pays an interpreted lambda, a slice array, and
  * a joined string per chunk; the kernel walks the token byte
  * offsets once and feeds one reused buffer to MD5. md5 itself is
  * the contract (the DuckDB oracle states it), so the digest cost
  * stays — what disappears is the per-chunk allocation churn around
  * it.
  */
case class ChunkHash60(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  private lazy val w: Int = literalPositive(second, "width")
  private lazy val st: Int = {
    val v = literalPositive(third, "stride")
    require(v <= w, s"chunk_hash60: stride must be <= width, got $v > $w")
    v
  }

  private def literalPositive(e: Expression, what: String): Int = {
    require(e.foldable, s"chunk_hash60: $what must be a literal")
    val v = e.eval().asInstanceOf[Int]
    require(v > 0, s"chunk_hash60: $what must be positive, got $v")
    v
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "chunk_hash60"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"chunk_hash60 expects (string, int, int), got " +
          s"${a.simpleString}, ${b.simpleString}, ${c.simpleString}")
    }

  override def nullSafeEval(t: Any, wv: Any, sv: Any): Any =
    ChunkHash60.hashes(t.asInstanceOf[UTF8String], w, st)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _, _) => {
      s"${ev.value} = graft.functions.ChunkHash60.hashes($t, $w, $st);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ChunkHash60 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ChunkHash60 {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared kernel for the interpreted and codegen paths. */
  def hashes(text: UTF8String, w: Int, stride: Int): ArrayData = {
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
    // positions 0..max(ceil((nTok − w)/stride), 0) inclusive — the
    // chunks() sequence bound
    val count = math.max(
      math.ceil((nTok - w).toDouble / stride).toInt, 0) + 1
    val buf = new Array[Byte](hi - lo)
    val digest = md5.get()
    val out = new Array[Long](count)
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
      digest.reset()
      digest.update(buf, 0, len)
      val d = digest.digest()
      // first 15 hex digits base-16 = the digest's top 60 bits
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(c) = v >>> 4
      c += 1
    }
    new GenericArrayData(out)
  }
}
