package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_hash60(s)` → bigint: the engine's stable 60-bit md5 hash —
  * VALUE-IDENTICAL to the composed form
  * `conv(substring(md5(s), 1, 15), 16, 10) :: long`
  * ([[TextFunctions.tokenHash]], mirrored in DuckDB oracles as
  * `CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT)`), but
  * computed straight from the digest bytes: the first 15 hex chars
  * are the first 60 bits, i.e. the big-endian first-8-bytes value
  * shifted right by 4. The composed form pays a 32-char hex string
  * allocation, a substring, a base-16 STRING parse (conv) and a
  * decimal-string cast PER CALL — measured as the dominant cost of
  * the DSIR featurizer, which hashes every token and bigram of the
  * corpus. One thread-local MessageDigest, no intermediate strings.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_hash60 expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(s: Any): Any =
    Md5Hash60.hash60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.Md5Hash60.hash60($s)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Hash60 = copy(child = newChild)
}

object Md5Hash60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) as a non-negative long. */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    finish(md.digest(s.getBytes))
  }

  /** [[hash60]] over raw UTF-8 bytes. */
  def hash60Bytes(b: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    finish(md.digest(b))
  }

  /** [[hash60]] of the space-joined pair — `md5(w1 ⊕ ' ' ⊕ w2)`
    * streamed into the digest with no joined-string allocation.
    * Null parts follow `concat_ws` semantics (skipped; both null →
    * the empty string's digest). */
  def hash60Pair(a: Array[Byte], b: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    if (a != null) md.update(a)
    if (a != null && b != null) md.update(' '.toByte)
    if (b != null) md.update(b)
    finish(md.digest())
  }

  private def finish(d: Array[Byte]): Long = {
    // big-endian first 8 bytes, then drop the low nibble: 60 bits
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
