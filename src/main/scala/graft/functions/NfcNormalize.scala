package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (`nfc_normalize(text)`) — the curation
  * stage that has to run BEFORE any hash-based dedup or shingle
  * computation: "café" composed (U+00E9) and decomposed
  * (e + U+0301) are byte-different strings with identical rendering,
  * so un-normalized corpora under-deduplicate (same page crawled
  * from two CMSes hashes twice) and blocklists silently miss.
  * Canonical composition (NFC) is the identity on ASCII and
  * already-composed text — the fast path below avoids the normalizer
  * entirely for pure-ASCII bytes, which is most of a web corpus.
  *
  * Backed by `java.text.Normalizer` (ICU-equivalent NFC per Unicode
  * TR15 — the SAME canonical forms DuckDB's `nfc_normalize` and
  * Python's `unicodedata.normalize("NFC", …)` produce, which is what
  * makes the oracle cross-check meaningful). Registered by
  * [[graft.GraftExtensions]].
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($s);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** ASCII fast path: bytes < 0x80 are NFC-invariant, skip the
    * String round-trip entirely. Called from generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}
