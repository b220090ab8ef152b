package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

class NfcNormalizeKernelSpec extends AnyFunSuite {
  private def n(s: String): String =
    NfcNormalize.normalize(UTF8String.fromString(s)).toString

  test("composes decomposed sequences to canonical NFC") {
    assert(n("café") == "café")
    assert(n("Ångström") == "Ångström")
  }

  test("ASCII takes the fast path and returns the SAME object") {
    val in = UTF8String.fromString("plain ascii")
    assert(NfcNormalize.normalize(in) eq in)
  }

  test("already-NFC non-ASCII is returned unchanged") {
    val in = UTF8String.fromString("café")
    assert(NfcNormalize.normalize(in) eq in)
  }
}

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("nfc_normalize SQL function: values, nulls, codegen stage") {
    val df = Seq((1L, "café"), (2L, "café"), (3L, "plain"),
      (4L, null.asInstanceOf[String])).toDF("id", "s")
    val out = df.select($"id", call_function("nfc_normalize", $"s").as("n"))
    val m = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(m(1L) == "café" && m(2L) == "café")
    assert(m(3L) == "plain" && m(4L) == null)
    // plan check over a non-local source (a LocalRelation input is
    // pre-evaluated by ConvertToLocalRelation before codegen exists)
    val ranged = spark.range(10).select(
      call_function("nfc_normalize", concat(lit("x"), $"id".cast("string"))))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // whole-stage codegen, no fallback
  }
}
