package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.JsonbWriter._

class JsonbDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def decodeAll(blobs: Seq[Array[Byte]]): Seq[String] =
    blobs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "blob")
      .select($"i", call_function("jsonb_decode", $"blob").as("j"))
      .orderBy("i").as[(Int, String)].collect().map(_._2).toSeq

  test("decodes JSONB blobs inside whole-stage codegen") {
    val blobs = Seq(
      blob(JObj(Seq("a" -> JI16(1), "s" -> JS("x")))),
      blob(JArr(Seq(JNull, JBool(true), JD(2.5)))),
      blob(JDec("-7.25", 6, 2)))
    assert(decodeAll(blobs) ==
      Seq("""{"a":1,"s":"x"}""", """[null,true,2.5]""", "-7.25"))
  }

  test("NULL blob yields NULL; SQL-registered; non-binary arg rejected") {
    val out = Seq((1, Option.empty[Array[Byte]]),
      (2, Some(blob(JI16(9)))))
      .toDF("i", "blob")
      .selectExpr("jsonb_decode(blob) AS j")
      .as[Option[String]].collect().toSet
    assert(out == Set(None, Some("9")))
    val e = intercept[Exception] {
      Seq(1).toDF("x").selectExpr("jsonb_decode(x)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("malformed blobs fail loudly (strict, like the sources' default)") {
    val e = intercept[Exception] {
      Seq((1, Array(0x0d.toByte, 0.toByte))).toDF("i", "blob")
        .selectExpr("jsonb_decode(blob)").collect()
    }
    assert(e.getMessage.contains("unsupported") ||
      e.getCause != null)
  }
}
