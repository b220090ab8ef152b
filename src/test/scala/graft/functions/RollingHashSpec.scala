package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def ref(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) =>
      (h * RollingHash.B + (b & 0xff)) % RollingHash.P)

  test("matches the reference fold (codegen path)") {
    val inputs = Seq("", "a", "abc", "the quick brown fox", "x" * 1000)
    val got = inputs.toDF("s")
      .select($"s", call_function("rolling_hash", $"s").as("h"))
      .as[(String, Long)].collect().toMap
    inputs.foreach(s => assert(got(s) == ref(s), s"for '${s.take(10)}...'"))
  }

  test("null propagates") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(call_function("rolling_hash", $"s")).collect().head
    assert(r.isNullAt(0))
  }

  test("non-string input fails analysis") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(call_function("rolling_hash", $"x")).collect()
    }
  }
}
