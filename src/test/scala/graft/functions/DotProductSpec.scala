package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f))
  ).toDF("id", "a", "b")

  test("native dot_product matches analytic values") {
    val out = vecs.select($"id", Similarity.dot($"a", $"b").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 32.0)
  }

  test("native kernel is bit-identical to the higher-order fold") {
    val both = vecs.select(
      Similarity.dot($"a", $"b").as("native"),
      Similarity.dotHof($"a", $"b").as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h))
    }
  }

  test("mismatched lengths yield null — native and HOF agree") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(Similarity.dot($"a", $"b").as("n"),
      Similarity.dotHof($"a", $"b").as("h")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("null arrays yield null") {
    val df = Seq((Option.empty[Array[Float]], Option(Array(1.0f))))
      .toDF("a", "b")
    val r = df.select(Similarity.dot($"a", $"b")).collect().head
    assert(r.isNullAt(0))
  }

  test("wrong types fail analysis") {
    val bad = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(Similarity.dot($"a", $"b")).collect()
    }
  }
}
