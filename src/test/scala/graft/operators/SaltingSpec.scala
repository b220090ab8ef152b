package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  // skewed: key "hot" has 1000 rows, others 1 each
  private def skewed = ((1 to 1000).map(i => ("hot", i.toDouble)) ++
    Seq(("a", 1.0), ("b", 2.0))).toDF("k", "v")

  test("saltedSumCount equals the direct aggregate") {
    val salted = Salting.saltedSumCount(skewed, Seq("k"), "v", buckets = 8)
      .orderBy("k").as[(String, Double, Long)].collect().toSeq
    val direct = skewed.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy("k").as[(String, Double, Long)].collect().toSeq
    assert(salted == direct)
  }

  test("salted partials actually split the hot key") {
    val partials = skewed.withColumn("__salt", Salting.rowSalt(skewed, 8))
      .filter($"k" === "hot").select($"__salt").distinct().count()
    assert(partials > 1, "hot key must spread across salt buckets")
  }

  test("saltedJoin equals the plain join") {
    val left = skewed
    val right = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("unused", "U"))
      .toDF("k", "label")
    val salted = Salting.saltedJoin(left, right, "k", buckets = 4)
      .select($"k", $"v", $"label")
      .as[(String, Double, String)].collect().sortBy(r => (r._1, r._2))
    val plain = left.join(right, Seq("k"))
      .select($"k", $"v", $"label")
      .as[(String, Double, String)].collect().sortBy(r => (r._1, r._2))
    assert(salted.toSeq == plain.toSeq)
  }
}
