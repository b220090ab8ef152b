package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BatchInferSpec extends SparkSpec {
  import spark.implicits._

  test("model sees bounded batches covering every row exactly once") {
    val df = (1L to 1000L).toDF("id").repartition(4)
    // score := the size of the batch the row arrived in
    val out = BatchInfer.scoreBatches(df, batchSize = 64,
      batch => Seq.fill(batch.length)(batch.length.toDouble))
    val sizes = out.select($"score").as[Double].collect()
    assert(sizes.length == 1000)
    assert(sizes.forall(s => s >= 1 && s <= 64), "batch cap violated")
    // full batches dominate; only per-partition tails are short
    assert(sizes.count(_ == 64.0) >= 1000 - 4 * 64)
  }

  test("row-local model is partitioning-invariant") {
    def score(r: Row): Double = (r.getAs[Long]("id") % 97).toDouble / 97.0
    def run(parts: Int): Map[Long, Double] = {
      val df = (1L to 500L).toDF("id").repartition(parts)
      BatchInfer.scoreBatches(df, 32, _.map(score))
        .select($"id", $"score").as[(Long, Double)].collect().toMap
    }
    assert(run(3) == run(7))
  }

  test("model returning a wrong-length score vector fails loudly") {
    val df = (1L to 10L).toDF("id")
    val broken = BatchInfer.scoreBatches(df, 4, _ => Seq(1.0))
    val e = intercept[org.apache.spark.SparkException] {
      broken.collect()
    }
    assert(e.getMessage.contains("outputs") ||
      e.getCause.getMessage.contains("outputs"))
  }

  test("inferBatches appends a typed column through the same " +
    "transport (the frameFeature integration point)") {
    val df = (1L to 100L).toDF("id").repartition(5)
    val out = BatchInfer.inferBatches(df, 16, "tag",
      org.apache.spark.sql.types.StringType,
      batch => batch.map(r => s"v${r.getLong(0) % 7}"))
    val got = out.select($"id", $"tag").as[(Long, String)]
      .collect().toMap
    assert(got.size == 100 && got(13L) == "v6")
  }
}
