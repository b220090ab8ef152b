package graft.ops

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import spark.implicits._

  // ranker A: docs 10, 11, 12 for query 1; ranker B: 11, 13
  private def rankA = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    .toDF("query_id", "doc_id", "rnk")
  private def rankB = Seq((1L, 11L, 1), (1L, 13L, 2))
    .toDF("query_id", "doc_id", "rnk")

  test("doc ranked by both rankers fuses ahead of single-ranker docs") {
    val out = Fusion.rrfTopK(Seq(rankA, rankB), k = 10).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // doc 11: 1/62 + 1/61 ≈ 0.0325 beats doc 10's 1/61 ≈ 0.0164
    assert(out.head._2 == 11L, s"got ${out.toSeq}")
    val expected11 = 1.0 / (60.0 + 2.0) + 1.0 / (60.0 + 1.0)
    assert(out.head._3 == expected11)
    assert(out.map(_._2).toSet == Set(10L, 11L, 12L, 13L))
  }

  test("rrf ties break by doc_id ascending") {
    // docs 20 and 21 both only in ranker A at ranks tied via two
    // rankers: give them identical single ranks in separate rankers
    val a = Seq((1L, 20L, 1)).toDF("query_id", "doc_id", "rnk")
    val b = Seq((1L, 21L, 1)).toDF("query_id", "doc_id", "rnk")
    val out = Fusion.rrfTopK(Seq(a, b), k = 2).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 20L), (2, 21L)))
  }

  test("k bounds the fused output per query") {
    val out = Fusion.rrfTopK(Seq(rankA, rankB), k = 2).collect()
    assert(out.length == 2)
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2))
  }

  test("multi-query fusion keeps queries independent") {
    val a = Seq((1L, 10L, 1), (2L, 30L, 1)).toDF("query_id", "doc_id", "rnk")
    val b = Seq((2L, 31L, 1)).toDF("query_id", "doc_id", "rnk")
    val out = Fusion.rrfTopK(Seq(a, b), k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out == Set((1L, 10L), (2L, 30L), (2L, 31L)))
  }
}
