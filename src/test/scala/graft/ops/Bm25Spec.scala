package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with controlled term/length structure
  private def corpus = Seq(
    (1L, "fast fast fast join"),          // tf-heavy on "fast"
    (2L, "fast join"),                    // short, both terms once
    (3L, "join join join join join join"),// long, only "join"
    (4L, "slow scan table"),              // no query-1 terms
    (5L, "fast slow fast slow fast slow") // long, tf=3 on "fast"
  ).toDF("doc_id", "text")

  private def run(qs: Seq[(Int, Seq[String])], k: Int = 10) =
    Bm25.topK(corpus, "doc_id", split(col("text"), " "), qs, k)

  test("docs matching both query terms outrank single-term matches") {
    // docs 1 and 2 match both terms; docs 3 and 5 match one each
    val r = run(Seq(1 -> Seq("fast", "join")))
      .orderBy($"rnk").select($"doc_id").as[Long].collect()
    assert(r.take(2).toSet == Set(1L, 2L),
      s"two-term matches should fill the top ranks, got ${r.toSeq}")
    assert(!r.contains(4L), "doc with no query terms must not appear")
  }

  test("rank contract is (score DESC, doc_id ASC) and k bounds output") {
    val r = run(Seq(1 -> Seq("fast", "join")), k = 2).collect()
    assert(r.length == 2)
    assert(r.map(_.getInt(1)).toSeq == Seq(1, 2))
    val scores = r.map(_.getDouble(3))
    assert(scores(0) >= scores(1))
  }

  test("scores are bit-identical under repartitioning") {
    val qs = Seq(1 -> Seq("fast", "join"), 2 -> Seq("slow", "scan"))
    val a = run(qs).collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    val b = Bm25.topK(corpus.repartition(7), "doc_id",
        split(col("text"), " "), qs, 10).collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(a == b, "fixed-order fold must make score bits partition-invariant")
  }

  test("duplicate terms in one query count once") {
    val dup = run(Seq(1 -> Seq("fast", "fast", "join"))).collect().map(r =>
      (r.getLong(2), r.getDouble(3))).toSet
    val one = run(Seq(1 -> Seq("fast", "join"))).collect().map(r =>
      (r.getLong(2), r.getDouble(3))).toSet
    assert(dup == one)
  }

  test("length normalization: same tf in a longer doc scores lower") {
    // docs 1 and 5 both have tf(fast)=3; doc 5 is longer (6 vs 4)
    val m = run(Seq(1 -> Seq("fast"))).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(m(1L) > m(5L),
      s"shorter doc must score higher at equal tf: ${m(1L)} vs ${m(5L)}")
  }
}
