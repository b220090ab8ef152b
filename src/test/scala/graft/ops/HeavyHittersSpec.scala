package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {

  test("misraGries keeps every term above n/(k+1) (superset guarantee)") {
    // 10k tokens: "hot" 30% of the stream, 7k distinct cold terms
    val stream = Seq.tabulate(10000)(i =>
      if (i % 10 < 3) "hot" else s"cold_$i")
    val survivors = HeavyHitters.misraGries(stream.iterator, k = 10).toSet
    assert(survivors.contains("hot"))
    assert(survivors.size <= 10)
  }

  test("misraGries never exceeds capacity on all-distinct input") {
    val survivors =
      HeavyHitters.misraGries(Iterator.tabulate(5000)(i => s"t$i"), k = 7)
    assert(survivors.size <= 7)
  }

  test("heavyHitters equals exact wordcount + threshold") {
    import spark.implicits._
    // skewed corpus: 'the' in every doc ×5, 'rare_i' unique per doc
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, s"the the the the the a b rare_$i")).toDF("doc_id", "text")
    val got = HeavyHitters
      .heavyHitters(docs, split(col("text"), " "), den = 50)
      .select(col("term"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val exact = docs.select(explode(split(col("text"), " ")).as("t"))
    val total = exact.count()
    val want = exact.groupBy(col("t")).agg(count(lit(1)).as("n"))
      .filter(col("n") * 50 > total)
      .orderBy(col("n").desc, col("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq == want.toSeq)
    assert(got.map(_._1).toSet == Set("the", "a", "b"))
  }
}
