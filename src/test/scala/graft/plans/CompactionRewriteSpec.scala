package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Compactor

class CompactionRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, 10L, "a", 100.0), (1L, 12L, "b", 200.0), (1L, 11L, "c", 300.0),
    (2L, 5L, "d", 400.0),
    (3L, 7L, "e", 500.0), (3L, 9L, "f", 600.0)
  ).toDF("user_id", "seq", "payload", "value")

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  private def hasAggregate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty

  test("compactor window form is rewritten to an aggregate (no Window node)") {
    val df = Compactor.lastEventPerKey(Seq("user_id"), col("seq"))(events)
    assert(!hasWindow(df), df.queryExecution.optimizedPlan.toString)
    assert(hasAggregate(df), df.queryExecution.optimizedPlan.toString)
  }

  test("rewritten plan returns the same rows as the window semantics") {
    val out = Compactor.lastEventPerKey(Seq("user_id"), col("seq"))(events)
      .select($"user_id", $"seq", $"payload", $"value")
      .as[(Long, Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 12L, "b", 200.0), (2L, 5L, "d", 400.0),
      (3L, 9L, "f", 600.0)))
    // and agrees with the hand-written aggregate form
    val agg = Compactor.lastEventPerKeyAgg(Seq("user_id"), "seq")(events)
      .select($"user_id", $"seq", $"payload", $"value")
      .as[(Long, Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(out == agg)
  }

  test("ascending order keeps the FIRST event per key (min(struct))") {
    val w = W.partitionBy($"user_id").orderBy($"seq".asc)
    val df = events.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
    assert(!hasWindow(df))
    val out = df.select($"user_id", $"seq").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 10L), (2L, 5L), (3L, 7L)))
  }

  test("multi-key descending order rewrites and picks the lexicographic max") {
    val w = W.partitionBy($"user_id").orderBy($"value".desc, $"seq".desc)
    val df = events.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(!hasWindow(df))
    val out = df.select($"user_id", $"payload").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "c"), (2L, "d"), (3L, "f")))
  }

  test("null sort keys follow default null ordering (desc = nulls last)") {
    val df0 = Seq((1L, Some(5L), "live"), (1L, None, "nullseq"),
      (2L, Option.empty[Long], "onlynull"))
      .toDF("k", "seq", "tag")
    val w = W.partitionBy($"k").orderBy($"seq".desc)
    val df = df0.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(!hasWindow(df))
    val out = df.select($"k", $"tag").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    // desc nulls-last: non-null seq wins for k=1; all-null partition
    // still yields a row for k=2
    assert(out == Seq((1L, "live"), (2L, "onlynull")))
  }

  test("unorderable (map) payload columns keep the window plan and run") {
    // struct min/max can't order MapType — the rewrite must NOT fire
    // (it previously produced an unresolvable plan and crashed)
    val df0 = Seq((1L, 10L, Map("a" -> "x")), (1L, 12L, Map("b" -> "y")),
      (2L, 5L, Map("c" -> "z")))
      .toDF("k", "seq", "payload")
    val w = W.partitionBy($"k").orderBy($"seq".desc)
    val df = df0.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(hasWindow(df), df.queryExecution.optimizedPlan.toString)
    val out = df.select($"k", $"seq").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 12L), (2L, 5L)))
  }

  test("non-matching windows are untouched") {
    // rank() is not row_number
    val w = W.partitionBy($"user_id").orderBy($"seq".desc)
    val rankDf = events.withColumn("rn", rank().over(w)).filter($"rn" === 1)
    assert(hasWindow(rankDf))
    // rn = 2 is not a compaction
    val rn2 = events.withColumn("rn", row_number().over(w)).filter($"rn" === 2)
    assert(hasWindow(rn2))
    // mixed sort directions can't be a single struct extreme
    val mixed = events.withColumn("rn", row_number().over(
      W.partitionBy($"user_id").orderBy($"value".desc, $"seq".asc)))
      .filter($"rn" === 1)
    assert(hasWindow(mixed))
    // keeping the rn column still works (constant 1 under its exprId)
    val kept = events.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"user_id", $"rn")
    assert(kept.as[(Long, Int)].collect().forall(_._2 == 1))
  }
}
