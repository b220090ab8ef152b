package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultiMatchAnyRewriteSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed so ConvertToLocalRelation cannot pre-evaluate the
  // whole query at optimize time (a LocalRelation query collapses to
  // its result before the plan can show the rewrite)
  private def df = graft.Tables.load(spark, sfDir, "documents")
    .select($"doc_id".as("id"), $"text")

  private def mm = call_function("multi_match", $"text",
    array(lit("vector"), lit("zz")))

  private def optimized(c: org.apache.spark.sql.Column): String =
    df.filter(c).queryExecution.optimizedPlan.toString

  test("size(...) > 0 and its spellings become multi_match_any") {
    Seq(size(mm) > 0, size(mm) >= 1, size(mm) =!= 0).foreach { pred =>
      val p = optimized(pred)
      assert(p.contains("multimatchany"), p)
      assert(!p.contains("size("), p)
    }
  }

  test("size(...) = 0 spellings become NOT multi_match_any") {
    Seq(size(mm) === 0, size(mm) < 1, size(mm) <= 0).foreach { pred =>
      val p = optimized(pred)
      assert(p.contains("NOT multimatchany"), p)
    }
  }

  test("rewritten predicates keep the exact rows the size form keeps") {
    // compare against the explicit any-match form (same automaton)
    val any = call_function("multi_match_any", $"text",
      array(lit("vector"), lit("zz")))
    val viaSize = df.filter(size(mm) > 0).select($"id").as[Long]
      .collect().toSet
    val viaAny = df.filter(any).select($"id").as[Long].collect().toSet
    assert(viaSize == viaAny && viaSize.nonEmpty)
    val negSize = df.filter(size(mm) === 0).select($"id").as[Long]
      .collect().toSet
    val negAny = df.filter(!any).select($"id").as[Long].collect().toSet
    assert(negSize == negAny)
  }

  test("a genuine size use (projection of the count) is untouched") {
    val p = df.select(size(mm).as("n")).queryExecution.optimizedPlan.toString
    assert(p.contains("size(") && p.contains("multimatch("), p)
    assert(!p.contains("multimatchany"), p)
  }

  test("comparisons against other literals do not fire") {
    val p = optimized(size(mm) > 1)
    assert(!p.contains("multimatchany"), p)
  }
}
