package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._
  import Constraints._

  private def table = Seq(
    (1L, Some("a"), 5.0, 10L),
    (2L, Some("b"), 25.0, 10L),  // range violation (hi = 20)
    (3L, None, 7.0, 99L),        // not-null violation; ref violation (99)
    (3L, Some("z"), 8.0, 10L),   // dup id; in-set violation ("z")
    (3L, Some("a"), -1.0, 10L)   // dup id; predicate violation (neg)
  ).toDF("id", "tag", "v", "fk")

  private def parent = Seq(10L, 11L).toDF("pk")

  test("every check type counts exactly its planted violations, in order") {
    val out = audit(table, Seq(
      NotNull("tag"),
      Range("v", 0.0, 20.0),
      InSet("tag", Seq("a", "b")),
      Predicate("v_nonneg", col("v") >= 0.0),
      Unique(Seq("id")),
      RefIntegrity("fk", parent, "pk", "parent")))
      .select($"check", $"n_violations").as[(String, Long)].collect().toSeq
    assert(out == Seq(
      "not_null(tag)" -> 1L,
      // 25.0 out of range; NULL tag row's v=7 in range → only 1.
      // -1.0 also violates the range → 2
      "range(v)" -> 2L,
      // "z" not in set; NULL tag counts as violation (null predicate)
      "in_set(tag)" -> 2L,
      "v_nonneg" -> 1L,
      // id=3 has 3 copies → 2 extra rows
      "unique(id)" -> 2L,
      "ref(fk->parent.pk)" -> 1L))
  }

  test("row-local checks share one scan (single aggregate over one file source)") {
    val plan = audit(table, Seq(NotNull("tag"), Range("v", 0.0, 20.0),
      Predicate("p", col("v") > 0.0))).queryExecution.executedPlan.toString
    // no union of scans: row-local checks are one aggregate subtree
    assert(!plan.contains("Union"), s"row-local checks must not union scans:\n$plan")
  }

  test("empty table: zero violations, not nulls") {
    val out = audit(table.filter($"id" < 0L),
      Seq(NotNull("tag"), Unique(Seq("id"))))
      .select($"n_violations").as[Long].collect().toSeq
    assert(out == Seq(0L, 0L))
  }
}
