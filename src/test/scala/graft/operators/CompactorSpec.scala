package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactorSpec extends SparkSpec {
  import spark.implicits._

  // FIXTURES.md A.5: insert → update → delete → insert on one key in
  // a single batch must resolve to the LAST event; replayed
  // duplicates (at-least-once) must not change the result.
  private def batch = Seq(
    (1L, 1L, "insert", 10.0),
    (1L, 2L, "update", 11.0),
    (1L, 3L, "delete", 0.0),
    (1L, 4L, "insert", 12.0),
    (2L, 5L, "insert", 20.0),
    (2L, 6L, "delete", 0.0)
  ).toDF("id", "seq", "op", "v")

  test("window compaction keeps last event per key") {
    val out = Compactor.lastEventPerKey(Seq("id"), $"seq")(batch)
      .select($"id", $"seq", $"op", $"v").as[(Long, Long, String, Double)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 4L, "insert", 12.0), (2L, 6L, "delete", 0.0)))
  }

  test("agg compaction matches window compaction") {
    val a = Compactor.lastEventPerKeyAgg(Seq("id"), "seq")(batch)
      .orderBy("id").collect().toSeq
    val w = Compactor.lastEventPerKey(Seq("id"), $"seq")(batch)
      .orderBy("id").collect().toSeq
    assert(a == w)
  }

  test("idempotent under at-least-once replay (duplicated batch)") {
    val replayed = batch.union(batch)
    val out = Compactor.lastEventPerKey(Seq("id"), $"seq", Seq($"op"))(replayed)
      .select($"id", $"seq").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 4L), (2L, 6L)))
  }

  test("dropDeleted removes delete-final keys") {
    val out = Transforms.chain(
      Compactor.lastEventPerKey(Seq("id"), $"seq"),
      Compactor.dropDeleted())(batch)
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("multi-PK compaction (reference multi-PK delete bug fixed, " +
    "mysql_utils.go:98-105)") {
    val multi = Seq(
      (1L, 10L, 1L, "insert"), (1L, 10L, 2L, "delete"),
      (1L, 11L, 3L, "insert")
    ).toDF("tenant", "id", "seq", "op")
    val out = Compactor.lastEventPerKey(Seq("tenant", "id"), $"seq")(multi)
      .select($"tenant", $"id", $"op").as[(Long, Long, String)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq((1L, 10L, "delete"), (1L, 11L, "insert")))
  }
}
