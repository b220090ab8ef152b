package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("db1", "t1", 1L, "insert", 10.0),
    ("db1", "t1", 2L, "update", 20.0),
    ("db1", "t2", 3L, "delete", 30.0),
    ("db2", "t1", 4L, "insert", 40.0)
  ).toDF("db", "table", "seq", "op", "v")

  test("renameColumn renames present columns and skips absent ones") {
    val out = Transforms.renameColumn("v" -> "value", "nope" -> "x")(df)
    assert(out.columns.toSeq == Seq("db", "table", "seq", "op", "value"))
  }

  test("deleteColumn drops columns") {
    assert(Transforms.deleteColumn("v", "op")(df).columns.toSeq ==
      Seq("db", "table", "seq"))
  }

  test("dropWhere removes matching rows (reference drop-if-true hook)") {
    assert(Transforms.dropWhere($"op" === "delete")(df).count() == 3)
  }

  test("columnMapper positional mapping") {
    val out = Transforms.columnMapper(Seq("seq", "v"), Seq("id", "amount"))(df)
    assert(out.columns.toSeq == Seq("id", "amount"))
    assert(out.orderBy("id").as[(Long, Double)].collect().head == (1L, 10.0))
  }

  test("deleteSign is 1 only for deletes") {
    val out = df.withColumn("_delete_sign_", Transforms.deleteSign($"op"))
    val m = out.select($"seq", $"_delete_sign_").as[(Long, Int)].collect().toMap
    assert(m == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 0))
  }

  test("routeTables keeps only routed (db, table) pairs") {
    val out = Transforms.routeTables(Set("db1" -> "t1"))(df)
    assert(out.select("seq").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(Transforms.routeTables(Set.empty)(df).count() == 0)
  }

  test("chain applies transforms in order") {
    val out = Transforms.chain(
      Transforms.renameColumn("v" -> "value"),
      Transforms.deleteColumn("op"),
      Transforms.dropWhere($"value" < 15.0))(df)
    assert(out.columns.toSeq == Seq("db", "table", "seq", "value"))
    assert(out.count() == 3)
  }
}
