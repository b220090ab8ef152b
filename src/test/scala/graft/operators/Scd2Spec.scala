package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val ev = Seq(
    // key 1: insert → update → update   (3 versions, last current)
    (1L, 1L, 100L, "a", "insert"),
    (1L, 2L, 200L, "b", "update"),
    (1L, 3L, 300L, "c", "update"),
    // key 2: insert → delete            (1 closed version, none current)
    (2L, 4L, 150L, "x", "insert"),
    (2L, 5L, 250L, "x", "delete"),
    // key 3: delete → insert (resurrection: new current version)
    (3L, 6L, 100L, "y", "delete"),
    (3L, 7L, 400L, "z", "insert")
  ).toDF("k", "seq", "ts", "v", "op")

  test("versions chain, deletes close, resurrection re-opens") {
    val got = Scd2.build(ev, Seq("k"), "ts", "seq", Seq("v"))
      .orderBy("k", "seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, "a", 100L, Some(200L), false),
      (1L, 2L, "b", 200L, Some(300L), false),
      (1L, 3L, "c", 300L, None, true),
      (2L, 4L, "x", 150L, Some(250L), false), // closed by the delete
      (3L, 7L, "z", 400L, None, true)))       // delete rows emit none
  }

  test("every key has at most one current version") {
    val cur = Scd2.build(ev, Seq("k"), "ts", "seq", Seq("v"))
      .filter($"is_current").groupBy($"k").count().collect()
    assert(cur.forall(_.getLong(1) == 1L))
  }
}
