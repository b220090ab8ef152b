package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TableChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (0L, "a", 10L), (1L, "b", 20L), (2L, "c", 30L),
    (10L, "d", 40L), (11L, "e", 50L), (12L, "f", 60L),
    (20L, "g", 70L), (21L, null.asInstanceOf[String], 80L)
  ).toDF("pk", "s", "v")

  private def side(df: org.apache.spark.sql.DataFrame) =
    TableChecksum.chunkChecksums(df, col("pk"),
      Seq(col("pk"), col("s"), col("v")), chunkSize = 10L)

  test("identical sides produce an empty diff") {
    assert(TableChecksum.diff(side(base), side(base)).count() == 0)
  }

  test("checksums are order- and partitioning-independent") {
    val a = side(base).orderBy($"chunk").collect().toSeq
    val b = side(base.repartition(7, $"v").sortWithinPartitions($"s"))
      .orderBy($"chunk").collect().toSeq
    assert(a == b)
  }

  test("a single value change flags exactly its chunk as checksum") {
    val drifted = base.withColumn("v",
      when($"pk" === 11L, lit(51L)).otherwise($"v"))
    val d = TableChecksum.diff(side(base), side(drifted))
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(d == Seq((1L, "checksum")))
  }

  test("a deleted row flags its chunk as row_count") {
    val d = TableChecksum.diff(side(base), side(base.filter($"pk" =!= 2L)))
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(d == Seq((0L, "row_count")))
  }

  test("a fully absent chunk reports missing_in_target / _source") {
    val t = base.filter($"pk" < 20L)
    val mt = TableChecksum.diff(side(base), side(t))
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(mt == Seq((2L, "missing_in_target")))
    val ms = TableChecksum.diff(side(t), side(base))
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(ms == Seq((2L, "missing_in_source")))
  }

  test("null and empty-string rows do not collide") {
    // ("", x) vs (null, x): the NUL sentinel keeps the digests apart
    val withEmpty = base.withColumn("s",
      when($"pk" === 21L, lit("")).otherwise($"s"))
    val d = TableChecksum.diff(side(base), side(withEmpty))
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(d == Seq((2L, "checksum")))
  }

  test("field boundaries are sealed: (ab, c) vs (a, bc) differ") {
    val two = Seq((1L, "ab", "c")).toDF("pk", "x", "y")
    val other = Seq((1L, "a", "bc")).toDF("pk", "x", "y")
    def cs(df: org.apache.spark.sql.DataFrame) =
      TableChecksum.chunkChecksums(df, col("pk"),
        Seq(col("x"), col("y")), 10L)
    assert(TableChecksum.diff(cs(two), cs(other)).count() == 1)
  }

  test("chunk ids and pk ranges are arithmetic on the pk") {
    val r = side(base).orderBy($"chunk")
      .select($"chunk", $"n_rows", $"pk_min", $"pk_max")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 3L, 0L, 2L), (1L, 3L, 10L, 12L),
      (2L, 2L, 20L, 21L)))
  }
}
