package graft

import java.nio.file.Files

import graft.SparkSpec

class ChecksumMainSpec extends SparkSpec {
  import spark.implicits._

  test("run() compares parquet sides; drift isolates; clean exits clean") {
    val base = Files.createTempDirectory("cksum-main").toString
    val a = (0L until 40L).map(i => (i, s"v$i", i * 2)).toDF("pk", "s", "x")
    a.write.parquet(s"$base/a")
    // drift: pk 17's value changed, pk 30 missing
    a.withColumn("s",
        org.apache.spark.sql.functions.when($"pk" === 17L, "DRIFT")
          .otherwise($"s"))
      .filter($"pk" =!= 30L)
      .write.parquet(s"$base/b")
    val (div, cols) = ChecksumMain.run(
      spark.read.parquet(s"$base/a"), spark.read.parquet(s"$base/b"),
      "pk", 10L, None)
    assert(cols == Seq("pk", "s", "x"))
    assert(div.map(d => (d._1, d._6)) == Seq((1L, "checksum"),
      (3L, "row_count")))
    // identical sides: nothing diverges
    val (clean, _) = ChecksumMain.run(
      spark.read.parquet(s"$base/a"), spark.read.parquet(s"$base/a"),
      "pk", 10L, None)
    assert(clean.isEmpty)
  }

  test("schema drift narrows to common columns; pk must survive") {
    val base = Files.createTempDirectory("cksum-main").toString
    val a = Seq((1L, "x", 5L)).toDF("pk", "s", "extra")
    val b = Seq((1L, "x", true)).toDF("pk", "s", "added")
    a.write.parquet(s"$base/a"); b.write.parquet(s"$base/b")
    val (div, cols) = ChecksumMain.run(
      spark.read.parquet(s"$base/a"), spark.read.parquet(s"$base/b"),
      "pk", 10L, None)
    assert(cols == Seq("pk", "s") && div.isEmpty)
    val e = intercept[IllegalArgumentException] {
      ChecksumMain.run(spark.read.parquet(s"$base/a"),
        spark.read.parquet(s"$base/b"), "pk", 10L, Some("s"))
    }
    assert(e.getMessage.contains("pk"))
  }
}
