package graft.ops

import graft.SparkSpec

/** Pins the mechanism the streaming curation/dedup stages rely on to
  * bound executor storage across micro-batches: `Dataset.unpersist()`
  * does NOT free a localCheckpoint's blocks (it only uncaches
  * CacheManager entries), while [[CheckpointRelease.release]] does. */
class CheckpointReleaseSpec extends SparkSpec {
  import spark.implicits._

  test("release frees the localCheckpoint blocks unpersist() leaves behind") {
    val df = (1 to 100).toDF("v").localCheckpoint()
    assert(df.count() == 100)
    val rddId = df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.getOrElse(fail("localCheckpoint frame did not analyze to a LogicalRDD"))
    def persisted = spark.sparkContext.getPersistentRDDs.contains(rddId)
    assert(persisted, "checkpoint blocks should be registered after localCheckpoint")
    df.unpersist()
    assert(persisted,
      "unpersist() must be the documented NO-OP on a localCheckpoint frame " +
        "(if this starts freeing blocks, CheckpointRelease can be retired)")
    CheckpointRelease.release(df)
    assert(!persisted, "release() must drop the checkpointed RDD's blocks")
  }

  test("release reaches the leaf under thin wrappers (the structural limit)") {
    // kmeansRefine/trainPqCodebook return checkpoint.limit(n) — the
    // plan-shaping wrapper must not hide the leaf from release
    val cp = (1 to 50).toDF("v").localCheckpoint()
    val wrapped = cp.limit(50).select($"v")
    val rddId = cp.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.get
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId))
    CheckpointRelease.release(wrapped)
    assert(!spark.sparkContext.getPersistentRDDs.contains(rddId))
  }

  test("release refuses a frame derived from several checkpoints") {
    // sweeping every LogicalRDD leaf would silently free a sibling
    // checkpoint the caller still holds — must fail loudly instead
    val a = (1 to 10).toDF("v").localCheckpoint()
    val b = (1 to 10).toDF("v").localCheckpoint()
    val joined = a.join(b, Seq("v"))
    val ex = intercept[IllegalArgumentException](
      CheckpointRelease.release(joined))
    assert(ex.getMessage.contains("exactly one"))
    // both inputs are still resident — nothing was freed
    val ids = Seq(a, b).map(_.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.get)
    assert(ids.forall(spark.sparkContext.getPersistentRDDs.contains))
    Seq(a, b).foreach(CheckpointRelease.release)
  }

  test("release refuses a frame with no checkpoint leaf") {
    val plain = (1 to 10).toDF("v")
    val ex = intercept[IllegalArgumentException](
      CheckpointRelease.release(plain))
    assert(ex.getMessage.contains("exactly one"))
  }

  test("training loops release superseded rounds; the final frame releases on demand") {
    // kmeansRefine over multiple rounds must keep at most the LAST
    // round's checkpoint resident (plus whatever the session already
    // held) — the ADVICE leak: every round's blocks pinned for the
    // session lifetime
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val corpus = (0 until 40)
      .map(i => (i.toLong, Array.tabulate(8)(d => (i * 8 + d).toFloat % 7f)))
      .toDF("id", "vec")
    val trained = Similarity.kmeansRefine(corpus, "vec", "id",
      nCells = 4, rounds = 3)
    assert(trained.count() == 4)
    val afterTrain = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(afterTrain.size == 1,
      s"expected only the final round's checkpoint resident, found ${afterTrain.size}")
    CheckpointRelease.release(trained)
    val afterRelease = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(afterRelease.isEmpty,
      "releasing the returned frame must free the last checkpoint")
  }

  test("trainPqCodebook releases superseded rounds too") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val corpus = (0 until 40)
      .map(i => (i.toLong, Array.tabulate(8)(d => (i * 8 + d).toFloat % 7f)))
      .toDF("id", "vec")
    val cb = Similarity.trainPqCodebook(corpus, "vec", "id",
      dims = 8, m = 2, k = 4, rounds = 3)
    assert(cb.count() == 8)
    val afterTrain = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(afterTrain.size == 1)
    CheckpointRelease.release(cb)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }
}
