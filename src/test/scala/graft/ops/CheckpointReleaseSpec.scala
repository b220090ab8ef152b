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
}
