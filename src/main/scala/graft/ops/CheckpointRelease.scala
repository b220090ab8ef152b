package graft.ops

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministically release the storage blocks behind a
  * `localCheckpoint()`ed frame.
  *
  * `Dataset.unpersist()` is a NO-OP for these frames: it only
  * uncaches CacheManager entries (the `persist()`/`cache()` path),
  * while a local checkpoint's MEMORY_AND_DISK blocks belong to the
  * underlying RDD, which the CacheManager never sees. Relying on
  * `unpersist()` left each displaced micro-batch's blocks resident
  * until the ContextCleaner happened to GC the dropped RDD reference
  * — unbounded executor-storage growth between GC cycles on a long
  * AvailableNow run, exactly what the release calls were supposed to
  * prevent.
  *
  * The checkpointed RDD sits in the frame's analyzed plan as a
  * [[LogicalRDD]] leaf; unpersisting THAT RDD frees the blocks
  * immediately (non-blocking). AFTER release the frame must not be
  * read again: localCheckpoint truncates lineage, so a recompute has
  * nothing to fall back on — the same contract the callers already
  * honor (release only after the output write / index append that
  * consumed the frame).
  *
  * `release` targets the frame's SINGLE checkpoint leaf — the root
  * itself, or the leaf under thin plan-shaping wrappers (the
  * structural `.limit(n)` bound kmeansRefine/trainPqCodebook restore
  * after checkpointing). A frame derived from SEVERAL checkpointed
  * inputs (e.g. their join) is refused loudly: sweeping every leaf
  * would silently free a still-live sibling checkpoint the caller
  * never meant to release.
  */
object CheckpointRelease {
  def release(df: Dataset[_]): Unit = {
    val leaves = df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr }
    require(leaves.length == 1,
      s"CheckpointRelease.release expects a frame with exactly one " +
        s"checkpointed (LogicalRDD) leaf, found ${leaves.length} — " +
        "pass the localCheckpoint()ed frame itself, and release " +
        "multi-checkpoint derivations one input at a time")
    leaves.head.rdd.unpersist(blocking = false)
  }
}
