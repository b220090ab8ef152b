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
  * The checkpointed RDD sits at the root of the frame's analyzed
  * plan as a [[LogicalRDD]]; unpersisting THAT RDD frees the blocks
  * immediately (non-blocking). AFTER release the frame must not be
  * read again: localCheckpoint truncates lineage, so a recompute has
  * nothing to fall back on — the same contract the callers already
  * honor (release only after the output write / index append that
  * consumed the frame).
  */
private[graft] object CheckpointRelease {
  def release(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
