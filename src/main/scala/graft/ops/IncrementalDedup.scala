package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fingerprint

/** Incremental (historical) exact dedup — the continuous-ingestion
  * shape: each arriving batch is checked against a PERSISTED
  * fingerprint index of everything ever accepted, novel documents
  * pass through, and their fingerprints append to the index. "Never
  * train on a document twice", across runs, across years of data.
  *
  * Index layout: parquet partitioned by `bucket = pmod(xxhash64(fp),
  * nBuckets)`. Both sides of the membership check hash the same way,
  * so the anti-join co-locates per bucket, and — because the batch's
  * fingerprints usually touch a SUBSET of buckets — the index scan
  * prunes to those partition dirs (a small batch against a 100 TB
  * index reads only its own buckets, not the index). The index rows
  * are (fp, keep_id): 48 bytes/doc — a trillion-doc index is ~50 TB
  * of parquet but each batch touches only its bucket slice.
  *
  * Replay safety: accepting a batch twice appends duplicate index
  * rows — harmless for membership (anti-join semantics) and bounded
  * by the replay count; [[LakeLayout.compact]]-style rewrites can
  * dedupe the index offline. The novel-doc OUTPUT is replay-stable:
  * a replayed batch returns zero novel docs because its fingerprints
  * are already indexed.
  */
object IncrementalDedup {

  /** Check `batch` against the index at `indexDir` WITHOUT mutating
    * it: returns the batch's novel docs (first-id winner per
    * fingerprint within the batch, then anti-join on the index). */
  def novel(spark: SparkSession, batch: DataFrame, textCol: String,
      idCol: String, indexDir: String, nBuckets: Int = 64): DataFrame = {
    val fps = batch
      .withColumn("fp", fingerprint(col(textCol)))
      .withColumn("bucket", pmod(xxhash64(col("fp")), lit(nBuckets.toLong)))
    // within-batch winner: lowest id per fingerprint
    val winners = fps.withColumn("__min",
        min(col(idCol)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp"))))
      .filter(col(idCol) === col("__min")).drop("__min")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(indexDir)))
      winners
    else {
      val idx = spark.read.parquet(indexDir)
      // restrict the index scan to the buckets this batch touches:
      // partition pruning keeps the membership check batch-
      // proportional, not index-proportional
      val touched = winners.select(col("bucket")).distinct()
        .collect().map(_.getLong(0))
      winners.join(
        idx.filter(col("bucket").isin(touched.toIndexedSeq: _*))
          .select(col("fp"), col("bucket")),
        Seq("bucket", "fp"), "left_anti")
    }
  }

  /** [[novel]] + append the accepted fingerprints to the index.
    * Returns the novel docs (WITHOUT the fp/bucket helper columns). */
  def acceptNovel(spark: SparkSession, batch: DataFrame, textCol: String,
      idCol: String, indexDir: String, nBuckets: Int = 64): DataFrame = {
    // materialize BEFORE the index append: a lazy result re-evaluated
    // after the append would anti-join against its own fingerprints
    // and come back empty
    val n = novel(spark, batch, textCol, idCol, indexDir, nBuckets)
      .localCheckpoint()
    n.select(col("fp"), col("bucket"), col(idCol).as("keep_id"))
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(indexDir)
    n.drop("fp", "bucket")
  }
}
