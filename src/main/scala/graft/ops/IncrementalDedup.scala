package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

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
  * The bucket count is PART OF THE LAYOUT: a `_graft_buckets` marker
  * is written on first create and later calls must pass the same
  * value (a different nBuckets would hash fingerprints into other
  * buckets and silently disable dedup — fail loudly instead).
  *
  * All filesystem access goes through the Hadoop FS of the path, so
  * hdfs:///s3a:// index dirs work the same as local ones.
  *
  * Null/absent text fingerprints as the empty string (all such docs
  * are mutual duplicates) — a null fp would never equal itself in
  * the anti-join and null-text docs would be re-accepted forever.
  *
  * Replay safety: accepting a batch twice appends duplicate index
  * rows — harmless for membership (anti-join semantics) and bounded
  * by the replay count; [[graft.sinks.LakeLayout.compact]]-style
  * rewrites can dedupe the index offline. The novel-doc OUTPUT is
  * replay-stable: a replayed batch returns zero novel docs because
  * its fingerprints are already indexed.
  */
object IncrementalDedup {

  private val indexSchema = StructType(Seq(
    StructField("fp", StringType),
    StructField("keep_id", LongType),
    StructField("bucket", LongType)))

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def checkOrWriteBucketMarker(spark: SparkSession, dir: String,
      nBuckets: Int): Unit = {
    val (hfs, p) = fs(spark, dir)
    val marker = new org.apache.hadoop.fs.Path(p, "_graft_buckets")
    if (hfs.exists(marker)) {
      val in = hfs.open(marker)
      val stored = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
      require(stored == nBuckets.toString,
        s"index at $dir was bucketed with nBuckets=$stored; " +
          s"called with $nBuckets — a mismatch silently disables dedup")
    } else {
      hfs.mkdirs(p)
      val out = hfs.create(marker, true)
      try out.write(nBuckets.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Check `batch` against the index at `indexDir` WITHOUT mutating
    * it: returns the batch's novel docs (first-id winner per
    * fingerprint within the batch, then anti-join on the index). */
  def novel(spark: SparkSession, batch: DataFrame, textCol: String,
      idCol: String, indexDir: String, nBuckets: Int = 64): DataFrame = {
    val (hfs, p) = fs(spark, indexDir)
    if (hfs.exists(p)) checkOrWriteBucketMarker(spark, indexDir, nBuckets)
    val fps = batch
      .withColumn("fp", fingerprint(coalesce(col(textCol), lit(""))))
      .withColumn("bucket", pmod(xxhash64(col("fp")), lit(nBuckets.toLong)))
    // within-batch winner: lowest id per fingerprint. localCheckpoint:
    // the frame feeds BOTH the touched-bucket collect and the
    // anti-join — without it the whole batch lineage runs twice.
    val winners = fps.withColumn("__min",
        min(col(idCol)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp"))))
      .filter(col(idCol) === col("__min")).drop("__min")
      .localCheckpoint()
    if (!hfs.exists(p)) winners
    else {
      // explicit schema: an index dir holding only _SUCCESS (created
      // by an empty first batch) must read as empty, not throw
      val idx = spark.read.schema(indexSchema).parquet(indexDir)
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
    checkOrWriteBucketMarker(spark, indexDir, nBuckets)
    n.drop("fp", "bucket")
  }
}
