package graft.sinks

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.meta.TableDef
import graft.operators.Compactor
import graft.streaming.Pipeline.BatchSink

/** Bucket-partitioned parquet upsert sink — the 100 TB shape of
  * [[ParquetUpsertSink]]. State lives under
  * `dir/<db.table>/bucket=<b>/` with `b = pmod(xxhash64(pks), n)`.
  * A micro-batch:
  *
  *   1. assigns each event its bucket (narrow projection),
  *   2. determines the TOUCHED bucket set (distinct over the batch —
  *      bounded by n),
  *   3. reads ONLY those buckets' existing state, merges
  *      (last-event-per-key), and rewrites ONLY those directories.
  *
  * Untouched state is never read or written, so batch cost scales
  * with the batch's key spread, not the table size: a 10k-row batch
  * against a 10^11-row table reads/rewrites at most `buckets`
  * partitions. This is MERGE-INTO-on-plain-parquet; swapping in
  * Delta/Iceberg replaces steps 2-3 with the format's own
  * copy-on-write (same plan shape, file-level granularity).
  */
final class BucketedUpsertSink(rootDir: String, buckets: Int = 64)
  extends BatchSink {

  private def tableDir(t: TableDef) = s"$rootDir/${t.schema}.${t.name}"

  private def withBucket(df: DataFrame, t: TableDef): DataFrame =
    df.withColumn("bucket",
      pmod(xxhash64(t.pkColumns.map(c => col(c.name)): _*), lit(buckets)))

  override def write(batch: DataFrame, t: TableDef, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val dir = tableDir(t)
    val pks = t.pkColumns.map(_.name)
    require(pks.nonEmpty,
      s"${t.schema}.${t.name}: BucketedUpsertSink requires primary keys " +
        "(pk-less tables have no upsert identity — use an append sink)")
    rejectFlatLayout(dir, t)
    recoverInterruptedSwap(dir)
    val bucketed = withBucket(batch, t).persist()
    try {
      val touched = bucketed.select(col("bucket")).distinct()
        .collect().map(_.getLong(0)).sorted
      if (touched.isEmpty) return
      val existingTouched = touched
        .filter(b => Files.exists(Paths.get(s"$dir/bucket=$b")))
      val merged =
        if (existingTouched.isEmpty) bucketed
        else {
          // partition-pruned read: only the touched buckets
          val existing = spark.read
            .option("basePath", dir)
            .parquet(existingTouched.toSeq.map(b => s"$dir/bucket=$b"): _*)
          Compactor.lastEventPerKeyAgg(pks, "seq")(
            existing.unionByName(bucketed, allowMissingColumns = true))
        }
      val finalState = merged.filter(col("op") =!= "delete")
      // distributed write to a staging dir (never through the
      // driver), then swap ONLY the touched bucket dirs. A touched
      // bucket with no surviving rows has no staged dir and its
      // target dir is removed — deletes can't resurrect.
      val staging = s"$dir.staging-$batchId"
      finalState.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(staging)
      // crash-safe swap: move the old bucket ASIDE (restorable),
      // move the staged one in, then drop the aside copy. A crash
      // between steps leaves either the old dir, or the aside copy
      // that recoverInterruptedSwap restores on replay — pre-batch
      // state is never destroyed before its replacement is in place.
      touched.foreach { b =>
        val src = Paths.get(s"$staging/bucket=$b")
        val dst = Paths.get(s"$dir/bucket=$b")
        val aside = Paths.get(s"$dir/.aside-bucket=$b")
        deleteRecursively(aside)
        if (Files.exists(dst)) Files.move(dst, aside)
        if (Files.exists(src)) {
          Files.createDirectories(dst.getParent)
          Files.move(src, dst)
        }
        deleteRecursively(aside)
      }
      deleteRecursively(Paths.get(staging))
    } finally bucketed.unpersist()
  }

  /** A target dir holding top-level parquet files is state from the
    * FLAT [[ParquetUpsertSink]] layout. Merging over it would silently
    * ignore every pre-existing row (this sink only reads bucket=&lt;b&gt;/
    * subdirs) — wrong table state with no error — so fail loudly and
    * name the migration path instead. */
  private def rejectFlatLayout(dir: String, t: TableDef): Unit = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) return
    val s = Files.list(p)
    val flat =
      try s.iterator().asScala.exists { f =>
        val n = f.getFileName.toString
        n.endsWith(".parquet") && !Files.isDirectory(f)
      } finally s.close()
    if (flat) throw new IllegalStateException(
      s"${t.schema}.${t.name}: $dir holds non-bucketed (flat ParquetUpsertSink) " +
        "state, which this sink's bucket=<b>/ reads would silently ignore. " +
        "Either keep the table on the 'parquet-upsert' sink, or migrate once: " +
        "read the flat dir and re-write it through BucketedUpsertSink into a " +
        "fresh directory.")
  }

  /** Replay recovery: an `.aside-bucket=` dir whose real bucket is
    * missing means a swap died between move-aside and move-in —
    * restore it (the batch will be re-merged); otherwise the swap
    * completed and the aside copy is garbage. Stale staging dirs are
    * removed wholesale. */
  private def recoverInterruptedSwap(dir: String): Unit = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) return
    val s = Files.list(p)
    try s.iterator().asScala.toVector.foreach { f =>
      val n = f.getFileName.toString
      if (n.startsWith(".aside-bucket=")) {
        val real = Paths.get(dir, n.stripPrefix(".aside-"))
        if (!Files.exists(real)) Files.move(f, real)
        else deleteRecursively(f)
      }
    } finally s.close()
    val parent = p.getParent
    val base = p.getFileName.toString
    val siblings = Files.list(parent)
    try siblings.iterator().asScala.toVector.foreach { f =>
      if (f.getFileName.toString.startsWith(s"$base.staging-"))
        deleteRecursively(f)
    } finally siblings.close()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally s.close()
    }

  def read(t: TableDef): DataFrame =
    org.apache.spark.sql.SparkSession.active.read.parquet(tableDir(t))
      .drop("bucket")
}
