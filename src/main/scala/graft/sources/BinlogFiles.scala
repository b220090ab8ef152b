package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.cdc.ChangeEvent

/** Distributed binlog-segment ingestion: each segment file decodes in
  * ONE task (segments are the binlog's own parallelism unit, bounded
  * by `max_binlog_size` ≤ 1 GiB, so per-task memory is bounded by
  * server configuration). Files load through Spark's `binaryFile`
  * source, so the path may be any Hadoop-visible filesystem — the
  * listing collected on the driver is segment *names* only (bounded
  * control-plane metadata, like the bucket-id lists elsewhere in the
  * engine).
  *
  * Sequence numbers: binlog order is (segment order, offset order).
  * Each file gets a disjoint `index << 40` seq base (2^40 events per
  * segment is unreachable — a segment is ≤1 GiB and events are >19
  * bytes), so `seq` is globally monotone in binlog order and the
  * downstream compactor (`operators/Compactor`) can stay order-free.
  */
object BinlogFiles {

  def changeEvents(
      spark: SparkSession,
      path: String,
      names: Map[(String, String), Seq[String]],
      glob: String = "*.binlog"): Dataset[ChangeEvent] = {
    import spark.implicits._
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select("path", "content")
    // rotation order = lexicographic segment-name order (binlog.000001…)
    val index: Map[String, Long] = df.select("path").as[String].collect()
      .sorted.zipWithIndex.map { case (p, i) => p -> i.toLong }.toMap
    val indexB = spark.sparkContext.broadcast(index)
    val namesB = spark.sparkContext.broadcast(names)
    df.as[(String, Array[Byte])].flatMap { case (p, bytes) =>
      val base = indexB.value.getOrElse(p,
        throw new IllegalStateException(s"segment $p vanished between listing and read"))
      Binlog.changeEvents(bytes, namesB.value, base << 40)
    }
  }
}
