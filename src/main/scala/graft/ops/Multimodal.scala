package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing, SURVEY §7.6.
  *
  * Blobs are opaque `BinaryType` payloads with a typed metadata
  * struct. The Spark-side plumbing — schema, batch shape, partition
  * strategy, frame-sampling expansion — is real and tested; the
  * actual media DECODE is a clearly-marked deterministic STUB
  * (`fakeDecode`) because no image/audio codec libraries exist in
  * this container. Swapping the stub for a real decoder (e.g. a
  * mapPartitions over javax.imageio, or a Pandas UDF in PySpark)
  * changes only the body of that one function.
  *
  * 100 TB notes: blobs never shuffle — metadata extraction and frame
  * sampling are narrow projections; any grouping happens on the
  * small extracted-metadata columns. Real pipelines read blobs via
  * `spark.read.format("binaryFile")` with
  * `spark.sql.files.maxPartitionBytes` sized so one partition's
  * blobs fit executor memory.
  */
object Multimodal {

  /** Metadata struct carried beside every blob. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Build a blob column from any string column (test harness: the
    * documents table's text stands in for media bytes). */
  def asBlob(c: Column): Column = c.cast(BinaryType)

  /** STUB decode ??? — deterministic fake in lieu of a codec: derives
    * mime/width/height/frame-count from the byte length. A real
    * implementation decodes the payload header. The SIGNATURE and
    * output schema are the real contract. */
  def fakeDecode(blob: Column): Column = {
    val n = length(blob)
    struct(
      when(pmod(n, lit(3)) === 0, "image/png")
        .when(pmod(n, lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      (lit(64) + pmod(n, lit(576))).cast(IntegerType).as("width"),
      (lit(64) + pmod(n * 7, lit(448))).cast(IntegerType).as("height"),
      (lit(1) + pmod(n, lit(16))).cast(IntegerType).as("n_frames"))
  }

  /** Attach blob + decoded metadata to a DataFrame. */
  def withMedia(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", asBlob(col(srcCol)))
      .withColumn("media", fakeDecode(col("payload")))

  /** Frame sampling: one output row per sampled frame index, stride
    * `every`. posexplode of a bounded sequence — row expansion is
    * n_frames/every per blob, a narrow op (no shuffle). */
  def sampleFrames(df: DataFrame, every: Int = 4): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), col("media.n_frames") - 1, lit(every))))

  /** STUB feature extraction ??? — a real pipeline would run the
    * decoded frame through a vision tower; here a deterministic
    * per-frame fingerprint keeps the plumbing testable. */
  def frameFeature(blob: Column, frameIdx: Column): Column =
    md5(concat(blob, lit(":"), frameIdx.cast(StringType)))
}
