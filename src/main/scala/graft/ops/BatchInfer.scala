package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Batched model scoring over partitions — the Scala analog of the
  * `mapInPandas` inference pattern: rows flow to the model in bounded
  * batches (the shape a real embedding/quality/toxicity model needs
  * to amortize its per-call overhead), entirely executor-side.
  *
  * Scale design:
  *  - `mapPartitions`, not collect: each task streams its partition
  *    through the model callback in `batchSize` chunks; the driver
  *    never sees a row. This is SURVEY §7.4's preference (d) used
  *    where it is genuinely the right tool — an opaque model call is
  *    exactly the per-partition imperative logic Catalyst cannot
  *    express.
  *  - `grouped(batchSize)` is lazy on the row iterator: peak memory
  *    per task is one batch + one batch of scores, independent of
  *    partition size.
  *  - Batch boundaries depend on partitioning, so a model MUST be
  *    row-local (score_i depends only on row_i) for results to be
  *    partitioning-invariant — the batching is transport, not
  *    semantics. Cross-row models (e.g. batch normalization) would
  *    make output depend on the shuffle and break replay/oracle
  *    determinism.
  */
object BatchInfer {

  /** Append a `score` column computed by `model` over bounded row
    * batches. `model` receives at most `batchSize` rows and must
    * return exactly one score per input row (enforced). */
  def scoreBatches(df: DataFrame, batchSize: Int,
                   model: Seq[Row] => Seq[Double]): DataFrame =
    inferBatches(df, batchSize, "score", DoubleType,
      batch => model(batch))

  /** General batched-inference transport: append `outCol` of
    * `outType` computed by `model` over bounded row batches — the
    * integration point any external model (vision tower, embedding
    * encoder, toxicity head) plugs into without touching the plan
    * shape. Same contract as [[scoreBatches]]: one output per input
    * row (enforced), model must be row-local for partitioning
    * invariance, batching is transport. */
  def inferBatches(df: DataFrame, batchSize: Int, outCol: String,
      outType: DataType, model: Seq[Row] => Seq[Any]): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    val outSchema = df.schema.add(outCol, outType, nullable = true)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val outs = model(batch)
        require(outs.length == batch.length,
          s"model returned ${outs.length} outputs for ${batch.length} rows")
        batch.lazyZip(outs).map((r, s) => Row.fromSeq(r.toSeq :+ s))
      }
    }
  }
}
