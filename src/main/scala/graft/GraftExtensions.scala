package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ByteAtU8, DotProduct, JsonbDecode, RollingHash, TopKLargest, WavRms}

/** SparkSessionExtensions entry point — the engine's custom Catalyst
  * surface (SURVEY §7.4). Enable with:
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    // window→aggregate compaction rewrite (SURVEY §7.4(c)):
    // row_number()=1 last-event-per-key becomes a max/min(struct)
    // hash aggregate — map-side partial agg, no per-partition sort
    e.injectOptimizerRule(_ => graft.plans.CompactionRewrite)
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "dot_product(a, b) takes 2 arguments")
        DotProduct(exprs.head, exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("byte_at_u8"),
      new ExpressionInfo(classOf[ByteAtU8].getName, "byte_at_u8"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "byte_at_u8(blob, pos) takes 2 arguments")
        ByteAtU8(exprs.head, exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("jsonb_decode"),
      new ExpressionInfo(classOf[JsonbDecode].getName, "jsonb_decode"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, "jsonb_decode(blob) takes 1 argument")
        JsonbDecode(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("wav_rms"),
      new ExpressionInfo(classOf[WavRms].getName, "wav_rms"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, "wav_rms(blob) takes 1 argument")
        WavRms(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("topk_largest"),
      new ExpressionInfo(classOf[TopKLargest].getName, "topk_largest"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "topk_largest(value, k) takes 2 arguments")
        TopKLargest(exprs.head, exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, "rolling_hash(s) takes 1 argument")
        RollingHash(exprs.head)
      }))
  }
}
