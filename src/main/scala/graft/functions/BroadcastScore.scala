package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast-backed transport for the compiled model kernels
  * ([[NbRatios]], [[LmModel]], [[DsirRatios]]) — the serve path.
  *
  * The registered literal kernels (`nb_score`, `lm_score2/3`,
  * `dsir_score`) carry the model as a foldable array literal INSIDE
  * the expression tree: right for the SQL-expressible path and for
  * small models, but a plan bomb as the model grows — the literal is
  * re-serialized with every task binary, rehashed on every plan
  * canonicalization, and walked by every tree transform. These
  * expressions instead hold a [[Broadcast]] handle: the task binary
  * ships a token (a few hundred bytes); each executor fetches the
  * model once through the torrent protocol and caches it in its
  * block manager. Scoring arithmetic is the SAME kernel object the
  * literal forms build, so values are bit-identical to the literal
  * kernels, the relational forms, and the DuckDB oracle
  * (spec-pinned in ModelTransportSpec).
  *
  * Codegen references the broadcast object (not its value), resolves
  * `.value()` once in the generated class's init — per task-attempt,
  * hitting the executor-local cache after the first — and scores
  * inside whole-stage codegen like the literal kernels.
  */
private[graft] abstract class BroadcastScoreExpr[M <: AnyRef]
    extends UnaryExpression {

  def bc: Broadcast[M]
  def kernelName: String
  protected def modelClass: Class[M]
  protected def scoreMethod: String

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$kernelName expects a string document column, got " +
          t.simpleString)
    }

  @transient protected lazy val model: M = bc.value

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // ship the Broadcast HANDLE through the codegen references array;
    // materialize the value once per generated-class instance
    val bcRef = ctx.addReferenceObj(s"${kernelName}Bc", bc,
      classOf[Broadcast[_]].getName)
    val cls = modelClass.getName
    val m = ctx.addMutableState(cls, s"${kernelName}Model",
      v => s"$v = ($cls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $m.$scoreMethod($t);")
  }
}

/** Broadcast twin of [[NbScore]] (`nb_score`). */
case class NbScoreBc(child: Expression, bc: Broadcast[NbRatios])
    extends BroadcastScoreExpr[NbRatios] {

  override def kernelName: String = "nb_score_bc"
  override protected def modelClass: Class[NbRatios] = classOf[NbRatios]
  override protected def scoreMethod: String = "score"

  override def dataType: DataType = StructType(Seq(
    StructField("n_seen", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("pred", BooleanType, nullable = false)))

  override def nullSafeEval(t: Any): Any =
    model.score(t.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(c: Expression): NbScoreBc =
    copy(child = c)
}

/** Multiclass NB vote prediction over a broadcast [[NbVoteModel]] —
  * the kernel twin of [[graft.ops.NbClassifier.predictVotes]] (the
  * language-ID serve path): one tally per document, no explode, no
  * vote-table join, no doc-keyed regroup. */
case class NbVoteBc(child: Expression, bc: Broadcast[NbVoteModel])
    extends BroadcastScoreExpr[NbVoteModel] {

  override def kernelName: String = "nb_vote_bc"
  override protected def modelClass: Class[NbVoteModel] =
    classOf[NbVoteModel]
  override protected def scoreMethod: String = "predict"

  override def dataType: DataType = StructType(Seq(
    StructField("pred", StringType, nullable = false),
    StructField("n_votes", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false)))

  override def nullSafeEval(t: Any): Any =
    model.predict(t.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(c: Expression): NbVoteBc =
    copy(child = c)
}

/** Broadcast twin of [[LmScore2]] (`lm_score2`); alpha is baked into
  * the broadcast [[LmModel]]. */
case class LmScore2Bc(child: Expression, bc: Broadcast[LmModel])
    extends BroadcastScoreExpr[LmModel] {

  override def kernelName: String = "lm_score2_bc"
  override protected def modelClass: Class[LmModel] = classOf[LmModel]
  override protected def scoreMethod: String = "score2"

  override def dataType: DataType = StructType(Seq(
    StructField("n_trans", LongType, nullable = false),
    StructField("n_hits", LongType, nullable = false),
    StructField("mean_p", DoubleType, nullable = false)))

  override def nullSafeEval(t: Any): Any =
    model.score2(t.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(c: Expression): LmScore2Bc =
    copy(child = c)
}

/** Broadcast twin of [[LmScore3]] (`lm_score3`). */
case class LmScore3Bc(child: Expression, bc: Broadcast[LmModel])
    extends BroadcastScoreExpr[LmModel] {

  override def kernelName: String = "lm_score3_bc"
  override protected def modelClass: Class[LmModel] = classOf[LmModel]
  override protected def scoreMethod: String = "score3"

  override def dataType: DataType = StructType(Seq(
    StructField("n_win", LongType, nullable = false),
    StructField("n_tri_hits", LongType, nullable = false),
    StructField("n_big_hits", LongType, nullable = false),
    StructField("mean_p", DoubleType, nullable = false)))

  override def nullSafeEval(t: Any): Any =
    model.score3(t.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(c: Expression): LmScore3Bc =
    copy(child = c)
}

/** Per-language LM scoring over a broadcast [[LmModelBank]] — the
  * kernel twins of [[graft.ops.LangModel.scoreBy]] (bigram) and
  * [[graft.ops.LangModel.scoreTrigramBy]] (trigram): `left` is the
  * document text, `right` the group (language) key; each document
  * scores against its own group's model in one call, untrained
  * groups return the restored zero row. Null text or group yields
  * null (the serve wrapper coalesces to the restored row, matching
  * the relational form's left-join restore). */
private[graft] abstract class LmByBcBase
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  def bc: Broadcast[LmModelBank]
  protected def scoreMethod: String

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        "lm_score_by expects (string text, string group), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  @transient protected lazy val bank: LmModelBank = bc.value

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("lmBankBc", bc,
      classOf[Broadcast[_]].getName)
    val cls = classOf[LmModelBank].getName
    val m = ctx.addMutableState(cls, "lmBank",
      v => s"$v = ($cls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (t, g) =>
      s"${ev.value} = $m.$scoreMethod($t, $g);")
  }
}

case class LmScoreByBc(left: Expression, right: Expression,
    bc: Broadcast[LmModelBank]) extends LmByBcBase {

  override protected def scoreMethod: String = "score2"

  override def dataType: DataType = StructType(Seq(
    StructField("n_trans", LongType, nullable = false),
    StructField("n_hits", LongType, nullable = false),
    StructField("mean_p", DoubleType, nullable = false)))

  override def nullSafeEval(t: Any, g: Any): Any =
    bank.score2(t.asInstanceOf[UTF8String], g.asInstanceOf[UTF8String])

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): LmScoreByBc = copy(left = l, right = r)
}

case class LmScore3ByBc(left: Expression, right: Expression,
    bc: Broadcast[LmModelBank]) extends LmByBcBase {

  override protected def scoreMethod: String = "score3"

  override def dataType: DataType = StructType(Seq(
    StructField("n_win", LongType, nullable = false),
    StructField("n_tri_hits", LongType, nullable = false),
    StructField("n_big_hits", LongType, nullable = false),
    StructField("mean_p", DoubleType, nullable = false)))

  override def nullSafeEval(t: Any, g: Any): Any =
    bank.score3(t.asInstanceOf[UTF8String], g.asInstanceOf[UTF8String])

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): LmScore3ByBc = copy(left = l, right = r)
}

/** Broadcast twin of [[DsirScore]] (`dsir_score`); prefix is baked
  * into the broadcast [[DsirRatios]]. */
case class DsirScoreBc(child: Expression, bc: Broadcast[DsirRatios])
    extends BroadcastScoreExpr[DsirRatios] {

  override def kernelName: String = "dsir_score_bc"
  override protected def modelClass: Class[DsirRatios] =
    classOf[DsirRatios]
  override protected def scoreMethod: String = "score"

  override def dataType: DataType = StructType(Seq(
    StructField("n_feat", LongType, nullable = false),
    StructField("weight", DoubleType, nullable = false)))

  override def nullSafeEval(t: Any): Any =
    model.score(t.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(c: Expression): DsirScoreBc =
    copy(child = c)
}

/** Column builders for the broadcast kernels (these expressions take
  * a non-Expression constructor field, so they cannot come from the
  * function registry). */
object BroadcastScore {

  def nb(text: Column, bc: Broadcast[NbRatios]): Column =
    GraftColumnBridge.column(NbScoreBc(GraftColumnBridge.expression(text), bc))

  def nbVote(text: Column, bc: Broadcast[NbVoteModel]): Column =
    GraftColumnBridge.column(NbVoteBc(GraftColumnBridge.expression(text), bc))

  def lm2(text: Column, bc: Broadcast[LmModel]): Column =
    GraftColumnBridge.column(LmScore2Bc(GraftColumnBridge.expression(text), bc))

  def lm3(text: Column, bc: Broadcast[LmModel]): Column =
    GraftColumnBridge.column(LmScore3Bc(GraftColumnBridge.expression(text), bc))

  def dsir(text: Column, bc: Broadcast[DsirRatios]): Column =
    GraftColumnBridge.column(DsirScoreBc(GraftColumnBridge.expression(text), bc))

  def lmBy(text: Column, group: Column, bc: Broadcast[LmModelBank]): Column =
    GraftColumnBridge.column(LmScoreByBc(
      GraftColumnBridge.expression(text),
      GraftColumnBridge.expression(group), bc))

  def lm3By(text: Column, group: Column, bc: Broadcast[LmModelBank]): Column =
    GraftColumnBridge.column(LmScore3ByBc(
      GraftColumnBridge.expression(text),
      GraftColumnBridge.expression(group), bc))
}
