package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftColumnBridge

import graft.SparkSpec

/** Pins the r11-verdict transport fix: the compiled model kernels
  * ship through a BROADCAST handle, not a plan literal, so the
  * per-task serialized plan stays token-sized at the row-gate
  * boundary — and both transports score bit-identically. */
class ModelTransportSpec extends SparkSpec {

  import spark.implicits._

  private def javaSize(o: AnyRef): Int = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(o)
    oos.close()
    bos.size()
  }

  test("broadcast transport serializes as a token while the literal " +
    "transport carries the model (200K-entry boundary)") {
    graft.GraftExtensions.ensure(spark)
    val n = 200000
    val keys = Array.tabulate(n)(i => s"token$i")
    val ratios = Array.tabulate(n)(i => 1.0 + i * 1e-6)
    val bc = spark.sparkContext.broadcast(
      new NbRatios(keys, ratios, 1.0, 1.0, 40))

    val bcExpr = NbScoreBc(
      GraftColumnBridge.expression(col("text")), bc)
    val litExpr = GraftColumnBridge.expression(
      call_function("nb_score", col("text"),
        typedLit(keys.toSeq), typedLit(ratios.toSeq),
        typedLit(Seq(1.0, 1.0, 40.0))))

    val bcBytes = javaSize(bcExpr)
    val litBytes = javaSize(litExpr)
    // the broadcast expression is a handle: a few KB of class
    // metadata, independent of model size; the literal expression
    // embeds ~200K strings + 200K doubles (several MB) and would
    // re-serialize with EVERY task binary
    assert(bcBytes < 64 * 1024,
      s"broadcast kernel expression serialized to $bcBytes bytes")
    assert(litBytes > 20 * bcBytes,
      s"literal form ($litBytes B) should dwarf broadcast ($bcBytes B)")
  }

  test("broadcast kernels ≡ literal kernels bit-for-bit (all four)") {
    graft.GraftExtensions.ensure(spark)
    val docs = Seq((1L, "a b a c"), (2L, "  b  c "), (3L, ""),
      (4L, "z unseen words here"), (5L, "a"))
      .toDF("doc_id", "text")

    // NB
    val nbKeys = Array("a", "b", "c")
    val nbRatios = Array(2.0, 0.5, 1.25)
    val nbLit = docs.select(col("doc_id"),
      call_function("nb_score", col("text"), typedLit(nbKeys.toSeq),
        typedLit(nbRatios.toSeq), typedLit(Seq(0.8, 1.5, 40.0)))
        .as("r")).orderBy("doc_id").collect().map(_.toSeq).toSeq
    val nbBc = spark.sparkContext.broadcast(
      new NbRatios(nbKeys, nbRatios, 0.8, 1.5, 40))
    val nbGot = docs.select(col("doc_id"),
      BroadcastScore.nb(col("text"), nbBc).as("r"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(nbGot == nbLit)

    // LM bigram + trigram (one merged key table)
    val lmKeys = Array("a", "a b", "a b a", "b", "b a", "c")
    val lmCnts = Array(5L, 3L, 2L, 4L, 1L, 2L)
    val lm2Lit = docs.select(col("doc_id"),
      call_function("lm_score2", col("text"), typedLit(lmKeys.toSeq),
        typedLit(lmCnts.toSeq), lit(0.4)).as("r"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val lmBc = spark.sparkContext.broadcast(
      new LmModel(lmKeys, lmCnts, 0.4))
    val lm2Got = docs.select(col("doc_id"),
      BroadcastScore.lm2(col("text"), lmBc).as("r"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(lm2Got == lm2Lit)
    val lm3Lit = docs.select(col("doc_id"),
      call_function("lm_score3", col("text"), typedLit(lmKeys.toSeq),
        typedLit(lmCnts.toSeq), lit(0.4)).as("r"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val lm3Got = docs.select(col("doc_id"),
      BroadcastScore.lm3(col("text"), lmBc).as("r"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(lm3Got == lm3Lit)

    // DSIR
    val dsirArr = Array.tabulate(64)(i => 0.5 + i * 0.01)
    val dsirLit = docs.select(col("doc_id"),
      call_function("dsir_score", col("text"),
        typedLit(dsirArr.toSeq), lit(40)).as("r"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val dsirBc = spark.sparkContext.broadcast(
      new DsirRatios(dsirArr, 40))
    val dsirGot = docs.select(col("doc_id"),
      BroadcastScore.dsir(col("text"), dsirBc).as("r"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(dsirGot == dsirLit)
  }

  test("broadcast kernel runs inside whole-stage codegen") {
    // a parquet scan, not a local relation — ConvertToLocalRelation
    // would otherwise fold the whole projection driver-side
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val bc = spark.sparkContext.broadcast(
      new NbRatios(Array("a"), Array(2.0), 0.5, 1.0, 40))
    val df = docs
      .select(col("doc_id"), BroadcastScore.nb(col("text"), bc).as("r"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1) Project" is the WholeStageCodegen marker in simpleString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.count() > 0)
    // and the same kernel evaluates correctly through codegen
    val probe = Seq((1L, "a a b")).toDF("doc_id", "text")
      .select(col("doc_id"), BroadcastScore.nb(col("text"), bc).as("r"))
    val row = probe.collect().head.getStruct(1)
    // a:2 seen twice (2*2), b unseen (0.5) → 2.0*2.0*0.5 = 2.0
    assert(row.getLong(0) == 2L && row.getDouble(1) == 2.0)
  }

  test("nb vote broadcast kernel ≡ relational predictVotes (ties, " +
    "OOV fallback, whitespace, null)") {
    import graft.ops.NbClassifier
    // labels chosen so ties exercise the label-ascending break; doc 4
    // is all-OOV (the argmax-of-1/(N_c+V) fallback); doc 5 has messy
    // whitespace (tokenizer contract); doc 6 is null (drops)
    val train = Seq(
      (10L, "de", "der und der und der hund"),
      (11L, "de", "der hund und der fuchs"),
      (12L, "en", "the dog and the fox"),
      (13L, "en", "the fox and the dog the"))
      .toDF("doc_id", "lang", "text")
    val docs = Seq(
      (1L, Some("der hund the dog")), // 2-2 vote tie → label asc
      (2L, Some("der und der")),
      (3L, Some("the fox")),
      (4L, Some("zzz qqq www")),
      (5L, Some("  der   hund ")),
      (6L, None))
      .toDF("doc_id", "text")
    val toks = TextFunctions.tokens(col("text"))
    val counts = NbClassifier.trainCounts(train, toks, col("lang"), 1)
    val rel = NbClassifier.predictVotes(docs, "doc_id", toks, counts)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val bc = NbClassifier.broadcastVotes(spark,
      NbClassifier.compileVotes(counts))
    val got = NbClassifier.predictVotesCompiled(docs, "doc_id",
      "text", bc).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == rel, s"\nkernel: $got\nrelational: $rel")
    // null doc dropped by both, every other doc predicted
    assert(got.map(_.head) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("null text row yields null from the broadcast kernel (filter " +
    "contract)") {
    val bc = spark.sparkContext.broadcast(
      new NbRatios(Array("a"), Array(2.0), 0.5, 1.0, 40))
    val df = Seq((1L, Some("a")), (2L, None))
      .toDF("doc_id", "text")
      .select(col("doc_id"), BroadcastScore.nb(col("text"), bc).as("r"))
    val rows = df.orderBy("doc_id").collect()
    assert(rows(0).getStruct(1) != null && rows(1).isNullAt(1))
  }
}
