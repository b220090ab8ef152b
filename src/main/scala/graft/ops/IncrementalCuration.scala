package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.TextFunctions

/** Incremental (streaming) forms of the two corpus-GLOBAL curation
  * stages — per-domain caps and the global token budget — backed by a
  * persisted admission ledger, the same continuous-ingestion shape as
  * [[IncrementalDedup]]'s fingerprint index: each micro-batch admits
  * against the ledger of everything admitted so far (across batches
  * AND runs), and the batch's own admissions append after the
  * caller's output commit.
  *
  * Semantics trade-off, stated openly: the batch stages order the
  * WHOLE corpus (domain-cap by id-hash, token-budget by quality) —
  * an online pipeline cannot, because it cannot un-ship documents it
  * already emitted. The incremental forms therefore admit in ARRIVAL
  * order across batches (first-come against the remaining cap /
  * budget) while keeping the batch stage's deterministic order
  * WITHIN each batch. The invariants that survive unchanged — and
  * that the equivalence spec pins against a batch run over the
  * concatenated input — are: per-domain admitted counts equal
  * min(cap, domain total); admitted token total never exceeds the
  * budget and equals the batch total under the same arrival order;
  * and a document is never admitted twice.
  *
  * Ledger size is BOUNDED BY THE POLICY, not the corpus: domain-cap
  * stores only admitted docs (≤ cap × #domains rows); token-budget
  * stores only admitted docs (≤ budget / min-doc-tokens rows). Both
  * stay driver-aggregatable at any corpus scale, which is why —
  * unlike the dedup indexes — no bucket partitioning is needed.
  *
  * Replay safety (foreachBatch is at-least-once) and re-delivery
  * both reduce to ONE rule: a doc already in the ledger is never
  * admitted again. A batch replayed after its ledger append derives
  * an EMPTY admission — and an empty frame under dynamic partition
  * overwrite writes no partitions, so the crashed attempt's output
  * stands; replayed before the append, the deterministic ranking
  * re-derives the identical set and overwrites its own partition
  * identically. A doc genuinely re-delivered in a LATER batch is
  * dropped rather than double-admitted or double-counted (admission
  * rows additionally dedupe by doc id on read, so even a double
  * ledger append cannot inflate counts).
  */
object IncrementalCuration {

  private val domainSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType)))

  private val budgetSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ntok", LongType)))

  private def fsPath(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Admit `batch` docs whose domain still has room under `cap`,
    * given the persisted ledger at `stateDir`. Docs ALREADY IN the
    * ledger are dropped, never re-admitted — that one rule covers
    * both failure modes: a crash-REPLAYED batch (ledger appended,
    * checkpoint uncommitted) re-derives an all-ledgered → EMPTY
    * admission, and dynamic partition overwrite writes NO partitions
    * for an empty frame, so the crashed attempt's output survives
    * untouched; a genuine RE-DELIVERY of an admitted doc in a later
    * batch is dropped instead of consuming cap twice. (A crash
    * BEFORE the ledger append replays to the identical admission —
    * deterministic ranking against unchanged prior counts — and
    * overwrites its own partition identically.) Within the batch the
    * order is the batch stage's (id-hash, id), computed over the
    * NOVEL docs only. Returns a MATERIALIZED frame with the batch's
    * original columns (consume-after-append safe). */
  def admitDomainCap(spark: SparkSession, batch: DataFrame,
      sourceCol: String, idCol: String, stateDir: String,
      cap: Int): DataFrame = {
    val (hfs, p) = fsPath(spark, stateDir)
    val h = TextFunctions.hashBucket(col(idCol), 1000000)
    val w = Window.partitionBy(col(sourceCol)).orderBy(h, col(idCol))
    val admitted =
      if (!hfs.exists(p))
        CappedSample.perKeyCap(batch, Seq(sourceCol), h, col(idCol), cap)
      else {
        val ledger = spark.read.schema(domainSchema).parquet(stateDir)
        val novel = batch.join(
          ledger.select(col("doc_id").as(idCol)), Seq(idCol), "left_anti")
        val prior = ledger.select(col("doc_id"), col("source")).distinct()
          .groupBy(col("source")).agg(count(lit(1)).as("__prior"))
          .withColumnRenamed("source", "__src")
        // bound the rank's partitions by cap, not by the batch's
        // largest domain (a backfill mega-batch is the hazard):
        // whatever `prior` is, the admitted set is inside the
        // novel top-cap by (hash, id), so the exact CappedSample
        // prefilter loses nothing and the window ranks <= cap rows
        // per domain
        val bounded = CappedSample.perKeyCap(novel, Seq(sourceCol),
          h, col(idCol), cap)
        bounded.withColumn("__rn", row_number().over(w))
          .join(prior, col(sourceCol) === col("__src"), "left")
          .filter(coalesce(col("__prior"), lit(0L)) + col("__rn") <= cap)
          .drop("__src", "__prior")
      }
    admitted.drop("__rn").localCheckpoint()
  }

  /** Append admitted (doc_id, source) rows to the domain ledger. */
  def appendDomainRows(spark: SparkSession, rows: DataFrame,
      stateDir: String): Unit =
    rows.select(col("doc_id"), col("source"))
      .write.mode(SaveMode.Append).parquet(stateDir)

  /** Admit `batch` docs under the REMAINING token budget (total
    * budget minus tokens already admitted per the ledger), quality-
    * ordered within the batch via [[BandedScan.budgetFilter]].
    * Ledgered docs are dropped, never re-admitted — same
    * crash-replay / re-delivery rule as [[admitDomainCap]] (spent is
    * counted over the FULL ledger, so a re-delivered doc can neither
    * re-consume budget nor duplicate in the output).
    * Returns a MATERIALIZED frame carrying a `__ntok` helper column
    * (the caller's postCommit appends it, then drops it). */
  def admitTokenBudget(spark: SparkSession, batch: DataFrame,
      textCol: String, idCol: String, stateDir: String,
      budget: Long, tokenCount: Option[Column] = None): DataFrame = {
    val (hfs, p) = fsPath(spark, stateDir)
    val (novel, spent) =
      if (!hfs.exists(p)) (batch, 0L)
      else {
        val ledger = spark.read.schema(budgetSchema).parquet(stateDir)
        val nv = batch.join(
          ledger.select(col("doc_id").as(idCol)), Seq(idCol), "left_anti")
        val sp = ledger
          .groupBy(col("doc_id")).agg(max(col("ntok")).as("ntok"))
          .agg(coalesce(sum(col("ntok")), lit(0L)))
          .head().getLong(0) // one scalar — bounded driver-side read
        (nv, sp)
      }
    val remaining = math.max(0L, budget - spent)
    BandedScan.budgetFilter(
      novel
        .withColumn("__ntok", tokenCount.getOrElse(
          TextFunctions.tokenCount(col(textCol)).cast("long")))
        .withColumn("__q", TextFunctions.qualityScore(col(textCol))),
      qualityCol = "__q", weightCol = "__ntok", tieCol = idCol,
      budget = remaining)
      .drop("__q")
      .localCheckpoint()
  }

  /** Append admitted (doc_id, ntok) rows to the budget ledger. */
  def appendBudgetRows(spark: SparkSession, rows: DataFrame,
      stateDir: String): Unit =
    rows.select(col("doc_id"), col("ntok"))
      .write.mode(SaveMode.Append).parquet(stateDir)
}
