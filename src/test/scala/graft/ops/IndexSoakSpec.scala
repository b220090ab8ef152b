package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-batch soak over BOTH persisted indexes — the exact-dedup
  * fingerprint index and the incremental IVF ANN index — with
  * interleaved crashes and at-least-once replays, asserting the
  * CROSS-INDEX consistency contract: every document the dedup index
  * admitted must be searchable in the ANN index, exactly once after
  * compaction.
  *
  * The protocol under test (the ordering rule that makes a crash
  * between the two appends recoverable):
  *
  *   1. novel = IncrementalDedup.novel(batch)     — read-only probe
  *   2. IncrementalAnn.appendBatch(novel vectors) — ANN FIRST
  *   3. IncrementalDedup.appendFpRows(novel fps)  — ledger LAST
  *
  * The dedup index is the admission ledger, so it commits LAST: a
  * crash after (2) but before (3) leaves the batch "not yet
  * admitted" — the replay re-runs novel() (same answer: still
  * novel), re-appends the vectors (a bounded duplicate), and then
  * commits the ledger. IncrementalAnn.compact() afterwards restores
  * one-row-per-(id, cell). The REVERSE order would lose data
  * permanently: a post-crash replay would see "already admitted" and
  * never ship the vectors.
  */
class IndexSoakSpec extends SparkSpec {
  import spark.implicits._

  private def mkBatch(ids: Range, text: Long => String): DataFrame =
    ids.map { i =>
      val base = i % 4 match {
        case 0 => Array(1.0f, 0.0f)
        case 1 => Array(0.0f, 1.0f)
        case 2 => Array(-1.0f, 0.0f)
        case _ => Array(0.0f, -1.0f)
      }
      (i.toLong, text(i.toLong),
        Array(base(0) + 0.01f * i, base(1) + 0.005f * i))
    }.toDF("doc_id", "text", "embedding")

  /** One ingest cycle under the ordering protocol; `crashBetween`
    * simulates dying after the ANN append, before the ledger. */
  private def ingest(batch: DataFrame, dedupDir: String, annDir: String,
      crashBetween: Boolean): Unit = {
    val novel = IncrementalDedup.novel(spark, batch, "text", "doc_id",
      dedupDir)
    IncrementalAnn.appendBatch(spark,
      novel.select(col("doc_id"), col("embedding")),
      "embedding", "doc_id", annDir)
    if (!crashBetween) {
      IncrementalDedup.appendFpRows(spark,
        novel.select(col("fp"), col("bucket"), col("doc_id").as("keep_id")),
        dedupDir)
    }
    CheckpointRelease.release(novel)
  }

  test("interleaved crash + replay across both indexes keeps them " +
      "consistent: every admitted doc searchable exactly once") {
    val root = Files.createTempDirectory("idx-soak").toString
    val dedupDir = s"$root/dedup"
    val annDir = s"$root/ann"
    // seed the ANN geometry on batch 0 (create = train); admit batch
    // 0 into the dedup ledger through the same protocol
    val b0 = mkBatch(0 until 16, i => s"doc $i body")
    IncrementalAnn.create(spark,
      b0.select(col("doc_id"), col("embedding")), "embedding", "doc_id",
      annDir, nCells = 4)
    val n0 = IncrementalDedup.novel(spark, b0, "text", "doc_id", dedupDir)
    IncrementalDedup.appendFpRows(spark,
      n0.select(col("fp"), col("bucket"), col("doc_id").as("keep_id")),
      dedupDir)
    CheckpointRelease.release(n0)

    // batch 1: clean commit (has one duplicate text of batch 0 — the
    // dedup index must drop it and the ANN must never see it)
    val b1 = mkBatch(16 until 24,
      i => if (i == 20) "doc 3 body" else s"doc $i body")
    ingest(b1, dedupDir, annDir, crashBetween = false)

    // batch 2: CRASH between the ANN append and the ledger append,
    // then the at-least-once replay of the same batch
    val b2 = mkBatch(24 until 30, i => s"doc $i body")
    ingest(b2, dedupDir, annDir, crashBetween = true)
    ingest(b2, dedupDir, annDir, crashBetween = false) // replay

    // batch 3: replay of an ALREADY-COMMITTED batch (duplicate
    // delivery of b1) — the ledger says "seen", so nothing ships
    ingest(b1, dedupDir, annDir, crashBetween = false)

    // post-replay maintenance
    IncrementalAnn.compact(spark, annDir)

    // admitted set per the dedup ledger
    val admitted = spark.read.parquet(dedupDir)
      .select(col("keep_id")).as[Long].collect().toSet
    val expected = (0L until 24L).filterNot(_ == 20L).toSet ++
      (24L until 30L).toSet
    assert(admitted == expected, s"ledger: $admitted")

    // the ANN index holds EXACTLY the admitted ids, once each
    val annIds = spark.read.parquet(s"$annDir/vectors")
      .select(col("id")).as[Long].collect().toSeq
    assert(annIds.sorted == admitted.toSeq.sorted,
      s"ann ids ${annIds.sorted} != admitted ${admitted.toSeq.sorted}")

    // and every admitted doc is FINDABLE: searching its own vector
    // returns it... is excluded as self — so search k=1 neighbors of a
    // probe vector equal to each admitted doc's vector, shifted
    // slightly, and assert the doc appears in the top-k exactly once
    val probes = mkBatch(1000 until 1006, i => "probe")
      .select(col("doc_id"), col("embedding"))
    val res = IncrementalAnn.searchTopK(spark, probes, "embedding",
      "doc_id", annDir, k = 8, nProbe = 4)
      .select(col("qid"), col("nid")).as[(Long, Long)].collect()
    assert(res.nonEmpty)
    val multiplicities = res.groupBy(identity).values.map(_.size)
    assert(multiplicities.forall(_ == 1),
      "a neighbor surfaced twice after compact")
    res.foreach { case (_, nid) =>
      assert(admitted.contains(nid), s"unadmitted doc $nid in results")
    }
  }
}
