package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f)),
    (3L, Array(0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine, excludes self") {
    val out = Similarity.bruteForceTopK(vecs, "embedding", "vec_id",
      queryPred = col("vec_id") === 1, k = 3)
      .orderBy("rank").select($"nid").as[Long].collect().toSeq
    assert(out == Seq(2L, 3L, 4L))
  }

  test("filteredTopK: attribute is the join key, exact within class") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), "a"),
      (2L, Array(0.9f, 0.1f), "a"),
      (3L, Array(0.95f, 0.05f), "b"), // closest overall but wrong class
      (4L, Array(0.0f, 1.0f), "a"),
      (5L, Array(-1.0f, 0.0f), "b")
    ).toDF("vec_id", "embedding", "lab")
    val out = Similarity.filteredTopK(df, "embedding", "vec_id", "lab",
      queryPred = col("vec_id") === 1, k = 10)
      .orderBy("rank").select($"nid").as[Long].collect().toSeq
    assert(out == Seq(2L, 4L),
      s"same-class neighbors in cosine order, got $out")
  }

  test("recallAtK counts hits per query, zero-hit queries included") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("qid", "nid")
    val approx = Seq((1L, 10L), (1L, 99L), (2L, 98L), (2L, 97L))
      .toDF("qid", "nid")
    val m = Similarity.recallAtK(approx, exact, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m(1L) == ((1L, 0.5)))
    assert(m(2L) == ((0L, 0.0)), "a query the index missed entirely " +
      "must still appear with recall 0")
  }

  test("signBucket groups by sign pattern of leading dims") {
    val b = vecs.select($"vec_id",
      Similarity.signBucket($"embedding", bits = 2).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b(1L) == 1L)   // +,0  -> bit0 only
    assert(b(2L) == 3L)   // +,+  -> bits 0,1
    assert(b(3L) == 2L)   // 0,+  -> bit1 only
    assert(b(4L) == 0L)   // -,0  -> none
  }

  test("signBucketTopK only returns same-bucket neighbors") {
    val out = Similarity.signBucketTopK(vecs, "embedding", "vec_id",
      queryPred = col("vec_id") === 1, k = 5, bits = 2)
      .select($"nid").as[Long].collect().toSeq
    assert(out.isEmpty) // vec 1 is alone in bucket 1
  }

  test("multi-probe IVF recall contains single-probe results and grows") {
    // 8 vectors spread over 2D directions; centroids = ids < 3
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(-1.0f, 0.0f)), (3L, Array(0.9f, 0.4f)),
      (4L, Array(0.4f, 0.9f)), (5L, Array(-0.9f, 0.4f)),
      (6L, Array(0.8f, 0.6f)), (7L, Array(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val single = pairs(Similarity.ivfTopK(df, "embedding", "vec_id",
      queryPred = col("vec_id") === 6, k = 8, nCells = 3))
    val multi = pairs(Similarity.ivfTopKMultiProbe(df, "embedding", "vec_id",
      queryPred = col("vec_id") === 6, k = 8, nCells = 3, nProbe = 2))
    assert(single.subsetOf(multi),
      s"multi-probe must contain the single-probe candidates: $single vs $multi")
    assert(multi.size > single.size,
      "second probe must add cross-cell candidates in this geometry")
    // nProbe = nCells degenerates to brute force over all cells
    val all = pairs(Similarity.ivfTopKMultiProbe(df, "embedding", "vec_id",
      queryPred = col("vec_id") === 6, k = 8, nCells = 3, nProbe = 3))
    val brute = pairs(Similarity.bruteForceTopK(df, "embedding", "vec_id",
      queryPred = col("vec_id") === 6, k = 8))
    assert(all == brute)
  }

  test("clusterBalancedSample caps per cell, deterministically, " +
    "invariant to partitioning") {
    // 2 seed cells (vec_id < 2): x-axis vs y-axis; 20 extra vectors
    // all near the x-axis make cell 0 a mega-cluster
    val crowd = (10L to 29L).map(i =>
      (i, Array(1.0f, i.toFloat / 100f))) :+
      (0L, Array(1.0f, 0.0f)) :+ (1L, Array(0.0f, 1.0f))
    val df = crowd.toDF("vec_id", "embedding")
    val out = Similarity.clusterBalancedSample(df, "embedding", "vec_id",
      nCells = 2, cap = 5)
    val perCell = out.groupBy($"cell").count()
      .as[(Long, Long)].collect().toMap
    // the mega-cluster is capped; the singleton cell keeps its vector
    assert(perCell.values.forall(_ <= 5))
    assert(perCell(1L) == 1L)
    assert(perCell(0L) == 5L)
    // deterministic: same result from a different partitioning
    val again = Similarity.clusterBalancedSample(
      df.repartition(7, $"vec_id"), "embedding", "vec_id",
      nCells = 2, cap = 5)
    assert(out.orderBy($"vec_id").collect().toSeq ==
      again.orderBy($"vec_id").collect().toSeq)
  }

  test("kmeansRefine is partitioning-invariant (decimal-exact means)") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run(parts: Int): Map[Long, Seq[Float]] =
      Similarity.kmeansRefine(emb.repartition(parts), "embedding", "vec_id",
        nCells = 8, rounds = 2)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(run(3) == run(13))
  }

  test("kmeansRefine does not decrease the spherical objective") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def objective(cents: org.apache.spark.sql.DataFrame): Double = {
      val withNorm = cents.select(col("cid"), col("cvec"),
        Similarity.norm(col("cvec")).as("cn"))
      emb.select(col("embedding"), Similarity.norm(col("embedding")).as("nrm"))
        .crossJoin(broadcast(withNorm))
        .withColumn("ccos", Similarity.dot(col("embedding"), col("cvec")) /
          (col("nrm") * col("cn")))
        .groupBy(col("embedding")).agg(max(col("ccos")).as("best"))
        .agg(avg(col("best"))).collect()(0).getDouble(0)
    }
    val seed = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("long").as("cid"),
        col("embedding").as("cvec"))
    val refined = Similarity.kmeansRefine(emb, "embedding", "vec_id",
      nCells = 8, rounds = 1)
    assert(objective(refined) >= objective(seed) - 1e-9,
      "one Lloyd round must not worsen the mean max-cosine")
  }

  test("pqEncode emits one code per (vector, subspace), in range") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val codes = Similarity.pqEncode(emb, "embedding", "vec_id",
      dims = 64, m = 4, k = 16).collect()
    assert(codes.length == 500 * 4)
    assert(codes.forall { r =>
      val c = r.getInt(2); c >= 0 && c < 16
    })
    // seed vectors must encode to themselves (distance 0 to own subvec)
    val self = codes.filter(_.getLong(0) < 16)
    assert(self.forall(r => r.getInt(2) == r.getLong(0).toInt))
  }

  test("pqTopK is partitioning-invariant and beats random recall") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Similarity.pqTopK(df, "embedding", "vec_id",
        queryPred = col("vec_id") < 50, topK = 10, dims = 64, m = 4, k = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(emb.repartition(3))
    assert(a == run(emb.repartition(13)))
    // ADC recall against exact cosine top-10: far above the ~2%
    // random baseline (10 of 499). PQ with untrained codebooks is
    // coarse; the point is the plan, so the bar is deliberately low.
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = a.count(brute.contains).toDouble / brute.size
    assert(recall > 0.10, s"ADC recall $recall should beat random (~0.02)")
  }

  test("ivfPqTopK: nProbe=nCells degenerates to pqTopK exactly") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // probing every cell restores the full-corpus ADC scan — same
    // codebook, same fixed-order fold, so results are bit-identical
    val full = pairs(Similarity.ivfPqTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, topK = 10, dims = 64, m = 4, k = 16,
      nCells = 16, nProbe = 16))
    val pq = pairs(Similarity.pqTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, topK = 10, dims = 64, m = 4, k = 16))
    assert(full == pq)
  }

  test("ivfPqTopK is partitioning-invariant; pruned recall beats random") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Similarity.ivfPqTopK(df, "embedding", "vec_id",
        queryPred = col("vec_id") < 50, topK = 10, dims = 64, m = 4, k = 16,
        nCells = 16, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(emb.repartition(3))
    assert(a == run(emb.repartition(13)))
    // recall vs exact cosine top-10: cell pruning at nProbe=3/16 on
    // top of untrained PQ codebooks — must still clearly beat the
    // ~2% random baseline (the point is the plan, not tuned recall)
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = a.count(brute.contains).toDouble / brute.size
    assert(recall > 0.05, s"IVF-PQ recall $recall should beat random (~0.02)")
    // the ADC lookup join must be the broadcast-by-construction form
    // keyed by (cell, j, code) — the cell equi-join IS the pruning
    val plan = Similarity.ivfPqTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, topK = 10, dims = 64, m = 4, k = 16,
      nCells = 16, nProbe = 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("cell"),
      "expected a broadcast hash join keyed on cell")
  }

  test("trained centroids drop into every IVF entry point") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val trained = Similarity.kmeansRefine(emb, "embedding", "vec_id",
      nCells = 16, rounds = 1)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // trained single-probe: well-formed, deterministic, invariant
    val t1 = pairs(Similarity.ivfTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, k = 5, nCells = 16,
      centroids = Some(trained)))
    val t1b = pairs(Similarity.ivfTopK(emb.repartition(7), "embedding",
      "vec_id", queryPred = col("vec_id") < 50, k = 5, nCells = 16,
      centroids = Some(trained)))
    assert(t1.nonEmpty && t1 == t1b)
    // trained multi-probe at nProbe = nCells degenerates to brute
    // force REGARDLESS of the cell space — the structural guarantee
    // that makes any centroid set safe to drop in
    val allProbe = pairs(Similarity.ivfTopKMultiProbe(emb, "embedding",
      "vec_id", queryPred = col("vec_id") < 50, k = 5, nCells = 16,
      nProbe = 16, centroids = Some(trained)))
    val brute = pairs(Similarity.bruteForceTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, k = 5))
    assert(allProbe == brute)
    // trained IVF-PQ runs end-to-end with the same degenerate bound
    val tpq = pairs(Similarity.ivfPqTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, topK = 5, dims = 64, m = 4, k = 16,
      nCells = 16, nProbe = 16, centroids = Some(trained)))
    val pq = pairs(Similarity.pqTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, topK = 5, dims = 64, m = 4, k = 16))
    assert(tpq == pq,
      "probing every trained cell must equal the full ADC scan")
    // an OVERSIZED trained frame fails loudly instead of truncating
    // to an arbitrary (and, across the two resolutions inside
    // multi-probe, potentially inconsistent) subset
    val over = emb.limit(20).select(col("vec_id").as("cid"),
      col("embedding").as("cvec"))
    val e = intercept[IllegalArgumentException](
      Similarity.ivfTopK(emb, "embedding", "vec_id",
        queryPred = col("vec_id") < 50, k = 5, nCells = 16,
        centroids = Some(over)))
    assert(e.getMessage.contains("20 rows") &&
      e.getMessage.contains("nCells=16"))
  }

  test("trained PQ codebook: rounds=0 ≡ inline; parquet round-trip; oversized fails") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // rounds=0 is the seed codebook bit-for-bit, so serving through
    // the trained path must equal the inline path exactly — for the
    // encoder, the full-ADC search, AND the IVF-PQ composition
    val cb0 = Similarity.trainPqCodebook(emb, "embedding", "vec_id",
      dims = 64, m = 4, k = 16, rounds = 0)
    val encInline = Similarity.pqEncode(emb, "embedding", "vec_id",
      dims = 64, m = 4, k = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val encTrained = Similarity.pqEncode(emb, "embedding", "vec_id",
      dims = 64, m = 4, k = 16, codebook = Some(cb0))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(encInline == encTrained)
    val inline = pairs(Similarity.ivfPqTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, topK = 5, dims = 64, m = 4, k = 16,
      nCells = 16, nProbe = 3))
    val seeded = pairs(Similarity.ivfPqTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, topK = 5, dims = 64, m = 4, k = 16,
      nCells = 16, nProbe = 3, codebook = Some(cb0)))
    assert(inline == seeded)
    // the persisted lifecycle: train → save → load → serve must equal
    // serving from the in-memory trained frame (rounds=1 now, so the
    // codebook actually differs from the seed)
    val cb1 = Similarity.trainPqCodebook(emb, "embedding", "vec_id",
      dims = 64, m = 4, k = 16, rounds = 1)
    val dir = java.nio.file.Files.createTempDirectory("pq-cb").toString
    cb1.write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    val servedMem = pairs(Similarity.pqTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, topK = 5, dims = 64, m = 4, k = 16,
      trainedCodebook = Some(cb1)))
    val servedDisk = pairs(Similarity.pqTopK(emb, "embedding", "vec_id",
      queryPred = col("vec_id") < 50, topK = 5, dims = 64, m = 4, k = 16,
      trainedCodebook = Some(loaded)))
    assert(servedMem == servedDisk && servedMem.nonEmpty)
    // an oversized codebook fails loudly, same contract as centroids
    val over = Similarity.pqEncode(emb, "embedding", "vec_id",
      dims = 64, m = 4, k = 16) // (vec_id, j, code): way over m·k rows
      .select(col("j"), col("code"),
        org.apache.spark.sql.functions.array(
          (0 until 16).map(_ => org.apache.spark.sql.functions.lit(0f)): _*)
          .as("cv"))
    val e = intercept[IllegalArgumentException](
      Similarity.pqEncode(emb, "embedding", "vec_id",
        dims = 64, m = 4, k = 16, codebook = Some(over)))
    assert(e.getMessage.contains("m*k=64"))
  }

  test("gramFixedPoint matches the sequential model and is partitioning-invariant") {
    val data = (0 until 37).map { n =>
      (n.toLong, Array.tabulate(5)(i =>
        ((n * 31 + i * 7) % 13 - 6) / 7.0f))
    }
    val df = data.toDF("vec_id", "embedding")
    // sequential reference: same floor-quantized products, one thread
    val expect = {
      val acc = collection.mutable.Map.empty[(Int, Int), Long].withDefaultValue(0L)
      data.foreach { case (_, v) =>
        for (i <- 0 until 5; j <- i until 5)
          acc((i, j)) += math.floor(v(i).toDouble * v(j).toDouble * 1e9).toLong
      }
      acc.toMap
    }
    for (parts <- Seq(1, 3, 16)) {
      val out = Similarity.gramFixedPoint(df.repartition(parts), "embedding")
        .select($"i", $"j", $"s").as[(Int, Int, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(out == expect, s"parts=$parts")
    }
    // empty input → empty frame, no crash
    assert(Similarity.gramFixedPoint(
      df.filter($"vec_id" < 0), "embedding").count() == 0)
    // ragged vectors fail loudly, not silently mis-accumulate
    val ragged = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.gramFixedPoint(ragged, "embedding").count()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }

  test("pcaComponents recovers a planted direction; projection is exact and invariant") {
    // points along u = (0.6, 0.8, 0) with tiny off-axis noise
    val data = (-20 to 20).map { t =>
      (t.toLong + 100L, Array(0.6f * t, 0.8f * t, 0.01f * (t % 3)))
    }
    val df = data.toDF("vec_id", "embedding")
    val comps = Similarity.pcaComponents(df, "embedding", k = 2)
    assert(comps.length == 2 && comps.head.length == 3)
    val u = Array(0.6, 0.8, 0.0)
    val cos = comps.head.zip(u).map { case (a, b) => a * b }.sum /
      math.sqrt(comps.head.map(x => x * x).sum)
    assert(math.abs(cos) > 0.999, s"top component off-axis: cos=$cos")
    // deterministic under partitioning (exact fixed-point Gram)
    val comps2 = Similarity.pcaComponents(df.repartition(7), "embedding", 2)
    assert(comps.flatten.toSeq == comps2.flatten.toSeq)
    // projection: pc1 ordering follows t; no shuffle introduced
    val proj = Similarity.pcaProject(df, "embedding", comps)
    val pc1 = proj.orderBy($"vec_id").select(element_at($"pc", 1))
      .as[Double].collect().toSeq
    assert(pc1.zip(pc1.tail).forall { case (a, b) => a < b } ||
      pc1.zip(pc1.tail).forall { case (a, b) => a > b },
      "pc1 must be monotone along the planted direction")
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"),
      "projection must stay scan-stage")
  }

  test("cosine matches analytic value") {
    val c = vecs.filter($"vec_id" === 1).crossJoin(
        vecs.filter($"vec_id" === 3).select($"embedding".as("e2")))
      .select(Similarity.cosine($"embedding", $"e2")).as[Double].head()
    assert(math.abs(c) < 1e-12)
  }
}
