package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // planted duplicates: 1≡2 exact, 3 near-dup of 1 (one word changed),
  // 4 unrelated
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the lazy cat again and again"),
    (4L, "completely different content about spark query engines here now")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(corpus, "text", "doc_id")
      .select($"keep_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("fingerprint dedup is case/whitespace-insensitive") {
    val df = Seq((1L, "Hello World"), (2L, "  hello world "), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactByFingerprint(df, "text", "doc_id")
    assert(out.count() == 2)
    assert(out.filter($"n_copies" === 2).select($"keep_id").as[Long].head() == 1L)
  }

  test("bag fingerprint is word-order-insensitive, not content-blind") {
    val df = Seq((1L, "the quick brown fox"), (2L, "fox brown THE quick"),
      (3L, "the quick brown foxes")).toDF("doc_id", "text")
    val out = Dedup.exactByBagFingerprint(df, "text", "doc_id")
    assert(out.count() == 2)
    // the shuffled copy collapses onto the lower id; the near-miss
    // (different token) stays its own group
    assert(out.filter($"n_copies" === 2).select($"keep_id").as[Long]
      .head() == 1L)
    // positional fingerprint does NOT catch the shuffle — the bag
    // digest exists precisely for this case
    assert(Dedup.exactByFingerprint(df, "text", "doc_id").count() == 3)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashCandidates(corpus, "text", "doc_id")
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "exact dup must collide in all bands")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not be a candidate")
  }

  test("LSH+verify: candidates filtered to exact Jaccard, scores match " +
      "the inverted-index path") {
    val verified = Dedup.minhashVerifiedPairs(corpus, "text", "doc_id",
      minJaccard = 0.3)
      .select($"a", $"b", $"jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val cands = Dedup.minhashCandidates(corpus, "text", "doc_id")
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(verified.keySet.subsetOf(cands),
      "verified pairs must be a subset of the LSH candidates")
    // on pairs BOTH paths emit, the exact Jaccard must be identical
    val inverted = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
      minJaccard = 0.3)
      .select($"a", $"b", $"jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    verified.foreach { case (p, j) => assert(inverted(p) == j) }
    assert(verified((1L, 2L)) == 1.0)
    assert(!verified.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash groups exact dups") {
    val sh = Dedup.simhash(corpus, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(4L))
  }

  test("ngram jaccard: exact pair = 1.0, near pair high, unrelated absent") {
    val out = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
      minJaccard = 0.3)
      .select($"a", $"b", $"jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) > 0.5 && out((1L, 3L)) < 1.0)
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard DF cap drops boilerplate-only pairs") {
    // docs 1-5 share ONLY a boilerplate license shingle run; 6 and 7
    // are genuine near-dups sharing informative shingles.
    val boiler = "licensed under the apache license version two point zero"
    val df = (1L to 5L).map(i => (i, s"$boiler unique$i content$i words$i"))
      .toDF("doc_id", "text")
      .unionByName(Seq(
        (6L, "alpha beta gamma delta epsilon zeta eta theta"),
        (7L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text"))
    // uncapped: the 5 boilerplate docs pairwise-join (10 pairs in the
    // candidate space, even if below minJaccard they cost the join)
    val uncapped = Dedup.ngramJaccardPairs(df, "text", "doc_id",
      minJaccard = 0.1)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)), "boilerplate pairs present uncapped")
    assert(uncapped.contains((6L, 7L)))
    // capped at DF ≤ 4: the boilerplate shingles (df=5) leave the
    // universe; only the genuine near-dup pair survives
    val capped = Dedup.ngramJaccardPairs(df, "text", "doc_id",
      minJaccard = 0.1, maxDocFreq = Some(4L))
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(capped == Set((6L, 7L)), s"got $capped")
  }

  test("contamination flags docs sharing n-grams with the eval set") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text with different words entirely"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "quick brown fox jumps high")).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, eval, "text", "doc_id", n = 3)
      .orderBy("id").collect()
    assert(out.length == 2)
    // doc 1 shares "quick brown fox" + "brown fox jumps"
    assert(out(0).getLong(1) == 2L && out(0).getBoolean(2))
    assert(out(1).getLong(1) == 0L && !out(1).getBoolean(2))
  }

  test("cell-bucketed semantic dedup: pairs are same-cell, scores exact") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cellPairs = Dedup.embeddingCellPairs(emb, "embedding", "vec_id",
      threshold = 0.30, nCells = 16).collect()
    assert(cellPairs.nonEmpty, "expect some near-dup pairs at 0.30")
    // every reported pair is a true >=threshold cosine pair (scores
    // exact within cells): subset of the unbucketed all-pairs result
    val all = Dedup.embeddingCosinePairs(emb, "embedding", "vec_id",
      threshold = 0.30, queryPred = org.apache.spark.sql.functions.lit(true))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cellPairs.forall(r => all.contains((r.getLong(0), r.getLong(1)))))
    // and the bucketing actually restricts the candidate space
    assert(cellPairs.length < all.size,
      "cell bucketing should drop cross-cell pairs (approximate recall)")
    // partitioning-invariant
    val again = Dedup.embeddingCellPairs(emb.repartition(7), "embedding",
      "vec_id", threshold = 0.30, nCells = 16).collect()
    assert(again.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      cellPairs.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("span dup stats: shared spans flagged, unique spans not") {
    // width=3 spans; docs 1 and 2 share their first 3-token span
    // ("a b c"); doc 3 is entirely unique. Doc 1 has a partial tail
    // span ("x" alone) — counted as a span (full coverage).
    val d = Seq(
      (1L, "a b c x"),          // spans: [a b c], [x]
      (2L, "a b c"),            // spans: [a b c]
      (3L, "p q r s t u")       // spans: [p q r], [s t u]
    ).toDF("doc_id", "text")
    val out = Dedup.spanDupStats(d, "text", "doc_id", width = 3)
      .orderBy($"id")
      .select($"id", $"n_spans", $"n_dup_spans", $"dup_ratio")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 1L, 1L, 1.0),
      (3L, 2L, 0L, 0.0)))
  }

  test("span scrub excises duplicated spans at any alignment, keeps the rest") {
    // width=3, stride-1 windows. "c d e" duplicates across docs 1/2
    // at DIFFERENT offsets (1 vs 0) — the alignment case stride-width
    // chunking misses. Doc 3 is unique and survives untouched; doc 4
    // IS a duplicated span and scrubs to empty.
    val d = Seq(
      (1L, "a c d e b"), // covered: pos 1-3 → keeps "a b"
      (2L, "c d e f g"), // covered: pos 0-2 → keeps "f g"
      (3L, "p q r s"),
      (4L, "c d e"),     // fully covered
      (5L, "c d e")
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(d, "text", "doc_id", width = 3)
      .orderBy($"id").select($"id", $"n_kept", $"scrubbed")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, "a b"),
      (2L, 2L, "f g"),
      (3L, 4L, "p q r s"),
      (4L, 0L, ""),
      (5L, 0L, "")))
  }

  test("span scrub counts within-doc repetition as duplication") {
    // the span repeats inside ONE doc → both occurrences (and the
    // overlap between them) are excised
    val d = Seq(
      (1L, "a b c a b c"), // every stride-1 window duplicates? no —
      // spans: [a b c][b c a][c a b][a b c]: "a b c" occurs twice →
      // covered 0-2 and 3-5 → everything goes
      (2L, "x y z w q r")
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(d, "text", "doc_id", width = 3)
      .orderBy($"id").select($"id", $"n_kept", $"scrubbed")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 0L, ""), (2L, 6L, "x y z w q r")))
  }

  test("span scrub capped route ≡ uncapped on randomized skewed corpora") {
    // BandedScan-style randomized equivalence: corpora where one
    // boilerplate passage saturates the corpus (the exact skew the
    // uncapped window is weak to) must scrub IDENTICALLY through the
    // maxSpanFreq route, for every width × cap combination.
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val boiler = "tos copy all rights reserved inc"
      val docs = (0 until 40).map { i =>
        val uniq = Seq.fill(3 + rnd.nextInt(6))(
          s"w${trial}_${i}_${rnd.nextInt(1000)}").mkString(" ")
        val parts = rnd.nextInt(3) match {
          case 0 => s"$boiler $uniq"
          case 1 => s"$uniq $boiler"
          case _ => s"$uniq $boiler $uniq"
        }
        (i.toLong, parts)
      }
      val d = docs.toDF("doc_id", "text")
      for (width <- Seq(2, 4); cap <- Seq(1, 2, 7)) {
        def rows(o: org.apache.spark.sql.DataFrame) =
          o.orderBy($"id").select($"id", $"n_kept", $"scrubbed")
            .as[(Long, Long, String)].collect().toSeq
        val un = rows(Dedup.spanScrub(d, "text", "doc_id", width))
        val capped = rows(Dedup.spanScrub(d, "text", "doc_id", width,
          maxSpanFreq = Some(cap)))
        assert(capped == un, s"trial=$trial width=$width cap=$cap")
      }
      // the fixture genuinely exercises the hot path: the boilerplate
      // spans occur in all 40 docs, far above every cap tested
      import graft.functions.TextFunctions.tokens
      val hotMax = d.select(posexplode(transform(
          sequence(lit(0), greatest(size(tokens($"text")) - 2, lit(0))),
          i => xxhash64(slice(tokens($"text"), i + lit(1), lit(2))))))
        .groupBy($"col").count().agg(max($"count")).as[Long].head()
      assert(hotMax >= 40L, s"fixture must contain a corpus-hot span, max=$hotMax")
    }
  }

  test("span scrub cap bounds the window-side span frequency") {
    // Direct bounded-partition property: with maxSpanFreq=cap, every
    // span hash that reaches the window (the cold remainder) has
    // frequency ≤ cap — the sorted window partition can never be
    // boilerplate-proportional. Proven by construction: re-derive
    // the span frequency table and check the hot/cold split line.
    val d = (0 until 30).map(i => (i.toLong, s"dup dup dup u$i v$i"))
      .toDF("doc_id", "text")
    import graft.functions.TextFunctions.tokens
    val spans = d.select($"doc_id", posexplode(transform(
        sequence(lit(0), greatest(size(tokens($"text")) - 2, lit(0))),
        i => xxhash64(slice(tokens($"text"), i + lit(1), lit(2))))))
      .select($"doc_id", $"col".as("sh"))
    val freq = spans.groupBy($"sh").count()
    val cap = 5
    val hot = freq.filter($"count" > cap).select($"sh")
    val coldMax = freq.join(hot, Seq("sh"), "left_anti")
      .agg(max($"count")).as[Long].head()
    assert(coldMax <= cap,
      s"cold side must be freq-bounded by cap=$cap, got $coldMax")
    // and the capped scrub still matches the uncapped on this corpus
    def rows(o: org.apache.spark.sql.DataFrame) =
      o.orderBy($"id").select($"id", $"n_kept", $"scrubbed")
        .as[(Long, Long, String)].collect().toSeq
    assert(rows(Dedup.spanScrub(d, "text", "doc_id", 2, Some(cap))) ==
      rows(Dedup.spanScrub(d, "text", "doc_id", 2)))
  }

  test("containment catches doc-inside-doc that jaccard misses") {
    // doc 2 embeds doc 1 verbatim inside a long wrapper: every
    // shingle of 1 appears in 2 (containment 1.0), but the union is
    // wrapper-dominated so Jaccard is far below any usual threshold
    val inner = "alpha beta gamma delta epsilon zeta"
    val wrapper = (1 to 40).map(i => s"wrap$i").mkString(" ")
    val d = Seq(
      (1L, inner),
      (2L, s"$wrapper $inner $wrapper"),
      (3L, "totally unrelated content with its own words here")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(d, "text", "doc_id",
      minContainment = 0.9)
      .select($"a", $"b", $"containment").as[(Long, Long, Double)]
      .collect()
    assert(cont.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
    assert(cont.head._3 == 1.0)
    // the same pair is invisible to Jaccard at 0.5
    val jac = Dedup.ngramJaccardPairs(d, "text", "doc_id")
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("containment respects the hot-shingle cap like jaccard does") {
    val boiler = "same same same same same"
    val d = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler), (4L, boiler)
    ).toDF("doc_id", "text")
    // every shingle is in 4 docs; cap 3 empties the universe
    val out = Dedup.containmentPairs(d, "text", "doc_id",
      maxDocFreq = Some(3L))
    assert(out.count() == 0)
  }

  test("embedding cosine pairs find planted near-dup") {
    val vs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),  // near 1
      (3L, Array(0.0f, 1.0f, 0.0f))    // orthogonal
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingCosinePairs(vs, "embedding", "vec_id",
      threshold = 0.9, queryPred = lit(true))
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }
}
