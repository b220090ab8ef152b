package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction over a corpus — the
  * tokenizer-training step of an LLM data pipeline, shaped the way
  * production BPE trainers shape it:
  *
  *   1. the CORPUS-PROPORTIONAL part is one reduction: token →
  *      frequency (`wordCounts` — explode + hash aggregate, the only
  *      stage that ever sees 100 TB);
  *   2. training then iterates on the WORD-COUNT TABLE (distinct
  *      words × weight — millions of rows at web scale, not
  *      trillions): each round counts adjacent symbol pairs
  *      (weighted by word frequency), picks the most frequent pair
  *      (deterministic ties: highest count, then lexicographic), and
  *      rewrites the words with that pair merged (left-to-right,
  *      non-overlapping — the BPE contract).
  *
  * Round 10 makes the trainer real-tokenizer-scale. The round-9 form
  * re-counted EVERY pair of EVERY word each round (a full explode +
  * aggregate + sort per merge: 32K sequential corpus-width jobs for a
  * real vocabulary). Now pair counts are DELTA-MAINTAINED: merging
  * pair p changes the pair bag only of words that CONTAIN p, so each
  * round subtracts the changed words' old pairs and adds their new
  * ones — a tiny aggregate — and the full word table is touched only
  * by one native `bpe_merge_pair` projection (a no-op array pass for
  * unaffected words). Jobs per merge are pinned by spec at 3 (top-1
  * read + two checkpoint materializations), none of them a global
  * sort.
  *
  * Below [[LocalWordLimit]] distinct words the trainer additionally
  * short-circuits to a DRIVER-LOCAL delta trainer
  * ([[trainLocalRows]]) — the shape every production tokenizer
  * trainer uses (the word table of a language is bounded even when
  * the corpus is not): an inverted pair→words index makes each merge
  * touch only the words containing it, and a (freq, pair)-ordered
  * set makes best-pair selection O(log P). A 1K-merge vocabulary
  * trains in seconds where the per-round Spark scheduling floor
  * alone would be minutes. Both paths produce IDENTICAL rule tables
  * (spec-pinned on randomized corpora, unicode included; string
  * order is compared by CODE POINT, matching Spark's UTF8String
  * binary ordering).
  *
  * Determinism: pair counts are exact integer sums; ties break by
  * (count DESC, left ASC, right ASC); the merge pass is
  * order-defined. Identical inputs give identical merge tables on
  * any partitioning (spec-pinned), which is what makes a trained
  * vocabulary reproducible across runs and clusters.
  *
  * Not SQL-expressible as one query (the rounds are inherently
  * sequential), so correctness rides BpeTrainSpec: a reference
  * single-machine BPE implementation, randomized equivalence,
  * partitioning invariance, and the textbook "aaab" merge order.
  */
object BpeTrain {

  /** Word tables at or below this row count train driver-locally —
    * sized so the collected table (words × ~32 B) stays far under
    * driver heap while covering any natural-language vocabulary. */
  val LocalWordLimit: Long = 2000000L

  /** Second local-path gate: total WORD CHARACTERS. Row count alone
    * under-estimates the driver footprint on high-pair-cardinality
    * corpora (CJK/unicode): the inverted pair→occurrences index is
    * proportional to total adjacent symbol positions (≤ total chars),
    * not to row count. 64M chars × ~16 B/position keeps the index
    * around 1 GB worst-case; larger corpora take the distributed
    * delta trainer. */
  val LocalCharLimit: Long = 64000000L

  /** Corpus → (word, weight): the one data-proportional stage. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Train `merges` BPE rules from a (word, cnt) table.
    * @return (rank, left, right, merged, freq) — rank 1..k in merge
    *         order; stops early when no pair occurs twice. */
  def train(wordCounts: DataFrame, merges: Int,
      localWordLimit: Long = LocalWordLimit): DataFrame = {
    require(merges > 0, s"bpe: merges must be positive, got $merges")
    val spark = wordCounts.sparkSession
    import spark.implicits._
    // the stats pass re-runs the wordCounts aggregate once; the local
    // path then collects it — two passes over a bounded table, vs
    // collecting an unbounded one blind. The char sum gates the
    // pair-occurrence index (∝ adjacent positions), which row count
    // alone under-estimates on high-pair-cardinality corpora.
    val stats = wordCounts
      .agg(count(lit(1)).as("n"),
        coalesce(sum(length(col("word"))), lit(0L)).as("chars"))
      .collect().head
    val n = stats.getLong(0)
    val chars = stats.getLong(1)
    if (n <= localWordLimit && chars <= LocalCharLimit) {
      val rows = wordCounts
        .select(col("word").cast("string"), col("cnt").cast("long"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
      trainLocalRows(rows, merges)
        .toDF("rank", "left", "right", "merged", "freq")
    } else trainDelta(wordCounts, merges)
  }

  /** Distributed delta-maintained trainer — see the class doc. */
  private[ops] def trainDelta(wordCounts: DataFrame,
      merges: Int): DataFrame = {
    val spark = wordCounts.sparkSession
    import spark.implicits._
    graft.GraftExtensions.ensure(spark)
    var wordsCp = wordCounts
      .select(split(col("word"), "").as("syms"),
        col("cnt").cast("long").as("cnt"))
      .localCheckpoint()
    var words = wordsCp
    // initial pair counts: the ONE full pair aggregate
    var pairs = words
      .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("freq"))
      .localCheckpoint()
    val rules = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= merges && !done) {
      val top = pairs.orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2L) {
        done = true
      } else {
        val (l, r, f) =
          (top.head.getString(0), top.head.getString(1),
            top.head.getLong(2))
        rules += ((rank, l, r, l + r, f))
        // ONE native pass over the word table; merge is identity on
        // words without the pair, and a merged word always SHRINKS,
        // so size() is the cheap changed-row test
        val stepped = words
          .select(col("cnt"), col("syms"),
            call_function("bpe_merge_pair", col("syms"), lit(l), lit(r))
              .as("syms2"))
          .localCheckpoint()
        val changed = stepped
          .filter(size(col("syms2")) < size(col("syms")))
        val minus = changed
          .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("p"))
          .select(col("p.l").as("l"), col("p.r").as("r"),
            (-col("cnt")).as("d"))
        val plus = changed
          .select(col("cnt"), explode(adjacentPairs(col("syms2"))).as("p"))
          .select(col("p.l").as("l"), col("p.r").as("r"),
            col("cnt").as("d"))
        val delta = minus.union(plus)
          .groupBy(col("l"), col("r")).agg(sum(col("d")).as("d"))
        val nextPairs = pairs.join(delta, Seq("l", "r"), "full_outer")
          .select(col("l"), col("r"),
            (coalesce(col("freq"), lit(0L)) + coalesce(col("d"), lit(0L)))
              .as("freq"))
          .filter(col("freq") > 0)
          .localCheckpoint()
        // superseded checkpoints release once their successors exist
        CheckpointRelease.release(pairs)
        pairs = nextPairs
        CheckpointRelease.release(wordsCp)
        wordsCp = stepped
        words = stepped.select(col("syms2").as("syms"), col("cnt"))
        rank += 1
      }
    }
    CheckpointRelease.release(pairs)
    CheckpointRelease.release(wordsCp)
    rules.result().toDF("rank", "left", "right", "merged", "freq")
  }

  /** Driver-local delta trainer over a collected (word, cnt) table:
    * inverted pair→words index (each merge touches only words
    * containing the pair; stale entries are re-checked at use) and a
    * (freq DESC, l, r)-ordered selection set. Pure function of its
    * input — identical rule tables to [[trainDelta]], spec-pinned. */
  private[ops] def trainLocalRows(rows: Array[(String, Long)],
      merges: Int): Seq[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    val nWords = rows.length
    val syms = new Array[Array[String]](nWords)
    val cnt = new Array[Long](nWords)
    var w = 0
    while (w < nWords) {
      syms(w) = graft.functions.BpeRules.splitCodepoints(rows(w)._1)
      cnt(w) = rows(w)._2
      w += 1
    }
    // Spark's string ordering is UTF8String BINARY order == code
    // point order; Java String.compareTo is UTF-16 order, which
    // DIFFERS above U+FFFF — compare code points so local ==
    // distributed on astral-plane symbols too
    def cmpCp(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
    implicit val selOrd: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String),
            y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(y._1, x._1) // freq DESC
          if (c != 0) c
          else {
            val c2 = cmpCp(x._2, y._2)
            if (c2 != 0) c2 else cmpCp(x._3, y._3)
          }
        }
      }
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    // occurrences as GROWABLE Int buffers, not BitSets: a BitSet is
    // sized by its highest set bit (a rare pair first seen near the
    // word-table tail would cost O(nWords/8) bytes on its own), so on
    // high-pair-cardinality corpora the index was O(pairs × words)
    // worst-case. Buffers are O(total adjacent positions) across ALL
    // pairs. Entries may repeat a word index after re-adds — the
    // stale-entry holds() check at use makes duplicates a skip, never
    // a double merge (mergeOnce removes every occurrence at once).
    val occ = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]
    val sel = mutable.TreeSet.empty[(Long, String, String)]

    def bump(p: (String, String), d: Long): Unit = {
      val old = pairCount.getOrElse(p, 0L)
      if (old != 0L) sel.remove((old, p._1, p._2))
      val nu = old + d
      if (nu != 0L) {
        pairCount(p) = nu
        sel.add((nu, p._1, p._2))
      } else {
        pairCount.remove(p)
        occ.remove(p) // dead pair: drop its occurrence list too
      }
    }
    def addPairs(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var k = 0
      while (k < s.length - 1) {
        val p = (s(k), s(k + 1))
        bump(p, sign * cnt(i))
        if (sign > 0)
          occ.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int]) += i
        k += 1
      }
    }
    var i = 0
    while (i < nWords) { addPairs(i, 1L); i += 1 }

    val rules = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= merges && !done) {
      if (sel.isEmpty || sel.head._1 < 2L) done = true
      else {
        val (f, l, r) = sel.head
        rules += ((rank, l, r, l + r, f))
        val p = (l, r)
        // snapshot: addPairs below inserts into OTHER pairs' occ sets
        // (a merge can never re-create its own pair — mergeOnce
        // removes every occurrence), but iterate a copy anyway
        occ.get(p).map(_.toArray).foreach { members =>
          members.foreach { wi =>
            // stale-entry check: the word may no longer hold the pair
            val s = syms(wi)
            var holds = false
            var k = 0
            while (!holds && k < s.length - 1) {
              holds = s(k) == l && s(k + 1) == r
              k += 1
            }
            if (holds) {
              addPairs(wi, -1L)
              syms(wi) = graft.functions.BpeRules.mergeOnce(s, l, r, l + r)
              addPairs(wi, 1L)
            }
          }
        }
        rank += 1
      }
    }
    rules.result()
  }

  /** Round-9 full-recount trainer, retained as the differential-test
    * reference for [[trainDelta]]/[[trainLocalRows]]: one full pair
    * explode + aggregate + global sort per merge — simple enough to
    * trust, too many corpus-width jobs per merge to ship. */
  private[ops] def trainRecount(wordCounts: DataFrame,
      merges: Int): DataFrame = {
    val spark = wordCounts.sparkSession
    import spark.implicits._
    var words = wordCounts
      .select(split(col("word"), "").as("syms"), col("cnt").cast("long")
        .as("cnt"))
      .localCheckpoint()
    val rules = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= merges && !done) {
      val pairs = words
        .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (pairs.isEmpty || pairs.head.getLong(2) < 2L) {
        done = true
      } else {
        val (l, r, f) =
          (pairs.head.getString(0), pairs.head.getString(1),
            pairs.head.getLong(2))
        rules += ((rank, l, r, l + r, f))
        val next = words
          .select(mergePair(col("syms"), l, r).as("syms"), col("cnt"))
          .groupBy(col("syms")).agg(sum(col("cnt")).as("cnt"))
          .localCheckpoint()
        words.unpersist(blocking = false)
        words = next
        rank += 1
      }
    }
    rules.result().toDF("rank", "left", "right", "merged", "freq")
  }

  /** ENCODE with a trained merge table via the native
    * `bpe_encode` kernel: cost per word is bounded by the WORD's
    * length, independent of the vocabulary size — a 32K-rule
    * tokenizer costs the same per word as a 10-rule one. Rules are a
    * driver-side list (a vocabulary is small by definition), shipped
    * once inside the expression: pure scan-stage projection, no
    * join, no shuffle. Requires [[graft.GraftExtensions]] (ensure()
    * or config). */
  def encodeNative(word: Column, rules: Seq[(String, String)]): Column =
    if (rules.isEmpty) split(word, "")
    else call_function("bpe_encode", word,
      array(rules.map(p => lit(p._1)): _*),
      array(rules.map(p => lit(p._2)): _*))

  /** The interpreted HOF encoder — K chained per-word folds, one per
    * rule. Retained as the differential-test reference for
    * [[encodeNative]] (BpeEncodeSpec pins them equal on randomized
    * unicode words); at real-vocabulary K this shape is a K-deep
    * interpreted expression per word — serve with [[encodeNative]]. */
  def applyMerges(word: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(split(word, "")) {
      case (syms, (l, r)) => mergePair(syms, l, r)
    }

  /** Adjacent symbol pairs of one word: [(s1,s2), (s2,s3), ...]. */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<l:string,r:string>>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1), i =>
        struct(element_at(syms, i).as("l"),
          element_at(syms, i + 1).as("r"))))

  /** Left-to-right, non-overlapping merge of adjacent (l, r) into
    * lr — the BPE application fold ("aaa" + (a,a) → ["aa","a"]).
    * State is (out array, pending flag): pending marks that the
    * PREVIOUS symbol was just consumed into a merge, so it cannot
    * also start one. Interpreted reference for the native
    * `bpe_merge_pair` kernel. */
  private[graft] def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms,
      struct(array().cast("array<string>").as("out"),
        lit(false).as("justMerged")),
      (st, x) => {
        val out = st.getField("out")
        val last = element_at(out, -1)
        val canMerge = size(out) > 0 && !st.getField("justMerged") &&
          last === lit(l) && x === lit(r)
        struct(
          when(canMerge,
            concat(slice(out, lit(1), size(out) - 1), array(lit(l + r))))
            .otherwise(concat(out, array(x))).as("out"),
          canMerge.as("justMerged"))
      },
      st => st.getField("out"))
}
