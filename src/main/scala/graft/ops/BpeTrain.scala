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
  *      (weighted by word frequency, one aggregate), picks the most
  *      frequent pair (deterministic ties: highest count, then
  *      lexicographic), and rewrites the words with that pair merged
  *      (left-to-right, non-overlapping — the BPE contract).
  *
  * Merging uses a per-word fold over the symbol array (bounded by
  * the word's own length), so no stage ever holds more than a word;
  * per-round `localCheckpoint` bounds lineage like the k-means
  * refinement loop. The top-pair read is a 1-row collect per round —
  * bounded driver traffic, same as `kmeansRefine`'s centroid pull.
  *
  * Determinism: pair counts are exact integer sums; ties break by
  * (count DESC, left ASC, right ASC); the merge fold is
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

  /** Corpus → (word, weight): the one data-proportional stage. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Train `merges` BPE rules from a (word, cnt) table.
    * @return (rank, left, right, merged, freq) — rank 1..k in merge
    *         order; stops early when no pair occurs twice. */
  def train(wordCounts: DataFrame, merges: Int): DataFrame = {
    require(merges > 0, s"bpe: merges must be positive, got $merges")
    val spark = wordCounts.sparkSession
    import spark.implicits._
    // initial symbols: the word's characters
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
          // identical post-merge symbol sequences re-combine so the
          // word table only ever shrinks
          .groupBy(col("syms")).agg(sum(col("cnt")).as("cnt"))
          .localCheckpoint()
        words.unpersist(blocking = false)
        words = next
        rank += 1
      }
    }
    rules.result().toDF("rank", "left", "right", "merged", "freq")
  }

  /** ENCODE with a trained merge table: apply the rules to a word in
    * rank order — K chained per-word folds, each bounded by the
    * word's (shrinking) symbol count. This is the serving side of
    * the trainer: rules are a driver-side list (a vocabulary is
    * small by definition), so encoding is a pure scan-stage
    * projection — no join, no shuffle, fused into whatever reads
    * the corpus. */
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
    * also start one. */
  private[ops] def mergePair(syms: Column, l: String, r: String): Column =
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
