package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string self-join (entity resolution): all pairs of
  * rows whose string column is within Levenshtein distance 1,
  * WITHOUT a quadratic cross join.
  *
  * Blocking is the deletion neighborhood of FastSS (Bocek, Hunt &
  * Stiller, "Fast Similarity Search in Large Dictionaries", 2007):
  * every string emits itself plus each single-character deletion as
  * block keys. Two strings with edit distance ≤ 1 ALWAYS share a key —
  *  - substitution at i: deleting position i from both sides yields
  *    the same string;
  *  - insertion/deletion: deleting the inserted character from the
  *    longer side yields the shorter one (depth-0 key);
  *  - equality: the identity key —
  * so the equi-join on keys is a provably COMPLETE candidate set, and
  * an exact `levenshtein ≤ 1` verification filter makes it sound.
  *
  * 100 TB shape: a string of length L emits L+1 keys, so the explode
  * is a linear row blowup; candidates form only inside key buckets
  * (shuffle hash-partitioned on the key), never across the corpus —
  * the cross join this replaces is Θ(n²) at any cluster size. Bucket
  * skew comes from mass-duplicate strings, which is exactly the
  * salting / AQE-skew territory every other self-join here sits in.
  * FuzzyJoinSpec pins completeness against brute force on random
  * strings and asserts the plan stays non-cartesian.
  */
object FuzzyJoin {

  /** The string itself plus every single-character deletion —
    * `array_distinct` because repeated characters produce repeated
    * deletions (e.g. "aab" → "ab" twice), which would duplicate
    * candidates downstream. */
  private def deletionKeys(strCol: String): Column = array_distinct(
    concat(
      array(col(strCol)),
      expr(s"transform(sequence(1, greatest(length($strCol), 1)), " +
        s"i -> concat(substring($strCol, 1, i - 1), " +
        s"substring($strCol, i + 1, 2147483647)))")))

  /** All (a, b, dist) pairs with a < b on `idCol` and
    * levenshtein(`strCol`) ≤ 1. */
  def selfPairs(df: DataFrame, strCol: String, idCol: String): DataFrame = {
    val keyed = df
      .select(col(idCol), col(strCol),
        explode(deletionKeys(strCol)).as("__key"))
    val l = keyed.select(col("__key"), col(idCol).as("a"),
      col(strCol).as("__sa"))
    val r = keyed.select(col("__key"), col(idCol).as("b"),
      col(strCol).as("__sb"))
    l.join(r, Seq("__key"))
      .filter(col("a") < col("b"))
      // a pair can meet in several buckets (shared deletions) —
      // collapse before the verify filter runs per surviving pair
      .select(col("a"), col("b"), col("__sa"), col("__sb")).distinct()
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= 1)
      .select(col("a"), col("b"), col("dist"))
  }
}
