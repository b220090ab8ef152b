package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Compiled multiclass NB vote table — the serving-side kernel of
  * [[graft.ops.NbClassifier.predictVotes]], the [[NbRatios]]
  * playbook applied to the language-ID classifier (the fastText
  * LID-176 shape: every char-trigram votes for its argmax class,
  * the document takes the majority).
  *
  * The per-token votes arrive PRE-DECIDED as label indices
  * (collected from the same relational argmax plan the join form
  * uses — the smoothed-probability comparison and its tie-break
  * happened once, in the engine); the kernel only replays the
  * tally: one hash lookup per token, an integer vote count per
  * label, argmax with the lowest index winning ties. `labels` MUST
  * arrive sorted in the engine's binary string order (compileVotes
  * collects them through an engine `ORDER BY`), so "lowest index"
  * IS the relational `row_number() ... ORDER BY n_votes DESC, vote`
  * tie-break. All arithmetic is exact integers — bit-identical to
  * the relational form and the DuckDB oracle under the same
  * `split(trim(text), " +")` tokenizer contract as [[NbRatios]].
  *
  * Unlike the binary scorer there is NO prefix cap: predictVotes
  * explodes every token, so the kernel reads every token — one
  * HashMap probe each, linear in document length (the LID pass of
  * a CCNet-shaped pipeline reads whole documents too).
  */
final class NbVoteModel(keys: Array[String], votes: Array[Int],
    labels: Array[String], oovVote: Int) extends Serializable {

  require(keys.length == votes.length,
    s"nb_vote: ${keys.length} keys vs ${votes.length} votes")
  require(labels.nonEmpty, "nb_vote: no labels")
  require(oovVote >= 0 && oovVote < labels.length,
    s"nb_vote: oov vote $oovVote outside ${labels.length} labels")

  private val m = new java.util.HashMap[String, Integer](keys.length * 2)
  locally {
    var i = 0
    while (i < keys.length) {
      require(votes(i) >= 0 && votes(i) < labels.length,
        s"nb_vote: vote ${votes(i)} outside ${labels.length} labels")
      m.put(keys(i), votes(i))
      i += 1
    }
  }

  // engine-ordered label strings, pre-encoded once
  private val labelU8 = labels.map(UTF8String.fromString)

  // the whitespace tokenizer contract shared by every compiled text
  // kernel (NbRatios/LmModel): split(trim(text), " +"), where empty
  // text yields the single empty token
  private def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    if (lo >= hi) return Array("")
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    var i = lo
    var start = lo
    while (i < hi) {
      if (s.charAt(i) == ' ') {
        out += s.substring(start, i)
        while (i < hi && s.charAt(i) == ' ') i += 1
        start = i
      } else i += 1
    }
    out += s.substring(start, hi)
    out.toArray
  }

  /** (pred, n_votes, n_tok) ≡ NbClassifier.predictVotes. */
  def predict(text: UTF8String): InternalRow = {
    val ts = tokenize(text)
    val tally = new Array[Long](labelU8.length)
    var i = 0
    while (i < ts.length) {
      val v = m.get(ts(i))
      tally(if (v != null) v.intValue() else oovVote) += 1L
      i += 1
    }
    var best = 0
    var j = 1
    while (j < tally.length) {
      if (tally(j) > tally(best)) best = j
      j += 1
    }
    new GenericInternalRow(Array[Any](labelU8(best), tally(best),
      ts.length.toLong))
  }
}
