package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled BPE merge-rule table — the serving-side kernel of
  * [[graft.ops.BpeTrain]].
  *
  * The HOF encoder ([[graft.ops.BpeTrain.applyMerges]], retained as
  * the differential-test reference) CHAINS one interpreted
  * `aggregate()` fold per rule: a real tokenizer's 32K merges become
  * a 32K-deep interpreted expression per word, each step rebuilding
  * an (array, flag) struct per symbol — the same shape whose PPM
  * instance measured 251 s before the native-kernel rewrite. This
  * class is the [[PpmStats]]/[[AhoCorasick]] playbook applied to BPE:
  * built ONCE per plan from the literal rule arrays, shipped to
  * executors inside the expression, with encoding cost per word
  * bounded by the WORD's length — independent of the vocabulary
  * size.
  *
  * Semantics are pinned to `applyMerges` exactly (randomized
  * differential spec, unicode included): rules apply in rank order,
  * each merging its pair left-to-right non-overlapping. The kernel
  * gets vocabulary-independence from one observation: applying a
  * rule whose pair does not occur is the identity, so instead of
  * walking all K rules it repeatedly takes the MINIMAL rank ≥ cursor
  * whose pair occurs in the current symbols (a hash lookup per
  * adjacent pair + binary search within that pair's rank list),
  * applies it, and advances the cursor past it. Each application
  * shrinks the word, so the loop runs at most |word| times —
  * O(|word|²) hash probes worst case, zero dependence on K.
  *
  * A rank just applied is never revisited (cursor advances), and a
  * LOWER-rank pair created by a later merge stays unmerged — that is
  * `applyMerges`'s sequential contract, deliberately NOT the
  * priority-queue "always lowest rank globally" variant some
  * tokenizers use: the trainer's vocabulary was induced under the
  * sequential semantics, so the encoder must replay them.
  */
final class BpeRules(lefts: Array[String], rights: Array[String])
    extends Serializable {

  require(lefts.length == rights.length,
    s"bpe_encode: ${lefts.length} left symbols vs ${rights.length} right")
  private val nRules = lefts.length

  private val mergedSym: Array[String] =
    Array.tabulate(nRules)(i => lefts(i) + rights(i))

  // pair → ascending ranks holding that pair (a pair CAN repeat in a
  // rule list in principle; sequential application handles it, and
  // the binary search below picks the first un-passed rank)
  private val ranksByPair: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < nRules) {
      val k = BpeRules.pairKey(lefts(i), rights(i))
      var b = m.get(k)
      if (b == null) { b = scala.collection.mutable.ArrayBuffer.empty[Int]; m.put(k, b) }
      b += i
      i += 1
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size())
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  /** First rank ≥ `from` whose rule merges (l, r); MaxValue if none. */
  private def nextRank(l: String, r: String, from: Int): Int = {
    val a = ranksByPair.get(BpeRules.pairKey(l, r))
    if (a == null) Int.MaxValue
    else {
      var lo = 0
      var hi = a.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (a(mid) < from) lo = mid + 1 else hi = mid
      }
      if (lo < a.length) a(lo) else Int.MaxValue
    }
  }

  /** Shared encode core: code-point symbols after replaying the rule
    * table under the sequential contract. */
  private def encodeSyms(word: String): Array[String] = {
    var syms = BpeRules.splitCodepoints(word)
    var cursor = 0
    var running = true
    while (running && syms.length >= 2) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val rk = nextRank(syms(i), syms(i + 1), cursor)
        if (rk < best) best = rk
        i += 1
      }
      if (best == Int.MaxValue) running = false
      else {
        syms = BpeRules.mergeOnce(syms, lefts(best), rights(best),
          mergedSym(best))
        cursor = best + 1
      }
    }
    syms
  }

  /** Encode one word: split to code-point symbols (matching Spark's
    * `split(word, "")` — empty word ⇒ one empty symbol), then replay
    * the rule table under the sequential contract. */
  def encode(word: UTF8String): GenericArrayData = {
    val syms = encodeSyms(word.toString)
    val out = new Array[Any](syms.length)
    var i = 0
    while (i < syms.length) {
      out(i) = UTF8String.fromString(syms(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** FUSED tokenize + encode + count over a whole document: split on
    * runs of ' ' exactly like `split(trim(text), " +")` (spaces only
    * — tabs/newlines stay inside tokens, matching
    * TextFunctions.tokens), skip empty tokens, sum each token's
    * encoded symbol count. One kernel dispatch per DOCUMENT — the
    * composed `aggregate(tokens, …, size(bpe_encode(w)))` form pays
    * an interpreted-lambda dispatch per TOKEN on the curation scan
    * path. Spec-pinned equal to the composed form. */
  def tokenCount(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    var total = 0L
    var i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < n && s.charAt(j) != ' ') j += 1
        total += encodeSyms(s.substring(i, j)).length.toLong
        i = j
      }
    }
    total
  }
}

object BpeRules {

  // length-prefixed so no symbol content can collide two pairs
  // into one key (symbols are arbitrary strings)
  private def pairKey(l: String, r: String): String =
    l.length.toString + ":" + l + r

  /** Code-point split matching Spark's `split(s, "")`: empty string
    * ⇒ [""], surrogate pairs stay whole (spec-probed on 4.1.2). */
  private[graft] def splitCodepoints(s: String): Array[String] = {
    if (s.isEmpty) return Array("")
    val n = s.codePointCount(0, s.length)
    val out = new Array[String](n)
    var i = 0
    var at = 0
    while (i < n) {
      val next = s.offsetByCodePoints(at, 1)
      out(i) = s.substring(at, next)
      at = next
      i += 1
    }
    out
  }

  /** One left-to-right non-overlapping merge pass of (l, r) → lr —
    * exactly [[graft.ops.BpeTrain.mergePair]]'s fold, natively. */
  private[graft] def mergeOnce(syms: Array[String], l: String,
      r: String, lr: String): Array[String] = {
    val n = syms.length
    val tmp = new Array[String](n)
    var w = 0
    var i = 0
    while (i < n) {
      if (i < n - 1 && syms(i) == l && syms(i + 1) == r) {
        tmp(w) = lr
        i += 2
      } else {
        tmp(w) = syms(i)
        i += 1
      }
      w += 1
    }
    if (w == n) syms
    else java.util.Arrays.copyOf(tmp, w)
  }

  /** One merge pass over an array<string> column value, on
    * UTF8String directly (binary equality ≡ string equality for
    * valid UTF-8). Elements are CLONED into the fresh array — an
    * UnsafeArrayData input may alias a scanner buffer that gets
    * reused after this row. */
  def mergeStep(arr: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = arr.numElements()
    val lr = UTF8String.concat(l, r)
    val tmp = new Array[Any](n)
    var w = 0
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i < n - 1 && cur != null && cur.equals(l)) {
        val nxt = arr.getUTF8String(i + 1)
        if (nxt != null && nxt.equals(r)) {
          tmp(w) = lr
          i += 2
        } else {
          tmp(w) = cur.clone()
          i += 1
        }
      } else {
        tmp(w) = if (cur == null) null else cur.clone()
        i += 1
      }
      w += 1
    }
    if (w == n) new GenericArrayData(tmp)
    else {
      val cut = new Array[Any](w)
      System.arraycopy(tmp, 0, cut, 0, w)
      new GenericArrayData(cut)
    }
  }
}

/** `bpe_encode(word, lefts, rights)` → array<string>: apply a whole
  * trained merge table (two parallel FOLDABLE literal arrays, in
  * rank order) to one word — the tokenizer serving path, one native
  * kernel call per row. Registered by [[graft.GraftExtensions]]. */
case class BpeEncode(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(StringType, _)) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "bpe_encode rule arrays must be foldable (literal) — a " +
            "vocabulary is fixed at plan time")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "bpe_encode expects (string, array<string>, array<string>), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  @transient private lazy val rules: BpeRules = {
    def strings(e: Expression, side: String): Array[String] = {
      val arr = e.eval().asInstanceOf[ArrayData]
      require(arr != null, s"bpe_encode $side rule array must not be null")
      Array.tabulate(arr.numElements()) { i =>
        val s = arr.getUTF8String(i)
        require(s != null, s"bpe_encode $side rules must not contain null")
        s.toString
      }
    }
    new BpeRules(strings(second, "left"), strings(third, "right"))
  }

  override def nullSafeEval(w: Any, l: Any, r: Any): Any =
    rules.encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRules", rules,
      classOf[BpeRules].getName)
    nullSafeCodeGen(ctx, ev, (w, _, _) =>
      s"${ev.value} = $ref.encode($w);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `bpe_merge_pair(syms, l, r)` → array<string>: ONE merge rule
  * applied left-to-right non-overlapping over a symbol array — the
  * trainer's per-round rewrite, replacing the interpreted
  * `aggregate()` struct fold with a native array pass. `l`/`r` are
  * foldable (each training round plans with its chosen pair as
  * literals). Registered by [[graft.GraftExtensions]]. */
case class BpeMergeStep(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = first.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "bpe_merge_pair symbols must be foldable (literal) strings")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "bpe_merge_pair expects (array<string>, string, string), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  @transient private lazy val lSym: UTF8String = {
    val v = second.eval().asInstanceOf[UTF8String]
    require(v != null, "bpe_merge_pair left symbol must not be null")
    v
  }
  @transient private lazy val rSym: UTF8String = {
    val v = third.eval().asInstanceOf[UTF8String]
    require(v != null, "bpe_merge_pair right symbol must not be null")
    v
  }

  override def nullSafeEval(arr: Any, l: Any, r: Any): Any =
    BpeRules.mergeStep(arr.asInstanceOf[ArrayData], lSym, rSym)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeL", lSym,
      classOf[UTF8String].getName)
    val rRef = ctx.addReferenceObj("bpeR", rSym,
      classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, (arr, _, _) =>
      s"""${ev.value} = graft.functions.BpeRules.mergeStep(
         |  $arr, $lRef, $rRef);""".stripMargin)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeMergeStep =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `bpe_token_count(text, lefts, rights)` → bigint: tokenize (space
  * runs, matching `split(trim(text), " +")`), encode every token
  * with the trained rule table, and sum the symbol counts — the
  * curation pipeline's "how many tokens is this document" in ONE
  * kernel dispatch per document. NULL text → NULL. Registered by
  * [[graft.GraftExtensions]]. */
case class BpeTokenCount(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(StringType, _)) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "bpe_token_count rule arrays must be foldable (literal) — a " +
            "vocabulary is fixed at plan time")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "bpe_token_count expects (string, array<string>, array<string>), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  @transient private lazy val rules: BpeRules = {
    def strings(e: Expression, side: String): Array[String] = {
      val arr = e.eval().asInstanceOf[ArrayData]
      require(arr != null, s"bpe_token_count $side rule array must not be null")
      Array.tabulate(arr.numElements()) { i =>
        val s = arr.getUTF8String(i)
        require(s != null, s"bpe_token_count $side rules must not contain null")
        s.toString
      }
    }
    new BpeRules(strings(second, "left"), strings(third, "right"))
  }

  override def nullSafeEval(w: Any, l: Any, r: Any): Any =
    rules.tokenCount(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRules", rules,
      classOf[BpeRules].getName)
    nullSafeCodeGen(ctx, ev, (w, _, _) =>
      s"${ev.value} = $ref.tokenCount($w);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeTokenCount =
    copy(first = newFirst, second = newSecond, third = newThird)
}
