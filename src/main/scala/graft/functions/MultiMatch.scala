package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho–Corasick automaton over a fixed pattern set.
  *
  * Built ONCE per plan from the literal pattern list and shipped to
  * executors inside the expression (a few bytes per pattern byte —
  * sparse sorted-edge nodes, no dense 256-way tables), it finds
  * every occurrence of every pattern in ONE pass over the text:
  * O(text + matches), independent of the pattern count. That is the
  * blocklist/canary-phrase primitive a curation pipeline runs over
  * every document — the naive alternative is #patterns regex/contains
  * scans per row, which at 100 TB multiplies the corpus read cost by
  * the blocklist size.
  *
  * Matching is on UTF-8 BYTES, which for valid UTF-8 equals
  * character-level exact substring match: a pattern's first byte is
  * never a continuation byte (lead and continuation ranges are
  * disjoint), so a match cannot start mid-codepoint.
  *
  * The traversal uses the classic failure-link automaton with
  * per-node merged output lists precomputed at build time, so match
  * emission is O(1) per hit with no fail-chain walking on the hot
  * path.
  */
final class AhoCorasick private (
    // per-node sorted edge bytes + parallel target node ids
    edgeBytes: Array[Array[Byte]],
    edgeTo: Array[Array[Int]],
    fail: Array[Int],
    outputs: Array[Array[Int]],
    val nPatterns: Int) extends Serializable {

  private def step(from: Int, b: Byte): Int = {
    var s = from
    while (true) {
      val bs = edgeBytes(s)
      var lo = 0
      var hi = bs.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = java.lang.Byte.compare(bs(mid), b)
        if (c == 0) return edgeTo(s)(mid)
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Sorted distinct pattern indices with >=1 occurrence in `text`. */
  def matches(text: Array[Byte]): Array[Int] = {
    val seen = new Array[Boolean](nPatterns)
    var nSeen = 0
    var s = 0
    var i = 0
    while (i < text.length && nSeen < nPatterns) {
      s = step(s, text(i))
      val out = outputs(s)
      var j = 0
      while (j < out.length) {
        val p = out(j)
        if (!seen(p)) { seen(p) = true; nSeen += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Int](nSeen)
    var k = 0
    var p = 0
    while (p < nPatterns) {
      if (seen(p)) { res(k) = p; k += 1 }
      p += 1
    }
    res
  }

  /** True iff ANY pattern occurs — EARLY-EXITS at the first hit, so
    * a blocklist filter over mostly-clean text pays far less than a
    * full [[matches]] scan, and a blocked document stops at its
    * first offending byte. */
  def anyMatch(text: Array[Byte]): Boolean = {
    var s = 0
    var i = 0
    while (i < text.length) {
      s = step(s, text(i))
      if (outputs(s).length > 0) return true
      i += 1
    }
    false
  }

  /** Boxed-array form for [[GenericArrayData]] without reflection. */
  def matchesBoxed(text: Array[Byte]): Array[Any] = {
    val m = matches(text)
    val r = new Array[Any](m.length)
    var i = 0
    while (i < m.length) { r(i) = m(i); i += 1 }
    r
  }
}

object AhoCorasick {

  def build(patterns: Seq[Array[Byte]]): AhoCorasick = {
    require(patterns.nonEmpty, "multi_match needs at least one pattern")
    require(patterns.forall(_.nonEmpty),
      "multi_match patterns must be non-empty strings")

    // trie with growable sparse edges
    val edges = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Byte, Int])
    val ends = scala.collection.mutable.ArrayBuffer(
      List.empty[Int])
    patterns.zipWithIndex.foreach { case (pat, pid) =>
      var s = 0
      pat.foreach { b =>
        s = edges(s).getOrElse(b, {
          edges += scala.collection.mutable.TreeMap.empty[Byte, Int]
          ends += Nil
          val n = edges.length - 1
          edges(s)(b) = n
          n
        })
      }
      ends(s) = pid :: ends(s)
    }

    val n = edges.length
    val fail = new Array[Int](n)
    val outputs = new Array[Array[Int]](n)
    outputs(0) = ends(0).sorted.toArray

    // BFS: fail links + merged outputs (own ends ++ fail target's)
    val queue = scala.collection.mutable.Queue.empty[Int]
    edges(0).foreach { case (_, child) =>
      fail(child) = 0
      outputs(child) = (ends(child) ++ outputs(0)).distinct.sorted.toArray
      queue += child
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      edges(s).foreach { case (b, child) =>
        // longest proper suffix that is a trie path
        var f = fail(s)
        var target = 0
        var found = false
        while (!found) {
          edges(f).get(b) match {
            case Some(t) => target = t; found = true
            case None =>
              if (f == 0) { target = 0; found = true }
              else f = fail(f)
          }
        }
        fail(child) = target
        outputs(child) =
          (ends(child) ++ outputs(target)).distinct.sorted.toArray
        queue += child
      }
    }

    new AhoCorasick(
      edges.map(_.keysIterator.toArray).toArray,
      edges.map(_.valuesIterator.toArray).toArray,
      fail, outputs, patterns.length)
  }
}

/** Shared analysis + automaton plumbing for the multi_match family:
  * text on the left, a FOLDABLE literal array of patterns on the
  * right, compiled once per plan into an [[AhoCorasick]] referenced
  * from generated code and shared by every row. */
trait MultiMatchBase extends BinaryExpression {
  def fnName: String

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$fnName patterns must be a foldable (literal) array")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$fnName expects (string, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  @transient protected lazy val automaton: AhoCorasick = {
    val arr = right.eval().asInstanceOf[ArrayData]
    require(arr != null, s"$fnName pattern array must not be null")
    AhoCorasick.build((0 until arr.numElements()).map { i =>
      val s = arr.getUTF8String(i)
      require(s != null, s"$fnName patterns must not be null")
      s.getBytes
    })
  }

  protected def automatonRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("ahoCorasick", automaton,
      classOf[AhoCorasick].getName)
}

/** `multi_match(text, array('p1','p2',…))` → sorted distinct indices
  * (0-based) of the patterns occurring in `text`, via the ONE-pass
  * [[AhoCorasick]] automaton. Registered by
  * [[graft.GraftExtensions]]. */
case class MultiMatch(left: Expression, right: Expression)
    extends MultiMatchBase {

  override def fnName: String = "multi_match"

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(text: Any, pats: Any): Any =
    new GenericArrayData(
      automaton.matchesBoxed(text.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ac = automatonRef(ctx)
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"""${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    $ac.matchesBoxed($text.getBytes()));""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiMatch =
    copy(left = newLeft, right = newRight)
}

/** `multi_match_any(text, patterns)` → boolean; EARLY-EXITS at the
  * first hit (a blocked document stops at its first offending byte),
  * which is the right shape for blocklist FILTERS — `size(
  * multi_match(...)) > 0` would keep scanning to enumerate every
  * match it is about to discard. Registered by
  * [[graft.GraftExtensions]]. */
case class MultiMatchAny(left: Expression, right: Expression)
    extends MultiMatchBase {

  override def fnName: String = "multi_match_any"

  override def dataType: DataType = BooleanType

  override def nullSafeEval(text: Any, pats: Any): Any =
    automaton.anyMatch(text.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ac = automatonRef(ctx)
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = $ac.anyMatch($text.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiMatchAny =
    copy(left = newLeft, right = newRight)
}
