package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-heap top-k over (score, id) pairs:
  * `topk_pairs(score, id, k)` → the k best pairs per group, ordered
  * by `(score DESC, id ASC)` — exactly the
  * `row_number() OVER (ORDER BY score DESC, id) <= k` contract, with
  * the id as a DETERMINISTIC tiebreak (equal scores cannot reorder
  * across partitionings, unlike a value-only top-k).
  *
  * This is the ANN serving primitive: every top-k-per-query path
  * (brute force, IVF, PQ/ADC) otherwise ends in a per-query window
  * sort whose partition holds the query's WHOLE candidate set —
  * brute force sorts |corpus| rows per query, an IVF probe sorts
  * Σ|probed cells|. As a TypedImperativeAggregate the heap
  * participates in map-side PARTIAL aggregation: each task ships at
  * most k (double, long) pairs per query into the exchange, so
  * shuffle bytes are O(queries · k) regardless of candidate count,
  * and no sort ever sees more than the heaps being merged. Same
  * ObjectHashAggregate engine, IEEE total order, and lazily-grown
  * backing arrays as [[TopKLargest]].
  *
  * Output: `array<struct<score double, id bigint>>` sorted best-first
  * (`posexplode` + `pos+1` recovers the window's rank column).
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairs.PairHeap] {

  private lazy val k: Int = {
    require(kExpr.foldable, "topk_pairs: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v > 0, s"topk_pairs: k must be positive, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType, kExpr.dataType) match {
      case (DoubleType, LongType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, i, kk) => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs expects (double, bigint, int) args, got " +
          s"${s.simpleString}, ${i.simpleString}, ${kk.simpleString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKPairs.PairHeap =
    new TopKPairs.PairHeap(k)

  override def update(buf: TopKPairs.PairHeap,
      input: InternalRow): TopKPairs.PairHeap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    // a candidate missing either half carries no rankable identity —
    // skipped, like TopKLargest's null handling
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKPairs.PairHeap,
      other: TopKPairs.PairHeap): TopKPairs.PairHeap = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.scores(i), other.ids(i)); i += 1
    }
    buf
  }

  override def eval(buf: TopKPairs.PairHeap): Any = {
    // indices sorted best-first: (score desc, id asc)
    val idx = Array.tabulate(buf.size)(identity)
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Double.compare(buf.scores(b), buf.scores(a))
        if (c != 0) c else java.lang.Long.compare(buf.ids(a), buf.ids(b))
      }
    })
    new GenericArrayData(boxed.map { i =>
      InternalRow(buf.scores(i), buf.ids(i)): Any
    })
  }

  override def serialize(buf: TopKPairs.PairHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.PairHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKPairs.PairHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      kExpr = newChildren(2))
}

object TopKPairs {

  /** Capped min-heap over (score, id) pairs under the rank order
    * `(score DESC, id ASC)` — the heap root is the WORST kept pair,
    * evicted when a better one arrives. `worse(a, b)`: a ranks after
    * b iff a.score < b.score, or scores tie (IEEE total order) and
    * a.id > b.id. Parallel primitive arrays, geometric growth up to
    * k — no boxing on the update path. */
  final class PairHeap(capacity: Int) {
    private val init = math.max(1, math.min(capacity, 8))
    var scores = new Array[Double](init)
    var ids = new Array[Long](init)
    var size = 0

    private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
      val c = java.lang.Double.compare(sa, sb)
      if (c != 0) c < 0 else ia > ib
    }

    private def swap(i: Int, j: Int): Unit = {
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    def insert(s: Double, id: Long): Unit = {
      if (size < capacity) {
        if (size == scores.length) {
          val n = math.min(capacity, scores.length * 2)
          scores = java.util.Arrays.copyOf(scores, n)
          ids = java.util.Arrays.copyOf(ids, n)
        }
        scores(size) = s; ids(size) = id
        size += 1
        var i = size - 1 // sift up: worst toward the root
        while (i > 0 &&
            worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
          swap(i, (i - 1) / 2)
          i = (i - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, id)) {
        scores(0) = s; ids(0) = id
        var i = 0 // sift down
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
          if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
          if (m == i) done = true
          else { swap(i, m); i = m }
        }
      }
    }
  }
}
