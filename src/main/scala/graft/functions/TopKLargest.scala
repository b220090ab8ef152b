package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `topk_largest(value, k)` → the k
  * largest values per group, sorted descending.
  *
  * The 100 TB rationale (SURVEY §7.4(b) — custom Catalyst over
  * workarounds): per-group top-k via `row_number() OVER (PARTITION BY
  * g ORDER BY v DESC) <= k` shuffles and SORTS every row of every
  * group; `collect_list` + slice materializes whole groups in memory
  * (unbounded on a hot group). This aggregate keeps a k-element
  * min-heap per group, participates in map-side PARTIAL aggregation
  * (each task ships at most k doubles per group into the shuffle —
  * the exchange carries O(groups·k), independent of row count), and
  * merges heaps on the reduce side. A 10-billion-row group costs the
  * same shuffle bytes as a 10-row group.
  *
  * State is a primitive min-heap (the array-backed sift implementation
  * below — no boxing on the hot update path); serialization is the
  * raw double array. Runs under ObjectHashAggregateExec (the
  * TypedImperativeAggregate engine): not codegen'd, but still
  * hash-based with partial/final split — the same engine Spark's own
  * percentile/collect aggregates use.
  *
  * Determinism: selection-only (no arithmetic on the values), so
  * results are partitioning-independent; equal values are
  * indistinguishable in the output. NULLs are ignored, an empty
  * group yields an empty array.
  */
case class TopKLargest(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKLargest.Heap] {

  private lazy val k: Int = {
    require(kExpr.foldable, "topk_largest: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v > 0, s"topk_largest: k must be positive, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (DoubleType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"topk_largest expects (double, int) args, got " +
          s"${child.dataType.simpleString}, ${kExpr.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_largest"

  override def createAggregationBuffer(): TopKLargest.Heap =
    new TopKLargest.Heap(k)

  override def update(buf: TopKLargest.Heap, input: InternalRow): TopKLargest.Heap = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKLargest.Heap, other: TopKLargest.Heap): TopKLargest.Heap = {
    var i = 0
    while (i < other.size) { buf.insert(other.values(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKLargest.Heap): Any = {
    val out = java.util.Arrays.copyOf(buf.values, buf.size)
    java.util.Arrays.sort(out)
    // ascending → descending in place
    var i = 0
    while (i < out.length / 2) {
      val t = out(i); out(i) = out(out.length - 1 - i); out(out.length - 1 - i) = t
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKLargest.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKLargest.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKLargest.Heap(k)
    var i = 0
    while (i < n) { h.insert(bb.getDouble); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLargest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLargest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLargest =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object TopKLargest {

  /** Primitive-double min-heap capped at capacity k: the smallest of
    * the kept values sits at the root, so a new value either replaces
    * it (when larger) or is discarded in O(1).
    *
    * Ordering is the IEEE total order (`java.lang.Double.compare`):
    * NaN ranks above every other value and -0.0 below 0.0 — the same
    * semantics as Spark's SQL sort and the `Arrays.sort` used at
    * eval(), so a NaN input ranks into the top-k instead of breaking
    * the heap invariant (raw `<`/`>` on NaN is always false, which
    * would let later evictions discard values that belong in the
    * top-k).
    *
    * The backing array grows geometrically up to k rather than
    * eagerly allocating k slots per group: a large literal k over
    * high group cardinality would otherwise pin O(groups·k) doubles
    * in the map-side hash aggregate even when most groups are tiny.
    */
  final class Heap(capacity: Int) {
    var values = new Array[Double](math.max(1, math.min(capacity, 8)))
    var size = 0

    private def lt(a: Double, b: Double): Boolean =
      java.lang.Double.compare(a, b) < 0

    def insert(v: Double): Unit = {
      if (size < capacity) {
        if (size == values.length)
          values = java.util.Arrays.copyOf(
            values, math.min(capacity, values.length * 2))
        values(size) = v
        size += 1
        var i = size - 1 // sift up
        while (i > 0 && lt(values(i), values((i - 1) / 2))) {
          val p = (i - 1) / 2
          val t = values(p); values(p) = values(i); values(i) = t
          i = p
        }
      } else if (lt(values(0), v)) {
        values(0) = v
        var i = 0 // sift down
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < size && lt(values(l), values(m))) m = l
          if (r < size && lt(values(r), values(m))) m = r
          if (m == i) done = true
          else {
            val t = values(m); values(m) = values(i); values(i) = t
            i = m
          }
        }
      }
    }
  }
}
