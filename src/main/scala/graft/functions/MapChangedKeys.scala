package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType}

/** Sorted keys whose values differ (null-safely) between two maps —
  * the changed-column audit primitive, as ONE fused pass.
  *
  * Replaces the four-operator higher-order pipeline
  * `filter(array_sort(array_union(map_keys(b), map_keys(a))),
  * k => !(element_at(b,k) <=> element_at(a,k)))`, whose interpreted
  * lambda machinery and three intermediate arrays per row measured
  * ~3.7 µs/row at sf1 — the whole cost of the audit query. Semantics
  * are IDENTICAL by construction (TransformsSpec pins equivalence
  * against the HOF formulation on randomized maps): a key absent
  * from one side compares as null, so add/remove surfaces as a
  * change and "present with null value" equals "absent", exactly as
  * `element_at` + `<=>` behave; duplicate keys resolve to the first
  * occurrence (element_at's rule); output is ascending by key.
  *
  * Lookups are nested linear scans over the MapData buffers — maps
  * here are row images (column-count sized), where two O(n²) scans
  * of ~tens of entries beat building per-row hash tables.
  *
  * Registered as SQL function `map_changed_keys` by
  * [[graft.GraftExtensions]]; the public API is
  * [[graft.operators.Transforms.changedColumns]].
  */
case class MapChangedKeys(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  @transient private lazy val MapType(keyType, valueType, _) =
    left.dataType.asInstanceOf[MapType]

  @transient private lazy val keyOrd =
    TypeUtils.getInterpretedOrdering(keyType)
  @transient private lazy val valueOrd =
    TypeUtils.getInterpretedOrdering(valueType)

  override def dataType: DataType =
    ArrayType(left.dataType.asInstanceOf[MapType].keyType,
      containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (MapType(bk, bv, _), MapType(ak, av, _))
          if bk == ak && bv == av =>
        val kCheck = TypeUtils.checkForOrderingExpr(bk, "map_changed_keys")
        if (kCheck != TypeCheckResult.TypeCheckSuccess) kCheck
        else TypeUtils.checkForOrderingExpr(bv, "map_changed_keys")
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "map_changed_keys expects two maps with matching key " +
            s"and value types, got ${left.dataType.simpleString}, " +
            s"${right.dataType.simpleString}")
    }

  private def firstIndexOf(keys: ArrayData, n: Int, k: Any): Int = {
    var i = 0
    while (i < n) {
      if (keyOrd.equiv(keys.get(i, keyType), k)) return i
      i += 1
    }
    -1
  }

  override def nullSafeEval(b: Any, a: Any): Any = {
    val bm = b.asInstanceOf[MapData]
    val am = a.asInstanceOf[MapData]
    val (bk, bv, nb) = (bm.keyArray(), bm.valueArray(), bm.numElements())
    val (ak, av, na) = (am.keyArray(), am.valueArray(), am.numElements())
    def valueAt(vals: ArrayData, i: Int): Any =
      if (i < 0 || vals.isNullAt(i)) null else vals.get(i, valueType)
    def differ(x: Any, y: Any): Boolean =
      if (x == null || y == null) !(x == null && y == null)
      else !valueOrd.equiv(x, y)
    val changed = new ArrayBuffer[Any](math.max(nb, na))
    var i = 0
    while (i < nb) {
      val k = bk.get(i, keyType)
      // first occurrence wins (element_at's duplicate rule)
      if (firstIndexOf(bk, i, k) < 0 &&
          differ(valueAt(bv, i), valueAt(av, firstIndexOf(ak, na, k))))
        changed += k
      i += 1
    }
    var j = 0
    while (j < na) {
      val k = ak.get(j, keyType)
      // keys also in b were handled above; skip a-side duplicates
      if (firstIndexOf(ak, j, k) < 0 && firstIndexOf(bk, nb, k) < 0 &&
          differ(null, valueAt(av, j)))
        changed += k
      j += 1
    }
    new GenericArrayData(
      changed.sortWith((x, y) => keyOrd.compare(x, y) < 0).toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MapChangedKeys =
    copy(left = newLeft, right = newRight)
}
