package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: last-event-per-key compaction written in the
  * window form
  *
  * {{{ filter(row_number() over (partition by k order by s desc) = 1) }}}
  *
  * is rewritten into a hash aggregate
  *
  * {{{ groupBy(k).agg(max(struct(s, payload…))) }}}
  *
  * — the plan [[graft.operators.Compactor.lastEventPerKeyAgg]] writes
  * by hand. The window form shuffles every row AND sorts every
  * partition; the aggregate form gets map-side partial aggregation:
  * each task pre-reduces to one row per key before the shuffle — at
  * 100 TB of changelog this is the difference between shuffling the
  * whole batch and shuffling ~|keys| rows. (Struct extremes carry a
  * var-width buffer, so Spark plans the aggregate as SortAggregate
  * rather than HashAggregate — the partial pre-shuffle stage, not
  * the agg flavor, is where the scale win lives.)
  *
  * Soundness:
  *  - `row_number() = 1` keeps exactly one row per partition; the
  *    max/min of a struct whose LEADING fields are the sort keys
  *    picks exactly one row's worth of values atomically.
  *  - Struct comparison is lexicographic with null fields ordered
  *    FIRST — which coincides with Spark's window sort defaults
  *    (asc = nulls first ⇒ min(struct) picks the null-key row;
  *    desc = nulls last ⇒ max(struct) never picks it), so default
  *    null ordering is preserved for nullable sort keys.
  *  - When the sort-key tuple ties, row_number's winner is already
  *    partitioning-order-dependent (non-deterministic); the rewrite
  *    picks the struct-max row — a different but equally admissible
  *    member of the tie set.
  *
  * Gated (no rewrite) unless: the window has exactly one
  * ROW_NUMBER expression, the filter is `rn = 1` alone, partition
  * keys are plain attributes, and every sort key shares one
  * direction with its DEFAULT null ordering. Everything else keeps
  * its window plan.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * (SURVEY §7.4(c)) — the one place the engine adds optimizer
  * surface, because no built-in rule collapses windows to
  * aggregates.
  */
object CompactionRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
  }

  private def rnEqualsOne(cond: Expression): Option[ExprId] = cond match {
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) => Some(a.exprId)
    case EqualTo(Literal(1, IntegerType), a: AttributeReference) => Some(a.exprId)
    case _ => None
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    for {
      rnId <- rnEqualsOne(cond)
      alias <- w.windowExpressions match {
        case Seq(a: Alias) if a.exprId == rnId => Some(a)
        case _ => None
      }
      spec <- alias.child match {
        case WindowExpression(_: RowNumber, s: WindowSpecDefinition) => Some(s)
        case _ => None
      }
      groupKeys <- Option(w.partitionSpec).collect {
        case ps if ps.nonEmpty && ps.forall(_.isInstanceOf[AttributeReference]) =>
          ps.map(_.asInstanceOf[AttributeReference])
      }
      orders <- Option(w.orderSpec).filter(_.nonEmpty)
      // every field entering the struct must be ORDERABLE — struct
      // min/max compares the whole tuple, and e.g. a MapType payload
      // column (a changelog envelope's after/before maps) would make
      // the aggregate unresolvable. The window form never orders
      // payload columns, so it stays valid for those plans: keep it.
      _ <- {
        val structInputs = orders.map(_.child.dataType) ++
          w.child.output.filterNot(a =>
            groupKeys.exists(_.exprId == a.exprId)).map(_.dataType)
        if (structInputs.forall(RowOrdering.isOrderable)) Some(()) else None
      }
      // one direction across all keys, each with its DEFAULT null
      // ordering (what struct comparison reproduces)
      direction <- {
        val dirs = orders.map(_.direction).distinct
        val defaultNulls = orders.forall(o =>
          o.nullOrdering == o.direction.defaultNullOrdering)
        if (dirs.length == 1 && defaultNulls) Some(dirs.head) else None
      }
      // frame must be the one row_number implies (unbounded preceding
      // to current row); row_number's resolved frame always is, but a
      // user-specified incompatible frame fails analysis earlier.
    } yield {
      val child = w.child
      val groupIds = groupKeys.map(_.exprId).toSet
      val payload = child.output.filterNot(a => groupIds.contains(a.exprId))
      // struct = (sortKey1 … sortKeyN, payload…): leading sort keys
      // decide; payload fields break full ties arbitrarily (admissible
      // — see scaladoc)
      val fields = (orders.map(_.child) ++ payload).zipWithIndex.flatMap {
        case (e, i) => Seq(Literal(s"f$i"), e)
      }
      val structExpr = CreateNamedStruct(fields)
      val aggFn = direction match {
        case Ascending => Min(structExpr)
        case Descending => Max(structExpr)
      }
      val agg = AggregateExpression(aggFn, Complete, isDistinct = false)
      val nOrder = orders.length
      val outCols: Seq[NamedExpression] = child.output.map { a =>
        if (groupIds.contains(a.exprId)) a
        else {
          val idx = nOrder + payload.indexWhere(_.exprId == a.exprId)
          Alias(GetStructField(agg, idx), a.name)(exprId = a.exprId)
        }
      }
      // the rn column survives as the constant 1 it was filtered to,
      // under its original exprId, so ancestors referencing it stay
      // resolved and the output schema is unchanged
      val rnOut = Alias(Literal(1, IntegerType), alias.name)(exprId = alias.exprId)
      Aggregate(groupKeys, outCols :+ rnOut, child)
    }
  }
}
