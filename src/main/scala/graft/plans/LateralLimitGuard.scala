package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, Expression, OuterReference}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LateralJoin, LocalLimit, LogicalPlan}

/** Fail-loud guard for a Spark 4.1 wrong-results hazard (verified on
  * 4.1.2 with a 5-row repro): a correlated LATERAL subquery with
  * ORDER BY ... LIMIT whose correlated equality is TYPE-COERCED —
  * e.g. an int key matched against a bigint outer key, so analysis
  * wraps one side in a Cast:
  *
  * {{{
  * SELECT ... FROM outer o,
  * LATERAL (SELECT ... FROM inner i WHERE i.k = o.k   -- i.k int, o.k bigint
  *          ORDER BY s DESC LIMIT 2) i
  * }}}
  *
  * Decorrelation then silently DROPS the correlation and applies the
  * LIMIT globally: the optimized plan is an uncorrelated
  * `GlobalLimit 2` joined back to the outer table — the "top-2 per
  * outer row" query answers "first 2 rows of the table". With
  * matching key types the same query decorrelates correctly into the
  * per-key `WindowGroupLimit` plan.
  *
  * The hazard is NOT limited to coercion-inserted casts. All three
  * cast placements were tested on the 5-row repro (Spark 4.1.2) and
  * all three return the global top-1 instead of top-1 per key:
  * implicit coercion (`i.k = o.k`, mismatched types), an explicit
  * outer-side cast (`i.k = CAST(o.k AS INT)`), and an explicit
  * inner-side cast (`CAST(i.k AS BIGINT) = o.k`). The only
  * remediation that decorrelates correctly is moving the cast OUT of
  * the correlated equality — pre-cast the key in a derived table
  * (`FROM (SELECT CAST(k AS INT) AS k, ... FROM outer_tbl) o`), so
  * the equality itself is cast-free (spec-verified to return the
  * per-key answer). Exempting user-tagged casts
  * (Cast.USER_SPECIFIED_CAST) was considered and rejected: it would
  * wave the wrong-results plan through.
  *
  * Upstream: a prepared Apache JIRA report (full public-API repro +
  * plan analysis) is at `docs/spark-lateral-limit-bug-report.md` —
  * file it when a connected machine is available and link the issue
  * id here; this guard retires when the fix ships.
  *
  * An engine whose contract is oracle-exact answers must never let a
  * plan that returns wrong DATA through silently, so this analysis
  * check rule rejects exactly the hazardous shape — a LateralJoin
  * whose subquery contains a Limit AND a correlated equality with a
  * Cast on either side — with a message prescribing the derived-table
  * rewrite. Queries with matching key types, or without a LIMIT, are
  * untouched.
  */
object LateralLimitGuard extends (LogicalPlan => Unit) {

  override def apply(plan: LogicalPlan): Unit = plan.foreach {
    case lj: LateralJoin =>
      val sub = lj.right.plan
      val limited = sub.exists {
        case _: GlobalLimit | _: LocalLimit => true
        case _ => false
      }
      lazy val coercedCorrelation =
        sub.exists(_.expressions.exists(_.exists {
          case EqualTo(l, r) if hasOuter(l) || hasOuter(r) =>
            l.isInstanceOf[Cast] || r.isInstanceOf[Cast]
          case _ => false
        }))
      if (limited && coercedCorrelation) {
        throw new SparkException(
          "LATERAL subquery with LIMIT correlates on an equality " +
            "with a Cast on one side — Spark's decorrelation " +
            "silently drops the correlation and applies the LIMIT " +
            "globally, returning wrong results. This happens whether " +
            "the cast was inserted by type coercion or written " +
            "explicitly (both verified wrong on Spark 4.1.2). Fix: " +
            "pre-cast the key in a derived table so the correlated " +
            "equality itself is cast-free — e.g. FROM (SELECT " +
            "CAST(k AS <inner type>) AS k, ... FROM outer_tbl) o — " +
            "or align the table schemas.")
      }
    case _ => ()
  }

  private def hasOuter(e: Expression): Boolean =
    e.exists(_.isInstanceOf[OuterReference])
}
