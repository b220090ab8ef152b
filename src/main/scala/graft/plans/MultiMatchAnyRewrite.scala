package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{MultiMatch, MultiMatchAny}

/** Optimizer rule: a `multi_match` used only as an ANY-match test
  *
  * {{{ size(multi_match(text, pats)) > 0    // and =/>=/!= spellings }}}
  *
  * rewrites to the early-exiting boolean form
  *
  * {{{ multi_match_any(text, pats)          // (negated as needed) }}}
  *
  * `multi_match` must finish the text to ENUMERATE every matching
  * pattern; an existence test discards that enumeration, so paying
  * for it is pure waste — `multi_match_any` stops at the first
  * automaton hit (for a blocklist filter over mostly-blocked text,
  * that is the difference between scanning every byte and stopping
  * at the first offending phrase). Users write the obvious
  * `size(...) > 0`; the rule gives them the operator they meant.
  *
  * Null semantics are preserved exactly under `size(NULL) = NULL`
  * (the effective default — ANSI mode forces it): both sides are
  * null iff `text` is null, in filters AND projections. Under
  * legacy size-of-null (`size(NULL)` = -1) a projected `s > 0`
  * would be FALSE where `multi_match_any` is NULL — so the match is
  * on the `Size` node's OWN `legacySizeOfNull = false` field (the
  * expression carries its semantics; reading the raw conf would get
  * the ANSI interaction wrong, as the spec's first draft proved).
  *
  * Covered shapes (s = size(multi_match(t, p)), all literals int):
  *   - `s > 0`, `s >= 1`, `s != 0`  →  multi_match_any(t, p)
  *   - `s = 0`, `s < 1`, `s <= 0`   →  NOT multi_match_any(t, p)
  */
object MultiMatchAnyRewrite extends Rule[LogicalPlan] {

  private object SizeOfMultiMatch {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Size(MultiMatch(t, p), false) => Some((t, p))
      case _ => None
    }
  }

  private def lit0(e: Expression): Boolean = e match {
    case Literal(0, _) => true
    case _ => false
  }
  private def lit1(e: Expression): Boolean = e match {
    case Literal(1, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // positive: at least one match
      case GreaterThan(SizeOfMultiMatch(t, p), z) if lit0(z) =>
        MultiMatchAny(t, p)
      case GreaterThanOrEqual(SizeOfMultiMatch(t, p), o) if lit1(o) =>
        MultiMatchAny(t, p)
      case LessThan(z, SizeOfMultiMatch(t, p)) if lit0(z) =>
        MultiMatchAny(t, p)
      case Not(EqualTo(SizeOfMultiMatch(t, p), z)) if lit0(z) =>
        MultiMatchAny(t, p)
      case Not(EqualTo(z, SizeOfMultiMatch(t, p))) if lit0(z) =>
        MultiMatchAny(t, p)
      // negative: no match at all
      case EqualTo(SizeOfMultiMatch(t, p), z) if lit0(z) =>
        Not(MultiMatchAny(t, p))
      case EqualTo(z, SizeOfMultiMatch(t, p)) if lit0(z) =>
        Not(MultiMatchAny(t, p))
      case LessThan(SizeOfMultiMatch(t, p), o) if lit1(o) =>
        Not(MultiMatchAny(t, p))
      case LessThanOrEqual(SizeOfMultiMatch(t, p), z) if lit0(z) =>
        Not(MultiMatchAny(t, p))
    }
}
