package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Generic expression combinators. */
object Exprs {

  /** Catalyst "let": bind `c` ONCE per row as a lambda variable
    * (`transform` over a one-element array) and build the result
    * from the bound reference.
    *
    * Why it exists: expression trees have no common-subexpression
    * elimination inside higher-order functions, so a sub-expression
    * referenced n times is EVALUATED n times per row. Inlining a
    * regex split into shingle construction cost ~3·|shingles|
    * re-splits (measured 7-20×); inlining a max-abs fold into int8
    * quantization cost 2·d re-folds (~5×). Any multi-reference
    * non-trivial sub-expression should come through here.
    */
  def bind(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)
}
