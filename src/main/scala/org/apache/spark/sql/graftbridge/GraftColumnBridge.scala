package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge.
  *
  * Spark 4 made `Column` wrap a connect-compatible `ColumnNode`; the
  * classic converter (`org.apache.spark.sql.classic.ExpressionUtils`)
  * is `private[sql]`, so a library that builds expressions the
  * function registry cannot express — here the broadcast-backed model
  * kernels ([[graft.functions.BroadcastScoreExpr]]), whose model
  * handle is a non-Expression constructor field — needs this one
  * in-package accessor (the established extension-library pattern;
  * everything used is Apache Spark public source). Kept to the two
  * minimal signatures so the private surface this touches stays
  * auditable.
  */
object GraftColumnBridge {

  /** Wrap a catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its catalyst expression (unresolved is fine —
    * the analyzer resolves children once the Column enters a plan). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
