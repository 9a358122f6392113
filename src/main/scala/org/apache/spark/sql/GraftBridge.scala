package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4's Column no longer wraps an Expression directly; the
  * conversion lives in `classic.ExpressionUtils`, which is private[sql].
  * This shim re-exports the two conversions from inside the sql package —
  * the minimal, conventional unlock for libraries that ship their own
  * codegen'd expressions without forking Spark.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
