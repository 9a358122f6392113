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

  /** Catalyst conjunct → v1 Filter, via the SAME translation the scan
    * pushdown path uses (`DataSourceStrategy.translateFilter` is
    * protected[sql]) — graft's DML manifest pruning must never invent a
    * second, subtly-different translation. */
  def translateFilter(e: Expression): Option[sources.Filter] =
    execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)

  /** Spark's own distributed Bloom-filter sketch builder
    * (`BloomFilterAggregate`, the TypedImperativeAggregate the engine's
    * runtime-filter optimization plants) exposed as a Column aggregate —
    * input must be LongType; result is the serialized filter bytes. */
  def bloomAggregate(child: Column, estimatedNumItems: Long): Column =
    column(new catalyst.expressions.aggregate.BloomFilterAggregate(
      expression(child), estimatedNumItems).toAggregateExpression())

  /** Membership probe against a serialized Bloom filter
    * (`BloomFilterMightContain`, codegen'd; value must be LongType). */
  def bloomMightContain(bloom: Column, value: Column): Column =
    column(new catalyst.expressions.BloomFilterMightContain(
      expression(bloom), expression(value)))

  /** Register a function triple on a live session's registry (the
    * post-build equivalent of SparkSessionExtensions.injectFunction). */
  def registerFunction(
      spark: SparkSession,
      fn: (org.apache.spark.sql.catalyst.FunctionIdentifier,
           org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
           Seq[Expression] => Expression)): Unit =
    spark.sessionState.functionRegistry.registerFunction(fn._1, fn._2, fn._3)
}
