package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into `private[sql]` Column ↔ Expression converters and the session
  * function registry, for graft's custom Catalyst expressions. Placing an
  * object inside `org.apache.spark.sql` is the standard extension pattern
  * for libraries that add native expressions (the public `Column` API stopped
  * exposing `expr` in Spark 4's Connect-compatible refactor). */
object GraftSql {

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom AggregateFunction as an aggregate Column (the
    * `toAggregateExpression` plumbing is catalyst-internal). */
  def aggregateColumn(
      agg: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction): Column =
    column(agg.toAggregateExpression())

  /** Raise a proper analysis error (the `String` ctor is `private[sql]`). */
  def analysisError(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "INTERNAL_ERROR", messageParameters = Map("message" -> msg))

  /** Expose a native expression under a SQL name (session-scoped). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder)
}
