package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql]` Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), which the public API
  * no longer exposes since the Spark Connect refactor. Lives in the
  * org.apache.spark.sql package solely to satisfy the access modifier —
  * the standard technique for Catalyst extension libraries. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The Column's FULL catalyst expression tree. Since the Connect
    * refactor the DSL builds `ColumnNode`s, and `expression` returns a
    * lazy `ColumnNodeExpression` shell whose children are invisible to
    * tree walks — this converts the node tree properly (DSL binary
    * comparisons arrive as `UnresolvedFunction(">=", ...)` etc.). */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** The analyzed logical plan of a DataFrame (for embedding as a child
    * of a custom LogicalPlan node). */
  def logicalPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** Wrap a LogicalPlan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
