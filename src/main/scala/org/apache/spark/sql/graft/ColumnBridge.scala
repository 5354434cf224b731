package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed public `Column(expr)` / `col.expr`; the supported
  * bridge lives in `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is package-private. This shim (in the spark.sql namespace, the
  * conventional extension point) re-exports the two conversions the graft
  * expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `Dataset.ofRows` is likewise private[sql] in Spark 4 — the bridge
    * custom logical operators (graft.plans.ForwardFill) need to wrap a
    * plan back into a DataFrame. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
