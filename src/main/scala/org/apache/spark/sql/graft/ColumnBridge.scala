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
}
