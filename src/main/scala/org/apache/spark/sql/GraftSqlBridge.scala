package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` column/expression conversions — the
  * supported seam for third-party Catalyst expressions (Spark's own
  * extension libraries use the same package-placement technique). */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Lift a one-row, one-column DataFrame into a scalar-subquery
    * expression — the form expressions like `BloomFilterMightContain`
    * demand for their sketch input (executed once, result shared by
    * every probing task; the same shape Spark's InjectRuntimeFilter
    * emits). */
  def scalarSubquery(df: Dataset[_]): Column =
    column(catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[classic.Dataset[_]].logicalPlan))
}
