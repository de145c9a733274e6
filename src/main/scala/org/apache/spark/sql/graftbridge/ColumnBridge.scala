package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression conversion for custom Catalyst expressions.
  *
  * Spark 4 moved `Column` to a plan-agnostic representation; the classic
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`) are
  * `private[sql]`, so this one-file bridge lives under the sql package to
  * re-export exactly the two conversions our expressions need. Public Spark
  * API only — no internal behavior is altered.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
