package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column wraps a ColumnNode, and the converters
  * (classic.ExpressionUtils) are private[sql]. This shim lives in a
  * subpackage of org.apache.spark.sql purely to re-export the two
  * conversions graft's custom Catalyst expressions need. No Spark
  * internals are modified.
  */
object ColumnShim {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
