package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the Column <-> Expression converters, which Spark 4
  * keeps private[sql] (they were public `new Column(expr)` in Spark 3).
  * This is the sanctioned extension seam for libraries shipping custom
  * Catalyst expressions.
  */
object ExprShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
