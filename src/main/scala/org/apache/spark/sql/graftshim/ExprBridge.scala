package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x hides Column↔Expression conversion behind `private[sql]`
  * helpers; this shim lives under `org.apache.spark.sql` to reach them.
  * The only non-public Spark API the project touches.
  */
object ExprBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
