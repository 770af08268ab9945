package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x hides the Column↔Expression conversion behind the `classic`
  * conversions; centralizing it here keeps the rest of the codebase
  * version-agnostic.
  */
object GraftExpr {
  def toExpr(c: Column): Expression = org.apache.spark.sql.graftshim.ExprBridge.toExpr(c)
  def toColumn(e: Expression): Column = org.apache.spark.sql.graftshim.ExprBridge.toColumn(e)
}
