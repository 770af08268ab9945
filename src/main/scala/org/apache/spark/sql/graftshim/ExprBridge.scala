package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Spark 4.x hides Column↔Expression conversion behind `private[sql]`
  * helpers; this shim lives under `org.apache.spark.sql` to reach them.
  * The only non-public Spark API the project touches.
  *
  * `toExpr` converts EAGERLY via the ColumnNode converter: the lazy
  * `ExpressionUtils.expression` wrapper stays an Unevaluable
  * `ColumnNodeExpression` unless a Dataset API boundary resolves it,
  * which never happens for expressions handed straight to the
  * function registry.
  */
object ExprBridge {
  def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
