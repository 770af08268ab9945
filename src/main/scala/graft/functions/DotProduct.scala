package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The compiled fold the expression (interpreted AND generated paths)
  * calls: identical left-to-right 0.0-seeded accumulation to the
  * `aggregate` HOF it replaces, so doubles are bit-equal and every
  * DuckDB oracle twin (`Hashing.dotFoldSql`) still matches. Returns
  * null (boxed) when any touched element is null — the HOF's
  * null-propagation contract.
  */
object DotProduct {
  def dotOrNull(a: ArrayData, b: ArrayData, dim: Int): java.lang.Double = {
    if (a.numElements() < dim || b.numElements() < dim)
      throw new IllegalArgumentException(
        s"dot_fold($dim) over arrays of ${a.numElements()}/${b.numElements()} elements")
    var acc = 0.0
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Native dot product over the first `dim` elements of two
  * `array<double>` columns — the ANN hot path (`Hashing.dotFold`) as a
  * real Catalyst expression instead of the `aggregate` HOF.
  *
  * Why: HOF lambdas are interpreted per ELEMENT (one virtual eval per
  * term), and nesting them (a fold inside a `transform` over centroids)
  * multiplies that overhead. This expression runs one JIT-compiled
  * `while` loop per CALL — inside whole-stage codegen it is a single
  * static call, and even inside an outer HOF lambda its interpreted
  * eval is the same compiled loop. The flat expanded sum alternative
  * was 2× worse (64 inlined null-checked terms per dot blow generated
  * method sizes); this keeps generated code O(1) per dot.
  *
  * Semantics preserved from the HOF exactly: left-to-right 0.0-seeded
  * fold (bit-identical doubles), null when either array or any touched
  * element is null, error when an array is shorter than `dim` (the
  * HOF's ANSI `element_at` would have thrown there too).
  */
case class DotProductExpr(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  require(dim > 0, s"dim must be positive, got $dim")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dot")
      s"""
         |java.lang.Double $r = graft.functions.DotProduct.dotOrNull($a, $b, $dim);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
  override def prettyName: String = "dot_fold"
}

object DotProductCol {
  /** Column-level entry: `dot(a, b, dim)`. */
  def dot(a: Column, b: Column, dim: Int): Column =
    GraftExpr.toColumn(DotProductExpr(GraftExpr.toExpr(a), GraftExpr.toExpr(b), dim))
}
