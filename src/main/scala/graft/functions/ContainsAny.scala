package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled needle scan with `exists`-HOF three-valued semantics:
  * true if any needle is contained, else null if any needle was null,
  * else false. One loop over the (tiny) needle array per call, byte-level
  * UTF8String.contains — no per-element lambda interpretation.
  */
object ContainsAny {
  def containsAnyOrNull(haystack: UTF8String, needles: ArrayData): java.lang.Boolean = {
    val n = needles.numElements()
    var sawNull = false
    var i = 0
    while (i < n) {
      if (needles.isNullAt(i)) sawNull = true
      else if (haystack.contains(needles.getUTF8String(i))) return java.lang.Boolean.TRUE
      i += 1
    }
    if (sawNull) null else java.lang.Boolean.FALSE
  }
}

/** `exists(needles, k => contains(haystack, k))` as a native expression —
  * the RuleCascade keyword-match hot path runs this twice per
  * (pool row × rule) candidate, and the HOF form pays one interpreted
  * lambda eval per needle there (see the round-2 HOF lesson in
  * Hashing.dotFold's scaladoc — same trade, string edition).
  */
case class ContainsAnyExpr(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, ArrayType(StringType))
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullSafeEval(h: Any, ns: Any): Any =
    ContainsAny.containsAnyOrNull(h.asInstanceOf[UTF8String], ns.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, ns) => {
      val r = ctx.freshName("ca")
      s"""
         |java.lang.Boolean $r = graft.functions.ContainsAny.containsAnyOrNull($h, $ns);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.booleanValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ContainsAnyExpr =
    copy(left = l, right = r)
  override def prettyName: String = "contains_any"
}

object ContainsAnyCol {
  /** Column-level entry: true iff `haystack` contains ANY of `needles`. */
  def containsAny(haystack: Column, needles: Column): Column =
    GraftExpr.toColumn(ContainsAnyExpr(GraftExpr.toExpr(haystack), GraftExpr.toExpr(needles)))
}
