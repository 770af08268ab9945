package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F4 `_sanitize_drive_name` as ONE pass instead of two regex engines:
  * forbidden drive characters map to '-', whitespace runs collapse to a
  * single interior space, leading/trailing whitespace drops. Whitespace
  * is the regex `\s` set exactly (space, tab, LF, VT, FF, CR) — NOT
  * `Character.isWhitespace`, which also matches U+2028 etc. and would
  * silently diverge from the `regexp_replace(\s+)` model the oracle
  * mirrors. Upload names run through this for every output row.
  */
object SanitizeName {
  private val Forbidden = "\\/:*?\"<>|"

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def sanitize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c0 = s.charAt(i)
      val c = if (Forbidden.indexOf(c0.toInt) >= 0) '-' else c0
      if (isWs(c)) pendingSpace = sb.length() > 0 // collapse + drop leading
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    } // trailing run never flushes
    sb.toString
  }

  def sanitizeUtf8(s: UTF8String): UTF8String = UTF8String.fromString(sanitize(s.toString))
}

case class SanitizeNameExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    SanitizeName.sanitizeUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SanitizeName.sanitizeUtf8($c)")
  override protected def withNewChildInternal(c: Expression): SanitizeNameExpr = copy(c)
  override def prettyName: String = "sanitize_name"
}
