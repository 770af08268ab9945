package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F2 `_file_ext` as a single-pass native expression: byte-level
  * case-insensitive suffix match against the 9-extension whitelist,
  * returning the dotless extension or "".
  *
  * The `when(lower(name).endsWith(...))`-chain equivalent evaluates
  * `lower(name)` (a full-string allocation) inside conditional branches,
  * where whole-stage codegen's subexpression elimination does not reach;
  * this expression allocates NOTHING on any path — suffix bytes are
  * compared in place with ASCII case folding (extension bytes are all
  * ASCII; a UTF-8 continuation byte can never equal one, so multibyte
  * chars in suffix position simply fail the match, exactly like
  * `lower().endsWith()`), and the returned UTF8Strings are cached
  * constants.
  */
object FileExt {
  private val exts: Array[Array[Byte]] =
    StringOps.KnownExts.map(_.getBytes("UTF-8")).toArray
  private val outs: Array[UTF8String] =
    StringOps.KnownExts.map(e => UTF8String.fromString(e.drop(1))).toArray
  private val empty = UTF8String.fromString("")

  def eval(name: UTF8String): UTF8String = {
    val n = name.numBytes
    // Unicode edge: a few non-ASCII chars LOWERCASE to ASCII (ſ→s,
    // K→k), so byte-folding would miss e.g. "a.xlſ" where
    // lower().endsWith(".xls") matches. Any non-ASCII byte near the
    // suffix (longest ext = 5 chars; 2 bytes each is enough) routes to
    // the exact Unicode slow path.
    var j = math.max(0, n - 10)
    while (j < n) {
      if (name.getByte(j) < 0) return evalUnicode(name)
      j += 1
    }
    var e = 0
    while (e < exts.length) {
      val ext = exts(e)
      if (n >= ext.length) {
        var i = 0
        var ok = true
        while (ok && i < ext.length) {
          var b = name.getByte(n - ext.length + i)
          if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
          if (b != ext(i)) ok = false
          i += 1
        }
        if (ok) return outs(e)
      }
      e += 1
    }
    empty
  }

  private def evalUnicode(name: UTF8String): UTF8String = {
    val lower = name.toString.toLowerCase
    var e = 0
    while (e < exts.length) {
      if (lower.endsWith(StringOps.KnownExts(e))) return outs(e)
      e += 1
    }
    empty
  }
}

case class FileExtExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = FileExt.eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FileExt.eval($c)")
  override protected def withNewChildInternal(c: Expression): FileExtExpr = copy(c)
  override def prettyName: String = "file_ext"
}
