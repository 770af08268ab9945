package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unaccent + lowercase + collapse-whitespace string normalization.
  *
  * Mirrors the reference's `_norm` (reference `Leyton_depot.py:133-138`):
  * NFD-decompose, strip combining marks, lowercase, collapse runs of
  * whitespace to one space, trim; null behaves like the reference's
  * `None -> ""` only at the call sites that need it — the expression
  * itself is null-preserving so it composes with Spark's null semantics.
  *
  * Implemented as a native Catalyst [[Expression]] with `doGenCode` so it
  * participates in whole-stage codegen (a Scala UDF would break the
  * codegen span and box every row). The hot static method is JIT-friendly:
  * one pass for the common pre-normalized ASCII case, slow path otherwise.
  */
object NormalizeString {
  /** Fast check: lowercase ASCII with single interior spaces needs no work. */
  private def isCanonical(s: String): Boolean = {
    var i = 0
    val n = s.length
    var prevSpace = true // leading space is non-canonical
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 128 || (c >= 'A' && c <= 'Z')) return false
      if (Character.isWhitespace(c)) {
        if (c != ' ' || prevSpace) return false
        prevSpace = true
      } else prevSpace = false
      i += 1
    }
    // trailing space is non-canonical
    n == 0 || !Character.isWhitespace(s.charAt(n - 1))
  }

  private def hasNonAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 128) return true
      i += 1
    }
    false
  }

  def normalize(s: String): String = {
    if (isCanonical(s)) return s
    // ASCII is NFD-invariant: skip the (expensive) decomposition unless
    // the string actually contains non-ASCII chars.
    val decomposed =
      if (hasNonAscii(s)) java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      else s
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    var pendingSpace = false
    while (i < decomposed.length) {
      val c = decomposed.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) {
        if (Character.isWhitespace(c)) pendingSpace = sb.length() > 0
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(Character.toLowerCase(c))
        }
      }
      i += 1
    }
    sb.toString
  }

  /** Byte-level canonical check: already-normalized ASCII needs NO
    * String round-trip at all — the UTF8String passes through untouched
    * (zero allocations on the common path).
    */
  private def isCanonicalUtf8(s: UTF8String): Boolean = {
    val n = s.numBytes
    var prevSpace = true // leading space is non-canonical
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b < 0) return false // non-ASCII → slow path
      val c = b.toChar
      if (c >= 'A' && c <= 'Z') return false
      if (c == ' ') {
        if (prevSpace) return false
        prevSpace = true
      } else if (Character.isWhitespace(c)) return false // tab/CR/LF etc.
      else prevSpace = false
      i += 1
    }
    n == 0 || s.getByte(n - 1) != ' '.toByte
  }

  /** Entry point the generated code calls (UTF8String in/out, no boxing). */
  def normalizeUtf8(s: UTF8String): UTF8String =
    if (isCanonicalUtf8(s)) s
    else UTF8String.fromString(normalize(s.toString))
}

case class NormalizeStringExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    NormalizeString.normalizeUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeString.normalizeUtf8($c)")
  override protected def withNewChildInternal(c: Expression): NormalizeStringExpr = copy(c)
  override def prettyName: String = "norm_str"
}

object Normalize {
  /** Column-level normalize: `norm($"p_name")`. */
  def norm(c: Column): Column = GraftExpr.toColumn(NormalizeStringExpr(GraftExpr.toExpr(c)))
}

/** Optimizer rule: `norm` is idempotent, so nested applications collapse
  * to one — composed pipelines (e.g. pre-normalized rule keywords fed
  * back through RuleCascade's broadcast-side `transform(norm)`) pay for
  * the normalization once. Injected via [[GraftExtensions]]
  * (`injectOptimizerRule`); literals need no rule — the expression is
  * foldable, so ConstantFolding already evaluates them at plan time.
  */
object NormIdempotence
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case NormalizeStringExpr(inner @ NormalizeStringExpr(_)) => inner
    }
}
