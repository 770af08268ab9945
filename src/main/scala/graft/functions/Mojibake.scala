package graft.functions

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the ftfy-style fix for the most common encoding
  * damage in crawl corpora: UTF-8 bytes mis-decoded as Windows-1252/
  * Latin-1 somewhere upstream ("café" arriving as "cafÃ©", "’" as
  * "â€™"). The repair inverts exactly that damage and nothing else:
  *
  *   re-encode the text as STRICT Windows-1252 (superset of Latin-1's
  *   printable range — covers the €/™/œ-style marks real cp1252
  *   mis-decodes produce); if the bytes then decode as STRICT UTF-8 to
  *   something different, the text was double-encoded — take the
  *   decode. Up to two passes (doubly-damaged text exists), then fixed
  *   point.
  *
  * Why it is safe: genuine Latin-text high bytes (a lone "é") are not
  * valid UTF-8 sequences, so strict UTF-8 decoding fails and the text
  * passes through untouched; a false positive requires genuine text
  * whose chars are all cp1252-encodable AND happen to spell valid
  * multi-byte UTF-8 — the "Ã©"-class letter pairs no natural text
  * uses. Total, never throws; null in → null out.
  */
object Mojibake {

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  private def repairOnce(s: String): String = {
    // fast reject: repair needs at least one high char
    var hasHigh = false
    var i = 0
    while (i < s.length && !hasHigh) { if (s.charAt(i) >= 0x80) hasHigh = true; i += 1 }
    if (!hasHigh) return null
    try {
      val enc = Cp1252.newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val bytes = enc.encode(java.nio.CharBuffer.wrap(s))
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(bytes).toString
      if (dec == s) null else dec
    } catch { case _: Exception => null }
  }

  /** Repaired text, or the input unchanged when no damage is detected. */
  def fix(s: String): String = {
    if (s == null) return null
    var cur = s
    var pass = 0
    while (pass < 2) {
      val fixed = repairOnce(cur)
      if (fixed == null) return cur
      cur = fixed
      pass += 1
    }
    cur
  }

  def fixUtf8(s: UTF8String): UTF8String = {
    val in = s.toString
    val out = fix(in)
    if (out eq in) s else UTF8String.fromString(out)
  }

  def fixMojibake(c: Column): Column =
    GraftExpr.toColumn(FixMojibakeExpr(GraftExpr.toExpr(c)))
}

/** Codegen'd mojibake repair; identity on undamaged text. */
case class FixMojibakeExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = Mojibake.fixUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mojibake.fixUtf8($c)")
  override protected def withNewChildInternal(c: Expression): FixMojibakeExpr = copy(child = c)
  override def prettyName: String = "fix_mojibake"
}
