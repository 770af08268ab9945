package graft.functions

import graft.SparkSpec
import graft.functions.Normalize.norm

/** F1 `_norm` parity with the reference (`Leyton_depot.py:133-138`):
  * NFD-unaccent, lowercase, collapse/trim whitespace.
  */
class NormalizeSpec extends SparkSpec {

  test("norm unaccents, lowercases and collapses whitespace") {
    assert(evalStr(Seq("  Café  NOËL  ", "ÀÉÎÕÜ", "a\t\nb"))(norm) ===
      Seq("cafe noel", "aeiou", "a b"))
  }

  test("norm is identity on already-canonical strings") {
    assert(evalStr(Seq("abc def", "", "x"))(norm) === Seq("abc def", "", "x"))
  }

  test("norm is null-preserving as an expression (call sites coalesce to '')") {
    assert(evalStr(Seq(null))(norm) === Seq(null))
  }

  test("norm is idempotent") {
    val in = Seq("  Ça VA  très Bien ", "ẞß", "ñandú  ÑANDÚ", "á combining")
    val once = evalStr(in)(norm)
    assert(evalStr(once)(norm) === once)
  }

  test("norm JVM-side matches the reference on mixed samples") {
    // Same algorithm the codegen expression calls.
    assert(NormalizeString.normalize("Documento SCANNÉ ") === "documento scanne")
    assert(NormalizeString.normalize("E1-3-4 INFORME FOTOGRÁFICO") === "e1-3-4 informe fotografico")
  }
}
