package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants (SURVEY §5.3). The pure-JVM `norm`
  * properties run at full sample counts; Column-level ones batch many
  * generated strings into one Spark job per sample to stay fast.
  */
object StringProps extends Properties("graft.strings") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkTestSession.session

  private def evalBatch(inputs: List[String])(f: Column => Column): Seq[String] = {
    import spark.implicits._
    inputs.toDF("s").select(f(col("s")).as("r")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  private val anyStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.listOf(Gen.oneOf("Café", "NOËL", "  ", "\t", "a/b", "*", "x.PDF", "SIGNÉ", "ñ", "doc", "?"))
      .map(_.mkString(" ")))

  property("norm is idempotent") = Prop.forAll(anyStr) { s =>
    val once = NormalizeString.normalize(s)
    NormalizeString.normalize(once) == once
  }

  property("norm output: lowercase, no combining marks, single interior spaces, trimmed") =
    Prop.forAll(anyStr) { s =>
      val n = NormalizeString.normalize(s)
      !n.exists(_.isUpper) && !n.contains("  ") && n == n.trim &&
        !n.exists(c => Character.getType(c) == Character.NON_SPACING_MARK)
    }

  property("sanitizeName never emits forbidden drive characters") =
    Prop.forAll(Gen.listOfN(30, anyStr)) { in =>
      val out = evalBatch(in)(StringOps.sanitizeName)
      out.forall(s => s == null || !s.exists("\\/:*?\"<>|".contains(_)))
    }

  property("signedFilename always ends in .pdf; idempotent on non-blank names") =
    // Blank names are NOT idempotent ("" -> " SIGNÉ.pdf" -> "SIGNÉ SIGNÉ.pdf")
    // — faithful to the reference, which strips then prepends " SIGNÉ" too
    // (fixed_signature_utils.py:116-124).
    Prop.forAll(Gen.listOfN(30, anyStr)) { in0 =>
      val in = in0.map(s => if (s.trim.isEmpty) "doc" else s)
      val once = evalBatch(in)(n => StringOps.signedFilename(n))
      val twice = evalBatch(once.toList)(n => StringOps.signedFilename(n))
      once.zip(twice).forall { case (a, b) => a.toLowerCase.endsWith(".pdf") && b == a }
    }

  property("fileExt is always dotless and from the whitelist (or empty)") =
    Prop.forAll(Gen.listOfN(30, anyStr)) { in =>
      val out = evalBatch(in)(StringOps.fileExt)
      val allowed = StringOps.KnownExts.map(_.drop(1)).toSet + ""
      out.forall(allowed.contains)
    }

  // suffix fragments that stress the byte fast path: plain, uppercase,
  // and the Unicode chars that LOWERCASE into ASCII (ſ→s, K→k)
  private val extStress: Gen[String] = for {
    base <- anyStr
    tail <- Gen.oneOf(".pdf", ".PDF", ".xls", ".xlſ", ".txt", ".TXT", ".xlsx",
      "K.pdf", ".jpeg", ".JPeG", ".zip", "", ".pdſ", ".doc", ".docx")
  } yield base + tail

  property("native sanitizeName equals the two-regex model") =
    Prop.forAll(Gen.listOfN(30, anyStr)) { in =>
      val model = evalBatch(in)(n =>
        trim(regexp_replace(regexp_replace(n, """[\\/:*?"<>|]""", "-"), """\s+""", " ")))
      val native = in.map(SanitizeName.sanitize)
      model == native
    }

  property("native fileExt equals the lower().endsWith() model, incl. Unicode folds") =
    Prop.forAll(extStress) { s =>
      val model = StringOps.KnownExts.find(e => s.toLowerCase.endsWith(e))
        .map(_.drop(1)).getOrElse("")
      FileExt.eval(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString == model
    }
}
