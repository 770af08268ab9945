package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reference edge-case tests for the scalar string layer (SURVEY §2.9).
  * Each cited behavior comes from the reference implementation —
  * `Leyton_depot.py:140-145` (F2), `:458-470` (F6), `:497-515` (F5),
  * `:491-495` (F4), `fixed_signature_utils.py:116-124` (F3).
  */
class StringOpsSpec extends SparkSpec {
  import StringOps._

  // ------------------------------------------------------------- F2 fileExt
  test("fileExt returns the dotless extension for whitelisted suffixes, case-insensitively") {
    assert(evalStr(Seq("a.PDF", "b.jpg", "c.JpEg", "d.xlsx", "e.txt"))(fileExt) ===
      Seq("pdf", "jpg", "jpeg", "xlsx", "txt"))
  }

  test("fileExt returns empty for non-whitelisted or missing extensions (.zip is NOT whitelisted)") {
    assert(evalStr(Seq("a.zip", "noext", "a.pdf.bak", ""))(fileExt) === Seq("", "", "", ""))
  }

  test("fileExt on null name behaves like the reference's (name or '') -> ''") {
    assert(evalStr(Seq(null))(fileExt) === Seq(""))
  }

  // ------------------------------------------------------------- F5/F6 mime
  test("inferMime: explicit header wins, else extension map, else octet-stream") {
    assert(evalStr(Seq("x.pdf"))(n => inferMime(n, lit("image/png"))) === Seq("image/png"))
    assert(evalStr(Seq("x.pdf", "x.docx", "x.txt"))(n => inferMime(n, lit(null).cast("string"))) ===
      Seq("application/pdf",
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        "text/plain"))
    assert(evalStr(Seq("x.unknown"))(n => inferMime(n, lit(null).cast("string"))) ===
      Seq("application/octet-stream"))
  }

  test("extFromNameOrMime: dotted ext from name, else MIME map (image/jpeg -> .jpg), else .bin") {
    assert(evalStr(Seq("x.PDF"))(n => extFromNameOrMime(n, lit(null).cast("string"))) === Seq(".pdf"))
    assert(evalStr(Seq("noext"))(n => extFromNameOrMime(n, lit("image/jpeg"))) === Seq(".jpg"))
    assert(evalStr(Seq("noext"))(n => extFromNameOrMime(n, lit("text/plain"))) === Seq(".txt"))
    assert(evalStr(Seq("noext"))(n => extFromNameOrMime(n, lit("application/x-rar"))) === Seq(".bin"))
  }

  // ------------------------------------------------------------- F4 sanitize
  test("sanitizeName replaces forbidden drive characters and collapses whitespace") {
    assert(evalStr(Seq("""a/b:c*d?e"f<g>h|i\j""", "  a   b  "))(sanitizeName) ===
      Seq("a-b-c-d-e-f-g-h-i-j", "a b"))
  }

  // ------------------------------------------------------------- F3 signedFilename
  test("signedFilename inserts the suffix before .pdf") {
    assert(evalStr(Seq("report.pdf"))(n => signedFilename(n)) === Seq("report SIGNÉ.pdf"))
  }

  test("signedFilename appends suffix + .pdf when no .pdf extension") {
    assert(evalStr(Seq("report"))(n => signedFilename(n)) === Seq("report SIGNÉ.pdf"))
  }

  test("signedFilename with suffix already present (case-insensitive) keeps the name, ensuring .pdf") {
    assert(evalStr(Seq("report SIGNÉ.pdf", "report signé.pdf", "report SIGNÉ"))(n => signedFilename(n)) ===
      Seq("report SIGNÉ.pdf", "report signé.pdf", "report SIGNÉ.pdf"))
  }

  test("signedFilename strips surrounding whitespace first (reference .strip())") {
    assert(evalStr(Seq("  report.pdf  "))(n => signedFilename(n)) === Seq("report SIGNÉ.pdf"))
  }

  test("signedFilename is idempotent") {
    val once = evalStr(Seq("a.pdf", "b", "c SIGNÉ.pdf"))(n => signedFilename(n))
    val twice = evalStr(once)(n => signedFilename(n))
    assert(twice === once)
  }

  test("signedFilename dup check is case-insensitive but NOT accent-insensitive (reference parity)") {
    // "SIGNE" (no accent) does not contain "SIGNÉ" -> suffix is added again.
    assert(evalStr(Seq("report SIGNE.pdf"))(n => signedFilename(n)) === Seq("report SIGNE SIGNÉ.pdf"))
  }

  // ------------------------------------------------------------- F7/F10/A1
  test("actFolderName uppercases and underscores the client name") {
    import spark.implicits._
    val r = Seq((7L, "Ana María López")).toDF("id", "name")
      .select(actFolderName(col("id"), col("name")).as("r")).head.getString(0)
    assert(r === "ACT_7_ANA_MARÍA_LÓPEZ")
  }

  test("lotName zero-pads to two digits") {
    assert(evalStr(Seq.empty[String])(identity) === Seq.empty) // keep evalStr happy elsewhere
    import spark.implicits._
    val r = Seq(3, 12).toDF("n").select(lotName(col("n")).as("r")).collect().map(_.getString(0))
    assert(r === Array("CLM_GE_03", "CLM_GE_12"))
  }

  test("actId extracts the ACT_ number, null otherwise") {
    import spark.implicits._
    val r = Seq("ACT_41_X", "ACT_X_1", "foo").toDF("s")
      .select(actId(col("s")).as("r")).collect().map(x => if (x.isNullAt(0)) null else x.getLong(0))
    assert(r === Array(41L, null, null))
  }

  test("nextActId on empty / non-matching input is 1 (reference Leyton_depot.py:543-545)") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("name").agg(nextActId(col("name")).as("r")).head.getLong(0)
    val noMatch = Seq("a", "b").toDF("name").agg(nextActId(col("name")).as("r")).head.getLong(0)
    val some = Seq("ACT_4_A", "ACT_9_B", "x").toDF("name").agg(nextActId(col("name")).as("r")).head.getLong(0)
    assert(empty === 1L)
    assert(noMatch === 1L)
    assert(some === 10L)
  }

  test("escapeForQ escapes single quotes with a backslash (F8)") {
    assert(evalStr(Seq("it's a 'test'", "plain"))(escapeForQ) ===
      Seq("""it\'s a \'test\'""", "plain"))
  }

  test("stampText formats the signer + timestamp template (F13)") {
    import spark.implicits._
    val r = Seq(("Ana", java.sql.Timestamp.valueOf("2026-02-03 10:11:12")))
      .toDF("signer", "ts")
      .select(stampText(col("signer"), col("ts")).as("r")).head.getString(0)
    assert(r === "Firmado por: Ana\nFecha: 2026-02-03 10:11:12")
  }

  test("itemNameOr falls back to ITEM_{id}") {
    import spark.implicits._
    val r = Seq((Option.empty[String], 5L), (Some("n"), 6L)).toDF("name", "id")
      .select(itemNameOr(col("name"), col("id")).as("r")).collect().map(_.getString(0))
    assert(r === Array("ITEM_5", "n"))
  }
}
