package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level scalar functions mirroring the reference's string helpers
  * (SURVEY.md §2.9). All are compositions of built-in, codegen'd Spark
  * functions — no UDFs — so they inline into whole-stage codegen and stay
  * cheap at 100 TB scan width.
  */
object StringOps {

  /** Known extensions, reference order (`Leyton_depot.py:140-145`): the
    * suffixes are mutually exclusive so order only mirrors the source.
    */
  val KnownExts: Seq[String] =
    Seq(".pdf", ".jpg", ".jpeg", ".png", ".xlsx", ".xls", ".docx", ".doc", ".txt")

  /** F2 `_file_ext`: suffix match against the whitelist, returned
    * WITHOUT the dot (`ext[1:]` in the reference), else "". Native
    * single-pass expression ([[FileExtExpr]]); the coalesce preserves
    * the reference's `(name or '') -> ''` null behavior.
    */
  def fileExt(name: Column): Column =
    coalesce(GraftExpr.toColumn(FileExtExpr(GraftExpr.toExpr(name))), lit(""))

  /** Dotted extension from the same whitelist, null when unknown —
    * the name-derived half of F5 (`Leyton_depot.py:497-503` keeps the
    * dot, unlike F2).
    */
  def extWithDot(name: Column): Column = {
    val lower0 = lower(name)
    KnownExts.foldRight(lit(null).cast("string")) { (ext, acc) =>
      when(lower0.endsWith(ext), lit(ext)).otherwise(acc)
    }
  }

  /** Extension → MIME (reference `Leyton_depot.py:458-470`, `:504-513`). */
  val ExtToMime: Seq[(String, String)] = Seq(
    ".pdf" -> "application/pdf",
    ".jpg" -> "image/jpeg",
    ".jpeg" -> "image/jpeg",
    ".png" -> "image/png",
    ".xlsx" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    ".xls" -> "application/vnd.ms-excel",
    ".docx" -> "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ".doc" -> "application/msword",
    ".txt" -> "text/plain")

  /** F6 `_infer_mime_from_name_or_header`: coalesce(header, ext→mime, octet-stream). */
  def inferMime(name: Column, contentType: Column): Column = {
    val fromExt = ExtToMime.foldRight(lit(null).cast("string")) { case ((ext, mime), acc) =>
      when(lower(name).endsWith(ext), lit(mime)).otherwise(acc)
    }
    coalesce(contentType, fromExt, lit("application/octet-stream"))
  }

  /** F5 `_ext_from_name_or_ctype`: dotted ext from name, else MIME→ext, else ".bin". */
  def extFromNameOrMime(name: Column, contentType: Column): Column = {
    // Reverse map keeps the FIRST ext per MIME (image/jpeg → .jpg), like
    // the reference's literal mapping at Leyton_depot.py:504-513.
    val mimeToExt = ExtToMime.map(_.swap).distinctBy(_._1)
    val fromMime = mimeToExt.foldRight(lit(null).cast("string")) { case ((mime, ext), acc) =>
      when(lower(contentType) === mime, lit(ext)).otherwise(acc)
    }
    coalesce(extWithDot(name), fromMime, lit(".bin"))
  }

  /** F4 `_sanitize_drive_name`: trim, forbidden chars → '-', collapse
    * whitespace — one native pass (see [[SanitizeNameExpr]]) instead of
    * two regex engines per row.
    */
  def sanitizeName(name: Column): Column =
    GraftExpr.toColumn(SanitizeNameExpr(GraftExpr.toExpr(name)))

  /** F3 `make_signed_filename`: idempotent " SIGNÉ" suffix insert before
    * ".pdf" (reference `fixed_signature_utils.py:116-124`). The name is
    * whitespace-stripped first; the already-has-suffix check is
    * CASE-insensitive only (the reference does `suffix.lower() in
    * name.lower()` — no accent folding), and when the suffix is present
    * the name is returned as-is with just the ".pdf" extension ensured.
    */
  def signedFilename(name: Column, suffix: String = " SIGNÉ"): Column = {
    val t = regexp_replace(name, """^\s+|\s+$""", "")
    val hasSuffix = lower(t).contains(lit(suffix.toLowerCase))
    val endsPdf = lower(t).endsWith(".pdf")
    val base = substring(t, lit(1), length(t) - 4) // name minus ".pdf"
    when(hasSuffix && endsPdf, t)
      .when(hasSuffix, concat(t, lit(".pdf")))
      .when(endsPdf, concat(base, lit(suffix), lit(".pdf")))
      .otherwise(concat(t, lit(suffix), lit(".pdf")))
  }

  /** F7 name templating: `ACT_{id}_{NAME}` with NAME uppercased, spaces → '_'. */
  def actFolderName(startId: Column, clientName: Column): Column =
    concat(lit("ACT_"), startId.cast("string"), lit("_"),
      regexp_replace(upper(trim(clientName)), """\s+""", "_"))

  /** F7 lot name: `CLM_GE_{lot:02d}`. */
  def lotName(lotNumber: Column): Column =
    concat(lit("CLM_GE_"), lpad(lotNumber.cast("string"), 2, "0"))

  /** F7 fallback item name: `ITEM_{id}` (reference `Leyton_depot.py:167`). */
  def itemNameOr(name: Column, itemId: Column): Column =
    coalesce(name, concat(lit("ITEM_"), itemId.cast("string")))

  /** F10 regex-extract + null-safe cast: `^ACT_(\d+)_` → long. */
  def actId(name: Column): Column = {
    val m = regexp_extract(name, "^ACT_(\\d+)_", 1)
    when(m =!= "", m.cast("long"))
  }

  /** A1 auto-increment: next id = max(extracted)+1, or 1 when none match. */
  def nextActId(names: Column): Column = coalesce(max(actId(names)), lit(0L)) + lit(1L)

  /** F8 `_escape_for_q`: escape single quotes for Drive query strings
    * (reference `Leyton_depot.py:418-419`, `(s or '').replace("'", "\\'")`).
    */
  def escapeForQ(s: Column): Column = regexp_replace(s, "'", """\\'""")

  /** F13 signature stamp text: the reference's
    * `"Firmado por: %(signer)s\nFecha: %(ts)s"` template
    * (`fixed_signature_utils.py:138`) with the timestamp formatted
    * engine-side.
    */
  def stampText(signer: Column, ts: Column): Column =
    concat(lit("Firmado por: "), signer, lit("\nFecha: "),
      date_format(ts, "yyyy-MM-dd HH:mm:ss"))
}
