package graft.functions

import graft.sources.{ImageCodec, PdfCodec, PdfCrypt, PdfText}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Catalyst expressions over [[graft.sources.PdfCodec]] — the PDF
  * container operators (parse / rasterize / compose / sign metadata)
  * as codegen'd projections, mirroring [[ImageExprs]]. Null-in →
  * null-out; a non-PDF payload evaluates to null rather than
  * throwing, so query layers can coalesce onto documented fallbacks.
  */
object PdfExprs {

  val InfoSchema: StructType = StructType(Seq(
    StructField("n_pages", LongType, nullable = false),
    StructField("w_pt_x100", LongType, nullable = false),
    StructField("h_pt_x100", LongType, nullable = false),
    StructField("n_images", LongType, nullable = false)))

  /** Static parse-metadata helper: struct row of [[PdfCodec.pdfInfo]]
    * (integer-scaled points — exactly reproducible in SQL).
    */
  def pdfInfoRow(bytes: Array[Byte]): InternalRow = {
    val info = PdfCodec.pdfInfo(bytes)
    if (info == null) null
    else new GenericInternalRow(Array[Any](info(0), info(1), info(2), info(3)))
  }

  /** Deterministic synthetic document fixture: `nPages` synthetic JPEG
    * pages at (wPt × hPt) points — the PDF analog of
    * [[ImageExprs]]'s `synth_image`, so oracle queries get a REAL PDF
    * input whose parse metadata is a SQL-computable function of the
    * row. Page pixels are seeded per page (seed + page index).
    */
  def synthPdf(seed: Long, nPages: Int, wPt: Double, hPt: Double): Array[Byte] = {
    val pages = (0 until math.max(1, nPages)).map { i =>
      val px = ImageCodec.decode(ImageCodec.synthPng(seed + i,
        math.max(8, math.round(wPt / 2).toInt), math.max(8, math.round(hPt / 2).toInt)))
      PdfCodec.PageImage(ImageCodec.encodeJpeg(px, 90), wPt, hPt)
    }
    PdfCodec.compose(pages, deflateContents = true)
  }

  val MetaSchema: StructType = StructType(
    Seq("title", "author", "subject", "keywords", "creator", "producer",
      "creation_date", "mod_date").map(f => StructField(f, StringType, nullable = true)))

  /** [[PdfCodec.docMeta]] boxed for codegen: struct of the /Info
    * fields; null for unparseable bytes.
    */
  def pdfMetaRow(bytes: Array[Byte]): InternalRow = {
    val m = PdfCodec.docMeta(bytes)
    if (m == null) null
    else new GenericInternalRow(m.map(s =>
      (if (s == null) null
       else org.apache.spark.unsafe.types.UTF8String.fromString(s)): Any))
  }

  /** [[SynthPdfTextEncExpr]]'s eval: text fixture, encrypted for
    * variants 0-3, plaintext otherwise.
    */
  def synthPdfTextEnc(seed: Long, nPages: Int, variant: Int): Array[Byte] = {
    val plain = PdfText.composeTextFixture(seed, nPages)
    if (variant >= 0 && variant <= 3) PdfCrypt.encryptPdf(plain, variant, seed) else plain
  }

  val CheckSchema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("reason", StringType, nullable = true)))

  /** [[PdfCodec.checkPdf]] boxed for codegen: struct(ok, reason). */
  def pdfCheckRow(bytes: Array[Byte]): InternalRow = {
    val (ok, reason) = PdfCodec.checkPdf(bytes)
    new GenericInternalRow(Array[Any](ok,
      if (reason == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(reason)))
  }

  /** [[PdfCodec.rasterizeAllPng]] boxed for codegen: Catalyst array
    * wrapper over the per-page PNGs (null for non-PDF bytes).
    */
  def rasterizeAll(bytes: Array[Byte], dpi: Int): ArrayData = {
    val pages = PdfCodec.rasterizeAllPng(bytes, dpi)
    if (pages == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      pages.asInstanceOf[Array[Any]])
  }

  /** [[PdfText.extractAll]] boxed for codegen: per-page text array,
    * null for unparseable bytes.
    */
  def pdfTextArray(bytes: Array[Byte]): ArrayData = {
    val pages = PdfText.extractAll(bytes)
    if (pages == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      pages.map(org.apache.spark.unsafe.types.UTF8String.fromString(_): Any))
  }

  /** [[PdfCodec.scanPagesJpeg]] boxed for codegen (null for non-PDF
    * bytes; `quality` is a UTF8String at the Catalyst boundary).
    */
  def scanPages(bytes: Array[Byte], dpi: Int, quality: Any, jpegQ: Int): ArrayData = {
    val pages = PdfCodec.scanPagesJpeg(bytes, dpi, quality.toString, jpegQ)
    if (pages == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      pages.asInstanceOf[Array[Any]])
  }

  /** Reassemble ordered JPEG pages into a document at a uniform page
    * size — B6's "new A4 page, insert image, save with deflate"
    * (`app.py:276-283`). Null when any page payload is null or not a
    * JPEG (corrupt-page guard: refuse to build a half-document).
    */
  def composePdf(pages: ArrayData, wPt: Double, hPt: Double): Array[Byte] = {
    if (pages == null || pages.numElements() == 0) return null
    val n = pages.numElements()
    val imgs = new Array[PdfCodec.PageImage](n)
    var i = 0
    while (i < n) {
      if (pages.isNullAt(i)) return null
      val jpeg = pages.getBinary(i)
      if (PdfCodec.jpegDims(jpeg) == null) return null
      imgs(i) = PdfCodec.PageImage(jpeg, wPt, hPt)
      i += 1
    }
    PdfCodec.compose(imgs.toSeq, deflateContents = true)
  }
}

/** Parse metadata of a PDF payload: struct(n_pages, w_pt_x100,
  * h_pt_x100, n_images); null for non-PDF bytes.
  */
case class PdfInfoExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = PdfExprs.InfoSchema
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = PdfExprs.pdfInfoRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("pdfInfo")
      s"""
         |InternalRow $r = graft.functions.PdfExprs.pdfInfoRow($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): PdfInfoExpr = copy(child = c)
  override def prettyName: String = "pdf_info"
}

/** Document metadata of a PDF payload (/Info dict): struct(title,
  * author, subject, keywords, creator, producer, creation_date,
  * mod_date), each null when absent; null for unparseable bytes.
  * Strings arrive decrypted on empty-user-password documents.
  */
case class PdfMetaExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = PdfExprs.MetaSchema
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = PdfExprs.pdfMetaRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("pdfMeta")
      s"""
         |InternalRow $r = graft.functions.PdfExprs.pdfMetaRow($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): PdfMetaExpr = copy(child = c)
  override def prettyName: String = "pdf_meta"
}

/** Accept/reject verdict of a PDF payload with a groupable reject
  * reason: struct(ok, reason) — the quarantine-table companion of the
  * null-propagating parse/raster expressions. Null only for a null
  * payload; a poisoned payload yields `(false, reason)`, never a
  * throw.
  */
case class PdfCheckExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = PdfExprs.CheckSchema
  override def nullSafeEval(b: Any): Any = PdfExprs.pdfCheckRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.PdfExprs.pdfCheckRow($b)")
  override protected def withNewChildInternal(c: Expression): PdfCheckExpr = copy(child = c)
  override def prettyName: String = "pdf_check"
}

/** Rasterize page `page` (0-based) of a PDF payload at `dpi` → PNG
  * bytes (`app.py:256-257` zoom geometry); null when non-PDF or out
  * of range.
  */
case class PdfRasterizeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, page: Any, dpi: Any): Any =
    PdfCodec.rasterizePng(b.asInstanceOf[Array[Byte]], page.asInstanceOf[Int], dpi.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, page, dpi) => {
      val r = ctx.freshName("raster")
      s"""
         |byte[] $r = graft.sources.PdfCodec.rasterizePng($b, $page, $dpi);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PdfRasterizeExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "pdf_rasterize"
}

/** Rasterize EVERY page of a PDF payload at `dpi` → array<binary> of
  * per-page PNGs, parsing the object graph once per document (the
  * page-grain [[PdfRasterizeExpr]] pays one parse per page — use this
  * then `posexplode` when a plan touches all pages). Null when
  * non-PDF.
  */
case class PdfRasterizeAllExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, dpi: Any): Any =
    PdfExprs.rasterizeAll(b.asInstanceOf[Array[Byte]], dpi.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, dpi) => {
      val r = ctx.freshName("rasterAll")
      s"""
         |ArrayData $r = graft.functions.PdfExprs.rasterizeAll($b, $dpi);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PdfRasterizeAllExpr = copy(left = l, right = r)
  override def prettyName: String = "pdf_rasterize_all"
}

/** Reassemble array<binary> JPEG pages into a PDF at a uniform
  * (wPt × hPt) page size (B6's rebuild loop). Null on empty/corrupt
  * input.
  */
case class PdfComposeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(BinaryType), DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(pages: Any, w: Any, h: Any): Any =
    PdfExprs.composePdf(pages.asInstanceOf[ArrayData],
      w.asInstanceOf[Double], h.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pages, w, h) => {
      val r = ctx.freshName("pdf")
      s"""
         |byte[] $r = graft.functions.PdfExprs.composePdf($pages, $w, $h);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PdfComposeExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "pdf_compose"
}

/** The scan endpoint's per-page hot path fused into one expression:
  * rasterize at `dpi` → pixel-level scanner effects (`quality`) → one
  * JPEG encode at `jpegQ`, per page, parsing the document once —
  * exactly the reference's in-memory flow (`app.py:256-271`), with
  * none of the intermediate PNG/JPEG round trips the composed
  * rasterize→effects→reencode column chain would pay. Null when
  * non-PDF.
  */
case class PdfScanPagesExpr(first: Expression, second: Expression,
                            third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, IntegerType, StringType, IntegerType)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, dpi: Any, quality: Any, jpegQ: Any): Any =
    PdfExprs.scanPages(b.asInstanceOf[Array[Byte]], dpi.asInstanceOf[Int],
      quality, jpegQ.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, dpi, quality, jpegQ) => {
      val r = ctx.freshName("scanPages")
      s"""
         |ArrayData $r = graft.functions.PdfExprs.scanPages($b, $dpi, $quality, $jpegQ);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PdfScanPagesExpr =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "pdf_scan_pages"
}

/** Deterministic synthetic PDF fixture: (seed, n_pages, wPt, hPt) →
  * PDF bytes whose parse metadata is a closed-form function of the
  * inputs — the oracle-gate entry point for the container codec.
  */
case class SynthPdfExpr(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any, w: Any, h: Any): Any =
    PdfExprs.synthPdf(seed.asInstanceOf[Long], n.asInstanceOf[Int],
      w.asInstanceOf[Double], h.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n, w, h) =>
      s"${ev.value} = graft.functions.PdfExprs.synthPdf($seed, $n, $w, $h);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SynthPdfExpr =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "synth_pdf"
}

/** Deterministic Flate+PNG-predictor PDF fixture
  * ([[PdfCodec.composePredictorFixture]]): (seed, wPx, hPx) → PDF
  * bytes whose parse metadata AND rasterized pixel sum are closed-form
  * functions of the inputs — the oracle-gate entry for the predictor
  * read path.
  */
case class SynthPdfPredExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, h: Any): Any =
    PdfCodec.composePredictorFixture(seed.asInstanceOf[Long],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, h) =>
      s"${ev.value} = graft.sources.PdfCodec.composePredictorFixture($seed, $w, $h);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthPdfPredExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_pdf_pred"
}

/** Deterministic LZW / RunLength / sub-8-bit-gray fixture
  * ([[PdfCodec.composeFiltersFixture]]): (seed, wPx, hPx) → PDF bytes
  * whose rasterized pixel sum is closed-form — the oracle-gate entry
  * for the remaining real-world stream filters.
  */
case class SynthPdfFiltersExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, h: Any): Any =
    PdfCodec.composeFiltersFixture(seed.asInstanceOf[Long],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, h) =>
      s"${ev.value} = graft.sources.PdfCodec.composeFiltersFixture($seed, $w, $h);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthPdfFiltersExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_pdf_filters"
}

/** Deterministic CCITT G4 fixture ([[PdfCodec.composeCcittFixture]]):
  * (seed, wPx, hPx) → PDF bytes with a shifting-stripe 1-bit fax image
  * whose rasterized pixel sum is closed-form.
  */
case class SynthPdfCcittExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, h: Any): Any =
    PdfCodec.composeCcittFixture(seed.asInstanceOf[Long],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, h) =>
      s"${ev.value} = graft.sources.PdfCodec.composeCcittFixture($seed, $w, $h);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthPdfCcittExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_pdf_ccitt"
}

/** PDF text extraction ([[graft.sources.PdfText]]): document bytes →
  * array of per-page text strings in stream reading order. Null for
  * unparseable bytes (same poison-guard layer as the raster exprs);
  * decryption composes upstream in parse, so empty-user-password
  * encrypted documents extract transparently.
  */
case class PdfTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    PdfExprs.pdfTextArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("pdfText")
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |ArrayData $r = graft.functions.PdfExprs.pdfTextArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): PdfTextExpr = copy(child = c)
  override def prettyName: String = "pdf_text"
}

/** Deterministic TEXT-document fixture
  * ([[graft.sources.PdfText.composeTextFixture]]): (seed, nPages) →
  * PDF bytes whose extracted per-page text is a closed-form function
  * of the inputs — the oracle-gate entry for the text extractor.
  */
case class SynthPdfTextExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    PdfText.composeTextFixture(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.PdfText.composeTextFixture($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthPdfTextExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_pdf_text"
}

/** Width-kerned justified-text fixture
  * ([[graft.sources.PdfText.composeWidthFixture]]): (seed, nPages) →
  * PDF bytes whose word spaces are encoded ONLY as sub-threshold TJ
  * kerns and same-line Td pen jumps over /Widths-bearing fonts — the
  * oracle-gate entry for glyph-width-driven spacing.
  */
case class SynthPdfWidthsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    PdfText.composeWidthFixture(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.PdfText.composeWidthFixture($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthPdfWidthsExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_pdf_widths"
}

/** CJK fixture ([[graft.sources.PdfText.composeCjkFixture]]): (seed,
  * nPages) → PDF bytes over predefined UniGB-UCS2-H / UniJIS-UCS2-V
  * CMaps with NO /ToUnicode — the oracle-gate entry for UCS2 decode
  * and the vertical pen model.
  */
case class SynthPdfCjkExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    PdfText.composeCjkFixture(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.PdfText.composeCjkFixture($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthPdfCjkExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_pdf_cjk"
}

/** Text-document fixture with OPTIONAL encryption: variant 0-3 wraps
  * [[graft.sources.PdfText.composeTextFixture]] in the corresponding
  * standard-security-handler shape ([[PdfCrypt]]); any other variant
  * stays plaintext — the mixed shard a real document corpus is.
  */
case class SynthPdfTextEncExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any, variant: Any): Any =
    PdfExprs.synthPdfTextEnc(seed.asInstanceOf[Long], n.asInstanceOf[Int],
      variant.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n, v) =>
      s"${ev.value} = graft.functions.PdfExprs.synthPdfTextEnc($seed, $n, $v);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthPdfTextEncExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_pdf_text_enc"
}

/** Deterministic ENCRYPTED PDF fixture
  * ([[graft.sources.PdfCrypt.composeEncryptedFixture]]): the predictor
  * fixture wrapped in standard-security-handler encryption — variant
  * 0=RC4-40, 1=RC4-128, 2=AES-128 (/AESV2), 3=AES-256 (/AESV3) — so
  * decrypt → inflate → unpredict → decode → blit all sit under one
  * closed-form pixel-sum gate.
  */
case class SynthPdfEncExpr(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, h: Any, variant: Any): Any =
    PdfCrypt.composeEncryptedFixture(seed.asInstanceOf[Long],
      w.asInstanceOf[Int], h.asInstanceOf[Int], variant.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, h, v) =>
      s"${ev.value} = graft.sources.PdfCrypt.composeEncryptedFixture($seed, $w, $h, $v);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SynthPdfEncExpr =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "synth_pdf_enc"
}

/** Column-level entry points. */
object PdfOps {
  def pdfInfo(bin: Column): Column =
    GraftExpr.toColumn(PdfInfoExpr(GraftExpr.toExpr(bin)))
  def pdfCheck(bin: Column): Column =
    GraftExpr.toColumn(PdfCheckExpr(GraftExpr.toExpr(bin)))
  def pdfMeta(bin: Column): Column =
    GraftExpr.toColumn(PdfMetaExpr(GraftExpr.toExpr(bin)))
  def pdfRasterize(bin: Column, page: Column, dpi: Column): Column =
    GraftExpr.toColumn(PdfRasterizeExpr(
      GraftExpr.toExpr(bin), GraftExpr.toExpr(page), GraftExpr.toExpr(dpi)))
  def pdfRasterizeAll(bin: Column, dpi: Column): Column =
    GraftExpr.toColumn(PdfRasterizeAllExpr(GraftExpr.toExpr(bin), GraftExpr.toExpr(dpi)))
  def pdfScanPages(bin: Column, dpi: Column, quality: Column, jpegQ: Column): Column =
    GraftExpr.toColumn(PdfScanPagesExpr(GraftExpr.toExpr(bin), GraftExpr.toExpr(dpi),
      GraftExpr.toExpr(quality), GraftExpr.toExpr(jpegQ)))
  def pdfCompose(pages: Column, wPt: Column, hPt: Column): Column =
    GraftExpr.toColumn(PdfComposeExpr(
      GraftExpr.toExpr(pages), GraftExpr.toExpr(wPt), GraftExpr.toExpr(hPt)))
  def synthPdf(seed: Column, nPages: Column, wPt: Column, hPt: Column): Column =
    GraftExpr.toColumn(SynthPdfExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nPages),
      GraftExpr.toExpr(wPt), GraftExpr.toExpr(hPt)))
  def synthPdfPred(seed: Column, wPx: Column, hPx: Column): Column =
    GraftExpr.toColumn(SynthPdfPredExpr(GraftExpr.toExpr(seed),
      GraftExpr.toExpr(wPx), GraftExpr.toExpr(hPx)))
  def synthPdfEnc(seed: Column, wPx: Column, hPx: Column, variant: Column): Column =
    GraftExpr.toColumn(SynthPdfEncExpr(GraftExpr.toExpr(seed),
      GraftExpr.toExpr(wPx), GraftExpr.toExpr(hPx), GraftExpr.toExpr(variant)))
  def pdfText(bin: Column): Column =
    GraftExpr.toColumn(PdfTextExpr(GraftExpr.toExpr(bin)))
  def synthPdfFilters(seed: Column, wPx: Column, hPx: Column): Column =
    GraftExpr.toColumn(SynthPdfFiltersExpr(GraftExpr.toExpr(seed),
      GraftExpr.toExpr(wPx), GraftExpr.toExpr(hPx)))
  def synthPdfCcitt(seed: Column, wPx: Column, hPx: Column): Column =
    GraftExpr.toColumn(SynthPdfCcittExpr(GraftExpr.toExpr(seed),
      GraftExpr.toExpr(wPx), GraftExpr.toExpr(hPx)))
  def synthPdfText(seed: Column, nPages: Column): Column =
    GraftExpr.toColumn(SynthPdfTextExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nPages)))
  def synthPdfWidths(seed: Column, nPages: Column): Column =
    GraftExpr.toColumn(SynthPdfWidthsExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nPages)))
  def synthPdfCjk(seed: Column, nPages: Column): Column =
    GraftExpr.toColumn(SynthPdfCjkExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nPages)))
  def synthPdfTextEnc(seed: Column, nPages: Column, variant: Column): Column =
    GraftExpr.toColumn(SynthPdfTextEncExpr(GraftExpr.toExpr(seed),
      GraftExpr.toExpr(nPages), GraftExpr.toExpr(variant)))
}
