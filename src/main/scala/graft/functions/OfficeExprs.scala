package graft.functions

import graft.sources.{OfficeCodec, ZipCodec}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions over [[graft.sources.ZipCodec]] and
  * [[graft.sources.OfficeCodec]] — ZIP containers and Office Open XML
  * text extraction as codegen'd projections, the same posture as the
  * PDF/WARC codec surfaces (null-propagating poison guards, struct/
  * array outputs, deterministic synth fixtures for the oracle gate).
  */
object OfficeExprs {

  val ZipEntrySchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("method", IntegerType, nullable = false),
    StructField("size_c", LongType, nullable = false),
    StructField("size_u", LongType, nullable = false)))

  def zipEntriesArray(bytes: Array[Byte]): ArrayData =
    if (!ZipCodec.isZip(bytes)) null
    else try {
      new GenericArrayData(ZipCodec.entries(bytes).map { e =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(e.name), e.method, e.sizeC, e.sizeU)): Any
      }.toArray)
    } catch { case _: Exception => null }

  def docxTextStr(bytes: Array[Byte]): UTF8String = {
    val s = OfficeCodec.docxText(bytes)
    if (s == null) null else UTF8String.fromString(s)
  }

  val XlsxCellSchema: StructType = StructType(Seq(
    StructField("sheet", IntegerType, nullable = false),
    StructField("ref", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  def xlsxCellsArray(bytes: Array[Byte]): ArrayData = {
    val cells = OfficeCodec.xlsxCells(bytes)
    if (cells == null) null
    else new GenericArrayData(cells.map { case (sheet, ref, value) =>
      new GenericInternalRow(Array[Any](
        sheet, UTF8String.fromString(ref), UTF8String.fromString(value))): Any
    }.toArray)
  }

  def pptxTextArray(bytes: Array[Byte]): ArrayData = {
    val slides = OfficeCodec.pptxText(bytes)
    if (slides == null) null
    else new GenericArrayData(slides.map(UTF8String.fromString(_): Any))
  }

  /** [[OfficeCodec.epubText]] boxed for codegen. */
  def epubTextArray(bytes: Array[Byte]): ArrayData = {
    val chapters = OfficeCodec.epubText(bytes)
    if (chapters == null) null
    else new GenericArrayData(chapters.map(UTF8String.fromString(_): Any))
  }

  val MailSchema: StructType = StructType(Seq(
    StructField("subject", StringType, nullable = true),
    StructField("from", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("text", StringType, nullable = false)))

  /** [[graft.sources.RtfCodec.extractText]] boxed for codegen. */
  def rtfTextStr(bytes: Array[Byte]): UTF8String = {
    val s = try graft.sources.RtfCodec.extractText(bytes)
            catch { case _: Exception => null }
    if (s == null) null else UTF8String.fromString(s)
  }

  /** [[graft.sources.MailCodec.parseMbox]] boxed for codegen. */
  def mboxArray(bytes: Array[Byte]): ArrayData = {
    val msgs = graft.sources.MailCodec.parseMbox(bytes)
    if (msgs == null) null
    else new GenericArrayData(msgs.map { m =>
      def s(v: String) = if (v == null) null else UTF8String.fromString(v)
      new GenericInternalRow(Array[Any](s(m.subject), s(m.from), s(m.date),
        UTF8String.fromString(m.text))): Any
    })
  }

  val TarEntrySchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false)))

  def tarEntriesArray(bytes: Array[Byte]): ArrayData =
    if (!graft.sources.TarCodec.isTar(bytes)) null
    else try {
      new GenericArrayData(graft.sources.TarCodec.entries(bytes).map { e =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(e.name), e.size)): Any
      }.toArray)
    } catch { case _: Exception => null }

  /** Closed-form TAR fixture: file i is `f<i>.txt`, `10 + (seed+i) mod
    * 23` bytes of the byte value `(seed+i) mod 251`.
    */
  def synthTar(seed: Long, nFiles: Int): Array[Byte] = {
    val n = math.max(1, nFiles)
    graft.sources.TarCodec.build((0 until n).map { i =>
      val len = (10 + (((seed + i) % 23) + 23) % 23).toInt
      s"f$i.txt" -> Array.fill(len)(((((seed + i) % 251) + 251) % 251).toByte)
    })
  }
}

/** ZIP central-directory listing: array of (name, method, size_c,
  * size_u); null for non-ZIP or malformed archives.
  */
case class ZipEntriesExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(OfficeExprs.ZipEntrySchema, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = OfficeExprs.zipEntriesArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("zipEntries")
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |ArrayData $r = graft.functions.OfficeExprs.zipEntriesArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): ZipEntriesExpr = copy(child = c)
  override def prettyName: String = "zip_entries"
}

/** DOCX body text (paragraph-joined); null when not a DOCX. */
case class DocxTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = OfficeExprs.docxTextStr(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("docxText")
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |UTF8String $r = graft.functions.OfficeExprs.docxTextStr($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): DocxTextExpr = copy(child = c)
  override def prettyName: String = "docx_text"
}

/** XLSX cells: array of (sheet, ref, value); null when not an XLSX. */
case class XlsxCellsExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(OfficeExprs.XlsxCellSchema, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = OfficeExprs.xlsxCellsArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("xlsxCells")
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |ArrayData $r = graft.functions.OfficeExprs.xlsxCellsArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): XlsxCellsExpr = copy(child = c)
  override def prettyName: String = "xlsx_cells"
}

/** PPTX per-slide text; null when not a PPTX. */
case class PptxTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = OfficeExprs.pptxTextArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("pptxText")
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |ArrayData $r = graft.functions.OfficeExprs.pptxTextArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): PptxTextExpr = copy(child = c)
  override def prettyName: String = "pptx_text"
}

/** Deterministic DOCX fixture: (seed, nParas) → real archive whose
  * extracted text is closed-form.
  */
case class SynthDocxExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    OfficeCodec.composeDocx(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.OfficeCodec.composeDocx($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthDocxExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_docx"
}

/** Deterministic XLSX fixture: (seed, nRows). */
case class SynthXlsxExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    OfficeCodec.composeXlsx(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.OfficeCodec.composeXlsx($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthXlsxExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_xlsx"
}

/** Deterministic PPTX fixture: (seed, nSlides). */
case class SynthPptxExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    OfficeCodec.composePptx(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.OfficeCodec.composePptx($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthPptxExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_pptx"
}

/** EPUB per-chapter text in spine order
  * ([[graft.sources.OfficeCodec.epubText]]); null when not an EPUB.
  */
case class EpubTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    OfficeExprs.epubTextArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("epubText")
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |ArrayData $r = graft.functions.OfficeExprs.epubTextArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): EpubTextExpr = copy(child = c)
  override def prettyName: String = "epub_text"
}

/** Deterministic EPUB fixture: (seed, nChapters) — chapter file names
  * deliberately sort AGAINST reading order so the spine path is the
  * only one that passes the gate.
  */
case class SynthEpubExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    OfficeCodec.composeEpub(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.OfficeCodec.composeEpub($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthEpubExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_epub"
}

/** Content-based format label ([[graft.sources.FormatDetect]]):
  * magic-byte detection with one level of container refinement
  * (zip→docx/xlsx/pptx, gzip→warc-gz); total — null only for null.
  */
case class FormatDetectExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    UTF8String.fromString(graft.sources.FormatDetect.detect(b.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = UTF8String.fromString(graft.sources.FormatDetect.detect($b));")
  override protected def withNewChildInternal(c: Expression): FormatDetectExpr = copy(child = c)
  override def prettyName: String = "format_detect"
}

/** TAR (ustar) entry listing: array of (name, size); null for non-TAR
  * or damaged archives.
  */
case class TarEntriesExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(OfficeExprs.TarEntrySchema, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = OfficeExprs.tarEntriesArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("tarEntries")
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |ArrayData $r = graft.functions.OfficeExprs.tarEntriesArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): TarEntriesExpr = copy(child = c)
  override def prettyName: String = "tar_entries"
}

/** Deterministic TAR fixture: (seed, nFiles) → ustar archive with
  * closed-form names/sizes/content.
  */
case class SynthTarExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    OfficeExprs.synthTar(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.functions.OfficeExprs.synthTar($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthTarExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_tar"
}

/** MBOX archive → messages ([[graft.sources.MailCodec]]): RFC 5322
  * headers (2047 encoded-words decoded), MIME multipart recursion,
  * base64/quoted-printable transfer decoding, html-part fallback
  * through the crawl extractor. Null when the bytes aren't an mbox.
  */
case class MboxMessagesExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(OfficeExprs.MailSchema, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = OfficeExprs.mboxArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("mbox")
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |ArrayData $r = graft.functions.OfficeExprs.mboxArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): MboxMessagesExpr = copy(child = c)
  override def prettyName: String = "mbox_messages"
}

/** Deterministic MBOX fixture: (seed, nMsgs) cycling QP / base64 /
  * multipart-alternative decode paths with 2047-encoded subjects.
  */
case class SynthMboxExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    graft.sources.MailCodec.composeMbox(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.MailCodec.composeMbox($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthMboxExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_mbox"
}

/** RTF text extraction ([[graft.sources.RtfCodec]]); null when the
  * bytes don't open an RTF group.
  */
case class RtfTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = OfficeExprs.rtfTextStr(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("rtfText")
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |UTF8String $r = graft.functions.OfficeExprs.rtfTextStr($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): RtfTextExpr = copy(child = c)
  override def prettyName: String = "rtf_text"
}

/** Deterministic RTF fixture: (seed, nParas). */
case class SynthRtfExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    graft.sources.RtfCodec.composeRtf(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.RtfCodec.composeRtf($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthRtfExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_rtf"
}

/** Column-level entry points. */
object OfficeOps {
  def zipEntries(bin: Column): Column =
    GraftExpr.toColumn(ZipEntriesExpr(GraftExpr.toExpr(bin)))
  def docxText(bin: Column): Column =
    GraftExpr.toColumn(DocxTextExpr(GraftExpr.toExpr(bin)))
  def xlsxCells(bin: Column): Column =
    GraftExpr.toColumn(XlsxCellsExpr(GraftExpr.toExpr(bin)))
  def pptxText(bin: Column): Column =
    GraftExpr.toColumn(PptxTextExpr(GraftExpr.toExpr(bin)))
  def synthDocx(seed: Column, nParas: Column): Column =
    GraftExpr.toColumn(SynthDocxExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nParas)))
  def synthXlsx(seed: Column, nRows: Column): Column =
    GraftExpr.toColumn(SynthXlsxExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nRows)))
  def synthPptx(seed: Column, nSlides: Column): Column =
    GraftExpr.toColumn(SynthPptxExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nSlides)))
  def formatDetect(bin: Column): Column =
    GraftExpr.toColumn(FormatDetectExpr(GraftExpr.toExpr(bin)))
  def epubText(bin: Column): Column =
    GraftExpr.toColumn(EpubTextExpr(GraftExpr.toExpr(bin)))
  def synthEpub(seed: Column, nChapters: Column): Column =
    GraftExpr.toColumn(SynthEpubExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nChapters)))
  def mboxMessages(bin: Column): Column =
    GraftExpr.toColumn(MboxMessagesExpr(GraftExpr.toExpr(bin)))
  def synthMbox(seed: Column, nMsgs: Column): Column =
    GraftExpr.toColumn(SynthMboxExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMsgs)))
  def rtfText(bin: Column): Column =
    GraftExpr.toColumn(RtfTextExpr(GraftExpr.toExpr(bin)))
  def synthRtf(seed: Column, nParas: Column): Column =
    GraftExpr.toColumn(SynthRtfExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nParas)))
  def tarEntries(bin: Column): Column =
    GraftExpr.toColumn(TarEntriesExpr(GraftExpr.toExpr(bin)))
  def synthTar(seed: Column, nFiles: Column): Column =
    GraftExpr.toColumn(SynthTarExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nFiles)))
}
