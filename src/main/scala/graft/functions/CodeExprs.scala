package graft.functions

import graft.sources.{CodeCodec, MarkupCodec}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst surface over [[graft.sources.CodeCodec]] and
  * [[graft.sources.MarkupCodec]] — the code-corpus curation stages
  * (language ID, comment stripping, quality metrics, license
  * detection) and the Markdown/LaTeX extractors as codegen'd
  * projections: pure per-row functions inside whole-stage codegen,
  * null-propagating, never throwing, no state and no join — the shape
  * that scales to a 100 TB code shard exactly like the crawl layer's
  * `html_extract`. Multi-output stages return ONE struct so a plan
  * needing code + comment density scans once.
  */
object CodeExprs {

  val MetricsSchema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("max_line", LongType, nullable = false),
    StructField("avg_line_x100", LongType, nullable = false),
    StructField("alnum_ppm", LongType, nullable = false),
    StructField("alpha_ppm", LongType, nullable = false),
    StructField("digit_ppm", LongType, nullable = false),
    StructField("autogen", BooleanType, nullable = false)))

  val StripSchema: StructType = StructType(Seq(
    StructField("code", StringType, nullable = false),
    StructField("comment_ppm", LongType, nullable = false)))

  val SplitSchema: StructType = StructType(Seq(
    StructField("off", LongType, nullable = false),
    StructField("len", LongType, nullable = false)))

  /** Block-grain random access for [[Bz2BlockTextExpr]]: scan for the
    * k-th bzip2 block magic at BIT grain, decode that block standalone
    * (its CRC verified). Null on out-of-range k or damage.
    */
  def bz2BlockText(b: Array[Byte], k: Int): String = {
    import graft.sources.BzipCodec
    try {
      val offs = BzipCodec.blockOffsetsBits(b)
      if (k < 0 || k >= offs.length) null
      else new String(BzipCodec.decodeBlockAt(b, offs(k)), "UTF-8")
    } catch { case _: Exception => null }
  }

  /** Boxed bit-offset array for [[Bz2BlockStartsExpr]]. */
  def bz2BlockStartsArray(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData =
    try {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        graft.sources.BzipCodec.blockOffsetsBits(b).map(x => x: Any))
    } catch { case _: Exception => null }

  /** Seek-table random access for [[ZstSeekMemberExpr]]. */
  def zstSeekMember(b: Array[Byte], k: Int): String = {
    import graft.sources.ZstdCodec
    try {
      val table = ZstdCodec.readSeekTable(b)
      if (table == null || k < 0 || k >= table.length) null
      else {
        val (cOff, _, cSize, _) = table(k)
        new String(ZstdCodec.decompress(
          java.util.Arrays.copyOfRange(b, cOff.toInt, cOff.toInt + cSize)), "UTF-8")
      }
    } catch { case _: Exception => null }
  }

  /** Boxed member-boundary walk for [[ShardSplitsExpr]]: dispatches on
    * magic bytes; null when the payload has no member grain.
    */
  def shardSplitsArray(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    import graft.sources.{BzipCodec, GzipShard, Lz4Codec, SnappyCodec, XzCodec, ZstdCodec}
    val pairs: Array[(Long, Long)] =
      try {
        if (GzipShard.isGzip(b)) GzipShard.memberOffsets(b)
        else if (ZstdCodec.isZstd(b)) ZstdCodec.frameOffsets(b)
        else if (XzCodec.isXz(b)) XzCodec.streamOffsets(b)
        else if (BzipCodec.isBzip2(b)) BzipCodec.streamOffsets(b)
        else if (Lz4Codec.isLz4(b)) Lz4Codec.frameOffsets(b)
        else if (SnappyCodec.isSnappyFramed(b)) SnappyCodec.memberOffsets(b)
        else if (SnappyCodec.isHadoopSnappy(b)) SnappyCodec.hadoopBlockOffsets(b)
        else null
      } catch { case _: Exception => null } // damaged shard: no split plan
    if (pairs == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      pairs.map { case (o, l) => new GenericInternalRow(Array[Any](o, l)): Any })
  }

  /** Boxed header-only archive listing for [[SevenZipEntriesExpr]]. */
  def sevenZipEntriesArray(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val es = try graft.sources.SevenZipCodec.entries(b)
      catch { case _: Exception => null }
    if (es == null) return null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      es.map(e => new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.name), e.size, e.hasStream)): Any))
  }

  def codeLangStr(path: UTF8String, content: UTF8String): UTF8String =
    UTF8String.fromString(CodeCodec.detectLang(
      if (path == null) null else path.toString,
      if (content == null) null else content.toString))

  def metricsRow(text: UTF8String): InternalRow = {
    val m = CodeCodec.metrics(text.toString)
    new GenericInternalRow(Array[Any](
      m.nLines, m.maxLine, m.avgLineX100, m.alnumPpm, m.alphaPpm, m.digitPpm, m.autogen))
  }

  def stripRow(text: UTF8String, lang: UTF8String): InternalRow = {
    val t = text.toString
    val s = CodeCodec.stripComments(t, if (lang == null) "" else lang.toString)
    val total = t.codePointCount(0, t.length)
    val ppm = if (total == 0) 0L else s.removedCp * 1000000L / total
    new GenericInternalRow(Array[Any](UTF8String.fromString(s.code), ppm))
  }

  def licenseStr(text: UTF8String): UTF8String =
    UTF8String.fromString(CodeCodec.detectLicense(text.toString))

  def markdownStr(text: UTF8String): UTF8String =
    UTF8String.fromString(MarkupCodec.markdownText(text.toString))

  def wikitextStr(text: UTF8String): UTF8String =
    UTF8String.fromString(graft.sources.WikiCodec.wikitextText(text.toString))

  val WikiPageSchema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("ns", IntegerType, nullable = false),
    StructField("page_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  def wikiPagesArray(xml: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.sources.WikiCodec.dumpPages(xml.toString).map { p =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(p.title), p.ns, p.pageId,
          UTF8String.fromString(p.text))): Any
      })

  /** Dump shard → ONE text blob: main-namespace NON-REDIRECT pages
    * extracted and newline-joined — the `CorpusIngest.dispatch` branch
    * for `mediawiki` payloads (a single codegen-friendly projection,
    * no interpreted HOF lambda). Redirects carry no prose; a large
    * wiki is ~half redirects, so dropping them here is the token-stats
    * hygiene every dump pipeline applies.
    */
  def wikiDumpTextStr(xml: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.sources.WikiCodec.dumpPages(xml.toString)
        .filter(p => p.ns == 0 && !graft.sources.WikiCodec.isRedirect(p.text))
        .map(p => graft.sources.WikiCodec.wikitextText(p.text))
        .mkString("\n"))

  def wikiIsRedirect(wt: UTF8String): Boolean =
    graft.sources.WikiCodec.isRedirect(wt.toString)

  val WikiSectionSchema: StructType = StructType(Seq(
    StructField("level", IntegerType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Sections with title AND body already extracted to plain text —
    * one codegen projection per document, no interpreted HOF.
    */
  def wikiSectionsArray(wt: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.sources.WikiCodec.sections(wt.toString).map { s =>
        new GenericInternalRow(Array[Any](
          s.level,
          UTF8String.fromString(graft.sources.WikiCodec.wikitextText(s.title)),
          UTF8String.fromString(graft.sources.WikiCodec.wikitextText(s.body)))): Any
      })

  val ScriptSchema: StructType = StructType(
    Seq("n_cp", "latin_ppm", "han_ppm", "kana_ppm", "hangul_ppm",
      "cyrillic_ppm", "arabic_ppm", "digit_ppm", "other_ppm")
      .map(f => StructField(f, LongType, nullable = false)) ++
      Seq(StructField("script", StringType, nullable = false),
        StructField("lang", StringType, nullable = false)))

  /** Unicode-script distribution over non-whitespace code points —
    * the first-pass classifier every real language-ID runs before
    * n-grams, and the only one that separates zh/ja/ko (marker words
    * can't see script). Buckets (BMP subset, documented): basic +
    * extended Latin letters, CJK Unified (4E00–9FFF), kana
    * (3040–30FF), Hangul (AC00–D7AF + jamo 1100–11FF), Cyrillic
    * (0400–04FF), Arabic (0600–06FF), ASCII digits, other. `script` =
    * first-max bucket; `lang` = ja when kana ≥ 5%, else the ≥ 50%
    * script's language (ko/zh/ru/ar/latin), else "und". Integer ppm,
    * SQL-recomputable with independent regexp counts.
    */
  def scriptProfileRow(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new Array[Long](8) // latin han kana hangul cyr ar digit other
    var total = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (!Character.isWhitespace(cp)) {
        total += 1
        val b =
          if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
              (cp >= 0xC0 && cp <= 0x24F)) 0
          else if (cp >= 0x4E00 && cp <= 0x9FFF) 1
          else if (cp >= 0x3040 && cp <= 0x30FF) 2
          else if ((cp >= 0xAC00 && cp <= 0xD7AF) || (cp >= 0x1100 && cp <= 0x11FF)) 3
          else if (cp >= 0x400 && cp <= 0x4FF) 4
          else if (cp >= 0x600 && cp <= 0x6FF) 5
          else if (cp >= '0' && cp <= '9') 6
          else 7
        counts(b) += 1
      }
    }
    def ppm(c: Long): Long = if (total == 0) 0L else c * 1000000L / total
    val names = Array("latin", "han", "kana", "hangul", "cyrillic", "arabic",
      "digit", "other")
    var best = 0
    var bi = 1
    while (bi < 8) { if (counts(bi) > counts(best)) best = bi; bi += 1 }
    val script = if (total == 0) "none" else names(best)
    val lang =
      if (total == 0) "und"
      else if (ppm(counts(2)) >= 50000) "ja"
      else if (ppm(counts(3)) >= 500000) "ko"
      else if (ppm(counts(1)) >= 500000) "zh"
      else if (ppm(counts(4)) >= 500000) "ru"
      else if (ppm(counts(5)) >= 500000) "ar"
      else if (ppm(counts(0)) >= 500000) "latin"
      else "und"
    new GenericInternalRow(Array[Any](
      total, ppm(counts(0)), ppm(counts(1)), ppm(counts(2)), ppm(counts(3)),
      ppm(counts(4)), ppm(counts(5)), ppm(counts(6)), ppm(counts(7)),
      UTF8String.fromString(script), UTF8String.fromString(lang)))
  }

  def latexStr(text: UTF8String): UTF8String =
    UTF8String.fromString(MarkupCodec.latexText(text.toString))

  val CsvSchema: StructType = StructType(Seq(
    StructField("delim", StringType, nullable = false),
    StructField("quote", StringType, nullable = false),
    StructField("header", BooleanType, nullable = false),
    StructField("n_cols", IntegerType, nullable = false)))

  def csvSniffRow(text: UTF8String): InternalRow = {
    val d = graft.sources.CsvSniff.sniff(text.toString)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(d.delim), UTF8String.fromString(d.quote), d.header, d.nCols))
  }

  def sentSplitArray(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      MarkupCodec.sentenceSplit(text.toString).map(UTF8String.fromString(_): Any))

  val SecretSchema: StructType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_secrets", LongType, nullable = false),
    StructField("kinds", ArrayType(StringType, containsNull = false), nullable = false)))

  val DiffStatSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("added", LongType, nullable = false),
    StructField("removed", LongType, nullable = false)))

  def diffStatsArray(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.sources.DiffCodec.stats(text.toString).map { s =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(s.file), s.added, s.removed)): Any
      })

  def unicodeNorm(text: UTF8String, form: String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.valueOf(form)))

  def secretScanRow(text: UTF8String): InternalRow = {
    val s = graft.sources.SecretScan.scan(text.toString)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(s.redacted), s.kinds.length.toLong,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        s.kinds.map(UTF8String.fromString(_): Any))))
  }
}

/** `code_lang(path, content)` → language id; null when either input is
  * null (pass empty strings for "don't know", the detector treats them
  * as absent).
  */
case class CodeLangExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(p: Any, c: Any): Any =
    CodeExprs.codeLangStr(p.asInstanceOf[UTF8String], c.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, c) =>
      s"${ev.value} = graft.functions.CodeExprs.codeLangStr($p, $c);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CodeLangExpr =
    copy(left = l, right = r)
  override def prettyName: String = "code_lang"
}

/** `code_metrics(text)` → struct (see [[CodeExprs.MetricsSchema]]). */
case class CodeMetricsExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = CodeExprs.MetricsSchema
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.metricsRow(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.metricsRow($t);")
  override protected def withNewChildInternal(c: Expression): CodeMetricsExpr = copy(child = c)
  override def prettyName: String = "code_metrics"
}

/** `strip_comments(text, lang)` → struct{code, comment_ppm}. */
case class StripCommentsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = CodeExprs.StripSchema
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(t: Any, l: Any): Any =
    CodeExprs.stripRow(t.asInstanceOf[UTF8String], l.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l) =>
      s"${ev.value} = graft.functions.CodeExprs.stripRow($t, $l);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StripCommentsExpr =
    copy(left = l, right = r)
  override def prettyName: String = "strip_comments"
}

/** `license_detect(text)` → SPDX-style id or "unknown". */
case class LicenseDetectExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.licenseStr(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.licenseStr($t);")
  override protected def withNewChildInternal(c: Expression): LicenseDetectExpr = copy(child = c)
  override def prettyName: String = "license_detect"
}

/** `markdown_text(md)` → plain text ([[graft.sources.MarkupCodec]]). */
case class MarkdownTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.markdownStr(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.markdownStr($t);")
  override protected def withNewChildInternal(c: Expression): MarkdownTextExpr = copy(child = c)
  override def prettyName: String = "markdown_text"
}

/** `wikitext_text(wt)` → plain text ([[graft.sources.WikiCodec]]). */
case class WikitextTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.wikitextStr(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.wikitextStr($t);")
  override protected def withNewChildInternal(c: Expression): WikitextTextExpr = copy(child = c)
  override def prettyName: String = "wikitext_text"
}

/** `wiki_pages(xml)` → array of {title, ns, page_id, text} — MediaWiki
  * dump-XML page framing ([[graft.sources.WikiCodec.dumpPages]]); text
  * is RAW wikitext (route through `wikitext_text` next).
  */
case class WikiPagesExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(CodeExprs.WikiPageSchema, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.wikiPagesArray(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.wikiPagesArray($t);")
  override protected def withNewChildInternal(c: Expression): WikiPagesExpr = copy(child = c)
  override def prettyName: String = "wiki_pages"
}

/** `wiki_is_redirect(wt)` → leading-#REDIRECT page classifier. */
case class WikiIsRedirectExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.wikiIsRedirect(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.wikiIsRedirect($t);")
  override protected def withNewChildInternal(c: Expression): WikiIsRedirectExpr = copy(child = c)
  override def prettyName: String = "wiki_is_redirect"
}

/** `wiki_sections(wt)` → array of {level, title, text} — heading-split
  * sections with title and body extracted to plain text (the RAG/
  * long-context chunk grain).
  */
case class WikiSectionsExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(CodeExprs.WikiSectionSchema, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.wikiSectionsArray(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.wikiSectionsArray($t);")
  override protected def withNewChildInternal(c: Expression): WikiSectionsExpr = copy(child = c)
  override def prettyName: String = "wiki_sections"
}

/** `script_profile(text)` → struct (see [[CodeExprs.ScriptSchema]]):
  * per-script code-point ppm, dominant script, script-derived lang.
  */
case class ScriptProfileExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = CodeExprs.ScriptSchema
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.scriptProfileRow(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.scriptProfileRow($t);")
  override protected def withNewChildInternal(c: Expression): ScriptProfileExpr = copy(child = c)
  override def prettyName: String = "script_profile"
}

/** `wiki_dump_text(xml)` → main-namespace non-redirect pages extracted
  * and joined — the one-projection dispatch branch for dump shards.
  */
case class WikiDumpTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.wikiDumpTextStr(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.wikiDumpTextStr($t);")
  override protected def withNewChildInternal(c: Expression): WikiDumpTextExpr = copy(child = c)
  override def prettyName: String = "wiki_dump_text"
}

/** `synth_wikitext(seed)` — deterministic all-rules wikitext fixture
  * ([[graft.sources.WikiCodec.synthWikitext]]).
  */
case class SynthWikitextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(seed: Any): Any =
    UTF8String.fromString(graft.sources.WikiCodec.synthWikitext(seed.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.sources.WikiCodec.synthWikitext($s));")
  override protected def withNewChildInternal(c: Expression): SynthWikitextExpr = copy(child = c)
  override def prettyName: String = "synth_wikitext"
}

/** `synth_wiki_dump(seed, n_pages)` — deterministic MediaWiki dump-XML
  * shard ([[graft.sources.WikiCodec.synthWikiDump]]).
  */
case class SynthWikiDumpExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(seed: Any, n: Any): Any =
    UTF8String.fromString(graft.sources.WikiCodec.synthWikiDump(
      seed.asInstanceOf[Long], n.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.sources.WikiCodec.synthWikiDump($s, $n));")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthWikiDumpExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_wiki_dump"
}

/** `gunzip_text(bin)` → UTF-8 text of all concatenated gzip members
  * ([[graft.sources.GzipShard.gunzipAll]]); null for non-gzip bytes.
  */
case class GunzipTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val raw = graft.sources.GzipShard.gunzipAll(b.asInstanceOf[Array[Byte]])
    if (raw == null) null else UTF8String.fromBytes(raw)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("gz")
      s"""
         |byte[] $r = graft.sources.GzipShard.gunzipAll($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): GunzipTextExpr = copy(child = c)
  override def prettyName: String = "gunzip_text"
}

/** `jsonl_gz_text(bin)` → newline-joined `text` fields of a
  * `.jsonl.gz` shard ([[graft.sources.GzipShard.jsonlGzText]]) — the
  * dispatch branch for pretraining shards.
  */
case class JsonlGzTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.GzipShard.jsonlGzText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("jl")
      s"""
         |String $r = graft.sources.GzipShard.jsonlGzText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): JsonlGzTextExpr = copy(child = c)
  override def prettyName: String = "jsonl_gz_text"
}

/** `synth_jsonl_gz(seed, n_members, lines_per)` — deterministic
  * multi-member `.jsonl.gz` fixture ([[graft.sources.GzipShard]]).
  */
case class SynthJsonlGzExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.GzipShard.synthJsonlGz(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.GzipShard.synthJsonlGz($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlGzExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_gz"
}

/** `unzstd_text(bin)` → UTF-8 text of all concatenated zstd frames
  * ([[graft.sources.ZstdCodec.unzstdText]], damage-tolerant); null for
  * non-zstd bytes — the `gunzip_text` analog for `.zst` shards.
  */
case class UnzstdTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.ZstdCodec.unzstdText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("zs")
      s"""
         |String $r = graft.sources.ZstdCodec.unzstdText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): UnzstdTextExpr = copy(child = c)
  override def prettyName: String = "unzstd_text"
}

/** `jsonl_zst_text(bin)` → newline-joined `text` fields of a
  * `.jsonl.zst` shard ([[graft.sources.ZstdCodec.jsonlZstText]]) — the
  * dispatch branch for zstd-era pretraining shards (Dolma,
  * RedPajama-v2).
  */
case class JsonlZstTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.ZstdCodec.jsonlZstText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("jz")
      s"""
         |String $r = graft.sources.ZstdCodec.jsonlZstText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): JsonlZstTextExpr = copy(child = c)
  override def prettyName: String = "jsonl_zst_text"
}

/** `synth_jsonl_zst(seed, n_members, lines_per)` — deterministic
  * multi-frame `.jsonl.zst` fixture ([[graft.sources.ZstdCodec]]),
  * rotating raw / LZ+FSE / Huffman-literal frame strategies.
  */
case class SynthJsonlZstExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.ZstdCodec.synthJsonlZst(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.ZstdCodec.synthJsonlZst($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlZstExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_zst"
}

/** `unxz_text(bin)` → UTF-8 text of all concatenated XZ streams
  * ([[graft.sources.XzCodec.unxzText]], damage-tolerant); null for
  * non-xz bytes — the third member of the gunzip/unzstd family.
  */
case class UnxzTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.XzCodec.unxzText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("xz")
      s"""
         |String $r = graft.sources.XzCodec.unxzText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): UnxzTextExpr = copy(child = c)
  override def prettyName: String = "unxz_text"
}

/** `jsonl_xz_text(bin)` → newline-joined `text` fields of a
  * `.jsonl.xz` shard ([[graft.sources.XzCodec.jsonlXzText]]).
  */
case class JsonlXzTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.XzCodec.jsonlXzText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("jx")
      s"""
         |String $r = graft.sources.XzCodec.jsonlXzText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): JsonlXzTextExpr = copy(child = c)
  override def prettyName: String = "jsonl_xz_text"
}

/** `synth_jsonl_xz(seed, n_members, lines_per)` — deterministic
  * multi-stream `.jsonl.xz` fixture ([[graft.sources.XzCodec]]),
  * rotating CRC32/CRC64/SHA-256 stream checks.
  */
case class SynthJsonlXzExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.XzCodec.synthJsonlXz(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.XzCodec.synthJsonlXz($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlXzExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_xz"
}

/** `unlz4_text(bin)` → UTF-8 text of all concatenated LZ4 frames
  * ([[graft.sources.Lz4Codec.unlz4Text]], damage-tolerant); null for
  * non-lz4 bytes — the fifth member of the gunzip/unzstd/unxz/unbzip2
  * family.
  */
case class UnLz4TextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.Lz4Codec.unlz4Text(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("lz")
      s"""
         |String $r = graft.sources.Lz4Codec.unlz4Text($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): UnLz4TextExpr = copy(child = c)
  override def prettyName: String = "unlz4_text"
}

/** `jsonl_lz4_text(bin)` → newline-joined `text` fields of a
  * `.jsonl.lz4` shard ([[graft.sources.Lz4Codec.jsonlLz4Text]]).
  */
case class JsonlLz4TextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.Lz4Codec.jsonlLz4Text(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("jl")
      s"""
         |String $r = graft.sources.Lz4Codec.jsonlLz4Text($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): JsonlLz4TextExpr = copy(child = c)
  override def prettyName: String = "jsonl_lz4_text"
}

/** `synth_jsonl_lz4(seed, n_members, lines_per)` — deterministic
  * multi-frame `.jsonl.lz4` fixture ([[graft.sources.Lz4Codec]]),
  * rotating block max sizes and the optional content-size /
  * content-checksum / block-checksum features across members.
  */
case class SynthJsonlLz4Expr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.Lz4Codec.synthJsonlLz4(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.Lz4Codec.synthJsonlLz4($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlLz4Expr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_lz4"
}

/** `synth_jsonl_lz4_legacy(seed, n_members, lines_per)` — fixture
  * ALTERNATING legacy (`lz4 -l`, 0x184C2102) and modern frames, the
  * mixed-writer shard shape ([[graft.sources.Lz4Codec.synthJsonlLz4Legacy]]).
  */
case class SynthJsonlLz4LegacyExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.Lz4Codec.synthJsonlLz4Legacy(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.Lz4Codec.synthJsonlLz4Legacy($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlLz4LegacyExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_lz4_legacy"
}

/** `synth_jsonl_lz4_dict(seed, n_members, lines_per)` — fixture whose
  * member frames are compressed against the shared raw-content
  * dictionary AND declare its DictID
  * ([[graft.sources.Lz4Codec.synthJsonlLz4Dict]]); decoding without
  * the dictionary (or with the wrong id) is loud at the frame header.
  */
case class SynthJsonlLz4DictExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.Lz4Codec.synthJsonlLz4Dict(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.Lz4Codec.synthJsonlLz4Dict($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlLz4DictExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_lz4_dict"
}

/** `unlz4_dict_text(bin)` → UTF-8 text of a dictionary-compressed lz4
  * shard decoded against the shared dictionary with its id enforced
  * ([[graft.sources.Lz4Codec.unlz4DictText]], damage-tolerant); null
  * for non-lz4 bytes.
  */
case class UnLz4DictTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.Lz4Codec.unlz4DictText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("lzd")
      s"""
         |String $r = graft.sources.Lz4Codec.unlz4DictText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): UnLz4DictTextExpr = copy(child = c)
  override def prettyName: String = "unlz4_dict_text"
}

/** `unsnappy_text(bin)` → UTF-8 text of all concatenated snappy-framed
  * streams ([[graft.sources.SnappyCodec.unsnappyText]],
  * damage-tolerant); null for non-framed bytes — the sixth member of
  * the gunzip/unzstd/unxz/unbzip2/unlz4 family.
  */
case class UnsnappyTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.SnappyCodec.unsnappyText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("sn")
      s"""
         |String $r = graft.sources.SnappyCodec.unsnappyText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): UnsnappyTextExpr = copy(child = c)
  override def prettyName: String = "unsnappy_text"
}

/** `synth_jsonl_snappy_hadoop(seed, n_members, lines_per)` — fixture
  * in the magic-less Hadoop-snappy container (BE block/chunk lengths),
  * rotating single- and multi-chunk blocks
  * ([[graft.sources.SnappyCodec.synthJsonlSnappyHadoop]]).
  */
case class SynthJsonlSnappyHadoopExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.SnappyCodec.synthJsonlSnappyHadoop(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.SnappyCodec.synthJsonlSnappyHadoop($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlSnappyHadoopExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_snappy_hadoop"
}

/** `synth_7z(seed, n_files)` — deterministic store-only 7z archive
  * ([[graft.sources.SevenZipCodec.synthSevenZip]]), readable by the
  * real implementation (SevenZipCodecSpec pins SevenZFile acceptance).
  */
case class SynthSevenZipExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    graft.sources.SevenZipCodec.synthSevenZip(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.SevenZipCodec.synthSevenZip($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthSevenZipExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_7z"
}

/** `sevenzip_entries(bin)` → `array<struct<name, n_bytes, has_stream>>`
  * from the archive HEADER only — no payload decompression
  * ([[graft.sources.SevenZipCodec.entries]]); null for non-7z bytes.
  */
case class SevenZipEntriesExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("has_stream", BooleanType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    CodeExprs.sevenZipEntriesArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("sze")
      s"""
         |ArrayData $r = graft.functions.CodeExprs.sevenZipEntriesArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): SevenZipEntriesExpr = copy(child = c)
  override def prettyName: String = "sevenzip_entries"
}

/** `sevenzip_text(bin)` → newline-joined UTF-8 text of every streamed
  * member ([[graft.sources.SevenZipCodec.sevenZipText]]); null for
  * non-7z bytes or when nothing extracts.
  */
case class SevenZipTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.SevenZipCodec.sevenZipText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("szt")
      s"""
         |String $r = graft.sources.SevenZipCodec.sevenZipText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): SevenZipTextExpr = copy(child = c)
  override def prettyName: String = "sevenzip_text"
}

/** `jsonl_snappy_hadoop_text(bin)` → newline-joined `text` fields of a
  * Hadoop-container `.snappy` shard
  * ([[graft.sources.SnappyCodec.jsonlSnappyHadoopText]]).
  */
case class JsonlSnappyHadoopTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.SnappyCodec.jsonlSnappyHadoopText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("snhj")
      s"""
         |String $r = graft.sources.SnappyCodec.jsonlSnappyHadoopText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): JsonlSnappyHadoopTextExpr = copy(child = c)
  override def prettyName: String = "jsonl_snappy_hadoop_text"
}

/** `unsnappy_hadoop_text(bin)` → UTF-8 text of a Hadoop-snappy
  * container ([[graft.sources.SnappyCodec.unsnappyHadoopText]],
  * tolerant, block-grain prefix on damage); null when the geometry
  * does not walk.
  */
case class UnsnappyHadoopTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.SnappyCodec.unsnappyHadoopText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("snh")
      s"""
         |String $r = graft.sources.SnappyCodec.unsnappyHadoopText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): UnsnappyHadoopTextExpr = copy(child = c)
  override def prettyName: String = "unsnappy_hadoop_text"
}

/** `jsonl_snappy_text(bin)` → newline-joined `text` fields of a
  * `.jsonl.sz` shard ([[graft.sources.SnappyCodec.jsonlSnappyText]]).
  */
case class JsonlSnappyTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.SnappyCodec.jsonlSnappyText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("js")
      s"""
         |String $r = graft.sources.SnappyCodec.jsonlSnappyText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): JsonlSnappyTextExpr = copy(child = c)
  override def prettyName: String = "jsonl_snappy_text"
}

/** `synth_jsonl_snappy(seed, n_members, lines_per)` — deterministic
  * multi-stream `.jsonl.sz` fixture ([[graft.sources.SnappyCodec]]),
  * padding chunks rotated in so the skip branch stays gated.
  */
case class SynthJsonlSnappyExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.SnappyCodec.synthJsonlSnappy(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.SnappyCodec.synthJsonlSnappy($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlSnappyExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_snappy"
}

/** `unbzip2_text(bin)` → UTF-8 text of all concatenated bzip2 streams
  * ([[graft.sources.BzipCodec.unbzip2Text]], damage-tolerant); null
  * for non-bz2 bytes — the fourth member of the gunzip/unzstd/unxz
  * family, and the wiki-dump front door's decode step.
  */
case class Unbzip2TextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.BzipCodec.unbzip2Text(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("bz")
      s"""
         |String $r = graft.sources.BzipCodec.unbzip2Text($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Unbzip2TextExpr = copy(child = c)
  override def prettyName: String = "unbzip2_text"
}

/** `jsonl_bz2_text(bin)` → newline-joined `text` fields of a
  * `.jsonl.bz2` shard ([[graft.sources.BzipCodec.jsonlBz2Text]]).
  */
case class JsonlBz2TextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.BzipCodec.jsonlBz2Text(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("jb")
      s"""
         |String $r = graft.sources.BzipCodec.jsonlBz2Text($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): JsonlBz2TextExpr = copy(child = c)
  override def prettyName: String = "jsonl_bz2_text"
}

/** `synth_jsonl_bz2(seed, n_members, lines_per)` — deterministic
  * multistream `.jsonl.bz2` fixture ([[graft.sources.BzipCodec]]),
  * one from-scratch-compressed stream per member, levels rotating.
  */
case class SynthJsonlBz2Expr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.BzipCodec.synthJsonlBz2(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.BzipCodec.synthJsonlBz2($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlBz2Expr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_bz2"
}

/** `synth_wiki_bz2(seed, n_pages)` — the
  * `pages-articles-multistream.xml.bz2` fixture: the synthetic dump
  * XML split at `<page>` boundaries, one bz2 stream per chunk, whose
  * concatenated decode is exactly the uncompressed dump.
  */
case class SynthWikiBz2Expr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    graft.sources.BzipCodec.synthWikiBz2(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.BzipCodec.synthWikiBz2($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthWikiBz2Expr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_wiki_bz2"
}

/** `synth_jsonl_zst_seekable(seed, n, lines)` — the `.jsonl.zst`
  * fixture with a trailing SEEK TABLE (the public zstd seekable
  * format), the random-access shard form corpus tooling ships.
  */
case class SynthJsonlZstSeekableExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.ZstdCodec.synthJsonlZstSeekable(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.ZstdCodec.synthJsonlZstSeekable($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlZstSeekableExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_zst_seekable"
}

/** `synth_jsonl_zst_dict(seed, n_members, lines_per)` — the
  * dictionary-compressed `.jsonl.zst` fixture: every member frame
  * references the shared raw-content dictionary
  * ([[graft.sources.ZstdCodec.jsonlDict]]) — the small-document-store
  * shard form.
  */
case class SynthJsonlZstDictExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.ZstdCodec.synthJsonlZstDict(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.ZstdCodec.synthJsonlZstDict($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlZstDictExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_zst_dict"
}

/** `unzstd_dict_text(bin)` → UTF-8 text of a dictionary-compressed
  * shard, every frame decoded with the shared raw-content dictionary
  * as window prefix ([[graft.sources.ZstdCodec.decompressWithPrefix]]).
  */
case class UnzstdDictTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.ZstdCodec.unzstdDictText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("zd")
      s"""
         |String $r = graft.sources.ZstdCodec.unzstdDictText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): UnzstdDictTextExpr = copy(child = c)
  override def prettyName: String = "unzstd_dict_text"
}

/** `synth_jsonl_zst_sdict(seed, n_members, lines_per)` — deterministic
  * multi-frame shard whose members DECLARE the structured dictionary's
  * id ([[graft.sources.ZstdCodec.synthJsonlZstSdict]]).
  */
case class SynthJsonlZstSdictExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.ZstdCodec.synthJsonlZstSdict(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.ZstdCodec.synthJsonlZstSdict($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlZstSdictExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_zst_sdict"
}

/** `unzstd_sdict_text(bin)` → UTF-8 text of a STRUCTURED-dictionary
  * shard ([[graft.sources.ZstdCodec.unzstdSdictText]]): entropy
  * tables + recent offsets + window content seeded from the parsed
  * RFC 8878 §5 dictionary, frame dictionary ids enforced.
  */
case class UnzstdSdictTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.ZstdCodec.unzstdSdictText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("zs")
      s"""
         |String $r = graft.sources.ZstdCodec.unzstdSdictText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): UnzstdSdictTextExpr = copy(child = c)
  override def prettyName: String = "unzstd_sdict_text"
}

/** `shard_splits(bin)` → array of (off, len) member boundaries of a
  * compressed shard — gzip members (inflate-walked), zstd frames and
  * xz streams (walked by DECLARED sizes, no decompression). The 100 TB
  * planning primitive: each member decodes independently, so one big
  * shard fans out to member-grain splits. Null for formats without
  * member grain (single-stream payloads still yield one split).
  */
case class ShardSplitsExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(CodeExprs.SplitSchema, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    CodeExprs.shardSplitsArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("splits")
      s"""
         |ArrayData $r = graft.functions.CodeExprs.shardSplitsArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): ShardSplitsExpr = copy(child = c)
  override def prettyName: String = "shard_splits"
}

/** `zst_seek_member(bin, k)` → the decoded UTF-8 text of frame `k`
  * ONLY, located through the shard's trailing seek table
  * ([[graft.sources.ZstdCodec.readSeekTable]]) — true random access:
  * no byte of any other frame is decompressed. Null when the shard
  * has no seek table or `k` is out of range.
  */
case class ZstSeekMemberExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, k: Any): Any = {
    val s = CodeExprs.zstSeekMember(b.asInstanceOf[Array[Byte]], k.asInstanceOf[Int])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) => {
      val r = ctx.freshName("seek")
      s"""
         |String $r = graft.functions.CodeExprs.zstSeekMember($b, $k);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZstSeekMemberExpr =
    copy(left = l, right = r)
  override def prettyName: String = "zst_seek_member"
}

/** `bz2_block_starts(bin)` → BIT offsets of every bzip2 block magic —
  * the split plan for the single-stream form (one stream, many
  * self-contained blocks at arbitrary bit positions; the Hadoop
  * splittable-bz2 heuristic). Null for non-bz2/damaged payloads.
  */
case class Bz2BlockStartsExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    CodeExprs.bz2BlockStartsArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("bzs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.CodeExprs.bz2BlockStartsArray($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Bz2BlockStartsExpr = copy(child = c)
  override def prettyName: String = "bz2_block_starts"
}

/** `bz2_block_text(bin, k)` → the k-th block of a single-stream bzip2
  * payload decoded STANDALONE (block CRC verified) — random access
  * without touching the preceding blocks.
  */
case class Bz2BlockTextExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, k: Any): Any = {
    val s = CodeExprs.bz2BlockText(b.asInstanceOf[Array[Byte]], k.asInstanceOf[Int])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) => {
      val r = ctx.freshName("bzt")
      s"""
         |String $r = graft.functions.CodeExprs.bz2BlockText($b, $k);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Bz2BlockTextExpr =
    copy(left = l, right = r)
  override def prettyName: String = "bz2_block_text"
}

/** `synth_jsonl_bz2_blocked(seed, n_blocks, lines_per)` — the
  * single-stream multi-BLOCK `.jsonl.bz2` fixture (one block per
  * member inside one stream, the non-multistream dump shape).
  */
case class SynthJsonlBz2BlockedExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, m: Any, l: Any): Any =
    graft.sources.BzipCodec.synthJsonlBz2Blocked(seed.asInstanceOf[Long],
      m.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, m, l) =>
      s"${ev.value} = graft.sources.BzipCodec.synthJsonlBz2Blocked($seed, $m, $l);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthJsonlBz2BlockedExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_jsonl_bz2_blocked"
}

/** `latex_text(tex)` → plain text ([[graft.sources.MarkupCodec]]). */
case class LatexTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.latexStr(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.latexStr($t);")
  override protected def withNewChildInternal(c: Expression): LatexTextExpr = copy(child = c)
  override def prettyName: String = "latex_text"
}

/** `csv_sniff(text)` → struct{delim, quote, header, n_cols}
  * ([[graft.sources.CsvSniff]]).
  */
case class CsvSniffExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = CodeExprs.CsvSchema
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.csvSniffRow(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.csvSniffRow($t);")
  override protected def withNewChildInternal(c: Expression): CsvSniffExpr = copy(child = c)
  override def prettyName: String = "csv_sniff"
}

/** `sent_split(text)` → array of trimmed sentences
  * ([[graft.sources.MarkupCodec.sentenceSplit]]).
  */
case class SentSplitExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.sentSplitArray(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.sentSplitArray($t);")
  override protected def withNewChildInternal(c: Expression): SentSplitExpr = copy(child = c)
  override def prettyName: String = "sent_split"
}

/** `secret_scan(text)` → struct{redacted, n_secrets, kinds}
  * ([[graft.sources.SecretScan]]) — credential redaction for corpus
  * sanitization.
  */
case class SecretScanExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = CodeExprs.SecretSchema
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.secretScanRow(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.secretScanRow($t);")
  override protected def withNewChildInternal(c: Expression): SecretScanExpr = copy(child = c)
  override def prettyName: String = "secret_scan"
}

/** `unicode_norm(text, form)` — canonical/compatibility Unicode
  * normalization (NFC/NFD/NFKC/NFKD via `java.text.Normalizer`). The
  * exact-dedup prerequisite: visually identical text with different
  * codepoint sequences (composed vs decomposed accents, compatibility
  * ligatures) must hash equal before any fingerprint. `form` is a
  * plan-time literal — it selects the compiled transform, like
  * `scan_seeded`'s quality.
  */
case class UnicodeNormExpr(child: Expression, form: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unicode_norm: unknown form $form")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any =
    CodeExprs.unicodeNorm(t.asInstanceOf[UTF8String], form)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("form", form, "java.lang.String")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.unicodeNorm($t, $f);")
  }
  override protected def withNewChildInternal(c: Expression): UnicodeNormExpr = copy(child = c)
  override def prettyName: String = "unicode_norm"
}

/** `diff_stats(text)` → array of per-file {file, added, removed}
  * entries of a unified diff ([[graft.sources.DiffCodec]]).
  */
case class DiffStatsExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(CodeExprs.DiffStatSchema, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = CodeExprs.diffStatsArray(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CodeExprs.diffStatsArray($t);")
  override protected def withNewChildInternal(c: Expression): DiffStatsExpr = copy(child = c)
  override def prettyName: String = "diff_stats"
}

/** Column-level entry points. */
object CodeOps {
  def codeLang(path: Column, content: Column): Column =
    GraftExpr.toColumn(CodeLangExpr(GraftExpr.toExpr(path), GraftExpr.toExpr(content)))
  def codeMetrics(text: Column): Column =
    GraftExpr.toColumn(CodeMetricsExpr(GraftExpr.toExpr(text)))
  def stripComments(text: Column, lang: Column): Column =
    GraftExpr.toColumn(StripCommentsExpr(GraftExpr.toExpr(text), GraftExpr.toExpr(lang)))
  def licenseDetect(text: Column): Column =
    GraftExpr.toColumn(LicenseDetectExpr(GraftExpr.toExpr(text)))
  def markdownText(md: Column): Column =
    GraftExpr.toColumn(MarkdownTextExpr(GraftExpr.toExpr(md)))
  def latexText(tex: Column): Column =
    GraftExpr.toColumn(LatexTextExpr(GraftExpr.toExpr(tex)))
  def wikitextText(wt: Column): Column =
    GraftExpr.toColumn(WikitextTextExpr(GraftExpr.toExpr(wt)))
  def wikiPages(xml: Column): Column =
    GraftExpr.toColumn(WikiPagesExpr(GraftExpr.toExpr(xml)))
  def wikiDumpText(xml: Column): Column =
    GraftExpr.toColumn(WikiDumpTextExpr(GraftExpr.toExpr(xml)))
  def wikiIsRedirect(wt: Column): Column =
    GraftExpr.toColumn(WikiIsRedirectExpr(GraftExpr.toExpr(wt)))
  def scriptProfile(text: Column): Column =
    GraftExpr.toColumn(ScriptProfileExpr(GraftExpr.toExpr(text)))
  def wikiSections(wt: Column): Column =
    GraftExpr.toColumn(WikiSectionsExpr(GraftExpr.toExpr(wt)))
  def synthWikitext(seed: Column): Column =
    GraftExpr.toColumn(SynthWikitextExpr(GraftExpr.toExpr(seed)))
  def synthWikiDump(seed: Column, nPages: Column): Column =
    GraftExpr.toColumn(SynthWikiDumpExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nPages)))
  def gunzipText(bin: Column): Column =
    GraftExpr.toColumn(GunzipTextExpr(GraftExpr.toExpr(bin)))
  def jsonlGzText(bin: Column): Column =
    GraftExpr.toColumn(JsonlGzTextExpr(GraftExpr.toExpr(bin)))
  def synthJsonlGz(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlGzExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMembers),
      GraftExpr.toExpr(linesPer)))
  def unzstdText(bin: Column): Column =
    GraftExpr.toColumn(UnzstdTextExpr(GraftExpr.toExpr(bin)))
  def jsonlZstText(bin: Column): Column =
    GraftExpr.toColumn(JsonlZstTextExpr(GraftExpr.toExpr(bin)))
  def synthJsonlZst(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlZstExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMembers),
      GraftExpr.toExpr(linesPer)))
  def unxzText(bin: Column): Column =
    GraftExpr.toColumn(UnxzTextExpr(GraftExpr.toExpr(bin)))
  def jsonlXzText(bin: Column): Column =
    GraftExpr.toColumn(JsonlXzTextExpr(GraftExpr.toExpr(bin)))
  def synthJsonlXz(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlXzExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMembers),
      GraftExpr.toExpr(linesPer)))
  def unlz4Text(bin: Column): Column =
    GraftExpr.toColumn(UnLz4TextExpr(GraftExpr.toExpr(bin)))
  def unsnappyText(bin: Column): Column =
    GraftExpr.toColumn(UnsnappyTextExpr(GraftExpr.toExpr(bin)))
  def jsonlSnappyText(bin: Column): Column =
    GraftExpr.toColumn(JsonlSnappyTextExpr(GraftExpr.toExpr(bin)))
  def synthJsonlSnappy(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlSnappyExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMembers),
      GraftExpr.toExpr(linesPer)))
  def synthJsonlSnappyHadoop(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlSnappyHadoopExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMembers),
      GraftExpr.toExpr(linesPer)))
  def unsnappyHadoopText(bin: Column): Column =
    GraftExpr.toColumn(UnsnappyHadoopTextExpr(GraftExpr.toExpr(bin)))
  def jsonlSnappyHadoopText(bin: Column): Column =
    GraftExpr.toColumn(JsonlSnappyHadoopTextExpr(GraftExpr.toExpr(bin)))
  def synthSevenZip(seed: Column, nFiles: Column): Column =
    GraftExpr.toColumn(SynthSevenZipExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nFiles)))
  def sevenZipEntries(bin: Column): Column =
    GraftExpr.toColumn(SevenZipEntriesExpr(GraftExpr.toExpr(bin)))
  def sevenZipText(bin: Column): Column =
    GraftExpr.toColumn(SevenZipTextExpr(GraftExpr.toExpr(bin)))
  def jsonlLz4Text(bin: Column): Column =
    GraftExpr.toColumn(JsonlLz4TextExpr(GraftExpr.toExpr(bin)))
  def synthJsonlLz4(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlLz4Expr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMembers),
      GraftExpr.toExpr(linesPer)))
  def synthJsonlLz4Legacy(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlLz4LegacyExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMembers),
      GraftExpr.toExpr(linesPer)))
  def synthJsonlLz4Dict(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlLz4DictExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMembers),
      GraftExpr.toExpr(linesPer)))
  def unlz4DictText(bin: Column): Column =
    GraftExpr.toColumn(UnLz4DictTextExpr(GraftExpr.toExpr(bin)))
  def unbzip2Text(bin: Column): Column =
    GraftExpr.toColumn(Unbzip2TextExpr(GraftExpr.toExpr(bin)))
  def jsonlBz2Text(bin: Column): Column =
    GraftExpr.toColumn(JsonlBz2TextExpr(GraftExpr.toExpr(bin)))
  def synthJsonlBz2(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlBz2Expr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMembers),
      GraftExpr.toExpr(linesPer)))
  def synthWikiBz2(seed: Column, nPages: Column): Column =
    GraftExpr.toColumn(SynthWikiBz2Expr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nPages)))
  def synthJsonlZstDict(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlZstDictExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMembers),
      GraftExpr.toExpr(linesPer)))
  def unzstdDictText(bin: Column): Column =
    GraftExpr.toColumn(UnzstdDictTextExpr(GraftExpr.toExpr(bin)))
  def synthJsonlZstSdict(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlZstSdictExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nMembers),
      GraftExpr.toExpr(linesPer)))
  def unzstdSdictText(bin: Column): Column =
    GraftExpr.toColumn(UnzstdSdictTextExpr(GraftExpr.toExpr(bin)))
  def bz2BlockStarts(bin: Column): Column =
    GraftExpr.toColumn(Bz2BlockStartsExpr(GraftExpr.toExpr(bin)))
  def bz2BlockText(bin: Column, k: Column): Column =
    GraftExpr.toColumn(Bz2BlockTextExpr(GraftExpr.toExpr(bin), GraftExpr.toExpr(k)))
  def synthJsonlBz2Blocked(seed: Column, nBlocks: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlBz2BlockedExpr(GraftExpr.toExpr(seed),
      GraftExpr.toExpr(nBlocks), GraftExpr.toExpr(linesPer)))
  def shardSplits(bin: Column): Column =
    GraftExpr.toColumn(ShardSplitsExpr(GraftExpr.toExpr(bin)))
  def zstSeekMember(bin: Column, k: Column): Column =
    GraftExpr.toColumn(ZstSeekMemberExpr(GraftExpr.toExpr(bin), GraftExpr.toExpr(k)))
  def synthJsonlZstSeekable(seed: Column, nMembers: Column, linesPer: Column): Column =
    GraftExpr.toColumn(SynthJsonlZstSeekableExpr(GraftExpr.toExpr(seed),
      GraftExpr.toExpr(nMembers), GraftExpr.toExpr(linesPer)))
  def csvSniff(text: Column): Column =
    GraftExpr.toColumn(CsvSniffExpr(GraftExpr.toExpr(text)))
  def sentSplit(text: Column): Column =
    GraftExpr.toColumn(SentSplitExpr(GraftExpr.toExpr(text)))
  def secretScan(text: Column): Column =
    GraftExpr.toColumn(SecretScanExpr(GraftExpr.toExpr(text)))
  def unicodeNorm(text: Column, form: String): Column =
    GraftExpr.toColumn(UnicodeNormExpr(GraftExpr.toExpr(text), form))
  def diffStats(text: Column): Column =
    GraftExpr.toColumn(DiffStatsExpr(GraftExpr.toExpr(text)))
}
