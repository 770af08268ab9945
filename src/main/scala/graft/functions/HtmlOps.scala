package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML content extraction — the first content stage of a crawl
  * pipeline (WARC response payloads ARE HTML): one single-pass,
  * never-throws tokenizer producing the three things downstream stages
  * consume, in one parse per document:
  *
  *   - `text`: visible text — tags stripped; `script`/`style`/
  *     `noscript`/`template` subtrees and comments dropped; entities
  *     decoded (named basics + numeric); whitespace collapsed, block
  *     tags become newlines. This is what quality scoring, language
  *     ID, dedup shingling and boilerplate stripping run on.
  *   - `title`: the first `<title>` text (null when absent).
  *   - `links`: every `<a href>`/`<area href>` value, in document
  *     order, raw (resolve against the page URL with
  *     [[UrlOps.urlResolve]] before handing them to the frontier).
  *
  * Exposed as ONE struct expression (`html_extract`) so a plan that
  * needs text AND links parses once — the same single-parse discipline
  * as `pdf_rasterize_all` vs the page-grain expression.
  *
  * This is a TOKENIZER, not a DOM: no tree, no CSS, no JS — the right
  * tool at corpus scale where a malformed tag soup must degrade to
  * "best-effort text" rather than an error. Total on any input.
  */
object HtmlOps {

  val ExtractSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("links", ArrayType(StringType, containsNull = false), nullable = false)))

  private val BlockTags = Set(
    "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table", "section", "article",
    "header", "footer", "nav", "aside", "main", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "hr", "dt", "dd")
  private val SkipTags = Set("script", "style", "noscript", "template")

  /** First case-insensitive occurrence of `needle` at or after `from`,
    * scanning the ORIGINAL string — indexing positions found in a
    * `toLowerCase` copy is wrong because lowercasing can change string
    * LENGTH (U+0130 İ → 'i' + U+0307), silently drifting every
    * position after such a char.
    */
  private def indexOfIgnoreCase(html: String, needle: String, from: Int): Int = {
    val last = html.length - needle.length
    var i = math.max(0, from)
    while (i <= last) {
      if (html.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  final case class Extracted(text: String, title: String, links: Seq[String])

  /** One-pass extraction; total on any byte soup. */
  def extract(html: String): Extracted = {
    if (html == null) return Extracted("", null, Seq.empty)
    val n = html.length
    val text = new java.lang.StringBuilder(n / 4)
    val links = Seq.newBuilder[String]
    var title: String = null
    var inTitle = false
    val titleBuf = new java.lang.StringBuilder
    var pendingSpace = false
    var pendingBreak = false
    var i = 0

    def emit(c: Char): Unit = {
      val sb = if (inTitle) titleBuf else text
      if (Character.isWhitespace(c)) { if (sb.length() > 0) pendingSpace = true }
      else {
        if (pendingBreak) {
          if (!inTitle && text.length() > 0) text.append('\n')
          pendingBreak = false; pendingSpace = false
        } else if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
    }

    def decodeEntity(from: Int): (Char, Int) = {
      // from points at '&'; returns (char, next index); bare '&' on no match
      val semi = html.indexOf(';', from + 1)
      if (semi < 0 || semi - from > 10) return ('&', from + 1)
      val name = html.substring(from + 1, semi)
      val c: Int = name match {
        case "amp" => '&'
        case "lt" => '<'
        case "gt" => '>'
        case "quot" => '"'
        case "apos" => '\''
        case "nbsp" => ' '
        case _ if name.startsWith("#x") || name.startsWith("#X") =>
          try Integer.parseInt(name.substring(2), 16) catch { case _: Exception => -1 }
        case _ if name.startsWith("#") =>
          try Integer.parseInt(name.substring(1)) catch { case _: Exception => -1 }
        case _ => -1
      }
      if (c < 0 || c > 0x10FFFF || Character.isSurrogate(c.toChar)) ('&', from + 1)
      else (c.toChar, semi + 1)
    }

    def tagNameAt(start: Int): String = {
      var j = start
      while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
      html.substring(start, j).toLowerCase(java.util.Locale.ROOT)
    }

    /** href attribute inside tag bytes [from, to). */
    def hrefIn(from: Int, to: Int): Option[String] = {
      val seg = html.substring(from, math.min(to, n))
      val lower = seg.toLowerCase(java.util.Locale.ROOT)
      var k = 0
      while (k >= 0) {
        k = lower.indexOf("href", k)
        if (k < 0) return None
        // must be a standalone attr name followed by =
        val before = if (k == 0) ' ' else seg.charAt(k - 1)
        var j = k + 4
        while (j < seg.length && Character.isWhitespace(seg.charAt(j))) j += 1
        if (Character.isWhitespace(before) && j < seg.length && seg.charAt(j) == '=') {
          j += 1
          while (j < seg.length && Character.isWhitespace(seg.charAt(j))) j += 1
          if (j < seg.length) {
            val q = seg.charAt(j)
            if (q == '"' || q == '\'') {
              val e = seg.indexOf(q, j + 1)
              return Some(seg.substring(j + 1, if (e < 0) seg.length else e))
            }
            var e = j
            while (e < seg.length && !Character.isWhitespace(seg.charAt(e))) e += 1
            return Some(seg.substring(j, e))
          }
          return None
        }
        k += 4
      }
      None
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val close = i + 1 < n && html.charAt(i + 1) == '/'
          val nameStart = if (close) i + 2 else i + 1
          val name = tagNameAt(nameStart)
          val gt = html.indexOf('>', i + 1)
          val tagEnd = if (gt < 0) n else gt
          if (!close && SkipTags.contains(name)) {
            // skip the whole subtree to the matching close tag
            val found = indexOfIgnoreCase(html, s"</$name", tagEnd)
            i = if (found < 0) n
            else { val g = html.indexOf('>', found); if (g < 0) n else g + 1 }
          } else {
            if (!close && (name == "a" || name == "area"))
              hrefIn(nameStart + name.length, tagEnd).foreach(h => links += h)
            if (name == "title") {
              if (!close) { inTitle = title == null; titleBuf.setLength(0) }
              else if (inTitle) { title = titleBuf.toString.trim; inTitle = false }
              pendingSpace = false
            }
            if (BlockTags.contains(name)) pendingBreak = true
            i = tagEnd + 1
          }
        }
      } else if (c == '&') {
        val (ch, next) = decodeEntity(i)
        emit(ch); i = next
      } else { emit(c); i += 1 }
    }
    if (inTitle) title = titleBuf.toString.trim // unclosed <title>: keep what we saw
    Extracted(text.toString, title, links.result())
  }

  /** Bytes → text for crawl payloads (the WARC → [[extract]] glue):
    * WHATWG-ish charset resolution, total on any input —
    *   1. a BOM wins (UTF-8 / UTF-16BE / UTF-16LE);
    *   2. else a `charset=` token in the first 1024 bytes (`<meta
    *      charset=…>` or `…content="text/html; charset=…"`), when the
    *      JVM knows the charset;
    *   3. else strict UTF-8 when the payload validates;
    *   4. else ISO-8859-1 (total: every byte sequence decodes).
    * Transport-layer charset (the Content-Type header) is the fetch
    * stage's concern — pass those payloads pre-decoded.
    */
  def decodeBytes(b: Array[Byte]): String = {
    if (b == null) return null
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte && b(2) == 0xBF.toByte)
      return new String(b, 3, b.length - 3, java.nio.charset.StandardCharsets.UTF_8)
    if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      return new String(b, 2, b.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
      return new String(b, 2, b.length - 2, java.nio.charset.StandardCharsets.UTF_16LE)
    val head = new String(b, 0, math.min(1024, b.length),
      java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase(java.util.Locale.ROOT)
    val m = "charset=['\"]?([a-z0-9_\\-]+)".r.findFirstMatchIn(head)
    m.foreach { mm =>
      try {
        val cs = java.nio.charset.Charset.forName(mm.group(1))
        return new String(b, cs)
      } catch { case _: Exception => () } // unknown label: fall through
    }
    try {
      java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(b)).toString
    } catch {
      case _: Exception => new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
  }

  def decodeBytesUtf8(b: Array[Byte]): UTF8String = {
    val s = decodeBytes(b)
    if (s == null) null else UTF8String.fromString(s)
  }

  def htmlDecode(bytes: Column): Column =
    GraftExpr.toColumn(HtmlDecodeExpr(GraftExpr.toExpr(bytes)))

  /** Boxed struct row for codegen. */
  def extractRow(html: UTF8String): InternalRow = {
    val e = extract(if (html == null) null else html.toString)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(e.text),
      if (e.title == null) null else UTF8String.fromString(e.title),
      new GenericArrayData(e.links.map(UTF8String.fromString).toArray[Any])))
  }

  def htmlExtract(html: Column): Column =
    GraftExpr.toColumn(HtmlExtractExpr(GraftExpr.toExpr(html)))

  // ------------------------------------------------------------------
  // indexability metadata

  val MetaSchema: StructType = StructType(Seq(
    StructField("noindex", BooleanType, nullable = false),
    StructField("nofollow", BooleanType, nullable = false),
    StructField("canonical", StringType, nullable = true)))

  final case class Meta(noindex: Boolean, nofollow: Boolean, canonical: String)

  /** Crawl-indexability metadata in one pass: `<meta name=robots>`
    * directives (`noindex`, `nofollow`, `none` = both; any attribute
    * order, quote style and case) and the FIRST `<link rel=canonical>`
    * href — the page's self-declared dedup key, which a crawl pipeline
    * resolves against the fetch URL and clusters on. Comments are
    * skipped so commented-out tags cannot leak directives. Total on
    * any tag soup.
    */
  def htmlMeta(html: String): Meta = {
    if (html == null) return Meta(noindex = false, nofollow = false, null)
    val n = html.length
    var noindex = false
    var nofollow = false
    var canonical: String = null
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          var j = i + 1
          while (j < n && Character.isLetter(html.charAt(j))) j += 1
          val tag = html.substring(i + 1, j).toLowerCase(java.util.Locale.ROOT)
          if (tag == "meta" || tag == "link") {
            val (attrs, after) = parseAttrs(html, j)
            if (tag == "meta") {
              val name = attrs.getOrElse("name", attrs.getOrElse("http-equiv", ""))
              if (name.equalsIgnoreCase("robots")) {
                val content = attrs.getOrElse("content", "").toLowerCase(java.util.Locale.ROOT)
                val toks = content.split("[,\\s]+")
                if (toks.contains("noindex") || toks.contains("none")) noindex = true
                if (toks.contains("nofollow") || toks.contains("none")) nofollow = true
              }
            } else {
              val rel = attrs.getOrElse("rel", "")
              if (rel.equalsIgnoreCase("canonical") && canonical == null)
                attrs.get("href") match {
                  case Some(h) if h.nonEmpty => canonical = h
                  case _ =>
                }
            }
            i = after
          } else i = j
        }
      } else i += 1
    }
    Meta(noindex, nofollow, canonical)
  }

  /** Attribute map of one tag starting after its name; returns
    * (lowercased-name → raw value, index after `>`). Quote-aware,
    * tolerant of bare values and missing `>` (stops at EOS).
    */
  private def parseAttrs(html: String, start: Int): (Map[String, String], Int) = {
    val attrs = Map.newBuilder[String, String]
    val n = html.length
    var i = start
    var done = false
    while (i < n && !done) {
      val c = html.charAt(i)
      if (c == '>') { i += 1; done = true }
      else if (c == '/' || Character.isWhitespace(c)) i += 1
      else {
        val ns = i
        while (i < n && html.charAt(i) != '=' && html.charAt(i) != '>' &&
               html.charAt(i) != '/' && !Character.isWhitespace(html.charAt(i))) i += 1
        val name = html.substring(ns, i).toLowerCase(java.util.Locale.ROOT)
        var value = ""
        if (i < n && html.charAt(i) == '=') {
          i += 1
          while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
          if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i)
            val e = html.indexOf(q, i + 1)
            if (e < 0) { value = html.substring(i + 1); i = n }
            else { value = html.substring(i + 1, e); i = e + 1 }
          } else {
            val vs = i
            while (i < n && html.charAt(i) != '>' && !Character.isWhitespace(html.charAt(i))) i += 1
            value = html.substring(vs, i)
          }
        }
        if (name.nonEmpty) attrs += (name -> value)
      }
    }
    (attrs.result(), i)
  }

  // ------------------------------------------------------------------
  // table extraction (the WebTables corpus modality)

  val TableCellSchema: StructType = StructType(Seq(
    StructField("table", IntegerType, nullable = false),
    StructField("row", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("header", BooleanType, nullable = false),
    StructField("text", StringType, nullable = false)))

  final case class TableCell(table: Int, row: Int, col: Int, header: Boolean, text: String)

  /** Every `<td>`/`<th>` cell of every `<table>`, addressed
    * (table, row, col), header-flagged, text entity-decoded and
    * whitespace-collapsed — relational data embedded in pages is its
    * own corpus modality (the WebTables family) and this is its
    * extraction grain. Flat subset, documented: a `<table>` opening
    * inside an open cell flushes that cell (nested tables become
    * sequential tables); cells outside a `<tr>` are ignored; after a
    * `</table>` closes, stray `tr`/`td` emit nothing until a new
    * `<table>` opens; script/style subtrees and comments drop. Single
    * pass, total on tag soup.
    */
  def htmlTables(html: String): Seq[TableCell] = {
    if (html == null) return Seq.empty
    val n = html.length
    val out = Seq.newBuilder[TableCell]
    var table = -1
    var row = -1
    var col = -1
    var open = false
    var inCell = false
    var header = false
    val buf = new java.lang.StringBuilder
    var pendingSpace = false
    def emitChar(c: Char): Unit = if (inCell) {
      if (Character.isWhitespace(c)) { if (buf.length() > 0) pendingSpace = true }
      else {
        if (pendingSpace) { buf.append(' '); pendingSpace = false }
        buf.append(c)
      }
    }
    def flush(): Unit = if (inCell) {
      out += TableCell(table, row, col, header, buf.toString)
      buf.setLength(0); pendingSpace = false; inCell = false
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val close = i + 1 < n && html.charAt(i + 1) == '/'
          val nameStart = if (close) i + 2 else i + 1
          var j = nameStart
          while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
          val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          val gt = html.indexOf('>', i + 1)
          val tagEnd = if (gt < 0) n else gt
          if (!close && (name == "script" || name == "style")) {
            val found = indexOfIgnoreCase(html, s"</$name", tagEnd)
            i = if (found < 0) n
            else { val g = html.indexOf('>', found); if (g < 0) n else g + 1 }
          } else {
            name match {
              case "table" if !close =>
                flush(); table += 1; row = -1; col = -1; open = true
              case "table" => flush(); row = -1; col = -1; open = false
              case "tr" if !close && table >= 0 && open => flush(); row += 1; col = -1
              case "tr" => flush()
              case "td" | "th" if !close && table >= 0 && row >= 0 =>
                flush(); col += 1; inCell = true; header = name == "th"
              case "td" | "th" => flush()
              case _ =>
            }
            i = tagEnd + 1
          }
        }
      } else if (c == '&') {
        val (ch, next) = decodeEntityAt(html, i)
        emitChar(ch); i = next
      } else { emitChar(c); i += 1 }
    }
    flush()
    out.result()
  }

  /** `from` points at `&`; returns (char, next index); bare `&` on no
    * match (the same rules as the extractor's inline decoder).
    */
  private def decodeEntityAt(html: String, from: Int): (Char, Int) = {
    val semi = html.indexOf(';', from + 1)
    if (semi < 0 || semi - from > 10) return ('&', from + 1)
    val name = html.substring(from + 1, semi)
    val c: Int = name match {
      case "amp" => '&'
      case "lt" => '<'
      case "gt" => '>'
      case "quot" => '"'
      case "apos" => '\''
      case "nbsp" => ' '
      case _ if name.startsWith("#x") || name.startsWith("#X") =>
        try Integer.parseInt(name.substring(2), 16) catch { case _: Exception => -1 }
      case _ if name.startsWith("#") =>
        try Integer.parseInt(name.substring(1)) catch { case _: Exception => -1 }
      case _ => -1
    }
    if (c < 0 || c > 0x10FFFF || Character.isSurrogate(c.toChar)) ('&', from + 1)
    else (c.toChar, semi + 1)
  }

  /** Boxed array for codegen. */
  def htmlTablesArray(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cells = htmlTables(if (html == null) null else html.toString)
    new GenericArrayData(cells.map { t =>
      new GenericInternalRow(Array[Any](t.table, t.row, t.col, t.header,
        UTF8String.fromString(t.text))): Any
    }.toArray)
  }

  def htmlTablesCol(html: Column): Column =
    GraftExpr.toColumn(HtmlTablesExpr(GraftExpr.toExpr(html)))

  /** Boxed struct row for codegen. */
  def htmlMetaRow(html: UTF8String): InternalRow = {
    val m = htmlMeta(if (html == null) null else html.toString)
    new GenericInternalRow(Array[Any](m.noindex, m.nofollow,
      if (m.canonical == null) null else UTF8String.fromString(m.canonical)))
  }

  def htmlMetaCol(html: Column): Column =
    GraftExpr.toColumn(HtmlMetaExpr(GraftExpr.toExpr(html)))
}

/** Sitemap XML extraction (sitemaps.org protocol) — the discovery hop
  * between [[RobotsOps.sitemaps]] and the frontier: a `urlset` yields
  * page URLs, a `sitemapindex` yields further sitemap URLs. One
  * never-throws scan for `<url>`/`<sitemap>` entries' `<loc>` (+
  * optional `<lastmod>`), entity-decoded; `is_index` disambiguates the
  * two document kinds so a crawler knows whether to fetch or recurse.
  * Like [[HtmlOps]], a tokenizer rather than an XML DOM — tag soup
  * degrades to fewer entries, never an error.
  */
object SitemapOps {

  val EntrySchema: StructType = StructType(Seq(
    StructField("is_index", BooleanType, nullable = false),
    StructField("locs", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("lastmods", ArrayType(StringType, containsNull = true), nullable = false)))

  final case class Parsed(isIndex: Boolean, locs: Seq[String], lastmods: Seq[String])

  def parse(xml: String): Parsed = {
    if (xml == null) return Parsed(isIndex = false, Seq.empty, Seq.empty)
    val lower = xml.toLowerCase(java.util.Locale.ROOT)
    val isIndex = lower.contains("<sitemapindex")
    val entryTag = if (isIndex) "<sitemap" else "<url"
    val entryClose = if (isIndex) "</sitemap>" else "</url>"
    val locs = Seq.newBuilder[String]
    val mods = Seq.newBuilder[String]
    var i = 0
    def innerText(seg: String, tag: String): Option[String] = {
      val segLower = seg.toLowerCase(java.util.Locale.ROOT)
      val o = segLower.indexOf(s"<$tag")
      if (o < 0) return None
      val gt = seg.indexOf('>', o)
      if (gt < 0) return None
      val c = segLower.indexOf(s"</$tag", gt)
      if (c < 0) return None
      Some(HtmlOps.extract(seg.substring(gt + 1, c)).text.trim).filter(_.nonEmpty)
    }
    while (i >= 0 && i < xml.length) {
      i = lower.indexOf(entryTag, i)
      if (i >= 0) {
        // require a delimiter so "<urlset" does not read as a "<url" entry
        val after = if (i + entryTag.length < xml.length) xml.charAt(i + entryTag.length) else ' '
        if (after == '>' || Character.isWhitespace(after)) {
          val end0 = lower.indexOf(entryClose, i)
          val end = if (end0 < 0) xml.length else end0
          val seg = xml.substring(i, end)
          innerText(seg, "loc").foreach { loc =>
            locs += loc
            mods += innerText(seg, "lastmod").orNull
          }
          i = end + 1
        } else i += entryTag.length
      }
    }
    Parsed(isIndex, locs.result(), mods.result())
  }

  def parseRow(xml: UTF8String): InternalRow = {
    val p = parse(if (xml == null) null else xml.toString)
    new GenericInternalRow(Array[Any](
      p.isIndex,
      new GenericArrayData(p.locs.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(p.lastmods.map(m =>
        if (m == null) null else UTF8String.fromString(m)).toArray[Any])))
  }

  def sitemapParse(xml: Column): Column =
    GraftExpr.toColumn(SitemapParseExpr(GraftExpr.toExpr(xml)))
}

/** struct(is_index, locs, lastmods) of a sitemap XML payload. */
case class SitemapParseExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = SitemapOps.EntrySchema
  override def nullSafeEval(x: Any): Any = SitemapOps.parseRow(x.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.SitemapOps.parseRow($x)")
  override protected def withNewChildInternal(c: Expression): SitemapParseExpr = copy(child = c)
  override def prettyName: String = "sitemap_parse"
}

/** Charset-resolved decode of a raw HTML payload — see
  * [[HtmlOps.decodeBytes]].
  */
case class HtmlDecodeExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullSafeEval(b: Any): Any =
    HtmlOps.decodeBytesUtf8(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.HtmlOps.decodeBytesUtf8($b)")
  override protected def withNewChildInternal(c: Expression): HtmlDecodeExpr = copy(child = c)
  override def prettyName: String = "html_decode"
}

/** array of (table, row, col, header, text) cells of an HTML payload. */
case class HtmlTablesExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(HtmlOps.TableCellSchema, containsNull = false)
  override def nullSafeEval(h: Any): Any = HtmlOps.htmlTablesArray(h.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.HtmlOps.htmlTablesArray($h)")
  override protected def withNewChildInternal(c: Expression): HtmlTablesExpr = copy(child = c)
  override def prettyName: String = "html_tables"
}

/** struct(noindex, nofollow, canonical) of an HTML payload. */
case class HtmlMetaExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = HtmlOps.MetaSchema
  override def nullSafeEval(h: Any): Any = HtmlOps.htmlMetaRow(h.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.HtmlOps.htmlMetaRow($h)")
  override protected def withNewChildInternal(c: Expression): HtmlMetaExpr = copy(child = c)
  override def prettyName: String = "html_meta"
}

/** struct(text, title, links) of an HTML payload — one parse per row. */
case class HtmlExtractExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = HtmlOps.ExtractSchema
  override def nullSafeEval(h: Any): Any = HtmlOps.extractRow(h.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.HtmlOps.extractRow($h)")
  override protected def withNewChildInternal(c: Expression): HtmlExtractExpr = copy(child = c)
  override def prettyName: String = "html_extract"
}
