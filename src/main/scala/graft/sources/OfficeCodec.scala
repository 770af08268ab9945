package graft.sources

import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Office Open XML text extraction (DOCX / XLSX / PPTX) — after PDFs,
  * the document family enterprise corpora carry most. Each format is a
  * [[ZipCodec]] archive of XML parts; extraction is a single-pass,
  * never-throws XML scan in the [[graft.functions.HtmlOps]] style (no
  * DOM, no schema validation — a poisoned part degrades to the text
  * it can prove, and container-level damage surfaces as the usual
  * typed null upstream):
  *
  *   - DOCX: `word/document.xml` — `<w:p>` paragraphs → newline,
  *     `<w:t>` runs (xml:space-preserved) concatenate, `<w:tab/>` →
  *     TAB, `<w:br/>` → newline, entities decoded.
  *   - XLSX: `xl/sharedStrings.xml` (`<si>` items incl. multi-run
  *     `<r><t>` shapes) + every `xl/worksheets/sheet*.xml` — cells
  *     `<c r="A1" t="s|str|inlineStr">` resolve shared / formula /
  *     inline strings and raw numeric `<v>` values.
  *   - PPTX: every `ppt/slides/slide*.xml` — `<a:p>` paragraphs →
  *     newline, `<a:t>` runs concatenate, one string per slide in
  *     slide order.
  *
  * Fixture writers build REAL archives (the same writer path a
  * produce-then-parse oracle gate needs): minimal but well-formed
  * parts with deterministic bytes.
  *
  * Scale shape: bytes → text per row, no Spark state — identical
  * posture to the PDF/WARC codecs.
  */
object OfficeCodec {

  // ------------------------------------------------------------------
  // minimal XML scanning
  // ------------------------------------------------------------------

  private[sources] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val end = s.indexOf(';', i + 1)
        if (end > i && end - i <= 12) {
          val ent = s.substring(i + 1, end)
          val rep: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try String.valueOf(Character.toChars(Integer.parseInt(ent.substring(2), 16)))
              catch { case _: Exception => null }
            case _ if ent.startsWith("#") =>
              try String.valueOf(Character.toChars(Integer.parseInt(ent.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = end + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** One scanned tag: qualified name, attribute source, flags. */
  private final case class Tag(name: String, attrs: String, closing: Boolean,
                               selfClosing: Boolean, end: Int)

  /** Scan the next tag at/after `from`; null when none. Skips
    * comments, PIs and declarations.
    */
  private def nextTag(xml: String, from: Int): Tag = {
    var p = xml.indexOf('<', from)
    while (p >= 0) {
      if (xml.startsWith("<!--", p)) {
        val e = xml.indexOf("-->", p); if (e < 0) return null; p = xml.indexOf('<', e + 3)
      } else if (xml.startsWith("<?", p) || xml.startsWith("<!", p)) {
        val e = xml.indexOf('>', p); if (e < 0) return null; p = xml.indexOf('<', e + 1)
      } else {
        val e = xml.indexOf('>', p)
        if (e < 0) return null
        val closing = p + 1 < xml.length && xml.charAt(p + 1) == '/'
        val selfClosing = xml.charAt(e - 1) == '/'
        val body = xml.substring(p + (if (closing) 2 else 1), if (selfClosing) e - 1 else e)
        val sp = body.indexWhere(ch => ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r')
        val (name, attrs) = if (sp < 0) (body, "") else (body.substring(0, sp), body.substring(sp + 1))
        return Tag(name.trim, attrs, closing, selfClosing, e + 1)
      }
    }
    null
  }

  private def attr(attrs: String, key: String): String = {
    val k = key + "=\""
    val i = attrs.indexOf(k)
    if (i < 0) null
    else {
      val e = attrs.indexOf('"', i + k.length)
      if (e < 0) null else decodeEntities(attrs.substring(i + k.length, e))
    }
  }

  /** Text content of every `<tag …>…</tag>` span, entity-decoded, in
    * document order (non-nested usage — the `t`-run shape).
    */
  private def tagTexts(xml: String, tag: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var p = 0
    var done = false
    while (!done) {
      val t = nextTag(xml, p)
      if (t == null) done = true
      else if (!t.closing && t.name == tag) {
        if (t.selfClosing) { out += ""; p = t.end }
        else {
          val close = xml.indexOf(s"</$tag>", t.end)
          if (close < 0) { out += ""; p = t.end }
          else { out += decodeEntities(xml.substring(t.end, close)); p = close + tag.length + 3 }
        }
      } else p = t.end
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // DOCX
  // ------------------------------------------------------------------

  /** Paragraph-joined text of `word/document.xml`; null when the
    * archive has no such part or is not a ZIP.
    */
  def docxText(bytes: Array[Byte]): String =
    if (!ZipCodec.isZip(bytes)) null
    else try {
      val part = ZipCodec.extract(bytes, "word/document.xml")
      if (part == null) null
      else {
        val xml = new String(part, StandardCharsets.UTF_8)
        val sb = new StringBuilder
        var p = 0
        var t = nextTag(xml, p)
        while (t != null) {
          if (!t.closing) t.name match {
            case "w:t" if !t.selfClosing =>
              val close = xml.indexOf("</w:t>", t.end)
              if (close >= 0) { sb.append(decodeEntities(xml.substring(t.end, close))); p = close + 6 }
              else p = t.end
            case "w:tab" => sb.append('\t'); p = t.end
            case "w:br" => sb.append('\n'); p = t.end
            case _ => p = t.end
          } else {
            if (t.name == "w:p") {
              while (sb.nonEmpty && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
              sb.append('\n')
            }
            p = t.end
          }
          t = nextTag(xml, p)
        }
        while (sb.nonEmpty && (sb.charAt(sb.length - 1) == '\n' || sb.charAt(sb.length - 1) == ' '))
          sb.setLength(sb.length - 1)
        sb.toString
      }
    } catch { case _: Exception => null }

  // ------------------------------------------------------------------
  // XLSX
  // ------------------------------------------------------------------

  /** All worksheet cells as (sheet_index, cell_ref, value_text) in
    * sheet/document order. Shared strings (`t="s"`), formula strings
    * (`t="str"`), inline strings (`t="inlineStr"`) and raw `<v>`
    * numerics all resolve to text; null for non-ZIP / part-less input.
    */
  def xlsxCells(bytes: Array[Byte]): Vector[(Int, String, String)] =
    if (!ZipCodec.isZip(bytes)) null
    else try {
      val names = ZipCodec.entries(bytes).map(_.name)
      val shared: Vector[String] = {
        val part = ZipCodec.extract(bytes, "xl/sharedStrings.xml")
        if (part == null) Vector.empty
        else {
          val xml = new String(part, StandardCharsets.UTF_8)
          // each <si> concatenates its <t> runs (plain or rich-text)
          val out = Vector.newBuilder[String]
          var p = 0
          var cur: StringBuilder = null
          var t = nextTag(xml, p)
          while (t != null) {
            if (!t.closing && t.name == "si") cur = new StringBuilder
            else if (t.closing && t.name == "si") { out += (if (cur == null) "" else cur.toString); cur = null }
            else if (!t.closing && t.name == "t" && !t.selfClosing && cur != null) {
              val close = xml.indexOf("</t>", t.end)
              if (close >= 0) cur.append(decodeEntities(xml.substring(t.end, close)))
            }
            p = t.end
            t = nextTag(xml, p)
          }
          out.result()
        }
      }
      val sheets = names.filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
        .sortBy { n =>
          val digits = n.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml")
          if (digits.forall(_.isDigit) && digits.nonEmpty) digits.toInt else Int.MaxValue
        }
      val out = Vector.newBuilder[(Int, String, String)]
      sheets.zipWithIndex.foreach { case (sheetName, si) =>
        val xml = new String(ZipCodec.extract(bytes, sheetName), StandardCharsets.UTF_8)
        var p = 0
        var t = nextTag(xml, p)
        while (t != null) {
          if (!t.closing && t.name == "c" && !t.selfClosing) {
            val ref = attr(t.attrs, "r")
            val typ = attr(t.attrs, "t")
            val close = xml.indexOf("</c>", t.end)
            val body = if (close >= 0) xml.substring(t.end, close) else ""
            val value: String =
              if (typ == "inlineStr") tagTexts(body, "t").mkString
              else {
                val v = tagTexts(body, "v").headOption.getOrElse("")
                if (typ == "s") {
                  val idx = try v.trim.toInt catch { case _: Exception => -1 }
                  if (idx >= 0 && idx < shared.length) shared(idx) else ""
                } else v
              }
            if (ref != null) out += ((si, ref, value))
            p = if (close >= 0) close + 4 else t.end
          } else p = t.end
          t = nextTag(xml, p)
        }
      }
      out.result()
    } catch { case _: Exception => null }

  // ------------------------------------------------------------------
  // PPTX
  // ------------------------------------------------------------------

  /** Per-slide text (slide order), `<a:p>` paragraphs newline-joined;
    * null for non-ZIP input or an archive with no slides.
    */
  def pptxText(bytes: Array[Byte]): Array[String] =
    if (!ZipCodec.isZip(bytes)) null
    else try {
      val slides = ZipCodec.entries(bytes).map(_.name)
        .filter(n => n.startsWith("ppt/slides/slide") && n.endsWith(".xml"))
        .sortBy { n =>
          val digits = n.stripPrefix("ppt/slides/slide").stripSuffix(".xml")
          if (digits.forall(_.isDigit) && digits.nonEmpty) digits.toInt else Int.MaxValue
        }
      if (slides.isEmpty) null
      else slides.map { name =>
        val xml = new String(ZipCodec.extract(bytes, name), StandardCharsets.UTF_8)
        val sb = new StringBuilder
        var p = 0
        var t = nextTag(xml, p)
        while (t != null) {
          if (!t.closing && t.name == "a:t" && !t.selfClosing) {
            val close = xml.indexOf("</a:t>", t.end)
            if (close >= 0) { sb.append(decodeEntities(xml.substring(t.end, close))); p = close + 6 }
            else p = t.end
          } else {
            if (t.closing && t.name == "a:p") sb.append('\n')
            p = t.end
          }
          t = nextTag(xml, p)
        }
        while (sb.nonEmpty && sb.charAt(sb.length - 1) == '\n') sb.setLength(sb.length - 1)
        sb.toString
      }.toArray
    } catch { case _: Exception => null }

  // ------------------------------------------------------------------
  // EPUB
  // ------------------------------------------------------------------

  /** Per-chapter text in SPINE order (EPUB OCF: `META-INF/
    * container.xml` → OPF rootfile → manifest hrefs keyed by the
    * spine's idrefs, resolved relative to the OPF directory), each
    * chapter through the crawl layer's HTML extractor. Falls back to
    * every `.xhtml`/`.html` part in name order when the container or
    * OPF is damaged — a torn book still yields its text. Null for
    * non-ZIP input or an archive with no chapters.
    */
  def epubText(bytes: Array[Byte]): Array[String] =
    if (!ZipCodec.isZip(bytes)) null
    else try {
      val names = ZipCodec.entries(bytes).map(_.name)
      val spineHrefs: Vector[String] = try {
        val container = new String(
          ZipCodec.extract(bytes, "META-INF/container.xml"), StandardCharsets.UTF_8)
        var opfPath: String = null
        var p = 0
        var t = nextTag(container, p)
        while (t != null && opfPath == null) {
          if (!t.closing && t.name == "rootfile") opfPath = attr(t.attrs, "full-path")
          p = t.end; t = nextTag(container, p)
        }
        val opfDir = {
          val i = opfPath.lastIndexOf('/')
          if (i < 0) "" else opfPath.substring(0, i + 1)
        }
        val opf = new String(ZipCodec.extract(bytes, opfPath), StandardCharsets.UTF_8)
        val hrefById = mutable.Map[String, String]()
        val spineIds = Vector.newBuilder[String]
        p = 0; t = nextTag(opf, p)
        while (t != null) {
          if (!t.closing && t.name == "item") {
            val id = attr(t.attrs, "id"); val href = attr(t.attrs, "href")
            if (id != null && href != null) hrefById(id) = href
          } else if (!t.closing && t.name == "itemref") {
            val idref = attr(t.attrs, "idref")
            if (idref != null) spineIds += idref
          }
          p = t.end; t = nextTag(opf, p)
        }
        spineIds.result().flatMap(id => hrefById.get(id)).map(opfDir + _)
      } catch { case _: Exception => // damaged container/OPF: name-order fallback
        names.filter(n => n.endsWith(".xhtml") || n.endsWith(".html")).sorted
      }
      val chapters = spineHrefs.flatMap { href =>
        Option(ZipCodec.extract(bytes, href)).map { part =>
          graft.functions.HtmlOps.extract(
            new String(part, StandardCharsets.UTF_8)).text
        }
      }
      if (chapters.isEmpty) null else chapters.toArray
    } catch { case _: Exception => null }

  // ------------------------------------------------------------------
  // fixture writers (deterministic)
  // ------------------------------------------------------------------

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="xml" ContentType="application/xml"/>
      |</Types>""".stripMargin

  /** `nParas` paragraphs; paragraph i reads
    * `Para i of doc <seed> — café & tab:<TAB>end` (entity + tab + run
    * concatenation all exercised).
    */
  def composeDocx(seed: Long, nParas: Int): Array[Byte] = {
    val n = math.max(1, nParas)
    val paras = (0 until n).map { i =>
      s"<w:p><w:r><w:t xml:space=\"preserve\">Para $i of doc $seed </w:t></w:r>" +
        "<w:r><w:t>&#8212; caf&#233; &amp; tab:</w:t><w:tab/><w:t>end</w:t></w:r></w:p>"
    }.mkString
    val doc =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\">" +
        s"<w:body>$paras</w:body></w:document>"
    ZipCodec.build(Seq(
      "[Content_Types].xml" -> ContentTypes.getBytes(StandardCharsets.UTF_8),
      "word/document.xml" -> doc.getBytes(StandardCharsets.UTF_8)))
  }

  /** The paragraph text [[composeDocx]] yields for paragraph `i`. */
  def expectedDocxPara(seed: Long, i: Int): String =
    s"Para $i of doc $seed — café & tab:\tend"

  /** One sheet, `nRows` rows: A = shared string `sv<seed+r>`, B =
    * numeric `(seed + r) * 3`, C = inline string `in<r>` — every cell
    * resolution path exercised.
    */
  def composeXlsx(seed: Long, nRows: Int): Array[Byte] = {
    val n = math.max(1, nRows)
    val shared = (0 until n).map(r =>
      s"<si><r><t>sv</t></r><r><t>${seed + r}</t></r></si>").mkString
    val sst =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        s"<sst xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" count=\"$n\" uniqueCount=\"$n\">$shared</sst>"
    val rows = (1 to n).map { r =>
      s"<row r=\"$r\"><c r=\"A$r\" t=\"s\"><v>${r - 1}</v></c>" +
        s"<c r=\"B$r\"><v>${(seed + r - 1) * 3}</v></c>" +
        s"<c r=\"C$r\" t=\"inlineStr\"><is><t>in${r - 1}</t></is></c></row>"
    }.mkString
    val sheet =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
        s"<sheetData>$rows</sheetData></worksheet>"
    ZipCodec.build(Seq(
      "[Content_Types].xml" -> ContentTypes.getBytes(StandardCharsets.UTF_8),
      "xl/sharedStrings.xml" -> sst.getBytes(StandardCharsets.UTF_8),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes(StandardCharsets.UTF_8)))
  }

  /** `nSlides` slides; slide s carries title + two bullet paragraphs. */
  def composePptx(seed: Long, nSlides: Int): Array[Byte] = {
    val n = math.max(1, nSlides)
    val files = (1 to n).map { s =>
      val xml =
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
          "<p:sld xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\"" +
          " xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\">" +
          s"<p:txBody><a:p><a:r><a:t>Slide ${s - 1} of deck $seed</a:t></a:r></a:p>" +
          s"<a:p><a:r><a:t>bullet &amp; point </a:t></a:r><a:r><a:t>${seed % 100}</a:t></a:r></a:p>" +
          "</p:txBody></p:sld>"
      s"ppt/slides/slide$s.xml" -> xml.getBytes(StandardCharsets.UTF_8)
    }
    ZipCodec.build(("[Content_Types].xml" -> ContentTypes.getBytes(StandardCharsets.UTF_8)) +: files)
  }

  /** The slide text [[composePptx]] yields for slide `s`. */
  def expectedPptxSlide(seed: Long, s: Int): String =
    s"Slide $s of deck $seed\nbullet & point ${seed % 100}"

  /** `nChapters` chapters; chapter file names are REVERSE-alphabetical
    * (`zch0` sorts after `ych1` …) while the spine lists them in
    * reading order — extraction must follow the SPINE, and the
    * name-order fallback would give a different (wrong) order, so the
    * gate distinguishes the two paths.
    */
  def composeEpub(seed: Long, nChapters: Int): Array[Byte] = {
    val n = math.max(1, nChapters)
    // 'z','y','x'… prefixes invert lexicographic order vs reading order
    def chapName(i: Int) = s"OEBPS/${('z' - i).toChar}ch$i.xhtml"
    val container =
      "<?xml version=\"1.0\"?><container version=\"1.0\" " +
        "xmlns=\"urn:oasis:names:tc:opendocument:xmlns:container\">" +
        "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" " +
        "media-type=\"application/oebps-package+xml\"/></rootfiles></container>"
    val manifest = (0 until n).map(i =>
      s"<item id=\"c$i\" href=\"${chapName(i).stripPrefix("OEBPS/")}\" " +
        "media-type=\"application/xhtml+xml\"/>").mkString
    val spine = (0 until n).map(i => s"<itemref idref=\"c$i\"/>").mkString
    val opf =
      "<?xml version=\"1.0\"?><package xmlns=\"http://www.idpf.org/2007/opf\" version=\"3.0\">" +
        s"<manifest>$manifest</manifest><spine>$spine</spine></package>"
    val chapters = (0 until n).map { i =>
      chapName(i) ->
        (s"<html><head><title>Ch $i</title></head><body><h1>Chapter $i</h1>" +
          s"<p>Book $seed prose &amp; caf&#233; line $i.</p></body></html>")
          .getBytes(StandardCharsets.UTF_8)
    }
    ZipCodec.build(Seq(
      "mimetype" -> "application/epub+zip".getBytes(StandardCharsets.US_ASCII),
      "META-INF/container.xml" -> container.getBytes(StandardCharsets.UTF_8),
      "OEBPS/content.opf" -> opf.getBytes(StandardCharsets.UTF_8)) ++ chapters)
  }

  /** The chapter text [[composeEpub]] yields for chapter `i`. */
  def expectedEpubChapter(seed: Long, i: Int): String =
    s"Chapter $i\nBook $seed prose & café line $i."
}
