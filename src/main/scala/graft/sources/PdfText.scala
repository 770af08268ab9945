package graft.sources

import java.nio.charset.StandardCharsets
import scala.collection.mutable

import PdfCodec._

/** PDF TEXT extraction — the capability a training-data pipeline needs
  * most from a document corpus (pdf → text for LLM pretraining), built
  * on the same content-stream tokenizer the rasterizer uses. The
  * reference's PyMuPDF dependency ships `page.get_text()`; this is the
  * from-scratch Spark-side equivalent for the subset that covers the
  * dominant real-world documents:
  *
  *   - Operators: BT/ET text blocks; Tf (font select), Td, TD, T*,
  *     TL, Tm (positioning — line breaks derive from baseline-y motion),
  *     Tj / ' / " (show), TJ (show array; a kern gap below
  *     [[SpaceKern]] thousandths of em inserts a space — the standard
  *     justified-text encoding of inter-word space).
  *   - Simple fonts (Type1/TrueType/Type3, one byte per code):
  *     /WinAnsiEncoding (cp1252), /MacRomanEncoding, StandardEncoding
  *     default, plus /Differences overlays resolved through a compact
  *     Adobe-glyph-name table. A /ToUnicode CMap, when present,
  *     overrides per code.
  *   - Composite fonts (/Type0, the modern subset-embedded shape):
  *     2-byte Identity-H codes mapped through the /ToUnicode CMap
  *     (bfchar + bfrange, both array and increment forms); codes
  *     without a mapping yield U+FFFD rather than silently dropping.
  *
  * Decryption composes for free: [[PdfCodec.parse]] has already
  * decrypted content streams before extraction sees them, so an
  * empty-user-password encrypted document extracts identically to its
  * plaintext twin (spec-pinned).
  *
  * Out of subset (documented): vertical writing (Identity-V), CID
  * CMaps other than Identity, glyph-width-driven spacing (spaces come
  * from explicit space chars + TJ kerns), cross-column reading-order
  * reconstruction. The goal is linear reading order of the stream,
  * which is what every corpus extractor (incl. the reference's
  * PyMuPDF "text" mode) emits for single-column documents.
  *
  * Scale shape: bytes → string per row, no Spark state; rides inside
  * codegen via `graft.functions.PdfOps.pdfText` like the other codec
  * entry points. Cost is O(content bytes); fonts/CMaps parse once per
  * page.
  */
object PdfText {

  /** TJ kern threshold in text-space thousandths: a gap wider than
    * this reads as an inter-word space (PDF writers emit ~-250 for a
    * space-width kern at normal tracking; letter-kerns are < ~100).
    */
  val SpaceKern = 180.0

  // ------------------------------------------------------------------
  // encodings
  // ------------------------------------------------------------------

  private def charsetTable(name: String): Array[Int] = {
    val cs = java.nio.charset.Charset.forName(name)
    Array.tabulate(256) { i =>
      val s = new String(Array(i.toByte), cs)
      if (s.isEmpty) 0xFFFD else s.codePointAt(0)
    }
  }

  /** /WinAnsiEncoding == windows-1252 (JDK charset). */
  private lazy val winAnsi: Array[Int] = charsetTable("windows-1252")

  /** /MacRomanEncoding via the JDK's x-MacRoman (full-JDK charset;
    * WinAnsi fallback keeps the extractor total if a trimmed runtime
    * lacks it — ASCII, the range that matters, is identical).
    */
  private lazy val macRoman: Array[Int] =
    try charsetTable("x-MacRoman") catch { case _: Exception => winAnsi }

  /** Adobe StandardEncoding: ASCII with curly quote slots plus the
    * documented high range (ISO 32000 annex D.2).
    */
  private lazy val standard: Array[Int] = {
    val t = Array.tabulate(256)(i => if (i >= 32 && i <= 126) i else 0xFFFD)
    t(39) = 0x2019; t(96) = 0x2018
    Seq(161 -> 0x00A1, 162 -> 0x00A2, 163 -> 0x00A3, 164 -> 0x2044, 165 -> 0x00A5,
      166 -> 0x0192, 167 -> 0x00A7, 168 -> 0x00A4, 169 -> 0x0027, 170 -> 0x201C,
      171 -> 0x00AB, 172 -> 0x2039, 173 -> 0x203A, 174 -> 0xFB01, 175 -> 0xFB02,
      177 -> 0x2013, 178 -> 0x2020, 179 -> 0x2021, 180 -> 0x00B7, 182 -> 0x00B6,
      183 -> 0x2022, 184 -> 0x201A, 185 -> 0x201E, 186 -> 0x201D, 187 -> 0x00BB,
      188 -> 0x2026, 189 -> 0x2030, 191 -> 0x00BF, 193 -> 0x0060, 194 -> 0x00B4,
      195 -> 0x02C6, 196 -> 0x02DC, 197 -> 0x00AF, 198 -> 0x02D8, 199 -> 0x02D9,
      200 -> 0x00A8, 202 -> 0x02DA, 203 -> 0x00B8, 205 -> 0x02DD, 206 -> 0x02DB,
      207 -> 0x02C7, 208 -> 0x2014, 225 -> 0x00C6, 227 -> 0x00AA, 232 -> 0x0141,
      233 -> 0x00D8, 234 -> 0x0152, 235 -> 0x00BA, 241 -> 0x00E6, 245 -> 0x0131,
      248 -> 0x0142, 249 -> 0x00F8, 250 -> 0x0153, 251 -> 0x00DF)
      .foreach { case (c, u) => t(c) = u }
    t
  }

  /** Compact Adobe-glyph-list subset for /Differences resolution:
    * ASCII names, typographic punctuation, and the Latin-1 accent
    * family — the names real-world Differences arrays use. Parsed
    * once at class load from `name:hex` pairs.
    */
  private lazy val glyphToUnicode: Map[String, Int] = {
    val blob =
      "space:0020;exclam:0021;quotedbl:0022;numbersign:0023;dollar:0024;" +
      "percent:0025;ampersand:0026;quotesingle:0027;parenleft:0028;parenright:0029;" +
      "asterisk:002A;plus:002B;comma:002C;hyphen:002D;period:002E;slash:002F;" +
      "zero:0030;one:0031;two:0032;three:0033;four:0034;five:0035;six:0036;" +
      "seven:0037;eight:0038;nine:0039;colon:003A;semicolon:003B;less:003C;" +
      "equal:003D;greater:003E;question:003F;at:0040;bracketleft:005B;" +
      "backslash:005C;bracketright:005D;asciicircum:005E;underscore:005F;" +
      "grave:0060;braceleft:007B;bar:007C;braceright:007D;asciitilde:007E;" +
      "quoteleft:2018;quoteright:2019;quotedblleft:201C;quotedblright:201D;" +
      "quotesinglbase:201A;quotedblbase:201E;endash:2013;emdash:2014;" +
      "bullet:2022;ellipsis:2026;dagger:2020;daggerdbl:2021;perthousand:2030;" +
      "guillemotleft:00AB;guillemotright:00BB;guilsinglleft:2039;guilsinglright:203A;" +
      "florin:0192;fraction:2044;Euro:20AC;trademark:2122;copyright:00A9;" +
      "registered:00AE;degree:00B0;plusminus:00B1;multiply:00D7;divide:00F7;" +
      "exclamdown:00A1;questiondown:00BF;cent:00A2;sterling:00A3;yen:00A5;" +
      "currency:00A4;section:00A7;paragraph:00B6;periodcentered:00B7;" +
      "dotlessi:0131;fi:FB01;fl:FB02;OE:0152;oe:0153;Lslash:0141;lslash:0142;" +
      "Scaron:0160;scaron:0161;Zcaron:017D;zcaron:017E;Ydieresis:0178;" +
      "circumflex:02C6;tilde:02DC;macron:00AF;breve:02D8;dotaccent:02D9;" +
      "dieresis:00A8;ring:02DA;cedilla:00B8;hungarumlaut:02DD;ogonek:02DB;" +
      "caron:02C7;acute:00B4;brokenbar:00A6;logicalnot:00AC;mu:00B5;" +
      "ordfeminine:00AA;ordmasculine:00BA;onequarter:00BC;onehalf:00BD;" +
      "threequarters:00BE;onesuperior:00B9;twosuperior:00B2;threesuperior:00B3;" +
      "AE:00C6;ae:00E6;Oslash:00D8;oslash:00F8;Thorn:00DE;thorn:00FE;" +
      "Eth:00D0;eth:00F0;germandbls:00DF;" +
      "Agrave:00C0;Aacute:00C1;Acircumflex:00C2;Atilde:00C3;Adieresis:00C4;Aring:00C5;" +
      "Ccedilla:00C7;Egrave:00C8;Eacute:00C9;Ecircumflex:00CA;Edieresis:00CB;" +
      "Igrave:00CC;Iacute:00CD;Icircumflex:00CE;Idieresis:00CF;Ntilde:00D1;" +
      "Ograve:00D2;Oacute:00D3;Ocircumflex:00D4;Otilde:00D5;Odieresis:00D6;" +
      "Ugrave:00D9;Uacute:00DA;Ucircumflex:00DB;Udieresis:00DC;Yacute:00DD;" +
      "agrave:00E0;aacute:00E1;acircumflex:00E2;atilde:00E3;adieresis:00E4;aring:00E5;" +
      "ccedilla:00E7;egrave:00E8;eacute:00E9;ecircumflex:00EA;edieresis:00EB;" +
      "igrave:00EC;iacute:00ED;icircumflex:00EE;idieresis:00EF;ntilde:00F1;" +
      "ograve:00F2;oacute:00F3;ocircumflex:00F4;otilde:00F5;odieresis:00F6;" +
      "ugrave:00F9;uacute:00FA;ucircumflex:00FB;udieresis:00FC;yacute:00FD;" +
      "ydieresis:00FF"
    val m = Map.newBuilder[String, Int]
    blob.split(';').foreach { e =>
      val i = e.indexOf(':')
      m += e.substring(0, i) -> Integer.parseInt(e.substring(i + 1), 16)
    }
    // single letters and digits map to themselves by name
    ('A' to 'Z').foreach(c => m += c.toString -> c.toInt)
    ('a' to 'z').foreach(c => m += c.toString -> c.toInt)
    m.result()
  }

  // ------------------------------------------------------------------
  // fonts
  // ------------------------------------------------------------------

  /** A resolved font: byte-code decode table (simple fonts), the
    * /ToUnicode overrides, and the code width.
    */
  private final case class Font(table: Array[Int], toUnicode: Map[Int, String],
                                twoByte: Boolean)

  private val DefaultFont = Font(null, Map.empty, twoByte = false)

  private def buildFont(doc: PdfDoc, v: PVal): Font = resolve(doc, v) match {
    case d: PDict =>
      val subtype = resolve(doc, d.get("Subtype").getOrElse(PNull)) match {
        case PName(s) => s; case _ => ""
      }
      val toUni = parseToUnicode(doc, d)
      if (subtype == "Type0") Font(null, toUni, twoByte = true)
      else {
        val table: Array[Int] = resolve(doc, d.get("Encoding").getOrElse(PNull)) match {
          case PName("WinAnsiEncoding") => winAnsi
          case PName("MacRomanEncoding") => macRoman
          case ed: PDict =>
            val base = resolve(doc, ed.get("BaseEncoding").getOrElse(PNull)) match {
              case PName("WinAnsiEncoding") => winAnsi
              case PName("MacRomanEncoding") => macRoman
              case _ => standard
            }
            resolve(doc, ed.get("Differences").getOrElse(PNull)) match {
              case PArr(items) =>
                val t = base.clone()
                var code = 0
                items.foreach {
                  case PNum(n) => code = n.toInt
                  case PName(g) =>
                    if (code >= 0 && code < 256)
                      t(code) = glyphToUnicode.getOrElse(g,
                        // uniXXXX names resolve numerically
                        if (g.length == 7 && g.startsWith("uni"))
                          try Integer.parseInt(g.substring(3), 16) catch { case _: Exception => 0xFFFD }
                        else 0xFFFD)
                    code += 1
                  case _ =>
                }
                t
              case _ => base
            }
          case _ => standard
        }
        Font(table, toUni, twoByte = false)
      }
    case _ => DefaultFont
  }

  /** Parse a /ToUnicode CMap stream: bfchar pairs and bfrange triples
    * (both the increment and the array destination forms). Lenient —
    * anything unrecognized is skipped, never thrown.
    */
  private def parseToUnicode(doc: PdfDoc, fontDict: PDict): Map[Int, String] = {
    val stream = fontDict.get("ToUnicode") match {
      case Some(PRef(n, _)) => doc.objects.get(n).map(o => decodedStream(doc, o))
      case _ => None
    }
    stream match {
      case None => Map.empty
      case Some(bytes) =>
        val m = Map.newBuilder[Int, String]
        def codeOf(v: PVal): Int = v match {
          case PStr(b) if b.length == 1 => b(0) & 0xff
          case PStr(b) if b.length >= 2 => ((b(0) & 0xff) << 8) | (b(1) & 0xff)
          case PNum(n) => n.toInt
          case _ => -1
        }
        def strOf(v: PVal): String = v match {
          case PStr(b) => new String(b, StandardCharsets.UTF_16BE)
          case _ => null
        }
        val lx = new Lexer(bytes, 0)
        val operands = mutable.ArrayBuffer[PVal]()
        var mode = 0 // 0 none, 1 bfchar, 2 bfrange
        try while ({ lx.skipWs(); !lx.eof }) {
          val c = lx.cur
          if (c == '/' || c == '[' || c == '(' || c == '<' || c == '+' || c == '-' ||
              c == '.' || (c >= '0' && c <= '9')) {
            operands += parseVal(lx)
            if (mode == 1 && operands.length == 2) {
              val code = codeOf(operands(0)); val s = strOf(operands(1))
              if (code >= 0 && s != null) m += code -> s
              operands.clear()
            } else if (mode == 2 && operands.length == 3) {
              val lo = codeOf(operands(0)); val hi = codeOf(operands(1))
              if (lo >= 0 && hi >= lo && hi - lo < 65536) operands(2) match {
                case PArr(ds) =>
                  ds.zipWithIndex.foreach { case (d, i) =>
                    val s = strOf(d); if (s != null && lo + i <= hi) m += (lo + i) -> s
                  }
                case d =>
                  val s = strOf(d)
                  if (s != null && s.nonEmpty) {
                    var i = lo
                    while (i <= hi) {
                      val last = s.charAt(s.length - 1)
                      m += i -> (s.substring(0, s.length - 1) + (last + (i - lo)).toChar)
                      i += 1
                    }
                  }
              }
              operands.clear()
            }
          } else {
            lx.token() match {
              case "beginbfchar" => mode = 1; operands.clear()
              case "endbfchar" => mode = 0; operands.clear()
              case "beginbfrange" => mode = 2; operands.clear()
              case "endbfrange" => mode = 0; operands.clear()
              case "" => lx.p += 1
              case _ => operands.clear()
            }
          }
        } catch { case _: Exception => } // truncated CMap: keep what parsed
        m.result()
    }
  }

  // ------------------------------------------------------------------
  // the extractor
  // ------------------------------------------------------------------

  private def decodeShow(font: Font, bytes: Array[Byte], out: StringBuilder): Unit = {
    val f = if (font == null) DefaultFont else font
    if (f.twoByte) {
      var i = 0
      while (i + 1 < bytes.length) {
        val code = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
        out.append(f.toUnicode.getOrElse(code, "�"))
        i += 2
      }
    } else {
      val table = if (f.table == null) standard else f.table
      var i = 0
      while (i < bytes.length) {
        val code = bytes(i) & 0xff
        f.toUnicode.get(code) match {
          case Some(s) => out.append(s)
          case None =>
            val cp = table(code)
            out.appendAll(Character.toChars(if (cp <= 0) 0xFFFD else cp))
        }
        i += 1
      }
    }
  }

  /** Extract one page's text in stream order. Line breaks derive from
    * ABSOLUTE baseline-y motion, trackable because BT resets the line
    * matrix to identity (y = 0): Td/TD accumulate their ty (break when
    * ty ≠ 0), Tm sets y outright (break when it differs from the
    * current baseline), T* / ' / " always break and move down by the
    * TL leading. A writer that opens a new BT per paragraph therefore
    * still yields one break per line — the Tm of the next block lands
    * on a different baseline than the accumulated one.
    */
  def extractPageText(doc: PdfDoc, page: PdfPage): String = {
    val fonts: Map[String, Font] = page.resources.map(r => resolve(doc, r)) match {
      case Some(rd: PDict) => resolve(doc, rd.get("Font").getOrElse(PNull)) match {
        case fd: PDict => fd.m.map { case (name, ref) => name -> buildFont(doc, ref) }
        case _ => Map.empty
      }
      case _ => Map.empty
    }
    val sb = new StringBuilder
    var font: Font = null
    var curY = 0.0
    var haveY = false
    var leading = 0.0
    def newline(): Unit = {
      while (sb.nonEmpty && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    }
    def space(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != ' ' && sb.charAt(sb.length - 1) != '\n')
        sb.append(' ')
    def num(v: PVal): Double = v match { case PNum(n) => n; case _ => 0.0 }

    val lx = new Lexer(page.content, 0)
    val operands = mutable.ArrayBuffer[PVal]()
    while ({ lx.skipWs(); !lx.eof }) {
      val c = lx.cur
      if (c == '/' || c == '[' || c == '(' || c == '<' || c == '+' || c == '-' || c == '.' ||
          (c >= '0' && c <= '9')) {
        operands += parseVal(lx)
      } else {
        val op = lx.token()
        op match {
          case "Tf" if operands.length >= 2 =>
            operands(operands.length - 2) match {
              case PName(n) => font = fonts.getOrElse(n, DefaultFont)
              case _ =>
            }
          case "Td" if operands.length >= 2 =>
            val ty = num(operands.last)
            if (ty != 0.0) { newline(); curY += ty }
          case "TD" if operands.length >= 2 =>
            val ty = num(operands.last)
            leading = -ty
            if (ty != 0.0) { newline(); curY += ty }
          case "TL" if operands.nonEmpty => leading = num(operands.last)
          case "T*" => newline(); curY -= leading
          case "Tm" if operands.length >= 6 =>
            val y = num(operands.last)
            if (haveY && math.abs(y - curY) > 1e-6) newline()
            curY = y; haveY = true
          case "Tj" if operands.nonEmpty =>
            operands.last match { case PStr(b) => decodeShow(font, b, sb); case _ => }
          case "'" if operands.nonEmpty =>
            newline(); curY -= leading
            operands.last match { case PStr(b) => decodeShow(font, b, sb); case _ => }
          case "\"" if operands.nonEmpty =>
            newline(); curY -= leading
            operands.last match { case PStr(b) => decodeShow(font, b, sb); case _ => }
          case "TJ" if operands.nonEmpty =>
            operands.last match {
              case PArr(items) => items.foreach {
                case PStr(b) => decodeShow(font, b, sb)
                case PNum(n) => if (n < -SpaceKern) space()
                case _ =>
              }
              case _ =>
            }
          case "BT" => curY = 0.0; haveY = true; leading = 0.0
          case "ET" =>
          case "" => lx.p += 1
          case _ =>
        }
        operands.clear()
      }
    }
    while (sb.nonEmpty && (sb.charAt(sb.length - 1) == ' ' || sb.charAt(sb.length - 1) == '\n'))
      sb.setLength(sb.length - 1)
    sb.toString
  }

  /** All pages' text; null when the bytes are not a parseable PDF
    * (same guard layer as the raster entry points).
    */
  def extractAll(bytes: Array[Byte]): Array[String] =
    if (!isPdf(bytes)) null
    else try {
      val doc = parse(bytes)
      doc.pages.map(p => extractPageText(doc, p)).toArray
    } catch { case _: Exception => null }

  // ------------------------------------------------------------------
  // deterministic fixture writer
  // ------------------------------------------------------------------

  /** Closed-form text-document fixture for the oracle gate: `nPages`
    * pages of Helvetica/WinAnsi text whose per-page content exercises
    * literal-string escapes, octal high bytes (é as \351), TJ kern
    * spacing, TD line motion and T* — and whose extracted text is a
    * pure function of (seed, page):
    *
    *   `Doc <seed> page <p> line one (escaped)\n` +
    *   `kerned words here\ncafé three`
    */
  def composeTextFixture(seed: Long, nPages: Int): Array[Byte] = {
    val n = math.max(1, nPages)
    val out = new java.io.ByteArrayOutputStream(1024 * n)
    val offsets = mutable.Map[Int, Int]()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets(num) = out.size(); w(s"$num 0 obj\n") }
    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val pageNums = (0 until n).map(i => 4 + 2 * i)
    beginObj(2)
    w(s"<< /Type /Pages /Kids [${pageNums.map(p => s"$p 0 R").mkString(" ")}] " +
      s"/Count $n /Resources << /Font << /F1 3 0 R >> >> >>\nendobj\n")
    beginObj(3)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>\nendobj\n")
    (0 until n).foreach { p =>
      val (pn, cn) = (4 + 2 * p, 5 + 2 * p)
      beginObj(pn)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents $cn 0 R >>\nendobj\n")
      val content =
        (s"BT\n/F1 12 Tf\n72 720 Td\n(Doc $seed page $p line one \\(escaped\\)) Tj\n" +
          "0 -14 TD\n[(kerned) -250 (words) -30 ( here)] TJ\nT*\n(caf\\351 three) Tj\nET\n")
          .getBytes(StandardCharsets.ISO_8859_1)
      beginObj(cn)
      w(s"<< /Length ${content.length} >>\nstream\n"); out.write(content)
      w("\nendstream\nendobj\n")
    }
    // /Info: the title rides as a BOM'd UTF-16BE hex string (the form
    // real writers emit for non-ASCII), the rest as PDFDocEncoding
    val infoNum = 4 + 2 * n
    beginObj(infoNum)
    val titleHex = ("\uFEFF" + expectedFixtureTitle(seed))
      .getBytes(StandardCharsets.UTF_16BE).map(b => f"${b & 0xff}%02X").mkString
    w(s"<< /Title <$titleHex> /Author (Graft Pipeline) " +
      s"/Producer (graft-pdf ${seed % 10}) /CreationDate (D:20260101000000Z) >>\nendobj\n")
    val size = 5 + 2 * n
    val xrefOff = out.size()
    w(s"xref\n0 $size\n0000000000 65535 f \n")
    (1 until size).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size $size /Root 1 0 R /Info $infoNum 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** The /Info /Title [[composeTextFixture]] embeds (UTF-16BE with an
    * em dash, proving the §7.9.2.2 BOM path end to end).
    */
  def expectedFixtureTitle(seed: Long): String = s"Doc $seed — fixture"

  /** The text [[composeTextFixture]] extracts for page `p` of seed
    * `seed` — the closed form the oracle (and the specs) pin.
    */
  def expectedFixtureText(seed: Long, p: Int): String =
    s"Doc $seed page $p line one (escaped)\nkerned words here\ncafé three"
}
