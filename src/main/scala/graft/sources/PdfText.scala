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
  * Glyph-width-driven spacing: when a font carries width data
  * (/Widths + /FirstChar for simple fonts, /W + /DW on the descendant
  * for Type0), the TJ word-break threshold becomes width-RELATIVE —
  * half the font's space-glyph width — instead of the fixed
  * [[SpaceKern]] fallback, so a condensed font's −120 space kern
  * still breaks words and a display font's −200 letter kern no
  * longer does. The same widths drive a pen-x model (advance
  * accumulated per show, Tc/Tw honored), so a positive same-line
  * Td/TD/Tm x-jump past the pen wider than the threshold reads as an
  * inter-word space — the other way justified writers encode spaces.
  * Fonts with no width data keep the fixed-threshold behavior and
  * skip the pen model (advance unknowable).
  *
  * CJK: the predefined Uni{GB,CNS,JIS,KS}-UCS2-{H,V} CMap families
  * decode WITHOUT /ToUnicode — their code space is UCS-2, so the
  * 2-byte code IS the BMP code point (the compact-table fact that
  * makes these CMaps shippable). Vertical (-V) fonts get a vertical
  * PEN: shows advance down the column by the descendant's /DW2
  * magnitude, same-column y-jumps past the pen read as gaps, and
  * x-motion opens a new column (newline) — so vertical CJK extracts
  * in column order with sane breaks.
  *
  * Out of subset (documented): predefined -UTF16 and CID-keyed
  * (non-UCS2) CMap tables, vertical pens under a scaled Tm,
  * cross-column reading-order reconstruction beyond stream order. The goal is linear reading
  * order of the stream, which is what every corpus extractor (incl.
  * the reference's PyMuPDF "text" mode) emits for single-column
  * documents.
  *
  * Scale shape: bytes → string per row, no Spark state; rides inside
  * codegen via `graft.functions.PdfOps.pdfText` like the other codec
  * entry points. Cost is O(content bytes); fonts/CMaps parse once per
  * page.
  */
object PdfText {

  /** Fallback TJ kern threshold in text-space thousandths, used only
    * when the font declares no widths: a gap wider than this reads as
    * an inter-word space (PDF writers emit ~-250 for a space-width
    * kern at normal tracking; letter-kerns are < ~100). Fonts WITH
    * widths use half their space-glyph width instead — see
    * [[spaceThreshold]].
    */
  val SpaceKern = 180.0

  /** Width-relative word-break fraction: a gap wider than this times
    * the font's space-glyph width is an inter-word space (the
    * heuristic PDFBox/pdf.js-family extractors converge on — real
    * writers never kern letters past half a space).
    */
  val SpaceFraction = 0.5

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
    * /ToUnicode overrides, the code width, and glyph advances in
    * thousandths of em — `widths` (simple, per byte code; null =
    * font declared none), `cidW`+`dw` (Type0), and `spaceW` (the
    * space glyph's advance; 0 = unknown → [[SpaceKern]] fallback).
    * `ucs2` marks the predefined Uni*-UCS2 CMap families, whose
    * 2-byte codes ARE BMP code points (decode without /ToUnicode);
    * `vertical` marks a -V writing mode (pen advances down the
    * column per glyph by its /W2 displacement magnitude from
    * `cidW2`, falling back to `dw2` — the descendant's /DW2, default
    * 1000 per ISO 32000 §9.7.4.3).
    */
  private final case class Font(table: Array[Int], toUnicode: Map[Int, String],
                                twoByte: Boolean, widths: Array[Double] = null,
                                cidW: Map[Int, Double] = Map.empty, dw: Double = 1000.0,
                                spaceW: Double = 0.0, ucs2: Boolean = false,
                                vertical: Boolean = false, dw2: Double = 1000.0,
                                cidW2: Map[Int, Double] = Map.empty)

  private val DefaultFont = Font(null, Map.empty, twoByte = false)

  /** /Widths + /FirstChar → per-byte-code advance table (thousandths);
    * null when the font declares no widths (the pen model then stays
    * off for this font). Codes outside [FirstChar, LastChar] advance
    * by /FontDescriptor /MissingWidth (default 0, per ISO 32000
    * §9.8.1) rather than silently zero when a descriptor declares one.
    */
  private def parseWidths(doc: PdfDoc, d: PDict): Array[Double] =
    resolve(doc, d.get("Widths").getOrElse(PNull)) match {
      case PArr(ws) =>
        val first = resolve(doc, d.get("FirstChar").getOrElse(PNull)) match {
          case PNum(n) => n.toInt; case _ => 0
        }
        val missing = resolve(doc, d.get("FontDescriptor").getOrElse(PNull)) match {
          case fd: PDict => resolve(doc, fd.get("MissingWidth").getOrElse(PNull)) match {
            case PNum(n) => n; case _ => 0.0
          }
          case _ => 0.0
        }
        val t = Array.fill(256)(missing)
        var i = 0
        while (i < ws.length && first + i < 256) {
          if (first + i >= 0) resolve(doc, ws(i)) match {
            case PNum(n) => t(first + i) = n
            case _ =>
          }
          i += 1
        }
        t
      case _ => null
    }

  /** Vertical metrics off the descendant: (/DW2 magnitude — the second
    * array element, typically −1000; 1000 when absent) and the per-CID
    * /W2 displacement magnitudes (both the `c [w v v …]` triplet form
    * and the `cFirst cLast w v v` range form; entry count capped like
    * /W).
    */
  private def parseVerticalMetrics(doc: PdfDoc, d: PDict): (Double, Map[Int, Double]) = {
    val desc = resolve(doc, d.get("DescendantFonts").getOrElse(PNull)) match {
      case PArr(items) if items.nonEmpty => resolve(doc, items.head) match {
        case dd: PDict => dd; case _ => null
      }
      case _ => null
    }
    if (desc == null) return (1000.0, Map.empty)
    val dw2 = resolve(doc, desc.get("DW2").getOrElse(PNull)) match {
      case PArr(vals) if vals.length >= 2 => resolve(doc, vals(1)) match {
        case PNum(w1) => math.abs(w1)
        case _ => 1000.0
      }
      case _ => 1000.0
    }
    val m = Map.newBuilder[Int, Double]
    var entries = 0
    resolve(doc, desc.get("W2").getOrElse(PNull)) match {
      case PArr(items) =>
        var i = 0
        while (i < items.length && entries < 65536) {
          (resolve(doc, items(i)), if (i + 1 < items.length) resolve(doc, items(i + 1)) else PNull) match {
            case (PNum(c), PArr(triples)) =>
              // triplets (w1y v1x v1y) per consecutive CID; a trailing
              // partial triple is ignored
              var j = 0
              while (j + 2 < triples.length && entries < 65536) {
                resolve(doc, triples(j)) match {
                  case PNum(w) => m += (c.toInt + j / 3) -> math.abs(w); entries += 1
                  case _ =>
                }
                j += 3
              }
              i += 2
            case (PNum(lo), PNum(hi)) if i + 4 < items.length =>
              resolve(doc, items(i + 2)) match {
                case PNum(w) =>
                  var c = lo.toInt
                  val top = math.min(hi.toInt, lo.toInt + 65535)
                  while (c <= top && entries < 65536) { m += c -> math.abs(w); entries += 1; c += 1 }
                case _ =>
              }
              i += 5 // cFirst cLast w1y v1x v1y
            case _ => i += 1
          }
        }
      case _ =>
    }
    (dw2, m.result())
  }

  /** Type0 /DescendantFonts[0] → (/W CID-width map, /DW default).
    * /W alternates `c [w…]` and `cFirst cLast w` runs; entry count is
    * capped so a hostile /W can't balloon the map.
    */
  private def parseCidWidths(doc: PdfDoc, d: PDict): (Map[Int, Double], Double) = {
    val desc = resolve(doc, d.get("DescendantFonts").getOrElse(PNull)) match {
      case PArr(items) if items.nonEmpty => resolve(doc, items.head) match {
        case dd: PDict => dd; case _ => null
      }
      case _ => null
    }
    if (desc == null) return (Map.empty, 1000.0)
    val dw = resolve(doc, desc.get("DW").getOrElse(PNull)) match {
      case PNum(n) => n; case _ => 1000.0
    }
    val m = Map.newBuilder[Int, Double]
    var entries = 0
    resolve(doc, desc.get("W").getOrElse(PNull)) match {
      case PArr(items) =>
        var i = 0
        while (i < items.length && entries < 65536) {
          (resolve(doc, items(i)), if (i + 1 < items.length) resolve(doc, items(i + 1)) else PNull) match {
            case (PNum(c), PArr(ws)) =>
              ws.zipWithIndex.foreach { case (wv, j) =>
                resolve(doc, wv) match {
                  case PNum(w) if entries < 65536 => m += (c.toInt + j) -> w; entries += 1
                  case _ =>
                }
              }
              i += 2
            case (PNum(lo), PNum(hi)) if i + 2 < items.length =>
              resolve(doc, items(i + 2)) match {
                case PNum(w) =>
                  var c = lo.toInt
                  val top = math.min(hi.toInt, lo.toInt + 65535)
                  while (c <= top && entries < 65536) { m += c -> w; entries += 1; c += 1 }
                case _ =>
              }
              i += 3
            case _ => i += 1
          }
        }
      case _ =>
    }
    (m.result(), dw)
  }

  private def buildFont(doc: PdfDoc, v: PVal): Font = resolve(doc, v) match {
    case d: PDict =>
      val subtype = resolve(doc, d.get("Subtype").getOrElse(PNull)) match {
        case PName(s) => s; case _ => ""
      }
      val toUni = parseToUnicode(doc, d)
      if (subtype == "Type0") {
        val (cidW, dw) = parseCidWidths(doc, d)
        val encName = resolve(doc, d.get("Encoding").getOrElse(PNull)) match {
          case PName(s) => s; case _ => ""
        }
        // Uni{GB,CNS,JIS,KS}-UCS2-{H,V}: the code space IS UCS-2, so
        // codes decode to BMP code points with no /ToUnicode needed —
        // the compact-table fact that makes predefined CJK CMaps
        // shippable (the -UTF16/CID-keyed families stay out of subset)
        val ucs2 = encName.startsWith("Uni") && encName.contains("-UCS2-")
        val vertical = encName.endsWith("-V")
        // the space glyph's advance = width of the LOWEST code
        // /ToUnicode maps to " " (deterministic under map ordering);
        // UCS2 fonts know the space code outright
        val spaceCodes = toUni.collect { case (c, s) if s == " " => c }
        val spaceW =
          if (spaceCodes.nonEmpty) cidW.getOrElse(spaceCodes.min, dw)
          else if (ucs2) cidW.getOrElse(32, dw)
          else 0.0
        val (dw2, cidW2) = parseVerticalMetrics(doc, d)
        Font(null, toUni, twoByte = true, cidW = cidW, dw = dw, spaceW = spaceW,
          ucs2 = ucs2, vertical = vertical, dw2 = dw2, cidW2 = cidW2)
      } else {
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
        val widths = parseWidths(doc, d)
        val spaceW = if (widths != null && widths(32) > 0) widths(32) else 0.0
        Font(table, toUni, twoByte = false, widths = widths, spaceW = spaceW)
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

  /** The word-break threshold for this font, in thousandths of em:
    * width-relative when the font declares a space width, the fixed
    * [[SpaceKern]] otherwise.
    */
  private def spaceThreshold(font: Font): Double = {
    val f = if (font == null) DefaultFont else font
    if (f.spaceW > 0) SpaceFraction * f.spaceW else SpaceKern
  }

  /** Advance of a show string in thousandths of em, plus glyph and
    * space-code counts (for Tc/Tw). Advance is −1 ("unknown") for a
    * simple font with no /Widths — Type0 always resolves through /DW.
    */
  private def showAdvance(font: Font, bytes: Array[Byte]): (Double, Int, Int) = {
    val f = if (font == null) DefaultFont else font
    if (f.twoByte) {
      var adv = 0.0; var n = 0
      var i = 0
      while (i + 1 < bytes.length) {
        val code = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
        adv += f.cidW.getOrElse(code, f.dw); n += 1
        i += 2
      }
      (adv, n, 0) // Tw applies only to byte 32 of 1-byte codes (ISO 32000 §9.3.3)
    } else if (f.widths == null) (-1.0, bytes.length, 0)
    else {
      var adv = 0.0; var spaces = 0
      var i = 0
      while (i < bytes.length) {
        val code = bytes(i) & 0xff
        adv += f.widths(code)
        if (code == 32) spaces += 1
        i += 1
      }
      (adv, bytes.length, spaces)
    }
  }

  private def decodeShow(font: Font, bytes: Array[Byte], out: StringBuilder): Unit = {
    val f = if (font == null) DefaultFont else font
    if (f.twoByte) {
      var i = 0
      while (i + 1 < bytes.length) {
        val code = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
        f.toUnicode.get(code) match {
          case Some(s) => out.append(s)
          case None =>
            // UCS2 CMaps: the code IS the BMP code point (surrogate
            // range is not a character — keep the replacement contract)
            if (f.ucs2 && !(code >= 0xD800 && code <= 0xDFFF)) out.append(code.toChar)
            else out.append('�')
        }
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
    // pen model (only live while the current font has widths):
    var fontSize = 0.0
    var charSpace = 0.0 // Tc, text units
    var wordSpace = 0.0 // Tw, text units
    var hScale = 1.0 // Tz / 100: scales every horizontal advance
    // Tm's horizontal scale (the `a` entry): generators that set the
    // size in the matrix (`1 Tf` + `12 0 0 12 x y Tm`) keep fontSize
    // at 1, so pen math must fold `a` into the effective size or every
    // Td gap is judged against a 12×-wrong em. Axis-aligned positive
    // scale folds in; a rotated/skewed/negative Tm sets NaN — the pen
    // is unknowable in that frame and NaN poisons every later pen
    // compare (no phantom spaces) until the next axis-aligned Tm/BT.
    var tmA = 1.0
    var curX = Double.NaN // pen x in RENDERED units (text units × tmA); NaN = unknowable
    var lineX = 0.0 // line-matrix origin x, rendered units (Td tx scales by tmA)
    // vertical-writing (-V CMap) pen: text flows DOWN a column, so the
    // pen advances along −y by dw2-scaled glyph counts; a same-column
    // y-jump past the pen is an encoded gap (space), an x-motion is a
    // new column (newline). Scaled/rotated Tm is out of subset for the
    // vertical pen (curYv goes NaN like the horizontal one).
    var curYv = Double.NaN // vertical pen y; NaN = unknowable
    var lineY = 0.0 // line-matrix origin y (vertical blocks)
    def isVert: Boolean = font != null && font.vertical
    def newline(): Unit = {
      while (sb.nonEmpty && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    }
    def space(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != ' ' && sb.charAt(sb.length - 1) != '\n')
        sb.append(' ')
    def num(v: PVal): Double = v match { case PNum(n) => n; case _ => 0.0 }
    /** Advance the pen over a shown string (NaN-sticky when the font
      * has no widths — a later Td gap can't be judged then).
      */
    def penShow(bytes: Array[Byte]): Unit = if (!curX.isNaN) {
      val (adv, glyphs, spaces) = showAdvance(font, bytes)
      if (adv < 0 || fontSize <= 0) curX = Double.NaN
      else curX +=
        (adv / 1000.0 * fontSize + glyphs * charSpace + spaces * wordSpace) * hScale * tmA
    }
    /** Same-line x-reposition: a positive gap past the pen wider than
      * the font's word-break threshold is an encoded space. The
      * threshold comparison happens in RENDERED units — Tz scales the
      * space glyph and the gap alike inside TJ (so kern decisions are
      * Tz-invariant), but a Td jump is in unscaled text space, so the
      * pen and the rendered space width must both carry hScale here.
      */
    def penJump(newX: Double): Unit = {
      if (!curX.isNaN && fontSize > 0 && hScale > 0 && tmA > 0) {
        val gapThousandths = (newX - curX) * 1000.0 / (fontSize * hScale * tmA)
        if (gapThousandths > spaceThreshold(font)) space()
      }
      curX = if (tmA.isNaN) Double.NaN else newX
    }
    /** Vertical pen: advance DOWN per glyph by its /W2 displacement
      * (falling back to /DW2); Tc adds along the column (ISO 32000
      * §9.3.2).
      */
    def penShowV(bytes: Array[Byte]): Unit = if (!curYv.isNaN) {
      if (fontSize <= 0 || tmA.isNaN || tmA != 1.0)
        curYv = Double.NaN // scaled Tm + vertical pen: out of subset
      else {
        var i = 0
        var adv = 0.0
        var glyphs = 0
        while (i + 1 < bytes.length) {
          val code = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
          adv += font.cidW2.getOrElse(code, font.dw2)
          glyphs += 1
          i += 2
        }
        curYv -= adv / 1000.0 * fontSize + glyphs * charSpace
      }
    }
    /** Same-column y-reposition: a DOWNWARD jump past the vertical pen
      * wider than the word-break threshold reads as a gap.
      */
    def penJumpV(newY: Double): Unit = {
      if (!curYv.isNaN && fontSize > 0) {
        val gapThousandths = (curYv - newY) * 1000.0 / fontSize
        if (gapThousandths > spaceThreshold(font)) space()
      }
      curYv = if (tmA.isNaN || tmA != 1.0) Double.NaN else newY
    }

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
            fontSize = num(operands.last)
          case "Tc" if operands.nonEmpty => charSpace = num(operands.last)
          case "Tw" if operands.nonEmpty => wordSpace = num(operands.last)
          case "Tz" if operands.nonEmpty => hScale = num(operands.last) / 100.0
          case "Td" | "TD" if operands.length >= 2 =>
            val tx = num(operands(operands.length - 2))
            val ty = num(operands.last)
            if (op == "TD") leading = -ty
            if (isVert) {
              // vertical: y-motion advances down the COLUMN (gap
              // check), x-motion opens a new column (line break)
              lineX += tx
              lineY += ty
              if (tx != 0.0) { newline(); curYv = lineY }
              else penJumpV(lineY)
            } else {
              lineX += tx * tmA // Td translates the LINE matrix: rendered Δx = tx·a
              if (ty != 0.0) { newline(); curY += ty; curX = lineX }
              else penJump(lineX)
            }
          case "TL" if operands.nonEmpty => leading = num(operands.last)
          case "T*" =>
            newline(); curY -= leading; curX = lineX
            curYv = Double.NaN // vertical leading is out of subset
          case "Tm" if operands.length >= 6 =>
            val a = num(operands(operands.length - 6))
            val bSkew = num(operands(operands.length - 5))
            val cSkew = num(operands(operands.length - 4))
            val y = num(operands.last)
            val x = num(operands(operands.length - 2))
            tmA = if (bSkew == 0.0 && cSkew == 0.0 && a > 0) a else Double.NaN
            if (isVert) {
              // vertical: the COLUMN is identified by x; same column →
              // judge the y-jump against the pen, new column → newline
              val sameCol = haveY && math.abs(x - lineX) <= 1e-6
              if (haveY && !sameCol) newline()
              curY = y; haveY = true
              lineX = x; lineY = y
              if (sameCol) penJumpV(y)
              else curYv = if (tmA.isNaN || tmA != 1.0) Double.NaN else y
            } else {
              val sameLine = haveY && math.abs(y - curY) <= 1e-6
              if (haveY && !sameLine) newline()
              curY = y; haveY = true
              lineX = x; lineY = y
              if (sameLine) penJump(x) else curX = if (tmA.isNaN) Double.NaN else x
            }
          case "Tj" if operands.nonEmpty =>
            operands.last match {
              case PStr(b) => decodeShow(font, b, sb)
                if (isVert) penShowV(b) else penShow(b)
              case _ =>
            }
          case "'" if operands.nonEmpty =>
            newline(); curY -= leading; curX = lineX; curYv = Double.NaN
            operands.last match {
              case PStr(b) => decodeShow(font, b, sb)
                if (isVert) penShowV(b) else penShow(b)
              case _ =>
            }
          case "\"" if operands.nonEmpty =>
            // aw ac string " — sets word and char spacing BEFORE the
            // show (ISO 32000 §9.4.3), so the pen stays honest for
            // this and every later show
            if (operands.length >= 3) {
              wordSpace = num(operands(operands.length - 3))
              charSpace = num(operands(operands.length - 2))
            }
            newline(); curY -= leading; curX = lineX; curYv = Double.NaN
            operands.last match {
              case PStr(b) => decodeShow(font, b, sb)
                if (isVert) penShowV(b) else penShow(b)
              case _ =>
            }
          case "TJ" if operands.nonEmpty =>
            operands.last match {
              case PArr(items) =>
                val thr = spaceThreshold(font)
                items.foreach {
                  case PStr(b) => decodeShow(font, b, sb)
                    if (isVert) penShowV(b) else penShow(b)
                  case PNum(n) =>
                    if (-n > thr) space()
                    if (isVert) {
                      // vertical kern translates along the column
                      if (!curYv.isNaN && fontSize > 0) curYv += n / 1000.0 * fontSize
                    } else if (!curX.isNaN && fontSize > 0)
                      curX -= n / 1000.0 * fontSize * hScale * tmA
                  case _ =>
                }
              case _ =>
            }
          case "BT" =>
            curY = 0.0; haveY = true; leading = 0.0; lineX = 0.0; curX = 0.0; tmA = 1.0
            lineY = 0.0; curYv = 0.0
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

  /** Width-kerned justified-text fixture: `nPages` pages over TWO
    * /Widths-bearing fonts chosen to defeat any fixed kern threshold —
    * a condensed face (space 200: its −120 word kerns sit BELOW the
    * old fixed 180) and a wide face (space 600: its −200 letter kerns
    * sit ABOVE it) — plus a line whose spaces are encoded purely as
    * same-line Td pen jumps with NO kern and NO space character.
    * Extracting it correctly requires the width-relative threshold
    * and the pen model; the extracted text is the closed form
    * [[expectedWidthText]] pins (and the oracle recomputes in SQL).
    */
  def composeWidthFixture(seed: Long, nPages: Int): Array[Byte] = {
    val n = math.max(1, nPages)
    val out = new java.io.ByteArrayOutputStream(1024 * n)
    val offsets = mutable.Map[Int, Int]()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets(num) = out.size(); w(s"$num 0 obj\n") }
    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val pageNums = (0 until n).map(i => 5 + 2 * i)
    beginObj(2)
    w(s"<< /Type /Pages /Kids [${pageNums.map(p => s"$p 0 R").mkString(" ")}] " +
      s"/Count $n /Resources << /Font << /F2 3 0 R /F3 4 0 R >> >> >>\nendobj\n")
    // condensed: space=200, every printable glyph 450 (codes 32..126)
    beginObj(3)
    w("<< /Type /Font /Subtype /TrueType /BaseFont /CondSans " +
      "/Encoding /WinAnsiEncoding /FirstChar 32 /LastChar 126 " +
      s"/Widths [200 ${Array.fill(94)("450").mkString(" ")}] >>\nendobj\n")
    // wide: space=600, every printable glyph 700
    beginObj(4)
    w("<< /Type /Font /Subtype /TrueType /BaseFont /WideSans " +
      "/Encoding /WinAnsiEncoding /FirstChar 32 /LastChar 126 " +
      s"/Widths [600 ${Array.fill(94)("700").mkString(" ")}] >>\nendobj\n")
    (0 until n).foreach { p =>
      val (pn, cn) = (5 + 2 * p, 6 + 2 * p)
      beginObj(pn)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents $cn 0 R >>\nendobj\n")
      // line 1 (F2, thr=100): −120/−130 are spaces, −60/−99 are kerns
      // line 2 (F3, thr=300): −350/−301 are spaces, −200 is a kern
      // line 3 (F2): "gap"=3×450=1350‰ → 16.2u at 12pt; Td 20 jumps
      //   3.8u=316‰>100 → space; "jo"=900‰ → 10.8u; Td 10.8 abuts → none
      val content =
        ("BT\n/F2 12 Tf\n72 720 Td\n" +
          "[(alpha) -120 (be) -60 (ta) -130 (gam) -99 (ma)] TJ\n" +
          "/F3 12 Tf\n0 -14 TD\n" +
          "[(Wi) -200 (de) -350 (font) -301 (line)] TJ\n" +
          "/F2 12 Tf\nT*\n(gap) Tj\n20 0 Td\n(jo) Tj\n10.8 0 Td\n(ined) Tj\n" +
          s"0 -14 Td\n(W $seed p $p end) Tj\nET\n")
          .getBytes(StandardCharsets.ISO_8859_1)
      beginObj(cn)
      w(s"<< /Length ${content.length} >>\nstream\n"); out.write(content)
      w("\nendstream\nendobj\n")
    }
    val size = 5 + 2 * n
    val xrefOff = out.size()
    w(s"xref\n0 $size\n0000000000 65535 f \n")
    (1 until size).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size $size /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** The text [[composeWidthFixture]] extracts for page `p` of seed
    * `seed` — a pure function of the inputs, so the oracle can
    * recompute it in SQL.
    */
  def expectedWidthText(seed: Long, p: Int): String =
    s"alpha beta gamma\nWide font line\ngap joined\nW $seed p $p end"

  /** CJK fixture: `nPages` pages over two Type0 fonts on PREDEFINED
    * UCS2 CMaps with NO /ToUnicode — a horizontal UniGB-UCS2-H line
    * (2-byte codes decode as BMP code points; a −100 kern sits below
    * the dw-derived threshold and must NOT split) and a vertical
    * UniJIS-UCS2-V block over two columns: three glyphs advance the
    * vertical pen by /DW2, a 0 −86 Td jump past the pen is an encoded
    * gap (space), an exactly-abutting 0 −12 Td is not, and the
    * column change (new Tm x) is a line break. Extracted text is
    * [[expectedCjkText]], a pure function of (seed, page).
    */
  def composeCjkFixture(seed: Long, nPages: Int): Array[Byte] = {
    val n = math.max(1, nPages)
    val out = new java.io.ByteArrayOutputStream(1024 * n)
    val offsets = mutable.Map[Int, Int]()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets(num) = out.size(); w(s"$num 0 obj\n") }
    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val pageNums = (0 until n).map(i => 7 + 2 * i)
    beginObj(2)
    w(s"<< /Type /Pages /Kids [${pageNums.map(p => s"$p 0 R").mkString(" ")}] " +
      s"/Count $n /Resources << /Font << /F6 3 0 R /F7 5 0 R >> >> >>\nendobj\n")
    beginObj(3)
    w("<< /Type /Font /Subtype /Type0 /BaseFont /GraftGB " +
      "/Encoding /UniGB-UCS2-H /DescendantFonts [4 0 R] >>\nendobj\n")
    beginObj(4)
    w("<< /Type /Font /Subtype /CIDFontType0 /BaseFont /GraftGB /DW 1000 >>\nendobj\n")
    beginObj(5)
    w("<< /Type /Font /Subtype /Type0 /BaseFont /GraftJP " +
      "/Encoding /UniJIS-UCS2-V /DescendantFonts [6 0 R] >>\nendobj\n")
    beginObj(6)
    w("<< /Type /Font /Subtype /CIDFontType0 /BaseFont /GraftJP " +
      "/DW 1000 /DW2 [880 -1000] >>\nendobj\n")
    (0 until n).foreach { p =>
      val (pn, cn) = (7 + 2 * p, 8 + 2 * p)
      beginObj(pn)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents $cn 0 R >>\nendobj\n")
      val digit = ((seed + p) % 10 + 10) % 10
      val content =
        (s"BT\n/F6 12 Tf\n72 700 Td\n<4E2D6587> Tj\n" +
          f"[<6D4B8BD5> -100 <004F004B${0x30 + digit}%04X>] TJ\nET\n" +
          "BT\n/F7 12 Tf\n1 0 0 1 300 700 Tm\n<7E414F535B57> Tj\n" +
          "0 -86 Td\n<4E0B> Tj\n0 -12 Td\n<4E00> Tj\n" +
          "1 0 0 1 280 700 Tm\n<5217> Tj\nET\n")
          .getBytes(StandardCharsets.ISO_8859_1)
      beginObj(cn)
      w(s"<< /Length ${content.length} >>\nstream\n"); out.write(content)
      w("\nendstream\nendobj\n")
    }
    val size = 7 + 2 * n
    val xrefOff = out.size()
    w(s"xref\n0 $size\n0000000000 65535 f \n")
    (1 until size).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size $size /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** The text [[composeCjkFixture]] extracts for page `p` of seed
    * `seed`: the UCS2-decoded horizontal line (kern joined) and the
    * vertical block in column order with the Td-gap space.
    */
  def expectedCjkText(seed: Long, p: Int): String =
    s"中文测试OK${((seed + p) % 10 + 10) % 10}\n繁体字 下一\n列"

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
