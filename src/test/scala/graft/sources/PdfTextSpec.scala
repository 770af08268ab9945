package graft.sources

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** PDF text extraction: operator subset, string escapes, encodings
  * (WinAnsi/MacRoman/Standard/Differences), ToUnicode CMaps (simple +
  * Type0 Identity-H), kern-space thresholds, line-break placement, and
  * the decrypt-then-extract composition. Pure codec — no SparkSession.
  */
class PdfTextSpec extends AnyFunSuite {
  import PdfCodec._

  /** One-page document with an arbitrary content stream and font
    * dictionary bodies (`/F1`, `/F2`, …) — extra objects (ToUnicode
    * streams, descendants) appended verbatim from `extraObjs` starting
    * at object 10.
    */
  private def doc1(content: String, fonts: Map[String, String],
                   extraObjs: Seq[String] = Nil): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n%âãÏÓ\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val fontRefs = fonts.keys.zipWithIndex.map { case (name, i) => name -> (20 + i) }.toMap
    val fontDict = fontRefs.map { case (n, num) => s"/$n $num 0 R" }.mkString(" ")
    w(s"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 " +
      s"/Resources << /Font << $fontDict >> >> >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>\nendobj\n")
    val c = content.getBytes(StandardCharsets.ISO_8859_1)
    w(s"4 0 obj\n<< /Length ${c.length} >>\nstream\n"); out.write(c); w("\nendstream\nendobj\n")
    fonts.foreach { case (n, body) => w(s"${fontRefs(n)} 0 obj\n$body\nendobj\n") }
    extraObjs.zipWithIndex.foreach { case (body, i) => w(s"${10 + i} 0 obj\n$body\nendobj\n") }
    w("trailer\n<< /Size 30 /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }
  private val Helv = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
  private def extract(pdf: Array[Byte]): String = {
    val d = parse(pdf)
    PdfText.extractPageText(d, d.pages.head)
  }

  test("fixture round trip: every page's text matches the closed form, all page counts") {
    for (n <- 1 to 3) {
      val pdf = PdfText.composeTextFixture(1234L + n, n)
      val texts = PdfText.extractAll(pdf)
      assert(texts.length === n)
      (0 until n).foreach { p =>
        assert(texts(p) === PdfText.expectedFixtureText(1234L + n, p), s"page $p of $n")
      }
    }
  }

  test("literal-string escapes, octal bytes, hex strings, WinAnsi high range") {
    val content = "BT /F1 10 Tf 72 700 Td " +
      "(esc \\( \\) \\\\ tab\\there) Tj " +
      "(oct \\351\\200) Tj " + // é (WinAnsi E9) + € (WinAnsi 80)
      "<48692E> Tj ET"
    assert(extract(doc1(content, Map("F1" -> Helv))) ===
      "esc ( ) \\ tab\there" + "oct é€" + "Hi.")
  }

  test("TJ kern: gap beyond the threshold is a space, letter-kern is not") {
    // negative values are GAPS (space beyond the threshold); positive
    // values tighten and never produce a space
    val content = "BT /F1 10 Tf 72 700 Td [(A) -250 (B) -30 (C) -181 (D) 300 (E)] TJ ET"
    assert(extract(doc1(content, Map("F1" -> Helv))) === "A BC DE")
  }

  test("line breaks: TD/T* vs pure-x Td; Tm baseline moves; ' operator") {
    val content = "BT /F1 10 Tf 72 700 Td (one) Tj 200 0 Td (same) Tj " +
      "0 -12 TD (two) Tj T* (three) Tj (four) ' ET " +
      "BT /F1 10 Tf 1 0 0 1 72 600 Tm (five) Tj 1 0 0 1 300 600 Tm (five-b) Tj " +
      "1 0 0 1 72 580 Tm (six) Tj ET"
    assert(extract(doc1(content, Map("F1" -> Helv))) ===
      "onesame\ntwo\nthree\nfour\nfive" + "five-b\nsix")
  }

  test("Differences overlay on a base encoding; uniXXXX glyph names resolve") {
    val font = "<< /Type /Font /Subtype /Type1 /BaseFont /Custom " +
      "/Encoding << /BaseEncoding /WinAnsiEncoding " +
      "/Differences [65 /eacute /Euro 200 /uni0416] >> >>"
    // 65→é, 66→€, 200→Ж; 67 stays WinAnsi 'C'
    val content = "BT /F1 10 Tf 72 700 Td (ABC\\310) Tj ET"
    assert(extract(doc1(content, Map("F1" -> font))) === "é€CЖ")
  }

  test("MacRomanEncoding decodes its high range") {
    val font = "<< /Type /Font /Subtype /TrueType /BaseFont /X /Encoding /MacRomanEncoding >>"
    // MacRoman 0x8E = é, 0xA5 = •
    val content = "BT /F1 10 Tf 72 700 Td (caf\\216 \\245) Tj ET"
    assert(extract(doc1(content, Map("F1" -> font))) === "café •")
  }

  test("StandardEncoding default: curly quotes and the documented high range") {
    val font = "<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman >>"
    // 39→’ 96→‘ 0xA6→ƒ 0xD0→—
    val content = "BT /F1 10 Tf 72 700 Td (it's `q` \\246 \\320) Tj ET"
    assert(extract(doc1(content, Map("F1" -> font))) ===
      "it’s ‘q‘ ƒ —")
  }

  test("ToUnicode bfchar + bfrange (increment and array forms) override the table") {
    val cmap = "/CIDInit begin 1 begincodespacerange <00> <FF> endcodespacerange\n" +
      "2 beginbfchar <41> <0416> <42> <00670067> endbfchar\n" +
      "1 beginbfrange <61> <63> <0430> endbfrange\n" +
      "1 beginbfrange <70> <71> [<042F> <044F>] endbfrange\nend"
    val stream = s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream"
    val font = "<< /Type /Font /Subtype /Type1 /BaseFont /X " +
      "/Encoding /WinAnsiEncoding /ToUnicode 10 0 R >>"
    // A→Ж, B→gg (multi-char), abc→абв (range increment), pq→Яя (array), D untouched
    val content = "BT /F1 10 Tf 72 700 Td (ABabcpqD) Tj ET"
    assert(extract(doc1(content, Map("F1" -> font), Seq(stream))) ===
      "ЖggабвЯяD")
  }

  test("Type0 Identity-H: 2-byte codes via ToUnicode; unmapped → U+FFFD") {
    val cmap = "2 beginbfchar <0041> <0048> <0042> <0049> endbfchar\n" +
      "1 beginbfrange <0100> <0102> <0061> endbfrange"
    val stream = s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream"
    val font = "<< /Type /Font /Subtype /Type0 /BaseFont /X /Encoding /Identity-H " +
      "/DescendantFonts [11 0 R] /ToUnicode 10 0 R >>"
    val desc = "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /X >>"
    // codes 0041 0042 0100 0101 0102 00FF(unmapped)
    val content = "BT /F1 10 Tf 72 700 Td <00410042 01000101 0102 00FF> Tj ET"
    assert(extract(doc1(content, Map("F1" -> font), Seq(stream, desc))) ===
      "HIabc�")
  }

  private val Cond = "<< /Type /Font /Subtype /TrueType /BaseFont /CondSans " +
    "/Encoding /WinAnsiEncoding /FirstChar 32 /LastChar 126 " +
    s"/Widths [200 ${Seq.fill(94)("450").mkString(" ")}] >>"
  private val Wide = "<< /Type /Font /Subtype /TrueType /BaseFont /WideSans " +
    "/Encoding /WinAnsiEncoding /FirstChar 32 /LastChar 126 " +
    s"/Widths [600 ${Seq.fill(94)("700").mkString(" ")}] >>"

  test("width fixture round trip: every page matches the closed form") {
    for (n <- 1 to 3) {
      val pdf = PdfText.composeWidthFixture(55L + n, n)
      val texts = PdfText.extractAll(pdf)
      assert(texts.length === n)
      (0 until n).foreach { p =>
        assert(texts(p) === PdfText.expectedWidthText(55L + n, p), s"page $p of $n")
      }
    }
  }

  test("width-relative kern: condensed font splits words on kerns below the fixed threshold") {
    // space glyph = 200 → threshold 100; a fixed-180 heuristic would
    // run this justified line together
    val content = "BT /F1 12 Tf 72 700 Td [(alpha) -120 (be) -60 (ta) -130 (gamma)] TJ ET"
    assert(extract(doc1(content, Map("F1" -> Cond))) === "alpha beta gamma")
  }

  test("width-relative kern: wide font keeps aggressive letter-kerns joined") {
    // space glyph = 600 → threshold 300; a fixed-180 heuristic would
    // split the -200 letter kern
    val content = "BT /F1 12 Tf 72 700 Td [(Wi) -200 (de) -350 (open)] TJ ET"
    assert(extract(doc1(content, Map("F1" -> Wide))) === "Wide open")
  }

  test("pen model: same-line Td jump past the pen is a space, abutting Td is not") {
    // "gap" = 3×450 = 1350‰ → 16.2u at 12pt; Td 20 leaves a 316‰ gap
    // (space), then Td 10.8 exactly abuts "jo" = 900‰ (no space)
    val content = "BT /F1 12 Tf 72 700 Td (gap) Tj 20 0 Td (jo) Tj 10.8 0 Td (ined) Tj ET"
    assert(extract(doc1(content, Map("F1" -> Cond))) === "gap joined")
    // a widthless font can't judge the same jump — no phantom space
    val content2 = "BT /F1 12 Tf 72 700 Td (gap) Tj 20 0 Td (joined) Tj ET"
    assert(extract(doc1(content2, Map("F1" -> Helv))) === "gapjoined")
  }

  test("pen model: Tc character spacing counts toward the pen position") {
    // 3 glyphs of "gap" at Tc=2 add 6u: pen = 72+16.2+6 = 94.2; Td 24
    // (→96) leaves 1.8u = 150‰ > 100 → space. Td 18.5 (→90.5) lands
    // BEHIND the Tc-advanced pen (no space) — a Tc-blind pen (88.2)
    // would read it as a 191‰ gap and split.
    val spaced = "BT /F1 12 Tf 2 Tc 72 700 Td (gap) Tj 24 0 Td (X) Tj ET"
    assert(extract(doc1(spaced, Map("F1" -> Cond))) === "gap X")
    val behind = "BT /F1 12 Tf 2 Tc 72 700 Td (gap) Tj 18.5 0 Td (X) Tj ET"
    assert(extract(doc1(behind, Map("F1" -> Cond))) === "gapX")
  }

  test("/MissingWidth fills codes outside [FirstChar, LastChar]") {
    // widths declared only for 65..66 (500 each), space implied by
    // /MissingWidth 200 → threshold 100, so a -120 kern still splits
    val font = "<< /Type /Font /Subtype /TrueType /BaseFont /Partial " +
      "/Encoding /WinAnsiEncoding /FirstChar 65 /LastChar 66 " +
      "/Widths [500 500] /FontDescriptor 10 0 R >>"
    val fd = "<< /Type /FontDescriptor /FontName /Partial /MissingWidth 200 >>"
    val content = "BT /F1 12 Tf 72 700 Td [(A) -120 (B)] TJ ET"
    assert(extract(doc1(content, Map("F1" -> font), Seq(fd))) === "A B")
    // without the descriptor, the space width is unknown → fixed-180
    // threshold → the same kern joins
    val bare = "<< /Type /Font /Subtype /TrueType /BaseFont /Partial " +
      "/Encoding /WinAnsiEncoding /FirstChar 65 /LastChar 66 /Widths [500 500] >>"
    assert(extract(doc1(content, Map("F1" -> bare))) === "AB")
  }

  test("Tz horizontal scaling: condensed rendering halves advances; Td gaps judged in rendered units") {
    // ISO 32000 §9.4.4: tx = ((w/1000)·Tfs + Tc + Tw)·Th. At Tz 50,
    // "gap" advances 8.1u (not 16.2): pen = 80.1. Td 20 (→92) leaves
    // an 11.9u rendered gap over a 1.2u rendered space → space; a
    // Tz-blind pen (88.2) would see 3.8u — still a space here, so pin
    // the abutting case instead: Td 8.1 exactly abuts under Tz 50
    // (no space) but would read as a 6.75‰·12pt backward jump… i.e. a
    // Tz-blind model puts the pen at 88.2 PAST 80.1 and never spaces
    // either — the DISCRIMINATING case is the wide gap below.
    val abut = "BT /F1 12 Tf 50 Tz 72 700 Td (gap) Tj 8.1 0 Td (X) Tj ET"
    assert(extract(doc1(abut, Map("F1" -> Cond))) === "gapX")
    // Td 12 (→84) leaves 3.9u over the Tz-halved pen; rendered-space
    // width is 0.5·200‰·12pt·0.5 = 100‰ threshold against
    // 3.9·1000/(12·0.5) = 650‰ → space. A Tz-blind pen (88.2) sees a
    // NEGATIVE gap and wrongly joins.
    val spaced = "BT /F1 12 Tf 50 Tz 72 700 Td (gap) Tj 12 0 Td (X) Tj ET"
    assert(extract(doc1(spaced, Map("F1" -> Cond))) === "gap X")
    // TJ kern decisions are Tz-invariant: the same -120/-60 pattern
    // splits identically at Tz 50
    val kerns = "BT /F1 12 Tf 50 Tz 72 700 Td [(alpha) -120 (be) -60 (ta)] TJ ET"
    assert(extract(doc1(kerns, Map("F1" -> Cond))) === "alpha beta")
  }

  test("Tm scale: font size carried in the matrix (1 Tf + 12 0 0 12 Tm) folds into pen math") {
    // generator style: fontSize=1, matrix scale 12. "gap" = 1350‰ →
    // 16.2 rendered units; a same-line Tm to exactly-abutting x=88.2
    // must NOT space (a scale-blind pen sits at 73.35 and reads a
    // phantom 14850‰ gap), while x=92.4 leaves 4.2u = 350‰ → space.
    val abut = "BT /F1 1 Tf 12 0 0 12 72 700 Tm (gap) Tj 12 0 0 12 88.2 700 Tm (X) Tj ET"
    assert(extract(doc1(abut, Map("F1" -> Cond))) === "gapX")
    val spaced = "BT /F1 1 Tf 12 0 0 12 72 700 Tm (gap) Tj 12 0 0 12 92.4 700 Tm (X) Tj ET"
    assert(extract(doc1(spaced, Map("F1" -> Cond))) === "gap X")
    // Td under a scaled Tm translates in LINE space: 1.35 text units
    // = 16.2 rendered units — exactly abutting, no space
    val tdAbut = "BT /F1 1 Tf 12 0 0 12 72 700 Tm (gap) Tj 1.35 0 Td (X) Tj ET"
    assert(extract(doc1(tdAbut, Map("F1" -> Cond))) === "gapX")
    val tdSpaced = "BT /F1 1 Tf 12 0 0 12 72 700 Tm (gap) Tj 1.7 0 Td (X) Tj ET"
    assert(extract(doc1(tdSpaced, Map("F1" -> Cond))) === "gap X")
  }

  test("rotated/skewed Tm: pen unknowable — no phantom spaces, decode order intact") {
    // 90°-rotated matrix: same-baseline reposition must not be judged
    // against an unknowable pen (no phantom space), and text decodes
    // in stream order
    val rot = "BT /F1 12 Tf 0 12 -12 0 72 700 Tm (ro) Tj 0 12 -12 0 200 700 Tm (tated) Tj ET"
    assert(extract(doc1(rot, Map("F1" -> Cond))) === "rotated")
    // recovery: a later axis-aligned Tm re-arms the pen on its line
    val recover = "BT /F1 12 Tf 0 12 -12 0 72 700 Tm (a) Tj " +
      "1 0 0 1 72 600 Tm (gap) Tj 20 0 Td (X) Tj ET"
    assert(extract(doc1(recover, Map("F1" -> Cond))) === "a\ngap X")
  }

  test("the \" operator sets Tw/Tc before showing — the pen stays honest afterwards") {
    // 0 2 (gap) " sets Tc=2: pen = 72 + 16.2 + 3·2 = 94.2; Td 18.5
    // (→90.5) lands BEHIND the pen → no space. A model that ignored
    // the " operands would keep Tc=0, put the pen at 88.2, read a
    // 191‰ gap and emit a phantom space.
    val content = "BT /F1 12 Tf 72 700 Td 0 2 (gap) \" 18.5 0 Td (X) Tj ET"
    assert(extract(doc1(content, Map("F1" -> Cond))) === "gapX")
  }

  test("CID /W widths: threshold scales to the mapped space glyph") {
    val cmap = "3 beginbfchar <0020> <0020> <0041> <0041> <0042> <0042> endbfchar"
    val stream = s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream"
    val font = "<< /Type /Font /Subtype /Type0 /BaseFont /X /Encoding /Identity-H " +
      "/DescendantFonts [11 0 R] /ToUnicode 10 0 R >>"
    // narrow space (200 via /W) → threshold 100 → -120 splits
    val descNarrow = "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /X " +
      "/DW 1000 /W [32 [200] 65 66 500] >>"
    val content = "BT /F1 12 Tf 72 700 Td [<0041> -120 <0042>] TJ ET"
    assert(extract(doc1(content, Map("F1" -> font), Seq(stream, descNarrow))) === "A B")
    // no /W entry for the space → /DW 1000 → threshold 500 → -120 joins
    val descWideDefault = "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /X /DW 1000 >>"
    assert(extract(doc1(content, Map("F1" -> font), Seq(stream, descWideDefault))) === "AB")
  }

  test("Identity-V (vertical writing) decodes in stream order via ToUnicode") {
    // decode is encoding-form-independent for Type0: the 2-byte codes
    // map through ToUnicode whether the CMap is -H or -V; the emitted
    // order is stream order (what corpus extractors emit for vertical
    // text too — only the PEN semantics differ, and those are width
    // features, not decode features)
    val cmap = "3 beginbfchar <0041> <7E41> <0042> <7E42> <0043> <7E43> endbfchar"
    val stream = s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream"
    val font = "<< /Type /Font /Subtype /Type0 /BaseFont /X /Encoding /Identity-V " +
      "/DescendantFonts [11 0 R] /ToUnicode 10 0 R >>"
    val desc = "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /X >>"
    val content = "BT /F1 10 Tf 72 700 Td <004100420043> Tj ET"
    assert(extract(doc1(content, Map("F1" -> font), Seq(stream, desc))) === "繁繂繃")
  }

  test("CJK fixture round trip: UCS2 decode + vertical pen, all page counts") {
    for (n <- 1 to 3) {
      val pdf = PdfText.composeCjkFixture(23L + n, n)
      val texts = PdfText.extractAll(pdf)
      assert(texts.length === n)
      (0 until n).foreach { p =>
        assert(texts(p) === PdfText.expectedCjkText(23L + n, p), s"page $p of $n")
      }
    }
  }

  test("UCS2 CMap decode: no ToUnicode needed; explicit ToUnicode still overrides") {
    val desc = "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /X >>"
    val font = "<< /Type /Font /Subtype /Type0 /BaseFont /X " +
      "/Encoding /UniKS-UCS2-H /DescendantFonts [10 0 R] >>"
    val content = "BT /F1 10 Tf 72 700 Td <D55CAE00> Tj ET" // 한글
    assert(extract(doc1(content, Map("F1" -> font), Seq(desc))) === "한글")
    // surrogate-range codes are not characters → replacement
    val bad = "BT /F1 10 Tf 72 700 Td <D800> Tj ET"
    assert(extract(doc1(bad, Map("F1" -> font), Seq(desc))) === "�")
    // a ToUnicode CMap wins over the UCS2 identity
    val cmap = "1 beginbfchar <D55C> <0041> endbfchar"
    val stream = s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream"
    val font2 = "<< /Type /Font /Subtype /Type0 /BaseFont /X " +
      "/Encoding /UniKS-UCS2-H /DescendantFonts [11 0 R] /ToUnicode 10 0 R >>"
    assert(extract(doc1("BT /F1 10 Tf 72 700 Td <D55CAE00> Tj ET",
      Map("F1" -> font2), Seq(stream, desc))) === "A글")
  }

  test("vertical pen: DW2 advances, same-column gap spaces, abutting jump does not") {
    val desc = "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /X /DW2 [880 -500] >>"
    val font = "<< /Type /Font /Subtype /Type0 /BaseFont /X " +
      "/Encoding /UniJIS-UCS2-V /DescendantFonts [10 0 R] >>"
    // DW2 magnitude 500 → each glyph advances 5u at 10pt. Two glyphs
    // from y=700 → pen 690. Td 0 -10 abuts (no space); then one glyph
    // → 685; Td 0 -40 → 650 jumps 35u = 3500‰ > 500 → space.
    val content = "BT /F1 10 Tf 1 0 0 1 300 700 Tm <4E2D6587> Tj " +
      "0 -10 Td <4E00> Tj 0 -40 Td <4E8C> Tj ET"
    assert(extract(doc1(content, Map("F1" -> font), Seq(desc))) === "中文一 二")
    // vertical TJ kern: -n past the threshold is a gap, small kern is not
    val kern = "BT /F1 10 Tf 1 0 0 1 300 700 Tm [<4E2D> -100 <6587> -900 <4E00>] TJ ET"
    assert(extract(doc1(kern, Map("F1" -> font), Seq(desc))) === "中文 一")
  }

  test("/W2 per-CID vertical widths override /DW2 (both array and range forms)") {
    // 中 (20013) advances 500 via the triplet form, 一/丁 (19968-19969)
    // 250 via the range form, everything else /DW2 1000
    val desc = "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /X " +
      "/DW2 [880 -1000] /W2 [20013 [-500 0 0] 19968 19969 -250 0 0] >>"
    val font = "<< /Type /Font /Subtype /Type0 /BaseFont /X " +
      "/Encoding /UniJIS-UCS2-V /DescendantFonts [10 0 R] >>"
    // at 10pt: 中一 advance = 5 + 2.5 = 7.5u → pen 692.5; Td 0 -7.5
    // abuts (no space); then 文 (DW2) = 10u → 682.5; Td 0 -40 → 652.5
    // jumps 30u = 3000‰ > 500 → space
    val content = "BT /F1 10 Tf 1 0 0 1 300 700 Tm <4E2D4E00> Tj " +
      "0 -7.5 Td <6587> Tj 0 -40 Td <4E8C> Tj ET"
    assert(extract(doc1(content, Map("F1" -> font), Seq(desc))) === "中一文 二")
    // a DW2-only pen (advance 20u for 中一) would overshoot the 0 -7.5
    // jump and never space... pin the discriminating case: with W2, a
    // Td 0 -20 after 中一 (pen 692.5 → 680) is a 12.5u gap = space; a
    // DW2-only pen sits at 680 exactly and would NOT space
    val disc = "BT /F1 10 Tf 1 0 0 1 300 700 Tm <4E2D4E00> Tj 0 -20 Td <4E8C> Tj ET"
    assert(extract(doc1(disc, Map("F1" -> font), Seq(desc))) === "中一 二")
  }

  test("decrypt-then-extract: encrypted text documents extract identically") {
    val plain = PdfText.composeTextFixture(777L, 2)
    val want = PdfText.extractAll(plain).toSeq
    for (variant <- 0 to 3) {
      val enc = PdfCrypt.encryptPdf(plain, variant, 777L)
      // the text must not be readable from the raw encrypted bytes
      assert(!new String(enc, "ISO-8859-1").contains("page 0 line one"))
      assert(PdfText.extractAll(enc).toSeq === want,
        s"variant ${PdfCrypt.VariantNames(variant)}")
    }
  }

  test("docMeta: UTF-16BE title, PDFDocEncoding fields, absent keys null; decrypts") {
    val plain = PdfText.composeTextFixture(321L, 1)
    val m = PdfCodec.docMeta(plain)
    assert(m(0) === PdfText.expectedFixtureTitle(321L)) // BOM consumed, em dash intact
    assert(m(1) === "Graft Pipeline")
    assert(m(5) === "graft-pdf 1")
    assert(m(6) === "D:20260101000000Z")
    assert(m(2) == null && m(3) == null && m(4) == null && m(7) == null) // absent keys
    // /Info strings are encrypted on protected documents — and decrypt
    for (variant <- Seq(0, 2, 3)) {
      val enc = PdfCrypt.encryptPdf(plain, variant, 321L)
      assert(!new String(enc, "ISO-8859-1").contains("Graft Pipeline"))
      assert(PdfCodec.docMeta(enc).toSeq === m.toSeq,
        s"variant ${PdfCrypt.VariantNames(variant)}")
    }
    // no /Info at all → all-null struct, not a throw
    val noInfo = PdfCodec.composePredictorFixture(5L, 8, 8)
    assert(PdfCodec.docMeta(noInfo).forall(_ == null))
    assert(PdfCodec.docMeta(Array[Byte](9, 9)) === null)
  }

  test("guards: non-PDF null; pageless/fontless documents degrade, never throw") {
    assert(PdfText.extractAll(Array[Byte](1, 2, 3)) === null)
    assert(PdfText.extractAll("%PDF-1.4 garbage".getBytes) === null)
    // no Tf at all → StandardEncoding default path
    val content = "BT 72 700 Td (plain) Tj ET"
    assert(extract(doc1(content, Map("F1" -> Helv))) === "plain")
    // unknown font name in Tf → default font, text still extracted
    val content2 = "BT /Nope 10 Tf 72 700 Td (still here) Tj ET"
    assert(extract(doc1(content2, Map("F1" -> Helv))) === "still here")
  }
}
