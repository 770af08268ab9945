package graft.sources

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** ZIP container + Office Open XML extraction: central-directory
  * walks, stored/deflate round trips, EOCD-comment tolerance, bomb and
  * ZIP64 guards, entity decoding, and the three format extractors
  * against their fixture closed forms. Pure codec — no SparkSession.
  */
class OfficeCodecSpec extends AnyFunSuite {

  test("ZIP round trip: stored and deflate entries, names and bytes exact") {
    val files = Seq(
      "a.txt" -> "hello zip".getBytes,
      "dir/b.bin" -> Array.tabulate[Byte](4096)(i => (i * 31).toByte),
      "c-empty" -> Array.emptyByteArray)
    for (deflate <- Seq(true, false)) {
      val zip = ZipCodec.build(files, deflate)
      assert(zip.toSeq === ZipCodec.build(files, deflate).toSeq) // deterministic
      val es = ZipCodec.entries(zip)
      assert(es.map(_.name) === files.map(_._1).toVector)
      files.foreach { case (name, data) =>
        assert(ZipCodec.extract(zip, name).toSeq === data.toSeq, name)
      }
      assert(ZipCodec.extract(zip, "nope") === null)
    }
  }

  test("EOCD found behind a trailing comment; guards: ZIP64, bomb, truncation, method") {
    // payload long + repetitive so the builder picks DEFLATE (the bomb
    // guard lives on the inflate path; stored entries are bounded by
    // their actual bytes)
    val zip = ZipCodec.build(Seq("x" -> ("payload " * 40).getBytes))
    // a self-extractor-style trailing comment after the EOCD is legal
    val commented = zip ++ "trailing junk comment".getBytes
    assert(new String(ZipCodec.extract(commented, "x")) === "payload " * 40)
    assert(ZipCodec.entries(zip).head.method === 8) // premise: deflated
    // ZIP64 marker in the count field → typed reject
    val z64 = zip.clone()
    val eocd = zip.length - 22
    z64(eocd + 10) = 0xff.toByte; z64(eocd + 11) = 0xff.toByte
    val e1 = intercept[IllegalArgumentException](ZipCodec.entries(z64))
    assert(e1.getMessage.contains("ZIP64"))
    // truncated central directory → typed reject, not a scan loop
    val e2 = intercept[IllegalArgumentException](ZipCodec.entries(zip.take(zip.length - 30)))
    assert(e2.getMessage.contains("ZIP"))
    // declared-size bomb guard: lie about the uncompressed size
    val bomb = zip.clone()
    // central dir sizeU field of entry 0: locate 'PK\1\2' and patch +24
    val cd = {
      var i = 0
      var at = -1
      while (at < 0 && i < bomb.length - 4) {
        if (bomb(i) == 'P' && bomb(i + 1) == 'K' && bomb(i + 2) == 1 && bomb(i + 3) == 2) at = i
        i += 1
      }
      at
    }
    assert(cd > 0)
    bomb(cd + 24) = 0xff.toByte; bomb(cd + 25) = 0xff.toByte
    bomb(cd + 26) = 0xff.toByte; bomb(cd + 27) = 0x7f.toByte
    val e3 = intercept[IllegalArgumentException](ZipCodec.extract(bomb, "x"))
    assert(e3.getMessage.toLowerCase.contains("bomb") ||
      e3.getMessage.contains("declares") || e3.getMessage.contains("past its declared"))
    // unsupported method → typed reject
    val badMethod = zip.clone()
    badMethod(cd + 10) = 99.toByte
    val e4 = intercept[IllegalArgumentException](ZipCodec.extract(badMethod, "x"))
    assert(e4.getMessage.contains("method"))
  }

  test("entity decoding: named, decimal, hex, malformed pass-through") {
    assert(OfficeCodec.decodeEntities("a &amp; b &lt;x&gt; &quot;q&quot; &apos;s&apos;") ===
      "a & b <x> \"q\" 's'")
    assert(OfficeCodec.decodeEntities("caf&#233; &#x2014; ok") === "café — ok")
    assert(OfficeCodec.decodeEntities("bare & amp; &unknown; &#zz; tail") ===
      "bare & amp; &unknown; &#zz; tail")
  }

  test("DOCX: paragraphs, runs, tabs, entities, xml:space match the closed form") {
    for (n <- 1 to 3) {
      val docx = OfficeCodec.composeDocx(90L + n, n)
      val got = OfficeCodec.docxText(docx)
      val want = (0 until n).map(i => OfficeCodec.expectedDocxPara(90L + n, i)).mkString("\n")
      assert(got === want, s"n=$n")
    }
    assert(OfficeCodec.docxText(Array[Byte](1, 2, 3)) === null) // not a zip
    // a zip WITHOUT word/document.xml is not a docx
    assert(OfficeCodec.docxText(ZipCodec.build(Seq("a.txt" -> "x".getBytes))) === null)
  }

  test("XLSX: shared (multi-run), numeric and inline cells resolve per the closed form") {
    val cells = OfficeCodec.xlsxCells(OfficeCodec.composeXlsx(7L, 3))
    assert(cells === Vector(
      (0, "A1", "sv7"), (0, "B1", "21"), (0, "C1", "in0"),
      (0, "A2", "sv8"), (0, "B2", "24"), (0, "C2", "in1"),
      (0, "A3", "sv9"), (0, "B3", "27"), (0, "C3", "in2")))
    assert(OfficeCodec.xlsxCells("no zip".getBytes) === null)
  }

  test("PPTX: slide order, paragraph joins, run concatenation") {
    val slides = OfficeCodec.pptxText(OfficeCodec.composePptx(123L, 3))
    assert(slides.toSeq === (0 until 3).map(OfficeCodec.expectedPptxSlide(123L, _)))
    // slide10 must sort after slide2 (numeric, not lexicographic)
    val many = OfficeCodec.composePptx(5L, 11)
    assert(OfficeCodec.pptxText(many).toSeq ===
      (0 until 11).map(OfficeCodec.expectedPptxSlide(5L, _)))
    assert(OfficeCodec.pptxText(ZipCodec.build(Seq("a" -> "x".getBytes))) === null)
  }

  test("EPUB: spine order beats file-name order; fallback covers a torn container") {
    val epub = OfficeCodec.composeEpub(55L, 3)
    // spine path: chapters in READING order even though their file
    // names sort in reverse
    assert(OfficeCodec.epubText(epub).toSeq ===
      (0 until 3).map(OfficeCodec.expectedEpubChapter(55L, _)))
    // tear out the container: the name-order fallback still extracts,
    // but in (reverse) name order — proving the two paths differ
    val names = ZipCodec.entries(epub).map(_.name).filterNot(_ == "META-INF/container.xml")
    val torn = ZipCodec.build(names.map(n => n -> ZipCodec.extract(epub, n)))
    val fallback = OfficeCodec.epubText(torn).toSeq
    assert(fallback.toSet === (0 until 3).map(OfficeCodec.expectedEpubChapter(55L, _)).toSet)
    assert(fallback !== (0 until 3).map(OfficeCodec.expectedEpubChapter(55L, _)))
    assert(FormatDetect.detect(epub) === "epub")
    assert(OfficeCodec.epubText("not a zip".getBytes) === null)
  }

  test("TAR: build/entries/extract round trip, checksum and extension guards") {
    val files = Seq("a.txt" -> "alpha".getBytes,
      "sub/b.bin" -> Array.tabulate[Byte](700)(i => (i * 7).toByte), // spans 2 blocks
      "z" -> Array.emptyByteArray)
    val tar = TarCodec.build(files)
    assert(tar.toSeq === TarCodec.build(files).toSeq) // deterministic
    assert(TarCodec.isTar(tar))
    assert(TarCodec.entries(tar).map(e => (e.name, e.size)) ===
      files.map { case (n, d) => (n, d.length.toLong) }.toVector)
    files.foreach { case (n, d) => assert(TarCodec.extract(tar, n).toSeq === d.toSeq, n) }
    // checksum corruption → typed reject
    val bad = tar.clone(); bad(0) = 'X'
    val e1 = intercept[IllegalArgumentException](TarCodec.entries(bad))
    assert(e1.getMessage.contains("checksum"))
    // truncation mid-DATA → typed overrun reject (truncation at an
    // entry boundary is a clean data-end stop by contract)
    val e2 = intercept[IllegalArgumentException](TarCodec.entries(tar.take(515)))
    assert(e2.getMessage.contains("TAR"))
    assert(TarCodec.entries(tar.take(1024)).map(_.name) === Vector("a.txt"))
    // GNU long-name extension header → loud out-of-subset
    val ext = tar.clone(); ext(156) = 'L'
    // recompute the checksum so only the typeflag check can fire
    var sum = 0L
    (0 until 512).foreach(i => sum += (if (i >= 148 && i < 156) ' '.toInt else ext(i) & 0xff))
    val cs = ("0" * 6 + java.lang.Long.toOctalString(sum)).takeRight(6)
    cs.zipWithIndex.foreach { case (c, i) => ext(148 + i) = c.toByte }
    ext(154) = 0; ext(155) = ' '
    val e3 = intercept[IllegalArgumentException](TarCodec.entries(ext))
    assert(e3.getMessage.contains("extension"))
  }

  test("FormatDetect: magic-byte labels with container refinement, extensions lie") {
    import FormatDetect.detect
    assert(detect(OfficeCodec.composeDocx(1L, 1)) === "docx")
    assert(detect(OfficeCodec.composeXlsx(1L, 1)) === "xlsx")
    assert(detect(OfficeCodec.composePptx(1L, 1)) === "pptx")
    assert(detect(ZipCodec.build(Seq("just/a.file" -> "x".getBytes))) === "zip")
    assert(detect(PdfText.composeTextFixture(1L, 1)) === "pdf")
    assert(detect(TarCodec.build(Seq("f" -> "x".getBytes))) === "tar")
    assert(detect("WARC/1.0\r\n".getBytes) === "warc")
    // gzip refinement: a warc.gz member vs a plain gzip member
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    assert(detect(gz("WARC/1.0\r\nWARC-Type: response\r\n".getBytes)) === "warc-gz")
    assert(detect(gz("not a warc at all".getBytes)) === "gzip")
    assert(detect("<!DOCTYPE html><html></html>".getBytes) === "html")
    assert(detect("  \n<html><body>x</body>".getBytes) === "html")
    assert(detect("<?xml version=\"1.0\"?><r/>".getBytes) === "xml")
    assert(detect("ordinary prose about nothing".getBytes) === "text")
    assert(detect(Array[Byte](0, 1, 2, 3)) === "binary")
    assert(detect(Array.emptyByteArray) === "empty")
    assert(detect(null) === null)
    // a damaged zip container degrades to "zip", never throws
    val broken = OfficeCodec.composeDocx(1L, 1).take(40)
    assert(detect(broken) === "zip")
  }

  test("mutated-archive battery: extractors never throw, null or degrade") {
    val rnd = new scala.util.Random(17)
    val bases = Seq(OfficeCodec.composeDocx(1L, 2), OfficeCodec.composeXlsx(2L, 2),
      OfficeCodec.composePptx(3L, 2))
    var intact = 0
    (0 until 300).foreach { i =>
      val base = bases(i % 3)
      val mutated = i % 5 match {
        case 0 => base
        case 1 => base.take(1 + rnd.nextInt(base.length - 1))
        case 2 =>
          val b = base.clone()
          (0 until 6).foreach { _ =>
            val at = rnd.nextInt(b.length)
            b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
          }
          b
        case 3 => base.drop(rnd.nextInt(base.length))
        case _ => Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      }
      // must not throw — null or partial text are both acceptable
      val d = OfficeCodec.docxText(mutated)
      val x = OfficeCodec.xlsxCells(mutated)
      val p = OfficeCodec.pptxText(mutated)
      if (i % 5 == 0 && (d != null || x != null || p != null)) intact += 1
    }
    assert(intact >= 50, s"battery degenerate: $intact intact")
  }
}
