package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.interfaces.RSAPublicKey
import java.security.{KeyStore, PrivateKey, Signature}
import org.apache.spark.sql.Dataset

/** B2/B3's CRYPTOGRAPHIC core, for real (`fixed_signature_utils
  * .py:132-254`): the reference signs documents with a PKCS#12
  * credential via pyHanko. The JDK implements the whole crypto half
  * natively — PKCS#12 keystore load, SHA256withRSA detached
  * signatures, certificate-based verification — so only the
  * PDF-EMBEDDING of the signature (incremental writer, visible
  * `TextStampStyle` field box) remains a stub: what this module
  * produces is the detached signature a PDF container would embed.
  *
  * Determinism: RSASSA-PKCS1-v1_5 is a deterministic scheme — same
  * key + same content → byte-identical signature (unlike PSS), so
  * signed outputs stay reproducible, the property every other
  * transform in this engine holds.
  *
  * Scale shape: signing is per-row CPU work; the keystore parse is
  * the expensive-init resource, done once per PARTITION in
  * [[signAll]] (the same pattern as the decoder in
  * [[Multimodal.decodeFeatures]]), never per row.
  */
object SignOps {

  /** First key-carrying alias of a PKCS#12 keystore → (private key,
    * certificate). Fails loudly when the store carries no key entry.
    */
  def loadPkcs12(bytes: Array[Byte], password: Array[Char]): (PrivateKey, X509Certificate) = {
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(new ByteArrayInputStream(bytes), password)
    val aliases = ks.aliases()
    while (aliases.hasMoreElements) {
      val a = aliases.nextElement()
      if (ks.isKeyEntry(a)) {
        val key = ks.getKey(a, password).asInstanceOf[PrivateKey]
        val cert = ks.getCertificate(a).asInstanceOf[X509Certificate]
        return (key, cert)
      }
    }
    throw new IllegalArgumentException("PKCS#12 keystore contains no private-key entry")
  }

  /** Detached SHA256withRSA signature over content. */
  def signDetached(content: Array[Byte], key: PrivateKey): Array[Byte] = {
    val s = Signature.getInstance("SHA256withRSA")
    s.initSign(key)
    s.update(content)
    s.sign()
  }

  /** Verify a detached signature against the certificate's public key. */
  def verifyDetached(content: Array[Byte], sig: Array[Byte], cert: X509Certificate): Boolean = {
    val s = Signature.getInstance("SHA256withRSA")
    s.initVerify(cert.getPublicKey)
    s.update(content)
    try s.verify(sig)
    catch { case _: java.security.SignatureException => false }
  }

  /** One signed payload row. `signer` is the certificate subject CN
    * line — the reference stamps it as text (F13); here it travels as
    * metadata next to the detached signature.
    */
  case class SignedDoc(doc_id: Long, content: Array[Byte], signature: Array[Byte], signer: String)

  /** Sign every document's content: keystore parsed ONCE per
    * partition, deterministic per-row signatures.
    */
  def signAll(docs: Dataset[Multimodal.MediaDoc], pkcs12: Array[Byte],
              password: String): Dataset[SignedDoc] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val (key, cert) = loadPkcs12(pkcs12, password.toCharArray)
      val signer = cert.getSubjectX500Principal.getName
      it.map(d => SignedDoc(d.doc_id, d.content, signDetached(d.content, key), signer))
    }
  }

  // ------------------------------------------------------------------
  // Embedded PDF signature — the incremental-update writer pyHanko
  // provides the reference (`fixed_signature_utils.py:160-205`:
  // SigFieldSpec box + incremental writer), re-implemented on
  // [[PdfCodec]]'s container subset. ISO 32000 §12.8 two-range
  // ByteRange signing with /SubFilter /adbe.x509.rsa_sha1 (the raw-
  // RSA subfilter — the one signature container the JDK can emit
  // without a CMS builder); the signer certificate travels in /Cert.
  // ------------------------------------------------------------------

  /** An extracted embedded signature: the two signed ranges, the
    * signature bytes, and the embedded signer certificate (if any).
    */
  final case class PdfSig(byteRange: Array[Long], signature: Array[Byte],
                          certDer: Option[Array[Byte]], name: String)

  private def escapeLiteral(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }

  /** Sign `pdf` by appending an incremental update: signature dict
    * (placeholder /Contents + fixed-width /ByteRange), a signature
    * widget on page 1 at `rect` (the reference's default sig_box
    * (300,470,500,530), `fixed_signature_utils.py:224`), the page
    * re-emitted with the widget in /Annots, and the catalog re-emitted
    * with /AcroForm — then splices the real ByteRange, signs the two
    * ranges around the /Contents hex with SHA256withRSA, and splices
    * the signature in. The original bytes are preserved verbatim as a
    * prefix (the defining property of an incremental update — and a
    * spec assertion).
    *
    * `ts` is explicit (determinism): "YYYYMMDDHHmmSS", emitted as
    * /M (D:…Z). Output bytes are a pure function of (pdf, key, ts).
    */
  def signPdfIncremental(pdf: Array[Byte], key: PrivateKey, cert: X509Certificate,
                         ts: String, rect: (Int, Int, Int, Int) = (300, 470, 500, 530),
                         fieldName: String = "Signature1"): Array[Byte] = {
    val doc = PdfCodec.parse(pdf)
    require(doc.pages.nonEmpty, "signPdfIncremental: document has no pages")
    require(doc.catalogNum > 0, "signPdfIncremental: document has no catalog")
    import PdfCodec._
    val sigSize = cert.getPublicKey match {
      case rsa: RSAPublicKey => (rsa.getModulus.bitLength + 7) / 8
      case other => throw new IllegalArgumentException(
        s"adbe.x509.rsa_sha1 needs an RSA credential, got ${other.getAlgorithm}")
    }
    val sigNum = doc.maxObjNum + 1
    val widgetNum = doc.maxObjNum + 2
    val page = doc.pages.head
    val pageDict = page.dict
    val catObj = doc.objects(doc.catalogNum)
    val catDict = catObj.value match {
      case d: PDict => d
      case _ => throw new IllegalArgumentException("catalog is not a dictionary")
    }
    val cn = cnOf(cert.getSubjectX500Principal.getName)
    val certHex = cert.getEncoded.map(b => f"${b & 0xff}%02x").mkString

    val base = pdf.length
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.Map[Int, Int]()
    def beginObj(num: Int): Unit = { offsets(num) = base + sb.length; sb.append(s"$num 0 obj\n") }

    sb.append('\n')
    // --- signature dictionary (placeholders spliced below)
    beginObj(sigNum)
    sb.append("<< /Type /Sig /Filter /Adobe.PPKLite /SubFilter /adbe.x509.rsa_sha1 ")
      .append(s"/Name (${escapeLiteral(cn)}) /M (D:${ts}Z) ")
      .append(s"/Cert <$certHex> ")
    val byteRangeAt = base + sb.length + "/ByteRange ".length
    sb.append("/ByteRange [0000000000 0000000000 0000000000 0000000000] ")
    sb.append("/Contents ")
    val contentsLt = base + sb.length
    sb.append("<").append("0" * (sigSize * 2)).append(">")
    val contentsGt = base + sb.length
    sb.append(" >>\nendobj\n")
    // --- widget annotation on page 1
    beginObj(widgetNum)
    sb.append(s"<< /Type /Annot /Subtype /Widget /FT /Sig " +
      s"/Rect [${rect._1} ${rect._2} ${rect._3} ${rect._4}] " +
      s"/T (${escapeLiteral(fieldName)}) /F 4 /P ${page.objNum} 0 R /V $sigNum 0 R >>\nendobj\n")
    // --- page 1 re-emitted with the widget appended to /Annots
    val existingAnnots: Vector[PVal] = pageDict.get("Annots") match {
      case Some(PArr(items)) => items
      case Some(r: PRef) => doc.objects.get(r.num).map(_.value) match {
        case Some(PArr(items)) => items
        case _ => Vector.empty
      }
      case _ => Vector.empty
    }
    val newPage = PDict(pageDict.m + ("Annots" -> PArr(existingAnnots :+ PRef(widgetNum, 0))))
    beginObj(page.objNum)
    sb.append(serialize(newPage)).append("\nendobj\n")
    // --- catalog re-emitted with /AcroForm
    val acroForm = PDict(Map(
      "Fields" -> PArr(Vector(PRef(widgetNum, 0))), "SigFlags" -> PNum(3)))
    val newCat = PDict(catDict.m + ("AcroForm" -> acroForm))
    beginObj(doc.catalogNum)
    sb.append(serialize(newCat)).append("\nendobj\n")
    // --- cross-reference section for the four amended/new objects
    val xrefOff = base + sb.length
    val updated = offsets.keys.toSeq.sorted
    sb.append("xref\n")
    // group consecutive object numbers into xref subsections
    val runs = updated.foldLeft(Vector.empty[Vector[Int]]) { (acc, n) =>
      if (acc.nonEmpty && acc.last.last == n - 1) acc.init :+ (acc.last :+ n)
      else acc :+ Vector(n)
    }
    runs.foreach { run =>
      sb.append(s"${run.head} ${run.length}\n")
      run.foreach(n => sb.append(f"${offsets(n)}%010d 00000 n \n"))
    }
    val prevStartxref = {
      val text = new String(pdf, StandardCharsets.ISO_8859_1)
      val at = text.lastIndexOf("startxref")
      if (at < 0) 0L
      else text.substring(at + "startxref".length).trim.takeWhile(_.isDigit) match {
        case "" => 0L
        case digits => digits.toLong
      }
    }
    sb.append(s"trailer\n<< /Size ${widgetNum + 1} /Root ${doc.catalogNum} 0 R " +
      s"/Prev $prevStartxref >>\nstartxref\n$xrefOff\n%%EOF\n")

    val out = java.util.Arrays.copyOf(pdf, base + sb.length)
    System.arraycopy(sb.toString.getBytes(StandardCharsets.ISO_8859_1), 0, out, base, sb.length)
    val total = out.length
    // splice the real ByteRange (same fixed width as the placeholder);
    // the excluded gap is the whole hex string INCLUDING its <> delimiters:
    // contentsLt is the index of '<', contentsGt is one past '>'
    val br = f"[${0}%010d ${contentsLt}%010d ${contentsGt}%010d ${total - contentsGt}%010d]"
    System.arraycopy(br.getBytes(StandardCharsets.ISO_8859_1), 0, out, byteRangeAt, br.length)
    val signedData = new Array[Byte](contentsLt + (total - contentsGt))
    System.arraycopy(out, 0, signedData, 0, contentsLt)
    System.arraycopy(out, contentsGt, signedData, contentsLt, total - contentsGt)
    val sig = signDetached(signedData, key)
    require(sig.length == sigSize, s"RSA signature length ${sig.length} != modulus size $sigSize")
    val sigHex = sig.map(b => f"${b & 0xff}%02x").mkString.getBytes(StandardCharsets.ISO_8859_1)
    System.arraycopy(sigHex, 0, out, contentsLt + 1, sigHex.length)
    out
  }

  /** Extract the LAST /Type /Sig object's ByteRange + signature +
    * embedded certificate; None when the document carries none.
    */
  def extractPdfSignature(pdf: Array[Byte]): Option[PdfSig] = {
    import PdfCodec._
    val doc = PdfCodec.parse(pdf)
    doc.order.reverse.iterator.map(doc.objects).collectFirst {
      case PObj(_, _, d: PDict, _) if d.get("Type").contains(PName("Sig")) =>
        val ranges = d.get("ByteRange") match {
          case Some(PArr(items)) => items.collect { case PNum(n) => n.toLong }.toArray
          case _ => Array.empty[Long]
        }
        val sig = d.get("Contents") match {
          case Some(PStr(b)) => b
          case _ => Array.empty[Byte]
        }
        val der = d.get("Cert") match {
          case Some(PStr(b)) => Some(b)
          case _ => None
        }
        val name = d.get("Name") match {
          case Some(PStr(b)) => new String(b, StandardCharsets.ISO_8859_1)
          case _ => ""
        }
        PdfSig(ranges, sig, der, name)
    }
  }

  /** Verify the embedded signature over its declared ByteRange, using
    * the provided certificate or the embedded /Cert. False on any
    * defect: no signature, malformed ranges, bad certificate, or a
    * digest mismatch (i.e. ANY byte of the signed ranges changed).
    */
  def verifyPdfSignature(pdf: Array[Byte], cert: Option[X509Certificate] = None): Boolean =
    try {
      extractPdfSignature(pdf).exists { s =>
        if (s.byteRange.length != 4 || s.signature.isEmpty) false
        else {
          val Array(a, b, c, d) = s.byteRange
          if (a != 0 || b < 0 || c < b || c + d != pdf.length) false
          else {
            val signer = cert.orElse(s.certDer.map { der =>
              CertificateFactory.getInstance("X.509")
                .generateCertificate(new ByteArrayInputStream(der)).asInstanceOf[X509Certificate]
            })
            signer.exists { x509 =>
              val data = new Array[Byte]((b + d).toInt)
              System.arraycopy(pdf, 0, data, 0, b.toInt)
              System.arraycopy(pdf, c.toInt, data, b.toInt, d.toInt)
              verifyDetached(data, s.signature, x509)
            }
          }
        }
      }
    } catch { case _: Exception => false }

  /** One embedded-signed document row: the full signed PDF, the
    * signer CN line, and the in-row verification of the embedded
    * signature (the crypto round trip as a column).
    */
  case class SignedPdfDoc(doc_id: Long, pdf: Array[Byte], signature: Array[Byte],
                          signer: String, verified: Boolean)

  /** B2/B3 complete: stamp → containerize → embedded-sign → verify,
    * per row. Image payloads get the visible stamp burned into the
    * pixels, are wrapped into a one-page PDF at their pixel size in
    * points, then signed via [[signPdfIncremental]]; payloads that
    * are ALREADY PDFs sign directly (the reference's own flow —
    * download → compress → sign). Payloads that are neither fail
    * loudly: the reference endpoint only ever signs PDFs. Keystore
    * parsed once per partition; output is a pure function of
    * (input, key, ts).
    */
  def signAllPdf(docs: Dataset[Multimodal.MediaDoc], pkcs12: Array[Byte],
                 password: String, ts: String,
                 jpegQuality: Int = 85): Dataset[SignedPdfDoc] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val (key, cert) = loadPkcs12(pkcs12, password.toCharArray)
      val signer = cert.getSubjectX500Principal.getName
      val lines = Seq(s"Firmado por: ${cnOf(signer)}", s"Fecha: $ts")
      val tsCompact = ts.filter(_.isDigit)
      it.map { d =>
        val pdf =
          if (PdfCodec.isPdf(d.content)) d.content
          else {
            val px = ImageCodec.decode(d.content)
            require(px != null, s"signAllPdf: doc ${d.doc_id} is neither a PDF nor an image")
            val stamped = ImageCodec.stampTextBox(px, lines,
              px.w * 300 / 595, px.h * 470 / 842, px.w * 500 / 595, px.h * 530 / 842)
            PdfCodec.compose(Seq(PdfCodec.PageImage(
              ImageCodec.encodeJpeg(stamped, jpegQuality), px.w.toDouble, px.h.toDouble)))
          }
        val signed = signPdfIncremental(pdf, key, cert, tsCompact)
        val sig = extractPdfSignature(signed).map(_.signature).getOrElse(Array.empty[Byte])
        SignedPdfDoc(d.doc_id, signed, sig, signer, verifyPdfSignature(signed))
      }
    }
  }

  /** The CN attribute of an X.500 name ("CN=Alice,O=X" → "Alice"). */
  def cnOf(x500: String): String =
    x500.split(',').map(_.trim).collectFirst {
      case s if s.startsWith("CN=") => s.stripPrefix("CN=")
    }.getOrElse(x500)

  /** [[signAll]] with the VISIBLE stamp applied first on image
    * payloads (`fixed_signature_utils.py:138`: `"Firmado por:
    * %(signer)s\nFecha: %(ts)s"` at the `sig_box`, default
    * (300,470,500,530) in A4 points — scaled here to the render's
    * pixel grid). The signature covers the STAMPED bytes, exactly as
    * a PDF signature covers the appearance stream. `ts` is an
    * explicit parameter — a wall-clock default would make the output
    * a function of when it ran. Non-image payloads sign unstamped
    * (the PDF-container stamp path stays stubbed).
    */
  def signAllStamped(docs: Dataset[Multimodal.MediaDoc], pkcs12: Array[Byte],
                     password: String, ts: String,
                     jpegQuality: Int = 85): Dataset[SignedDoc] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val (key, cert) = loadPkcs12(pkcs12, password.toCharArray)
      val signer = cert.getSubjectX500Principal.getName
      val lines = Seq(s"Firmado por: ${cnOf(signer)}", s"Fecha: $ts")
      it.map { d =>
        val px = ImageCodec.decode(d.content)
        val content =
          if (px == null) d.content
          else {
            val stamped = ImageCodec.stampTextBox(px, lines,
              px.w * 300 / 595, px.h * 470 / 842, px.w * 500 / 595, px.h * 530 / 842)
            ImageCodec.encodeJpeg(stamped, jpegQuality)
          }
        SignedDoc(d.doc_id, content, signDetached(content, key), signer)
      }
    }
  }
}
