package graft.sources

import java.io.ByteArrayInputStream
import java.security.cert.X509Certificate
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
