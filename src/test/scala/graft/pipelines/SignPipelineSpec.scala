package graft.pipelines

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** §3.1 composed: real compress + visible stamp + one-page PDF
  * containerization + EMBEDDED incremental-update signature (verified
  * in-row from the document's own /Cert) + ref-exact renaming, as one
  * plan. The detached-signature variant (signPlan) stays covered too.
  */
class SignPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val p12: Array[Byte] = {
    val dir = Files.createTempDirectory("graft_p12_pipe")
    val path = dir.resolve("signer.p12").toString
    val keytool = Paths.get(System.getProperty("java.home"), "bin", "keytool").toString
    val proc = new ProcessBuilder(keytool, "-genkeypair", "-alias", "graft", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12", "-keystore", path,
      "-storepass", "changeit", "-dname", "CN=Pipeline Signer", "-validity", "30")
      .redirectErrorStream(true).start()
    assert(proc.waitFor() == 0, new String(proc.getInputStream.readAllBytes()))
    Files.readAllBytes(Paths.get(path))
  }

  test("signPlanVerified: every row's EMBEDDED signature verifies in-query") {
    val out = SignPipeline.signPlanVerified(Seq(1L, 2L, 3L).toDF("doc_id"), p12, "changeit")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L, 3L))
    assert(out.forall(_._5), "an embedded signature failed verification")
    assert(out.forall(_._4 === 256L)) // RSA-2048 signature inside the container
    assert(out.head._2 === "doc_1 SIGNÉ.pdf")
  }

  test("signAllPdf output is a signed, parseable one-page PDF with the stamp burned in") {
    import graft.sources.{Multimodal, PdfCodec, SignOps}
    val media = Seq(Multimodal.MediaDoc(5L, "image/jpeg",
      graft.sources.ImageCodec.encodeJpeg(
        graft.sources.ImageCodec.decode(graft.sources.ImageCodec.synthPng(5L, 60, 84)), 90)))
      .toDS()
    val signed = SignOps.signAllPdf(media, p12, "changeit", "2026-01-01 00:00:00").head()
    assert(signed.verified)
    assert(PdfCodec.isPdf(signed.pdf))
    val doc = PdfCodec.parse(signed.pdf)
    assert(doc.pageCount === 1)
    assert((doc.pages.head.mediaW, doc.pages.head.mediaH) === (60.0, 84.0))
    assert(SignOps.verifyPdfSignature(signed.pdf)) // re-verify outside the query
    // tamper → fails
    val t = signed.pdf.clone(); t(t.length / 2) = (t(t.length / 2) ^ 1).toByte
    assert(!SignOps.verifyPdfSignature(t))
  }

  test("ephemeralPkcs12 yields a loadable signing credential") {
    val bytes = SignPipeline.ephemeralPkcs12("Spec Signer")
    val (_, cert) = graft.sources.SignOps.loadPkcs12(bytes, "changeit".toCharArray)
    assert(cert.getSubjectX500Principal.getName.contains("CN=Spec Signer"))
  }

  test("sign plan: compressed payload, RSA-2048 signature, SIGNÉ rename, deterministic") {
    val out = SignPipeline.signPlan(Seq(1L, 2L).toDF("doc_id"), p12, "changeit")
      .orderBy("doc_id")
      .as[(Long, String, String, Long, Long, String)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L))
    assert(out.head._2 === "doc_1 SIGNÉ.pdf")
    assert(out.forall(_._3.contains("CN=Pipeline Signer")))
    assert(out.forall(_._4 > 0)) // compressed JPEG payload present
    assert(out.forall(_._5 === 256L)) // RSA-2048 detached signature
    val again = SignPipeline.signPlan(Seq(1L, 2L).toDF("doc_id"), p12, "changeit")
      .orderBy("doc_id").as[(Long, String, String, Long, Long, String)].collect().toSeq
    assert(again === out) // deterministic crypto + codec end-to-end
  }
}
