package graft.pipelines

import graft.functions.{ImageOps, StringOps}
import graft.sources.{Multimodal, SignOps}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** §3.1 the sign endpoint (`app.py:68-82`, `fixed_signature_utils
  * .py:211-254` `sign_pdf_url_and_transfer`) recomposed declaratively:
  *
  *   download                       → stub transport (UrlFetch echo shape)
  *   → B1 compress (dpi, quality)   → REAL on image payloads
  *   → B2 sign                      → REAL: visible stamp on the pixels,
  *                                    one-page PDF containerization, and
  *                                    an EMBEDDED incremental-update
  *                                    signature (ByteRange two-range
  *                                    SHA256withRSA, widget + AcroForm) —
  *                                    [[graft.sources.SignOps.signAllPdf]]
  *   → F3 " SIGNÉ" rename           → ref-exact
  *   → K1 upload plan               → the sink task shape
  *
  * Only the download transport remains a stand-in (zero egress).
  * Like the reference's defaults: compress at dpi=144/q=60 ≈ the
  * "minimum/balanced" band — here the preset knob is explicit.
  */
object SignPipeline {

  /** One signed-upload task row per input doc: compressed payload
    * with the visible stamp, detached signature over the stamped
    * bytes, renamed upload name. `ts` is explicit (determinism).
    */
  def signPlan(docs: DataFrame, pkcs12: Array[Byte], password: String,
               quality: String = "balanced",
               ts: String = "2026-01-01 00:00:00"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rendered = docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id")) // CPU-bound codec+crypto
      .withColumn("page", ImageOps.synthImage(col("doc_id") * 13, lit(60), lit(84)))
      .withColumn("compressed", ImageOps.compressImage(col("page"), quality))
    val media: Dataset[Multimodal.MediaDoc] = rendered
      .select(col("doc_id"), lit("image/jpeg").as("mime"), col("compressed").as("content"))
      .as[Multimodal.MediaDoc]
    SignOps.signAllStamped(media, pkcs12, password, ts).toDF()
      .withColumn("file_name", concat(lit("doc_"), col("doc_id"), lit(".pdf")))
      .withColumn("upload_name",
        StringOps.sanitizeName(StringOps.signedFilename(col("file_name"))))
      .select(col("doc_id"), col("upload_name"), col("signer"),
        length(col("content")).cast("long").as("n_bytes"),
        length(col("signature")).cast("long").as("sig_bytes"),
        md5(col("signature")).as("sig_md5"))
  }

  /** [[signPlan]] upgraded to the COMPLETE B2: visible stamp on the
    * compressed pixels, one-page PDF containerization, embedded
    * incremental-update signature, and a per-row VERIFICATION of that
    * embedded signature from the document alone (via its /Cert) — the
    * end-to-end container + crypto round trip as a column (every row
    * must read true; pinned in SignPipelineSpec).
    */
  def signPlanVerified(docs: DataFrame, pkcs12: Array[Byte], password: String,
                       quality: String = "balanced",
                       ts: String = "2026-01-01 00:00:00"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rendered = docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("page", ImageOps.synthImage(col("doc_id") * 13, lit(60), lit(84)))
      .withColumn("compressed", ImageOps.compressImage(col("page"), quality))
    val media: Dataset[Multimodal.MediaDoc] = rendered
      .select(col("doc_id"), lit("image/jpeg").as("mime"), col("compressed").as("content"))
      .as[Multimodal.MediaDoc]
    SignOps.signAllPdf(media, pkcs12, password, ts).toDF()
      .withColumn("upload_name", StringOps.sanitizeName(StringOps.signedFilename(
        concat(lit("doc_"), col("doc_id"), lit(".pdf")))))
      .select(col("doc_id"), col("upload_name"),
        length(col("pdf")).cast("long").as("n_bytes"),
        length(col("signature")).cast("long").as("sig_bytes"),
        col("verified"))
  }

  /** A throwaway PKCS#12 credential via the JDK's own keytool — for
    * the registered demo query and tests (a real deployment injects
    * its credential; nothing here persists key material).
    */
  def ephemeralPkcs12(cn: String): Array[Byte] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_p12_q")
    val path = dir.resolve("signer.p12").toString
    val keytool = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "keytool").toString
    val proc = new ProcessBuilder(keytool, "-genkeypair", "-alias", "graft", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12", "-keystore", path,
      "-storepass", "changeit", "-dname", s"CN=$cn", "-validity", "30")
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    require(proc.waitFor() == 0, s"keytool failed: $out")
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
  }
}
