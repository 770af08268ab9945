package graft.functions

import graft.SparkSpec
import graft.sources.PdfCodec
import org.apache.spark.sql.functions._

/** Fuzz contract of the PDF expression surface — the mirror of
  * [[UrlOpsFuzzSpec]] and the AVI/WARC hostile-input hardening: at
  * corpus scale a poisoned document must yield a NULL row (with a
  * typed reject reason via `pdf_check`), never a task kill. Properties:
  * (a) nothing throws over mutated/garbage payloads, including the
  * depth-capped crafted-nesting case whose StackOverflowError would
  * escape a `catch Exception` guard; (b) re-parse is idempotent
  * (pdf_info twice → identical struct); (c) pdf_check agrees with
  * pdf_info (ok ⟺ parseable, reason null ⟺ ok).
  */
class PdfFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def mutatedCorpus(n: Int): Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(42)
    // alternate the DCT-page base with the LZW/RunLength/sub-byte and
    // text-document fixtures so bit flips land in every decoder
    val bases = Seq(PdfExprs.synthPdf(7L, 2, 120, 160),
      PdfCodec.composeFiltersFixture(7L, 13, 10),
      PdfCodec.composeCcittFixture(7L, 70, 12),
      graft.sources.PdfText.composeTextFixture(7L, 2),
      graft.sources.PdfText.composeWidthFixture(7L, 2))
    (0 until n).map { i =>
      val base = bases(i % bases.length)
      i % 6 match {
        case 0 => base // intact
        case 1 => base.take(1 + rnd.nextInt(base.length - 1)) // truncation
        case 2 => // bit flips (keep the header so parse actually runs)
          val b = base.clone()
          (0 until 8).foreach { _ =>
            val at = 8 + rnd.nextInt(b.length - 8)
            b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
          }
          b
        case 3 => // random splice mid-document
          val at = 8 + rnd.nextInt(base.length - 8)
          val junk = Array.fill(1 + rnd.nextInt(32))(rnd.nextInt(256).toByte)
          base.take(at) ++ junk ++ base.drop(at)
        case 4 => // header + garbage tail
          "%PDF-1.4\n".getBytes ++ Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
        case _ => // raw garbage / empty
          Array.fill(rnd.nextInt(48))(rnd.nextInt(256).toByte)
      }
    }
  }

  test("never throws over 300 mutated payloads; pdf_check explains every reject") {
    val rows = mutatedCorpus(300).zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("i", "b")
      .select(col("i"),
        PdfOps.pdfInfo(col("b")).as("info"),
        PdfOps.pdfInfo(col("b")).as("info2"), // idempotent re-parse
        PdfOps.pdfCheck(col("b")).as("chk"),
        PdfOps.pdfRasterize(col("b"), lit(0), lit(24)).as("png"),
        PdfOps.pdfText(col("b")).as("txt"),
        PdfOps.pdfScanPages(col("b"), lit(24), lit("medium"), lit(60)).as("scans"))
      .collect() // (a) nothing throws across the whole corpus
    var ok = 0
    rows.foreach { r =>
      val info = if (r.isNullAt(1)) null else r.getStruct(1)
      val info2 = if (r.isNullAt(2)) null else r.getStruct(2)
      assert(info == info2, s"re-parse not idempotent at i=${r.getLong(0)}")
      val chk = r.getStruct(3)
      assert(chk != null) // null only for null payload
      val (okF, reason) = (chk.getBoolean(0), if (chk.isNullAt(1)) null else chk.getString(1))
      assert(okF == (reason == null), s"reason must be null iff ok: $okF / $reason")
      assert(okF == (info != null), s"pdf_check disagrees with pdf_info: $okF / $info")
      if (okF) ok += 1
    }
    assert(ok >= 50, s"fuzz corpus degenerate: only $ok intact documents") // the i%6==0 band
  }

  test("never throws over 300 mutated ENCRYPTED payloads; tampered crypto is a typed reject") {
    // same mutation battery, but the base document cycles the four
    // standard-security-handler variants — a bit flip can now land in
    // /O //U //UE (password check fails), in AES ciphertext (padding
    // check fails), or in the /Encrypt dict itself (handler reject):
    // every one must surface as a NULL row + pdf_check reason, never a
    // task kill
    val rnd = new scala.util.Random(43)
    val bases = (0 to 3).map(v => graft.sources.PdfCrypt.composeEncryptedFixture(11L + v, 13, 10, v))
    val corpus = (0 until 300).map { i =>
      val base = bases(i % 4)
      i % 5 match {
        case 0 => base // intact
        case 1 => base.take(1 + rnd.nextInt(base.length - 1))
        case 2 =>
          val b = base.clone()
          (0 until 8).foreach { _ =>
            val at = 8 + rnd.nextInt(b.length - 8)
            b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
          }
          b
        case 3 =>
          val at = 8 + rnd.nextInt(base.length - 8)
          val junk = Array.fill(1 + rnd.nextInt(32))(rnd.nextInt(256).toByte)
          base.take(at) ++ junk ++ base.drop(at)
        case _ => base.reverse // header gone → not-pdf reject
      }
    }
    val rows = corpus.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("i", "b")
      .select(col("i"),
        PdfOps.pdfInfo(col("b")).as("info"),
        PdfOps.pdfCheck(col("b")).as("chk"),
        PdfOps.pdfRasterize(col("b"), lit(0), lit(24)).as("png"),
        PdfOps.pdfText(col("b")).as("txt"))
      .collect() // nothing throws across the whole corpus
    var ok = 0
    rows.foreach { r =>
      val info = if (r.isNullAt(1)) null else r.getStruct(1)
      val chk = r.getStruct(2)
      val (okF, reason) = (chk.getBoolean(0), if (chk.isNullAt(1)) null else chk.getString(1))
      assert(okF == (reason == null), s"reason must be null iff ok: $okF / $reason")
      assert(okF == (info != null), s"pdf_check disagrees with pdf_info: $okF / $info")
      if (okF) ok += 1
    }
    assert(ok >= 60, s"fuzz corpus degenerate: only $ok intact documents") // the i%5==0 band
  }

  test("crafted deep nesting rejects via the depth cap instead of StackOverflowError") {
    val deepArr = ("%PDF-1.4\n1 0 obj\n" + "[" * 100000).getBytes
    val deepDict = ("%PDF-1.4\n1 0 obj\n" + "<</A " * 100000).getBytes
    Seq(deepArr, deepDict).foreach { b =>
      assert(PdfCodec.pdfInfo(b) == null)
      val (okF, reason) = PdfCodec.checkPdf(b)
      assert(!okF && reason != null)
    }
  }

  test("null payload null-propagates through every expression") {
    val r = Seq((1L, null: Array[Byte])).toDF("i", "b")
      .select(PdfOps.pdfInfo(col("b")), PdfOps.pdfCheck(col("b")),
        PdfOps.pdfRasterize(col("b"), lit(0), lit(24)), PdfOps.pdfText(col("b")))
      .head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }
}
