package graft.pipelines

import graft.SparkSpec
import graft.functions.PdfExprs
import graft.sources.{ImageCodec, PdfCodec}

/** Value-level contract of the scan pipeline (its oracle gate is
  * rows-only — PDF bytes are not SQL-reproducible): real input
  * document, parsed page counts, real rasterize → effects → JPEG →
  * A4 PDF reassembly, byte-for-byte deterministic.
  */
class ScanPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(1L, 2L, 3L, 7L).toDF("doc_id")

  test("scan plan: PDF whitelist, two columns, parsed page counts, naming, deterministic") {
    val out = ScanPipeline.scanPlan(docs)
      .orderBy("doc_id", "column_id")
      .as[(Long, String, String, String, Int, Int, Long, String)].collect().toSeq
    // doc 7 carries .xlsx and is whitelisted away; 3 docs × 2 columns remain
    assert(out.map(_._1).distinct === Seq(1L, 2L, 3L))
    assert(out.size === 6)
    assert(out.map(_._2).distinct.sorted === ScanPipeline.ScanColumns.sorted)
    // n_pages comes from PARSING the input document: doc_id % 3 + 1
    assert(out.collect { case (id, "file_col_a", _, _, n, _, _, _) => id -> n }.toMap
      === Map(1L -> 2, 2L -> 3, 3L -> 1))
    // the output document parses back to the same page count, in-plan
    assert(out.forall(r => r._6 === r._5), "out_pages != n_pages")
    // upload name: " SCANNE" inserted before .pdf, sanitized
    assert(out.head._4 === "doc_1 SCANNE.pdf")
    // output payload is non-empty and per-row deterministic across runs
    assert(out.forall(_._7 > 0))
    val again = ScanPipeline.scanPlan(docs)
      .orderBy("doc_id", "column_id")
      .as[(Long, String, String, String, Int, Int, Long, String)].collect().toSeq
    assert(again === out)
  }

  test("the output payload is a REAL A4 PDF rebuilt from real per-page scan renders") {
    val row = ScanPipeline.scanPlan(Seq(2L).toDF("doc_id"))
      .filter($"column_id" === "file_col_a").head
    val nPages = row.getAs[Int]("n_pages")
    assert(nPages === 3)
    // rebuild the expected document with the codec directly — the
    // fused per-page path: rasterize → pixel effects → ONE JPEG encode
    // (the reference's in-memory loop; no intermediate PNG/JPEG)
    val inPdf = PdfExprs.synthPdf(200L, 3, 62.0, 87.0)
    val pages = PdfCodec.scanPagesJpeg(inPdf, ScanPipeline.RenderDpi, "balanced", 85)
    assert(pages.length === nPages)
    // the fused path equals its composed stages run on raw pixels
    val byHand = ImageCodec.encodeJpeg(
      ImageCodec.scanEffectsMinimalPx(
        PdfCodec.parse(inPdf).pages.map(p => PdfCodec.rasterizePage(p, ScanPipeline.RenderDpi)).head,
        "balanced"), 85)
    assert(java.util.Arrays.equals(pages(0), byHand))
    val expected = PdfCodec.compose(
      pages.toSeq.map(j => PdfCodec.PageImage(j, ScanPipeline.A4WPt, ScanPipeline.A4HPt)),
      deflateContents = true)
    assert(row.getAs[Long]("out_len") === expected.length.toLong)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(expected)
      .map("%02x".format(_)).mkString
    assert(row.getAs[String]("out_md5") === md5)
    // and it IS a PDF: 3 A4 pages, one DCT image each, 150-dpi pixels
    val doc = PdfCodec.parse(expected)
    assert(doc.pageCount === 3)
    assert(doc.pages.forall(p => (p.mediaW, p.mediaH) === (595.0, 842.0)))
    assert(doc.pages.forall(_.images.values.forall(_.filter === "DCTDecode")))
    val rendered = doc.pages.head.images("Im0")
    assert(rendered.widthPx === math.ceil(62 * 150 / 72.0).toInt) // 130 px at 150 dpi
  }
}
