package graft.pipelines

import graft.functions.{PdfOps, StringOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §3.2 the scan endpoint (`app.py:180-330`) recomposed as one
  * declarative flow — now REAL end-to-end, container included:
  *
  *   items → two file columns                     (app.py:196)
  *     → explode file entries, PDF whitelist      P1/P2 (`extract_pdf_asset_ids`)
  *     → REAL PDF input (synth fixture)           [[graft.sources.PdfCodec.compose]]
  *     → page count from PARSING the document     (`app.py:250`: `for page in doc`)
  *     → per-page rasterize at 150 dpi            B6 REAL (`app.py:256-257`)
  *     → `add_scan_effects_minimal("balanced")`   B4 REAL (`app.py:266`)
  *     → JPEG quality-85 re-encode                B6 REAL (`app.py:268-271`)
  *     → in-order page reassembly into a REAL     B6 REAL (`app.py:276-283`:
  *       A4-page PDF (deflated content streams)    new page, insert, deflate save)
  *     → parse-back page count self-check         (out_pages column)
  *     → sanitized upload name per column         F3/F4 (`transfert_file`)
  *
  * Nothing is a stand-in anymore: the input is a real (synthetic-
  * content) PDF document, the page count comes from parsing it, pages
  * rasterize through the content-stream interpreter, effects run on
  * real pixels, and the output is a real PDF whose page count the
  * plan itself re-parses (`out_pages` must equal `n_pages` on every
  * row — asserted in ScanPipelineSpec and visible to the bench).
  *
  * The reference walks items one at a time over HTTP; here the page
  * grain is just an exploded DataFrame, so a webhook item and a
  * backfill differ only in partition count. Codec work is CPU-bound —
  * partition for cores, not bytes (same note as q_scan_effects).
  * The render→effects→encode chain runs FUSED per document
  * (`pdf_scan_pages`: one parse, pixels stay in memory between
  * stages, one JPEG encode — exactly the reference's in-memory loop),
  * then `posexplode` to page grain. For 100+-page corpora switch to
  * the composable page-grain chain (`pdf_rasterize` → `scanMinimal` →
  * `jpegReencode`) so one huge document cannot skew a partition.
  */
object ScanPipeline {

  /** The two monitored file columns (`app.py:196`, ids re-keyed). */
  val ScanColumns: Seq[String] = Seq("file_col_a", "file_col_b")

  /** Balanced-scan render dpi (`app.py:256`: 150 dpi ⇒ zoom 150/72). */
  val RenderDpi = 150

  /** A4 output page size in points (`app.py:277`). */
  val A4WPt = 595.0
  val A4HPt = 842.0

  /** Full scan plan over a document table: one output row per
    * (doc, column, pdf file) with the processed document's length/md5,
    * its parse-back page count and its upload name. Page sizes are
    * small by default so the fixture corpus processes in seconds; the
    * plan shape is unchanged at any render size.
    */
  def scanPlan(docs: DataFrame, pageWPt: Int = 62, pageHPt: Int = 87): DataFrame = {
    val spark = docs.sparkSession
    // one candidate file per (doc, column); every 7th is a non-PDF the
    // whitelist must drop, mirroring extract_pdf_asset_ids
    val files = docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("column_id", explode(array(ScanColumns.map(lit(_)): _*)))
      .withColumn("file_name", concat(lit("doc_"), col("doc_id"),
        when(col("doc_id") % 7 === 0, ".xlsx").otherwise(".pdf")))
      .filter(StringOps.fileExt(col("file_name")) === "pdf")
    val pages = files
      // the stored document: a REAL multi-page PDF (synthetic content)
      .withColumn("in_pdf", PdfOps.synthPdf(col("doc_id") * 100,
        (col("doc_id") % 3 + 1).cast("int"), lit(pageWPt.toDouble), lit(pageHPt.toDouble)))
      // REAL rasterize at 150 dpi → pixel-level effects → one JPEG
      // encode at 85, FUSED like the reference's in-memory loop
      // (`app.py:256-271`: pixmap → PIL effects → single save) — one
      // parse per document, no intermediate PNG/JPEG round trips; an
      // unparseable document explodes to zero rows — the P4 guard
      .select(col("doc_id"), col("column_id"), col("file_name"),
        posexplode(PdfOps.pdfScanPages(col("in_pdf"), lit(RenderDpi),
          lit("balanced"), lit(85))).as(Seq("page", "page_jpg")))
    pages.groupBy("doc_id", "column_id", "file_name")
      .agg(sort_array(collect_list(struct(col("page"), col("page_jpg")))).as("_pp"))
      // page count of the parsed document = pages the rasterizer found
      .withColumn("n_pages", size(col("_pp")))
      // B6: rebuild on fresh A4 pages, deflate save — a REAL PDF out
      .withColumn("out_pdf", PdfOps.pdfCompose(
        transform(col("_pp"), p => p.getField("page_jpg")), lit(A4WPt), lit(A4HPt)))
      // parse-back self-check: the output document's page count
      .withColumn("out_pages", PdfOps.pdfInfo(col("out_pdf")).getField("n_pages").cast("int"))
      .withColumn("upload_name",
        StringOps.sanitizeName(StringOps.signedFilename(col("file_name"), " SCANNE")))
      .select(col("doc_id"), col("column_id"), col("file_name"), col("upload_name"),
        col("n_pages"), col("out_pages"),
        length(col("out_pdf")).cast("long").as("out_len"),
        md5(col("out_pdf")).as("out_md5"))
  }
}
