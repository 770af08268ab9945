package graft.pipelines

import graft.functions.{ImageOps, StringOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §3.2 the scan endpoint (`app.py:180-330`) recomposed as one
  * declarative flow, now running the REAL image codec end-to-end:
  *
  *   items → two file columns                     (app.py:196)
  *     → explode file entries, PDF whitelist      P1/P2 (`extract_pdf_asset_ids`)
  *     → per-page render at 150 dpi               B1 geometry (`app.py:256-257`)
  *     → `add_scan_effects_minimal("balanced")`   B4 REAL (`app.py:266`)
  *     → JPEG quality-85 re-encode                B6 REAL (`app.py:268-271`)
  *     → in-order page reassembly                 (`app.py:276-283`)
  *     → sanitized upload name per column         F3/F4 (`transfert_file`)
  *
  * Two steps remain stand-ins, both PDF-container-shaped: the page
  * RENDER (a PDF rasterizer is not in the container — a deterministic
  * synthetic page render stands in, with the reference's real
  * 150/72 zoom geometry) and the output container (pages reassemble
  * by ordered binary concat instead of a PDF writer). Everything
  * between them — scan effects, JPEG encode, decode — is the real
  * codec on real pixels.
  *
  * The reference walks items one at a time over HTTP; here the page
  * grain is just an exploded DataFrame, so a webhook item and a
  * backfill differ only in partition count. Codec work is CPU-bound —
  * partition for cores, not bytes (same note as q_scan_effects).
  */
object ScanPipeline {

  /** The two monitored file columns (`app.py:196`, ids re-keyed). */
  val ScanColumns: Seq[String] = Seq("file_col_a", "file_col_b")

  /** Balanced-scan render dpi (`app.py:256`: 150 dpi ⇒ zoom 150/72). */
  val RenderDpi = 150

  /** Full scan plan over a document table: one output row per
    * (doc, column, pdf file) with the processed payload's length/md5
    * and its upload name. Page renders are small by default so the
    * fixture corpus processes in seconds; the plan shape is unchanged
    * at any render size.
    */
  def scanPlan(docs: DataFrame, pageW: Int = 62, pageH: Int = 87): DataFrame = {
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
      .withColumn("n_pages", (col("doc_id") % 3 + 1).cast("int"))
      .withColumn("page", explode(sequence(lit(0), col("n_pages") - 1)))
      .withColumn("render_zoom", lit(RenderDpi / 72.0))
      // stubbed rasterize: deterministic synthetic page pixels
      .withColumn("page_png",
        ImageOps.synthImage(col("doc_id") * 100 + col("page"), lit(pageW), lit(pageH)))
      // REAL: scanner effects + the per-page JPEG re-encode
      .withColumn("page_jpg",
        ImageOps.jpegReencode(ImageOps.scanMinimal(col("page_png"), "balanced"), 85))
    pages.groupBy("doc_id", "column_id", "file_name", "n_pages")
      .agg(sort_array(collect_list(struct(col("page"), col("page_jpg")))).as("_pp"))
      .withColumn("out_pdf",
        aggregate(col("_pp"), lit(Array.empty[Byte]),
          (acc, p) => concat(acc, p.getField("page_jpg"))))
      .withColumn("upload_name",
        StringOps.sanitizeName(StringOps.signedFilename(col("file_name"), " SCANNE")))
      .select(col("doc_id"), col("column_id"), col("file_name"), col("upload_name"),
        col("n_pages"),
        length(col("out_pdf")).cast("long").as("out_len"),
        md5(col("out_pdf")).as("out_md5"))
  }
}
