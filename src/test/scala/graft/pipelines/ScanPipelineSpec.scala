package graft.pipelines

import graft.SparkSpec
import graft.sources.ImageCodec

/** Value-level contract of the scan pipeline (its oracle gate is
  * rows-only — JPEG bytes are not SQL-reproducible).
  */
class ScanPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(1L, 2L, 3L, 7L).toDF("doc_id")

  test("scan plan: PDF whitelist, two columns, page counts, naming, deterministic output") {
    val out = ScanPipeline.scanPlan(docs)
      .orderBy("doc_id", "column_id")
      .as[(Long, String, String, String, Int, Long, String)].collect().toSeq
    // doc 7 carries .xlsx and is whitelisted away; 3 docs × 2 columns remain
    assert(out.map(_._1).distinct === Seq(1L, 2L, 3L))
    assert(out.size === 6)
    assert(out.map(_._2).distinct.sorted === ScanPipeline.ScanColumns.sorted)
    // n_pages = doc_id % 3 + 1
    assert(out.collect { case (id, "file_col_a", _, _, n, _, _) => id -> n }.toMap
      === Map(1L -> 2, 2L -> 3, 3L -> 1))
    // upload name: " SCANNE" inserted before .pdf, sanitized
    assert(out.head._4 === "doc_1 SCANNE.pdf")
    // output payload is non-empty and per-row deterministic across runs
    assert(out.forall(_._6 > 0))
    val again = ScanPipeline.scanPlan(docs)
      .orderBy("doc_id", "column_id")
      .as[(Long, String, String, String, Int, Long, String)].collect().toSeq
    assert(again === out)
  }

  test("the reassembled payload is the in-order concat of real per-page JPEGs") {
    val row = ScanPipeline.scanPlan(Seq(2L).toDF("doc_id"))
      .filter($"column_id" === "file_col_a").head
    val nPages = row.getAs[Int]("n_pages")
    assert(nPages === 3)
    // rebuild the expected payload with the codec directly
    val expected = (0 until nPages).map { p =>
      val png = ImageCodec.synthPng(2L * 100 + p, 62, 87)
      ImageCodec.jpegReencode(ImageCodec.scanEffectsMinimal(png, "balanced"), 85)
    }.reduce(_ ++ _)
    assert(row.getAs[Long]("out_len") === expected.length.toLong)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(expected)
      .map("%02x".format(_)).mkString
    assert(row.getAs[String]("out_md5") === md5)
    // the payload starts with a JPEG magic (first page)
    assert(ImageCodec.isJpeg(expected))
  }
}
