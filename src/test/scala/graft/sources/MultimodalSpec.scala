package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S7/B multimodal plumbing: binaryFile source, BinaryType metadata,
  * deterministic stub transforms, frame chunking, typed mapPartitions
  * decode, and F9 payload parse edge cases.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binaryFile source reads (path, length, content) with pushed path filters") {
    val dir = Files.createTempDirectory("graft_bin").toFile
    val f1 = new java.io.File(dir, "a.pdf"); Files.write(f1.toPath, "hello pdf".getBytes("UTF-8"))
    val f2 = new java.io.File(dir, "b.jpg"); Files.write(f2.toPath, "jj".getBytes("UTF-8"))
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .load(dir.getAbsolutePath)
    val rows = df.select("path", "length", "content").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("path").endsWith("a.pdf"))
    assert(rows.head.getAs[Long]("length") === 9L)
    assert(new String(rows.head.getAs[Array[Byte]]("content"), "UTF-8") === "hello pdf")
  }

  test("binaryMeta computes byte length and md5 of the content bytes") {
    val df = Multimodal.withBinaryContent(Seq((1L, "abc")).toDF("doc_id", "text"), "text")
    val r = Multimodal.binaryMeta(df, "content").select("byte_len", "content_md5").head
    assert(r.getLong(0) === 3L)
    assert(r.getString(1) === "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
  }

  test("scanEffectStub is deterministic, seed-sensitive and binary-typed") {
    val df = Seq((1L, "content")).toDF("doc_id", "text")
      .transform(Multimodal.withBinaryContent(_, "text"))
    val out = df.select(
      Multimodal.scanEffectStub(col("content"), ":1").as("a"),
      Multimodal.scanEffectStub(col("content"), ":1").as("b"),
      Multimodal.scanEffectStub(col("content"), ":2").as("c")).head
    val (a, b, c) = (out.getAs[Array[Byte]](0), out.getAs[Array[Byte]](1), out.getAs[Array[Byte]](2))
    assert(a.toSeq === b.toSeq)     // deterministic
    assert(a.toSeq !== c.toSeq)     // seed changes output
    assert(a.length === 16)         // md5-digest sized
  }

  test("resizeStub computes the reference's dpi/zoom geometry with a deterministic payload") {
    val df = Seq((1L, "pdfbytes")).toDF("doc_id", "text")
      .transform(Multimodal.withBinaryContent(_, "text"))
    val r = Multimodal.resizeStub(df, "content", dpi = 144)
      .select("render_zoom", "out_width_px", "out_height_px", "resized").head
    assert(r.getDouble(0) === 2.0)       // 144/72
    assert(r.getInt(1) === 1190)         // ceil(595*2)
    assert(r.getInt(2) === 1684)         // ceil(842*2)
    assert(r.getAs[Array[Byte]](3).length === 16)
    val again = Multimodal.resizeStub(df, "content", dpi = 144).select("resized").head.getAs[Array[Byte]](0)
    assert(r.getAs[Array[Byte]](3).toSeq === again.toSeq)
  }

  test("frame chunking covers all bytes in order with ceil(len/size) frames") {
    val df = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 bytes
      .transform(Multimodal.withBinaryContent(_, "text"))
    val frames = Multimodal.explodeFrames(df, "content", 4)
      .orderBy("frame_idx")
      .select("frame_idx", "frame")
      .collect()
      .map(r => (r.getInt(0), new String(r.getAs[Array[Byte]](1), "UTF-8")))
    assert(frames.toSeq === Seq((0, "abcd"), (1, "efgh"), (2, "ij")))
  }

  test("frames of an empty binary is an empty array, and of a null binary is null") {
    val df = Seq((1L, Some("")), (2L, None)).toDF("doc_id", "text")
      .withColumn("content", when($"text".isNotNull, encode($"text", "UTF-8")))
    val out = df.select($"doc_id", Multimodal.frames($"content", 4).as("fr"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[_]].length)))
      .toMap
    assert(out === Map(1L -> Some(0), 2L -> None)) // not Seq [ "", "" ]
  }

  test("typed mapPartitions decode produces one feature row per doc, deterministically") {
    val docs = Seq(
      Multimodal.MediaDoc(1L, "image/png", Array[Byte](1, 2, 3)),
      Multimodal.MediaDoc(2L, "image/png", Array[Byte](9, 9))).toDS()
    val out1 = Multimodal.decodeFeatures(spark, docs).collect().sortBy(_.doc_id)
    val out2 = Multimodal.decodeFeatures(spark, docs).collect().sortBy(_.doc_id)
    assert(out1.toSeq === out2.toSeq)
    assert(out1.map(_.doc_id).toSeq === Seq(1L, 2L))
    assert(out1.forall(f => f.n_bytes > 0 && f.width >= 1 && f.height >= 1))
  }

  test("decodeMedia decodes REAL dimensions for image payloads, stub for the rest") {
    val png = ImageCodec.synthPng(3, 77, 41)
    val real = Multimodal.decodeMedia(Multimodal.MediaDoc(1L, "image/png", png))
    assert((real.width, real.height) === (77, 41))
    assert(real.feature >= 0.0 && real.feature <= 1.0) // normalized mean luminance
    val jpg = ImageCodec.jpegReencode(png, 80)
    val realJpg = Multimodal.decodeMedia(Multimodal.MediaDoc(2L, "image/jpeg", jpg))
    assert((realJpg.width, realJpg.height) === (77, 41))
    // a REAL PDF decodes for real: media box points + raster luminance
    val realPdf = graft.functions.PdfExprs.synthPdf(9L, 2, 120.0, 160.0)
    val pdfFeat = Multimodal.decodeMedia(Multimodal.MediaDoc(4L, "application/pdf", realPdf))
    assert((pdfFeat.width, pdfFeat.height) === (120, 160))
    assert(pdfFeat.feature > 0.0 && pdfFeat.feature <= 1.0)
    // AVI video decodes for real: container geometry + mean frame luma
    val avi = AviCodec.synthAvi(11L, 3, 24, 10)
    val aviFeat = Multimodal.decodeMedia(Multimodal.MediaDoc(5L, "video/x-msvideo", avi))
    assert((aviFeat.width, aviFeat.height) === (24, 10))
    val expectLuma = AviCodec.frameLumas(avi)
    assert(aviFeat.feature === expectLuma.sum.toDouble / (255.0 * expectLuma.length))
    // a CORRUPT pdf and codec-less payloads keep the deterministic stub
    val pdf = Multimodal.MediaDoc(3L, "application/pdf", "%PDF-1.4 x".getBytes)
    assert(Multimodal.decodeMedia(pdf) === Multimodal.decodeStub(pdf))
  }

  test("scanEffect routes image payloads to the real codec and PDFs to the stub") {
    val png = ImageCodec.synthPng(5, 30, 20)
    val df = Seq((1L, png), (2L, "%PDF-1.4 fake".getBytes)).toDF("doc_id", "content")
      .select($"doc_id", Multimodal.scanEffect($"content", $"doc_id").as("out"))
    val rows = df.collect().sortBy(_.getLong(0))
    val img = rows(0).getAs[Array[Byte]]("out")
    assert(ImageCodec.isJpeg(img)) // real scanner output
    assert(rows(1).getAs[Array[Byte]]("out").length === 16) // md5 stub for PDFs
  }

  test("FilesPayload: corrupt, null and files-less payloads yield empty lists, not errors") {
    val df = Seq(
      (1L, """{"files":[{"assetId":5,"name":"a.pdf","createdAt":9}]}"""),
      (2L, "{corrupt"),
      (3L, null.asInstanceOf[String]),
      (4L, """{"other":1}"""),
      (5L, """{"files":[]}""")).toDF("doc_id", "value")
    val out = FilesPayload.explodeFiles(df, "value")
      .select("doc_id", "asset_id", "file_name", "created_at")
      .as[(Long, Long, String, Long)].collect()
    assert(out.toSeq === Seq((1L, 5L, "a.pdf", 9L)))
  }
}
