package graft.queries

import graft.Tables
import graft.operators.{Picks, Structure}
import graft.sources.{FilesPayload, Multimodal, UrlFetch}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-2 domain queries: the real F9 files[]-payload path, the
  * binary/multimodal metadata surface, the F7 structure generator with
  * its K5/J4 upload-plan flatten, and the S9 drive-folder listing.
  * Every query has a DuckDB oracle built from the same constants.
  */
object DomainQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- F9 files payload
  /** JSON payload fixture over documents: ~1/7 corrupt, ~1/11 null,
    * ~1/13 valid-but-no-files, rest one or two file entries.
    */
  private def payloadCol = {
    val d = col("doc_id")
    when(d % 7 === 0, lit("{corrupt"))
      .when(d % 11 === 0, lit(null).cast("string"))
      .when(d % 13 === 0, lit("""{"other":1}"""))
      .otherwise(concat(
        lit("""{"files":[{"assetId":"""), d * 10 + 1,
        lit(""","name":""""), col("source"), lit("""_a.pdf","createdAt":"""), d * 1000,
        lit("}"),
        when(d % 2 === 0,
          concat(lit(""",{"assetId":"""), d * 10 + 2,
            lit(""","name":""""), col("source"), lit("""_b.jpg","createdAt":"""), d * 1000 + 1,
            lit("}"))).otherwise(lit("")),
        lit("]}")))
  }

  val filesPayload: Q = (s, d) => {
    val df = Tables.documents(s, d).select(col("doc_id"), payloadCol.as("value"))
    FilesPayload.explodeFiles(df, "value")
      .select("doc_id", "asset_id", "file_name", "created_at")
  }
  val filesPayloadSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN '{corrupt'
      |         WHEN doc_id % 11 = 0 THEN NULL
      |         WHEN doc_id % 13 = 0 THEN '{"other":1}'
      |         ELSE '{"files":[{"assetId":' || (doc_id*10+1) || ',"name":"' || source || '_a.pdf","createdAt":' || doc_id*1000 || '}'
      |              || CASE WHEN doc_id % 2 = 0
      |                 THEN ',{"assetId":' || (doc_id*10+2) || ',"name":"' || source || '_b.jpg","createdAt":' || (doc_id*1000+1) || '}'
      |                 ELSE '' END
      |              || ']}'
      |    END AS value
      |  FROM documents),
      |v AS (SELECT doc_id, value FROM p
      |      WHERE value IS NOT NULL AND json_valid(value)
      |        AND json_extract(value, '$.files') IS NOT NULL),
      |e AS (SELECT doc_id, unnest(CAST(json_extract(value, '$.files') AS JSON[])) AS f FROM v)
      |SELECT doc_id,
      |       CAST(json_extract_string(f, '$.assetId') AS BIGINT) AS asset_id,
      |       json_extract_string(f, '$.name') AS file_name,
      |       CAST(json_extract_string(f, '$.createdAt') AS BIGINT) AS created_at
      |FROM e""".stripMargin

  // ---------------------------------------------------------------- S7/B binary meta
  val binaryMeta: Q = (s, d) => {
    val withBin = Multimodal.withBinaryContent(Tables.documents(s, d), "text")
    Multimodal.binaryMeta(withBin, "content")
      .withColumn("effect_hex", hex(Multimodal.scanEffectStub(col("content"), ":42")))
      .select("doc_id", "byte_len", "content_md5", "effect_hex")
  }
  val binaryMetaSql: String =
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |       md5(text) AS content_md5,
      |       upper(md5(hex(encode(text)) || ':42')) AS effect_hex
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- B6 frame chunking
  private val FrameSize = 64

  /** B6/B7 page-loop analog: binary content exploded to fixed-size
    * frames at (doc, frame) grain — pure per-row map work, no shuffle.
    * The oracle slices the VARCHAR: documents text is pure ASCII (both
    * SFs verified), so char slicing equals byte slicing of the UTF-8
    * payload and the md5s agree byte-for-byte.
    */
  val frames: Q = (s, d) => {
    val withBin = Multimodal.withBinaryContent(Tables.documents(s, d), "text")
    Multimodal.explodeFrames(withBin, "content", FrameSize)
      .select(col("doc_id"), col("frame_idx"),
        md5(col("frame")).as("frame_md5"),
        length(col("frame")).cast("long").as("frame_len"))
  }
  val framesSql: String =
    s"""WITH fr AS (
       |  SELECT doc_id, gs.i AS frame_idx,
       |         substring(text, CAST(gs.i*$FrameSize+1 AS BIGINT), $FrameSize) AS frame
       |  FROM documents,
       |       LATERAL (SELECT unnest(generate_series(0,
       |         CAST(ceil(length(text)/$FrameSize.0) AS BIGINT)-1)) AS i) gs)
       |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, md5(frame) AS frame_md5,
       |       CAST(length(frame) AS BIGINT) AS frame_len
       |FROM fr""".stripMargin

  /** B decode plumbing through the driver gate: the typed mapPartitions
    * decode (stubbed decoder, one instance per partition). The stub's
    * polynomial byte-fold IS oracle-checkable: documents text is pure
    * ASCII at every SF (byte == char), so the DuckDB twin folds
    * `ascii(substr(text,i,1))` in HUGEINT mod-2^64 arithmetic,
    * reproducing Java's wrapping long multiply-add, truncated division
    * and `math.abs` (including the abs(Long.MinValue) < 0 edge) bit for
    * bit.
    */
  val decodeFeatures: Q = (s, d) => {
    import s.implicits._
    val withBin = Multimodal.withBinaryContent(Tables.documents(s, d), "text")
    val docs = withBin
      .select(col("doc_id"), lit("text/plain").as("mime"), col("content"))
      .as[Multimodal.MediaDoc]
    Multimodal.decodeFeatures(s, docs).toDF()
  }
  val decodeFeaturesSql: String =
    """WITH h AS (
      |  SELECT doc_id, text,
      |    list_reduce(
      |      list_prepend(1125899906842597::HUGEINT,
      |        list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1))::HUGEINT)),
      |      (acc, b) -> (acc * 31 + b) % 18446744073709551616::HUGEINT) AS hu
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, text,
      |    CASE WHEN hu >= 9223372036854775808::HUGEINT
      |         THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS hs
      |  FROM h),
      |a AS (
      |  SELECT doc_id, text,
      |    CASE WHEN hs = -9223372036854775808::HUGEINT THEN hs ELSE abs(hs) END AS habs,
      |    abs(hs // 1920::HUGEINT) AS hdivabs
      |  FROM s)
      |SELECT doc_id, 'text/plain' AS mime, CAST(length(text) AS INTEGER) AS n_bytes,
      |       CAST(habs % 1920 + 1 AS INTEGER) AS width,
      |       CAST(hdivabs % 1080 + 1 AS INTEGER) AS height,
      |       CAST(habs % 100000 AS DOUBLE) / 100000.0 AS feature
      |FROM a""".stripMargin

  // ---------------------------------------------------------------- B4/B5/B6 real image codec
  /** The REAL image scan pipeline through the oracle gate: per doc,
    * synthesize a PNG whose dimensions are a SQL-computable function of
    * doc_id, run actual pixel scan effects (`add_scan_effects_minimal`,
    * balanced preset) plus the per-page JPEG re-encode (`app.py:268`),
    * then RE-DECODE the output and report its true dimensions/format.
    * DuckDB recomputes the expected dims from doc_id alone — so a
    * failure anywhere in decode → effects → encode → re-encode →
    * decode surfaces as a dim/format mismatch, not a vacuous pass.
    * Byte-level determinism and effect direction are spec-tested
    * (ImageCodecSpec); this gate proves the geometry contract
    * end-to-end on every document row.
    */
  val scanEffectsQ: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      // codec work is CPU-bound per row, not IO-bound: a small parquet
      // file arrives as ~1 input split, which would serialize the whole
      // pipeline on one core — and AQE would coalesce an unsized
      // repartition of a few MB right back to 1. Pin to the core count.
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("img", graft.functions.ImageOps.synthImage(col("doc_id"),
        (lit(40) + col("doc_id") % 17).cast("int"), (lit(30) + col("doc_id") % 13).cast("int")))
      .withColumn("scanned", graft.functions.ImageOps.scanMinimal(col("img"), "balanced"))
      .withColumn("page_jpeg", graft.functions.ImageOps.jpegReencode(col("scanned"), 85))
      .withColumn("info", graft.functions.ImageOps.imageInfo(col("page_jpeg")))
      .select(col("doc_id"),
        col("info.width").as("out_w"), col("info.height").as("out_h"),
        col("info.format").as("out_format"))
  val scanEffectsSql: String =
    """SELECT doc_id,
      |       CAST(40 + doc_id % 17 AS INTEGER) AS out_w,
      |       CAST(30 + doc_id % 13 AS INTEGER) AS out_h,
      |       'JPEG' AS out_format
      |FROM documents""".stripMargin

  /** B1's compress image path on real pixels: synth page render →
    * dpi-preset bilinear resize (balanced = 150 dpi ⇒ dims scale by
    * 150/72 in floor integer math the oracle recomputes) → sharpen →
    * contrast → JPEG → re-decode and report true output dims.
    */
  val compressQ: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id")) // CPU-bound codec
      .withColumn("img", graft.functions.ImageOps.synthImage(col("doc_id") * 17,
        (lit(30) + col("doc_id") % 9).cast("int"), (lit(24) + col("doc_id") % 5).cast("int")))
      .withColumn("out", graft.functions.ImageOps.compressImage(col("img"), "balanced"))
      .withColumn("info", graft.functions.ImageOps.imageInfo(col("out")))
      .select(col("doc_id"),
        col("info.width").as("out_w"), col("info.height").as("out_h"),
        col("info.format").as("out_format"))
  val compressSql: String =
    """SELECT doc_id,
      |       CAST(greatest(1, (30 + doc_id % 9) * 150 // 72) AS INTEGER) AS out_w,
      |       CAST(greatest(1, (24 + doc_id % 5) * 150 // 72) AS INTEGER) AS out_h,
      |       'JPEG' AS out_format
      |FROM documents""".stripMargin

  /** The seeded randomized variant (`add_scan_effects`, SURVEY §2.10's
    * explicit-seed contract): rotation is expand=False so output dims
    * must still equal the synthesized input dims — which the oracle
    * recomputes from doc_id. Seed = doc_id, so every row exercises a
    * different draw sequence.
    */
  val scanSeededQ: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      // CPU-bound codec: partition for cores, not bytes (pinned — see q_scan_effects)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("img", graft.functions.ImageOps.synthImage(col("doc_id") * 31,
        (lit(36) + col("doc_id") % 11).cast("int"), (lit(28) + col("doc_id") % 7).cast("int")))
      .withColumn("scanned",
        graft.functions.ImageOps.scanSeeded(col("img"), col("doc_id"), "realistic"))
      .withColumn("info", graft.functions.ImageOps.imageInfo(col("scanned")))
      .select(col("doc_id"),
        col("info.width").as("out_w"), col("info.height").as("out_h"),
        col("info.format").as("out_format"))
  val scanSeededSql: String =
    """SELECT doc_id,
      |       CAST(36 + doc_id % 11 AS INTEGER) AS out_w,
      |       CAST(28 + doc_id % 7 AS INTEGER) AS out_h,
      |       'JPEG' AS out_format
      |FROM documents""".stripMargin

  /** §3.2 end-to-end: the scan endpoint over the documents table with
    * the REAL image codec in the middle (see
    * [[graft.pipelines.ScanPipeline]]). Gated projection: every column
    * is closed-form in doc_id — the PDF-whitelist row set, the parsed
    * page count, the parse-BACK page count of the rebuilt document
    * (compose → pdf_info round trip on the hash gate, the
    * q_pdf_roundtrip pattern) and the " SCANNE" upload rename. The
    * byte-level halves (out_len, out_md5 of the rebuilt PDF) stay
    * pinned in ScanPipelineSpec.
    */
  val scanPipelineQ: Q = (s, d) =>
    graft.pipelines.ScanPipeline.scanPlan(Tables.documents(s, d))
      .select("doc_id", "column_id", "file_name", "upload_name", "n_pages", "out_pages")
  val scanPipelineSql: String =
    s"""SELECT doc_id, column_id,
       |       'doc_' || doc_id || '.pdf' AS file_name,
       |       'doc_' || doc_id || ' SCANNE.pdf' AS upload_name,
       |       CAST(doc_id % 3 + 1 AS INTEGER) AS n_pages,
       |       CAST(doc_id % 3 + 1 AS INTEGER) AS out_pages
       |FROM documents
       |CROSS JOIN (SELECT unnest(${graft.pipelines.ScanPipeline.ScanColumns
                      .map("'" + _ + "'").mkString("[", ", ", "]")}) AS column_id)
       |WHERE doc_id % 7 != 0""".stripMargin

  /** §3.1 end-to-end: compress → stamp → sign → verify → rename over
    * the documents table with an ephemeral keytool credential. Gated
    * projection: the key is random per run so SIGNATURE BYTES are not
    * cross-engine reproducible, but the crypto round trip still is —
    * `verified` (the in-query embedded-signature verification) must be
    * true on every row, the extracted signature must be exactly the
    * RSA-2048 modulus width, and the " SIGNÉ" rename is closed-form.
    * Byte-level md5s stay pinned in SignPipelineSpec.
    */
  val signPipelineQ: Q = (s, d) =>
    graft.pipelines.SignPipeline.signPlanVerified(
      Tables.documents(s, d),
      graft.pipelines.SignPipeline.ephemeralPkcs12("Graft Query Signer"), "changeit")
      .select("doc_id", "upload_name", "sig_bytes", "verified")
  val signPipelineSql: String =
    """SELECT doc_id,
      |       'doc_' || doc_id || ' SIGNÉ.pdf' AS upload_name,
      |       CAST(256 AS BIGINT) AS sig_bytes,
      |       true AS verified
      |FROM documents""".stripMargin

  /** The PDF container codec through the DuckDB oracle gate: a real
    * compose → parse round trip per document whose parse metadata
    * (page count, media box in integer-scaled points, image count) is
    * a closed-form function of doc_id — if the writer or parser drifts
    * anywhere (page tree walk, MediaBox, xref, Flate content streams),
    * the hash gate catches it on every row. The byte-level halves
    * (rasterized pixels, signed bytes) are pinned by PdfCodecSpec /
    * SignOpsSpec; this query gates the metadata contract at corpus
    * grain.
    */
  val pdfRoundtrip: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      // CPU-bound codec: partition for cores, not bytes (see q_scan_effects)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("pdf", graft.functions.PdfOps.synthPdf(col("doc_id") * 17,
        (col("doc_id") % 3 + 1).cast("int"), lit(120.0), lit(160.0)))
      .withColumn("info", graft.functions.PdfOps.pdfInfo(col("pdf")))
      .select(col("doc_id"),
        col("info.n_pages").as("n_pages"),
        col("info.w_pt_x100").as("w_pt_x100"),
        col("info.h_pt_x100").as("h_pt_x100"),
        col("info.n_images").as("n_images"))
  val pdfRoundtripSql: String =
    """SELECT doc_id,
      |       CAST(doc_id % 3 + 1 AS BIGINT) AS n_pages,
      |       CAST(12000 AS BIGINT) AS w_pt_x100,
      |       CAST(16000 AS BIGINT) AS h_pt_x100,
      |       CAST(doc_id % 3 + 1 AS BIGINT) AS n_images
      |FROM documents""".stripMargin

  /** The Flate+PNG-predictor read path under the hash gate: each
    * document embeds a predictor-encoded image (row filter tag cycles
    * None/Sub/Up/Average/Paeth) whose EXACT rasterized pixel sum the
    * oracle recomputes in closed form — one wrong byte anywhere in
    * inflate → unpredict → image decode → blit flips the sum on that
    * row. dpi-72 rasterization is 1:1 with the MediaBox, so no
    * resampling sits between the decoder and the digest.
    */
  val pdfPredictor: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      // CPU-bound codec: partition for cores, not bytes (see q_scan_effects)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("pdf", graft.functions.PdfOps.synthPdfPred(col("doc_id") * 23,
        (col("doc_id") % 8 + 12).cast("int"), (col("doc_id") % 5 + 10).cast("int")))
      .withColumn("info", graft.functions.PdfOps.pdfInfo(col("pdf")))
      .select(col("doc_id"),
        col("info.n_pages").as("n_pages"),
        col("info.w_pt_x100").as("w_pt_x100"),
        col("info.n_images").as("n_images"),
        graft.functions.ImageOps.imagePixelSum(
          graft.functions.PdfOps.pdfRasterize(col("pdf"), lit(0), lit(72))).as("px_sum"))
  val pdfPredictorSql: String =
    """WITH px AS (
      |  SELECT doc_id, sum((x*7 + y*13 + c*29 + doc_id*23) % 256) AS s
      |  FROM documents, range(0, 20) tx(x), range(0, 15) ty(y), range(0, 3) tc(c)
      |  WHERE x < doc_id % 8 + 12 AND y < doc_id % 5 + 10
      |  GROUP BY doc_id)
      |SELECT d.doc_id,
      |       CAST(1 AS BIGINT) AS n_pages,
      |       CAST((d.doc_id % 8 + 12) * 100 AS BIGINT) AS w_pt_x100,
      |       CAST(1 AS BIGINT) AS n_images,
      |       CAST(px.s AS BIGINT) AS px_sum
      |FROM documents d JOIN px USING (doc_id)""".stripMargin

  /** The ENCRYPTED-document read path under the hash gate: each
    * document is the predictor fixture wrapped in standard-security-
    * handler encryption, the variant cycling RC4-40 / RC4-128 /
    * AES-128 (/AESV2) / AES-256 (/AESV3) by doc_id. The oracle
    * recomputes the EXACT rasterized pixel sum in closed form — a
    * wrong key byte, a mis-stripped AES pad, or a predictor slip after
    * decrypt flips the sum on that row; a handler that fails to verify
    * the empty user password nulls the whole row. This is the
    * reference's `fitz.open`-on-protected-uploads capability
    * (`app.py:241`) under a byte-exact gate.
    */
  val pdfEncrypted: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      // CPU-bound codec: partition for cores, not bytes (see q_scan_effects)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("pdf", graft.functions.PdfOps.synthPdfEnc(col("doc_id") * 37,
        (col("doc_id") % 8 + 12).cast("int"), (col("doc_id") % 5 + 10).cast("int"),
        (col("doc_id") % 4).cast("int")))
      .withColumn("info", graft.functions.PdfOps.pdfInfo(col("pdf")))
      .select(col("doc_id"),
        element_at(lit(graft.sources.PdfCrypt.VariantNames.toArray),
          (col("doc_id") % 4).cast("int") + 1).as("handler"),
        col("info.n_pages").as("n_pages"),
        col("info.w_pt_x100").as("w_pt_x100"),
        graft.functions.ImageOps.imagePixelSum(
          graft.functions.PdfOps.pdfRasterize(col("pdf"), lit(0), lit(72))).as("px_sum"))
  val pdfEncryptedSql: String =
    """WITH px AS (
      |  SELECT doc_id, sum((x*7 + y*13 + c*29 + doc_id*37) % 256) AS s
      |  FROM documents, range(0, 20) tx(x), range(0, 15) ty(y), range(0, 3) tc(c)
      |  WHERE x < doc_id % 8 + 12 AND y < doc_id % 5 + 10
      |  GROUP BY doc_id)
      |SELECT d.doc_id,
      |       CASE d.doc_id % 4 WHEN 0 THEN 'rc4-40' WHEN 1 THEN 'rc4-128'
      |            WHEN 2 THEN 'aes-128' ELSE 'aes-256' END AS handler,
      |       CAST(1 AS BIGINT) AS n_pages,
      |       CAST((d.doc_id % 8 + 12) * 100 AS BIGINT) AS w_pt_x100,
      |       CAST(px.s AS BIGINT) AS px_sum
      |FROM documents d JOIN px USING (doc_id)""".stripMargin

  /** The LZW / RunLength / sub-8-bit read paths under the hash gate:
    * each document carries a 4-bit-gray LZW image behind a sub-byte
    * PNG predictor AND a 1-bit-gray RunLength image (the fax-scan
    * shape), and the oracle recomputes the EXACT combined pixel sum in
    * closed form — a wrong LZW code width, a mis-timed early-change, a
    * RunLength length slip, a bit-unpack error or a predictor-stride
    * bug flips the sum on that row.
    */
  val pdfFilters: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("pdf", graft.functions.PdfOps.synthPdfFilters(col("doc_id") * 43,
        (col("doc_id") % 8 + 12).cast("int"), (col("doc_id") % 5 + 10).cast("int")))
      .withColumn("info", graft.functions.PdfOps.pdfInfo(col("pdf")))
      .select(col("doc_id"),
        col("info.n_pages").as("n_pages"),
        col("info.w_pt_x100").as("w_pt_x100"),
        col("info.n_images").as("n_images"),
        graft.functions.ImageOps.imagePixelSum(
          graft.functions.PdfOps.pdfRasterize(col("pdf"), lit(0), lit(72))).as("px_sum"))
  val pdfFiltersSql: String =
    """WITH px AS (
      |  SELECT doc_id,
      |         sum(51 * ((x*3 + y*5 + doc_id*43) % 16)
      |             + 765 * ((x + y + doc_id*43) % 2)) AS s
      |  FROM documents, range(0, 20) tx(x), range(0, 15) ty(y)
      |  WHERE x < doc_id % 8 + 12 AND y < doc_id % 5 + 10
      |  GROUP BY doc_id)
      |SELECT d.doc_id,
      |       CAST(1 AS BIGINT) AS n_pages,
      |       CAST((d.doc_id % 8 + 12) * 200 AS BIGINT) AS w_pt_x100,
      |       CAST(2 AS BIGINT) AS n_images,
      |       CAST(px.s AS BIGINT) AS px_sum
      |FROM documents d JOIN px USING (doc_id)""".stripMargin

  /** The CCITT G4 (fax/MMR) read path under the hash gate — the image
    * codec scanned-document corpora actually carry. Each document is a
    * shifting-stripe 1-bit G4 image (stripe width seed-derived, every
    * 11th row all-white so the ≥64 makeup codes fire), and the oracle
    * recomputes the EXACT rasterized pixel sum: a wrong T.4 table
    * entry, a mis-chosen coding mode, or a reference-line slip flips
    * the sum on that row.
    */
  val pdfCcitt: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("pdf", graft.functions.PdfOps.synthPdfCcitt(col("doc_id") * 47,
        (col("doc_id") % 32 + 64).cast("int"), (col("doc_id") % 6 + 10).cast("int")))
      .withColumn("info", graft.functions.PdfOps.pdfInfo(col("pdf")))
      .select(col("doc_id"),
        col("info.n_pages").as("n_pages"),
        col("info.w_pt_x100").as("w_pt_x100"),
        graft.functions.ImageOps.imagePixelSum(
          graft.functions.PdfOps.pdfRasterize(col("pdf"), lit(0), lit(72))).as("px_sum"))
  val pdfCcittSql: String =
    """WITH px AS (
      |  SELECT doc_id,
      |         sum(CASE WHEN y % 11 = 0
      |                    OR (x // ((doc_id * 47) % 7 + 3) + y) % 2 = 1
      |                  THEN 765 ELSE 0 END) AS s
      |  FROM documents, range(0, 96) tx(x), range(0, 16) ty(y)
      |  WHERE x < doc_id % 32 + 64 AND y < doc_id % 6 + 10
      |  GROUP BY doc_id)
      |SELECT d.doc_id,
      |       CAST(1 AS BIGINT) AS n_pages,
      |       CAST((d.doc_id % 32 + 64) * 100 AS BIGINT) AS w_pt_x100,
      |       CAST(px.s AS BIGINT) AS px_sum
      |FROM documents d JOIN px USING (doc_id)""".stripMargin

  /** TIFF container metadata under the hash gate — the IFD/tag walk
    * over REAL multi-strip files from the codec's own writer, cycling
    * all four non-fax compressions (none / LZW+predictor-2 / PackBits
    * / Deflate+predictor-2) and BOTH byte orders (seed parity flips
    * II/MM). Every surfaced field is a closed-form function of
    * doc_id, so a mis-read tag type, a wrong inline/offset decision,
    * or an endian slip flips a row.
    */
  val tiffMeta: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("tiff", graft.functions.TiffOps.synthTiff(col("doc_id") * 53,
        (col("doc_id") % 9 + 11).cast("int"), (col("doc_id") % 7 + 9).cast("int"),
        pmod(col("doc_id"), lit(4)).cast("int")))
      .withColumn("info", graft.functions.TiffOps.tiffInfo(col("tiff")))
      .select(col("doc_id"),
        col("info.width").as("width"),
        col("info.height").as("height"),
        col("info.bits").as("bits"),
        col("info.compression").as("compression"),
        col("info.n_strips").as("n_strips"),
        col("info.rows_per_strip").as("rows_per_strip"),
        col("info.predictor").as("predictor"))
  val tiffMetaSql: String =
    """SELECT doc_id,
      |       CAST(doc_id % 9 + 11 AS BIGINT) AS width,
      |       CAST(doc_id % 7 + 9 AS BIGINT) AS height,
      |       CAST(8 AS BIGINT) AS bits,
      |       CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 5
      |            WHEN 2 THEN 32773 ELSE 8 END AS BIGINT) AS compression,
      |       CAST((doc_id % 7 + 9 + 4) // 5 AS BIGINT) AS n_strips,
      |       CAST(5 AS BIGINT) AS rows_per_strip,
      |       CAST(CASE WHEN doc_id % 4 IN (1, 3) THEN 2 ELSE 1 END AS BIGINT)
      |         AS predictor
      |FROM documents""".stripMargin

  /** TIFF strip DECODE under the hash gate: each document carries a
    * gray-8 multi-strip image (compression cycling through the
    * four baseline codecs) AND a bilevel CCITT G4 fax image
    * (photometric 0, 7-row strips with per-strip reference-line
    * reset), and the oracle recomputes BOTH exact pixel sums in
    * closed form. A wrong LZW code width, a PackBits length slip, a
    * horizontal-differencing stride bug, a strip-boundary off-by-one
    * or a G4 polarity error flips a sum on that row.
    */
  val tiffDecode: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("tiff", graft.functions.TiffOps.synthTiff(col("doc_id") * 53,
        (col("doc_id") % 9 + 11).cast("int"), (col("doc_id") % 7 + 9).cast("int"),
        pmod(col("doc_id"), lit(4)).cast("int")))
      .withColumn("fax", graft.functions.TiffOps.synthTiffG4(col("doc_id") * 59,
        (col("doc_id") % 24 + 40).cast("int"), (col("doc_id") % 9 + 12).cast("int")))
      .withColumn("pal", graft.functions.TiffOps.synthTiffPalette(col("doc_id") * 83,
        (col("doc_id") % 13 + 9).cast("int"), (col("doc_id") % 5 + 7).cast("int")))
      .select(col("doc_id"),
        graft.functions.ImageOps.imagePixelSum(
          graft.functions.TiffOps.tiffDecode(col("tiff"))).as("px_gray"),
        graft.functions.ImageOps.imagePixelSum(
          graft.functions.TiffOps.tiffDecode(col("fax"))).as("px_fax"),
        graft.functions.ImageOps.imagePixelSum(
          graft.functions.TiffOps.tiffDecode(col("pal"))).as("px_palette"))
  /** Multi-page TIFF at PAGE grain: every chained IFD of a document
    * mixing all four strip codecs across its pages decodes to an
    * exact per-page pixel sum — the IFD-chain walk, per-page strip
    * assembly, and cross-page codec routing under one hash gate
    * (page k uses compression (seed+k) % 4, so each document
    * exercises none/LZW/PackBits/Deflate in one file).
    */
  val tiffPages: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("tiff", graft.functions.TiffOps.synthTiffMulti(col("doc_id") * 61,
        (col("doc_id") % 9 + 11).cast("int"), (col("doc_id") % 7 + 9).cast("int"),
        (col("doc_id") % 3 + 2).cast("int")))
      .select(col("doc_id"),
        graft.functions.TiffOps.tiffInfo(col("tiff")).getField("n_ifds").as("n_pages"),
        posexplode(graft.functions.TiffOps.tiffPageSums(col("tiff"))).as(Seq("page", "px_sum")))
  val tiffPagesSql: String =
    """SELECT d.doc_id,
      |       CAST(d.doc_id % 3 + 2 AS BIGINT) AS n_pages,
      |       CAST(pg.page AS INTEGER) AS page,
      |       CAST(sum(3 * ((x*3 + y*7 + d.doc_id*61 + pg.page) % 256)) AS BIGINT) AS px_sum
      |FROM documents d, range(0, 4) pg(page), range(0, 20) tx(x), range(0, 16) ty(y)
      |WHERE pg.page < d.doc_id % 3 + 2
      |  AND x < d.doc_id % 9 + 11 AND y < d.doc_id % 7 + 9
      |GROUP BY 1, 2, 3""".stripMargin

  /** Tiled TIFF + JPEG-in-TIFF under the hash gate — the dominant
    * GeoTIFF/modern-scanner layouts that were documented-absent in
    * round 12. Per doc: (a) a TILED gray-8 image (16×16 grid, edge
    * tiles clipped, compression cycling the four baseline codecs) with
    * an EXACT pixel-sum oracle — same closed form as the strip fixture
    * because the pixel formula is global-coordinate; (b) a
    * JPEG-compressed TIFF cycling all four JPEG layouts (new-style
    * strips, strips + shared JPEGTables, 16×16 JPEG tiles, old-style
    * JPEGInterchangeFormat) — flat-region fixtures decoded through
    * ImageIO, gated on exact geometry plus a ≤4/255 max-deviation
    * boolean (JPEG DC quantization is not SQL-reproducible; the bound
    * is pinned tighter in TiffCodecSpec).
    */
  val tiffTiles: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("tiled", graft.functions.TiffOps.synthTiffTiled(col("doc_id") * 67,
        (col("doc_id") % 21 + 20).cast("int"), (col("doc_id") % 13 + 18).cast("int"),
        pmod(col("doc_id"), lit(4)).cast("int")))
      .withColumn("jpeg", graft.functions.TiffOps.synthTiffJpeg(col("doc_id") * 71,
        (col("doc_id") % 17 + 24).cast("int"), (col("doc_id") % 11 + 16).cast("int"),
        pmod(col("doc_id"), lit(4)).cast("int")))
      .withColumn("ti", graft.functions.TiffOps.tiffInfo(col("tiled")))
      .withColumn("ji", graft.functions.TiffOps.tiffInfo(col("jpeg")))
      .select(col("doc_id"),
        graft.functions.ImageOps.imagePixelSum(
          graft.functions.TiffOps.tiffDecode(col("tiled"))).as("px_tiled"),
        col("ti.n_strips").as("n_tiles"),
        col("ti.tile_width").as("tile_w"),
        col("ti.tile_length").as("tile_h"),
        col("ji.width").as("jpg_w"),
        col("ji.height").as("jpg_h"),
        col("ji.compression").as("jpg_comp"),
        (graft.functions.TiffOps.tiffJpegErr(col("jpeg"),
          pmod(col("doc_id"), lit(4)).cast("int"), col("doc_id") * 71) <= 4).as("jpg_ok"))
  val tiffTilesSql: String =
    """WITH t AS (
      |  SELECT doc_id, sum(3 * ((x*3 + y*7 + doc_id*67) % 256)) AS s
      |  FROM documents, range(0, 40) tx(x), range(0, 31) ty(y)
      |  WHERE x < doc_id % 21 + 20 AND y < doc_id % 13 + 18
      |  GROUP BY doc_id)
      |SELECT d.doc_id, CAST(t.s AS BIGINT) AS px_tiled,
      |       CAST(((d.doc_id % 21 + 20 + 15) // 16) * ((d.doc_id % 13 + 18 + 15) // 16) AS BIGINT) AS n_tiles,
      |       CAST(16 AS BIGINT) AS tile_w,
      |       CAST(16 AS BIGINT) AS tile_h,
      |       CAST(d.doc_id % 17 + 24 AS BIGINT) AS jpg_w,
      |       CAST(d.doc_id % 11 + 16 AS BIGINT) AS jpg_h,
      |       CAST(CASE WHEN d.doc_id % 4 = 3 THEN 6 ELSE 7 END AS BIGINT) AS jpg_comp,
      |       true AS jpg_ok
      |FROM documents d JOIN t USING (doc_id)""".stripMargin

  val tiffDecodeSql: String =
    """WITH g AS (
      |  SELECT doc_id, sum(3 * ((x*3 + y*7 + doc_id*53) % 256)) AS s
      |  FROM documents, range(0, 20) tx(x), range(0, 16) ty(y)
      |  WHERE x < doc_id % 9 + 11 AND y < doc_id % 7 + 9
      |  GROUP BY doc_id),
      |f AS (
      |  SELECT doc_id,
      |         sum(CASE WHEN y % 11 = 0
      |                    OR (x // ((doc_id * 59) % 7 + 3) + y) % 2 = 1
      |                  THEN 765 ELSE 0 END) AS s
      |  FROM documents, range(0, 64) tx(x), range(0, 21) ty(y)
      |  WHERE x < doc_id % 24 + 40 AND y < doc_id % 9 + 12
      |  GROUP BY doc_id),
      |p AS (
      |  SELECT doc_id,
      |         sum(((x*3 + y*7 + doc_id*83) % 256 * 3 + 7) % 256
      |           + ((x*3 + y*7 + doc_id*83) % 256 * 5 + 11) % 256
      |           + ((x*3 + y*7 + doc_id*83) % 256 * 7 + 13) % 256) AS s
      |  FROM documents, range(0, 22) tx(x), range(0, 12) ty(y)
      |  WHERE x < doc_id % 13 + 9 AND y < doc_id % 5 + 7
      |  GROUP BY doc_id)
      |SELECT d.doc_id, CAST(g.s AS BIGINT) AS px_gray, CAST(f.s AS BIGINT) AS px_fax,
      |       CAST(p.s AS BIGINT) AS px_palette
      |FROM documents d JOIN g USING (doc_id) JOIN f USING (doc_id) JOIN p USING (doc_id)""".stripMargin

  /** PDF TEXT extraction under the hash gate — the pdf→text capability
    * an LLM-corpus pipeline runs on every document shard. Each doc is
    * a Helvetica/WinAnsi text fixture whose content streams exercise
    * literal-string escapes, octal high bytes (é as \351), TJ kern
    * spacing (space from a -250 gap, NOT from a -30 letter-kern), TD
    * line motion and T*; the oracle rebuilds every page's exact text
    * from doc_id. A slip anywhere — tokenizer, escape decode, WinAnsi
    * mapping, kern threshold, line-break placement — flips a string.
    */
  val pdfText: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("pdf", graft.functions.PdfOps.synthPdfText(col("doc_id") * 41,
        (col("doc_id") % 3 + 1).cast("int")))
      .withColumn("txt", graft.functions.PdfOps.pdfText(col("pdf")))
      .withColumn("meta", graft.functions.PdfOps.pdfMeta(col("pdf")))
      .select(col("doc_id"),
        size(col("txt")).cast("long").as("n_pages"),
        element_at(col("txt"), 1).as("page1"),
        element_at(col("txt"), size(col("txt"))).as("page_last"),
        aggregate(transform(col("txt"), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_chars"),
        col("meta.title").as("title"),
        col("meta.author").as("author"),
        col("meta.producer").as("producer"),
        col("meta.creation_date").as("creation_date"),
        col("meta.subject").as("subject"))
  val pdfTextSql: String =
    """WITH t AS (
      |  SELECT d.doc_id, p.p,
      |         'Doc ' || (d.doc_id * 41) || ' page ' || p.p ||
      |           ' line one (escaped)' || chr(10) ||
      |           'kerned words here' || chr(10) || 'café three' AS page_text
      |  FROM documents d, generate_series(0, 2) p(p)
      |  WHERE p.p <= d.doc_id % 3)
      |SELECT doc_id,
      |       CAST(doc_id % 3 + 1 AS BIGINT) AS n_pages,
      |       min(CASE WHEN p = 0 THEN page_text END) AS page1,
      |       min(CASE WHEN p = doc_id % 3 THEN page_text END) AS page_last,
      |       CAST(sum(length(page_text)) AS BIGINT) AS n_chars,
      |       'Doc ' || (doc_id * 41) || ' — fixture' AS title,
      |       'Graft Pipeline' AS author,
      |       'graft-pdf ' || (doc_id * 41) % 10 AS producer,
      |       'D:20260101000000Z' AS creation_date,
      |       CAST(NULL AS VARCHAR) AS subject
      |FROM t GROUP BY doc_id""".stripMargin

  /** Glyph-width-driven spacing gate: the [[graft.sources.PdfText
    * .composeWidthFixture]] pages encode EVERY inter-word space as
    * either a sub-fixed-threshold TJ kern over a condensed /Widths
    * font, a super-threshold letter kern over a wide font (which must
    * NOT split), or a same-line Td pen jump with no kern at all — so
    * the row hashes only match when the extractor resolves /Widths,
    * scales the break threshold to the space glyph, and models pen
    * advance. The oracle replays the closed form.
    */
  val pdfWidths: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("pdf", graft.functions.PdfOps.synthPdfWidths(col("doc_id") * 29,
        (col("doc_id") % 3 + 1).cast("int")))
      .withColumn("txt", graft.functions.PdfOps.pdfText(col("pdf")))
      .select(col("doc_id"),
        size(col("txt")).cast("long").as("n_pages"),
        element_at(col("txt"), 1).as("page1"),
        element_at(col("txt"), size(col("txt"))).as("page_last"),
        aggregate(transform(col("txt"), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_chars"))
  val pdfWidthsSql: String =
    """WITH t AS (
      |  SELECT d.doc_id, p.p,
      |         'alpha beta gamma' || chr(10) || 'Wide font line' || chr(10) ||
      |           'gap joined' || chr(10) ||
      |           'W ' || (d.doc_id * 29) || ' p ' || p.p || ' end' AS page_text
      |  FROM documents d, generate_series(0, 2) p(p)
      |  WHERE p.p <= d.doc_id % 3)
      |SELECT doc_id,
      |       CAST(doc_id % 3 + 1 AS BIGINT) AS n_pages,
      |       min(CASE WHEN p = 0 THEN page_text END) AS page1,
      |       min(CASE WHEN p = doc_id % 3 THEN page_text END) AS page_last,
      |       CAST(sum(length(page_text)) AS BIGINT) AS n_chars
      |FROM t GROUP BY doc_id""".stripMargin

  /** CJK extraction under the hash gate: predefined UniGB-UCS2-H /
    * UniJIS-UCS2-V CMaps with NO /ToUnicode (2-byte codes decode as
    * BMP code points), a sub-threshold horizontal kern that must NOT
    * split, and a two-column vertical block whose /DW2 pen turns the
    * encoded Td gap into exactly one space and the column change into
    * a line break. The oracle replays the full extracted text of
    * every page closed-form.
    */
  val pdfCjk: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("pdf", graft.functions.PdfOps.synthPdfCjk(col("doc_id") * 23,
        (col("doc_id") % 3 + 1).cast("int")))
      .select(col("doc_id"),
        posexplode(graft.functions.PdfOps.pdfText(col("pdf"))).as(Seq("p", "text")))
      .select(col("doc_id"), col("p").cast("long").as("p"), col("text"))
  val pdfCjkSql: String =
    """SELECT d.doc_id, CAST(p.p AS BIGINT) AS p,
      |       '中文测试OK' || (d.doc_id * 23 + p.p) % 10 || chr(10) ||
      |       '繁体字 下一' || chr(10) || '列' AS text
      |FROM documents d, generate_series(0, 2) p(p)
      |WHERE p.p <= d.doc_id % 3""".stripMargin

  /** The document-corpus capstone: a MIXED shard of plaintext and
    * encrypted text PDFs (variant cycles RC4-40/RC4-128/AES-128/
    * AES-256/plain by doc_id) flows decrypt → parse → text-extract →
    * page-join → token metrics — the pdf→training-text path end to
    * end under one hash gate. The oracle rebuilds the extracted text
    * closed-form and applies the SAME token expressions, so a slip in
    * any stage (a handler that fails to verify, a dropped page, a
    * kern-space drift, a tokenizer change) flips counts on that row.
    */
  val pdfCorpus: Q = (s, d) => {
    val base = Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("pdf", graft.functions.PdfOps.synthPdfTextEnc(col("doc_id") * 53,
        (col("doc_id") % 3 + 1).cast("int"), (col("doc_id") % 5).cast("int")))
      .select(col("doc_id"),
        array_join(graft.functions.PdfOps.pdfText(col("pdf")), "\n").as("text"))
    graft.operators.TextAnalysis.withTokenCounts(base, "doc_id", "text")
      .withColumn("handler",
        element_at(lit((graft.sources.PdfCrypt.VariantNames :+ "plain").toArray),
          (col("doc_id") % 5).cast("int") + 1))
  }
  val pdfCorpusSql: String =
    """WITH t AS (
      |  SELECT d.doc_id, p.p,
      |         'Doc ' || (d.doc_id * 53) || ' page ' || p.p ||
      |           ' line one (escaped)' || chr(10) ||
      |           'kerned words here' || chr(10) || 'café three' AS pt
      |  FROM documents d, generate_series(0, 2) p(p)
      |  WHERE p.p <= d.doc_id % 3),
      |j AS (SELECT doc_id, string_agg(pt, chr(10) ORDER BY p) AS text
      |      FROM t GROUP BY doc_id)
      |SELECT doc_id,
      |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
      |         AS INTEGER) AS n_re_tokens,
      |       CAST(length(text) AS INTEGER) AS n_chars,
      |       CASE doc_id % 5 WHEN 0 THEN 'rc4-40' WHEN 1 THEN 'rc4-128'
      |            WHEN 2 THEN 'aes-128' WHEN 3 THEN 'aes-256' ELSE 'plain' END AS handler
      |FROM j""".stripMargin

  // ---------------------------------------------------------------- office docs
  /** DOCX text extraction under the hash gate: real ZIP archives (the
    * codec's own deterministic writer — central directory, deflate
    * members) whose `word/document.xml` paragraphs, runs, entities,
    * tabs and xml:space-preserved spacing the oracle rebuilds
    * closed-form. `n_parts` rides the ZIP central-directory listing
    * so the container walk is gated alongside the XML scan.
    */
  val docxText: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("docx", graft.functions.OfficeOps.synthDocx(col("doc_id") * 59,
        (col("doc_id") % 4 + 1).cast("int")))
      .select(col("doc_id"),
        graft.functions.OfficeOps.docxText(col("docx")).as("text"),
        size(graft.functions.OfficeOps.zipEntries(col("docx"))).cast("long").as("n_parts"))
      .withColumn("n_paras", size(split(col("text"), "\n", -1)).cast("long"))
  val docxTextSql: String =
    """WITH t AS (
      |  SELECT d.doc_id, p.p,
      |         'Para ' || p.p || ' of doc ' || (d.doc_id * 59) ||
      |           ' — café & tab:' || chr(9) || 'end' AS pt
      |  FROM documents d, generate_series(0, 3) p(p)
      |  WHERE p.p <= d.doc_id % 4)
      |SELECT doc_id,
      |       string_agg(pt, chr(10) ORDER BY p) AS text,
      |       CAST(2 AS BIGINT) AS n_parts,
      |       CAST(doc_id % 4 + 1 AS BIGINT) AS n_paras
      |FROM t GROUP BY doc_id""".stripMargin

  /** XLSX cell extraction under the hash gate, exploded to cell grain:
    * shared strings (multi-run `<si>` concatenation), raw numerics and
    * inline strings all resolve per row — the spreadsheet-side
    * structured-data feed (the reference's P5 domain carries .xlsx
    * attachments; this is what reading them takes).
    */
  val xlsxCells: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("xlsx", graft.functions.OfficeOps.synthXlsx(col("doc_id") * 61,
        (col("doc_id") % 5 + 1).cast("int")))
      .select(col("doc_id"),
        explode(graft.functions.OfficeOps.xlsxCells(col("xlsx"))).as("c"))
      .select(col("doc_id"), col("c.sheet").as("sheet"), col("c.ref").as("ref"),
        col("c.value").as("value"))
  val xlsxCellsSql: String =
    """WITH rows_ AS (
      |  SELECT d.doc_id, r.r
      |  FROM documents d, generate_series(1, 5) r(r)
      |  WHERE r.r <= d.doc_id % 5 + 1)
      |SELECT doc_id, CAST(0 AS INTEGER) AS sheet, 'A' || r AS ref,
      |       'sv' || (doc_id * 61 + r - 1) AS value
      |FROM rows_
      |UNION ALL
      |SELECT doc_id, CAST(0 AS INTEGER), 'B' || r,
      |       CAST((doc_id * 61 + r - 1) * 3 AS VARCHAR)
      |FROM rows_
      |UNION ALL
      |SELECT doc_id, CAST(0 AS INTEGER), 'C' || r, 'in' || (r - 1)
      |FROM rows_""".stripMargin

  /** PPTX slide-text extraction under the hash gate, exploded to slide
    * grain: `<a:p>` paragraph joins and multi-run `<a:t>`
    * concatenation per slide in slide order.
    */
  val pptxText: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("pptx", graft.functions.OfficeOps.synthPptx(col("doc_id") * 67,
        (col("doc_id") % 3 + 1).cast("int")))
      .select(col("doc_id"),
        posexplode(graft.functions.OfficeOps.pptxText(col("pptx"))).as(Seq("slide", "slide_text")))
      .select(col("doc_id"), col("slide").cast("long").as("slide"), col("slide_text"))
  val pptxTextSql: String =
    """SELECT d.doc_id, CAST(s.s AS BIGINT) AS slide,
      |       'Slide ' || s.s || ' of deck ' || (d.doc_id * 67) || chr(10) ||
      |         'bullet & point ' || (d.doc_id * 67) % 100 AS slide_text
      |FROM documents d, generate_series(0, 2) s(s)
      |WHERE s.s <= d.doc_id % 3""".stripMargin

  /** EPUB text extraction under the hash gate, chapter grain: chapter
    * FILE NAMES sort against reading order in the fixture, so only the
    * container→OPF→spine path (not the name-order fallback) produces
    * the gated sequence; chapter bodies ride the crawl layer's HTML
    * extractor (entities, block joins).
    */
  val epubText: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("epub", graft.functions.OfficeOps.synthEpub(col("doc_id") * 83,
        (col("doc_id") % 4 + 1).cast("int")))
      .select(col("doc_id"),
        posexplode(graft.functions.OfficeOps.epubText(col("epub"))).as(Seq("chapter", "chapter_text")))
      .select(col("doc_id"), col("chapter").cast("long").as("chapter"), col("chapter_text"))
  val epubTextSql: String =
    """SELECT d.doc_id, CAST(c.c AS BIGINT) AS chapter,
      |       'Chapter ' || c.c || chr(10) || 'Book ' || (d.doc_id * 83) ||
      |         ' prose & café line ' || c.c || '.' AS chapter_text
      |FROM documents d, generate_series(0, 3) c(c)
      |WHERE c.c <= d.doc_id % 4""".stripMargin

  /** Email extraction under the hash gate, message grain: real MBOX
    * archives whose messages cycle the three decode paths —
    * quoted-printable Latin-1 (incl. a soft line break), base64 UTF-8,
    * and multipart/alternative where the html part comes FIRST but the
    * text/plain part must win — with RFC 2047 encoded-word subjects
    * (base64, non-ASCII en dash). The oracle rebuilds every header and
    * body closed-form; a slip in mbox framing, header folding, word
    * decoding, boundary walking or either transfer decoding flips a
    * row.
    */
  val mboxText: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("mbox", graft.functions.OfficeOps.synthMbox(col("doc_id") * 89,
        (col("doc_id") % 5 + 1).cast("int")))
      .select(col("doc_id"),
        posexplode(graft.functions.OfficeOps.mboxMessages(col("mbox"))).as(Seq("msg", "m")))
      .select(col("doc_id"), col("msg").cast("long").as("msg"),
        col("m.subject").as("subject"), col("m.from").as("sender"),
        col("m.date").as("date"), col("m.text").as("text"))
  val mboxTextSql: String =
    """SELECT d.doc_id, CAST(m.m AS BIGINT) AS msg,
      |       'Report ' || (d.doc_id * 89) || '–' || m.m AS subject,
      |       'Sender ' || m.m || ' <sender' || m.m || '@example.com>' AS sender,
      |       'Thu, 0' || (m.m % 9 + 1) || ' Jan 2026 00:00:00 +0000' AS date,
      |       CASE m.m % 3
      |         WHEN 0 THEN 'café note ' || (d.doc_id * 89) || ' line ' || m.m || ' joined'
      |         WHEN 1 THEN 'body ' || (d.doc_id * 89) || ' of message ' || m.m || ' — unicode ok'
      |         ELSE 'plain ' || (d.doc_id * 89) || ' wins ' || m.m END AS text
      |FROM documents d, generate_series(0, 4) m(m)
      |WHERE m.m <= d.doc_id % 5""".stripMargin

  /** Jupyter-notebook cell extraction — deliberately PURE Catalyst
    * (hand-assembled `.ipynb` JSON parsed with `from_json`, cells
    * exploded, source arrays joined) as the native-path counterpoint
    * to the custom codecs: notebooks are JSON, so the engine's own
    * JSON machinery IS the right extractor, and the gate proves the
    * schema/parse/explode chain against the closed form. Cell mix per
    * doc: one markdown title + code cells with multi-line sources.
    */
  val ipynbCells: Q = (s, d) => {
    val id = col("doc_id").cast("string")
    val nbJson = concat(
      lit("{\"cells\":[{\"cell_type\":\"markdown\",\"source\":[\"# Title "), id,
      lit("\"]},{\"cell_type\":\"code\",\"source\":[\"x = "), id,
      lit("\\n\",\"print(x)\"],\"outputs\":[]},{\"cell_type\":\"code\",\"source\":[\"y = "),
      pmod(col("doc_id"), lit(7)).cast("string"),
      lit("\"]}],\"nbformat\":4,\"nbformat_minor\":5}"))
    Tables.documents(s, d).select("doc_id")
      .withColumn("nb", nbJson)
      .withColumn("parsed", from_json(col("nb"),
        lit("struct<cells: array<struct<cell_type:string, source:array<string>>>, nbformat:int>")))
      .select(col("doc_id"),
        posexplode(col("parsed.cells")).as(Seq("cell", "c")))
      .select(col("doc_id"), col("cell").cast("long").as("cell"),
        col("c.cell_type").as("cell_type"),
        concat_ws("", col("c.source")).as("source"))
  }
  val ipynbCellsSql: String =
    """SELECT d.doc_id, CAST(c.c AS BIGINT) AS cell,
      |       CASE c.c WHEN 0 THEN 'markdown' ELSE 'code' END AS cell_type,
      |       CASE c.c WHEN 0 THEN '# Title ' || d.doc_id
      |                WHEN 1 THEN 'x = ' || d.doc_id || chr(10) || 'print(x)'
      |                ELSE 'y = ' || (d.doc_id % 7) END AS source
      |FROM documents d, generate_series(0, 2) c(c)""".stripMargin

  /** RTF extraction under the hash gate: control-word tokenization,
    * cp1252 hex bytes, unicode escapes with fallback skipping,
    * special-character words and destination-group skipping, all
    * closed-form per row.
    */
  val rtfText: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("rtf", graft.functions.OfficeOps.synthRtf(col("doc_id") * 97,
        (col("doc_id") % 4 + 1).cast("int")))
      .select(col("doc_id"),
        graft.functions.OfficeOps.rtfText(col("rtf")).as("text"))
      .withColumn("n_paras", size(split(col("text"), "\n", -1)).cast("long"))
  val rtfTextSql: String =
    """WITH t AS (
      |  SELECT d.doc_id, p.p,
      |         'Note ' || p.p || ' of ' || (d.doc_id * 97) ||
      |           ': café —dash ' || chr(9) || 'end' AS pt
      |  FROM documents d, generate_series(0, 3) p(p)
      |  WHERE p.p <= d.doc_id % 4)
      |SELECT doc_id, string_agg(pt, chr(10) ORDER BY p) AS text,
      |       CAST(doc_id % 4 + 1 AS BIGINT) AS n_paras
      |FROM t GROUP BY doc_id""".stripMargin

  /** Content-based format routing under the hash gate: a 19-way
    * battery of REAL payloads from every synth writer in the engine
    * (PDF, the three Office formats, EPUB, TAR, WAV, GIF, AVI, PNG,
    * TIFF, Avro, HTML, XML, text, binary, empty) classified per row
    * by `format_detect` — magic bytes + container refinement, never
    * extensions. The CASE chain evaluates only the branch a row needs
    * (no 19× synth cost).
    */
  val formatDetect: Q = (s, d) => {
    val seed = col("doc_id") * 71
    val idx = pmod(col("doc_id"), lit(19))
    val payload = when(idx === 0, graft.functions.PdfOps.synthPdfText(seed, lit(1)))
      .when(idx === 1, graft.functions.OfficeOps.synthDocx(seed, lit(1)))
      .when(idx === 2, graft.functions.OfficeOps.synthXlsx(seed, lit(1)))
      .when(idx === 3, graft.functions.OfficeOps.synthPptx(seed, lit(1)))
      .when(idx === 4, graft.functions.OfficeOps.synthEpub(seed, lit(1)))
      .when(idx === 5, graft.functions.OfficeOps.synthTar(seed, lit(2)))
      .when(idx === 6, graft.functions.AudioOps.synthWav(seed, lit(50), lit(8000), lit(0)))
      .when(idx === 7, graft.functions.GifOps.synthGif(seed, lit(2), lit(8), lit(8)))
      .when(idx === 8, graft.functions.AviOps.synthAvi(seed, lit(2), lit(16), lit(8)))
      .when(idx === 9, graft.functions.ImageOps.synthImage(seed, lit(8), lit(8)))
      .when(idx === 10, encode(lit("<!DOCTYPE html><html><body>x</body></html>"), "UTF-8"))
      .when(idx === 11, encode(lit("<?xml version=\"1.0\"?><r/>"), "UTF-8"))
      .when(idx === 12, encode(lit("plain text payload, nothing else\n"), "UTF-8"))
      .when(idx === 13, unhex(lit("00FF01FE00")))
      .when(idx === 14, graft.functions.OfficeOps.synthMbox(seed, lit(1)))
      .when(idx === 15, graft.functions.OfficeOps.synthRtf(seed, lit(1)))
      .when(idx === 16, graft.functions.TiffOps.synthTiff(seed, lit(16), lit(12),
        pmod(col("doc_id"), lit(4)).cast("int")))
      .when(idx === 17, graft.functions.AvroOps.synthAvro(seed, lit(3)))
      .otherwise(unhex(lit("")))
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        graft.functions.OfficeOps.formatDetect(payload).as("format"))
  }
  val formatDetectSql: String =
    """SELECT doc_id,
      |       (['pdf', 'docx', 'xlsx', 'pptx', 'epub', 'tar', 'wav', 'gif', 'avi',
      |         'png', 'html', 'xml', 'text', 'binary', 'mbox', 'rtf', 'tiff', 'avro',
      |         'empty'])
      |         [CAST(doc_id % 19 AS INTEGER) + 1] AS format
      |FROM documents""".stripMargin

  /** TAR listing under the hash gate: real ustar archives (the codec's
    * own writer — checksummed headers, 512-block padding) exploded to
    * entry grain with closed-form names and sizes.
    */
  val tarEntries: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("tar", graft.functions.OfficeOps.synthTar(col("doc_id") * 73,
        (col("doc_id") % 4 + 1).cast("int")))
      .select(col("doc_id"),
        explode(graft.functions.OfficeOps.tarEntries(col("tar"))).as("e"))
      .select(col("doc_id"), col("e.name").as("name"), col("e.size").as("size"))
  val tarEntriesSql: String =
    """SELECT d.doc_id, 'f' || i.i || '.txt' AS name,
      |       CAST(10 + (d.doc_id * 73 + i.i) % 23 AS BIGINT) AS size
      |FROM documents d, generate_series(0, 3) i(i)
      |WHERE i.i <= d.doc_id % 4""".stripMargin

  /** The mixed-format ingest capstone: one shard carrying PDF, DOCX,
    * PPTX, EPUB, MediaWiki dump-XML, `.jsonl.gz`, WET-extract
    * `.warc.gz`, `.jsonl.zst`, `.jsonl.xz`, `.jsonl.bz2`, multistream
    * `.xml.bz2` wiki-dump, `.jsonl.lz4`, snappy-framed `.jsonl.sz`, and
    * Hadoop-container `.snappy` payloads (14 formats)
    * routes each row through `format_detect`, then DISPATCHES to the
    * matching extractor — pdf_text / docx_text / pptx_text /
    * epub_text / wiki_dump_text / jsonl_gz_text / wet_text /
    * jsonl_zst_text / jsonl_xz_text / jsonl_bz2_text /
    * unbzip2_text∘wiki_dump_text / jsonl_lz4_text / jsonl_snappy_text /
    * jsonl_snappy_hadoop_text —
    * into one unified text column feeding the token
    * metrics. This is the corpus front
    * door (detect → route → extract → measure) as a single gated
    * flow; the oracle rebuilds each branch's text closed-form and
    * applies identical metrics.
    */
  val corpusDispatch: Q = (s, d) => {
    val seed = col("doc_id") * 79
    val idx = pmod(col("doc_id"), lit(14))
    val wetPayload = graft.functions.WarcOps.synthWarcGz(array(
      struct(lit("warcinfo").as("rec_type"), lit("https://wet.example").as("url"),
        lit("2026-02-01T00:00:00Z").as("date"),
        lit("software: graft-wet/1.0").as("body")),
      struct(lit("conversion").as("rec_type"),
        concat(lit("https://wet.example/"), col("doc_id").cast("string"), lit("/0")).as("url"),
        lit("2026-02-01T00:00:00Z").as("date"),
        concat(lit("WET doc "), seed.cast("string"), lit(" rec 0 café text.")).as("body")),
      struct(lit("conversion").as("rec_type"),
        concat(lit("https://wet.example/"), col("doc_id").cast("string"), lit("/1")).as("url"),
        lit("2026-02-01T00:00:00Z").as("date"),
        concat(lit("WET doc "), seed.cast("string"), lit(" rec 1 café text.")).as("body"))))
    val payload = when(idx === 0, graft.functions.PdfOps.synthPdfText(seed, lit(2)))
      .when(idx === 1, graft.functions.OfficeOps.synthDocx(seed, lit(2)))
      .when(idx === 2, graft.functions.OfficeOps.synthPptx(seed, lit(2)))
      .when(idx === 3, graft.functions.OfficeOps.synthEpub(seed, lit(2)))
      .when(idx === 4, encode(
        graft.functions.CodeOps.synthWikiDump(seed, lit(2).cast("int")), "UTF-8"))
      .when(idx === 5, graft.functions.CodeOps.synthJsonlGz(seed,
        lit(2).cast("int"), lit(2).cast("int")))
      .when(idx === 6, wetPayload)
      .when(idx === 7, graft.functions.CodeOps.synthJsonlZst(seed,
        lit(2).cast("int"), lit(2).cast("int")))
      .when(idx === 8, graft.functions.CodeOps.synthJsonlXz(seed,
        lit(2).cast("int"), lit(2).cast("int")))
      .when(idx === 9, graft.functions.CodeOps.synthJsonlBz2(seed,
        lit(2).cast("int"), lit(2).cast("int")))
      .when(idx === 10, graft.functions.CodeOps.synthWikiBz2(seed, lit(2).cast("int")))
      .when(idx === 11, graft.functions.CodeOps.synthJsonlLz4(seed,
        lit(2).cast("int"), lit(2).cast("int")))
      .when(idx === 12, graft.functions.CodeOps.synthJsonlSnappy(seed,
        lit(2).cast("int"), lit(2).cast("int")))
      .otherwise(graft.functions.CodeOps.synthJsonlSnappyHadoop(seed,
        lit(2).cast("int"), lit(2).cast("int")))
    graft.operators.CorpusIngest.withDocMetrics(
      Tables.documents(s, d).select("doc_id")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("payload", payload),
      "doc_id", "payload")
  }
  val corpusDispatchSql: String =
    """WITH pdfp AS (
      |  SELECT d.doc_id, p.p,
      |         'Doc ' || (d.doc_id * 79) || ' page ' || p.p ||
      |           ' line one (escaped)' || chr(10) ||
      |           'kerned words here' || chr(10) || 'café three' AS pt
      |  FROM documents d, generate_series(0, 1) p(p)
      |  WHERE d.doc_id % 14 = 0),
      |docxp AS (
      |  SELECT d.doc_id, p.p,
      |         'Para ' || p.p || ' of doc ' || (d.doc_id * 79) ||
      |           ' — café & tab:' || chr(9) || 'end' AS pt
      |  FROM documents d, generate_series(0, 1) p(p)
      |  WHERE d.doc_id % 14 = 1),
      |pptxp AS (
      |  SELECT d.doc_id, p.p,
      |         'Slide ' || p.p || ' of deck ' || (d.doc_id * 79) || chr(10) ||
      |           'bullet & point ' || (d.doc_id * 79) % 100 AS pt
      |  FROM documents d, generate_series(0, 1) p(p)
      |  WHERE d.doc_id % 14 = 2),
      |epubp AS (
      |  SELECT d.doc_id, p.p,
      |         'Chapter ' || p.p || chr(10) || 'Book ' || (d.doc_id * 79) ||
      |           ' prose & café line ' || p.p || '.' AS pt
      |  FROM documents d, generate_series(0, 1) p(p)
      |  WHERE d.doc_id % 14 = 3),
      |wikip AS (
      |  SELECT d.doc_id, p.p,
      |         'Heading ' || (d.doc_id * 79 + p.p) || chr(10) ||
      |         'Intro bold and italic with link text and Plain ' ||
      |           (d.doc_id * 79 + p.p) % 5 || '.' || chr(10) || chr(10) ||
      |         'item one ' || (d.doc_id * 79 + p.p) % 5 || chr(10) ||
      |         'item two' || chr(10) ||
      |         'A claim stays.' || chr(10) ||
      |         'Visible & kept é.' || chr(10) ||
      |         'External site label and .' || chr(10) || chr(10) || chr(10) ||
      |         'kept ''''raw'''' ' || (d.doc_id * 79 + p.p) ||
      |           ' tail span text – done ' || (d.doc_id * 79 + p.p) % 11 || '.' || chr(10) AS pt
      |  FROM documents d, generate_series(0, 1) p(p)
      |  WHERE d.doc_id % 14 = 4),
      |jsonlp AS (
      |  SELECT d.doc_id, m.m * 2 + l.l AS p,
      |         'doc ' || (d.doc_id * 79) || ' m' || m.m || ' l' || l.l ||
      |           ' say "hi"' || chr(9) || 'ok' AS pt
      |  FROM documents d, generate_series(0, 1) m(m), generate_series(0, 1) l(l)
      |  WHERE d.doc_id % 14 = 5),
      |wetp AS (
      |  SELECT d.doc_id, p.p,
      |         'WET doc ' || (d.doc_id * 79) || ' rec ' || p.p || ' café text.' AS pt
      |  FROM documents d, generate_series(0, 1) p(p)
      |  WHERE d.doc_id % 14 = 6),
      |zstp AS (
      |  SELECT d.doc_id, m.m * 2 + l.l AS p,
      |         'doc ' || (d.doc_id * 79) || ' m' || m.m || ' l' || l.l ||
      |           ' say "hi"' || chr(9) || 'ok' AS pt
      |  FROM documents d, generate_series(0, 1) m(m), generate_series(0, 1) l(l)
      |  WHERE d.doc_id % 14 = 7),
      |xzp AS (
      |  SELECT d.doc_id, m.m * 2 + l.l AS p,
      |         'doc ' || (d.doc_id * 79) || ' m' || m.m || ' l' || l.l ||
      |           ' say "hi"' || chr(9) || 'ok' AS pt
      |  FROM documents d, generate_series(0, 1) m(m), generate_series(0, 1) l(l)
      |  WHERE d.doc_id % 14 = 8),
      |bz2p AS (
      |  SELECT d.doc_id, m.m * 2 + l.l AS p,
      |         'doc ' || (d.doc_id * 79) || ' m' || m.m || ' l' || l.l ||
      |           ' say "hi"' || chr(9) || 'ok' AS pt
      |  FROM documents d, generate_series(0, 1) m(m), generate_series(0, 1) l(l)
      |  WHERE d.doc_id % 14 = 9),
      |wikibz2p AS (
      |  SELECT d.doc_id, p.p,
      |         'Heading ' || (d.doc_id * 79 + p.p) || chr(10) ||
      |         'Intro bold and italic with link text and Plain ' ||
      |           (d.doc_id * 79 + p.p) % 5 || '.' || chr(10) || chr(10) ||
      |         'item one ' || (d.doc_id * 79 + p.p) % 5 || chr(10) ||
      |         'item two' || chr(10) ||
      |         'A claim stays.' || chr(10) ||
      |         'Visible & kept é.' || chr(10) ||
      |         'External site label and .' || chr(10) || chr(10) || chr(10) ||
      |         'kept ''''raw'''' ' || (d.doc_id * 79 + p.p) ||
      |           ' tail span text – done ' || (d.doc_id * 79 + p.p) % 11 || '.' || chr(10) AS pt
      |  FROM documents d, generate_series(0, 1) p(p)
      |  WHERE d.doc_id % 14 = 10),
      |lz4p AS (
      |  SELECT d.doc_id, m.m * 2 + l.l AS p,
      |         'doc ' || (d.doc_id * 79) || ' m' || m.m || ' l' || l.l ||
      |           ' say "hi"' || chr(9) || 'ok' AS pt
      |  FROM documents d, generate_series(0, 1) m(m), generate_series(0, 1) l(l)
      |  WHERE d.doc_id % 14 = 11),
      |snappyp AS (
      |  SELECT d.doc_id, m.m * 2 + l.l AS p,
      |         'doc ' || (d.doc_id * 79) || ' m' || m.m || ' l' || l.l ||
      |           ' say "hi"' || chr(9) || 'ok' AS pt
      |  FROM documents d, generate_series(0, 1) m(m), generate_series(0, 1) l(l)
      |  WHERE d.doc_id % 14 = 12),
      |snaphp AS (
      |  SELECT d.doc_id, m.m * 2 + l.l AS p,
      |         'doc ' || (d.doc_id * 79) || ' m' || m.m || ' l' || l.l ||
      |           ' say "hi"' || chr(9) || 'ok' AS pt
      |  FROM documents d, generate_series(0, 1) m(m), generate_series(0, 1) l(l)
      |  WHERE d.doc_id % 14 = 13),
      |allp AS (SELECT * FROM pdfp UNION ALL SELECT * FROM docxp
      |         UNION ALL SELECT * FROM pptxp UNION ALL SELECT * FROM epubp
      |         UNION ALL SELECT * FROM wikip UNION ALL SELECT * FROM jsonlp
      |         UNION ALL SELECT * FROM wetp UNION ALL SELECT * FROM zstp
      |         UNION ALL SELECT * FROM xzp UNION ALL SELECT * FROM bz2p
      |         UNION ALL SELECT * FROM wikibz2p UNION ALL SELECT * FROM lz4p
      |         UNION ALL SELECT * FROM snappyp UNION ALL SELECT * FROM snaphp),
      |j AS (SELECT doc_id, string_agg(pt, chr(10) ORDER BY p) AS text
      |      FROM allp GROUP BY doc_id)
      |SELECT doc_id,
      |       CASE doc_id % 14 WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx'
      |            WHEN 2 THEN 'pptx' WHEN 3 THEN 'epub'
      |            WHEN 4 THEN 'mediawiki' WHEN 5 THEN 'jsonl-gz'
      |            WHEN 6 THEN 'warc-gz' WHEN 7 THEN 'jsonl-zst'
      |            WHEN 8 THEN 'jsonl-xz' WHEN 9 THEN 'jsonl-bz2'
      |            WHEN 10 THEN 'wiki-bz2' WHEN 11 THEN 'jsonl-lz4'
      |            WHEN 12 THEN 'jsonl-snappy'
      |            ELSE 'jsonl-snappy-hadoop' END AS format,
      |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
      |         AS INTEGER) AS n_re_tokens,
      |       CAST(length(text) AS INTEGER) AS n_chars
      |FROM j""".stripMargin

  // ---------------------------------------------------------------- audio codec
  /** The WAV/PCM16 audio codec through the oracle gate: a real synth
    * → encode → parse → analyze round trip per document. The fixture
    * is a ±amp square wave (amp = 1000 + seed % 9000), so EVERY
    * analysis value — sample count, rate, duration, and crucially the
    * integer RMS — is a closed-form function of doc_id: if the RIFF
    * writer, the chunk-walking parser, or the Σs² fold drifts by one
    * byte or one sample, the hash gate catches it on every row.
    * Byte-level guards (chunk alignment, truncation, format codes)
    * are pinned in AudioCodecSpec.
    */
  val audioMeta: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .withColumn("wav", graft.functions.AudioOps.synthWav(col("doc_id") * 31,
        (lit(250) + col("doc_id") % 250).cast("int"),
        (lit(8000) + (col("doc_id") % 3) * 4000).cast("int"), lit(0)))
      .withColumn("info", graft.functions.AudioOps.wavInfo(col("wav")))
      .select(col("doc_id"),
        col("info.n_samples").as("n_samples"),
        col("info.sample_rate").as("sample_rate"),
        col("info.channels").as("channels"),
        col("info.duration_ms").as("duration_ms"),
        graft.functions.AudioOps.audioRms(col("wav")).as("rms"))
  val audioMetaSql: String =
    """SELECT doc_id,
      |       CAST(8 * (250 + doc_id % 250) AS BIGINT) AS n_samples,
      |       CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
      |       CAST(1 AS BIGINT) AS channels,
      |       (8 * (250 + doc_id % 250) * 1000) // (8000 + (doc_id % 3) * 4000)
      |         AS duration_ms,
      |       CAST(1000 + (doc_id * 31) % 9000 AS BIGINT) AS rms
      |FROM documents""".stripMargin

  /** VAD-style segmentation on real audio bytes: per-window integer
    * RMS over the synth fixture with a doc_id-derived silence mask
    * (bit i of doc_id % 256 zeroes window i), exploded to window
    * grain. Window RMS is exactly amp-or-0 by construction, so DuckDB
    * recomputes every window from the mask's bits — gating the window
    * slicing, the mask placement AND the RMS fold at once.
    */
  val audioVad: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .withColumn("wav", graft.functions.AudioOps.synthWav(col("doc_id") * 31,
        (lit(100) + col("doc_id") % 100).cast("int"), lit(16000),
        (col("doc_id") % 256).cast("int")))
      .select(col("doc_id"),
        posexplode(graft.functions.AudioOps.audioWindowRms(col("wav"),
          (lit(100) + col("doc_id") % 100).cast("int"))).as(Seq("win", "win_rms")))
      .select(col("doc_id"), col("win").cast("long").as("win"), col("win_rms"))
  val audioVadSql: String =
    """SELECT d.doc_id, t.win,
      |       CASE WHEN ((d.doc_id % 256) >> CAST(t.win AS INTEGER)) & 1 = 1
      |            THEN CAST(0 AS BIGINT)
      |            ELSE CAST(1000 + (d.doc_id * 31) % 9000 AS BIGINT) END AS win_rms
      |FROM documents d, generate_series(0, 7) t(win)""".stripMargin

  // ---------------------------------------------------------------- flac codec
  /** FLAC STREAMINFO through the gate: rate/channel/bit/duration
    * metadata of the encoded square-wave fixture, closed-form per doc
    * (odd docs stereo — the encoder emits mid/side frames there).
    */
  val flacMeta: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("flac", graft.functions.SpeechOps.synthFlac(col("doc_id") * 31,
        (lit(250) + col("doc_id") % 250).cast("int"),
        (lit(8000) + (col("doc_id") % 3) * 4000).cast("int"), lit(0)))
      .withColumn("info", graft.functions.SpeechOps.flacInfo(col("flac")))
      .select(col("doc_id"),
        col("info.n_samples").as("n_samples"),
        col("info.sample_rate").as("sample_rate"),
        col("info.channels").as("channels"),
        col("info.bits").as("bits"),
        col("info.duration_ms").as("duration_ms"))
  val flacMetaSql: String =
    """SELECT doc_id,
      |       CAST(8 * (250 + doc_id % 250) AS BIGINT) AS n_samples,
      |       CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
      |       CAST(1 + doc_id % 2 AS BIGINT) AS channels,
      |       CAST(16 AS BIGINT) AS bits,
      |       CAST((8 * (250 + doc_id % 250) * 1000) // (8000 + (doc_id % 3) * 4000) AS BIGINT) AS duration_ms
      |FROM documents""".stripMargin

  /** FLAC DECODE under the hash gate: encode the square-wave fixture
    * (subframe types rotating CONSTANT/FIXED-2/VERBATIM/LPC across
    * frames, mid/side on odd docs), decode it back (CRC-8/16
    * verified), and prove the samples exactly via the VAD window-RMS
    * closed form — every window is amp-or-0, so one wrong warm-up
    * sample, Rice parameter, predictor tap, or decorrelation shift
    * flips a row. The wavInfo n_samples column gates the container
    * round trip.
    */
  val flacDecode: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("w", (lit(100) + col("doc_id") % 100).cast("int"))
      .withColumn("flac", graft.functions.SpeechOps.synthFlac(col("doc_id") * 31,
        col("w"), lit(16000), (col("doc_id") % 256).cast("int")))
      .withColumn("wav", graft.functions.SpeechOps.flacToWav(col("flac")))
      .withColumn("n_samples",
        graft.functions.AudioOps.wavInfo(col("wav")).getField("n_samples"))
      .select(col("doc_id"), col("n_samples"),
        posexplode(graft.functions.AudioOps.audioWindowRms(col("wav"),
          (col("w") * (lit(1) + pmod(col("doc_id"), lit(2)))).cast("int")))
          .as(Seq("win", "win_rms")))
      .select(col("doc_id"), col("n_samples"), col("win").cast("long").as("win"),
        col("win_rms"))
  val flacDecodeSql: String =
    """SELECT d.doc_id,
      |       CAST(8 * (100 + d.doc_id % 100) * (1 + d.doc_id % 2) AS BIGINT) AS n_samples,
      |       t.win,
      |       CASE WHEN ((d.doc_id % 256) >> CAST(t.win AS INTEGER)) & 1 = 1
      |            THEN CAST(0 AS BIGINT)
      |            ELSE CAST(1000 + (d.doc_id * 31) % 9000 AS BIGINT) END AS win_rms
      |FROM documents d, generate_series(0, 7) t(win)""".stripMargin

  /** Speech-corpus alignment capstone: FLAC → decode → VAD windows,
    * SRT/VTT transcript (parity-alternating container, shared cue
    * schedule) → cue grain, then a per-doc equi-join computing the
    * voiced∩cued overlap in integer ms. Cues run past the audio (the
    * realistic shape) so the clipping path is load-bearing; the
    * oracle replays windows × cues with genuine SQL.
    */
  val transcriptAlign: Q = (s, d) => {
    val base = Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    val wins = base
      .withColumn("flac", graft.functions.SpeechOps.synthFlac(col("doc_id") * 31,
        lit(800), lit(8000), (col("doc_id") % 256).cast("int")))
      .withColumn("wav", graft.functions.SpeechOps.flacToWav(col("flac")))
      .select(col("doc_id"),
        posexplode(graft.functions.AudioOps.audioWindowRms(col("wav"),
          (lit(800) * (lit(1) + pmod(col("doc_id"), lit(2)))).cast("int")))
          .as(Seq("win", "win_rms")))
    val cues = base
      .withColumn("n_cues", (col("doc_id") % 3 + 2).cast("int"))
      .withColumn("transcript",
        when(pmod(col("doc_id"), lit(2)) === 0,
          graft.functions.SpeechOps.synthSrt(col("doc_id") * 43, col("n_cues")))
          .otherwise(graft.functions.SpeechOps.synthVtt(col("doc_id") * 43, col("n_cues"))))
      .select(col("doc_id"), explode(graft.functions.SpeechOps.parseCues(col("transcript"))).as("c"))
      .select(col("doc_id"), col("c.idx").as("cue_idx"),
        col("c.start_ms").as("start_ms"), col("c.end_ms").as("end_ms"))
    wins.join(cues, Seq("doc_id"))
      .withColumn("ov", greatest(lit(0L),
        least(col("end_ms"), (col("win") + 1) * 100L) -
          greatest(col("start_ms"), col("win") * 100L)))
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("cue_idx")).as("n_cues"),
        countDistinct(when(col("win_rms") > 0, col("win"))).as("voiced_wins"),
        coalesce(sum(when(col("win_rms") > 0, col("ov")).otherwise(0L)), lit(0L))
          .as("voiced_cued_ms"))
  }
  val transcriptAlignSql: String =
    """WITH wins AS (
      |  SELECT d.doc_id, t.win,
      |         CASE WHEN ((d.doc_id % 256) >> CAST(t.win AS INTEGER)) & 1 = 1
      |              THEN 0 ELSE 1 END AS voiced
      |  FROM documents d, generate_series(0, 7) t(win)),
      |cues AS (
      |  SELECT d.doc_id, c.j,
      |         (d.doc_id * 43) % 7 * 10 + c.j * 350 AS start_ms,
      |         (d.doc_id * 43) % 7 * 10 + c.j * 350 + 200 + (c.j % 3) * 50 AS end_ms
      |  FROM documents d, generate_series(0, 4) c(j)
      |  WHERE c.j < d.doc_id % 3 + 2),
      |pairs AS (
      |  SELECT w.doc_id, w.win, w.voiced, c.j,
      |         greatest(0, least(c.end_ms, (w.win + 1) * 100)
      |                     - greatest(c.start_ms, w.win * 100)) AS ov
      |  FROM wins w JOIN cues c USING (doc_id))
      |SELECT doc_id,
      |       CAST(count(DISTINCT j) AS BIGINT) AS n_cues,
      |       CAST(count(DISTINCT CASE WHEN voiced = 1 THEN win END) AS BIGINT) AS voiced_wins,
      |       CAST(coalesce(sum(CASE WHEN voiced = 1 THEN ov ELSE 0 END), 0) AS BIGINT) AS voiced_cued_ms
      |FROM pairs GROUP BY doc_id""".stripMargin

  /** Exact-rational resampling through the gate: synth at a
    * doc_id-derived rate, resample to 16 kHz, parse the OUTPUT
    * container back. Output length n·16000/src (floor) and the
    * 44-byte-header byte size are closed-form — DuckDB recomputes
    * both, gating the resampler's length arithmetic and the
    * re-encode, byte-exactly, on every row.
    */
  val audioResampleQ: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .withColumn("wav", graft.functions.AudioOps.synthWav(col("doc_id") * 31,
        (lit(250) + col("doc_id") % 250).cast("int"),
        (lit(8000) + (col("doc_id") % 3) * 4000).cast("int"), lit(0)))
      .withColumn("out", graft.functions.AudioOps.audioResample(col("wav"), lit(16000)))
      .withColumn("info", graft.functions.AudioOps.wavInfo(col("out")))
      .select(col("doc_id"),
        col("info.n_samples").as("out_samples"),
        col("info.sample_rate").as("out_rate"),
        length(col("out")).cast("long").as("out_bytes"))
  val audioResampleSql: String =
    """SELECT doc_id,
      |       (8 * (250 + doc_id % 250) * 16000)
      |         // (8000 + (doc_id % 3) * 4000) AS out_samples,
      |       CAST(16000 AS BIGINT) AS out_rate,
      |       44 + 2 * ((8 * (250 + doc_id % 250) * 16000)
      |         // (8000 + (doc_id % 3) * 4000)) AS out_bytes
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- gif / video codec
  /** The animated-GIF (video-family) codec through the oracle gate: a
    * real synth → GIF encode → container parse → per-frame luminance
    * analysis round trip per document. Frame k of doc_id's fixture is
    * solid webSafe(7·doc_id + k), which GIF's 256-color palette
    * preserves exactly, so frame count, geometry AND every frame's
    * integer mean luma are closed-form in doc_id — one byte of drift
    * in the LZW round trip or the frame indexing flips the hash on
    * every row. Byte-level guards (non-GIF null paths, palette
    * round-trip pixel-exactness, frame-size refusal) are pinned in
    * GifCodecSpec.
    */
  val gifFrames: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .withColumn("gif", graft.functions.GifOps.synthGif(col("doc_id") * 7,
        (lit(2) + col("doc_id") % 4).cast("int"),
        (lit(8) + (col("doc_id") % 3) * 4).cast("int"), lit(6)))
      .withColumn("info", graft.functions.GifOps.gifInfo(col("gif")))
      .select(col("doc_id"),
        col("info.n_frames").as("n_frames"),
        col("info.width").as("width"),
        col("info.height").as("height"),
        posexplode(graft.functions.GifOps.frameLumas(col("gif"))).as(Seq("frame", "luma")))
      .select(col("doc_id"), col("n_frames"), col("width"), col("height"),
        col("frame").cast("long").as("frame"), col("luma"))
  val gifFramesSql: String =
    """SELECT d.doc_id,
      |       CAST(2 + d.doc_id % 4 AS BIGINT) AS n_frames,
      |       CAST(8 + (d.doc_id % 3) * 4 AS BIGINT) AS width,
      |       CAST(6 AS BIGINT) AS height,
      |       t.frame,
      |       CAST((77 * (((7 * d.doc_id + t.frame) % 216) // 36) * 51
      |           + 150 * ((((7 * d.doc_id + t.frame) % 216) // 6) % 6) * 51
      |           + 29 * (((7 * d.doc_id + t.frame) % 216) % 6) * 51) // 256
      |         AS BIGINT) AS luma
      |FROM documents d, generate_series(0, 4) t(frame)
      |WHERE t.frame < 2 + d.doc_id % 4""".stripMargin

  /** Scene-change detection on the frame sequence: consecutive-frame
    * motion (mean |Δr|+|Δg|+|Δb| per pixel) exploded to cut grain,
    * thresholded into an is_cut flag. On the solid-color fixture every
    * motion value is the exact channel-delta sum of two web-safe
    * colors, so DuckDB recomputes the full motion series AND the flag
    * from doc_id alone — gating frame ordering, the per-pixel delta
    * fold and the threshold at once.
    */
  val gifScene: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .withColumn("gif", graft.functions.GifOps.synthGif(col("doc_id") * 7,
        (lit(2) + col("doc_id") % 4).cast("int"), lit(8), lit(6)))
      .select(col("doc_id"),
        posexplode(graft.functions.GifOps.frameMotion(col("gif"))).as(Seq("cut", "motion")))
      .select(col("doc_id"), col("cut").cast("long").as("cut"), col("motion"),
        (col("motion") >= 96).as("is_cut"))
  val gifSceneSql: String =
    """SELECT doc_id, cut, motion, motion >= 96 AS is_cut FROM (
      |  SELECT d.doc_id, t.cut,
      |         CAST(abs((((7 * d.doc_id + t.cut + 1) % 216) // 36) * 51
      |                - (((7 * d.doc_id + t.cut) % 216) // 36) * 51)
      |            + abs(((((7 * d.doc_id + t.cut + 1) % 216) // 6) % 6) * 51
      |                - ((((7 * d.doc_id + t.cut) % 216) // 6) % 6) * 51)
      |            + abs((((7 * d.doc_id + t.cut + 1) % 216) % 6) * 51
      |                - (((7 * d.doc_id + t.cut) % 216) % 6) * 51)
      |           AS BIGINT) AS motion
      |  FROM documents d, generate_series(0, 3) t(cut)
      |  WHERE t.cut < 1 + d.doc_id % 4)""".stripMargin

  /** Scene-cut keyframe sampling — the frame-selection step of a
    * multimodal training pipeline: keep frame 0 plus every frame that
    * STARTS a new scene (its motion vs the previous frame ≥ the cut
    * threshold), instead of a fixed every-nth stride. One container
    * decode yields both analysis arrays (the fused `gif_analyze`
    * projection — separate luma/motion expressions would parse and
    * LZW-decode the container twice per row; measured 1.9 → ~0.9 s at
    * sf0.1); the explode is then pruned to the kept frames. The oracle
    * recomputes the kept set and each kept frame's luma in closed form
    * from doc_id.
    */
  val gifKeyframes: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .withColumn("gif", graft.functions.GifOps.synthGif(col("doc_id") * 7,
        (lit(2) + col("doc_id") % 4).cast("int"), lit(8), lit(6)))
      .select(col("doc_id"), graft.functions.GifOps.analyze(col("gif")).as("_an"))
      .select(col("doc_id"), col("_an.lumas").as("_lumas"), col("_an.motion").as("_motion"))
      .select(col("doc_id"), posexplode(col("_lumas")).as(Seq("frame", "luma")),
        col("_motion"))
      // element_at is 1-based: entry `frame` is motion between frames
      // frame-1 and frame
      .filter(col("frame") === 0 || element_at(col("_motion"), col("frame")) >= 96)
      .select(col("doc_id"), col("frame").cast("long").as("frame"), col("luma"))
  val gifKeyframesSql: String =
    """SELECT d.doc_id, t.frame,
      |       CAST((77 * (((7 * d.doc_id + t.frame) % 216) // 36) * 51
      |           + 150 * ((((7 * d.doc_id + t.frame) % 216) // 6) % 6) * 51
      |           + 29 * (((7 * d.doc_id + t.frame) % 216) % 6) * 51) // 256
      |         AS BIGINT) AS luma
      |FROM documents d, generate_series(0, 4) t(frame)
      |WHERE t.frame < 2 + d.doc_id % 4
      |  AND (t.frame = 0 OR
      |       abs((((7 * d.doc_id + t.frame) % 216) // 36) * 51
      |         - (((7 * d.doc_id + t.frame - 1) % 216) // 36) * 51)
      |     + abs(((((7 * d.doc_id + t.frame) % 216) // 6) % 6) * 51
      |         - ((((7 * d.doc_id + t.frame - 1) % 216) // 6) % 6) * 51)
      |     + abs((((7 * d.doc_id + t.frame) % 216) % 6) * 51
      |         - (((7 * d.doc_id + t.frame - 1) % 216) % 6) * 51) >= 96)""".stripMargin

  /** The AVI container twin of q_gif_frames: metadata parse (count,
    * geometry, fps from strh's rate/scale) + per-frame mean luminance
    * over the uncompressed-DIB fixture, whose pixels are byte-exact —
    * so DuckDB recomputes every output, gating the RIFF chunk walk,
    * the bottom-up BGR row decode and the shared luma fold from
    * doc_id alone.
    */
  val aviFrames: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .withColumn("avi", graft.functions.AviOps.synthAvi(col("doc_id") * 11,
        (lit(2) + col("doc_id") % 3).cast("int"),
        (lit(8) + (col("doc_id") % 2) * 4).cast("int"), lit(6)))
      .withColumn("info", graft.functions.AviOps.aviInfo(col("avi")))
      .select(col("doc_id"),
        col("info.n_frames").as("n_frames"),
        col("info.width").as("width"),
        col("info.height").as("height"),
        col("info.fps").as("fps"),
        posexplode(graft.functions.AviOps.frameLumas(col("avi"))).as(Seq("frame", "luma")))
      .select(col("doc_id"), col("n_frames"), col("width"), col("height"), col("fps"),
        col("frame").cast("long").as("frame"), col("luma"))
  val aviFramesSql: String =
    """SELECT d.doc_id,
      |       CAST(2 + d.doc_id % 3 AS BIGINT) AS n_frames,
      |       CAST(8 + (d.doc_id % 2) * 4 AS BIGINT) AS width,
      |       CAST(6 AS BIGINT) AS height,
      |       CAST(10 AS BIGINT) AS fps,
      |       t.frame,
      |       CAST((77 * (((11 * d.doc_id + t.frame) % 216) // 36) * 51
      |           + 150 * ((((11 * d.doc_id + t.frame) % 216) // 6) % 6) * 51
      |           + 29 * (((11 * d.doc_id + t.frame) % 216) % 6) * 51) // 256
      |         AS BIGINT) AS luma
      |FROM documents d, generate_series(0, 3) t(frame)
      |WHERE t.frame < 2 + d.doc_id % 3""".stripMargin

  /** B6's frame-wise JPEG re-encode on a REAL video container: DIB
    * fixture → decode every frame → JPEG at q=80 → assemble a
    * Motion-JPEG AVI → parse THAT. The oracle pins the re-encoded
    * container's metadata (count/geometry/fps survive the transcode);
    * the pixel-level decode fidelity is unit-tested (AviCodecSpec) —
    * JPEG bytes are codec-internal and deliberately outside the
    * cross-engine hash.
    */
  val aviTranscode: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .withColumn("avi", graft.functions.AviOps.synthAvi(col("doc_id") * 11,
        (lit(2) + col("doc_id") % 3).cast("int"), lit(16), lit(8)))
      .withColumn("mjpeg", graft.functions.AviOps.toMjpeg(col("avi"), lit(80)))
      .withColumn("info", graft.functions.AviOps.aviInfo(col("mjpeg")))
      .select(col("doc_id"),
        col("info.n_frames").as("n_frames"),
        col("info.width").as("width"),
        col("info.height").as("height"),
        col("info.fps").as("fps"),
        (length(col("mjpeg")) > 0).as("nonempty"))
  val aviTranscodeSql: String =
    """SELECT doc_id,
      |       CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
      |       CAST(16 AS BIGINT) AS width,
      |       CAST(8 AS BIGINT) AS height,
      |       CAST(10 AS BIGINT) AS fps,
      |       TRUE AS nonempty
      |FROM documents""".stripMargin

  /** Common-Crawl-shaped WARC ingest, end-to-end under the oracle
    * gate: documents group into per-source `.warc.gz` segments (one
    * gzip member per record, every 5th doc a `request` record — the
    * non-content record types a real segment interleaves), the
    * segments parse back through `warc_records`, and the query keeps
    * only `response` payloads — the standard crawl-ingest flow
    * (file = split → flatMap records → type filter) with the
    * container framing, gzip member iteration, Content-Length payload
    * slicing and type dispatch all on the cross-engine hash. The
    * oracle reproduces every surviving row from `documents` directly:
    * a correct round trip is EXACTLY identity on the kept subset.
    */
  val warcIngest: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("source"), struct(
        when(col("doc_id") % 5 === 0, lit("request")).otherwise(lit("response")).as("rec_type"),
        concat(lit("https://"), col("source"), lit("/doc/"), col("doc_id")).as("url"),
        concat(lit("2026-01-0"), (col("doc_id") % 9 + 1).cast("string"),
          lit("T00:00:00Z")).as("date"),
        col("text").as("body")).as("rec"))
      .groupBy("source").agg(collect_list(col("rec")).as("recs"))
      .select(col("source"), graft.functions.WarcOps.synthWarcGz(col("recs")).as("warc"))
      .select(col("source"),
        explode(graft.functions.WarcOps.warcRecords(col("warc"))).as("r"))
      .filter(col("r.rec_type") === "response")
      .select(col("source"), col("r.url").as("url"), col("r.date").as("date"),
        decode(col("r.body"), "UTF-8").as("text_out"),
        length(col("r.body")).cast("long").as("n_bytes"))
  val warcIngestSql: String =
    """SELECT source,
      |       'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
      |       '2026-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || 'T00:00:00Z' AS date,
      |       text AS text_out,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |FROM documents WHERE doc_id % 5 <> 0""".stripMargin

  // ---------------------------------------------------------------- q_warc_br
  /** Brotli-encoded crawl responses inside WARC framing — the
    * `Content-Encoding: br` route, which is how a corpus engine
    * actually meets brotli (the format has no magic; the header IS the
    * routing). Response bodies are real HTTP messages; four of every
    * five carry REAL brotli payloads (the reference C encoder's bytes,
    * pinned as the literal battery below — the repo has no brotli
    * encoder by design, so the battery is the deterministic fixture)
    * and the fifth is an identity-encoded body built from the row's
    * own text. Segments round-trip through `.warc.gz` framing, then
    * `http_payload_text` dispatches on the header and decodes through
    * the from-scratch RFC 7932 decoder, under the hash gate.
    */
  private val BrBattery: Array[Array[Byte]] = Array(
    "GxwBAJwJNk6odze8BBHTaxcdOTpVJpdvbGmMASeI094EOnjISjzVTFL1NdhZvKIJAYOIs4vFj8MC",
    "GygBcBwHbiw9m79OQVEp5ibXZWlsbxJEh84pB+y1ZZDnZRf1u8GRBxgnGiaUNB3+DGwfwWMZTAH5BS+jR7WuxNGMP4AB",
    "GyUBsByHcSyxzs6OeA0iJncn6ch0uiyN7Y1TDthbASaW5smF5W5waFkQJxwW6HrZsq7jQzfP0F7XkQ+ZT4CP6O/z",
    "GyIBgIxUtb/WEZOjk2lsb45x4HAjnv+2KA4eshTwaYh93mtgbZpqhpnZZRzH5wMA"
  ).map(java.util.Base64.getDecoder.decode)
  val warcBr: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("text"))
      .withColumn("idx", (col("doc_id") % 5).cast("int"))
      .withColumn("http", concat(
        encode(concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"),
          when(col("idx") < 4, lit("Content-Encoding: br\r\n")).otherwise(lit("")),
          lit("\r\n")), "UTF-8"),
        when(col("idx") < 4, element_at(
          array(BrBattery.toIndexedSeq.map(lit(_)): _*), col("idx") + 1))
          .otherwise(encode(col("text"), "UTF-8"))))
      .select(col("source"), struct(
        lit("response").as("rec_type"),
        concat(lit("https://"), col("source"), lit("/page/"), col("doc_id")).as("url"),
        concat(lit("2026-03-0"), (col("doc_id") % 9 + 1).cast("string"),
          lit("T00:00:00Z")).as("date"),
        col("http").as("body")).as("rec"))
      .groupBy("source").agg(collect_list(col("rec")).as("recs"))
      .select(col("source"), graft.functions.WarcOps.synthWarcGzBin(col("recs")).as("warc"))
      .select(col("source"),
        explode(graft.functions.WarcOps.warcRecords(col("warc"))).as("r"))
      .select(col("source"), col("r.url").as("url"),
        graft.functions.WarcOps.httpPayloadEncoding(col("r.body")).as("enc"),
        graft.functions.WarcOps.httpPayloadText(col("r.body")).as("text_out"))
  val warcBrSql: String =
    """SELECT source,
      |       'https://' || source || '/page/' || CAST(doc_id AS VARCHAR) AS url,
      |       CASE WHEN doc_id % 5 < 4 THEN 'br' ELSE 'identity' END AS enc,
      |       CASE doc_id % 5
      |         WHEN 0 THEN repeat('brotli battery zero: the committee of the government distributed photographs of the committee. ', 3)
      |         WHEN 1 THEN repeat('brotli battery one: data processing at scale requires careful attention to the processing of data. ', 3)
      |         WHEN 2 THEN repeat('brotli battery two: repeated phrases compress well because repeated phrases compress well indeed. ', 3)
      |         WHEN 3 THEN repeat('brotli battery three: information about the development of the international information system. ', 3)
      |         ELSE text END AS text_out
      |FROM documents""".stripMargin

  // ------------------------------------------------------------ q_http_dispatch
  /** The HTTP wire-shape matrix a crawl archive actually stores:
    * bodies cycle through gzip / deflate / identity content encodings,
    * each with and without REAL `Transfer-Encoding: chunked` framing
    * (multi-chunk, odd sizes, a chunk extension on the first chunk) —
    * built by `synth_http_response` with the JDK's real gzip/zlib
    * encoders, peeled back by `http_payload_text` (chunked first, then
    * content-encoding, per HTTP semantics) under the hash gate. The
    * br branch is gated separately in `q_warc_br` (brotli is
    * decode-only here, so its bodies come from the pinned battery).
    */
  val httpDispatch: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .withColumn("idx", (col("doc_id") % 6).cast("int"))
      .withColumn("enc", element_at(
        array(lit("identity"), lit("gzip"), lit("deflate"),
          lit("identity"), lit("gzip"), lit("deflate")), col("idx") + 1))
      .withColumn("chunked", col("idx") >= 3)
      .withColumn("http", graft.functions.WarcOps.synthHttpResponse(
        col("text"), col("enc"), col("chunked")))
      .select(col("doc_id"),
        graft.functions.WarcOps.httpPayloadEncoding(col("http")).as("enc"),
        col("chunked"),
        graft.functions.WarcOps.httpPayloadText(col("http")).as("text_out"))
  val httpDispatchSql: String =
    """SELECT doc_id,
      |       CASE doc_id % 3 WHEN 0 THEN 'identity' WHEN 1 THEN 'gzip' ELSE 'deflate' END AS enc,
      |       doc_id % 6 >= 3 AS chunked,
      |       text AS text_out
      |FROM documents""".stripMargin

  /** WET extract ingestion (the Common-Crawl text-extract form —
    * same WARC framing, `conversion` records whose bodies are already
    * plain text, fronted by a `warcinfo` record): documents group into
    * per-source `.wet.gz` segments, parse back through
    * `warc_records`, keep conversion payloads, and carry the
    * segment-level `wet_text` one-shot extraction alongside — the
    * record grain AND the dispatch projection under one hash. Oracle:
    * identity on documents plus a windowed reconstruction of the
    * joined segment text length.
    */
  val wetText: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), struct(
        lit("conversion").as("rec_type"),
        concat(lit("https://"), col("source"), lit("/doc/"), col("doc_id")).as("url"),
        concat(lit("2026-02-0"), (col("doc_id") % 9 + 1).cast("string"),
          lit("T00:00:00Z")).as("date"),
        col("text").as("body")).as("rec"))
      .groupBy("source").agg(sort_array(collect_list(struct(col("doc_id"), col("rec")))).as("rs"))
      // Every per-segment value below rides through a one-element
      // explode (a Generate projections cannot collapse through — the
      // jsonExtract treatment): without the barriers, CollapseProject
      // inlines the build-segment + parse chain into the projection
      // ABOVE the record explode and the whole segment re-parses once
      // per OUTPUT row — measured 12.4 s → 0.4 s at sf0.1 and 13.7×
      // → linear growth at ×4 (PERF.md round-14).
      .select(col("source"), explode(array(graft.functions.WarcOps.synthWarcGz(concat(
        array(struct(lit("warcinfo").as("rec_type"),
          concat(lit("https://"), col("source")).as("url"),
          lit("2026-02-01T00:00:00Z").as("date"),
          lit("software: graft-wet/1.0").as("body"))),
        col("rs.rec"))))).as("wet"))
      .select(col("source"), explode(array(struct(
        length(graft.functions.WarcOps.wetText(col("wet"))).cast("long").as("wet_len"),
        graft.functions.WarcOps.warcRecords(col("wet")).as("recs")))).as("seg"))
      .select(col("source"), col("seg.wet_len").as("wet_len"),
        explode(col("seg.recs")).as("r"))
      .filter(col("r.rec_type") === "conversion")
      .select(col("source"), col("wet_len"), col("r.url").as("url"),
        col("r.date").as("date"), decode(col("r.body"), "UTF-8").as("text_out"),
        length(col("r.body")).cast("long").as("n_bytes"))
  val wetTextSql: String =
    """SELECT source,
      |       CAST(SUM(length(text) + 1) OVER (PARTITION BY source) - 1 AS BIGINT) AS wet_len,
      |       'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
      |       '2026-02-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || 'T00:00:00Z' AS date,
      |       text AS text_out,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- url fetch
  /** S7's URL fetch through the oracle gate: urls synthesized from
    * customer keys (every 11th null — reference empty-url semantics;
    * every 7th a dead link — per-row error capture), fetched with the
    * deterministic echo transport whose result is derivable from the
    * url alone, so DuckDB reproduces content md5/length, content type
    * and the exact error string without any network.
    */
  val urlFetch: Q = (s, d) => {
    import s.implicits._
    val base = "https://cdn.example/asset/"
    val rows = Tables.customer(s, d).select(col("c_custkey").as("id"),
      when(col("c_custkey") % 11 === 0, lit(null).cast("string"))
        .when(col("c_custkey") % 7 === 0,
          concat(lit(base), col("c_custkey").cast("string"), lit("/dead")))
        .otherwise(concat(lit(base), col("c_custkey").cast("string"))).as("url"))
      .as[UrlFetch.UrlRow]
    UrlFetch.fetchAll(rows, "echo")
      .select(col("id"), col("url"), col("content_type"), col("fetch_error"),
        md5(col("content")).as("content_md5"),
        length(col("content")).cast("long").as("n_bytes"))
  }
  val urlFetchSql: String =
    """SELECT c_custkey AS id, url,
      |  CASE WHEN url IS NULL OR url LIKE '%/dead' THEN NULL
      |       ELSE 'application/octet-stream' END AS content_type,
      |  CASE WHEN url LIKE '%/dead' THEN 'IOException: refused ' || url END AS fetch_error,
      |  CASE WHEN url IS NULL THEN md5('')
      |       WHEN url LIKE '%/dead' THEN NULL
      |       ELSE md5('payload:' || url) END AS content_md5,
      |  CAST(CASE WHEN url IS NULL THEN 0
      |            WHEN url LIKE '%/dead' THEN NULL
      |            ELSE 8 + length(url) END AS BIGINT) AS n_bytes
      |FROM (SELECT c_custkey,
      |        CASE WHEN c_custkey % 11 = 0 THEN NULL
      |             WHEN c_custkey % 7 = 0
      |               THEN 'https://cdn.example/asset/' || CAST(c_custkey AS VARCHAR) || '/dead'
      |             ELSE 'https://cdn.example/asset/' || CAST(c_custkey AS VARCHAR) END AS url
      |      FROM customer)""".stripMargin

  // ---------------------------------------------------------------- z-order
  /** The morton value driving [[graft.sources.Layout.zOrdered]] over the
    * natural (user, day-of-month) skipping dimensions of events; the
    * layout property itself (per-file span shrinkage) is asserted in
    * LayoutSpec — the oracle checks the bit arithmetic.
    */
  val zorder: Q = (s, d) =>
    Tables.events(s, d).select(col("event_id"),
      graft.sources.Layout.zValue(col("user_id"), dayofmonth(col("ts")), 8).as("z"))
  val zorderSql: String =
    s"""SELECT event_id,
       |       ${graft.sources.Layout.zValueSql("user_id", "day(CAST(ts AS TIMESTAMP))", 8)} AS z
       |FROM events""".stripMargin

  // ---------------------------------------------------------------- user features
  /** Per-user sequential feature engineering — the feature-store shape
    * for behavioral training data: event order within user, previous
    * event type, inter-event gap, and a 3-event rolling sum. Exact
    * integer features only (epoch micros, value in micro-units): frame
    * sums are long additions, so the rolling window hash-gates where a
    * double mean would not. The window partitions by user — the same
    * per-key bound every sessionization op in the suite carries.
    */
  val userFeatures: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("_ts_us"), col("event_type"),
      round(col("value") * 1000000).cast("long").as("_value_u"))
    val w = Window.partitionBy("user_id").orderBy(col("_ts_us"), col("event_id"))
    val w3 = w.rowsBetween(-2, 0)
    ev.select(col("event_id"), col("user_id"),
      row_number().over(w).cast("long").as("seq"),
      lag(col("event_type"), 1).over(w).as("prev_type"),
      (col("_ts_us") - lag(col("_ts_us"), 1).over(w)).as("gap_us"),
      sum("_value_u").over(w3).as("sum3_u"),
      count(lit(1)).over(w3).as("n3"))
  }
  val userFeaturesSql: String =
    """WITH f AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |                  event_type, CAST(round(value * 1000000) AS BIGINT) AS value_u
      |           FROM events)
      |SELECT event_id, user_id,
      |       CAST(row_number() OVER w AS BIGINT) AS seq,
      |       lag(event_type, 1) OVER w AS prev_type,
      |       ts_us - lag(ts_us, 1) OVER w AS gap_us,
      |       CAST(sum(value_u) OVER w3 AS BIGINT) AS sum3_u,
      |       CAST(count(*) OVER w3 AS BIGINT) AS n3
      |FROM f
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id),
      |       w3 AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- fk audit
  /** Referential-integrity audit across the star schema: orphan
    * foreign keys per relationship (rows whose FK matches no parent),
    * each a left-anti join + count — the data-quality gate a
    * warehouse runs after every load. Anti-joins shuffle on the key
    * and the parent side is the smaller table (broadcast under AQE);
    * output is one row per relationship, so the report is constant-
    * size at any corpus scale.
    */
  val fkAudit: Q = (s, d) => {
    def orphans(rel: String, child: DataFrame, fk: String,
                parent: DataFrame, pk: String): DataFrame =
      child.select(col(fk).as("_k"))
        .join(parent.select(col(pk).as("_k")), Seq("_k"), "left_anti")
        .agg(lit(rel).as("relationship"), count(lit(1)).as("n_orphans"))
    Seq(
      orphans("orders->customer", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey"),
      orphans("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey"),
      orphans("lineitem->part", Tables.lineitem(s, d), "l_partkey",
        Tables.part(s, d), "p_partkey"),
      orphans("lineitem->supplier", Tables.lineitem(s, d), "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"),
      orphans("customer->nation", Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey"),
      orphans("nation->region", Tables.nation(s, d), "n_regionkey",
        Tables.region(s, d), "r_regionkey"),
      orphans("supplier->nation", Tables.supplier(s, d), "s_nationkey",
        Tables.nation(s, d), "n_nationkey")
    ).reduce(_ unionByName _)
  }
  val fkAuditSql: String =
    """SELECT 'orders->customer' AS relationship,
      |       (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |         (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_orphans
      |UNION ALL SELECT 'lineitem->orders',
      |       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |         (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |UNION ALL SELECT 'lineitem->part',
      |       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |         (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
      |UNION ALL SELECT 'lineitem->supplier',
      |       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |         (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
      |UNION ALL SELECT 'customer->nation',
      |       (SELECT count(*) FROM customer c WHERE NOT EXISTS
      |         (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
      |UNION ALL SELECT 'nation->region',
      |       (SELECT count(*) FROM nation x WHERE NOT EXISTS
      |         (SELECT 1 FROM region r WHERE r.r_regionkey = x.n_regionkey))
      |UNION ALL SELECT 'supplier->nation',
      |       (SELECT count(*) FROM supplier s WHERE NOT EXISTS
      |         (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))""".stripMargin

  // ---------------------------------------------------------------- jsonl round trip
  /** JSONL egress → ingest round trip — the interchange format
    * training-data pipelines actually exchange (one JSON object per
    * line, splittable, schema-on-read): the documents table is written
    * as JSON lines to a scratch dir, read back through an explicit
    * schema, and aggregated per source. The oracle aggregates the
    * PARQUET table directly, so any loss in the round trip (encoding,
    * escaping, null handling, numeric text) flips the hash.
    */
  /** One OVERWRITTEN scratch dir per (jvm tmp, Spark application, sf
    * dir): stable within a session (repeated bench/verify runs reuse
    * it instead of littering a corpus-sized copy per invocation) but
    * unique across concurrent applications, so two runs over the same
    * dataset can never overwrite-then-read each other's half-written
    * copy.
    */
  private def scratchDir(s: SparkSession, kind: String, d: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_" + kind + "_" + s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_") +
        "_" + d.replaceAll("[^a-zA-Z0-9]", "_")).getAbsolutePath

  val jsonlRoundtrip: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val path = scratchDir(s, "jsonl", d)
    docs.write.mode("overwrite").json(path)
    s.read.schema(docs.schema).json(path)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"),
        countDistinct("lang").as("n_langs"))
  }
  val jsonlRoundtripSql: String =
    """SELECT source, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
      |       min(doc_id) AS min_id, max(doc_id) AS max_id,
      |       count(DISTINCT lang) AS n_langs
      |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- orc round trip
  /** ORC egress → ingest round trip — the second columnar format large
    * warehouses actually exchange. Same gate shape as
    * [[jsonlRoundtrip]]: any loss (type mapping, nulls, unicode)
    * against the parquet-read oracle flips the hash. Grouped by lang
    * so the two roundtrips don't share an aggregation plan.
    */
  val orcRoundtrip: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val path = scratchDir(s, "orc", d)
    docs.write.mode("overwrite").orc(path)
    s.read.orc(path)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"),
        countDistinct("source").as("n_sources"))
  }
  val orcRoundtripSql: String =
    """SELECT lang, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
      |       count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- avro round trip
  /** Avro object-container round trip ([[graft.sources.AvroCodec]]) —
    * the remaining common interchange format, produced and parsed
    * pure-JVM from the public spec. Each document carries a REAL
    * container (zigzag varints, union-prefixed nullable strings,
    * little-endian doubles, 2-record blocks, seed-derived sync
    * markers; RAW-deflate codec on odd ids) and every surfaced
    * aggregate is a closed-form function of doc_id. Scores compare as
    * exact integers (score·4 is integral by construction), so no
    * float summation rides the gate. A varint slip, a union-index
    * bug, a block-boundary error or a sync mismatch flips a row.
    */
  val avroRoundtrip: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("avro", graft.functions.AvroOps.synthAvro(col("doc_id") * 61,
        (col("doc_id") % 5 + 2).cast("int")))
      .withColumn("meta", graft.functions.AvroOps.avroMeta(col("avro")))
      .withColumn("recs", graft.functions.AvroOps.avroRecords(col("avro")))
      .select(col("doc_id"),
        col("meta.schema_name").as("schema_name"),
        col("meta.codec").as("codec"),
        col("meta.n_blocks").as("n_blocks"),
        col("meta.n_records").as("n_records"),
        aggregate(transform(col("recs"), r => r.getField("id")),
          lit(0L), (a, x) => a + x).as("sum_id"),
        size(filter(col("recs"), r => r.getField("name").isNull)).cast("long")
          .as("n_null_names"),
        array_join(transform(filter(col("recs"), r => r.getField("name").isNotNull),
          r => r.getField("name")), ",").as("name_cat"),
        aggregate(transform(col("recs"),
          r => (r.getField("score") * 4).cast("long")), lit(0L), (a, x) => a + x)
          .as("sum_score4"),
        size(filter(col("recs"), r => r.getField("flag"))).cast("long").as("n_flags"),
        aggregate(transform(col("recs"), r => r.getField("payload_sum")),
          lit(0L), (a, x) => a + x).as("sum_payload"))
  val avroRoundtripSql: String =
    """WITH p AS (
      |  SELECT doc_id, doc_id * 61 AS seed, doc_id % 5 + 2 AS n FROM documents),
      |names AS (
      |  SELECT p.doc_id, string_agg('n' || (p.seed + i.i), ',' ORDER BY i.i) AS cat
      |  FROM p, range(0, 7) i(i) WHERE i.i < p.n AND i.i % 3 <> 0 GROUP BY 1)
      |SELECT p.doc_id,
      |       'doc' AS schema_name,
      |       CASE WHEN p.doc_id % 2 = 1 THEN 'deflate' ELSE 'null' END AS codec,
      |       CAST((p.n + 1) // 2 AS BIGINT) AS n_blocks,
      |       CAST(p.n AS BIGINT) AS n_records,
      |       CAST(p.seed * 10 * p.n + p.n * (p.n - 1) // 2 AS BIGINT) AS sum_id,
      |       CAST((p.n + 2) // 3 AS BIGINT) AS n_null_names,
      |       coalesce(names.cat, '') AS name_cat,
      |       CAST(4 * p.seed * p.n + p.n * (p.n - 1) // 2 AS BIGINT) AS sum_score4,
      |       CAST((p.n + 1) // 2 AS BIGINT) AS n_flags,
      |       CAST(p.n * (p.n - 1) // 2 + p.n * (p.seed % 251 + 7) AS BIGINT) AS sum_payload
      |FROM p LEFT JOIN names USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------- csv round trip
  /** CSV egress → ingest round trip with the hard parts ON: document
    * text carries embedded newlines, quotes and commas, so the writer
    * must quote/escape and the reader must run multiLine record
    * assembly (a naive line-splitter corrupts the corpus silently —
    * this gate catches exactly that). `nullValue=\N` disambiguates
    * NULL from empty string, the classic CSV loss. Oracle aggregates
    * the parquet table directly.
    */
  val csvRoundtrip: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val path = scratchDir(s, "csv", d)
    docs.write.mode("overwrite")
      .option("header", "true").option("nullValue", "\\N").option("escape", "\"")
      .csv(path)
    s.read.schema(docs.schema)
      .option("header", "true").option("nullValue", "\\N").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_text_len"),
        sum(when(col("text").contains("\n"), 1L).otherwise(0L)).as("n_multiline"),
        min("doc_id").as("min_id"))
  }
  val csvRoundtripSql: String =
    """SELECT source, count(*) AS n_docs,
      |       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
      |       CAST(sum(CASE WHEN contains(text, chr(10)) THEN 1 ELSE 0 END) AS BIGINT) AS n_multiline,
      |       min(doc_id) AS min_id
      |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- schema evolution
  /** Schema drift across parquet generations — the 100 TB reality that
    * a corpus is written over months by evolving jobs: generation 1
    * lacks the `lang` column, generation 2 carries it. The read side
    * must union BY NAME (`mergeSchema`), serving nulls for columns a
    * file predates, and partition discovery must type the `gen` dir
    * key. The oracle recomputes the same split from the source table,
    * so a mis-merged schema (column collapse, wrong null fill) flips
    * the hash. At scale, mergeSchema's footer-sampling cost is paid
    * once per read, not per file — the layout itself stays splittable.
    */
  val schemaEvolution: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val root = scratchDir(s, "schemaevo", d)
    // gen 1: the original writer's narrow schema (even ids)
    docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(root + "/gen=1")
    // gen 2: the evolved writer adds `lang` (odd ids)
    docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "source", "n_chars", "lang")
      .write.mode("overwrite").parquet(root + "/gen=2")
    s.read.option("mergeSchema", "true").parquet(root)
      .withColumn("gen", col("gen").cast("int"))
      .groupBy("gen")
      .agg(count(lit(1)).as("n_docs"),
        count(col("lang")).as("n_with_lang"),
        sum("n_chars").as("sum_chars"),
        countDistinct("source").as("n_sources"))
  }
  val schemaEvolutionSql: String =
    """SELECT CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INTEGER) AS gen,
      |       count(*) AS n_docs,
      |       count(CASE WHEN doc_id % 2 = 1 THEN lang END) AS n_with_lang,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       count(DISTINCT source) AS n_sources
      |FROM documents
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- snapshot diff
  /** Corpus-refresh audit: what changed between snapshot A and B?
    * Each side is projected to (id, xxhash64(text)) BEFORE the join, so
    * the full-outer equi-join shuffles 16 bytes per row — the wide text
    * column never rides the exchange; at 100 TB that is the difference
    * between diffing ids and re-shipping the corpus. The oracle
    * compares text equality directly (DuckDB has no xxhash64) — the
    * two agree except under a 64-bit hash collision, which is the same
    * trade a production snapshot differ makes.
    */
  val snapshotDiff: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val root = scratchDir(s, "snapdiff", d)
    docs.filter(col("doc_id") <= 400).select("doc_id", "text")
      .write.mode("overwrite").parquet(root + "/snap_a")
    docs.filter(col("doc_id").between(201, 600))
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit("!")))
          .otherwise(col("text")).as("text"))
      .write.mode("overwrite").parquet(root + "/snap_b")
    val a = s.read.parquet(root + "/snap_a")
      .select(col("doc_id"), xxhash64(col("text")).as("h_a"))
    val b = s.read.parquet(root + "/snap_b")
      .select(col("doc_id"), xxhash64(col("text")).as("h_b"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h_a").isNull, "added")
          .when(col("h_b").isNull, "removed")
          .when(col("h_a") =!= col("h_b"), "changed")
          .otherwise("unchanged"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_rows"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
  }
  val snapshotDiffSql: String =
    """WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id <= 400),
      |     b AS (SELECT doc_id,
      |                  CASE WHEN doc_id % 7 = 0 THEN text || '!' ELSE text END AS text
      |           FROM documents WHERE doc_id BETWEEN 201 AND 600),
      |     j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |                  CASE WHEN a.doc_id IS NULL THEN 'added'
      |                       WHEN b.doc_id IS NULL THEN 'removed'
      |                       WHEN a.text IS DISTINCT FROM b.text THEN 'changed'
      |                       ELSE 'unchanged' END AS status
      |           FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      |SELECT status, count(*) AS n_rows, min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM j GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- table profiling
  /** One-pass profile of the orders table (columns restricted to types
    * whose string rendering agrees across engines: longs and strings —
    * double/timestamp formatting diverges and belongs to unit tests).
    */
  private val ProfileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
  val profileTable: Q = (s, d) =>
    graft.operators.Profile.profile(Tables.orders(s, d), ProfileCols)
  val profileTableSql: String = ProfileCols.map { c =>
    s"""SELECT '$c' AS column_name,
       |       count(*) FILTER (WHERE $c IS NULL) AS n_nulls,
       |       count(DISTINCT $c) AS n_distinct,
       |       CAST(min($c) AS VARCHAR) AS min_value,
       |       CAST(max($c) AS VARCHAR) AS max_value
       |FROM orders""".stripMargin
  }.mkString("\nUNION ALL\n")

  // ---------------------------------------------------------------- S1/S5 DSv2 connector
  /** The `graft-items` DataSource V2 connector under the oracle gate:
    * a deterministic customer-derived cell set is loaded into the
    * in-JVM store (the collect is the harness stand-in for the external
    * API's own data; production reads hit the API from executors), then
    * read back THROUGH the connector with by-id + column predicates —
    * which push into the scan (plan-asserted in ItemsSourceSpec) rather
    * than filtering after a full read.
    */
  val itemsConnector: Q = (s, d) => {
    import graft.sources.v2.{ItemsSource, ItemsStore}
    val store = ("q_items_" + d).replaceAll("[^a-zA-Z0-9]", "_")
    // Seed-once, keyed by store name: the collect is the harness
    // stand-in for the external system's own data and runs at most once
    // per JVM — the query body itself is a pure read-through-connector
    // (Bench/Verify re-invocations hit the already-seeded store).
    ItemsStore.seedOnce(store) {
      Tables.customer(s, d).filter(col("c_custkey") <= 500)
        .select(col("c_custkey").as("item_id"),
          concat(lit("col"), pmod(col("c_custkey"), lit(3))).as("column_id"),
          col("c_name").as("text"),
          (col("c_custkey") * 100).as("created_at"))
        .collect().map(r =>
          ItemsStore.Cell(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    s.read.format(ItemsSource.ShortName).option("store", store).load()
      .filter(col("item_id").isin((1L to 40L).map(java.lang.Long.valueOf): _*) &&
        col("column_id") === "col1")
  }
  val itemsConnectorSql: String =
    """SELECT c_custkey AS item_id,
      |       'col' || CAST(c_custkey % 3 AS VARCHAR) AS column_id,
      |       c_name AS text,
      |       c_custkey * 100 AS created_at
      |FROM customer
      |WHERE c_custkey <= 500 AND c_custkey BETWEEN 1 AND 40 AND c_custkey % 3 = 1""".stripMargin

  /** Aggregate pushdown through the connector (same seeded store as
    * [[itemsConnector]]): the group-by COUNT/MIN/MAX is pushed
    * COMPLETELY into the source — the "API" answers the count query,
    * Spark plans no aggregate at all (plan-asserted in
    * ItemsSourceSpec; PushdownSpec sweeps this plan too). At 100 TB
    * this is per-group numbers over the wire instead of every cell.
    */
  val itemsAgg: Q = (s, d) => {
    import graft.sources.v2.{ItemsSource, ItemsStore}
    val store = ("q_items_" + d).replaceAll("[^a-zA-Z0-9]", "_")
    ItemsStore.seedOnce(store) {
      Tables.customer(s, d).filter(col("c_custkey") <= 500)
        .select(col("c_custkey").as("item_id"),
          concat(lit("col"), pmod(col("c_custkey"), lit(3))).as("column_id"),
          col("c_name").as("text"),
          (col("c_custkey") * 100).as("created_at"))
        .collect().map(r =>
          ItemsStore.Cell(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    s.read.format(ItemsSource.ShortName).option("store", store).load()
      .groupBy("column_id")
      .agg(count(lit(1)).as("n_cells"),
        min(col("item_id")).as("min_item"),
        max(col("item_id")).as("max_item"),
        count(col("text")).as("n_text"))
  }
  val itemsAggSql: String =
    """SELECT 'col' || CAST(c_custkey % 3 AS VARCHAR) AS column_id,
      |       count(*) AS n_cells,
      |       min(c_custkey) AS min_item,
      |       max(c_custkey) AS max_item,
      |       count(c_name) AS n_text
      |FROM customer
      |WHERE c_custkey <= 500
      |GROUP BY 1""".stripMargin

  /** The connector WRITE path under the driver gate: cells derived from
    * orders are written THROUGH `graft-items` (idempotent keyed
    * upserts) and read back through the same connector. The write
    * happens once per JVM (store-existence guard) and is idempotent
    * anyway — re-invocation re-applies identical upserts — so Bench's
    * double run and Verify see the same store. The derivation is
    * pre-reduced to UNIQUE (item, column) keys before writing: with
    * colliding keys the surviving cell would depend on task completion
    * order (concurrent upserters), which no oracle can predict —
    * duplicate-collapse semantics are exercised deterministically in
    * ItemsSourceSpec instead. A hash match proves the write→read round
    * trip through the V2 surface is lossless.
    */
  val itemsWrite: Q = (s, d) => {
    import graft.sources.v2.{ItemsSource, ItemsStore}
    val store = ("q_items_wr_" + d).replaceAll("[^a-zA-Z0-9]", "_")
    if (ItemsStore.get(store).isEmpty) {
      val src = Tables.orders(s, d).filter(col("o_orderkey") <= 400)
        .select((col("o_orderkey") % 100).as("item_id"),
          concat(lit("col"), pmod(col("o_orderkey"), lit(2))).as("column_id"),
          col("o_orderstatus").as("text"),
          col("o_orderkey").as("created_at"))
      Picks.pickTop1(src, Seq(col("item_id"), col("column_id")),
          Seq(col("created_at").desc))
        .write.format(ItemsSource.ShortName).option("store", store).mode("append").save()
    }
    s.read.format(ItemsSource.ShortName).option("store", store).load()
  }
  val itemsWriteSql: String =
    """SELECT item_id, column_id, text, created_at
      |FROM (SELECT o_orderkey % 100 AS item_id,
      |             'col' || CAST(o_orderkey % 2 AS VARCHAR) AS column_id,
      |             o_orderstatus AS text,
      |             o_orderkey AS created_at,
      |             row_number() OVER (PARTITION BY o_orderkey % 100, o_orderkey % 2
      |                                ORDER BY o_orderkey DESC) AS rn
      |      FROM orders WHERE o_orderkey <= 400)
      |WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- F7 structure lot
  private val LotNumber = 7
  private val StartId = 3L

  private def clients(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_custkey") <= 5)
      .select(col("c_custkey").as("id_monday"), col("c_name").as("nomcomplet"))

  val structureLot: Q = (s, d) =>
    Structure.lotStructure(clients(s, d), LotNumber, StartId)
      .select("lot_name", "auto_id", "id_monday", "dossier",
        "section_name", "slot_name", "column_id")

  private def templateValuesSql: String =
    Structure.Template.flatMap { case (sec, slots) =>
      if (slots.isEmpty) Seq(s"('$sec', NULL, NULL)")
      else slots.map { case (slot, cid) => s"('$sec', '$slot', '$cid')" }
    }.mkString(",\n  ")

  val structureLotSql: String =
    s"""WITH clients AS (SELECT c_custkey AS id_monday, c_name AS nomcomplet
       |                 FROM customer WHERE c_custkey <= 5),
       |numbered AS (SELECT *, $StartId + row_number() OVER (ORDER BY id_monday) - 1 AS auto_id
       |             FROM clients),
       |t(sec_suffix, slot_suffix, column_id) AS (VALUES
       |  $templateValuesSql)
       |SELECT 'CLM_GE_0$LotNumber' AS lot_name, auto_id, id_monday,
       |       'ACT_' || auto_id || '_' || regexp_replace(upper(trim(nomcomplet)), '\\s+', '_', 'g') AS dossier,
       |       'E' || auto_id || '-' || sec_suffix AS section_name,
       |       CASE WHEN slot_suffix IS NOT NULL THEN 'E' || auto_id || '-' || slot_suffix END AS slot_name,
       |       column_id
       |FROM numbered CROSS JOIN t""".stripMargin

  // ---------------------------------------------------------------- J4/K5 upload plan
  private val ColIds: Seq[String] = Structure.Template.flatMap(_._2.map(_._2))

  private def pool(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_custkey") <= 5).select(
      col("o_custkey").as("item_id"),
      element_at(typedlit(ColIds), (pmod(col("o_orderkey"), lit(ColIds.size)) + 1).cast("int")).as("column_id"),
      col("o_orderkey").as("asset_id"),
      concat(lit("file_"), col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, ".pdf")
          .when(col("o_orderkey") % 3 === 1, ".jpg")
          .otherwise(".xlsx")).as("name"),
      pmod(col("o_orderkey") * 37, lit(9973)).as("created_at"))

  val uploadPlan: Q = (s, d) =>
    Structure.uploadPlan(
      Structure.lotStructure(clients(s, d), LotNumber, StartId),
      pool(s, d))
      .select("id_monday", "column_id", "section_name", "slot_name",
        "asset_id", "name", "created_at", "upload_name")

  val uploadPlanSql: String = {
    val colList = ColIds.map(c => s"'$c'").mkString("[", ", ", "]")
    val sanitize = (x: String) =>
      s"""trim(regexp_replace(regexp_replace($x, '[\\\\/:*?"<>|]', '-', 'g'), '\\s+', ' ', 'g'))"""
    s"""WITH clients AS (SELECT c_custkey AS id_monday, c_name AS nomcomplet
       |                 FROM customer WHERE c_custkey <= 5),
       |numbered AS (SELECT *, $StartId + row_number() OVER (ORDER BY id_monday) - 1 AS auto_id
       |             FROM clients),
       |t(sec_suffix, slot_suffix, column_id) AS (VALUES
       |  $templateValuesSql),
       |slots AS (
       |  SELECT id_monday, 'E' || auto_id || '-' || sec_suffix AS section_name,
       |         'E' || auto_id || '-' || slot_suffix AS slot_name, column_id
       |  FROM numbered CROSS JOIN t
       |  WHERE slot_suffix IS NOT NULL
       |    AND trim(regexp_replace(lower(strip_accents('E' || auto_id || '-' || slot_suffix)), '\\s+', ' ', 'g'))
       |        NOT LIKE '%excel%'),
       |pool AS (
       |  SELECT o_custkey AS item_id,
       |         $colList[CAST(o_orderkey % ${ColIds.size} AS INTEGER) + 1] AS column_id,
       |         o_orderkey AS asset_id,
       |         'file_' || o_orderkey ||
       |           (CASE CAST(o_orderkey % 3 AS INTEGER) WHEN 0 THEN '.pdf' WHEN 1 THEN '.jpg' ELSE '.xlsx' END) AS name,
       |         (o_orderkey * 37) % 9973 AS created_at
       |  FROM orders WHERE o_custkey <= 5),
       |joined AS (
       |  SELECT s.id_monday, s.column_id, s.section_name, s.slot_name,
       |         p.asset_id, p.name, p.created_at
       |  FROM slots s LEFT JOIN pool p
       |    ON s.id_monday = p.item_id AND s.column_id = p.column_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY id_monday, column_id
       |                               ORDER BY created_at DESC, asset_id) - 1 AS idx
       |  FROM joined)
       |SELECT id_monday, column_id, section_name, slot_name, asset_id, name, created_at,
       |       CASE WHEN asset_id IS NOT NULL THEN ${sanitize(
              """slot_name || (CASE WHEN idx > 0 THEN '_' || idx ELSE '' END) ||
                |           (CASE WHEN lower(name) LIKE '%.pdf' THEN '.pdf'
                |                 WHEN lower(name) LIKE '%.jpg' THEN '.jpg'
                |                 WHEN lower(name) LIKE '%.xlsx' THEN '.xlsx' ELSE '.bin' END)""".stripMargin)}
       |       END AS upload_name
       |FROM ranked""".stripMargin
  }

  // ---------------------------------------------------------------- S9/P6 folder listing
  private def folders(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(
      col("s_suppkey").as("folder_id"),
      concat(lit("ACT_"), pmod(col("s_suppkey"), lit(40)), lit("_D")).as("name"),
      pmod(col("s_nationkey"), lit(5)).as("parent_id"),
      when(col("s_suppkey") % 4 === 0, "application/vnd.google-apps.folder")
        .otherwise("application/pdf").as("mime_type"),
      (col("s_suppkey") % 7 === 0).as("trashed"),
      pmod(col("s_suppkey") * 13, lit(10007)).as("created_time"))

  /** S9/P6/W5: the drive listing predicate conjunction
    * (`'p' in parents and mimeType=folder and trashed=false`,
    * `Leyton_depot.py:424-430`) + K3's oldest-wins duplicate collapse.
    */
  val folderListing: Q = (s, d) =>
    Picks.pickTop1(
      folders(s, d).filter(
        col("parent_id") === 2 &&
          col("mime_type") === "application/vnd.google-apps.folder" &&
          !col("trashed")),
      Seq(col("parent_id"), col("name")),
      Seq(col("created_time").asc, col("folder_id")))
      .select("folder_id", "name", "parent_id", "created_time")
  val folderListingSql: String =
    """WITH folders AS (
      |  SELECT s_suppkey AS folder_id,
      |         'ACT_' || (s_suppkey % 40) || '_D' AS name,
      |         s_nationkey % 5 AS parent_id,
      |         CASE WHEN s_suppkey % 4 = 0 THEN 'application/vnd.google-apps.folder'
      |              ELSE 'application/pdf' END AS mime_type,
      |         s_suppkey % 7 = 0 AS trashed,
      |         (s_suppkey * 13) % 10007 AS created_time
      |  FROM supplier),
      |listed AS (
      |  SELECT * FROM folders
      |  WHERE parent_id = 2 AND mime_type = 'application/vnd.google-apps.folder' AND NOT trashed)
      |SELECT folder_id, name, parent_id, created_time
      |FROM (SELECT *, row_number() OVER (PARTITION BY parent_id, name
      |                                   ORDER BY created_time ASC, folder_id) AS rn
      |      FROM listed)
      |WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- S2 EAV lookup
  /** S2 multi-column lookup against an EAV cell relation (the
    * reference's `get_columns_values`, `Leyton_depot.py:169-188`):
    * item-id pushdown + column-id pruning over (item, column, text).
    */
  private def eavCells(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey").as("item_id"), explode(array(
      struct(lit("name").as("column_id"), col("c_name").as("text")),
      struct(lit("segment").as("column_id"), col("c_mktsegment").as("text")),
      struct(lit("nation").as("column_id"), col("c_nationkey").cast("string").as("text"))
    )).as("cv"))
      .select(col("item_id"), col("cv.column_id").as("column_id"), col("cv.text").as("text"))

  val eavLookup: Q = (s, d) =>
    eavCells(s, d)
      .filter(col("item_id").isin(1L, 2L, 3L, 42L) && col("column_id").isin("name", "segment"))
  val eavLookupSql: String =
    """SELECT item_id, column_id, text FROM (
      |  SELECT c_custkey AS item_id, 'name' AS column_id, c_name AS text FROM customer
      |  UNION ALL SELECT c_custkey, 'segment', c_mktsegment FROM customer
      |  UNION ALL SELECT c_custkey, 'nation', CAST(c_nationkey AS VARCHAR) FROM customer)
      |WHERE item_id IN (1, 2, 3, 42) AND column_id IN ('name', 'segment')""".stripMargin

  /** EAV → wide materialization (the reference's "item with all its
    * column values" JSON shape): Spark `pivot` with an EXPLICIT value
    * list — never the value-discovering overload, which runs an extra
    * distinct job and breaks when a new column id appears between plan
    * and execute — and a `max` aggregate (deterministic under multiple
    * cells per (item, column), unlike `first`).
    */
  val eavPivot: Q = (s, d) =>
    eavCells(s, d).groupBy("item_id")
      .pivot("column_id", Seq("name", "segment", "nation"))
      .agg(max(col("text")))
  val eavPivotSql: String =
    """WITH eav AS (
      |  SELECT c_custkey AS item_id, 'name' AS column_id, c_name AS text FROM customer
      |  UNION ALL SELECT c_custkey, 'segment', c_mktsegment FROM customer
      |  UNION ALL SELECT c_custkey, 'nation', CAST(c_nationkey AS VARCHAR) FROM customer)
      |SELECT item_id,
      |       max(CASE WHEN column_id = 'name' THEN text END) AS name,
      |       max(CASE WHEN column_id = 'segment' THEN text END) AS segment,
      |       max(CASE WHEN column_id = 'nation' THEN text END) AS nation
      |FROM eav GROUP BY 1""".stripMargin

  /** The inverse direction (wide → EAV): `Dataset.unpivot` (Spark's
    * native melt — one Expand node, no union-of-selects re-scanning the
    * table per attribute). Attribute names are the source column names
    * on both engines.
    */
  val unpivot: Q = (s, d) =>
    Tables.orders(s, d)
      .unpivot(Array(col("o_orderkey")),
        Array(col("o_orderstatus"), col("o_orderpriority")), "attr", "val")
  val unpivotSql: String =
    """SELECT o_orderkey, attr, val
      |FROM (SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders)
      |UNPIVOT (val FOR attr IN (o_orderstatus, o_orderpriority))""".stripMargin

  /** Rolling per-customer spend over the last 4 orders (ROWS frame
    * moving aggregate). The frame sum runs on exact integer cents, so
    * partial-order differences between engines cannot drift the double.
    */
  val rolling: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-3, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      (sum(round(col("o_totalprice") * 100).cast("long")).over(w) / 100.0).as("rolling_spend"))
  }
  val rollingSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 AS rolling_spend
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- F13/F8 stamp + escape
  val stampFormat: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      graft.functions.StringOps.stampText(
        concat(lit("Signer "), col("o_custkey")),
        col("o_orderdate").cast("timestamp")).as("stamp"),
      graft.functions.StringOps.escapeForQ(
        concat(lit("name's "), col("o_orderpriority"))).as("escaped"))
  val stampFormatSql: String =
    """SELECT o_orderkey,
      |       'Firmado por: Signer ' || o_custkey || chr(10) || 'Fecha: ' ||
      |         strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS stamp,
      |       replace('name''s ' || o_orderpriority, '''', '\''') AS escaped
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- as-of join
  /** Point-in-time enrichment: each event picks the user's latest order
    * at-or-before the event time. The right side is deduped to one row
    * per (key, ts) first — both engines' tie choice would otherwise be
    * arbitrary. Oracle uses DuckDB's native ASOF LEFT JOIN.
    */
  val asofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
    val o = graft.operators.Picks.pickTop1(Tables.orders(s, d),
        Seq(col("o_custkey"), col("o_orderdate")), Seq(col("o_orderkey").desc))
      .select(col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").as("odate"),
        col("o_orderkey"), col("o_totalprice"))
    graft.operators.AsOf.join(ev, o, "user_id", "ts", "odate",
      Seq("o_orderkey", "o_totalprice"))
  }
  val asofJoinSql: String =
    """WITH ev AS (SELECT event_id, user_id, ts FROM events),
      |o1 AS (SELECT o_custkey AS user_id, CAST(o_orderdate AS TIMESTAMP) AS odate,
      |              o_orderkey, o_totalprice
      |       FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
      |                                          ORDER BY o_orderkey DESC) AS rn
      |             FROM orders) WHERE rn = 1)
      |SELECT ev.event_id, ev.user_id, CAST(ev.ts AS TIMESTAMP) AS ts,
      |       o1.o_orderkey, o1.o_totalprice
      |FROM ev ASOF LEFT JOIN o1 ON ev.user_id = o1.user_id AND ev.ts >= o1.odate""".stripMargin

  // ---------------------------------------------------------------- range join
  private val HourUs = 3600000000L
  /** Events landing inside the 1-hour window after each of the user's
    * PURCHASE events — the bucketed range join (no cross product; see
    * [[graft.operators.RangeJoin]]). Anchors and points both come from
    * the events table so the windows genuinely overlap the point stream
    * (the previous orders-anchored variant returned the empty set at
    * every SF — orders are 1995-2001, events 2024 — and an oracle match
    * on zero rows proves nothing about join semantics). Strict `>` on
    * the start keeps the anchor out of its own window.
    */
  val rangeJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("anchor_id"), col("user_id"),
        unix_micros(col("ts")).as("start_us"))
      .withColumn("end_us", col("start_us") + lit(HourUs))
    graft.operators.RangeJoin.pointInInterval(ev, p, "user_id", "ts_us", "start_us", "end_us", HourUs)
      .filter(col("ts_us") > col("start_us"))
      .select("event_id", "user_id", "ts_us", "anchor_id", "start_us")
  }
  val rangeJoinSql: String =
    s"""WITH ev AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
       |p AS (SELECT event_id AS anchor_id, user_id,
       |             epoch_us(CAST(ts AS TIMESTAMP)) AS start_us FROM events
       |      WHERE event_type = 'purchase')
       |SELECT ev.event_id, ev.user_id, ev.ts_us, p.anchor_id, p.start_us
       |FROM ev JOIN p ON ev.user_id = p.user_id
       |WHERE ev.ts_us > p.start_us AND ev.ts_us <= p.start_us + $HourUs""".stripMargin

  // ---------------------------------------------------------------- sessionize
  private val SessionGapUs = 1800000000L // 30 minutes
  /** Gap-based sessionization: a new session starts when the user's
    * inter-event gap exceeds 30 minutes; one lag + one running sum over
    * the same (user, ts) window, then a per-session rollup — the batch
    * analog of streaming session windows.
    */
  val sessionize: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("_prev", lag(col("ts_us"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col("ts_us") - col("_prev") > SessionGapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("session_start"), max("ts_us").as("session_end"))
  }
  val sessionizeSql: String =
    s"""WITH ev AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
       |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
       |                       OR ts_us - lag(ts_us) OVER w > $SessionGapUs THEN 1 ELSE 0 END AS new_s
       |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |se AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |       FROM g)
       |SELECT user_id, session_id, count(*) AS n_events,
       |       min(ts_us) AS session_start, max(ts_us) AS session_end
       |FROM se GROUP BY 1, 2""".stripMargin

  /** Deterministic grouped string aggregation: `collect_list` order is
    * partition-dependent, so the list is SORTED before joining — the
    * only way listagg-style output can hash-gate (and the right habit
    * anywhere results feed a diff or a cache key). Grain caveat applies
    * at scale: the per-group string is O(group size); keep the grain
    * bounded (here: a 50-key slice) or switch to top-k/sampling.
    */
  val stringAgg: Q = (s, d) =>
    Tables.customer(s, d).filter(col("c_custkey") <= 50)
      .groupBy("c_mktsegment")
      .agg(concat_ws("|", sort_array(collect_list(col("c_name")))).as("names"),
        count(lit(1)).as("n"))
  val stringAggSql: String =
    """SELECT c_mktsegment, string_agg(c_name, '|' ORDER BY c_name) AS names, count(*) AS n
      |FROM customer WHERE c_custkey <= 50 GROUP BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- skew salting
  /** The skew operators under the oracle gate: salting must be OUTPUT-
    * INVISIBLE (same rows as the plain join/agg — only the shuffle key
    * changes), so the oracle is simply the unsalted SQL. events is the
    * natural fixture: 15 users / 5 types over 10k+ rows — every key is
    * hot, exactly the shape AQE can't fix on a broadcast-ineligible
    * side. The agg sums integer cents so the two-phase sum-of-sums
    * cannot reassociate doubles.
    */
  val skewJoin: Q = (s, d) => {
    val events = Tables.events(s, d).select(col("event_id"), col("user_id"))
    val dim = Tables.customer(s, d).filter(col("c_custkey") <= 14)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    graft.operators.Skew.saltedJoin(events, dim, Seq("user_id"), salt = 8)
  }
  val skewJoinSql: String =
    """SELECT e.event_id, e.user_id, c.segment
      |FROM events e
      |JOIN (SELECT c_custkey AS user_id, c_mktsegment AS segment
      |      FROM customer WHERE c_custkey <= 14) c USING (user_id)""".stripMargin

  val skewAgg: Q = (s, d) =>
    graft.operators.Skew.saltedAgg(
      Tables.events(s, d).select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents")),
      Seq("event_type"), "cents", salt = 8)
  val skewAggSql: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- funnel/cohort
  private val FunnelStages = Seq("view", "click", "purchase")
  /** Ordered view→click→purchase conversion funnel over the event log. */
  val funnel: Q = (s, d) =>
    graft.operators.Funnel.funnel(Tables.events(s, d), "user_id", "event_type", "ts", FunnelStages)
  val funnelSql: String = graft.operators.Funnel.funnelSql(FunnelStages)

  /** Weekly cohort retention (first-event epoch-week × activity week). */
  val cohort: Q = (s, d) =>
    graft.operators.Funnel.cohortRetention(Tables.events(s, d), "user_id", "ts")
  val cohortSql: String = graft.operators.Funnel.cohortRetentionSql

  // ------------------------------------------------------- distinct sketch
  /** Bounded-state distinct users per event type: exact baseline +
    * 4096-slot linear-counting occupancy ([[graft.operators.Sketches]]).
    */
  private val SketchBins = 4096
  val distinctSketch: Q = (s, d) =>
    graft.operators.Sketches.distinctSketch(Tables.events(s, d),
      col("event_type"), col("user_id"), SketchBins)
  val distinctSketchSql: String =
    graft.operators.Sketches.distinctSketchSql("events", "event_type", "user_id", SketchBins)

  val queries: Map[String, Q] = Map(
    "q_funnel" -> funnel,
    "q_cohort" -> cohort,
    "q_distinct_sketch" -> distinctSketch,
    "q_skew_join" -> skewJoin,
    "q_skew_agg" -> skewAgg,
    "q_string_agg" -> stringAgg,
    "q_items_write" -> itemsWrite,
    "q_files_payload" -> filesPayload,
    "q_binary_meta" -> binaryMeta,
    "q_frames" -> frames,
    "q_decode_features" -> decodeFeatures,
    "q_scan_effects" -> scanEffectsQ,
    "q_scan_seeded" -> scanSeededQ,
    "q_scan_pipeline" -> scanPipelineQ,
    "q_sign_pipeline" -> signPipelineQ,
    "q_pdf_roundtrip" -> pdfRoundtrip,
    "q_pdf_predictor" -> pdfPredictor,
    "q_pdf_encrypted" -> pdfEncrypted,
    "q_pdf_text" -> pdfText,
    "q_pdf_widths" -> pdfWidths,
    "q_pdf_cjk" -> pdfCjk,
    "q_pdf_filters" -> pdfFilters,
    "q_pdf_ccitt" -> pdfCcitt,
    "q_tiff_meta" -> tiffMeta,
    "q_tiff_decode" -> tiffDecode,
    "q_tiff_pages" -> tiffPages,
    "q_tiff_tiles" -> tiffTiles,
    "q_pdf_corpus" -> pdfCorpus,
    "q_docx_text" -> docxText,
    "q_xlsx_cells" -> xlsxCells,
    "q_pptx_text" -> pptxText,
    "q_format_detect" -> formatDetect,
    "q_tar_entries" -> tarEntries,
    "q_corpus_dispatch" -> corpusDispatch,
    "q_epub_text" -> epubText,
    "q_mbox_text" -> mboxText,
    "q_rtf_text" -> rtfText,
    "q_ipynb_cells" -> ipynbCells,
    "q_audio_meta" -> audioMeta,
    "q_audio_vad" -> audioVad,
    "q_flac_meta" -> flacMeta,
    "q_flac_decode" -> flacDecode,
    "q_transcript_align" -> transcriptAlign,
    "q_audio_resample" -> audioResampleQ,
    "q_gif_frames" -> gifFrames,
    "q_gif_scene" -> gifScene,
    "q_gif_keyframes" -> gifKeyframes,
    "q_avi_frames" -> aviFrames,
    "q_avi_transcode" -> aviTranscode,
    "q_warc_ingest" -> warcIngest,
    "q_warc_br" -> warcBr,
    "q_http_dispatch" -> httpDispatch,
    "q_wet_text" -> wetText,
    "q_compress" -> compressQ,
    "q_url_fetch" -> urlFetch,
    "q_zorder" -> zorder,
    "q_user_features" -> userFeatures,
    "q_jsonl_roundtrip" -> jsonlRoundtrip,
    "q_orc_roundtrip" -> orcRoundtrip,
    "q_avro_roundtrip" -> avroRoundtrip,
    "q_csv_roundtrip" -> csvRoundtrip,
    "q_schema_evolution" -> schemaEvolution,
    "q_snapshot_diff" -> snapshotDiff,
    "q_fk_audit" -> fkAudit,
    "q_items_connector" -> itemsConnector,
    "q_items_agg" -> itemsAgg,
    "q_profile" -> profileTable,
    "q_structure_lot" -> structureLot,
    "q_upload_plan" -> uploadPlan,
    "q_folder_listing" -> folderListing,
    "q_eav_lookup" -> eavLookup,
    "q_eav_pivot" -> eavPivot,
    "q_unpivot" -> unpivot,
    "q_rolling" -> rolling,
    "q_stamp_format" -> stampFormat,
    "q_asof_join" -> asofJoin,
    "q_range_join" -> rangeJoin,
    "q_sessionize" -> sessionize)

  val oracleSql: Map[String, String] = Map(
    "q_funnel" -> funnelSql,
    "q_cohort" -> cohortSql,
    "q_distinct_sketch" -> distinctSketchSql,
    "q_skew_join" -> skewJoinSql,
    "q_skew_agg" -> skewAggSql,
    "q_string_agg" -> stringAggSql,
    "q_items_write" -> itemsWriteSql,
    "q_decode_features" -> decodeFeaturesSql,
    "q_url_fetch" -> urlFetchSql,
    "q_zorder" -> zorderSql,
    "q_user_features" -> userFeaturesSql,
    "q_jsonl_roundtrip" -> jsonlRoundtripSql,
    "q_orc_roundtrip" -> orcRoundtripSql,
    "q_avro_roundtrip" -> avroRoundtripSql,
    "q_csv_roundtrip" -> csvRoundtripSql,
    "q_schema_evolution" -> schemaEvolutionSql,
    "q_snapshot_diff" -> snapshotDiffSql,
    "q_fk_audit" -> fkAuditSql,
    "q_files_payload" -> filesPayloadSql,
    "q_binary_meta" -> binaryMetaSql,
    "q_frames" -> framesSql,
    "q_scan_effects" -> scanEffectsSql,
    "q_scan_seeded" -> scanSeededSql,
    "q_pdf_roundtrip" -> pdfRoundtripSql,
    "q_pdf_predictor" -> pdfPredictorSql,
    "q_pdf_encrypted" -> pdfEncryptedSql,
    "q_pdf_text" -> pdfTextSql,
    "q_pdf_widths" -> pdfWidthsSql,
    "q_pdf_cjk" -> pdfCjkSql,
    "q_pdf_filters" -> pdfFiltersSql,
    "q_pdf_ccitt" -> pdfCcittSql,
    "q_tiff_meta" -> tiffMetaSql,
    "q_tiff_decode" -> tiffDecodeSql,
    "q_tiff_pages" -> tiffPagesSql,
    "q_tiff_tiles" -> tiffTilesSql,
    "q_pdf_corpus" -> pdfCorpusSql,
    "q_docx_text" -> docxTextSql,
    "q_xlsx_cells" -> xlsxCellsSql,
    "q_pptx_text" -> pptxTextSql,
    "q_format_detect" -> formatDetectSql,
    "q_tar_entries" -> tarEntriesSql,
    "q_corpus_dispatch" -> corpusDispatchSql,
    "q_epub_text" -> epubTextSql,
    "q_mbox_text" -> mboxTextSql,
    "q_rtf_text" -> rtfTextSql,
    "q_ipynb_cells" -> ipynbCellsSql,
    "q_scan_pipeline" -> scanPipelineSql,
    "q_sign_pipeline" -> signPipelineSql,
    "q_audio_meta" -> audioMetaSql,
    "q_audio_vad" -> audioVadSql,
    "q_flac_meta" -> flacMetaSql,
    "q_flac_decode" -> flacDecodeSql,
    "q_transcript_align" -> transcriptAlignSql,
    "q_audio_resample" -> audioResampleSql,
    "q_gif_frames" -> gifFramesSql,
    "q_gif_scene" -> gifSceneSql,
    "q_gif_keyframes" -> gifKeyframesSql,
    "q_avi_frames" -> aviFramesSql,
    "q_avi_transcode" -> aviTranscodeSql,
    "q_warc_ingest" -> warcIngestSql,
    "q_warc_br" -> warcBrSql,
    "q_http_dispatch" -> httpDispatchSql,
    "q_wet_text" -> wetTextSql,
    "q_compress" -> compressSql,
    "q_items_connector" -> itemsConnectorSql,
    "q_items_agg" -> itemsAggSql,
    "q_profile" -> profileTableSql,
    "q_structure_lot" -> structureLotSql,
    "q_upload_plan" -> uploadPlanSql,
    "q_folder_listing" -> folderListingSql,
    "q_eav_lookup" -> eavLookupSql,
    "q_eav_pivot" -> eavPivotSql,
    "q_unpivot" -> unpivotSql,
    "q_rolling" -> rollingSql,
    "q_stamp_format" -> stampFormatSql,
    "q_asof_join" -> asofJoinSql,
    "q_range_join" -> rangeJoinSql,
    "q_sessionize" -> sessionizeSql)
}
