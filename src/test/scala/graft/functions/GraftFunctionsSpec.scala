package graft.functions

import graft.SparkSpec

/** SQL surface: registered functions behave exactly like the Column API. */
class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions match the Column API expressions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT norm('  Café  NOËL ') AS n,
        |       file_ext('A.PDF') AS e,
        |       sanitize_name('a/b:c') AS s,
        |       signed_filename('doc.pdf') AS sf,
        |       escape_for_q("it's") AS q,
        |       infer_mime('x.txt', CAST(NULL AS STRING)) AS m,
        |       ext_from_name_or_mime('noext', 'image/png') AS x,
        |       item_name_or(CAST(NULL AS STRING), '7') AS inn
        |""".stripMargin).head
    assert(r.getString(0) === "cafe noel")
    assert(r.getString(1) === "pdf")
    assert(r.getString(2) === "a-b-c")
    assert(r.getString(3) === "doc SIGNÉ.pdf")
    assert(r.getString(4) === """it\'s""")
    assert(r.getString(5) === "text/plain")
    assert(r.getString(6) === ".png")
    assert(r.getString(7) === "ITEM_7")
  }

  test("media codec functions are callable from pure SQL, matching the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT gif_info(synth_gif(CAST(5 AS BIGINT), 3, 8, 6)).n_frames AS gif_n,
        |       gif_frame_lumas(synth_gif(CAST(42 AS BIGINT), 4, 8, 6)) AS gif_lumas,
        |       avi_info(synth_avi(CAST(5 AS BIGINT), 3, 8, 6)).fps AS avi_fps,
        |       avi_frame_lumas(synth_avi(CAST(42 AS BIGINT), 4, 8, 6)) AS avi_lumas,
        |       avi_info(avi_to_mjpeg(synth_avi(CAST(5 AS BIGINT), 3, 8, 6), 85)).n_frames AS mj_n,
        |       image_info(synth_image(CAST(3 AS BIGINT), 20, 10)).width AS img_w,
        |       image_info(scan_seeded(synth_image(CAST(3 AS BIGINT), 20, 10),
        |                              CAST(7 AS BIGINT), 'realistic')).format AS scan_fmt,
        |       pdf_info(synth_pdf(CAST(9 AS BIGINT), 2, 120.0, 160.0)).n_pages AS pdf_pages,
        |       wav_info(synth_wav(CAST(1 AS BIGINT), 160, 8000, 5)).sample_rate AS wav_rate
        |""".stripMargin).head
    assert(r.getLong(0) === 3L)
    // the SQL path builds the SAME expression as the Column API: lumas agree
    assert(r.getSeq[Long](1) === graft.sources.GifCodec.frameLumas(
      graft.sources.GifCodec.synthGif(42L, 4, 8, 6)).toSeq)
    assert(r.getLong(2) === 10L)
    assert(r.getSeq[Long](3) === r.getSeq[Long](1)) // AVI/GIF fold parity
    assert(r.getLong(4) === 3L) // transcode round trip in one SQL expression
    assert(r.getInt(5) === 20)
    assert(r.getString(6) === "JPEG")
    assert(r.getLong(7) === 2L)
    assert(r.getLong(8) === 8000L)
  }

  test("TIFF/Avro container functions are callable from pure SQL, matching the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT tiff_info(synth_tiff(CAST(5 AS BIGINT), 16, 12, 1)).compression AS t_comp,
        |       tiff_decode(synth_tiff(CAST(5 AS BIGINT), 16, 12, 1)) AS t_px,
        |       tiff_info(synth_tiff_g4(CAST(7 AS BIGINT), 64, 16)).width AS g4_w,
        |       avro_meta(synth_avro(CAST(9 AS BIGINT), 4)).n_records AS a_n,
        |       avro_records(synth_avro(CAST(9 AS BIGINT), 4)) AS a_rows
        |""".stripMargin).head
    // same decode-to-PNG as the Column/static API
    val png = TiffExprs.tiffToPng(graft.sources.TiffCodec.synthTiff(5L, 16, 12, 1))
    assert(r.getAs[Array[Byte]](1).toSeq === png.toSeq)
    assert(r.getLong(2) === 64L)
    assert(r.getLong(3) === 4L)
    assert(r.getSeq[org.apache.spark.sql.Row](4).length === 4)
  }

  test("natural SQL literals work across the registry: INT seeds, DECIMAL geometry") {
    // A SQL user writes synth_pdf(9, 2, 120.0, 160.0) — an INTEGER
    // seed and DECIMAL dims, not the BIGINT/DOUBLE the Column API
    // happens to pass. Every expression declares ImplicitCastInputTypes
    // so the analyzer inserts those casts; this sweep locks the
    // contract for each registered numeric-argument function.
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT pdf_info(synth_pdf(9, 2, 120.0, 160.0)).n_pages AS pdf_pages,
        |       length(pdf_rasterize(synth_pdf(9, 1, 120.0, 160.0), 0, 72)) > 0 AS rast_ok,
        |       image_info(synth_image(3, 20, 10)).width AS img_w,
        |       image_info(scan_seeded(synth_image(3, 20, 10), 7, 'realistic')).format AS scan_fmt,
        |       image_info(resize_image(synth_image(3, 20, 10), 10, 5)).height AS rz_h,
        |       image_info(jpeg_reencode(scan_seeded(synth_image(3, 20, 10), 7, 'realistic'), 80)).format AS jr_fmt,
        |       pdf_info(pdf_compose(array(scan_seeded(synth_image(3, 20, 10), 7, 'realistic')), 595.0, 842.0)).n_pages AS pc_pages,
        |       gif_info(synth_gif(5, 3, 8, 6)).n_frames AS gif_n,
        |       avi_info(synth_avi(5, 3, 8, 6)).fps AS avi_fps,
        |       wav_info(synth_wav(1, 160, 8000, 5)).sample_rate AS wav_rate,
        |       audio_rms(synth_wav(1, 160, 8000, 5)) >= 0 AS rms_ok,
        |       size(audio_window_rms(synth_wav(1, 160, 8000, 5), 40)) AS win_n,
        |       wav_info(audio_resample(synth_wav(1, 160, 8000, 5), 4000)).sample_rate AS rs_rate
        |""".stripMargin).head
    assert(r.getLong(0) === 2L)
    assert(r.getBoolean(1))
    assert(r.getInt(2) === 20)
    assert(r.getString(3) === "JPEG")
    assert(r.getInt(4) === 5)
    assert(r.getString(5) === "JPEG")
    assert(r.getLong(6) === 1L)
    assert(r.getLong(7) === 3L)
    assert(r.getLong(8) === 10L)
    assert(r.getLong(9) === 8000L)
    assert(r.getBoolean(10))
    assert(r.getInt(11) === 32) // 160 ms at 8 kHz = 1280 samples / 40-sample windows
    assert(r.getLong(12) === 4000L)
  }

  test("spark.sql.extensions injects the scalar surface into a fresh session") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // force shared-session init before clearing defaults
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same SparkContext, new session built THROUGH the extensions
      // hook (the builder's withExtensions and the string config
      // spark.sql.extensions=graft.functions.GraftExtensions share one
      // injection path) — no imperative register() call anywhere here
      val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      assert(s2 ne prev)
      val r = s2.sql("SELECT norm('  Café  NOËL ') AS n, file_ext('A.PDF') AS e").head
      assert(r.getString(0) === "cafe noel")
      assert(r.getString(1) === "pdf")
      // injected optimizer rule: nested norm collapses to one application
      // (a parquet scan keeps the expression alive — a literal would be
      // constant-folded away entirely, which is also correct but tests
      // ConstantFolding, not our rule)
      val nested = s2.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .select(Normalize.norm(Normalize.norm(
          org.apache.spark.sql.functions.col("c_name"))).as("n"))
      val optimized = nested.queryExecution.optimizedPlan.toString
      assert(optimized.split("norm_str").length - 1 === 1, optimized)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("stable_hash60 in SQL equals the DuckDB twin formula") {
    GraftFunctions.register(spark)
    val h = spark.sql("SELECT stable_hash60('abc') AS h").head.getLong(0)
    // first 15 hex digits of md5('abc') = 900150983cd24fb parsed base-16
    assert(h === java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("contains_any in SQL matches the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT contains_any('abc def', array('zz', 'de')) AS a, contains_any('abc', array('zz')) AS b").head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("dot_fold in SQL: literal dim required, value matches the Column API") {
    GraftFunctions.register(spark)
    val d = spark.sql("SELECT dot_fold(array(1.0d, 2.0d), array(3.0d, 4.0d), 2) AS d")
      .head.getDouble(0)
    assert(d === 11.0)
    val err = intercept[Exception] {
      spark.sql("SELECT dot_fold(array(1.0d), array(1.0d), CAST(rand()*2 AS INT))").collect()
    }
    assert(err.getMessage.contains("literal integer"))
  }
}
