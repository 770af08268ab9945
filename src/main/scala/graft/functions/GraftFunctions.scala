package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's scalar surface: after
  * `GraftFunctions.register(spark)` (imperative, session-local) or with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (config-driven,
  * every new session on the cluster), `spark.sql` queries can call
  * `norm`, `file_ext`, `infer_mime`, `ext_from_name_or_mime`,
  * `sanitize_name`, `signed_filename`, `escape_for_q`, `stable_hash60`
  * directly — the same expressions the Column API builds, so plans and
  * codegen are identical either way. The media-codec surface
  * (`image_info`/`synth_image`/`scan_seeded`/…, `pdf_*`, `wav_info`/
  * `audio_*`, `gif_*`, `avi_*`) registers the same way, so a pure-SQL
  * user can drive the real containers end-to-end.
  */
object GraftFunctions {

  /** The single source of truth: SQL name → Column-level builder.
    * Both registration paths (temp-function registry and
    * SparkSessionExtensions) derive from this table.
    */
  val scalar: Seq[(String, Seq[Column] => Column)] = Seq(
    "norm" -> (a => Normalize.norm(a.head)),
    "file_ext" -> (a => StringOps.fileExt(a.head)),
    "sanitize_name" -> (a => StringOps.sanitizeName(a.head)),
    "signed_filename" -> (a => StringOps.signedFilename(a.head)),
    "escape_for_q" -> (a => StringOps.escapeForQ(a.head)),
    "stable_hash60" -> (a => Hashing.stableHash60(a.head)),
    "infer_mime" -> (a => StringOps.inferMime(a.head, a(1))),
    "ext_from_name_or_mime" -> (a => StringOps.extFromNameOrMime(a.head, a(1))),
    "stamp_text" -> (a => StringOps.stampText(a.head, a(1))),
    "item_name_or" -> (a => StringOps.itemNameOr(a.head, a(1))),
    "contains_any" -> (a => ContainsAnyCol.containsAny(a.head, a(1))),
    "url_canon" -> (a => UrlOps.urlCanon(a.head)),
    "url_host" -> (a => UrlOps.urlHost(a.head)),
    "url_domain" -> (a => UrlOps.urlDomain(a.head)),
    "url_path" -> (a => UrlOps.urlPath(a.head)),
    "url_resolve" -> (a => UrlOps.urlResolve(a.head, a(1))),
    "html_extract" -> (a => HtmlOps.htmlExtract(a.head)),
    "html_meta" -> (a => HtmlOps.htmlMetaCol(a.head)),
    "html_tables" -> (a => HtmlOps.htmlTablesCol(a.head)),
    "sitemap_parse" -> (a => SitemapOps.sitemapParse(a.head)),
    "html_decode" -> (a => HtmlOps.htmlDecode(a.head)),
    "fix_mojibake" -> (a => Mojibake.fixMojibake(a.head)),
    // dot_fold(a, b, dim): dim must be an integer literal — it sizes
    // the compiled loop at plan time, exactly like the Column API.
    "dot_fold" -> (a => {
      val dim = litInt(a(2), "dot_fold dim")
      DotProductCol.dot(a.head, a(1), dim)
    }),
    // ---------------------------------------------------- media codecs
    // The real-container surface (image/PDF/audio/GIF/AVI), same
    // expressions the Column API builds. Mode/quality args that shape
    // the compiled transform must be literals, like dot_fold's dim.
    "image_info" -> (a => ImageOps.imageInfo(a.head)),
    "image_pixel_sum" -> (a => ImageOps.imagePixelSum(a.head)),
    "synth_image" -> (a => ImageOps.synthImage(a.head, a(1), a(2))),
    "resize_image" -> (a => ImageOps.resizeImage(a.head, a(1), a(2))),
    "jpeg_reencode" -> (a => ImageOps.jpegReencode(a.head, litInt(a(1), "jpeg_reencode quality"))),
    "scan_seeded" -> (a => ImageOps.scanSeeded(a.head, a(1), litString(a(2), "scan_seeded quality"))),
    "pdf_info" -> (a => PdfOps.pdfInfo(a.head)),
    "pdf_check" -> (a => PdfOps.pdfCheck(a.head)),
    "pdf_meta" -> (a => PdfOps.pdfMeta(a.head)),
    "zip_entries" -> (a => OfficeOps.zipEntries(a.head)),
    "docx_text" -> (a => OfficeOps.docxText(a.head)),
    "xlsx_cells" -> (a => OfficeOps.xlsxCells(a.head)),
    "pptx_text" -> (a => OfficeOps.pptxText(a.head)),
    "synth_docx" -> (a => OfficeOps.synthDocx(a.head, a(1))),
    "synth_xlsx" -> (a => OfficeOps.synthXlsx(a.head, a(1))),
    "synth_pptx" -> (a => OfficeOps.synthPptx(a.head, a(1))),
    "format_detect" -> (a => OfficeOps.formatDetect(a.head)),
    "epub_text" -> (a => OfficeOps.epubText(a.head)),
    "mbox_messages" -> (a => OfficeOps.mboxMessages(a.head)),
    "synth_mbox" -> (a => OfficeOps.synthMbox(a.head, a(1))),
    "rtf_text" -> (a => OfficeOps.rtfText(a.head)),
    "synth_rtf" -> (a => OfficeOps.synthRtf(a.head, a(1))),
    "synth_epub" -> (a => OfficeOps.synthEpub(a.head, a(1))),
    "tar_entries" -> (a => OfficeOps.tarEntries(a.head)),
    "synth_tar" -> (a => OfficeOps.synthTar(a.head, a(1))),
    "pdf_rasterize" -> (a => PdfOps.pdfRasterize(a.head, a(1), a(2))),
    "pdf_compose" -> (a => PdfOps.pdfCompose(a.head, a(1), a(2))),
    "synth_pdf" -> (a => PdfOps.synthPdf(a.head, a(1), a(2), a(3))),
    "synth_pdf_pred" -> (a => PdfOps.synthPdfPred(a.head, a(1), a(2))),
    "synth_pdf_enc" -> (a => PdfOps.synthPdfEnc(a.head, a(1), a(2), a(3))),
    "pdf_text" -> (a => PdfOps.pdfText(a.head)),
    "synth_pdf_filters" -> (a => PdfOps.synthPdfFilters(a.head, a(1), a(2))),
    "synth_pdf_ccitt" -> (a => PdfOps.synthPdfCcitt(a.head, a(1), a(2))),
    "synth_pdf_text" -> (a => PdfOps.synthPdfText(a.head, a(1))),
    "synth_pdf_widths" -> (a => PdfOps.synthPdfWidths(a.head, a(1))),
    "synth_pdf_cjk" -> (a => PdfOps.synthPdfCjk(a.head, a(1))),
    "wav_info" -> (a => AudioOps.wavInfo(a.head)),
    "robots_allowed" -> (a => RobotsOps.robotsAllowed(a.head, a(1), a(2))),
    "robots_crawl_delay" -> (a => RobotsOps.robotsCrawlDelay(a.head, a(1))),
    "robots_sitemaps" -> (a => RobotsOps.robotsSitemaps(a.head)),
    "audio_rms" -> (a => AudioOps.audioRms(a.head)),
    "audio_window_rms" -> (a => AudioOps.audioWindowRms(a.head, a(1))),
    "audio_resample" -> (a => AudioOps.audioResample(a.head, a(1))),
    "synth_wav" -> (a => AudioOps.synthWav(a.head, a(1), a(2), a(3))),
    "flac_info" -> (a => SpeechOps.flacInfo(a.head)),
    "flac_to_wav" -> (a => SpeechOps.flacToWav(a.head)),
    "synth_flac" -> (a => SpeechOps.synthFlac(a.head, a(1), a(2), a(3))),
    "parse_cues" -> (a => SpeechOps.parseCues(a.head)),
    "synth_srt" -> (a => SpeechOps.synthSrt(a.head, a(1))),
    "synth_vtt" -> (a => SpeechOps.synthVtt(a.head, a(1))),
    "gif_info" -> (a => GifOps.gifInfo(a.head)),
    "gif_frame_lumas" -> (a => GifOps.frameLumas(a.head)),
    "gif_frame_motion" -> (a => GifOps.frameMotion(a.head)),
    "gif_analyze" -> (a => GifOps.analyze(a.head)),
    "synth_gif" -> (a => GifOps.synthGif(a.head, a(1), a(2), a(3))),
    // -------------------------------------------- code/markup curation
    "code_lang" -> (a => CodeOps.codeLang(a.head, a(1))),
    "code_metrics" -> (a => CodeOps.codeMetrics(a.head)),
    "strip_comments" -> (a => CodeOps.stripComments(a.head, a(1))),
    "license_detect" -> (a => CodeOps.licenseDetect(a.head)),
    "markdown_text" -> (a => CodeOps.markdownText(a.head)),
    "latex_text" -> (a => CodeOps.latexText(a.head)),
    "wikitext_text" -> (a => CodeOps.wikitextText(a.head)),
    "wiki_pages" -> (a => CodeOps.wikiPages(a.head)),
    "wiki_dump_text" -> (a => CodeOps.wikiDumpText(a.head)),
    "wiki_is_redirect" -> (a => CodeOps.wikiIsRedirect(a.head)),
    "script_profile" -> (a => CodeOps.scriptProfile(a.head)),
    "wiki_sections" -> (a => CodeOps.wikiSections(a.head)),
    "synth_wikitext" -> (a => CodeOps.synthWikitext(a.head)),
    "synth_wiki_dump" -> (a => CodeOps.synthWikiDump(a.head, a(1))),
    "gunzip_text" -> (a => CodeOps.gunzipText(a.head)),
    "jsonl_gz_text" -> (a => CodeOps.jsonlGzText(a.head)),
    "synth_jsonl_gz" -> (a => CodeOps.synthJsonlGz(a.head, a(1), a(2))),
    "unzstd_text" -> (a => CodeOps.unzstdText(a.head)),
    "jsonl_zst_text" -> (a => CodeOps.jsonlZstText(a.head)),
    "synth_jsonl_zst" -> (a => CodeOps.synthJsonlZst(a.head, a(1), a(2))),
    "wet_text" -> (a => WarcOps.wetText(a.head)),
    "http_payload_text" -> (a => WarcOps.httpPayloadText(a.head)),
    "http_payload_encoding" -> (a => WarcOps.httpPayloadEncoding(a.head)),
    "unbrotli_text" -> (a => WarcOps.unbrotliText(a.head)),
    "synth_http_response" -> (a => WarcOps.synthHttpResponse(a.head, a(1), a(2))),
    "unxz_text" -> (a => CodeOps.unxzText(a.head)),
    "jsonl_xz_text" -> (a => CodeOps.jsonlXzText(a.head)),
    "synth_jsonl_xz" -> (a => CodeOps.synthJsonlXz(a.head, a(1), a(2))),
    "unlz4_text" -> (a => CodeOps.unlz4Text(a.head)),
    "unsnappy_text" -> (a => CodeOps.unsnappyText(a.head)),
    "jsonl_snappy_text" -> (a => CodeOps.jsonlSnappyText(a.head)),
    "synth_jsonl_snappy" -> (a => CodeOps.synthJsonlSnappy(a.head, a(1), a(2))),
    "synth_jsonl_snappy_hadoop" -> (a => CodeOps.synthJsonlSnappyHadoop(a.head, a(1), a(2))),
    "unsnappy_hadoop_text" -> (a => CodeOps.unsnappyHadoopText(a.head)),
    "jsonl_snappy_hadoop_text" -> (a => CodeOps.jsonlSnappyHadoopText(a.head)),
    "synth_7z" -> (a => CodeOps.synthSevenZip(a.head, a(1))),
    "sevenzip_entries" -> (a => CodeOps.sevenZipEntries(a.head)),
    "sevenzip_text" -> (a => CodeOps.sevenZipText(a.head)),
    "jsonl_lz4_text" -> (a => CodeOps.jsonlLz4Text(a.head)),
    "synth_jsonl_lz4" -> (a => CodeOps.synthJsonlLz4(a.head, a(1), a(2))),
    "synth_jsonl_lz4_legacy" -> (a => CodeOps.synthJsonlLz4Legacy(a.head, a(1), a(2))),
    "synth_jsonl_lz4_dict" -> (a => CodeOps.synthJsonlLz4Dict(a.head, a(1), a(2))),
    "unlz4_dict_text" -> (a => CodeOps.unlz4DictText(a.head)),
    "unbzip2_text" -> (a => CodeOps.unbzip2Text(a.head)),
    "jsonl_bz2_text" -> (a => CodeOps.jsonlBz2Text(a.head)),
    "synth_jsonl_bz2" -> (a => CodeOps.synthJsonlBz2(a.head, a(1), a(2))),
    "synth_wiki_bz2" -> (a => CodeOps.synthWikiBz2(a.head, a(1))),
    "synth_jsonl_zst_dict" -> (a => CodeOps.synthJsonlZstDict(a.head, a(1), a(2))),
    "unzstd_dict_text" -> (a => CodeOps.unzstdDictText(a.head)),
    "synth_jsonl_zst_sdict" -> (a => CodeOps.synthJsonlZstSdict(a.head, a(1), a(2))),
    "unzstd_sdict_text" -> (a => CodeOps.unzstdSdictText(a.head)),
    "bz2_block_starts" -> (a => CodeOps.bz2BlockStarts(a.head)),
    "bz2_block_text" -> (a => CodeOps.bz2BlockText(a.head, a(1))),
    "synth_jsonl_bz2_blocked" -> (a => CodeOps.synthJsonlBz2Blocked(a.head, a(1), a(2))),
    "shard_splits" -> (a => CodeOps.shardSplits(a.head)),
    "zst_seek_member" -> (a => CodeOps.zstSeekMember(a.head, a(1))),
    "synth_jsonl_zst_seekable" -> (a => CodeOps.synthJsonlZstSeekable(a.head, a(1), a(2))),
    "csv_sniff" -> (a => CodeOps.csvSniff(a.head)),
    "sent_split" -> (a => CodeOps.sentSplit(a.head)),
    "secret_scan" -> (a => CodeOps.secretScan(a.head)),
    "unicode_norm" -> (a => CodeOps.unicodeNorm(a.head, litString(a(1), "unicode_norm form"))),
    "diff_stats" -> (a => CodeOps.diffStats(a.head)),
    "avi_info" -> (a => AviOps.aviInfo(a.head)),
    "avi_frame_lumas" -> (a => AviOps.frameLumas(a.head)),
    "avi_analyze" -> (a => AviOps.analyze(a.head)),
    "avi_to_mjpeg" -> (a => AviOps.toMjpeg(a.head, a(1))),
    "tiff_info" -> (a => TiffOps.tiffInfo(a.head)),
    "tiff_decode" -> (a => TiffOps.tiffDecode(a.head)),
    "synth_tiff" -> (a => TiffOps.synthTiff(a.head, a(1), a(2), a(3))),
    "synth_tiff_g4" -> (a => TiffOps.synthTiffG4(a.head, a(1), a(2))),
    "synth_tiff_multi" -> (a => TiffOps.synthTiffMulti(a.head, a(1), a(2), a(3))),
    "tiff_page_sums" -> (a => TiffOps.tiffPageSums(a.head)),
    "synth_tiff_tiled" -> (a => TiffOps.synthTiffTiled(a.head, a(1), a(2), a(3))),
    "synth_tiff_jpeg" -> (a => TiffOps.synthTiffJpeg(a.head, a(1), a(2), a(3))),
    "tiff_jpeg_err" -> (a => TiffOps.tiffJpegErr(a.head, a(1), a(2))),
    "synth_tiff_palette" -> (a => TiffOps.synthTiffPalette(a.head, a(1), a(2))),
    "avro_meta" -> (a => AvroOps.avroMeta(a.head)),
    "avro_records" -> (a => AvroOps.avroRecords(a.head)),
    "synth_avro" -> (a => AvroOps.synthAvro(a.head, a(1))),
    "synth_avi" -> (a => AviOps.synthAvi(a.head, a(1), a(2), a(3))))

  private def litInt(c: Column, what: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftExpr.toExpr(c) match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be a literal integer, got $other")
    }
  }

  private def litString(c: Column, what: String): String = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    GraftExpr.toExpr(c) match {
      case Literal(v: UTF8String, _) => v.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a literal string, got $other")
    }
  }

  private[functions] def builder(f: Seq[Column] => Column): Seq[Expression] => Expression =
    exprs => GraftExpr.toExpr(f(exprs.map(GraftExpr.toColumn)))

  def register(session: SparkSession): Unit =
    scalar.foreach { case (name, f) =>
      session.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder(f), "scala_udf")
    }
}

/** Config-driven injection of the scalar surface
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`):
  * the sanctioned deployment hook for adding engine functions (and,
  * when needed, rules/strategies) to EVERY session on a cluster with no
  * imperative `register()` call in user code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.scalar.foreach { case (name, f) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        GraftFunctions.builder(f)))
    }
    ext.injectOptimizerRule(_ => NormIdempotence)
  }
}
