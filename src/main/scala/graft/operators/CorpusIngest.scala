package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The corpus front door as a reusable transform: content-sniff each
  * payload ([[graft.functions.OfficeOps.formatDetect]]), ROUTE to the
  * matching extractor, and measure the unified text. Every step is a
  * stateless per-row projection — no shuffle, no state — so the SAME
  * transform serves a batch shard and a Structured Streaming source
  * unchanged ([[graft.streaming.EventPipeline.streamingCorpus]]); at
  * 100 TB the only knob is bytes-per-partition on the scan.
  *
  * Formats without a text extractor (images, audio, archives, binary)
  * yield a null text and survive to the output with their label — the
  * routing decision is data, not a silent drop; a downstream filter
  * chooses what to keep.
  */
object CorpusIngest {

  /** (format label, extracted text|null) for a binary payload. */
  def dispatch(payload: Column): (Column, Column) = {
    val format = graft.functions.OfficeOps.formatDetect(payload)
    val text =
      when(format === "pdf",
        array_join(graft.functions.PdfOps.pdfText(payload), "\n"))
        .when(format === "docx", graft.functions.OfficeOps.docxText(payload))
        .when(format === "pptx",
          array_join(graft.functions.OfficeOps.pptxText(payload), "\n"))
        .when(format === "epub",
          array_join(graft.functions.OfficeOps.epubText(payload), "\n"))
        .when(format === "mbox",
          array_join(graft.functions.OfficeOps.mboxMessages(payload).getField("text"), "\n"))
        .when(format === "mediawiki",
          graft.functions.CodeOps.wikiDumpText(decode(payload, "UTF-8")))
        .when(format === "jsonl-gz", graft.functions.CodeOps.jsonlGzText(payload))
        .when(format === "jsonl-zst", graft.functions.CodeOps.jsonlZstText(payload))
        .when(format === "jsonl-xz", graft.functions.CodeOps.jsonlXzText(payload))
        .when(format === "jsonl-lz4", graft.functions.CodeOps.jsonlLz4Text(payload))
        .when(format === "jsonl-snappy", graft.functions.CodeOps.jsonlSnappyText(payload))
        .when(format === "jsonl-snappy-hadoop",
          graft.functions.CodeOps.jsonlSnappyHadoopText(payload))
        .when(format === "jsonl-bz2", graft.functions.CodeOps.jsonlBz2Text(payload))
        // the multistream wiki dump: concatenated bz2 streams decode to
        // ONE dump XML, then the same extractor as uncompressed 'mediawiki'
        .when(format === "wiki-bz2",
          graft.functions.CodeOps.wikiDumpText(graft.functions.CodeOps.unbzip2Text(payload)))
        // WET extract segments: conversion-record text; a response-record
        // WARC yields null here (its text needs the fetch/charset/HTML
        // crawl stages, not a projection)
        .when(format === "warc" || format === "warc-gz",
          graft.functions.WarcOps.wetText(payload))
        .when(format === "html" || format === "text",
          graft.functions.Mojibake.fixMojibake(
            when(format === "html",
              graft.functions.HtmlOps.htmlExtract(
                decode(payload, "UTF-8")).getField("text"))
              .otherwise(decode(payload, "UTF-8"))))
    (format, text)
  }

  /** Detect → route → extract → token metrics, one row per document:
    * (id, format, n_ws_tokens, n_re_tokens, n_chars). Token columns
    * are null for text-less formats.
    */
  def withDocMetrics(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val (format, text) = dispatch(col(payloadCol))
    df.select(col(idCol).as("doc_id"), format.as("format"), text.as("text"))
      .select(col("doc_id"), col("format"),
        size(graft.functions.Hashing.words(col("text"))).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).as("n_re_tokens"),
        length(col("text")).as("n_chars"))
  }
}
