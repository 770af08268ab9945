package graft.functions

import graft.sources.WarcCodec
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions over [[graft.sources.WarcCodec]] — the
  * web-archive ingest container as codegen'd projections, mirroring
  * the other codec surfaces. One WARC file (or gzip-membered
  * `.warc.gz` segment) parses to an array of typed records in a
  * single expression; the query layer explodes to record grain and
  * filters by `rec_type` — the standard crawl-ingest shape (file =
  * input split, flatMap to records, no shuffle before aggregation).
  */
object WarcExprs {

  val RecordSchema: StructType = StructType(Seq(
    StructField("rec_type", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("body", BinaryType, nullable = false)))

  /** Input schema of [[SynthWarcGzExpr]]: the record fields with a
    * text body (WET-style conversion payloads).
    */
  val InRecordSchema: StructType = StructType(Seq(
    StructField("rec_type", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("body", StringType, nullable = false)))

  /** Input schema of [[SynthWarcGzBinExpr]]: BINARY bodies — raw
    * response payloads whose encoding is NOT utf-8 (the real crawl
    * shape: charset resolution happens downstream, not at framing).
    */
  val InRecordBinSchema: StructType = StructType(Seq(
    StructField("rec_type", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("body", BinaryType, nullable = false)))

  /** Boxed parse for codegen: array of record structs; null when the
    * payload is not WARC.
    */
  def recordsArray(bytes: Array[Byte]): ArrayData = {
    val recs = WarcCodec.parse(bytes)
    if (recs == null) return null
    new GenericArrayData(recs.map { r =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(r.recType), UTF8String.fromString(r.url),
        UTF8String.fromString(r.date), r.body)): Any
    })
  }

  /** Assemble a `.warc.gz` segment (one gzip member per record) from
    * an array of (rec_type, url, date, body-text) structs.
    */
  def synthWarcGz(records: ArrayData): Array[Byte] = {
    val n = records.numElements()
    def str(row: org.apache.spark.sql.catalyst.InternalRow, i: Int): String =
      if (row.isNullAt(i)) "" else row.getUTF8String(i).toString
    val recs = (0 until n).map { i =>
      val row = records.getStruct(i, 4)
      WarcCodec.WarcRecord(str(row, 0), str(row, 1), str(row, 2),
        if (row.isNullAt(3)) Array.emptyByteArray else row.getUTF8String(3).getBytes)
    }
    WarcCodec.encodeGz(recs)
  }

  /** [[synthWarcGz]] with BINARY bodies — payload bytes pass through
    * untouched (no utf-8 re-encode), preserving the page's original
    * charset for downstream resolution.
    */
  def synthWarcGzBin(records: ArrayData): Array[Byte] = {
    val n = records.numElements()
    def str(row: org.apache.spark.sql.catalyst.InternalRow, i: Int): String =
      if (row.isNullAt(i)) "" else row.getUTF8String(i).toString
    val recs = (0 until n).map { i =>
      val row = records.getStruct(i, 4)
      WarcCodec.WarcRecord(str(row, 0), str(row, 1), str(row, 2),
        if (row.isNullAt(3)) Array.emptyByteArray else row.getBinary(3))
    }
    WarcCodec.encodeGz(recs)
  }
}

/** Parse a WARC / `.warc.gz` payload to its record array:
  * array<struct<rec_type, url, date, body>>; null for non-WARC bytes,
  * best-effort prefix for damaged segments (real crawl data).
  */
case class WarcRecordsExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(WarcExprs.RecordSchema, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    WarcExprs.recordsArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("warcRecs")
      s"""
         |ArrayData $r = graft.functions.WarcExprs.recordsArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): WarcRecordsExpr = copy(child = c)
  override def prettyName: String = "warc_records"
}

/** Serialize an array of (rec_type, url, date, body-text) structs as a
  * standard `.warc.gz` segment (concatenated gzip members, one per
  * record) — the writer half of the ingest round trip and the
  * deterministic fixture generator for the oracle gate.
  */
case class SynthWarcGzExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(WarcExprs.InRecordSchema))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    WarcExprs.synthWarcGz(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WarcExprs.synthWarcGz($a);")
  override protected def withNewChildInternal(c: Expression): SynthWarcGzExpr = copy(child = c)
  override def prettyName: String = "synth_warc_gz"
}

/** [[SynthWarcGzExpr]]'s binary-body twin: assemble a `.warc.gz`
  * segment from records whose payloads are raw BYTES — the shape a
  * real fetch stage produces, where the page's charset is unknown at
  * framing time and must survive to the downstream `html_decode`.
  */
case class SynthWarcGzBinExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(WarcExprs.InRecordBinSchema))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    WarcExprs.synthWarcGzBin(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WarcExprs.synthWarcGzBin($a);")
  override protected def withNewChildInternal(c: Expression): SynthWarcGzBinExpr = copy(child = c)
  override def prettyName: String = "synth_warc_gz_bin"
}

/** `wet_text(bin)` → newline-joined text of a WET extract segment's
  * `conversion` records ([[graft.sources.WarcCodec.wetText]]) — the
  * Common-Crawl WET front door as one codegen projection; null for
  * non-WARC payloads and for segments with no conversion records
  * (response-record WARCs route to the crawl HTML path instead).
  */
case class WetTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = WarcCodec.wetText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("wet")
      s"""
         |String $r = graft.sources.WarcCodec.wetText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): WetTextExpr = copy(child = c)
  override def prettyName: String = "wet_text"
}

/** `http_payload_text(bin)` → decoded UTF-8 text of an HTTP response
  * body ([[graft.sources.WarcCodec.httpPayloadText]]): dispatches on
  * `Content-Encoding` — `br` via the from-scratch RFC 7932 decoder,
  * `gzip`, `identity` — null for non-HTTP bodies, unknown encodings
  * and undecodable payloads.
  */
case class HttpPayloadTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = WarcCodec.httpPayloadText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("hpt")
      s"""
         |String $r = graft.sources.WarcCodec.httpPayloadText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): HttpPayloadTextExpr = copy(child = c)
  override def prettyName: String = "http_payload_text"
}

/** `http_payload_encoding(bin)` → the response's `Content-Encoding`
  * (lowercased, "identity" when absent); null for non-HTTP bodies.
  */
case class HttpPayloadEncodingExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = WarcCodec.httpPayloadEncoding(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("hpe")
      s"""
         |String $r = graft.sources.WarcCodec.httpPayloadEncoding($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): HttpPayloadEncodingExpr = copy(child = c)
  override def prettyName: String = "http_payload_encoding"
}

/** `unbrotli_text(bin)` → decoded UTF-8 text of a bare brotli payload
  * ([[graft.sources.BrotliCodec.unbrotliText]]); brotli has no magic,
  * so routing is the caller's (`.br` suffix, Content-Encoding) — this
  * is the suffix-routed surface, the WARC route goes through
  * [[HttpPayloadTextExpr]].
  */
case class UnbrotliTextExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = graft.sources.BrotliCodec.unbrotliText(b.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("brt")
      s"""
         |String $r = graft.sources.BrotliCodec.unbrotliText($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): UnbrotliTextExpr = copy(child = c)
  override def prettyName: String = "unbrotli_text"
}

/** `synth_http_response(text, enc, chunked)` — one HTTP/1.1 response
  * with the body REALLY encoded (JDK gzip/zlib) and optionally really
  * chunk-framed ([[graft.sources.WarcCodec.synthHttpResponse]]).
  */
case class SynthHttpResponseExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType, BooleanType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(t: Any, e: Any, c: Any): Any =
    WarcCodec.synthHttpResponse(t.asInstanceOf[UTF8String].toString,
      e.asInstanceOf[UTF8String].toString, c.asInstanceOf[Boolean])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, e, c) =>
      s"${ev.value} = graft.sources.WarcCodec.synthHttpResponse($t.toString(), $e.toString(), $c);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthHttpResponseExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_http_response"
}

/** Column-level entry points. */
object WarcOps {
  def warcRecords(bin: Column): Column =
    GraftExpr.toColumn(WarcRecordsExpr(GraftExpr.toExpr(bin)))
  def wetText(bin: Column): Column =
    GraftExpr.toColumn(WetTextExpr(GraftExpr.toExpr(bin)))
  def synthWarcGz(records: Column): Column =
    GraftExpr.toColumn(SynthWarcGzExpr(GraftExpr.toExpr(records)))
  def synthWarcGzBin(records: Column): Column =
    GraftExpr.toColumn(SynthWarcGzBinExpr(GraftExpr.toExpr(records)))
  def httpPayloadText(bin: Column): Column =
    GraftExpr.toColumn(HttpPayloadTextExpr(GraftExpr.toExpr(bin)))
  def httpPayloadEncoding(bin: Column): Column =
    GraftExpr.toColumn(HttpPayloadEncodingExpr(GraftExpr.toExpr(bin)))
  def unbrotliText(bin: Column): Column =
    GraftExpr.toColumn(UnbrotliTextExpr(GraftExpr.toExpr(bin)))
  def synthHttpResponse(text: Column, enc: Column, chunked: Column): Column =
    GraftExpr.toColumn(SynthHttpResponseExpr(GraftExpr.toExpr(text),
      GraftExpr.toExpr(enc), GraftExpr.toExpr(chunked)))
}
