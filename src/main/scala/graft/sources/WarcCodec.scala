package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC/1.0 web-archive container — the ingest format of a
  * Common-Crawl-style pipeline (every large-scale web corpus starts
  * as `.warc.gz` segments; WET text extracts use the same record
  * framing as `conversion` records). Pure-JDK reader/writer:
  *
  *   - a record is `WARC/1.0\r\n` + header lines (`Name: value`) +
  *     `\r\n` + exactly `Content-Length` payload bytes + `\r\n\r\n`;
  *   - a `.warc.gz` file is CONCATENATED gzip members, one record per
  *     member (the standard layout — it makes records individually
  *     seekable); `java.util.zip.GZIPInputStream` natively iterates
  *     concatenated members.
  *
  * Parsing is defensive (truncated/garbage → the records parsed so
  * far, a malformed header → skip to the next record marker) because
  * real crawl segments contain damage; format detection is by magic
  * bytes (gzip 0x1f 0x8b vs literal `WARC/`). Scale shape: one file =
  * one input split = one `flatMap` over records — embarrassingly
  * parallel, no shuffle until the caller aggregates.
  */
object WarcCodec {

  /** One parsed record: WARC-Type, target URI, WARC-Date and payload. */
  final case class WarcRecord(recType: String, url: String, date: String,
                              body: Array[Byte])

  private val Gzip0 = 0x1f.toByte
  private val Gzip1 = 0x8b.toByte

  def isWarcGz(b: Array[Byte]): Boolean =
    b != null && b.length > 2 && b(0) == Gzip0 && b(1) == Gzip1

  def isWarc(b: Array[Byte]): Boolean =
    b != null && (isWarcGz(b) ||
      (b.length >= 5 && b(0) == 'W' && b(1) == 'A' && b(2) == 'R' && b(3) == 'C' && b(4) == '/'))

  // ------------------------------------------------------------------
  // Write path
  // ------------------------------------------------------------------

  /** Header values are line-framed, so an embedded CR/LF (reachable
    * from arbitrary column data via `synth_warc_gz`) would corrupt
    * record framing and silently drop or mangle records on re-parse —
    * strip both before writing.
    */
  private def headerSafe(v: String): String =
    if (v.indexOf('\r') < 0 && v.indexOf('\n') < 0) v
    else v.filter(c => c != '\r' && c != '\n')

  private def recordBytes(r: WarcRecord): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append("WARC-Type: ").append(headerSafe(r.recType)).append("\r\n")
      .append("WARC-Target-URI: ").append(headerSafe(r.url)).append("\r\n")
      .append("WARC-Date: ").append(headerSafe(r.date)).append("\r\n")
      .append("Content-Length: ").append(r.body.length).append("\r\n")
      .append("\r\n").toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(head.length + r.body.length + 4)
    out.write(head); out.write(r.body); out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** Serialize records as a plain `.warc` byte stream. */
  def encode(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(r => out.write(recordBytes(r)))
    out.toByteArray
  }

  /** Serialize records as `.warc.gz`: one gzip MEMBER per record,
    * concatenated — the layout crawl archives actually use.
    */
  def encodeGz(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new GZIPOutputStream(out)
      gz.write(recordBytes(r))
      // close(), not finish(): close() finishes the member AND ends
      // the native Deflater (finish() alone leaks it until GC — one
      // per record is real native-memory pressure at crawl scale);
      // ByteArrayOutputStream.close() is a no-op, so the outer stream
      // stays usable for the next member
      gz.close()
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Read path
  // ------------------------------------------------------------------

  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    // GZIPInputStream reads concatenated members transparently. A
    // damaged member throws MID-stream; swallowing it here returns the
    // bytes decompressed so far, so records from intact leading members
    // survive a corrupt trailing member — the same partial-parse
    // promise the plain-.warc path already keeps.
    val out = new ByteArrayOutputStream(math.max(64, b.length * 4))
    var in: GZIPInputStream = null
    try {
      in = new GZIPInputStream(new ByteArrayInputStream(b), 8192)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: Exception => () }
    finally {
      // release the native Inflater even on the swallowed-exception
      // path — close() is safe after a mid-stream failure, and leaking
      // one Inflater per corrupt payload is the same native-memory
      // pressure the write path's finish→close avoids
      if (in != null) try in.close() catch { case _: Exception => () }
    }
    out.toByteArray
  }

  /** Every parseable record in stream order; damaged trailing content
    * yields the records parsed before the damage. Null only when the
    * payload is not WARC at all (wrong magic).
    */
  def parse(b: Array[Byte]): Array[WarcRecord] = {
    if (!isWarc(b)) return null
    val raw = try { if (isWarcGz(b)) gunzipAll(b) else b }
    catch { case _: Exception => if (isWarcGz(b)) return Array.empty else b }
    val acc = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    val marker = "WARC/".getBytes(UTF_8)
    var pos = 0
    while (pos >= 0 && pos < raw.length) {
      pos = indexOf(raw, marker, pos)
      if (pos >= 0) {
        parseOne(raw, pos) match {
          case Some((rec, next)) => acc += rec; pos = next
          case None => pos += marker.length // damaged header: resync
        }
      }
    }
    acc.toArray
  }

  /** Parse one record starting at `pos` (a `WARC/` marker): returns
    * the record and the offset just past its payload, or None when the
    * header block or declared payload is damaged/truncated.
    */
  private def parseOne(raw: Array[Byte], pos: Int): Option[(WarcRecord, Int)] = {
    val headEnd = indexOf(raw, "\r\n\r\n".getBytes(UTF_8), pos)
    if (headEnd < 0) return None
    val header = new String(raw, pos, headEnd - pos, UTF_8)
    val lines = header.split("\r\n")
    if (!lines.head.startsWith("WARC/")) return None
    var recType = ""; var url = ""; var date = ""; var len = -1L
    lines.tail.foreach { line =>
      val i = line.indexOf(':')
      if (i > 0) {
        val k = line.substring(0, i).trim.toLowerCase
        val v = line.substring(i + 1).trim
        k match {
          case "warc-type" => recType = v
          case "warc-target-uri" => url = v
          case "warc-date" => date = v
          case "content-length" =>
            len = try v.toLong catch { case _: NumberFormatException => -1L }
          case _ => ()
        }
      }
    }
    val bodyStart = headEnd + 4
    if (len < 0 || bodyStart + len > raw.length) return None
    val body = java.util.Arrays.copyOfRange(raw, bodyStart, bodyStart + len.toInt)
    Some((WarcRecord(recType, url, date, body), bodyStart + len.toInt))
  }

  /** WET extraction: the text of every `conversion` record (the
    * record type WET extract segments carry — same WARC framing, body
    * already plain UTF-8 text), newline-joined in stream order.
    * Common Crawl users start from WET at least as often as WARC, so
    * this is a first-class dispatch branch, not a filter idiom. Null
    * when the payload is not WARC or holds no conversion records
    * (the codec null-on-undecodable contract) — a response-record
    * segment routes to the crawl HTML path instead, never to "".
    */
  def wetText(b: Array[Byte]): String = {
    val recs = parse(b)
    if (recs == null) return null
    val texts = recs.iterator.filter(_.recType == "conversion")
      .map(r => new String(r.body, UTF_8)).toSeq
    if (texts.isEmpty) null else texts.mkString("\n")
  }

  // ------------------------------------------------------------------
  // HTTP response payloads (the body of a WARC `response` record)
  // ------------------------------------------------------------------
  /** Split an HTTP/1.x response into (status+headers, payload); None
    * when the body is not an HTTP response at all (WET conversions,
    * request records).
    */
  private def httpSplit(b: Array[Byte]): Option[(String, Array[Byte])] = {
    if (b == null || b.length < 12 || b(0) != 'H' || b(1) != 'T' || b(2) != 'T' ||
      b(3) != 'P' || b(4) != '/') return None
    val sep = indexOf(b, "\r\n\r\n".getBytes(UTF_8), 0)
    if (sep < 0) return None
    Some((new String(b, 0, sep, UTF_8),
      java.util.Arrays.copyOfRange(b, sep + 4, b.length)))
  }

  /** The response's `Content-Encoding` (lowercased; "identity" when
    * the header is absent); null for non-HTTP bodies.
    */
  def httpPayloadEncoding(b: Array[Byte]): String =
    httpSplit(b) match {
      case None => null
      case Some((head, _)) =>
        head.split("\r\n").iterator.map(_.trim)
          .find(_.toLowerCase.startsWith("content-encoding:"))
          .map(_.substring("content-encoding:".length).trim.toLowerCase)
          .getOrElse("identity")
    }

  /** De-chunk an HTTP/1.1 `Transfer-Encoding: chunked` body (hex size
    * line + CRLF + chunk + CRLF, terminated by a 0-size chunk; trailer
    * headers ignored). Null on malformed framing — crawl archives
    * store bodies EXACTLY as they came off the wire, so chunked
    * framing survives into WARC records and must peel before any
    * content-encoding does.
    */
  private def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length)
    var p = 0
    while (true) {
      // hex size line (chunk extensions after ';' ignored)
      var q = p
      var size = 0L
      var digits = 0
      var done = false
      while (!done && q < b.length) {
        val c = b(q) & 0xff
        val d = if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (d >= 0 && digits < 16) { size = size * 16 + d; digits += 1; q += 1 }
        else done = true
      }
      if (digits == 0) return null
      // skip extension to CRLF
      while (q < b.length && b(q) != '\r') q += 1
      if (q + 1 >= b.length || b(q + 1) != '\n') return null
      q += 2
      if (size == 0) return out.toByteArray // trailers ignored
      if (q + size > b.length) return null
      out.write(b, q, size.toInt)
      p = q + size.toInt
      if (p + 2 > b.length || b(p) != '\r' || b(p + 1) != '\n') return null
      p += 2
    }
    null // unreachable
  }

  /** zlib-wrapped OR raw deflate (real servers send both under
    * `Content-Encoding: deflate`); null when neither form inflates.
    */
  private def inflateAny(b: Array[Byte]): Array[Byte] = {
    def tryInflate(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      try {
        inf.setInput(b)
        val out = new ByteArrayOutputStream(math.max(64, b.length * 3))
        val buf = new Array[Byte](8192)
        while (!inf.finished() && !inf.needsInput()) {
          val n = inf.inflate(buf)
          if (n > 0) out.write(buf, 0, n)
          else if (!inf.finished()) return null // stuck without input
        }
        if (inf.finished()) out.toByteArray else null
      } catch { case _: Exception => null }
      finally inf.end()
    }
    val zlib = tryInflate(nowrap = false)
    if (zlib != null) zlib else tryInflate(nowrap = true)
  }

  /** Decoded UTF-8 text of an HTTP response payload: peels
    * `Transfer-Encoding: chunked` framing first (bodies are archived
    * as they came off the wire), then dispatches on
    * `Content-Encoding` — `br` (the RFC 7932 decoder: crawl archives
    * carry brotli at least as often as gzip now), `gzip`/`x-gzip`,
    * `deflate` (zlib-wrapped or raw), and `identity`/absent. Null for
    * non-HTTP bodies, unknown encodings (quarantine, never garbage),
    * or payloads that fail to decode — the codec null-on-undecodable
    * contract.
    */
  def httpPayloadText(b: Array[Byte]): String =
    httpSplit(b) match {
      case None => null
      case Some((head, payload0)) =>
        def header(name: String): Option[String] =
          head.split("\r\n").iterator.map(_.trim)
            .find(_.toLowerCase.startsWith(name + ":"))
            .map(_.substring(name.length + 1).trim.toLowerCase)
        val payload =
          if (header("transfer-encoding").exists(_.contains("chunked"))) dechunk(payload0)
          else payload0
        if (payload == null) return null
        val raw = header("content-encoding").getOrElse("identity") match {
          case "br" =>
            try BrotliCodec.decompress(payload) catch { case _: Exception => null }
          case "gzip" | "x-gzip" =>
            val out = gunzipAll(payload)
            if (out.length == 0 && payload.length > 0) null else out
          case "deflate" => inflateAny(payload)
          case "identity" | "" => payload
          case _ => null
        }
        if (raw == null || raw.length == 0) null else new String(raw, UTF_8)
    }

  /** Fixture writer: one HTTP/1.1 response with the body REALLY
    * encoded (JDK gzip/zlib for gzip/deflate; brotli is decode-only
    * here, so br bodies come from the pinned battery instead) and
    * optionally really chunk-framed — the wire shapes
    * [[httpPayloadText]] must peel.
    */
  def synthHttpResponse(text: String, enc: String, chunked: Boolean): Array[Byte] = {
    val body0 = text.getBytes(UTF_8)
    val encoded = enc match {
      case "gzip" =>
        val bos = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(bos)
        gz.write(body0); gz.close()
        bos.toByteArray
      case "deflate" =>
        val d = new java.util.zip.Deflater()
        try {
          d.setInput(body0); d.finish()
          val bos = new ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          bos.toByteArray
        } finally d.end()
      case _ => body0
    }
    val framed =
      if (!chunked) encoded
      else {
        // multiple chunks (odd size so boundaries never align), with a
        // chunk extension on the first to exercise that parser branch
        val bos = new ByteArrayOutputStream(encoded.length + 64)
        var p = 0
        var first = true
        while (p < encoded.length) {
          val n = math.min(111, encoded.length - p)
          val ext = if (first) ";graft=1" else ""
          bos.write(f"$n%x$ext\r\n".getBytes(UTF_8))
          bos.write(encoded, p, n)
          bos.write("\r\n".getBytes(UTF_8))
          p += n
          first = false
        }
        bos.write("0\r\n\r\n".getBytes(UTF_8))
        bos.toByteArray
      }
    val head = new StringBuilder()
      .append("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n")
    if (enc != "identity" && enc.nonEmpty) head.append("Content-Encoding: ").append(enc).append("\r\n")
    if (chunked) head.append("Transfer-Encoding: chunked\r\n")
    else head.append("Content-Length: ").append(framed.length).append("\r\n")
    head.append("\r\n")
    val out = new ByteArrayOutputStream()
    out.write(head.toString.getBytes(UTF_8))
    out.write(framed)
    out.toByteArray
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
