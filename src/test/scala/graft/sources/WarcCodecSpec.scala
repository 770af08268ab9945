package graft.sources

import graft.SparkSpec
import graft.sources.WarcCodec.WarcRecord

/** Byte-level contract of the WARC web-archive codec: plain and
  * gzip-membered round trips, Content-Length payload framing (bodies
  * containing record markers and CRLFs survive), damage recovery, and
  * magic detection. The corpus-grain round trip is oracle-gated by
  * q_warc_ingest.
  */
class WarcCodecSpec extends SparkSpec {

  private val recs = Seq(
    WarcRecord("response", "https://a.example/1", "2026-01-01T00:00:00Z",
      "hello world".getBytes("UTF-8")),
    WarcRecord("request", "https://a.example/1", "2026-01-01T00:00:00Z",
      Array.emptyByteArray),
    WarcRecord("response", "https://b.example/2", "2026-01-02T00:00:00Z",
      "body with\r\n\r\nWARC/1.0 marker inside".getBytes("UTF-8")))

  test("plain encode → parse round trip preserves every field and payload byte") {
    val warc = WarcCodec.encode(recs)
    assert(WarcCodec.isWarc(warc) && !WarcCodec.isWarcGz(warc))
    val back = WarcCodec.parse(warc)
    assert(back.length === 3)
    recs.zip(back).foreach { case (a, b) =>
      assert((b.recType, b.url, b.date) === ((a.recType, a.url, a.date)))
      assert(b.body.toSeq === a.body.toSeq)
    }
  }

  test("gzip round trip: one member per record, concatenated — standard .warc.gz") {
    val gz = WarcCodec.encodeGz(recs)
    assert(WarcCodec.isWarcGz(gz))
    val back = WarcCodec.parse(gz)
    assert(back.length === 3)
    assert(back(2).body.toSeq === recs(2).body.toSeq)
    // the file really is multiple gzip members: a second magic pair exists
    val more = (1 until gz.length - 1).exists(i => gz(i) == 0x1f.toByte && gz(i + 1) == 0x8b.toByte)
    assert(more, "expected concatenated gzip members")
  }

  test("Content-Length framing: a body containing the record marker does not split") {
    val back = WarcCodec.parse(WarcCodec.encode(recs))
    assert(back.length === 3) // the embedded 'WARC/1.0' stayed inside record 3
    assert(new String(back(2).body, "UTF-8").contains("WARC/1.0 marker inside"))
  }

  test("damage recovery: truncated tail yields the intact prefix; garbage is null") {
    val warc = WarcCodec.encode(recs)
    val cut = java.util.Arrays.copyOf(warc, warc.length - 20) // inside record 3's payload
    val back = WarcCodec.parse(cut)
    assert(back.length === 2)
    assert(WarcCodec.parse("not a warc at all".getBytes) === null)
    assert(WarcCodec.parse(null) === null)
    // corrupt gzip: gz magic but broken stream → empty, never throws
    assert(WarcCodec.parse(Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)).isEmpty)
  }

  test("CRLF in header values cannot break record framing") {
    // reachable from arbitrary column data via synth_warc_gz: a value
    // with embedded CRLF would otherwise end the header block early and
    // corrupt every record after it
    val hostile = Seq(
      WarcRecord("response\r\nWARC-Type: request", "https://evil/\r\n\r\nWARC/1.0",
        "2026-01-01\r\nT00:00:00Z", "payload".getBytes("UTF-8")),
      recs.head)
    val back = WarcCodec.parse(WarcCodec.encodeGz(hostile))
    assert(back.length === 2)
    assert(!back(0).recType.contains("\r") && !back(0).recType.contains("\n"))
    assert(back(0).url === "https://evil/WARC/1.0")
    assert(back(0).body.toSeq === "payload".getBytes("UTF-8").toSeq)
    assert(back(1).url === recs.head.url)
  }

  test("a corrupt trailing gzip member keeps the intact leading members") {
    val gz = WarcCodec.encodeGz(recs)
    val junk = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0, 42, 13, 77)
    val damaged = gz ++ junk
    val back = WarcCodec.parse(damaged)
    assert(back.length === 3) // leading members survive, damage is dropped
    assert(back.map(_.url).toSeq === recs.map(_.url))
  }

  test("a damaged header in the middle resyncs to the next record") {
    val warc = WarcCodec.encode(recs)
    // corrupt record 2's Content-Length header line (flip a digit to a letter)
    val s = new String(warc, "ISO-8859-1")
    val i = s.indexOf("Content-Length: 0")
    val broken = (s.substring(0, i) + "Content-Length: X" + s.substring(i + 17)).getBytes("ISO-8859-1")
    val back = WarcCodec.parse(broken)
    // record 2 is lost, records 1 and 3 survive
    assert(back.map(_.url).toSeq === Seq("https://a.example/1", "https://b.example/2"))
  }

  test("wetText: conversion records only, stream order, null contract") {
    val wet = WarcCodec.encodeGz(Seq(
      WarcCodec.WarcRecord("warcinfo", "https://crawl.example", "2026-02-01T00:00:00Z",
        "software: graft-wet/1.0".getBytes("UTF-8")),
      WarcCodec.WarcRecord("conversion", "https://a.example/1", "2026-02-01T00:00:00Z",
        "first extract café".getBytes("UTF-8")),
      WarcCodec.WarcRecord("conversion", "https://b.example/2", "2026-02-01T00:00:00Z",
        "second extract".getBytes("UTF-8"))))
    assert(WarcCodec.wetText(wet) === "first extract café\nsecond extract")
    // a response-record segment has no conversion text → null, not ""
    val resp = WarcCodec.encodeGz(Seq(
      WarcCodec.WarcRecord("response", "https://a.example/1", "d", "<html/>".getBytes)))
    assert(WarcCodec.wetText(resp) === null)
    assert(WarcCodec.wetText("not warc".getBytes) === null)
  }

  test("httpPayloadText: Content-Encoding dispatch — br, gzip, identity, unknown, non-http") {
    def http(headers: String, payload: Array[Byte]): Array[Byte] = {
      val head = s"HTTP/1.1 200 OK\r\n$headers\r\n".getBytes("UTF-8")
      val out = new java.io.ByteArrayOutputStream()
      out.write(head); out.write(payload); out.toByteArray
    }
    // br: REAL reference-encoder bytes (battery blob 3)
    val br = java.util.Base64.getDecoder.decode(
      "GyIBgIxUtb/WEZOjk2lsb45x4HAjnv+2KA4eshTwaYh93mtgbZpqhpnZZRzH5wMA")
    val brBody = http("Content-Type: text/plain\r\nContent-Encoding: br\r\n", br)
    assert(WarcCodec.httpPayloadEncoding(brBody) === "br")
    assert(WarcCodec.httpPayloadText(brBody).startsWith(
      "brotli battery three: information about the development"))
    // gzip
    val gzBos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(gzBos)
    gz.write("gzip payload text".getBytes("UTF-8")); gz.close()
    val gzBody = http("content-encoding: GZIP\r\n", gzBos.toByteArray) // case-insensitive
    assert(WarcCodec.httpPayloadEncoding(gzBody) === "gzip")
    assert(WarcCodec.httpPayloadText(gzBody) === "gzip payload text")
    // identity (header absent)
    val idBody = http("Content-Type: text/plain\r\n", "plain text".getBytes("UTF-8"))
    assert(WarcCodec.httpPayloadEncoding(idBody) === "identity")
    assert(WarcCodec.httpPayloadText(idBody) === "plain text")
    // unknown encoding → quarantine null, never garbage
    val zzBody = http("Content-Encoding: zstd\r\n", Array[Byte](1, 2, 3))
    assert(WarcCodec.httpPayloadEncoding(zzBody) === "zstd")
    assert(WarcCodec.httpPayloadText(zzBody) === null)
    // damaged br payload → null (decode failure), not an exception
    val broken = br.clone(); broken(10) = (broken(10) ^ 0x7f).toByte
    val badBody = http("Content-Encoding: br\r\n", broken)
    val r = WarcCodec.httpPayloadText(badBody)
    assert(r == null || r.isInstanceOf[String]) // terminates; null or decoded
    // non-HTTP body → null from both surfaces
    assert(WarcCodec.httpPayloadText("just text, no status line".getBytes) === null)
    assert(WarcCodec.httpPayloadEncoding("just text".getBytes) === null)
  }

  test("httpPayloadText: chunked framing peels before content-encoding; deflate both forms") {
    val text = "wire shape payload " * 40
    // the synth builds REAL chunked/gzip/deflate wire shapes; every
    // matrix cell must round-trip
    for (enc <- Seq("identity", "gzip", "deflate"); chunked <- Seq(false, true)) {
      val http = WarcCodec.synthHttpResponse(text, enc, chunked)
      assert(WarcCodec.httpPayloadText(http) === text, s"enc=$enc chunked=$chunked")
      assert(WarcCodec.httpPayloadEncoding(http) === enc)
    }
    // RAW deflate (no zlib wrapper) — the other thing real servers send
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(text.getBytes("UTF-8")); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    val rawDeflate = bos.toByteArray
    val head = "HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n".getBytes("UTF-8")
    val body = new java.io.ByteArrayOutputStream()
    body.write(head); body.write(rawDeflate)
    assert(WarcCodec.httpPayloadText(body.toByteArray) === text)
    // malformed chunked framing → null, not garbage or a hang
    val badChunk = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZ\r\nbody".getBytes("UTF-8")
    assert(WarcCodec.httpPayloadText(badChunk) === null)
    val shortChunk = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nff\r\ntiny\r\n0\r\n\r\n".getBytes("UTF-8")
    assert(WarcCodec.httpPayloadText(shortChunk) === null)
  }
}
