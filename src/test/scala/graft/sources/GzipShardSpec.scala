package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** .jsonl.gz shard layer: multi-member round trip, text-field scanner
  * escapes, damaged-member partial reads, format routing, totality.
  */
class GzipShardSpec extends AnyFunSuite {
  import GzipShard._

  test("multi-member fixture round trips; members concatenate in order") {
    val gz = synthJsonlGz(9L, 3, 2)
    val text = new String(gunzipAll(gz), "UTF-8")
    val lines = text.split("\n").filter(_.nonEmpty)
    assert(lines.length === 6)
    assert(lines.head.contains("\"id\": 9000"))
    assert(lines.last.contains("\"id\": 9021"))
  }

  test("jsonlGzText extracts text fields with unescaping, skips textless lines") {
    val gz = synthJsonlGz(3L, 1, 2)
    val t = jsonlGzText(gz)
    assert(t === "doc 3 m0 l0 say \"hi\"\tok\ndoc 3 m0 l1 say \"hi\"\tok")
    val mixed = gzipMembers(Seq(
      "{\"id\": 1}\n{\"text\": \"uni \\u00e9 ok\", \"id\": 2}\n".getBytes("UTF-8")))
    assert(jsonlGzText(mixed) === "uni é ok")
  }

  test("textField scanner: escapes, nesting bait, absent/unterminated") {
    assert(textField("""{"text": "a\nb\\c\"d"}""") === "a\nb\\c\"d")
    // a "text" key inside ANOTHER string value must not fool the
    // scanner into garbage — it lands on the later real key
    assert(textField("""{"meta": "not \"text\": here", "text": "real"}""") === "real")
    assert(textField("""{"id": 5}""") === null)
    assert(textField("""{"text": "unterminated""") === null)
    assert(textField("""{"text": 42}""") === null)
  }

  test("damaged trailing member keeps intact leading members (WARC promise)") {
    val gz = synthJsonlGz(7L, 2, 2)
    // find the second member's header (1f 8b) and corrupt past it
    var second = -1
    for (i <- 2 until gz.length - 1 if second < 0)
      if ((gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b) second = i
    assert(second > 0)
    val cut = gz.take(second + 6) // truncated second member
    val text = new String(gunzipAll(cut), "UTF-8")
    assert(text.contains("\"id\": 7000") && !text.contains("\"id\": 7010"))
    assert(gunzipAll("nope".getBytes) === null)
  }

  test("format routing: jsonl-gz vs gzip vs warc-gz") {
    assert(FormatDetect.detect(synthJsonlGz(1L, 1, 1)) === "jsonl-gz")
    assert(FormatDetect.detect(gzipMembers(Seq("plain prose".getBytes))) === "gzip")
    // a gzipped PRETTY-PRINTED JSON document opens with '{' but its
    // first line is not a complete object — it must stay "gzip", not
    // route to the line-oriented jsonl extractor
    val pretty = gzipMembers(Seq("{\n  \"text\": \"multi line doc\"\n}\n".getBytes("UTF-8")))
    assert(FormatDetect.detect(pretty) === "gzip")
    // a MINIFIED single-object doc is one jsonl line — still jsonl-gz
    val minified = gzipMembers(Seq("{\"text\": \"one line\"}\n".getBytes("UTF-8")))
    assert(FormatDetect.detect(minified) === "jsonl-gz")
  }

  test("member offsets: inflate walk finds exact boundaries; members decode alone") {
    val shard = synthJsonlGz(4L, 3, 2)
    val offs = memberOffsets(shard)
    assert(offs.length === 3)
    assert(offs.head._1 === 0L)
    assert(offs.map(_._2).sum === shard.length)
    offs.zipWithIndex.foreach { case ((o, l), m) =>
      val part = new String(gunzipAll(
        java.util.Arrays.copyOfRange(shard, o.toInt, (o + l).toInt)), "UTF-8")
      assert(part.contains(s"\"id\": ${4000 + m * 10}"))
      assert(!part.contains(s"\"id\": ${4000 + ((m + 1) % 3) * 10}"))
    }
    intercept[IllegalArgumentException](memberOffsets(shard.take(shard.length - 3)))
  }

  test("member offsets walk RFC 1952 optional header fields (FNAME/FEXTRA/FCOMMENT)") {
    // craft a member with FEXTRA + FNAME + FCOMMENT set: flg = 4|8|16
    val plain = gzipMembers(Seq("payload one".getBytes("UTF-8")))
    val deflatePart = java.util.Arrays.copyOfRange(plain, 10, plain.length)
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8 | 16).toByte, 0, 0, 0, 0, 0, 0))
    hdr.write(Array[Byte](3, 0)) // FEXTRA: 3 bytes
    hdr.write(Array[Byte](1, 2, 3))
    hdr.write("shard.jsonl".getBytes("US-ASCII")); hdr.write(0) // FNAME
    hdr.write("a comment".getBytes("US-ASCII")); hdr.write(0) // FCOMMENT
    hdr.write(deflatePart)
    val fancy = hdr.toByteArray
    // sanity: the JDK accepts the crafted header
    assert(new String(gunzipAll(fancy), "UTF-8") === "payload one")
    val both = fancy ++ gzipMembers(Seq("payload two".getBytes("UTF-8")))
    val offs = memberOffsets(both)
    assert(offs.length === 2)
    assert(offs(0) === ((0L, fancy.length.toLong)))
    assert(new String(gunzipAll(
      java.util.Arrays.copyOfRange(both, offs(1)._1.toInt,
        (offs(1)._1 + offs(1)._2).toInt)), "UTF-8") === "payload two")
  }

  test("null contract: undecodable or textless shards null, not empty") {
    // valid gzip magic but a damaged first member → nothing decodes → null
    val broken = synthJsonlGz(5L, 1, 1).take(6)
    assert(jsonlGzText(broken) === null)
    // decodes fine but no line has a text member → null
    assert(jsonlGzText(gzipMembers(Seq("{\"id\": 1}\n{\"id\": 2}\n".getBytes))) === null)
  }
}
