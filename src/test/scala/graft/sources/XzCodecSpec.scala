package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** XZ/LZMA codec, verified BOTH ways against the real XZ
  * implementation on the Spark classpath (`xz-1.10.jar`):
  *
  *   1. the from-scratch fixture writer's streams (container-complete:
  *      headers, LZMA2 uncompressed chunks, padding, CRC32/CRC64/
  *      SHA-256 checks, index, footer) must decode byte-exact through
  *      `org.tukaani.xz.XZInputStream`;
  *   2. `XZOutputStream` output across presets 0/3/6/9 and data shapes
  *      must decode byte-exact here — the real encoder drives every
  *      LZMA coding path (matches, all rep forms, matched literals,
  *      direct+aligned distance bits, state/props resets across
  *      LZMA2 chunks) the fixture writer deliberately omits.
  *
  * Plus mutation fuzz (checked streams never silently decode wrong),
  * multi-stream concatenation with stream padding, and the jsonl
  * shard surface.
  */
class XzCodecSpec extends AnyFunSuite {
  import XzCodec._

  private def realCompress(data: Array[Byte], preset: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.tukaani.xz.XZOutputStream(bos, new org.tukaani.xz.LZMA2Options(preset))
    out.write(data)
    out.finish()
    out.close()
    bos.toByteArray
  }

  private def realDecompress(xz: Array[Byte]): Array[Byte] = {
    val in = new org.tukaani.xz.XZInputStream(new java.io.ByteArrayInputStream(xz))
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }

  private def rng(seed: Long) = new java.util.Random(seed)

  private def shapes: Seq[(String, Array[Byte])] = {
    val r = rng(4242)
    val english = ("the quick brown fox jumps over the lazy dog; " * 400).getBytes("UTF-8")
    val jsonl = (0 until 500).map(i =>
      s"""{"id": $i, "text": "document $i body with shared prefix", "lang": "en"}""")
      .mkString("\n").getBytes("UTF-8")
    val random = { val a = new Array[Byte](4096); r.nextBytes(a); a }
    val uniform = Array.fill[Byte](3000)('x')
    val big = { // > 64 KiB: multiple LZMA2 chunks from the real encoder
      val sb = new StringBuilder
      var i = 0
      while (sb.length < 300 * 1024) { sb.append(s"line $i of a repetitive corpus shard\n"); i += 1 }
      sb.toString.getBytes("UTF-8")
    }
    val tiny = "ab".getBytes("UTF-8")
    val empty = Array.emptyByteArray
    Seq("english" -> english, "jsonl" -> jsonl, "random" -> random,
      "uniform" -> uniform, "big" -> big, "tiny" -> tiny, "empty" -> empty)
  }

  test("oracle 1: fixture streams decode byte-exact through real XZ") {
    for ((name, data) <- shapes; check <- Seq(0, 1, 4, 10)) {
      val xz = buildXz(data, check)
      assert(realDecompress(xz).toSeq === data.toSeq, s"shape=$name check=$check")
      assert(decompress(xz).toSeq === data.toSeq, s"self shape=$name check=$check")
    }
  }

  test("oracle 2: real-XZ streams at presets 0/3/6/9 decode byte-exact here") {
    for ((name, data) <- shapes; preset <- Seq(0, 3, 6, 9)) {
      val xz = realCompress(data, preset)
      val got = try decompress(xz) catch {
        case e: Exception => fail(s"shape=$name preset=$preset: ${e.getMessage}")
      }
      assert(got.toSeq === data.toSeq, s"shape=$name preset=$preset")
    }
  }

  test("oracle 2b: random-length mixed-content sweep") {
    val r = rng(7)
    (0 until 30).foreach { i =>
      val n = r.nextInt(20000)
      val data = new Array[Byte](n)
      if (i % 2 == 0) (0 until n).foreach(j => data(j) = ('a' + r.nextInt(4)).toByte)
      else r.nextBytes(data)
      val xz = realCompress(data, r.nextInt(10))
      assert(decompress(xz).toSeq === data.toSeq, s"i=$i n=$n")
    }
  }

  test("multi-stream concatenation with stream padding") {
    val a = realCompress("first stream ".getBytes, 6)
    val pad = new Array[Byte](4)
    val b = buildXz("second stream".getBytes, 1)
    assert(new String(decompress(a ++ pad ++ b), "UTF-8") === "first stream second stream")
  }

  test("damaged streams: loud or right, never silently wrong; tolerant keeps prefix") {
    val data = ("shard line alpha\n" * 200).getBytes("UTF-8")
    val good = realCompress(data, 6)
    val r = rng(11)
    var loud = 0
    (0 until 300).foreach { _ =>
      val bad = good.clone()
      val at = r.nextInt(bad.length)
      bad(at) = (bad(at) ^ (1 << r.nextInt(8))).toByte
      try {
        val out = decompress(bad)
        assert(out.toSeq === data.toSeq, s"silent corruption at byte $at")
      } catch { case _: Exception => loud += 1 }
      decompressTolerant(bad) // must terminate
    }
    assert(loud > 200, s"only $loud/300 mutations detected")
    (1 until good.length by 41).foreach { cut =>
      try decompress(good.take(cut)) catch { case _: Exception => () }
      decompressTolerant(good.take(cut))
    }
    // intact leading stream survives a damaged trailing one
    val two = realCompress("keep ".getBytes, 3) ++ realCompress("lose".getBytes, 3)
    val cut = two.take(two.length - 6)
    assert(new String(decompressTolerant(cut), "UTF-8").startsWith("keep "))
  }

  test("crc64 matches the xz spec vector") {
    // the xz spec's own example: CRC64 of "123456789"
    assert(crc64("123456789".getBytes("US-ASCII"), 0, 9) === 0x995DC9BBDF1939FAL)
  }

  test("subset walls are loud: multi-filter chains, bad dict byte") {
    // delta+lzma2 chain via the real library
    val opts = Array[org.tukaani.xz.FilterOptions](
      new org.tukaani.xz.DeltaOptions(1), new org.tukaani.xz.LZMA2Options(1))
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.tukaani.xz.XZOutputStream(bos, opts)
    out.write("delta filtered".getBytes)
    out.finish(); out.close()
    val e = intercept[IllegalArgumentException](decompress(bos.toByteArray))
    assert(e.getMessage.contains("filter") || e.getMessage.contains("subset"))
  }

  test("CRC-valid but malformed block header fails loudly, not out-of-bounds (ADVICE r14)") {
    // Hand-build a stream whose block header is CRC-valid but ends
    // right after the propLen field — the LZMA2 props byte would land
    // in the CRC (or past the array). Must surface as the codec's
    // typed "xz: …" failure, never ArrayIndexOutOfBounds.
    def le32(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >>> 24).toByte)
    def crc(bytes: Array[Byte]): Int = {
      val c = new java.util.zip.CRC32(); c.update(bytes); c.getValue.toInt
    }
    val magic = Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0)
    val streamFlags = Array[Byte](0, 1) // CRC32 check
    val streamHeader = magic ++ streamFlags ++ le32(crc(streamFlags))
    // block header: size byte 1 → 8 bytes total; flags 0; filter id
    // 0x21; propLen 1 — and then the 4-byte CRC with NO props byte
    val hdrBody = Array[Byte](1, 0, 0x21, 1)
    val blockHeader = hdrBody ++ le32(crc(hdrBody))
    val stream = streamHeader ++ blockHeader ++ Array.fill[Byte](16)(0)
    val e = intercept[IllegalArgumentException](decompress(stream))
    assert(e.getMessage.startsWith("xz:"), s"got: ${e.getMessage}")
    assert(e.getMessage.contains("props byte"))
    // a VLI running into the CRC region is equally loud and typed
    val hdrBody2 = Array[Byte](1, 0, 0x21, 0x81.toByte) // propLen VLI never terminates
    val blockHeader2 = hdrBody2 ++ le32(crc(hdrBody2))
    val e2 = intercept[IllegalArgumentException](decompress(streamHeader ++ blockHeader2))
    assert(e2.getMessage.startsWith("xz:"), s"got: ${e2.getMessage}")
  }

  test("jsonl shard surface: synth, text extraction, null contract, zip-bomb cap") {
    val xz = synthJsonlXz(9L, 3, 2)
    // the fixture's three member streams carry three different check types
    assert(realDecompress(xz).length === decompress(xz).length)
    val lines = new String(decompress(xz), "UTF-8").split("\n").filter(_.nonEmpty)
    assert(lines.length === 6)
    assert(lines.head.contains("\"id\": 9000"))
    assert(lines.last.contains("\"id\": 9021"))
    assert(jsonlXzText(synthJsonlXz(3L, 1, 2)) ===
      "doc 3 m0 l0 say \"hi\"\tok\ndoc 3 m0 l1 say \"hi\"\tok")
    assert(jsonlXzText(buildXz("{\"id\": 1}\n".getBytes, 1)) === null)
    assert(jsonlXzText("not xz".getBytes) === null)
    assert(unxzText(xz).contains("\"id\": 9010"))
    val real = realCompress("{\"text\": \"from real xz\"}\n".getBytes, 6)
    assert(jsonlXzText(real) === "from real xz")
    val bomb = realCompress(new Array[Byte](200000), 6)
    val e = intercept[IllegalArgumentException](decompress(bomb, maxOut = 1000))
    assert(e.getMessage.contains("cap"))
  }

  test("stream offsets walk declared sizes; streams decode independently") {
    val shard = synthJsonlXz(7L, 3, 2)
    val offs = streamOffsets(shard)
    assert(offs.length === 3)
    assert(offs.head._1 === 0L)
    assert(offs.map(_._2).sum === shard.length)
    offs.zipWithIndex.foreach { case ((o, l), m) =>
      val part = new String(decompress(
        java.util.Arrays.copyOfRange(shard, o.toInt, (o + l).toInt)), "UTF-8")
      assert(part.contains(s"\"id\": ${7000 + m * 10}"))
    }
    // real-encoder streams walk too (multiple LZMA chunks inside)
    val real = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.tukaani.xz.XZOutputStream(bos, new org.tukaani.xz.LZMA2Options(1))
      out.write(("data " * 40000).getBytes); out.finish(); out.close()
      bos.toByteArray
    }
    assert(streamOffsets(real).toSeq === Seq((0L, real.length.toLong)))
  }

  test("format routing: jsonl-xz vs xz") {
    assert(FormatDetect.detect(synthJsonlXz(1L, 1, 1)) === "jsonl-xz")
    assert(FormatDetect.detect(buildXz("plain prose here".getBytes, 1)) === "xz")
    assert(FormatDetect.detect(realCompress("{\"text\": \"x\"}\n".getBytes, 3)) === "jsonl-xz")
    val pretty = buildXz("{\n  \"text\": \"multi line\"\n}\n".getBytes, 1)
    assert(FormatDetect.detect(pretty) === "xz")
  }
}
