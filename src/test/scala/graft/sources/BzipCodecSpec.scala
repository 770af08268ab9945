package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** bzip2 codec, verified BOTH ways against the real implementation on
  * the Spark classpath (commons-compress ships for Hadoop codecs):
  *
  *   1. streams built by the from-scratch encoder must round-trip
  *      through `BZip2CompressorInputStream` (validity: a conformant
  *      decoder accepts our BWT/MTF/RLE2/Huffman bit streams);
  *   2. `BZip2CompressorOutputStream` output across levels and data
  *      shapes must decode byte-exact here (coverage: the real encoder
  *      drives multi-table Huffman with live selector switching, which
  *      the 2-identical-table fixture writer deliberately omits).
  *
  * Plus mutation fuzz (CRC-guarded streams never silently decode
  * wrong), multistream concatenation, the signature-scan split plan,
  * and the jsonl/wiki shard surfaces.
  */
class BzipCodecSpec extends AnyFunSuite {
  import BzipCodec._

  private def realCompress(data: Array[Byte], level: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bos, level)
    out.write(data)
    out.close() // close() finishes; an explicit finish() first NPEs in commons-compress
    bos.toByteArray
  }

  private def realDecompress(bz: Array[Byte]): Array[Byte] = {
    val in = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
      new java.io.ByteArrayInputStream(bz), true) // decompressConcatenated
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }

  private def rng(seed: Long) = new java.util.Random(seed)

  private def shapes: Seq[(String, Array[Byte])] = {
    val r = rng(2024)
    val english = ("the quick brown fox jumps over the lazy dog; " * 400).getBytes("UTF-8")
    val jsonl = (0 until 500).map(i =>
      s"""{"id": $i, "text": "document $i body with shared prefix", "lang": "en"}""")
      .mkString("\n").getBytes("UTF-8")
    val random = { val a = new Array[Byte](4096); r.nextBytes(a); a }
    val uniform = Array.fill[Byte](3000)('x') // long RLE1 runs
    val runs = { // runs of exactly 4/5/259/260 exercise RLE1 edges
      val b = new java.io.ByteArrayOutputStream()
      for (len <- Seq(1, 3, 4, 5, 8, 255, 258, 259, 260, 600); ch <- Seq('a', 'b'))
        b.write(Array.fill[Byte](len)(ch.toByte))
      b.toByteArray
    }
    val big = { // > 100 kB: multiple blocks at level 1
      val sb = new StringBuilder
      var i = 0
      while (sb.length < 300 * 1024) { sb.append(s"line $i of a repetitive corpus shard\n"); i += 1 }
      sb.toString.getBytes("UTF-8")
    }
    val tiny = "ab".getBytes("UTF-8")
    val empty = Array.emptyByteArray
    Seq("english" -> english, "jsonl" -> jsonl, "random" -> random, "uniform" -> uniform,
      "runs" -> runs, "big" -> big, "tiny" -> tiny, "empty" -> empty)
  }

  test("oracle 1: from-scratch encoder streams are accepted byte-exact by commons-compress") {
    for ((name, data) <- shapes; level <- Seq(1, 5, 9)) {
      val bz = compress(data, level)
      val back = try realDecompress(bz) catch {
        case e: Exception => fail(s"shape=$name level=$level: real bzip2 rejected: ${e.getMessage}")
      }
      assert(back.toSeq === data.toSeq, s"shape=$name level=$level")
      // and by our own decoder (CRCs verified on both paths)
      assert(decompress(bz).toSeq === data.toSeq, s"self shape=$name level=$level")
    }
  }

  test("oracle 2: commons-compress streams at levels 1/5/9 decode byte-exact here") {
    for ((name, data) <- shapes; level <- Seq(1, 5, 9)) {
      val bz = realCompress(data, level)
      val got = try decompress(bz) catch {
        case e: Exception => fail(s"shape=$name level=$level: ${e.getMessage}")
      }
      assert(got.toSeq === data.toSeq, s"shape=$name level=$level")
    }
  }

  test("oracle 2b: random-length mixed-content sweep") {
    val r = rng(7)
    (0 until 40).foreach { i =>
      val n = r.nextInt(20000)
      val data = new Array[Byte](n)
      if (i % 2 == 0) (0 until n).foreach(j => data(j) = ('a' + r.nextInt(4)).toByte)
      else r.nextBytes(data)
      val bz = realCompress(data, 1 + r.nextInt(9))
      assert(decompress(bz).toSeq === data.toSeq, s"i=$i n=$n")
      val own = compress(data, 1 + r.nextInt(9))
      assert(realDecompress(own).toSeq === data.toSeq, s"own i=$i n=$n")
    }
  }

  test("multistream concatenation decodes as one; real decoder agrees on our multistream") {
    val a = compress("first stream ".getBytes, 1)
    val b = realCompress("second stream".getBytes, 9)
    assert(new String(decompress(a ++ b), "UTF-8") === "first stream second stream")
    assert(new String(realDecompress(a ++ b), "UTF-8") === "first stream second stream")
  }

  test("damaged streams: loud or right, never silently wrong; tolerant keeps prefix") {
    val data = ("shard line alpha\n" * 200).getBytes("UTF-8")
    val good = compress(data, 1)
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
      decompressTolerant(bad) // must terminate without throwing
    }
    assert(loud > 200, s"only $loud/300 mutations detected — CRC not protective")
    (1 until good.length by 37).foreach { cut =>
      try decompress(good.take(cut)) catch { case _: Exception => () }
      decompressTolerant(good.take(cut))
    }
    // tolerant keeps intact leading streams when the tail is damaged
    val two = compress("keep this ".getBytes, 1) ++ compress("lose this".getBytes, 1)
    val cutTwo = two.take(two.length - 5)
    assert(new String(decompressTolerant(cutTwo), "UTF-8").startsWith("keep this "))
    assert(intercept[IllegalArgumentException](decompress(cutTwo)).getMessage.contains("bzip2"))
  }

  test("prefix sniff decodes bounded head of a big real stream") {
    val lines = (0 until 2000).map(i =>
      s"""{"id": $i, "text": "real shard line $i with some body text"}""").mkString("\n") + "\n"
    val data = lines.getBytes("UTF-8")
    for (level <- Seq(1, 9)) {
      val bz = realCompress(data, level)
      val head = decodePrefix(bz, 4096)
      assert(head.length === 4096, s"level=$level")
      assert(head.toSeq === data.take(4096).toSeq, s"level=$level")
    }
    assert(decodePrefix("not bzip2".getBytes, 64).length === 0)
  }

  test("zip-bomb guard: output cap is enforced loudly") {
    val frame = compress(new Array[Byte](200000), 1)
    val e = intercept[IllegalArgumentException](decompress(frame, maxOut = 1000))
    assert(e.getMessage.contains("cap"))
  }

  test("stream offsets: signature scan finds member grain; members decode independently") {
    val shard = synthJsonlBz2(5L, 3, 2)
    val offs = streamOffsets(shard)
    assert(offs.length === 3)
    assert(offs.head._1 === 0L)
    assert(offs.map(_._2).sum === shard.length)
    offs.zipWithIndex.foreach { case ((o, l), m) =>
      val part = new String(decompress(
        java.util.Arrays.copyOfRange(shard, o.toInt, (o + l).toInt)), "UTF-8")
      assert(part.contains(s"\"id\": ${5000 + m * 10}"))
      assert(!part.contains(s"\"id\": ${5000 + ((m + 1) % 3) * 10}"))
    }
    // a real multistream (two real streams) splits the same way
    val real2 = realCompress("alpha".getBytes, 1) ++ realCompress("beta".getBytes, 9)
    val ro = streamOffsets(real2)
    assert(ro.length === 2)
    assert(new String(decompress(java.util.Arrays.copyOfRange(
      real2, ro(1)._1.toInt, real2.length)), "UTF-8") === "beta")
    intercept[IllegalArgumentException](streamOffsets("nope".getBytes))
  }

  test("block-grain random access: bit-offset scan + standalone decode (single-stream form)") {
    // fixture: one stream, one block per member
    val shard = synthJsonlBz2Blocked(9L, 3, 2)
    assert(realDecompress(shard).length > 0) // commons-compress accepts the blocked stream
    val offs = blockOffsetsBits(shard)
    assert(offs.length === 3)
    assert(offs.head === 32L) // first block magic right after the 4-byte header
    offs.zipWithIndex.foreach { case (o, m) =>
      val part = new String(decodeBlockAt(shard, o), "UTF-8")
      assert(part.contains(s"\"id\": ${9000 + m * 10}"), s"block $m")
      assert(!part.contains(s"\"id\": ${9000 + ((m + 1) % 3) * 10}"), s"block $m isolation")
    }
    // the whole stream still decodes normally (combined CRC intact)
    assert(new String(decompress(shard), "UTF-8").contains("\"id\": 9021"))
    // REAL encoder output: >100 kB at level 1 forces multiple blocks;
    // every block found at bit grain must decode standalone and the
    // concatenation must equal the full decode
    val big = {
      val sb = new StringBuilder
      var i = 0
      while (sb.length < 300 * 1024) { sb.append(s"line $i of a repetitive corpus shard\n"); i += 1 }
      sb.toString.getBytes("UTF-8")
    }
    val real = realCompress(big, 1)
    val ro = blockOffsetsBits(real)
    assert(ro.length >= 3, s"expected multiple blocks, got ${ro.length}")
    val joined = ro.map(o => decodeBlockAt(real, o)).reduce(_ ++ _)
    assert(joined.toSeq === big.toSeq)
    // damage inside a block: standalone decode of THAT block is loud,
    // the others still decode
    val bad = real.clone()
    bad(((ro(1) + 3000) / 8).toInt) = (bad(((ro(1) + 3000) / 8).toInt) ^ 0x10).toByte
    intercept[IllegalArgumentException](decodeBlockAt(bad, ro(1)))
    assert(decodeBlockAt(bad, ro(0)).length > 0)
    // misaligned offset: loud, typed
    intercept[IllegalArgumentException](decodeBlockAt(real, ro(0) + 1))
    intercept[IllegalArgumentException](blockOffsetsBits("not bzip2".getBytes))
  }

  test("jsonl shard surface: synth, text extraction, null contract") {
    val z = synthJsonlBz2(3L, 1, 2)
    assert(jsonlBz2Text(z) ===
      "doc 3 m0 l0 say \"hi\"\tok\ndoc 3 m0 l1 say \"hi\"\tok")
    assert(jsonlBz2Text(compress("{\"id\": 1}\n".getBytes, 1)) === null)
    assert(jsonlBz2Text("not bzip2".getBytes) === null)
    assert(unbzip2Text(z).contains("\"id\": 3001"))
    val real = realCompress("{\"text\": \"from real bzip2\"}\n".getBytes, 9)
    assert(jsonlBz2Text(real) === "from real bzip2")
  }

  test("wiki multistream fixture: concatenated decode equals the dump; streams split per page") {
    val bz = synthWikiBz2(7L, 3)
    val xml = new String(decompress(bz), "UTF-8")
    assert(xml === WikiCodec.synthWikiDump(7L, 3))
    val offs = streamOffsets(bz)
    assert(offs.length >= 3) // siteinfo chunk + one per page
    assert(realDecompress(bz).toSeq === xml.getBytes("UTF-8").toSeq)
  }

  test("compressBlocked caps the RLE1 OUTPUT, not the raw chunk (ADVICE r15)") {
    // runs of exactly 4 expand 4 → 5 under RLE1, so a chunk under the
    // raw block limit can still overflow the format's post-RLE1 block
    // maximum — the writer must reject it, not emit a stream every
    // conformant decoder (including this repo's) calls "block overrun"
    def runs4(n: Int): Array[Byte] = {
      val a = new Array[Byte](n)
      var i = 0
      while (i < n) { a(i) = ((i / 4) % 251).toByte; i += 1 }
      a
    }
    // 99,000 raw (under the old raw-length guard of 99,980) → 123,750
    // post-RLE1: loud, typed
    intercept[IllegalArgumentException](compressBlocked(Seq(runs4(99000)), 1))
    // 60,000 raw → 75,000 post-RLE1: fits; the real decoder accepts it
    val ok = compressBlocked(Seq(runs4(60000)), 1)
    assert(realDecompress(ok).toSeq === runs4(60000).toSeq)
  }

  test("block access on a mixed-level multistream uses the GOVERNING stream's bound (ADVICE r15)") {
    // level-1 stream followed by a level-9 stream whose single block
    // exceeds level 1's 100 kB block maximum: deriving the bound from
    // the FIRST header (the old behavior) spuriously rejected every
    // later-stream block as "block overrun"
    val a = "alpha shard text\n".getBytes("UTF-8")
    val big = new Array[Byte](150000)
    new java.util.Random(42).nextBytes(big) // incompressible → one ~150 kB block
    val payload = compress(a, 1) ++ compress(big, 9)
    val offs = blockOffsetsBits(payload)
    assert(offs.length >= 2)
    val joined = offs.map(o => decodeBlockAt(payload, o)).reduce(_ ++ _)
    assert(joined.toSeq === (a ++ big).toSeq)
  }

  test("format routing: jsonl-bz2 vs wiki-bz2 vs quarantined bzip2") {
    assert(FormatDetect.detect(synthJsonlBz2(1L, 1, 1)) === "jsonl-bz2")
    assert(FormatDetect.detect(synthWikiBz2(1L, 2)) === "wiki-bz2")
    assert(FormatDetect.detect(compress("plain prose here".getBytes, 1)) === "bzip2")
    assert(FormatDetect.detect(realCompress("{\"text\": \"x\"}\n".getBytes, 9)) === "jsonl-bz2")
  }
}
