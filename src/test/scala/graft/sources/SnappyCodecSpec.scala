package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Snappy codec (raw blocks + framing format), verified BOTH ways
  * against the real snappy-java implementation on the Spark classpath:
  *
  *   1. raw blocks and framed streams built by the from-scratch
  *      encoder must decode byte-exact through `Snappy.uncompress` /
  *      `SnappyFramedInputStream` (validity);
  *   2. real `Snappy.compress` blocks and `SnappyFramedOutputStream`
  *      streams across block sizes and compressibility shapes must
  *      decode byte-exact here (coverage).
  *
  * Plus mutation fuzz over the CRC-protected framing, truncation,
  * reserved-chunk branches, member-grain split planning, and the
  * shard surfaces.
  */
class SnappyCodecSpec extends AnyFunSuite {
  import SnappyCodec._

  private def rng(seed: Long) = new java.util.Random(seed)

  private val repetitive =
    ("snappy line of a repetitive corpus shard with words that repeat\n" * 4000).getBytes("UTF-8")

  private def realFramedCompress(data: Array[Byte], blockSize: Int = 65536): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.xerial.snappy.SnappyFramedOutputStream(bos, blockSize, 1.0)
    out.write(data)
    out.close()
    bos.toByteArray
  }

  private def realFramedDecompress(b: Array[Byte]): Array[Byte] = {
    val in = new org.xerial.snappy.SnappyFramedInputStream(new java.io.ByteArrayInputStream(b), true)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  test("raw blocks, oracle 1: our encoder's blocks decode byte-exact in real snappy") {
    val shapes = Seq(repetitive, "short".getBytes("UTF-8"), "abc".getBytes("UTF-8"),
      Array.emptyByteArray,
      { val b = new Array[Byte](50000); rng(1).nextBytes(b); b },
      ("x" * 70000).getBytes("UTF-8")) // >64-byte runs → copy splitting
    shapes.foreach { data =>
      val mine = encodeRaw(data, 0, data.length)
      assert(org.xerial.snappy.Snappy.uncompress(mine).toSeq === data.toSeq, s"len=${data.length}")
      assert(decodeRaw(mine).toSeq === data.toSeq)
    }
  }

  test("raw blocks, oracle 2: real Snappy.compress blocks decode byte-exact here") {
    val shapes = Seq(repetitive,
      ("{\"id\": 1, \"text\": \"short\"}\n" * 50).getBytes("UTF-8"),
      { val b = new Array[Byte](120000); rng(2).nextBytes(b); b },
      ("y" * 100000).getBytes("UTF-8"))
    shapes.foreach { data =>
      val real = org.xerial.snappy.Snappy.compress(data)
      assert(decodeRaw(real).toSeq === data.toSeq, s"len=${data.length}")
    }
    // malformed raw blocks are loud, typed
    intercept[IllegalArgumentException](decodeRaw(Array[Byte](10, 0))) // declared 10, got 0
    intercept[IllegalArgumentException](decodeRaw(Array[Byte](4, (2 | (63 << 2)).toByte, 0, 0))) // copy before start
    // extended literal length near Int.MaxValue: p+len and o+len wrap
    // negative in Int — both guards must stay typed, not arraycopy-bomb
    val hugeLit = Array[Byte](4, // declared size 4
      (63 << 2).toByte, // literal tag, 4 extra length bytes
      0xfe.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte, // len-1 = 0x7ffffffe
      'a', 'b')
    assert(intercept[IllegalArgumentException](decodeRaw(hugeLit))
      .getMessage.contains("overruns"))
  }

  test("framing, oracle 1: our framed streams decode byte-exact in real snappy") {
    for (data <- Seq(repetitive, "tiny".getBytes("UTF-8"),
           { val b = new Array[Byte](150000); rng(3).nextBytes(b); b });
         pad <- Seq(false, true)) {
      val mine = compressFramed(data, withPadding = pad)
      assert(realFramedDecompress(mine).toSeq === data.toSeq, s"pad=$pad len=${data.length}")
      assert(decompress(mine).toSeq === data.toSeq)
    }
  }

  test("framing, oracle 2: real SnappyFramedOutputStream streams decode byte-exact here") {
    for (data <- Seq(repetitive,
           { val b = new Array[Byte](200000); rng(4).nextBytes(b); b }); // incompressible → 0x01 chunks
         bs <- Seq(1 << 12, 1 << 16)) {
      val real = realFramedCompress(data, bs)
      assert(decompress(real).toSeq === data.toSeq, s"bs=$bs len=${data.length}")
    }
  }

  test("damaged framed streams: loud or exact, tolerant keeps verified prefix, no hangs") {
    val data = ("shard line alpha\n" * 400).getBytes("UTF-8")
    val good = compressFramed(data)
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
      decompressTolerant(bad)
    }
    assert(loud > 200, s"only $loud/300 mutations detected")
    (1 until good.length by 19).foreach { cut =>
      try decompress(java.util.Arrays.copyOf(good, cut)) catch { case _: Exception => () }
      decompressTolerant(java.util.Arrays.copyOf(good, cut))
    }
    // reserved unskippable chunk type: loud, typed
    val bad = good.clone()
    bad(10) = 0x02 // first chunk header type byte
    assert(intercept[IllegalArgumentException](decompress(bad))
      .getMessage.contains("unskippable"))
    // truncated multi-stream tail keeps the intact leading stream
    val two = compressFramed("keep this ".getBytes) ++ compressFramed("lose this".getBytes)
    val cut = java.util.Arrays.copyOf(two, two.length - 3)
    assert(new String(decompressTolerant(cut), "UTF-8").startsWith("keep this "))
  }

  test("member offsets: declared-length walk finds stream grain without decoding") {
    val shard = synthJsonlSnappy(3L, 4, 2)
    val offs = memberOffsets(shard)
    assert(offs.length === 4)
    assert(offs.head._1 === 0L)
    assert(offs.map(_._2).sum === shard.length.toLong)
    val joined = offs.map { case (off, len) =>
      decompress(java.util.Arrays.copyOfRange(shard, off.toInt, (off + len).toInt))
    }.reduce(_ ++ _)
    assert(joined.toSeq === decompress(shard).toSeq)
  }

  test("sniff primitive: bounded prefix of a large stream") {
    val big = compressFramed(repetitive)
    val head = decodePrefix(big, 4096)
    assert(head.length === 4096)
    assert(head.toSeq === repetitive.take(4096).toSeq)
  }

  test("hadoop container, oracle 1: real SnappyHadoopCompatibleOutputStream output decodes here") {
    for (data <- Seq(repetitive,
           ("{\"id\": 1, \"text\": \"short\"}\n" * 60).getBytes("UTF-8"),
           { val b = new Array[Byte](200000); rng(7).nextBytes(b); b });
         blockSize <- Seq(1 << 12, 1 << 15, 1 << 18)) {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.xerial.snappy.SnappyHadoopCompatibleOutputStream(bos, blockSize)
      out.write(data)
      out.close()
      val real = bos.toByteArray
      assert(isHadoopSnappy(real), s"blockSize=$blockSize")
      assert(decodeHadoop(real).toSeq === data.toSeq, s"blockSize=$blockSize")
    }
  }

  test("hadoop container, oracle 2: our containers decode byte-exact in Hadoop's SnappyCodec") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    val codec = new org.apache.hadoop.io.compress.SnappyCodec()
    codec.setConf(conf)
    def hadoopRead(b: Array[Byte]): Array[Byte] = {
      val in = codec.createInputStream(new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    }
    for (data <- Seq(repetitive,
           { val b = new Array[Byte](90000); rng(8).nextBytes(b); b });
         chunk <- Seq(-1, 4096)) { // single- AND multi-chunk blocks
      val mine = encodeHadoop(data, blockSize = 1 << 16, chunkSize = chunk)
      assert(hadoopRead(mine).toSeq === data.toSeq, s"chunk=$chunk")
      assert(decodeHadoop(mine).toSeq === data.toSeq)
    }
    // and the reverse sanity: Hadoop's own WRITER output decodes here
    val bos = new java.io.ByteArrayOutputStream()
    val hout = codec.createOutputStream(bos)
    hout.write(repetitive)
    hout.close()
    assert(decodeHadoop(bos.toByteArray).toSeq === repetitive.toSeq)
  }

  test("hadoop container: structural detection is exact, no cross-format bleed") {
    val shard = synthJsonlSnappyHadoop(5L, 4, 3)
    assert(isHadoopSnappy(shard))
    assert(FormatDetect.detect(shard) === "jsonl-snappy-hadoop")
    assert(FormatDetect.detect(encodeHadoop("plain prose payload here".getBytes("UTF-8"))) === "snappy-hadoop")
    // the OTHER snappy forms do not route as hadoop, and vice versa
    assert(!isHadoopSnappy(compressFramed(repetitive)))
    assert(!isHadoopSnappy(encodeRaw(repetitive, 0, repetitive.length)))
    assert(!isSnappyFramed(shard))
    // non-snappy payloads: text, gzip, zeros, truncated geometry
    assert(!isHadoopSnappy("not a container at all, just text".getBytes("UTF-8")))
    assert(!isHadoopSnappy(Array.fill[Byte](64)(0)))
    assert(!isHadoopSnappy(java.util.Arrays.copyOf(shard, shard.length - 3)))
    assert(!isHadoopSnappy(GzipShard.synthJsonlGz(1L, 1, 2)))
  }

  test("hadoop container: damage is loud or block-grain tolerant, offsets split exactly") {
    val shard = synthJsonlSnappyHadoop(11L, 5, 4)
    val full = decodeHadoop(shard)
    // block-grain split plan joins back to the full decode
    val offs = hadoopBlockOffsets(shard)
    assert(offs.length >= 5) // one block per member at fixture sizes
    assert(offs.map(_._2).sum === shard.length.toLong)
    val joined = offs.map { case (off, len) =>
      decodeHadoop(java.util.Arrays.copyOfRange(shard, off.toInt, (off + len).toInt))
    }.reduce(_ ++ _)
    assert(joined.toSeq === full.toSeq)
    // truncation: strict loud, tolerant keeps whole leading blocks
    val cut = java.util.Arrays.copyOf(shard, shard.length - 5)
    intercept[IllegalArgumentException](decodeHadoop(cut))
    val kept = decodeHadoopTolerant(cut)
    assert(kept.length < full.length)
    assert(kept.toSeq === full.take(kept.length).toSeq)
    // corrupt block-length field: loud, typed
    val bad = shard.clone()
    bad(0) = 0x7f // block length becomes implausible
    intercept[IllegalArgumentException](decodeHadoop(bad))
    assert(!isHadoopSnappy(bad))
    // sniff primitive
    assert(decodeHadoopPrefix(shard, 64).toSeq === full.take(64).toSeq)
    assert(unsnappyHadoopText(shard).contains("doc 11 m0 l0"))
    assert(unsnappyHadoopText("nope".getBytes("UTF-8")) === null)
  }

  test("jsonl shard surface: synth, text extraction, null contract, routing") {
    val z = synthJsonlSnappy(3L, 1, 2)
    assert(jsonlSnappyText(z) ===
      "doc 3 m0 l0 say \"hi\"\tok\ndoc 3 m0 l1 say \"hi\"\tok")
    assert(jsonlSnappyText(compressFramed("{\"id\": 1}\n".getBytes)) === null)
    assert(jsonlSnappyText("not snappy".getBytes) === null)
    assert(unsnappyText(z).contains("\"id\": 3001"))
    val real = realFramedCompress("{\"text\": \"from real snappy\"}\n".getBytes)
    assert(jsonlSnappyText(real) === "from real snappy")
    assert(FormatDetect.detect(z) === "jsonl-snappy")
    assert(FormatDetect.detect(real) === "jsonl-snappy")
    assert(FormatDetect.detect(compressFramed("plain prose here".getBytes)) === "snappy")
  }
}
