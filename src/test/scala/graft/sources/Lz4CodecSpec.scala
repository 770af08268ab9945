package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** LZ4 frame codec, verified BOTH ways against the real lz4-java
  * implementation on the Spark classpath (the dual-oracle discipline
  * of ZstdCodecSpec/XzCodecSpec/BzipCodecSpec):
  *
  *   1. frames built by the from-scratch encoder must decode
  *      byte-exact through `LZ4FrameInputStream` (validity);
  *   2. `LZ4FrameOutputStream` output across block sizes and feature
  *      flags — and a hand-framed `LZ4HCJavaSafeCompressor` block,
  *      which emits denser matches and extended lengths than the fast
  *      matcher — must decode byte-exact here (coverage).
  *
  * Plus XXH32 pinned against net.jpountz.xxhash, mutation fuzz,
  * truncation, frame-offset split planning, and the shard surfaces.
  */
class Lz4CodecSpec extends AnyFunSuite {
  import Lz4Codec._

  import net.jpountz.lz4.{LZ4FrameInputStream, LZ4FrameOutputStream}
  import net.jpountz.lz4.LZ4FrameOutputStream.{BLOCKSIZE, FLG}

  private def realDecompress(b: Array[Byte]): Array[Byte] = {
    val in = new LZ4FrameInputStream(new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def realCompress(data: Array[Byte], bs: BLOCKSIZE, bits: FLG.Bits*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new LZ4FrameOutputStream(bos, bs, data.length.toLong, bits: _*)
    out.write(data)
    out.close()
    bos.toByteArray
  }

  private def rng(seed: Long) = new java.util.Random(seed)

  private val repetitive =
    ("line of a repetitive corpus shard with words that repeat repeat\n" * 5000).getBytes("UTF-8")

  test("xxh32 matches net.jpountz.xxhash on vectors and random lengths") {
    val real = net.jpountz.xxhash.XXHashFactory.fastestJavaInstance().hash32()
    val r = rng(5)
    (0 until 200).foreach { i =>
      val n = if (i < 40) i else r.nextInt(5000)
      val b = new Array[Byte](n)
      r.nextBytes(b)
      val seed = if (i % 3 == 0) 0 else r.nextInt()
      assert(xxh32(b, 0, n, seed) === real.hash(b, 0, n, seed), s"len=$n seed=$seed")
    }
  }

  test("oracle 1: from-scratch frames decode byte-exact in real lz4-java") {
    val shapes = Seq(
      repetitive,
      "short".getBytes("UTF-8"),
      Array.emptyByteArray,
      { val b = new Array[Byte](70000); rng(1).nextBytes(b); b }, // incompressible, multi-block at 64 KiB
      ("a" * 65536).getBytes("UTF-8"), // exact block boundary
      ("b" * 65537).getBytes("UTF-8"))
    for (data <- shapes; code <- Seq(4, 7); bck <- Seq(false, true)) {
      val mine = compressFrame(data, blockMaxCode = code, withBlockCk = bck)
      assert(realDecompress(mine).toSeq === data.toSeq, s"code=$code bck=$bck len=${data.length}")
      assert(decompress(mine).toSeq === data.toSeq)
    }
    // the multi-frame fixture, members rotating every optional feature
    val shard = synthJsonlLz4(7L, 4, 3)
    assert(realDecompress(shard).toSeq === decompress(shard).toSeq)
  }

  test("oracle 2: real LZ4FrameOutputStream output decodes byte-exact here") {
    val shapes = Seq(
      repetitive,
      ("{\"id\": 1, \"text\": \"short\"}\n" * 40).getBytes("UTF-8"),
      { val b = new Array[Byte](300000); rng(2).nextBytes(b); b })
    // NOTE: lz4-java refuses to WRITE dependent blocks ("BLOCK_INDEPENDENCE
    // must be set"), so the linked-block decode path is pinned by the
    // hand-built frame below instead of a real-encoder product
    for (data <- shapes;
         bs <- Seq(BLOCKSIZE.SIZE_64KB, BLOCKSIZE.SIZE_256KB, BLOCKSIZE.SIZE_4MB);
         bits <- Seq(
           Seq(FLG.Bits.BLOCK_INDEPENDENCE),
           Seq(FLG.Bits.BLOCK_INDEPENDENCE, FLG.Bits.CONTENT_CHECKSUM),
           Seq(FLG.Bits.BLOCK_INDEPENDENCE, FLG.Bits.CONTENT_CHECKSUM, FLG.Bits.BLOCK_CHECKSUM))) {
      val real = realCompress(data, bs, bits: _*)
      assert(decompress(real).toSeq === data.toSeq, s"bs=$bs bits=$bits")
    }
  }

  test("linked blocks: a block 2 match reaching into block 1 decodes (hand-built frame)") {
    // B.Indep=0 descriptor; block 1 = raw "abcdefgh"; block 2 = one
    // sequence ['X', match(offset 9, len 8)] + trailing literal 'Y' —
    // offset 9 reaches 8 bytes into the PREVIOUS block
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    w32(0x184D2204)
    val desc = Array[Byte](0x40.toByte, (4 << 4).toByte) // version 01, B.Indep=0
    out.write(desc, 0, desc.length)
    out.write((xxh32(desc, 0, desc.length, 0) >>> 8) & 0xff)
    w32(8 | 0x80000000) // raw block, 8 bytes
    out.write("abcdefgh".getBytes, 0, 8)
    val block2 = Array[Byte](0x14, 'X'.toByte, 9, 0, 0x10, 'Y'.toByte)
    w32(block2.length)
    out.write(block2, 0, block2.length)
    w32(0)
    assert(new String(decompress(out.toByteArray), "UTF-8") === "abcdefghXabcdefghY")
    // the same block 2 under B.Indep=1 must be LOUD (window floor)
    val out2 = new java.io.ByteArrayOutputStream()
    def w32b(v: Int): Unit = {
      out2.write(v & 0xff); out2.write((v >> 8) & 0xff)
      out2.write((v >> 16) & 0xff); out2.write((v >> 24) & 0xff)
    }
    w32b(0x184D2204)
    val desc2 = Array[Byte]((0x40 | 0x20).toByte, (4 << 4).toByte)
    out2.write(desc2, 0, desc2.length)
    out2.write((xxh32(desc2, 0, desc2.length, 0) >>> 8) & 0xff)
    w32b(8 | 0x80000000)
    out2.write("abcdefgh".getBytes, 0, 8)
    w32b(block2.length)
    out2.write(block2, 0, block2.length)
    w32b(0)
    val e = intercept[IllegalArgumentException](decompress(out2.toByteArray))
    assert(e.getMessage.contains("window floor"))
  }

  test("oracle 2b: hand-framed HC block (dense matches, extended lengths) decodes here") {
    val data = ("abcdef " * 3000 + "tail that breaks the cycle").getBytes("UTF-8")
    val hc = net.jpountz.lz4.LZ4Factory.fastestJavaInstance().highCompressor()
    val block = hc.compress(data)
    assert(block.length < data.length)
    // minimal frame: FLG(version|indep|C.Size), BD 64KB... data is
    // under 64 KiB? no — use 1 MiB block max (code 6)
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    w32(0x184D2204)
    val desc = Array[Byte]((0x40 | 0x20 | 0x08).toByte, (6 << 4).toByte,
      (data.length & 0xff).toByte, ((data.length >> 8) & 0xff).toByte,
      ((data.length >> 16) & 0xff).toByte, 0, 0, 0, 0, 0)
    out.write(desc, 0, desc.length)
    out.write((xxh32(desc, 0, desc.length, 0) >>> 8) & 0xff)
    w32(block.length)
    out.write(block, 0, block.length)
    w32(0)
    val framed = out.toByteArray
    assert(realDecompress(framed).toSeq === data.toSeq) // sanity: real accepts the hand frame
    assert(decompress(framed).toSeq === data.toSeq)
  }

  test("damaged frames: loud or exact, tolerant keeps leading frames, no hangs") {
    val data = ("shard line alpha\n" * 300).getBytes("UTF-8")
    val good = compressFrame(data, withContentCk = true, withBlockCk = true)
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
    assert(loud > 200, s"only $loud/300 mutations detected")
    (1 until good.length by 23).foreach { cut =>
      try decompress(java.util.Arrays.copyOf(good, cut)) catch { case _: Exception => () }
      decompressTolerant(java.util.Arrays.copyOf(good, cut))
    }
    // multi-frame with a truncated tail: leading frame survives
    val two = compressFrame("keep this ".getBytes) ++ compressFrame("lose this".getBytes)
    val cut = java.util.Arrays.copyOf(two, two.length - 5)
    assert(new String(decompressTolerant(cut), "UTF-8").startsWith("keep this "))
    intercept[IllegalArgumentException](decompress(cut))
  }

  test("frame offsets: declared-size walk finds member grain without decoding") {
    val shard = synthJsonlLz4(3L, 4, 2)
    val offs = frameOffsets(shard)
    assert(offs.length === 4)
    assert(offs.head._1 === 0L)
    assert(offs.map(_._2).sum === shard.length.toLong)
    val joined = offs.map { case (off, len) =>
      decompress(java.util.Arrays.copyOfRange(shard, off.toInt, (off + len).toInt))
    }.reduce(_ ++ _)
    assert(joined.toSeq === decompress(shard).toSeq)
    // skippable frame between members is skipped by both walks
    val skip = Array[Byte](0x50, 0x2a.toByte, 0x4d.toByte, 0x18.toByte, 3, 0, 0, 0, 9, 9, 9)
    val withSkip = compressFrame("a ".getBytes) ++ skip ++ compressFrame("b".getBytes)
    assert(new String(decompress(withSkip), "UTF-8") === "a b")
    assert(frameOffsets(withSkip).length === 3)
  }

  test("guarded forms are loud and typed: truncated legacy, dict-without-dict, reserved bits") {
    // legacy magic followed by a truncated size word
    val legacy = Array[Byte](0x02, 0x21, 0x4c.toByte, 0x18.toByte, 1, 2, 3)
    assert(intercept[IllegalArgumentException](decompress(legacy)).getMessage.contains("legacy"))
    // dict-flagged descriptor with a VALID header checksum, decoded
    // WITHOUT a dictionary — must name the decompressWithDict surface
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x04, 0x22, 0x4d.toByte, 0x18.toByte), 0, 4)
    val desc = Array[Byte]((0x40 | 0x20 | 0x01).toByte, (4 << 4).toByte, 0x42, 0, 0, 0)
    out.write(desc, 0, desc.length)
    out.write((xxh32(desc, 0, desc.length, 0) >>> 8) & 0xff)
    val e = intercept[IllegalArgumentException](decompress(out.toByteArray))
    assert(e.getMessage.contains("decompressWithDict"))
    // reserved FLG bit
    val bad = compressFrame("x".getBytes).clone()
    bad(4) = (bad(4) | 0x02).toByte
    intercept[IllegalArgumentException](decompress(bad))
  }

  test("sniff primitive: bounded prefix of a big frame; no content checksum demanded") {
    val big = realCompress(repetitive, BLOCKSIZE.SIZE_4MB,
      FLG.Bits.BLOCK_INDEPENDENCE, FLG.Bits.CONTENT_CHECKSUM)
    val head = decodePrefix(big, 4096)
    assert(head.length === 4096)
    assert(head.toSeq === repetitive.take(4096).toSeq)
  }

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/lz4/$name")
    require(in != null, s"missing test resource /lz4/$name")
    try in.readAllBytes() finally in.close()
  }

  private val Lz4Cli = java.nio.file.Paths.get("/root/miniconda/bin/lz4")

  /** Run the REAL lz4 CLI (stdin→stdout); cancels the test when the
    * binary is absent — the pinned-resource cases above cover the
    * same formats unconditionally.
    */
  private def cli(input: Array[Byte], args: String*): Array[Byte] = {
    val pb = new ProcessBuilder((Lz4Cli.toString +: args :+ "-c"): _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val writer = new Thread(() => { proc.getOutputStream.write(input); proc.getOutputStream.close() })
    writer.start()
    val out = proc.getInputStream.readAllBytes()
    writer.join()
    assert(proc.waitFor() === 0, s"lz4 ${args.mkString(" ")} failed")
    out
  }
  test("legacy frames: pinned real `lz4 -l` output decodes byte-exact here") {
    val expected = resource("legacy.jsonl")
    val frame = resource("legacy.jsonl.lz4l")
    assert((frame(0) & 0xff, frame(1) & 0xff) === (0x02, 0x21)) // 0x184C2102 LE
    assert(decompress(frame).toSeq === expected.toSeq)
    assert(isLz4(frame))
    assert(frameOffsets(frame).toSeq === Seq((0L, frame.length.toLong)))
    // truncation is loud; tolerant keeps nothing decodable or prefix
    intercept[IllegalArgumentException](decompress(java.util.Arrays.copyOf(frame, frame.length - 3)))
  }

  test("legacy frames: multi-block walk, mixed legacy+modern shard, offsets") {
    val data = ("legacy shard line with repeats repeats repeats\n" * 400).getBytes("UTF-8")
    for (bs <- Seq(96, 1024, 8 << 20)) {
      val frame = compressFrameLegacy(data, blockSize = bs)
      assert(decompress(frame).toSeq === data.toSeq, s"bs=$bs")
    }
    val shard = synthJsonlLz4Legacy(9L, 5, 3)
    val offs = frameOffsets(shard)
    assert(offs.length === 5)
    assert(offs.map(_._2).sum === shard.length.toLong)
    val joined = offs.map { case (off, len) =>
      decompress(java.util.Arrays.copyOfRange(shard, off.toInt, (off + len).toInt))
    }.reduce(_ ++ _)
    assert(joined.toSeq === decompress(shard).toSeq)
    assert(jsonlLz4Text(shard).contains("doc 9 m0 l0"))
    assert(FormatDetect.detect(shard) === "jsonl-lz4")
    // crafted legacy block size over the 8 MiB compress bound is loud
    val bad = Array[Byte](0x02, 0x21, 0x4c.toByte, 0x18.toByte,
      0x00, 0x00, 0x90.toByte, 0x00, 1, 2, 3) // 9 MiB
    assert(intercept[IllegalArgumentException](decompress(bad)).getMessage.contains("over bound"))
  }

  test("legacy frames, live CLI dual oracle: ours decode there, theirs decode here") {
    assume(java.nio.file.Files.isExecutable(Lz4Cli), "real lz4 CLI not present")
    val data = ("live oracle line alpha beta gamma\n" * 2000).getBytes("UTF-8")
    // theirs → here
    assert(decompress(cli(data, "-l", "-9")).toSeq === data.toSeq)
    // ours (canonical 8 MiB blocks AND small multi-block form) → there
    assert(cli(compressFrameLegacy(data), "-d").toSeq === data.toSeq)
    assert(cli(compressFrameLegacy(data, blockSize = 512), "-d").toSeq === data.toSeq)
    // mixed legacy+modern concatenation decodes there too
    assert(cli(synthJsonlLz4Legacy(4L, 4, 3), "-d").length > 0)
    // dict frames: ours decode there (CLI takes the dict as a file);
    // the declared DictID must not trip the real decoder
    val dictFile = java.nio.file.Files.createTempFile("lz4dict", ".bin")
    try {
      java.nio.file.Files.write(dictFile, jsonlDict)
      val dictShard = synthJsonlLz4Dict(4L, 2, 3)
      assert(cli(dictShard, "-d", "-D", dictFile.toString).toSeq ===
        decompressWithDict(dictShard, jsonlDict, JsonlDictId).toSeq)
    } finally java.nio.file.Files.deleteIfExists(dictFile)
  }

  test("dictionary frames: pinned real `lz4 -D` output decodes with the dict, loud without") {
    // fixture content is compressible ONLY via the dictionary (the real
    // CLI itself exits 66 decoding it without -D)
    val expected = resource("dictdata.jsonl")
    val dict = resource("dict.bin")
    val frame = resource("dict.jsonl.lz4")
    assert(decompressWithDict(frame, dict).toSeq === expected.toSeq)
    // the CLI does not declare a DictID, so failure without the dict
    // surfaces at the window floor (match reaching before the frame)
    intercept[IllegalArgumentException](decompress(frame))
    // wrong dict content → the frame's content checksum is loud
    val wrong = dict.clone(); wrong(100) = (wrong(100) ^ 0x55).toByte
    intercept[IllegalArgumentException](decompressWithDict(frame, wrong))
  }

  test("dictionary frames: declared-id enforcement, both dict semantics, own round-trip") {
    val shard = synthJsonlLz4Dict(6L, 3, 3)
    assert(new String(decompressWithDict(shard, jsonlDict, JsonlDictId), "UTF-8")
      .contains("doc 6 m0 l0"))
    assert(unlz4DictText(shard).contains("doc 6 m2 l2"))
    // no dict at all → loud at the header, names the surface
    assert(intercept[IllegalArgumentException](decompress(shard))
      .getMessage.contains("decompressWithDict"))
    // wrong expected id → loud at the header
    assert(intercept[IllegalArgumentException](decompressWithDict(shard, jsonlDict, 0x1234L))
      .getMessage.contains("wrong dictionary"))
    // id-less caller (expectId = -1) still decodes
    assert(decompressWithDict(shard, jsonlDict).length > 0)
    // LINKED blocks + dict: hand-built frame whose first block matches
    // into the dict and second block matches into block 1 across the
    // linked boundary
    val dict = "0123456789abcdef".getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    w32(0x184D2204)
    val desc = Array[Byte](0x40.toByte, (4 << 4).toByte) // B.Indep=0, no dict id declared
    out.write(desc, 0, desc.length)
    out.write((xxh32(desc, 0, desc.length, 0) >>> 8) & 0xff)
    // block 1: ['X', match(offset 17, len 8)] — reaches 16 back into dict tail
    val b1 = Array[Byte](0x14, 'X'.toByte, 17, 0, 0x10, 'Y'.toByte)
    w32(b1.length); out.write(b1, 0, b1.length)
    // block 2: ['Z', match(offset 10, len 6)] — reaches into block 1's output
    val b2 = Array[Byte](0x12, 'Z'.toByte, 10, 0, 0x10, 'W'.toByte)
    w32(b2.length); out.write(b2, 0, b2.length)
    w32(0)
    val linked = out.toByteArray
    // block 1: offset 17 from position 1 lands at logical -16 = dict[0],
    // so the 8-byte match reads "01234567" → "X01234567Y"; block 2's
    // offset-10 match from position 11 reads buffer positions 1..6
    // ("012345") across the linked-block boundary → "Z012345W"
    assert(new String(decompressWithDict(linked, dict), "UTF-8") === "X01234567Y" + "Z012345W")
  }

  test("crafted size fields fail loud in Int-overflow territory (no hangs, typed)") {
    // skippable frame declaring unsigned size 0xFFFFFFF8 (-8 signed):
    // a signed walk would advance by zero and loop forever
    val skipHuge = Array[Byte](0x50, 0x2a.toByte, 0x4d.toByte, 0x18.toByte,
      0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 1, 2, 3)
    assert(intercept[IllegalArgumentException](frameOffsets(skipHuge))
      .getMessage.contains("overruns"))
    assert(intercept[IllegalArgumentException](decompress(skipHuge))
      .getMessage.contains("overruns"))
    // frame whose block declares stored size 0x7ffffff0: p + stored
    // wraps negative in Int; the declared-size walk must stay typed
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    w32(0x184D2204)
    val desc = Array[Byte]((0x40 | 0x20).toByte, (4 << 4).toByte)
    out.write(desc, 0, desc.length)
    out.write((xxh32(desc, 0, desc.length, 0) >>> 8) & 0xff)
    w32(0x7ffffff0) // compressed block, absurd stored size
    out.write(Array[Byte](1, 2, 3), 0, 3)
    val huge = out.toByteArray
    assert(intercept[IllegalArgumentException](frameOffsets(huge))
      .getMessage.contains("overruns"))
    assert(intercept[IllegalArgumentException](decompress(huge))
      .getMessage.nonEmpty)
  }

  test("jsonl shard surface: synth, text extraction, null contract, routing") {
    val z = synthJsonlLz4(3L, 1, 2)
    assert(jsonlLz4Text(z) ===
      "doc 3 m0 l0 say \"hi\"\tok\ndoc 3 m0 l1 say \"hi\"\tok")
    assert(jsonlLz4Text(compressFrame("{\"id\": 1}\n".getBytes)) === null)
    assert(jsonlLz4Text("not lz4".getBytes) === null)
    assert(unlz4Text(z).contains("\"id\": 3001"))
    val real = realCompress("{\"text\": \"from real lz4\"}\n".getBytes,
      BLOCKSIZE.SIZE_64KB, FLG.Bits.BLOCK_INDEPENDENCE, FLG.Bits.CONTENT_CHECKSUM)
    assert(jsonlLz4Text(real) === "from real lz4")
    assert(FormatDetect.detect(z) === "jsonl-lz4")
    assert(FormatDetect.detect(real) === "jsonl-lz4")
    assert(FormatDetect.detect(compressFrame("plain prose here".getBytes)) === "lz4")
  }
}
