package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** RFC 8878 codec, verified BOTH ways against the real Zstandard on
  * the Spark classpath (zstd-jni ships for shuffle compression):
  *
  *   1. frames built by the fixture encoder must round-trip through
  *      zstd-jni (validity: a conformant decoder accepts our frames);
  *   2. zstd-jni frames at several levels over several data shapes
  *      must decode byte-exact here (coverage: real encoder output
  *      exercises predefined + FSE-described + repeat sequence modes,
  *      FSE-compressed Huffman weights, 1- and 4-stream literals,
  *      treeless reuse, repeat offsets, cross-block matches).
  *
  * Plus mutation fuzz (no hang, no wrong silent success on damaged
  * checksummed frames), skippable frames, multi-frame concatenation,
  * and the jsonl shard surface.
  */
class ZstdCodecSpec extends AnyFunSuite {
  import ZstdCodec._

  private def realCompress(data: Array[Byte], level: Int): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data, level)

  private def realDecompress(frame: Array[Byte], hint: Int): Array[Byte] =
    com.github.luben.zstd.Zstd.decompress(frame, math.max(hint, 1))

  private def rng(seed: Long): java.util.Random = new java.util.Random(seed)

  /** Data shapes chosen to force distinct encoder strategies. */
  private def shapes: Seq[(String, Array[Byte])] = {
    val r = rng(42)
    val english = ("the quick brown fox jumps over the lazy dog; " * 400).getBytes("UTF-8")
    val jsonl = (0 until 500).map(i =>
      s"""{"id": $i, "text": "document $i body with shared prefix", "lang": "en"}""")
      .mkString("\n").getBytes("UTF-8")
    val random = { val a = new Array[Byte](4096); r.nextBytes(a); a }
    val uniform = Array.fill[Byte](3000)('x')
    val nearUniform = Array.tabulate[Byte](5000)(i => if (i % 97 == 0) 'y' else 'x')
    val multiBlock = { // > 128 KiB forces multiple blocks + cross-block matches
      val sb = new StringBuilder
      var i = 0
      while (sb.length < 300 * 1024) { sb.append(s"line $i of a repetitive corpus shard\n"); i += 1 }
      sb.toString.getBytes("UTF-8")
    }
    val tiny = "ab".getBytes("UTF-8")
    val empty = Array.emptyByteArray
    Seq("english" -> english, "jsonl" -> jsonl, "random" -> random, "uniform" -> uniform,
      "nearUniform" -> nearUniform, "multiBlock" -> multiBlock, "tiny" -> tiny, "empty" -> empty)
  }

  test("oracle 1: fixture-encoder frames are accepted byte-exact by real zstd") {
    for ((name, data) <- shapes; mode <- Seq("raw", "rle", "seq", "huf")) {
      val frame = compressFrame(data, mode)
      val back = try realDecompress(frame, data.length) catch {
        case e: Exception => fail(s"shape=$name mode=$mode: real zstd rejected: ${e.getMessage}")
      }
      assert(back.toSeq === data.toSeq, s"shape=$name mode=$mode")
      // and by our own decoder (checksum verified on both paths)
      assert(decompress(frame).toSeq === data.toSeq, s"self shape=$name mode=$mode")
    }
  }

  test("oracle 2: real-zstd frames at levels 1/3/9/19 decode byte-exact here") {
    for ((name, data) <- shapes; level <- Seq(1, 3, 9, 19)) {
      val frame = realCompress(data, level)
      val got = try decompress(frame) catch {
        case e: Exception => fail(s"shape=$name level=$level: ${e.getMessage}")
      }
      assert(got.toSeq === data.toSeq, s"shape=$name level=$level")
    }
  }

  test("oracle 2b: random-length random-content sweep at mixed levels") {
    val r = rng(7)
    (0 until 40).foreach { i =>
      val n = r.nextInt(20000)
      val data = new Array[Byte](n)
      // mix: half compressible (small alphabet), half random
      if (i % 2 == 0) (0 until n).foreach(j => data(j) = ('a' + r.nextInt(4)).toByte)
      else r.nextBytes(data)
      val frame = realCompress(data, 1 + r.nextInt(19))
      assert(decompress(frame).toSeq === data.toSeq, s"i=$i n=$n")
    }
  }

  test("multi-frame concatenation and skippable frames") {
    val a = compressFrame("first frame ".getBytes, "seq")
    val skip = Array[Byte](0x5a, 0x2a, 0x4d, 0x18, 4, 0, 0, 0, 1, 2, 3, 4) // magic 0x184D2A5A, 4 bytes
    val b = compressFrame("second frame".getBytes, "huf")
    val all = a ++ skip ++ b
    assert(new String(decompress(all), "UTF-8") === "first frame second frame")
  }

  test("damaged frames: loud decompress, tolerant prefix recovery, no hangs") {
    val data = ("shard line alpha\n" * 200).getBytes("UTF-8")
    val good = compressFrame(data, "huf")
    val r = rng(11)
    var loud = 0
    (0 until 300).foreach { _ =>
      val bad = good.clone()
      val at = r.nextInt(bad.length)
      bad(at) = (bad(at) ^ (1 << r.nextInt(8))).toByte
      // a checksummed frame must never silently decode to WRONG content
      try {
        val out = decompress(bad)
        assert(out.toSeq === data.toSeq, s"silent corruption at byte $at")
      } catch { case _: Exception => loud += 1 }
      decompressTolerant(bad) // must terminate without throwing
    }
    assert(loud > 200, s"only $loud/300 mutations detected — checksum not protective")
    // truncations
    (1 until good.length by 37).foreach { cut =>
      try decompress(good.take(cut)) catch { case _: Exception => () }
      decompressTolerant(good.take(cut))
    }
  }

  test("tolerant decode keeps intact leading frames when the tail is damaged") {
    val a = compressFrame("keep this ".getBytes, "seq")
    val b = compressFrame("lose this".getBytes, "seq")
    val cut = a ++ b.take(b.length - 5)
    assert(new String(decompressTolerant(cut), "UTF-8").startsWith("keep this "))
    assert(intercept[IllegalArgumentException](decompress(cut)).getMessage.contains("zstd"))
  }

  test("xxh64 matches zstd-jni's checksum acceptance (implicitly) and known vectors") {
    // RFC/xxHash reference vectors (seed 0)
    assert(xxh64(Array.emptyByteArray, 0, 0, 0L) === 0xEF46DB3751D8E999L)
    assert(xxh64("a".getBytes("UTF-8"), 0, 1, 0L) === 0xD24EC4F1A98C6E5BL)
    assert(xxh64("abc".getBytes("UTF-8"), 0, 3, 0L) === 0x44BC2CF5AD770999L)
    val long = ("xxhash vector input 0123456789 " * 8).getBytes("UTF-8")
    // cross-check against real zstd: flip the stored checksum and the frame must fail
    val frame = compressFrame(long, "seq")
    frame(frame.length - 1) = (frame(frame.length - 1) ^ 0x01).toByte
    assert(intercept[IllegalArgumentException](decompress(frame)).getMessage.contains("checksum"))
  }

  test("zip-bomb guard: output cap is enforced loudly") {
    val data = new Array[Byte](200000)
    val frame = compressFrame(data, "rle")
    val e = intercept[IllegalArgumentException](decompress(frame, maxOut = 1000))
    assert(e.getMessage.contains("cap"))
  }

  test("structured dictionary frames (nonzero id) are out of subset (loud)") {
    // hand-build a single-segment header with Dictionary_ID_Flag = 1, id = 7
    // (no window byte when single-segment: dict id directly follows the FHD)
    val f = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte, 0x21, 7, 1, 0x09, 0, 0, 'x')
    val e = intercept[IllegalArgumentException](decompress(f))
    assert(e.getMessage.contains("dictionar"))
  }

  test("jsonl shard surface: synth, text extraction, null contract, routing") {
    val z = synthJsonlZst(9L, 3, 2)
    val text = new String(decompress(z), "UTF-8")
    val lines = text.split("\n").filter(_.nonEmpty)
    assert(lines.length === 6)
    assert(lines.head.contains("\"id\": 9000"))
    assert(lines.last.contains("\"id\": 9021"))
    assert(jsonlZstText(synthJsonlZst(3L, 1, 2)) ===
      "doc 3 m0 l0 say \"hi\"\tok\ndoc 3 m0 l1 say \"hi\"\tok")
    // null contract: no text members → null (not "")
    assert(jsonlZstText(compressFrame("{\"id\": 1}\n".getBytes, "raw")) === null)
    assert(jsonlZstText("not zstd".getBytes) === null)
    assert(unzstdText(z).contains("\"id\": 9010"))
    // real-zstd shards route through the same surface
    val real = realCompress("{\"text\": \"from real zstd\"}\n".getBytes, 3)
    assert(jsonlZstText(real) === "from real zstd")
  }

  test("frame offsets walk declared sizes; seekable seek table round-trips") {
    val shard = synthJsonlZst(5L, 3, 2)
    val offs = frameOffsets(shard)
    assert(offs.length === 3)
    assert(offs.head._1 === 0L)
    assert(offs.map(_._2).sum === shard.length)
    // each frame decodes independently to its member's lines
    offs.zipWithIndex.foreach { case ((o, l), m) =>
      val part = new String(decompress(
        java.util.Arrays.copyOfRange(shard, o.toInt, (o + l).toInt)), "UTF-8")
      assert(part.contains(s"\"id\": ${5000 + m * 10}"))
      assert(!part.contains(s"\"id\": ${5000 + ((m + 1) % 3) * 10}"))
    }
    // seekable form: table parses, skippable frame is not a split, and
    // real zstd still accepts the whole shard (skippable frames are spec)
    val seek = synthJsonlZstSeekable(5L, 3, 2)
    val table = readSeekTable(seek)
    assert(table.length === 3)
    assert(table.map(_._3.toLong).sum === shard.length)
    assert((table.map(_._4).sum) === decompress(shard).length)
    assert(frameOffsets(seek).length === 3)
    assert(com.github.luben.zstd.Zstd.decompress(seek, decompress(shard).length).toSeq
      === decompress(shard).toSeq)
    assert(readSeekTable(shard) === null) // no table → null, not garbage
  }

  test("prefix sniff: real shards with FCS over the sniff cap still classify (ADVICE r14)") {
    // zstd CLI / zstd-jni write Frame_Content_Size by default; a shard
    // whose decoded size exceeds the 4 KiB sniff cap used to return 0
    // bytes from decompressTolerant and be mislabeled plain "zstd".
    val lines = (0 until 2000).map(i =>
      s"""{"id": $i, "text": "real shard line $i with some body text"}""").mkString("\n") + "\n"
    val data = lines.getBytes("UTF-8")
    assert(data.length > 4096)
    for (level <- Seq(1, 3, 9)) {
      val shard = realCompress(data, level)
      val head = decodePrefix(shard, 4096)
      assert(head.length === 4096, s"level=$level")
      assert(head.toSeq === data.take(4096).toSeq, s"level=$level")
      assert(FormatDetect.detect(shard) === "jsonl-zst", s"level=$level")
      assert(jsonlZstText(shard) != null, s"level=$level: dispatch must not drop text")
    }
    // prefix longer than the content: returns everything, no failure
    val small = realCompress("{\"text\": \"tiny\"}\n".getBytes, 3)
    assert(new String(decodePrefix(small, 4096), "UTF-8") === "{\"text\": \"tiny\"}\n")
    // damaged input: best-effort prefix, never throws
    val cut = realCompress(data, 3).take(50)
    decodePrefix(cut, 4096)
    assert(decodePrefix("not zstd at all".getBytes, 64).length === 0)
  }

  test("seek table: corrupt footer count fails loudly, not out-of-bounds (ADVICE r14)") {
    val seek = synthJsonlZstSeekable(5L, 3, 2)
    def withCount(n: Int): Array[Byte] = {
      val bad = seek.clone()
      val at = bad.length - 9 // LE32 frame count in the footer
      bad(at) = (n & 0xff).toByte; bad(at + 1) = ((n >> 8) & 0xff).toByte
      bad(at + 2) = ((n >> 16) & 0xff).toByte; bad(at + 3) = ((n >>> 24) & 0xff).toByte
      bad
    }
    // counts that overflow n*entry or overrun the buffer: loud, typed
    for (n <- Seq(0x20000000, Int.MaxValue, -1, 1 << 24, 1000)) {
      val e = intercept[IllegalArgumentException](readSeekTable(withCount(n)))
      assert(e.getMessage.contains("seekable"), s"n=$n")
    }
    // count that disagrees with the skippable frame's declared size
    val e = intercept[IllegalArgumentException](readSeekTable(withCount(2)))
    assert(e.getMessage.contains("seekable"), "size cross-check")
    // the untouched table still parses
    assert(readSeekTable(seek).length === 3)
  }

  test("raw-content dictionary frames: dual-oracled both ways; no dict = loud") {
    val dict = jsonlDict
    val data = ("{\"id\": 42, \"text\": \"doc 42 m0 l0 say \\\"hi\\\"\\tok\", \"lang\": \"en\", \"score\": 9}\n" * 20)
      .getBytes("UTF-8")
    // ours → real: our dict frames decode byte-exact via ZSTD_decompress_usingDict
    val mine = compressFrame(data, "seq", dict)
    assert(mine.length < compressFrame(data, "seq").length ||
      mine.length < data.length, "dictionary should help compression here")
    val dst = new Array[Byte](data.length + 64)
    val n = com.github.luben.zstd.Zstd.decompressUsingDict(dst, 0, mine, 0, mine.length, dict)
    assert(n === data.length.toLong, s"real zstd rejected our dict frame: $n")
    assert(java.util.Arrays.copyOf(dst, n.toInt).toSeq === data.toSeq)
    // and via our own prefix decode
    assert(decompressWithPrefix(mine, dict).toSeq === data.toSeq)
    // without the dictionary: loud, not silently wrong (the first
    // cross-frame match offset reaches before the window)
    val e = intercept[IllegalArgumentException](decompress(mine))
    assert(e.getMessage.contains("window start"))
    // real → ours: ZSTD_compress_usingDict output decodes here, all levels
    val shapes2 = Seq(data,
      ("{\"id\": 7, \"text\": \"doc 7 m2 l1 say \\\"hi\\\"\\tok\", \"lang\": \"fr\", \"score\": 3}\n" * 50).getBytes("UTF-8"))
    for (src <- shapes2; level <- Seq(1, 3, 9, 19)) {
      val bound = com.github.luben.zstd.Zstd.compressBound(src.length.toLong).toInt
      val buf = new Array[Byte](bound)
      val m = com.github.luben.zstd.Zstd.compressUsingDict(buf, 0, src, 0, dict, level)
      assert(m > 0, s"level=$level: compressUsingDict failed: $m")
      val frame = java.util.Arrays.copyOf(buf, m.toInt)
      assert(decompressWithPrefix(frame, dict).toSeq === src.toSeq, s"level=$level")
      // wrong dictionary must never silently decode to the right bytes
      val wrong = new Array[Byte](dict.length) // zeros
      val got = try decompressWithPrefix(frame, wrong) catch { case _: Exception => null }
      assert(got == null || got.toSeq != src.toSeq, s"level=$level: wrong dict must not reproduce")
    }
    // the dict-shard fixture surface
    assert(unzstdDictText(synthJsonlZstDict(3L, 2, 2)).contains("\"id\": 3010"))
    assert(unzstdDictText("not zstd".getBytes) === null)
    // multi-frame: each member decodes against the dict independently
    val shard = synthJsonlZstDict(5L, 3, 2)
    assert(frameOffsets(shard).length === 3)
    val txt = new String(decompressWithPrefix(shard, dict), "UTF-8")
    assert(txt.contains("\"id\": 5000") && txt.contains("\"id\": 5021"))
  }

  test("structured dictionaries: from-scratch build loads in real zstd; frames dual-oracled (r16)") {
    val dict = structuredDict
    assert(isStructuredDict(dict))
    // the from-scratch dictionary (real entropy tables written by our
    // own FSE/Huffman serializers) must LOAD in real zstd
    new com.github.luben.zstd.ZstdDictDecompress(dict).close()
    assert(com.github.luben.zstd.Zstd.getDictIdFromDict(dict) === 0x47524654L)
    // ours → real: id-declaring frames decode via ZSTD_decompress_usingDict
    val data = ("{\"id\": 9, \"text\": \"doc 9 m0 l0 say \\\"hi\\\"\\tok\", \"lang\": \"en\", \"score\": 5}\n" * 10)
      .getBytes("UTF-8")
    val mine = compressFrame(data, "seq", jsonlDict, 0x47524654L)
    assert(com.github.luben.zstd.Zstd.getDictIdFromFrame(mine) === 0x47524654L)
    val dst = new Array[Byte](data.length + 64)
    val n = com.github.luben.zstd.Zstd.decompressUsingDict(dst, 0, mine, 0, mine.length, dict)
    assert(n === data.length.toLong, s"real zstd rejected our structured-dict frame: $n")
    assert(java.util.Arrays.copyOf(dst, n.toInt).toSeq === data.toSeq)
    // and via our own dictionary decode
    assert(decompressWithDictionary(mine, dict).toSeq === data.toSeq)
    // without the dictionary: loud AT THE FRAME HEADER; wrong id: loud
    assert(intercept[IllegalArgumentException](decompress(mine))
      .getMessage.contains("dictionary"))
    val wrongId = buildDictionary(0x12345678L, jsonlDict)
    assert(intercept[IllegalArgumentException](decompressWithDictionary(mine, wrongId))
      .getMessage.contains("mismatch"))
    // parse round trip: tables and repcodes land where the reader looks
    val pd = parseDictionary(dict)
    assert(pd.id === 0x47524654L)
    assert(pd.content.toSeq === jsonlDict.toSeq)
    // the shard fixture surface
    val shard = synthJsonlZstSdict(5L, 3, 2)
    assert(frameOffsets(shard).length === 3)
    val txt = unzstdSdictText(shard)
    assert(txt.contains("\"id\": 5000") && txt.contains("\"id\": 5021"))
    assert(unzstdSdictText("not zstd".getBytes) === null)
  }

  test("real TRAINED dictionary: compressUsingDict frames decode byte-exact here (r16)") {
    // train a REAL dictionary (zstd --train equivalent) over jsonl-ish
    // samples, then decode real frames that repeat-reference its
    // entropy tables — the strongest coverage direction: our FSE/
    // Huffman loaders must interpret tables zstd's trainer produced
    val samples: Array[Array[Byte]] = (0 until 500).map { i =>
      val sb = new java.lang.StringBuilder()
      (0 until 8).foreach { l =>
        sb.append("{\"id\": ").append(i * 100 + l)
          .append(", \"text\": \"doc ").append(i).append(" m").append(l % 3)
          .append(" l").append(l).append(" say \\\"hi\\\"\\tok\"")
          .append(", \"lang\": \"").append(if ((i + l) % 2 == 0) "en" else "fr")
          .append("\", \"score\": ").append((i + l) % 100).append("}\n")
      }
      sb.toString.getBytes("UTF-8")
    }.toArray
    val buf = new Array[Byte](16 * 1024)
    val sz = com.github.luben.zstd.Zstd.trainFromBuffer(samples, buf, false)
    assert(sz > 0, s"zstd training failed: $sz")
    val trained = java.util.Arrays.copyOf(buf, sz.toInt)
    assert(isStructuredDict(trained))
    val pd = parseDictionary(trained) // real trainer output parses
    assert(pd.content.length > 0)
    for (level <- Seq(1, 3, 9, 19)) {
      val src = samples(7) ++ samples(123) ++ samples(321)
      val bound = com.github.luben.zstd.Zstd.compressBound(src.length.toLong).toInt
      val out = new Array[Byte](bound)
      val m = com.github.luben.zstd.Zstd.compressUsingDict(out, 0, src, 0, trained, level)
      assert(m > 0, s"level=$level: compressUsingDict failed: $m")
      val frame = java.util.Arrays.copyOf(out, m.toInt)
      assert(decompressWithDictionary(frame, trained).toSeq === src.toSeq, s"level=$level")
      // the WRONG structured dictionary must never silently reproduce
      val got = try decompressWithDictionary(frame, structuredDict)
        catch { case _: Exception => null }
      assert(got == null || got.toSeq != src.toSeq, s"level=$level: wrong dict must not reproduce")
    }
  }

  test("dict shard: damaged tail keeps intact leading frames (ADVICE r15 null/prefix contract)") {
    val shard = synthJsonlZstDict(7L, 3, 2)
    val full = unzstdDictText(shard)
    assert(full != null && full.contains(" m2 "))
    assert(frameOffsets(shard).length === 3)
    // truncate the LAST frame: the two intact leading frames survive,
    // matching the gunzip/unzstd/unxz/unbzip2 tolerant text surfaces
    val cut = java.util.Arrays.copyOf(shard, shard.length - 5)
    val kept = unzstdDictText(cut)
    assert(kept != null && full.startsWith(kept))
    assert(kept.contains(" m1 ") && !kept.contains(" m2 "))
    // the strict prefix decode of the same bytes stays loud
    intercept[IllegalArgumentException](decompressWithPrefix(cut, jsonlDict))
    // nothing decodes (first frame damaged) → null, as documented
    assert(unzstdDictText(java.util.Arrays.copyOf(shard, 10)) === null)
  }

  test("format routing: jsonl-zst vs zstd; pretty-printed JSON stays zstd") {
    assert(FormatDetect.detect(synthJsonlZst(1L, 1, 1)) === "jsonl-zst")
    assert(FormatDetect.detect(compressFrame("plain prose here".getBytes, "seq")) === "zstd")
    val pretty = compressFrame("{\n  \"text\": \"multi line\"\n}\n".getBytes, "raw")
    assert(FormatDetect.detect(pretty) === "zstd")
    assert(FormatDetect.detect(realCompress("{\"text\": \"x\"}\n".getBytes, 3)) === "jsonl-zst")
  }
}
