package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** From-scratch LZ4 FRAME codec (magic 0x184D2204) — the fifth
  * compressed corpus front door after gzip/zstd/xz/bzip2, written
  * against the public LZ4 Frame Format and LZ4 Block Format specs
  * (lz4.github.io/lz4; same open-spec discipline as
  * [[ZstdCodec]]/[[XzCodec]]/[[BzipCodec]]). LZ4 shows up in shard
  * interchange and Hadoop-adjacent corpora where decode speed beats
  * ratio (reference context: MONDAY-ETL-AUTOMATION app.py:46-102
  * ingests whatever the webhook feeds it — a corpus engine meets
  * `.jsonl.lz4` in the wild the same way it meets `.jsonl.zst`).
  *
  * Subset:
  *   - frames: version-01 descriptor, all four flag bits honored
  *     (B.Indep, B.Checksum, C.Size, C.Checksum), every declared
  *     checksum VERIFIED (descriptor HC byte, per-block XXH32,
  *     content XXH32), reserved bits loud, all four block max sizes;
  *   - blocks: full sequence decode (extended literal/match lengths,
  *     overlapping matches), linked blocks (B.Indep=0 — matches may
  *     reach into prior blocks of the same frame);
  *   - concatenated frames and skippable frames (0x184D2A5x);
  *   - OUT of subset, loud: dictionary frames (DictID flag — LZ4
  *     dicts are raw-content prefixes like zstd's; wire through
  *     [[ZstdCodec.decompressWithPrefix]]-style plumbing when a
  *     corpus needs them) and the legacy frame (0x184C2102, the
  *     pre-spec `lz4 -l` form).
  *
  * The fixture ENCODER (greedy hash-table matcher, 64 KiB blocks,
  * store-uncompressed fallback) emits spec-conformant frames that the
  * real lz4-java implementation on the Spark classpath must accept
  * byte-exact, and real `LZ4FrameOutputStream` output must decode
  * byte-exact here — the dual-oracle discipline of every codec in
  * this repo (Lz4CodecSpec; imports of lz4-java live ONLY in tests).
  *
  * Scale: one shard decodes in one task; member-grain splits come
  * from [[frameOffsets]], which walks DECLARED block sizes (LZ4
  * declares them, unlike bzip2) so split planning reads ~8 bytes per
  * block without decoding.
  */
object Lz4Codec {
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"lz4: $msg")

  private val FrameMagic = 0x184D2204
  private val LegacyMagic = 0x184C2102
  private val SkippableMagic = 0x184D2A50
  private val SkippableMask = 0xFFFFFFF0

  def isLz4(b: Array[Byte]): Boolean =
    b != null && b.length >= 7 && {
      val m = le32(b, 0)
      m == FrameMagic || (m & SkippableMask) == SkippableMagic
    }

  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private def le64(b: Array[Byte], p: Int): Long =
    (le32(b, p).toLong & 0xffffffffL) | ((le32(b, p + 4).toLong & 0xffffffffL) << 32)

  // ------------------------------------------------------------------
  // XXH32 (the frame format's checksum; public xxHash spec)
  // ------------------------------------------------------------------
  private val P1 = 0x9E3779B1 // 2654435761
  private val P2 = 0x85EBCA77 // 2246822519
  private val P3 = 0xC2B2AE3D // 3266489917
  private val P4 = 0x27D4EB2F // 668265263
  private val P5 = 0x165667B1 // 374761393

  def xxh32(b: Array[Byte], off: Int, len: Int, seed: Int): Int = {
    var p = off
    val end = off + len
    var acc = 0
    if (len >= 16) {
      var a1 = seed + P1 + P2
      var a2 = seed + P2
      var a3 = seed
      var a4 = seed - P1
      val limit = end - 16
      while (p <= limit) {
        a1 = Integer.rotateLeft(a1 + le32(b, p) * P2, 13) * P1
        a2 = Integer.rotateLeft(a2 + le32(b, p + 4) * P2, 13) * P1
        a3 = Integer.rotateLeft(a3 + le32(b, p + 8) * P2, 13) * P1
        a4 = Integer.rotateLeft(a4 + le32(b, p + 12) * P2, 13) * P1
        p += 16
      }
      acc = Integer.rotateLeft(a1, 1) + Integer.rotateLeft(a2, 7) +
        Integer.rotateLeft(a3, 12) + Integer.rotateLeft(a4, 18)
    } else acc = seed + P5
    acc += len
    while (p + 4 <= end) {
      acc = Integer.rotateLeft(acc + le32(b, p) * P3, 17) * P4
      p += 4
    }
    while (p < end) {
      acc = Integer.rotateLeft(acc + (b(p) & 0xff) * P5, 11) * P1
      p += 1
    }
    acc ^= acc >>> 15
    acc *= P2
    acc ^= acc >>> 13
    acc *= P3
    acc ^= acc >>> 16
    acc
  }

  // ------------------------------------------------------------------
  // Decode
  // ------------------------------------------------------------------
  /** Adaptive output buffer (content-sized growth — the BzipCodec ×10
    * allocation-churn lesson: never allocate the format maximum per
    * decode).
    */
  private final class Out(var buf: Array[Byte], var len: Int, val cap: Int) {
    def ensure(n: Int): Unit = {
      if (len + n > cap) fail(s"output over cap ($cap bytes)")
      if (len + n > buf.length) {
        var sz = buf.length
        while (sz < len + n) sz = math.min(cap, math.max(sz * 2, 64))
        buf = java.util.Arrays.copyOf(buf, sz)
      }
    }
  }

  /** Decode all frames; loud on any damage. `maxOut` caps total
    * decoded bytes (zip-bomb guard).
    */
  def decompress(b: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    val out = new Out(new Array[Byte](math.min(math.max(64, b.length * 3), maxOut)), 0, maxOut)
    var p = 0
    while (p < b.length) p = decodeTopLevel(b, p, out, want = -1)
    java.util.Arrays.copyOf(out.buf, out.len)
  }

  /** Best-effort decode: bytes of fully-decoded leading frames plus
    * the verified blocks of a damaged trailing frame (same
    * leading-prefix contract as the sibling codecs' tolerant paths).
    */
  def decompressTolerant(b: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    val out = new Out(new Array[Byte](math.min(math.max(64, b.length * 3), maxOut)), 0, maxOut)
    var p = 0
    try {
      while (p < b.length) p = decodeTopLevel(b, p, out, want = -1)
    } catch { case _: Exception => () }
    java.util.Arrays.copyOf(out.buf, out.len)
  }

  /** Decode only the first `want` bytes (best effort) — the bounded
    * sniff primitive for [[FormatDetect]]; block-grain stop, content
    * checksum skipped when stopping early (a sniff, not the decode
    * path — the ZstdCodec.decodePrefix pattern).
    */
  def decodePrefix(b: Array[Byte], want: Int): Array[Byte] = {
    if (b == null) return null
    val cap = want + (1 << 22) // one max-size block always fits past `want`
    val out = new Out(new Array[Byte](math.min(1 << 16, cap)), 0, cap)
    var p = 0
    try {
      while (p < b.length && out.len < want) p = decodeTopLevel(b, p, out, want = want)
    } catch { case _: Exception => () }
    java.util.Arrays.copyOf(out.buf, math.min(out.len, want))
  }

  private def decodeTopLevel(b: Array[Byte], at: Int, out: Out, want: Int): Int = {
    if (at + 4 > b.length) fail("truncated magic")
    val magic = le32(b, at)
    if ((magic & SkippableMask) == SkippableMagic) {
      if (at + 8 > b.length) fail("truncated skippable frame")
      val sz = le32(b, at + 4).toLong & 0xffffffffL
      val next = at + 8 + sz
      if (next > b.length) fail("skippable frame overruns input")
      next.toInt
    } else if (magic == LegacyMagic) {
      fail("legacy frame (0x184C2102) out of subset")
    } else if (magic == FrameMagic) {
      decodeFrame(b, at + 4, out, want)
    } else fail(f"bad magic 0x$magic%08x")
  }

  private def decodeFrame(b: Array[Byte], descAt: Int, out: Out, want: Int): Int = {
    var p = descAt
    if (p + 2 > b.length) fail("truncated frame descriptor")
    val flg = b(p) & 0xff
    if ((flg >> 6) != 1) fail(s"unsupported frame version ${flg >> 6}")
    if ((flg & 0x02) != 0) fail("reserved FLG bit set")
    val indep = (flg & 0x20) != 0
    val blockCk = (flg & 0x10) != 0
    val hasSize = (flg & 0x08) != 0
    val contentCk = (flg & 0x04) != 0
    val hasDict = (flg & 0x01) != 0
    val bd = b(p + 1) & 0xff
    if ((bd & 0x8f) != 0) fail("reserved BD bits set")
    val bmax = (bd >> 4) & 7
    if (bmax < 4 || bmax > 7) fail(s"invalid block max size code $bmax")
    val blockMax = 1 << (8 + 2 * bmax) // 4→64 KiB … 7→4 MiB
    p += 2
    var contentSize = -1L
    if (hasSize) {
      if (p + 8 > b.length) fail("truncated content size")
      contentSize = le64(b, p); p += 8
    }
    if (hasDict) fail("dictionary frames out of subset")
    if (p >= b.length) fail("truncated header checksum")
    val hc = (xxh32(b, descAt, p - descAt, 0) >>> 8) & 0xff
    if ((b(p) & 0xff) != hc) fail("frame descriptor checksum mismatch")
    p += 1
    val frameStart = out.len
    var done = false
    while (!done) {
      if (p + 4 > b.length) fail("truncated block size")
      val word = le32(b, p); p += 4
      if (word == 0) done = true
      else {
        val stored = word & 0x7fffffff
        val uncompressed = (word & 0x80000000) != 0
        if (stored > blockMax) fail("block over declared max")
        if (p.toLong + stored > b.length) fail("block overruns input")
        if (uncompressed) {
          out.ensure(stored)
          System.arraycopy(b, p, out.buf, out.len, stored)
          out.len += stored
        } else {
          // window floor: independent blocks may not reach before their
          // own start; linked blocks reach into the frame's history,
          // capped at the spec's 64 KB max match distance
          val floor = if (indep) out.len else math.max(frameStart, out.len - 65536)
          decodeBlock(b, p, stored, out, floor, blockMax)
        }
        p += stored
        if (blockCk) {
          if (p + 4 > b.length) fail("truncated block checksum")
          if (le32(b, p) != xxh32(b, p - stored, stored, 0)) fail("block checksum mismatch")
          p += 4
        }
        if (want >= 0 && out.len >= want) {
          // sniff stop: skip the remaining blocks structurally
          return skipRestOfFrame(b, p, blockCk, contentCk)
        }
      }
    }
    if (contentSize >= 0 && (out.len - frameStart).toLong != contentSize)
      fail(s"content size mismatch: declared $contentSize, decoded ${out.len - frameStart}")
    if (contentCk) {
      if (p + 4 > b.length) fail("truncated content checksum")
      if (le32(b, p) != xxh32(out.buf, frameStart, out.len - frameStart, 0))
        fail("content checksum mismatch")
      p += 4
    }
    p
  }

  /** After a sniff stop: walk the remaining blocks by declared size so
    * the caller's position lands on the next frame.
    */
  private def skipRestOfFrame(b: Array[Byte], at: Int, blockCk: Boolean, contentCk: Boolean): Int = {
    var p = at
    var done = false
    while (!done) {
      if (p + 4 > b.length) fail("truncated block size")
      val word = le32(b, p); p += 4
      if (word == 0) done = true
      else {
        val stored = word & 0x7fffffff
        // stored has no blockMax bound here — compare in Long so a
        // 0x7fffffff field fails loud instead of wrapping negative
        if (p.toLong + stored > b.length) fail("block overruns input")
        p += stored
        if (blockCk) p += 4
      }
    }
    if (contentCk) p += 4
    if (p > b.length) fail("truncated frame tail")
    p
  }

  /** LZ4 block: token-driven literal/match sequences; `floor` is the
    * lowest output offset matches may reach (block-independence
    * boundary).
    */
  private def decodeBlock(b: Array[Byte], at: Int, len: Int, out: Out,
      floor: Int, blockMax: Int): Unit = {
    var p = at
    val end = at + len
    val outStart = out.len
    while (p < end) {
      val token = b(p) & 0xff; p += 1
      var litLen = token >> 4
      if (litLen == 15) {
        var more = 255
        while (more == 255) {
          if (p >= end) fail("truncated literal length")
          more = b(p) & 0xff; p += 1
          litLen += more
        }
      }
      if (p + litLen > end) fail("literals overrun block")
      if (out.len - outStart + litLen > blockMax) fail("block decodes over max")
      out.ensure(litLen)
      System.arraycopy(b, p, out.buf, out.len, litLen)
      out.len += litLen
      p += litLen
      if (p < end) {
        if (p + 2 > end) fail("truncated match offset")
        val offset = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8); p += 2
        if (offset == 0) fail("zero match offset")
        if (out.len - offset < floor) fail("match reaches before window floor")
        var matchLen = (token & 0x0f) + 4
        if ((token & 0x0f) == 15) {
          var more = 255
          while (more == 255) {
            if (p >= end) fail("truncated match length")
            more = b(p) & 0xff; p += 1
            matchLen += more
          }
        }
        if (out.len - outStart + matchLen > blockMax) fail("block decodes over max")
        out.ensure(matchLen)
        var src = out.len - offset
        if (offset >= matchLen) {
          // non-overlapping: one block copy (the hot path — most
          // matches reference further back than their own length)
          System.arraycopy(out.buf, src, out.buf, out.len, matchLen)
        } else {
          // overlapping: the replicating byte walk the format requires
          var i = 0
          while (i < matchLen) {
            out.buf(out.len + i) = out.buf(src); src += 1; i += 1
          }
        }
        out.len += matchLen
      }
    }
  }

  // ------------------------------------------------------------------
  // Split planning
  // ------------------------------------------------------------------
  /** Byte offsets + lengths of concatenated frames — the member-grain
    * split plan. LZ4 declares every block's stored size, so this walk
    * reads ~8 bytes per block and NO block is decoded (cheaper than
    * bzip2's signature scan, same cost class as zstd's).
    */
  def frameOffsets(b: Array[Byte]): Array[(Long, Long)] = {
    if (!isLz4(b)) fail("not an lz4 payload")
    val res = Vector.newBuilder[(Long, Long)]
    var p = 0
    while (p < b.length) {
      val start = p
      if (p + 4 > b.length) fail("truncated magic")
      val magic = le32(b, p)
      if ((magic & SkippableMask) == SkippableMagic) {
        if (p + 8 > b.length) fail("truncated skippable frame")
        // size field is unsigned; a signed read of 0xFFFFFFF8 would
        // advance by zero/backwards and loop this walk forever
        val sz = le32(b, p + 4).toLong & 0xffffffffL
        val next = p + 8 + sz
        if (next > b.length) fail("skippable frame overruns input")
        p = next.toInt
      } else if (magic == FrameMagic) {
        var q = p + 4
        if (q + 2 > b.length) fail("truncated frame descriptor")
        val flg = b(q) & 0xff
        if ((flg >> 6) != 1) fail("unsupported frame version")
        val blockCk = (flg & 0x10) != 0
        val hasSize = (flg & 0x08) != 0
        val contentCk = (flg & 0x04) != 0
        val hasDict = (flg & 0x01) != 0
        q += 2
        if (hasSize) q += 8
        if (hasDict) q += 4
        q += 1 // HC
        p = skipRestOfFrame(b, q, blockCk, contentCk)
      } else fail(f"bad magic 0x$magic%08x")
      res += ((start.toLong, (p - start).toLong))
    }
    res.result().toArray
  }

  // ------------------------------------------------------------------
  // Encoder (fixture writer — from scratch, dual-oracled in the spec)
  // ------------------------------------------------------------------
  private val HashLog = 13

  /** Greedy single-pass block compressor: 4-byte hash-table matcher,
    * 16-bit offsets, spec end-constraints (last 5 bytes literal, last
    * match starts ≥12 bytes from the end); returns null when the
    * block does not compress (caller stores it uncompressed, exactly
    * what the reference implementation does).
    */
  private def compressBlock(src: Array[Byte], from: Int, len: Int): Array[Byte] = {
    if (len < 13) return null
    val end = from + len
    val mfLimit = end - 12   // last match must START before this
    val matchLimit = end - 5 // matches may not extend past this
    val tab = new Array[Int](1 << HashLog)
    java.util.Arrays.fill(tab, -1)
    val out = new java.io.ByteArrayOutputStream(len)
    def read32(p: Int): Int = le32(src, p)
    def hash(v: Int): Int = (v * P1) >>> (32 - HashLog)
    def writeSeq(litFrom: Int, litLen: Int, offset: Int, matchLen: Int): Unit = {
      val mlCode = if (matchLen < 0) 0 else matchLen - 4
      val token = (math.min(litLen, 15) << 4) | (if (matchLen < 0) 0 else math.min(mlCode, 15))
      out.write(token)
      if (litLen >= 15) {
        var r = litLen - 15
        while (r >= 255) { out.write(255); r -= 255 }
        out.write(r)
      }
      out.write(src, litFrom, litLen)
      if (matchLen >= 0) {
        out.write(offset & 0xff); out.write((offset >> 8) & 0xff)
        if (mlCode >= 15) {
          var r = mlCode - 15
          while (r >= 255) { out.write(255); r -= 255 }
          out.write(r)
        }
      }
    }
    var anchor = from
    var pos = from
    while (pos < mfLimit) {
      val h = hash(read32(pos))
      val cand = tab(h)
      tab(h) = pos
      if (cand >= from && pos - cand <= 0xffff && read32(cand) == read32(pos)) {
        var ml = 4
        while (pos + ml < matchLimit && src(cand + ml) == src(pos + ml)) ml += 1
        writeSeq(anchor, pos - anchor, pos - cand, ml)
        anchor = pos + ml
        pos = anchor
      } else pos += 1
    }
    writeSeq(anchor, end - anchor, 0, -1) // trailing literals
    val res = out.toByteArray
    if (res.length >= len) null else res
  }

  /** One spec-conformant frame. `blockMaxCode` 4..7; flags toggle the
    * optional descriptor/checksum features so fixtures exercise every
    * parser branch. Blocks are INDEPENDENT (B.Indep=1) — the form
    * every real decoder, including lz4-java's, accepts.
    */
  def compressFrame(data: Array[Byte], blockMaxCode: Int = 4, withSize: Boolean = true,
      withContentCk: Boolean = true, withBlockCk: Boolean = false): Array[Byte] = {
    require(blockMaxCode >= 4 && blockMaxCode <= 7, s"block max code $blockMaxCode")
    val blockMax = 1 << (8 + 2 * blockMaxCode)
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    w32(FrameMagic)
    val flg = 0x40 | 0x20 | (if (withBlockCk) 0x10 else 0) |
      (if (withSize) 0x08 else 0) | (if (withContentCk) 0x04 else 0)
    val desc = new java.io.ByteArrayOutputStream()
    desc.write(flg)
    desc.write(blockMaxCode << 4)
    if (withSize) {
      var v = data.length.toLong
      (0 until 8).foreach { _ => desc.write((v & 0xff).toInt); v >>= 8 }
    }
    val db = desc.toByteArray
    out.write(db, 0, db.length)
    out.write((xxh32(db, 0, db.length, 0) >>> 8) & 0xff)
    var p = 0
    while (p < data.length) {
      val n = math.min(blockMax, data.length - p)
      val comp = compressBlock(data, p, n)
      val (payload, off, len, word) =
        if (comp == null) (data, p, n, n | 0x80000000)
        else (comp, 0, comp.length, comp.length)
      w32(word)
      out.write(payload, off, len)
      if (withBlockCk) w32(xxh32(payload, off, len, 0))
      p += n
    }
    w32(0) // EndMark
    if (withContentCk) w32(xxh32(data, 0, data.length, 0))
    out.toByteArray
  }

  /** Multi-frame fixture in the [[GzipShard.synthJsonlGz]] shape: one
    * frame per member with the optional features rotating so every
    * parser branch (content size, content checksum, block checksum,
    * block max size) is exercised under the hash gate.
    */
  def synthJsonlLz4(seed: Long, nMembers: Int, linesPer: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    (0 until math.max(1, nMembers)).foreach { m =>
      val sb = new java.lang.StringBuilder()
      (0 until math.max(1, linesPer)).foreach { l =>
        sb.append("{\"id\": ").append(seed * 1000 + m * 10 + l)
          .append(", \"text\": \"doc ").append(seed).append(" m").append(m)
          .append(" l").append(l).append(" say \\\"hi\\\"\\tok\"")
          .append(", \"lang\": \"").append(if ((m + l) % 2 == 0) "en" else "fr")
          .append("\", \"score\": ").append((seed + m + l) % 100).append("}\n")
      }
      out.write(compressFrame(sb.toString.getBytes(UTF_8),
        blockMaxCode = 4 + (m % 4),
        withSize = m % 2 == 0,
        withContentCk = m % 3 != 2,
        withBlockCk = m % 3 == 0))
    }
    out.toByteArray
  }

  /** `.jsonl.lz4` shard → newline-joined `text` fields (tolerant; null
    * when nothing decodes or no line carries a text member).
    */
  def jsonlLz4Text(b: Array[Byte]): String = {
    if (!isLz4(b)) return null
    val raw = decompressTolerant(b)
    if (raw == null || raw.length == 0) return null
    val texts = new String(raw, UTF_8).split("\n")
      .iterator.map(GzipShard.textField).filter(_ != null).toSeq
    if (texts.isEmpty) null else texts.mkString("\n")
  }

  /** Full decoded UTF-8 text of all frames (tolerant) — the
    * `gunzip_text`/`unzstd_text`/`unxz_text`/`unbzip2_text` analog.
    */
  def unlz4Text(b: Array[Byte]): String = {
    if (!isLz4(b)) return null
    val raw = decompressTolerant(b)
    if (raw == null || raw.length == 0) null else new String(raw, UTF_8)
  }
}
