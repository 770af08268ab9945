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
  *   - the LEGACY frame (0x184C2102, what `lz4 -l` and old Hadoop
  *     emit): magic + size-prefixed independently-compressed 8 MiB
  *     blocks, no checksums, terminated by EOF or the next frame
  *     magic (fixtures pinned from the REAL `lz4 -l` CLI);
  *   - DICTIONARY decode ([[decompressWithDict]]): raw-content-prefix
  *     dicts exactly like zstd's — independent blocks each see the
  *     dict as their only history, linked blocks see dict + prior
  *     frame output; a declared DictID is enforced against the
  *     caller's expected id (wrong/absent dict loud). Fixtures pinned
  *     from the real `lz4 -D` CLI.
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

  /** Legacy frames hold blocks of exactly this much decoded content
    * (except the last); a declared block size over the matching
    * compress bound is structurally impossible and read as damage.
    */
  private val LegacyBlockMax = 8 << 20
  private val LegacyBound = LegacyBlockMax + LegacyBlockMax / 255 + 16

  def isLz4(b: Array[Byte]): Boolean =
    b != null && b.length >= 7 && {
      val m = le32(b, 0)
      m == FrameMagic || m == LegacyMagic || (m & SkippableMask) == SkippableMagic
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
    while (p < b.length) p = decodeTopLevel(b, p, out, want = -1, dict = null, expectId = -1L)
    java.util.Arrays.copyOf(out.buf, out.len)
  }

  /** Decode with a raw-content dictionary (the `lz4 -D` /
    * `LZ4F_decompress_usingDict` surface): the dict's last 64 KiB is
    * the initial match window of every frame. When a frame DECLARES a
    * DictID and the caller passes `expectId >= 0`, a mismatch is loud
    * at the header — the wrong-dictionary guard; with raw-content
    * dicts and no declared id, wrong content surfaces at the content
    * checksum instead.
    */
  def decompressWithDict(b: Array[Byte], dict: Array[Byte], expectId: Long = -1L,
      maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    require(dict != null, "decompressWithDict requires a dictionary")
    val out = new Out(new Array[Byte](math.min(math.max(64, b.length * 3), maxOut)), 0, maxOut)
    var p = 0
    while (p < b.length) p = decodeTopLevel(b, p, out, want = -1, dict = dict, expectId = expectId)
    java.util.Arrays.copyOf(out.buf, out.len)
  }

  /** Best-effort [[decompressWithDict]]: intact leading frames kept
    * (the sibling tolerant-surface contract).
    */
  def decompressWithDictTolerant(b: Array[Byte], dict: Array[Byte], expectId: Long = -1L,
      maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    require(dict != null, "decompressWithDictTolerant requires a dictionary")
    val out = new Out(new Array[Byte](math.min(math.max(64, b.length * 3), maxOut)), 0, maxOut)
    var p = 0
    try {
      while (p < b.length) p = decodeTopLevel(b, p, out, want = -1, dict = dict, expectId = expectId)
    } catch { case _: Exception => () }
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
      while (p < b.length) p = decodeTopLevel(b, p, out, want = -1, dict = null, expectId = -1L)
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
    val cap = want + LegacyBlockMax // one max-size block always fits past `want`
    val out = new Out(new Array[Byte](math.min(1 << 16, cap)), 0, cap)
    var p = 0
    try {
      while (p < b.length && out.len < want) p = decodeTopLevel(b, p, out, want = want, dict = null, expectId = -1L)
    } catch { case _: Exception => () }
    java.util.Arrays.copyOf(out.buf, math.min(out.len, want))
  }

  private def decodeTopLevel(b: Array[Byte], at: Int, out: Out, want: Int,
      dict: Array[Byte], expectId: Long): Int = {
    if (at + 4 > b.length) fail("truncated magic")
    val magic = le32(b, at)
    if ((magic & SkippableMask) == SkippableMagic) {
      if (at + 8 > b.length) fail("truncated skippable frame")
      val sz = le32(b, at + 4).toLong & 0xffffffffL
      val next = at + 8 + sz
      if (next > b.length) fail("skippable frame overruns input")
      next.toInt
    } else if (magic == LegacyMagic) {
      decodeLegacyFrame(b, at + 4, out, want)
    } else if (magic == FrameMagic) {
      decodeFrame(b, at + 4, out, want, dict, expectId)
    } else fail(f"bad magic 0x$magic%08x")
  }

  /** Legacy frame (`lz4 -l`): after the magic, a bare run of
    * [LE32 compressed size][block] with every block independently
    * compressed to exactly 8 MiB of content (the last one less); no
    * checksums, no terminator — the frame ends at EOF or where the
    * next 4-byte word is itself a frame magic (magics exceed the
    * 8 MiB compress bound, so the read is unambiguous).
    */
  private def decodeLegacyFrame(b: Array[Byte], at: Int, out: Out, want: Int): Int = {
    var p = at
    var done = false
    while (!done) {
      if (p + 4 > b.length) {
        if (p == b.length) done = true
        else fail("truncated legacy block size")
      } else {
        val word = le32(b, p)
        if (word == FrameMagic || word == LegacyMagic || (word & SkippableMask) == SkippableMagic) {
          done = true // next frame begins; outer loop dispatches it
        } else {
          val size = word.toLong & 0xffffffffL
          if (size > LegacyBound) fail(s"legacy block size $size over bound")
          p += 4
          if (p.toLong + size > b.length) fail("legacy block overruns input")
          if (want < 0 || out.len < want) // sniff stop: walk sizes only
            decodeBlock(b, p, size.toInt, out, out.len, out.len, LegacyBlockMax, null)
          p += size.toInt
        }
      }
    }
    p
  }

  private def decodeFrame(b: Array[Byte], descAt: Int, out: Out, want: Int,
      dict: Array[Byte], expectId: Long): Int = {
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
    if (hasDict) {
      if (p + 4 > b.length) fail("truncated dictionary id")
      val declaredId = le32(b, p).toLong & 0xffffffffL
      p += 4
      if (dict == null)
        fail(f"dictionary frame (DictID 0x$declaredId%08x) requires a dictionary (decompressWithDict)")
      if (expectId >= 0 && declaredId != expectId)
        fail(f"wrong dictionary: frame declares id 0x$declaredId%08x, caller expects 0x$expectId%08x")
    }
    if (p >= b.length) fail("truncated header checksum")
    val hc = (xxh32(b, descAt, p - descAt, 0) >>> 8) & 0xff
    if ((b(p) & 0xff) != hc) fail("frame descriptor checksum mismatch")
    p += 1
    val frameStart = out.len
    // raw-content dictionary: its last 64 KiB logically precedes the
    // frame. Independent blocks see it as their ONLY history; linked
    // blocks see dict + prior frame output (spec: "when blocks are
    // independent, each block is initialized with the dictionary;
    // when linked, the dictionary is used once, at the beginning").
    val dictWin = if (dict == null) 0 else math.min(dict.length, 65536)
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
          // window base: the boundary between in-buffer history and the
          // external dictionary. Independent blocks may not reach before
          // their own start; linked blocks reach into the frame's
          // history, capped at the spec's 64 KB max match distance.
          // Matches below `base` (only possible with a dict) read the
          // dictionary's tail instead of the output buffer.
          val base = if (indep) out.len else math.max(frameStart, out.len - 65536)
          val floor =
            if (dict == null) base
            else if (indep) base - dictWin
            else math.max(frameStart - dictWin, out.len - 65536)
          decodeBlock(b, p, stored, out, base, floor, blockMax, dict)
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

  /** LZ4 block: token-driven literal/match sequences. `floor` is the
    * lowest logical offset matches may reach; `base` is the boundary
    * below which a match reads the external `dict`'s tail instead of
    * the output buffer (base == floor when no dict — the plain
    * block-independence boundary).
    */
  private def decodeBlock(b: Array[Byte], at: Int, len: Int, out: Out,
      base: Int, floor: Int, blockMax: Int, dict: Array[Byte]): Unit = {
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
        if (src >= base) {
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
        } else {
          // match starts in the external dictionary (floor < base only
          // when a dict is present); may span into the output buffer
          val dictMap = dict.length - base // dict index of logical position s is s + dictMap
          var i = 0
          var s = src
          while (i < matchLen) {
            out.buf(out.len + i) = if (s < base) dict(s + dictMap) else out.buf(s)
            s += 1; i += 1
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
      } else if (magic == LegacyMagic) {
        var q = p + 4
        var stop = false
        while (!stop) {
          if (q + 4 > b.length) {
            if (q == b.length) stop = true else fail("truncated legacy block size")
          } else {
            val w = le32(b, q)
            if (w == FrameMagic || w == LegacyMagic || (w & SkippableMask) == SkippableMagic) stop = true
            else {
              val size = w.toLong & 0xffffffffL
              if (size > LegacyBound) fail(s"legacy block size $size over bound")
              if (q + 4 + size > b.length) fail("legacy block overruns input")
              q += 4 + size.toInt
            }
          }
        }
        p = q
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
    * what the reference implementation does). `histFrom < from` marks
    * `src[histFrom, from)` as history-only (a dictionary window or
    * prior linked-block content): matches may START there but output
    * covers only `[from, from+len)`.
    */
  private def compressBlock(src: Array[Byte], from: Int, len: Int, histFrom: Int = -1): Array[Byte] = {
    if (len < 13) return null
    val hf = if (histFrom < 0) from else histFrom
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
    // seed the table over the history window so data matches can
    // reference it (the dictionary-compression path)
    var hp = hf
    while (hp + 4 <= from) { tab(hash(read32(hp))) = hp; hp += 1 }
    var anchor = from
    var pos = from
    while (pos < mfLimit) {
      val h = hash(read32(pos))
      val cand = tab(h)
      tab(h) = pos
      if (cand >= hf && pos - cand <= 0xffff && read32(cand) == read32(pos)) {
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
    * every real decoder, including lz4-java's, accepts. With `dict`,
    * every block is compressed against the dictionary's last 64 KiB
    * as its only history (the independent-blocks dict semantic);
    * `dictId >= 0` additionally DECLARES the id in the descriptor so
    * wrong-dictionary decode is loud at the header.
    */
  def compressFrame(data: Array[Byte], blockMaxCode: Int = 4, withSize: Boolean = true,
      withContentCk: Boolean = true, withBlockCk: Boolean = false,
      dict: Array[Byte] = null, dictId: Long = -1L): Array[Byte] = {
    require(blockMaxCode >= 4 && blockMaxCode <= 7, s"block max code $blockMaxCode")
    require(dictId < 0 || dict != null, "dictId declared without a dictionary")
    val blockMax = 1 << (8 + 2 * blockMaxCode)
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    w32(FrameMagic)
    val flg = 0x40 | 0x20 | (if (withBlockCk) 0x10 else 0) |
      (if (withSize) 0x08 else 0) | (if (withContentCk) 0x04 else 0) |
      (if (dictId >= 0) 0x01 else 0)
    val desc = new java.io.ByteArrayOutputStream()
    desc.write(flg)
    desc.write(blockMaxCode << 4)
    if (withSize) {
      var v = data.length.toLong
      (0 until 8).foreach { _ => desc.write((v & 0xff).toInt); v >>= 8 }
    }
    if (dictId >= 0) {
      var v = dictId
      (0 until 4).foreach { _ => desc.write((v & 0xff).toInt); v >>= 8 }
    }
    val db = desc.toByteArray
    out.write(db, 0, db.length)
    out.write((xxh32(db, 0, db.length, 0) >>> 8) & 0xff)
    val dictWin = if (dict == null) 0 else math.min(dict.length, 65536)
    var p = 0
    while (p < data.length) {
      val n = math.min(blockMax, data.length - p)
      val comp =
        if (dict == null) compressBlock(data, p, n)
        else {
          // window = dict tail ++ block content, history-only prefix
          val buf = new Array[Byte](dictWin + n)
          System.arraycopy(dict, dict.length - dictWin, buf, 0, dictWin)
          System.arraycopy(data, p, buf, dictWin, n)
          compressBlock(buf, dictWin, n, histFrom = 0)
        }
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

  /** One legacy frame (`lz4 -l` form): magic + size-prefixed
    * independently-compressed blocks, nothing else. The canonical
    * block size is 8 MiB; fixtures pass a smaller one to exercise the
    * multi-block walk without megabyte inputs (real decoders accept
    * any per-block content size up to 8 MiB — the format carries no
    * declared content length). Legacy has NO stored-uncompressed
    * escape, so incompressible blocks are emitted as a literal-only
    * sequence (what the reference does, modulo its compress bound).
    */
  def compressFrameLegacy(data: Array[Byte], blockSize: Int = LegacyBlockMax): Array[Byte] = {
    require(blockSize > 0 && blockSize <= LegacyBlockMax, s"legacy block size $blockSize")
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    w32(LegacyMagic)
    var p = 0
    while (p < data.length) {
      val n = math.min(blockSize, data.length - p)
      var comp = compressBlock(data, p, n)
      if (comp == null) {
        // literal-only sequence: token with litLen only, no match
        val lit = new java.io.ByteArrayOutputStream(n + 8)
        lit.write(math.min(n, 15) << 4)
        if (n >= 15) {
          var r = n - 15
          while (r >= 255) { lit.write(255); r -= 255 }
          lit.write(r)
        }
        lit.write(data, p, n)
        comp = lit.toByteArray
      }
      w32(comp.length)
      out.write(comp, 0, comp.length)
      p += n
    }
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
      out.write(compressFrame(jsonlLines(seed, m, linesPer),
        blockMaxCode = 4 + (m % 4),
        withSize = m % 2 == 0,
        withContentCk = m % 3 != 2,
        withBlockCk = m % 3 == 0))
    }
    out.toByteArray
  }

  private def jsonlLines(seed: Long, m: Int, linesPer: Int): Array[Byte] = {
    val sb = new java.lang.StringBuilder()
    (0 until math.max(1, linesPer)).foreach { l =>
      sb.append("{\"id\": ").append(seed * 1000 + m * 10 + l)
        .append(", \"text\": \"doc ").append(seed).append(" m").append(m)
        .append(" l").append(l).append(" say \\\"hi\\\"\\tok\"")
        .append(", \"lang\": \"").append(if ((m + l) % 2 == 0) "en" else "fr")
        .append("\", \"score\": ").append((seed + m + l) % 100).append("}\n")
    }
    sb.toString.getBytes(UTF_8)
  }

  /** Multi-frame fixture ALTERNATING legacy and modern frames — the
    * mixed-concatenation shape real `lz4` produces when old and new
    * writers append to one shard. Legacy members use a small block
    * size so the multi-block legacy walk is exercised at fixture
    * scale.
    */
  def synthJsonlLz4Legacy(seed: Long, nMembers: Int, linesPer: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    (0 until math.max(1, nMembers)).foreach { m =>
      val data = jsonlLines(seed, m, linesPer)
      if (m % 2 == 0) out.write(compressFrameLegacy(data, blockSize = 96))
      else out.write(compressFrame(data, blockMaxCode = 4 + (m % 4)))
    }
    out.toByteArray
  }

  /** The shared raw-content dictionary of the dict-compressed fixture
    * shards (the [[ZstdCodec.jsonlDict]] analog) and its declared id.
    */
  val jsonlDict: Array[Byte] =
    ("{\"id\": 1234567890, \"text\": \"doc 1234567890 m0 l0 say \\\"hi\\\"\\tok\", \"lang\": \"en\", \"score\": 42}\n" +
      "{\"id\": 987654321, \"text\": \"doc 987654321 m1 l1 say \\\"hi\\\"\\tok\", \"lang\": \"fr\", \"score\": 7}\n")
      .getBytes(UTF_8)
  val JsonlDictId: Long = 0x4C5A4454L // "LZDT"

  /** Dictionary-compressed multi-frame fixture: every member frame's
    * blocks reach back into [[jsonlDict]] AND declare [[JsonlDictId]],
    * so decoding without the dictionary (or with the wrong id) is loud
    * at the frame header.
    */
  def synthJsonlLz4Dict(seed: Long, nMembers: Int, linesPer: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    (0 until math.max(1, nMembers)).foreach { m =>
      out.write(compressFrame(jsonlLines(seed, m, linesPer),
        blockMaxCode = 4, dict = jsonlDict, dictId = JsonlDictId))
    }
    out.toByteArray
  }

  /** Decoded UTF-8 text of a dictionary-compressed shard — frames
    * decoded against [[jsonlDict]] with [[JsonlDictId]] enforced,
    * keeping intact LEADING frames on trailing damage; null for
    * non-lz4 bytes or when nothing decodes.
    */
  def unlz4DictText(b: Array[Byte]): String = {
    if (!isLz4(b)) return null
    val raw = decompressWithDictTolerant(b, jsonlDict, JsonlDictId)
    if (raw == null || raw.length == 0) null else new String(raw, UTF_8)
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
