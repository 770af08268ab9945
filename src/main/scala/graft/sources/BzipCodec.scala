package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** From-scratch pure-JVM bzip2 codec — no library beyond `java.*`.
  *
  * Why it exists: Wikipedia publishes its dumps as
  * `pages-articles-multistream.xml.bz2` (the direct consumer here is
  * [[WikiCodec.dumpPages]]), and older pretraining corpus releases
  * ship `.jsonl.bz2` shards. Round 14's boundary audit found bzip2
  * neither decoded nor detected, so a bz2 shard silently fell through
  * to "text"/"binary" — violating the repo's own quarantine principle.
  *
  * The format is fully open (no patents): per-stream `BZh{1-9}`
  * header, then self-contained blocks of RLE1 → BWT → MTF+RLE2 →
  * Huffman (2-6 tables, re-selected every 50 symbols), each guarded by
  * a CRC32 (MSB-first 0x04c11db7 variant) over the ORIGINAL bytes,
  * with a chained stream CRC at the end. Blocks are bit-packed;
  * concatenated streams (the "multistream" dump form) are byte-aligned
  * because each stream is a whole number of bytes on disk.
  *
  * Decoder: complete for the modern subset — the deprecated
  * "randomized" block mode (removed from the encoder in bzip2 0.9.5,
  * never emitted since) fails loudly rather than decoding garbage.
  * Inverse BWT is the standard O(n) next-vector walk; RLE1 inversion
  * and the block CRC run inside the same walk, so [[decodePrefix]] can
  * stop mid-block for the format sniff.
  *
  * Encoder: a real from-scratch compressor (rotation sort via prefix
  * doubling, canonical length-limited Huffman) used for deterministic
  * fixtures — the oracle-1 direction of the dual-oracle discipline
  * (our streams must be accepted byte-exact by commons-compress's
  * `BZip2CompressorInputStream`, which ships on the Spark classpath;
  * the library is referenced ONLY from test code).
  *
  * At 100 TB: one shard = one task is the parallelism grain; the
  * multistream form fans out to member-grain splits via
  * [[streamOffsets]] (the byte-aligned 10-byte `BZh`+block-magic
  * signature scan — the same heuristic Hadoop's splittable Bzip2Codec
  * uses; a false positive is ~2^-80 per aligned offset and any one
  * fails loudly at member decode). Unlike zstd/xz there are no
  * declared sizes, so this scan is the ONLY no-decode split plan bz2
  * admits.
  *
  * Reference behavior: the reference app (app.py) has no compression
  * handling at all; this front door is part of the 100 TB corpus
  * brief, not reference parity.
  */
object BzipCodec {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException("bzip2: " + msg)

  def isBzip2(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && b(0) == 'B' && b(1) == 'Z' && b(2) == 'h' &&
      b(3) >= '1' && b(3) <= '9'

  // ------------------------------------------------------------------
  // bzip2 CRC32: polynomial 0x04c11db7, MSB-first (NOT the zlib
  // reflected variant), init 0xffffffff, final complement.
  // ------------------------------------------------------------------

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) { c = (c << 1) ^ (if ((c & 0x80000000) != 0) 0x04c11db7 else 0); k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  private def crcUpdate(crc: Int, byte: Int): Int =
    (crc << 8) ^ CrcTable(((crc >>> 24) ^ byte) & 0xff)

  // ------------------------------------------------------------------
  // MSB-first bit IO
  // ------------------------------------------------------------------

  private final class BitIn(val b: Array[Byte]) {
    var bitPos: Long = 0L
    def bit(): Int = {
      val byteAt = (bitPos >>> 3).toInt
      if (byteAt >= b.length) fail("truncated stream")
      val r = (b(byteAt) >> (7 - (bitPos & 7).toInt)) & 1
      bitPos += 1
      r
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def alignByte(): Unit = bitPos = (bitPos + 7) & ~7L
    def bytePos: Int = (bitPos >>> 3).toInt
    def atEnd: Boolean = bytePos >= b.length
  }

  private final class BitOut {
    private val bos = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1)
        nAcc += 1
        if (nAcc == 8) { bos.write(acc); acc = 0; nAcc = 0 }
        i -= 1
      }
    }
    def finishByte(): Array[Byte] = {
      if (nAcc > 0) { bos.write(acc << (8 - nAcc)); acc = 0; nAcc = 0 }
      bos.toByteArray
    }
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  private final class Out(var buf: Array[Byte], var len: Int, val cap: Int) {
    def ensure(extra: Int): Unit = {
      if (len + extra > cap) fail(s"decoded output over cap $cap")
      if (len + extra > buf.length) {
        var n = math.max(buf.length * 2, 64)
        while (n < len + extra) n *= 2
        buf = java.util.Arrays.copyOf(buf, math.min(n.toLong, cap.toLong).toInt)
      }
    }
    def put(byte: Int): Unit = { ensure(1); buf(len) = byte.toByte; len += 1 }
  }

  private val BlockMagicHi = 0x314159; private val BlockMagicLo = 0x265359
  private val EndMagicHi = 0x177245; private val EndMagicLo = 0x385090
  private val MaxHuffLen = 23 // BZ_MAX_CODE_LEN

  /** Decode all concatenated streams; loud on any damage. `maxOut`
    * caps total decoded size (zip-bomb guard).
    */
  def decompress(b: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    val out = new Out(new Array[Byte](math.min(math.max(64, b.length * 3), maxOut)), 0, maxOut)
    var at = 0
    while (at < b.length) at = decodeStream(b, at, out, -1)
    java.util.Arrays.copyOf(out.buf, out.len)
  }

  /** Best-effort decode: bytes recovered before the first damage. */
  def decompressTolerant(b: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    val out = new Out(new Array[Byte](math.min(math.max(64, b.length * 3), maxOut)), 0, maxOut)
    var at = 0
    try {
      while (at < b.length) at = decodeStream(b, at, out, -1)
    } catch { case _: Exception => () }
    java.util.Arrays.copyOf(out.buf, out.len)
  }

  /** Decode only the first `want` bytes (best effort) — the bounded
    * format-sniff primitive, stopping mid-block inside the inverse-BWT
    * walk (CRC checks skipped; this is a sniff, not the decode path).
    */
  def decodePrefix(b: Array[Byte], want: Int): Array[Byte] = {
    if (b == null) return null
    val out = new Out(new Array[Byte](math.min(1 << 16, want)), 0, want)
    var at = 0
    try {
      while (at < b.length && out.len < want) at = decodeStream(b, at, out, want)
    } catch { case _: Exception => () }
    java.util.Arrays.copyOf(out.buf, math.min(out.len, want))
  }

  /** Decode one stream starting at byte `at`; returns the offset just
    * past it. `prefixWant` ≥ 0 enables early-stop sniff mode.
    */
  private def decodeStream(b: Array[Byte], at: Int, out: Out, prefixWant: Int): Int = {
    if (at + 4 > b.length) fail("truncated stream header")
    if (!(b(at) == 'B' && b(at + 1) == 'Z' && b(at + 2) == 'h')) fail("bad magic")
    val level = b(at + 3) - '0'
    if (level < 1 || level > 9) fail(s"bad block-size digit '${b(at + 3).toChar}'")
    val blockMax = level * 100000
    val in = new BitIn(b)
    in.bitPos = (at + 4).toLong << 3
    var combined = 0
    var done = false
    while (!done) {
      val hi = in.bits(24); val lo = in.bits(24)
      if (hi == EndMagicHi && lo == EndMagicLo) {
        val want = in.bits(32)
        if (prefixWant < 0 && want != combined)
          fail(f"stream CRC mismatch (got 0x$combined%08x want 0x$want%08x)")
        done = true
      } else if (hi == BlockMagicHi && lo == BlockMagicLo) {
        val blockCrc = decodeBlock(in, out, blockMax, prefixWant)
        combined = ((combined << 1) | (combined >>> 31)) ^ blockCrc
        if (prefixWant >= 0 && out.len >= prefixWant) return b.length // sniff: stop walking
      } else fail(f"bad block magic 0x$hi%06x$lo%06x")
    }
    in.alignByte()
    in.bytePos
  }

  /** One block: Huffman/MTF/RLE2 decode into the BWT'd byte array,
    * then the O(n) next-vector inverse-BWT walk with inline RLE1
    * inversion and CRC. Returns the block CRC (computed, and verified
    * against the stored one unless sniffing).
    */
  private def decodeBlock(in: BitIn, out: Out, blockMax: Int, prefixWant: Int): Int = {
    val storedCrc = in.bits(32)
    if (in.bit() != 0)
      fail("randomized blocks out of subset (deprecated since bzip2 0.9.5, never emitted since)")
    val origPtr = in.bits(24)

    // symbol map: 16-bit group mask, then 16 bits per used group
    val inUse = new Array[Boolean](256)
    val groups16 = new Array[Boolean](16)
    var i = 0
    while (i < 16) { groups16(i) = in.bit() == 1; i += 1 }
    i = 0
    while (i < 16) {
      if (groups16(i)) {
        var j = 0
        while (j < 16) { inUse(i * 16 + j) = in.bit() == 1; j += 1 }
      }
      i += 1
    }
    val seqToUnseq = (0 until 256).filter(inUse).toArray
    val nInUse = seqToUnseq.length
    if (nInUse == 0) fail("empty symbol map")
    val alphaSize = nInUse + 2
    val eob = alphaSize - 1

    val nGroups = in.bits(3)
    if (nGroups < 2 || nGroups > 6) fail(s"bad group count $nGroups")
    val nSelectors = in.bits(15)
    if (nSelectors < 1) fail("no selectors")

    // selectors, MTF-coded over group indices, each as unary 1s + 0
    val selectors = new Array[Int](nSelectors)
    val gMtf = Array.tabulate(nGroups)(identity)
    i = 0
    while (i < nSelectors) {
      var j = 0
      while (in.bit() == 1) { j += 1; if (j >= nGroups) fail("selector over group count") }
      val g = gMtf(j)
      while (j > 0) { gMtf(j) = gMtf(j - 1); j -= 1 }
      gMtf(0) = g
      selectors(i) = g
      i += 1
    }

    // per-group delta-coded code lengths → canonical decode tables
    val lens = Array.ofDim[Int](nGroups, alphaSize)
    var g = 0
    while (g < nGroups) {
      var curr = in.bits(5)
      var s = 0
      while (s < alphaSize) {
        while (in.bit() == 1) { if (in.bit() == 1) curr -= 1 else curr += 1 }
        if (curr < 1 || curr > MaxHuffLen) fail(s"code length $curr out of range")
        lens(g)(s) = curr
        s += 1
      }
      g += 1
    }
    // canonical: firstCode(l) = (firstCode(l-1)+count(l-1)) << 1;
    // decode by extending until v <= limit(l); symbol = perm(shorter(l) + v - firstCode(l))
    val minLen = new Array[Int](nGroups); val maxLen = new Array[Int](nGroups)
    val firstCode = Array.ofDim[Int](nGroups, MaxHuffLen + 2)
    val limit = Array.ofDim[Int](nGroups, MaxHuffLen + 2)
    val shorter = Array.ofDim[Int](nGroups, MaxHuffLen + 2)
    val perm = Array.ofDim[Int](nGroups, alphaSize)
    g = 0
    while (g < nGroups) {
      val count = new Array[Int](MaxHuffLen + 2)
      var mn = MaxHuffLen; var mx = 1
      var s = 0
      while (s < alphaSize) {
        val l = lens(g)(s); count(l) += 1
        if (l < mn) mn = l
        if (l > mx) mx = l
        s += 1
      }
      minLen(g) = mn; maxLen(g) = mx
      var pp = 0
      var l = mn
      while (l <= mx) {
        shorter(g)(l) = pp
        var s2 = 0
        while (s2 < alphaSize) { if (lens(g)(s2) == l) { perm(g)(pp) = s2; pp += 1 }; s2 += 1 }
        l += 1
      }
      var fc = 0
      l = mn
      while (l <= mx) {
        firstCode(g)(l) = fc
        limit(g)(l) = fc + count(l) - 1
        if (fc + count(l) > (1 << l)) fail("over-subscribed Huffman table")
        fc = (fc + count(l)) << 1
        l += 1
      }
      g += 1
    }

    // symbol stream: group re-selected every 50 symbols
    var groupNo = -1
    var groupPos = 0
    var gSel = 0
    def nextSym(): Int = {
      if (groupPos == 0) {
        groupNo += 1
        if (groupNo >= nSelectors) fail("ran past selector list")
        gSel = selectors(groupNo)
        groupPos = 50
      }
      groupPos -= 1
      var l = minLen(gSel)
      var v = in.bits(l)
      while (v > limit(gSel)(l)) {
        l += 1
        if (l > maxLen(gSel)) fail("bad Huffman code")
        v = (v << 1) | in.bit()
      }
      perm(gSel)(shorter(gSel)(l) + v - firstCode(gSel)(l))
    }

    // MTF + RLE2 decode into the BWT'd block. ll8 grows on demand:
    // sizing it to blockMax up front costs 900 KB PER DECODE at level
    // 9 regardless of actual block size — at shard scale that is pure
    // GC churn (measured: q_jsonl_bz2 ×10 swung 6×→18× between runs
    // on allocation pressure alone; adaptive sizing removes it)
    var ll8 = new Array[Byte](math.min(blockMax, 1 << 16))
    def ensureLl(n: Int): Unit = if (n > ll8.length) {
      var sz = ll8.length.toLong * 2
      while (sz < n) sz *= 2
      ll8 = java.util.Arrays.copyOf(ll8, math.min(sz, blockMax.toLong).toInt)
    }
    var nblock = 0
    val mtf = java.util.Arrays.copyOf(seqToUnseq, nInUse)
    var sym = nextSym()
    while (sym != eob) {
      if (sym <= 1) { // RUNA=0 / RUNB=1: bijective-base-2 zero-run length
        var es = 0L
        var n = 1L
        while (sym <= 1) {
          es += (sym + 1) * n
          n <<= 1
          if (es > blockMax || n > blockMax.toLong * 2) fail("zero run over block size")
          sym = nextSym()
        }
        val ch = mtf(0)
        if (nblock + es > blockMax) fail("block overrun")
        ensureLl(nblock + es.toInt)
        java.util.Arrays.fill(ll8, nblock, nblock + es.toInt, ch.toByte)
        nblock += es.toInt
      } else {
        val j = sym - 1
        if (j >= nInUse) fail("MTF index over alphabet")
        val ch = mtf(j)
        System.arraycopy(mtf, 0, mtf, 1, j)
        mtf(0) = ch
        if (nblock >= blockMax) fail("block overrun")
        ensureLl(nblock + 1)
        ll8(nblock) = ch.toByte
        nblock += 1
        sym = nextSym()
      }
    }
    if (nblock == 0) fail("empty block")
    if (origPtr >= nblock) fail("origPtr past block end")

    // inverse BWT: next-vector, then walk with inline RLE1 inversion
    val counts = new Array[Int](256)
    i = 0
    while (i < nblock) { counts(ll8(i) & 0xff) += 1; i += 1 }
    val base = new Array[Int](257)
    i = 0
    while (i < 256) { base(i + 1) = base(i) + counts(i); i += 1 }
    val next = new Array[Int](nblock)
    val seen = new Array[Int](256)
    i = 0
    while (i < nblock) {
      val ch = ll8(i) & 0xff
      next(base(ch) + seen(ch)) = i
      seen(ch) += 1
      i += 1
    }
    var p = next(origPtr)
    var k = 0
    var crc = 0xffffffff
    var prev = -1
    var rep = 0
    while (k < nblock && (prefixWant < 0 || out.len < prefixWant)) {
      val ch = ll8(p) & 0xff
      p = next(p)
      k += 1
      if (rep == 4) { // RLE1: 4 equal bytes, then a repeat-count byte
        var r = ch
        while (r > 0 && (prefixWant < 0 || out.len < prefixWant)) {
          out.put(prev)
          crc = crcUpdate(crc, prev)
          r -= 1
        }
        rep = 0
        prev = -1
      } else {
        if (ch == prev) rep += 1 else { rep = 1; prev = ch }
        out.put(ch)
        crc = crcUpdate(crc, ch)
      }
    }
    val computed = ~crc
    if (prefixWant < 0 && computed != storedCrc)
      fail(f"block CRC mismatch (got 0x$computed%08x want 0x$storedCrc%08x)")
    computed
  }

  // ------------------------------------------------------------------
  // Multistream split planning
  // ------------------------------------------------------------------

  /** Byte offsets + lengths of the concatenated streams — the
    * member-grain split plan for `pages-articles-multistream.xml.bz2`
    * and `.jsonl.bz2` shards. bz2 declares NO sizes, so this is the
    * byte-aligned 10-byte signature scan (stream header + first block
    * magic, or + end magic for an empty stream) — the same heuristic
    * Hadoop's splittable bzip2 input format relies on; a false
    * positive (~2^-80 per aligned offset) fails loudly at member
    * decode, never silently.
    */
  /** The 10-byte byte-aligned stream-start signature (header + first
    * block magic, or + end magic for an empty stream) — shared by the
    * member-grain scan and [[decodeBlockAt]]'s governing-header lookup.
    */
  private def streamStartsAt(b: Array[Byte], p: Int): Boolean = {
    val sig = StreamSigBlock
    val end = StreamSigEnd
    p + 10 <= b.length && b(p) == 'B' && b(p + 1) == 'Z' && b(p + 2) == 'h' &&
      b(p + 3) >= '1' && b(p + 3) <= '9' && {
        var i = 0
        var okS = true; var okE = true
        while (i < 6) {
          if ((b(p + 4 + i) & 0xff) != sig(i)) okS = false
          if ((b(p + 4 + i) & 0xff) != end(i)) okE = false
          i += 1
        }
        okS || okE
      }
  }
  private val StreamSigBlock = Array[Int](0x31, 0x41, 0x59, 0x26, 0x53, 0x59)
  private val StreamSigEnd = Array[Int](0x17, 0x72, 0x45, 0x38, 0x50, 0x90)

  def streamOffsets(b: Array[Byte]): Array[(Long, Long)] = {
    if (!isBzip2(b)) fail("not a bzip2 payload")
    val starts = Vector.newBuilder[Int]
    var p = 0
    while (p < b.length) { if (streamStartsAt(b, p)) starts += p; p += 1 }
    val ss = starts.result()
    if (ss.isEmpty || ss.head != 0) fail("no stream start at offset 0")
    ss.zipWithIndex.map { case (off, i) =>
      val endOff = if (i + 1 < ss.length) ss(i + 1) else b.length
      (off.toLong, (endOff - off).toLong)
    }.toArray
  }

  // ------------------------------------------------------------------
  // Block-grain random access (the single-stream form)
  // ------------------------------------------------------------------

  /** BIT offsets of every block magic in the payload — the split plan
    * for the form [[streamOffsets]] cannot help with: a plain
    * single-stream `.xml.bz2` (the non-multistream Wikipedia dump, any
    * `bzip2`-compressed file) is ONE stream of many blocks, and blocks
    * are self-contained (each carries its own symbol map and Huffman
    * tables) but start at arbitrary BIT positions. This is the same
    * bit-level 48-bit-magic scan Hadoop's splittable bzip2 input
    * format performs; a false positive is ~2^-48 per bit position and
    * fails loudly at [[decodeBlockAt]], never silently.
    *
    * Rolling 48-bit window, one pass over the payload.
    */
  def blockOffsetsBits(b: Array[Byte]): Array[Long] = {
    if (!isBzip2(b)) fail("not a bzip2 payload")
    val magic = 0x314159265359L
    val out = Vector.newBuilder[Long]
    var w = 0L
    val nBits = b.length.toLong << 3
    var i = 0L
    while (i < nBits) {
      val bit = (b((i >>> 3).toInt) >> (7 - (i & 7).toInt)) & 1
      w = ((w << 1) | bit) & 0xffffffffffffL
      if (i >= 47 && w == magic) out += i - 47
      i += 1
    }
    out.result().toArray
  }

  /** Decode ONE block standalone from its bit offset (as returned by
    * [[blockOffsetsBits]]); the block CRC is verified — a scan false
    * positive or a cross-block slice fails loudly. The stream header's
    * level digit bounds the block size; `maxOut` caps the decoded
    * bytes (RLE1 can expand past the BWT block size).
    */
  def decodeBlockAt(b: Array[Byte], bitOff: Long, maxOut: Int = 1 << 26): Array[Byte] = {
    if (!isBzip2(b)) fail("not a bzip2 payload")
    if (bitOff < 0 || (bitOff >>> 3) >= b.length) fail("block offset out of range")
    // the GOVERNING stream's level digit, not the first stream's: on a
    // multistream payload with mixed levels (the shape synthJsonlBz2
    // itself produces, rotating 1/5/9) a later higher-level stream's
    // blocks would spuriously overrun the first stream's smaller block
    // bound (ADVICE r15). Backward byte scan to the nearest stream-start
    // signature at or before the block's byte position — O(distance to
    // the owning header), exact at the signature's ~2^-80 FP rate, and
    // a false positive only risks a wrong bound, which the block-overrun
    // guard still catches loudly.
    var hp = math.min((bitOff >>> 3).toInt, b.length - 10)
    var lvl = -1
    while (hp >= 0 && lvl < 0) {
      if (streamStartsAt(b, hp)) lvl = b(hp + 3) - '0'
      hp -= 1
    }
    if (lvl < 0) fail("no stream header before block offset")
    val level = lvl
    val in = new BitIn(b)
    in.bitPos = bitOff
    val hi = in.bits(24); val lo = in.bits(24)
    if (hi != BlockMagicHi || lo != BlockMagicLo) fail("no block magic at offset")
    val out = new Out(new Array[Byte](1 << 14), 0, maxOut)
    decodeBlock(in, out, level * 100000, -1)
    java.util.Arrays.copyOf(out.buf, out.len)
  }

  /** Multi-BLOCK single-stream fixture: each chunk becomes its own
    * block inside ONE stream (a block boundary is the encoder's
    * choice, so this is a spec-valid stream any decoder accepts) —
    * the shape [[blockOffsetsBits]]/[[decodeBlockAt]] plan and read.
    */
  def compressBlocked(chunks: Seq[Array[Byte]], level: Int = 1): Array[Byte] = {
    require(level >= 1 && level <= 9, s"level $level")
    val out = new BitOut
    out.put('B', 8); out.put('Z', 8); out.put('h', 8); out.put('0' + level, 8)
    var combined = 0
    chunks.foreach { data =>
      if (data.nonEmpty) {
        // the cap applies to the RLE1 OUTPUT, not the raw chunk: RLE1
        // can EXPAND by 25% (a run of exactly 4 emits 5 bytes), so a
        // near-limit chunk of length-4 runs would otherwise emit a
        // block over the format maximum that every decoder — including
        // this repo's — rejects as "block overrun" (ADVICE r15)
        val rle = new java.io.ByteArrayOutputStream()
        val (consumed, crc) =
          rle1Into(data, 0, data.length, rle, 0xffffffff, level * 100000 - 20)
        require(consumed == data.length,
          s"chunk over block size after RLE1 ($consumed of ${data.length} bytes fit)")
        val blockCrc = ~crc
        combined = ((combined << 1) | (combined >>> 31)) ^ blockCrc
        encodeBlock(out, rle.toByteArray, blockCrc)
      }
    }
    out.put(EndMagicHi, 24); out.put(EndMagicLo, 24)
    out.put(combined, 32)
    out.finishByte()
  }

  /** Deterministic single-stream multi-BLOCK `.jsonl.bz2` fixture: the
    * same closed-form lines as [[synthJsonlBz2]], but one BLOCK per
    * member inside one stream — the non-multistream dump shape.
    */
  def synthJsonlBz2Blocked(seed: Long, nBlocks: Int, linesPer: Int): Array[Byte] = {
    val chunks = (0 until math.max(1, nBlocks)).map { m =>
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
    compressBlocked(chunks, 1)
  }

  // ------------------------------------------------------------------
  // Encoder (fixture writer — from scratch, oracled against
  // commons-compress in the spec)
  // ------------------------------------------------------------------

  /** Compress `data` as one bzip2 stream at the given level (block
    * size = level × 100 kB). Deterministic; 2 identical Huffman groups
    * (the format minimum), canonical length-limited (≤ 17) codes.
    */
  def compress(data: Array[Byte], level: Int = 9): Array[Byte] = {
    require(level >= 1 && level <= 9, s"level $level")
    val out = new BitOut
    out.put('B', 8); out.put('Z', 8); out.put('h', 8); out.put('0' + level, 8)
    val blockLimit = level * 100000 - 20
    var combined = 0
    var i = 0
    val n = data.length
    while (i < n) {
      // RLE1-encode one block's worth; CRC runs over the ORIGINAL bytes
      val rle = new java.io.ByteArrayOutputStream()
      val (next, crc) = rle1Into(data, i, n, rle, 0xffffffff, blockLimit)
      i = next
      val blockCrc = ~crc
      combined = ((combined << 1) | (combined >>> 31)) ^ blockCrc
      encodeBlock(out, rle.toByteArray, blockCrc)
    }
    out.put(EndMagicHi, 24); out.put(EndMagicLo, 24)
    out.put(combined, 32)
    out.finishByte()
  }

  /** RLE1-encode `data[i0..n)` run group by run group into `rle`
    * (stopping once `rle` reaches `sizeCap − 5`, so a whole group
    * always fits); the running block CRC covers the ORIGINAL bytes.
    * Returns (next input index, running CRC).
    */
  private def rle1Into(data: Array[Byte], i0: Int, n: Int,
      rle: java.io.ByteArrayOutputStream, crc0: Int, sizeCap: Int): (Int, Int) = {
    var i = i0
    var crc = crc0
    while (i < n && rle.size() < sizeCap - 5) {
      val b0 = data(i)
      var run = 1
      while (run < 259 && i + run < n && data(i + run) == b0) run += 1
      var c = 0
      while (c < run) { crc = crcUpdate(crc, b0 & 0xff); c += 1 }
      if (run >= 4) {
        rle.write(b0); rle.write(b0); rle.write(b0); rle.write(b0)
        rle.write(run - 4)
      } else {
        c = 0
        while (c < run) { rle.write(b0); c += 1 }
      }
      i += run
    }
    (i, crc)
  }

  /** BWT via prefix doubling on rotations (O(n log² n), exact). */
  private def bwtForward(block: Array[Byte]): (Array[Byte], Int) = {
    val n = block.length
    if (n == 1) return (block.clone(), 0)
    var rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = block(i) & 0xff; i += 1 }
    val keys = new Array[Long](n)
    // double until ranks reflect a full rotation (2k ≥ n) or are all
    // distinct; a PERIODIC block has equal rotations, which never
    // separate — the index low bits break those ties (any consistent
    // order of equal rotations yields the same BWT column)
    var k = 1
    var distinct = false
    while (!distinct && k < n) {
      // pack (rank, rank-at-+k, index) into one long: ranks < n ≤ 900k < 2^21
      i = 0
      while (i < n) {
        val r2 = rank((i + k) % n)
        keys(i) = (rank(i).toLong << 42) | (r2.toLong << 21) | i.toLong
        i += 1
      }
      java.util.Arrays.sort(keys)
      val newRank = new Array[Int](n)
      var r = 0
      i = 0
      while (i < n) {
        if (i > 0 && (keys(i) >>> 21) != (keys(i - 1) >>> 21)) r += 1
        newRank((keys(i) & 0x1fffffL).toInt) = r
        i += 1
      }
      rank = newRank
      distinct = r == n - 1
      k <<= 1
    }
    val sa = new Array[Int](n)
    i = 0
    while (i < n) { keys(i) = (rank(i).toLong << 21) | i.toLong; i += 1 }
    java.util.Arrays.sort(keys)
    i = 0
    while (i < n) { sa(i) = (keys(i) & 0x1fffffL).toInt; i += 1 }
    val out = new Array[Byte](n)
    var orig = -1
    i = 0
    while (i < n) {
      val s = sa(i)
      if (s == 0) orig = i
      out(i) = block((s + n - 1) % n)
      i += 1
    }
    (out, orig)
  }

  private def encodeBlock(out: BitOut, block: Array[Byte], blockCrc: Int): Unit = {
    if (block.length == 0) return
    val (bwt, origPtr) = bwtForward(block)
    val n = bwt.length

    // symbol map
    val inUse = new Array[Boolean](256)
    var i = 0
    while (i < n) { inUse(bwt(i) & 0xff) = true; i += 1 }
    val seqToUnseq = (0 until 256).filter(inUse).toArray
    val unseqToSeq = new Array[Int](256)
    i = 0
    while (i < seqToUnseq.length) { unseqToSeq(seqToUnseq(i)) = i; i += 1 }
    val nInUse = seqToUnseq.length
    val alphaSize = nInUse + 2
    val eob = alphaSize - 1

    // MTF + RLE2
    val symBuf = new Array[Int](n + 2)
    var nSyms = 0
    val mtf = java.util.Arrays.copyOf(seqToUnseq, nInUse)
    var zPend = 0
    def flushZeros(): Unit = {
      if (zPend > 0) {
        var z = zPend - 1
        var more = true
        while (more) {
          symBuf(nSyms) = z & 1; nSyms += 1 // 0=RUNA, 1=RUNB
          if (z < 2) more = false else z = (z - 2) / 2
        }
        zPend = 0
      }
    }
    i = 0
    while (i < n) {
      val ch = bwt(i) & 0xff
      var j = 0
      while (mtf(j) != ch) j += 1
      if (j == 0) zPend += 1
      else {
        flushZeros()
        symBuf(nSyms) = j + 1; nSyms += 1
        System.arraycopy(mtf, 0, mtf, 1, j)
        mtf(0) = ch
      }
      i += 1
    }
    flushZeros()
    symBuf(nSyms) = eob; nSyms += 1

    // one canonical length-limited Huffman table, duplicated (format
    // minimum is 2 groups; the decoder never requires them to differ)
    val freq = new Array[Int](alphaSize)
    i = 0
    while (i < nSyms) { freq(symBuf(i)) += 1; i += 1 }
    val lens = makeCodeLengths(freq, 17)
    val codes = canonicalCodes(lens)

    // block header
    out.put(BlockMagicHi, 24); out.put(BlockMagicLo, 24)
    out.put(blockCrc, 32)
    out.put(0, 1) // not randomized
    out.put(origPtr, 24)
    var g16 = 0
    i = 0
    while (i < 16) {
      var any = false
      var j = 0
      while (j < 16) { if (inUse(i * 16 + j)) any = true; j += 1 }
      if (any) g16 |= 1 << (15 - i)
      i += 1
    }
    out.put(g16, 16)
    i = 0
    while (i < 16) {
      if ((g16 & (1 << (15 - i))) != 0) {
        var j = 0
        while (j < 16) { out.put(if (inUse(i * 16 + j)) 1 else 0, 1); j += 1 }
      }
      i += 1
    }
    val nGroups = 2
    val nSelectors = (nSyms + 49) / 50
    out.put(nGroups, 3)
    out.put(nSelectors, 15)
    i = 0
    while (i < nSelectors) { out.put(0, 1); i += 1 } // all group 0, MTF'd → single 0 bit
    var g = 0
    while (g < nGroups) {
      var curr = lens(0)
      out.put(curr, 5)
      var s = 0
      while (s < alphaSize) {
        while (curr < lens(s)) { out.put(2, 2); curr += 1 } // "10" → +1
        while (curr > lens(s)) { out.put(3, 2); curr -= 1 } // "11" → −1
        out.put(0, 1)
        s += 1
      }
      g += 1
    }
    i = 0
    while (i < nSyms) {
      val s = symBuf(i)
      out.put(codes(s), lens(s))
      i += 1
    }
  }

  /** Huffman code lengths, limited to `maxLen` by bzip2's own
    * frequency-halving iteration.
    */
  private def makeCodeLengths(freq: Array[Int], maxLen: Int): Array[Int] = {
    var w = freq.map(f => math.max(1, f))
    while (true) {
      val lens = huffLengths(w)
      if (lens.max <= maxLen) return lens
      w = w.map(x => 1 + x / 2)
    }
    throw new IllegalStateException("unreachable")
  }

  private def huffLengths(w: Array[Int]): Array[Int] = {
    val n = w.length
    // heap of (weight, nodeId); internal nodes appended past n
    val weight = new Array[Long](2 * n)
    val parent = new Array[Int](2 * n)
    java.util.Arrays.fill(parent, -1)
    // (weight << 16 | id): ids < 2·alphaSize ≤ 516; weights ≤ block
    // symbol count ≤ ~900k, so the packed key fits a Long with room
    val pq = new java.util.PriorityQueue[Long]()
    var i = 0
    while (i < n) { weight(i) = w(i).toLong; pq.add((w(i).toLong << 16) | i.toLong); i += 1 }
    var nextId = n
    while (pq.size > 1) {
      val a = (pq.poll() & 0xffffL).toInt
      val b = (pq.poll() & 0xffffL).toInt
      weight(nextId) = weight(a) + weight(b)
      parent(a) = nextId; parent(b) = nextId
      pq.add((weight(nextId) << 16) | nextId.toLong)
      nextId += 1
    }
    val lens = new Array[Int](n)
    i = 0
    while (i < n) {
      var d = 0
      var p = i
      while (parent(p) != -1) { d += 1; p = parent(p) }
      lens(i) = math.max(1, d)
      i += 1
    }
    lens
  }

  /** Canonical code values: increasing length, within a length by
    * symbol index — exactly what the decoder reconstructs.
    */
  private def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val maxLen = lens.max
    val count = new Array[Int](maxLen + 2)
    lens.foreach(l => count(l) += 1)
    val first = new Array[Int](maxLen + 2)
    var l = lens.min
    var fc = 0
    while (l <= maxLen) { first(l) = fc; fc = (fc + count(l)) << 1; l += 1 }
    val next = first.clone()
    val codes = new Array[Int](lens.length)
    var s = 0
    while (s < lens.length) { codes(s) = next(lens(s)); next(lens(s)) += 1; s += 1 }
    codes
  }

  // ------------------------------------------------------------------
  // Shard surfaces (mirror the gz/zst/xz front doors)
  // ------------------------------------------------------------------

  /** Deterministic multistream `.jsonl.bz2` fixture: one stream per
    * member, levels rotating 1/5/9, same closed-form line content as
    * the gz/zst/xz fixtures so one oracle covers all four front doors.
    */
  def synthJsonlBz2(seed: Long, nMembers: Int, linesPer: Int): Array[Byte] = {
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
      val level = (m % 3) match { case 0 => 1; case 1 => 5; case _ => 9 }
      out.write(compress(sb.toString.getBytes(UTF_8), level))
    }
    out.toByteArray
  }

  /** Deterministic multistream wiki-dump fixture — the
    * `pages-articles-multistream.xml.bz2` shape: the dump XML split at
    * `<page>` boundaries, each chunk its own bz2 stream, whose
    * CONCATENATED decode is the original XML (so the uncompressed
    * `mediawiki` dispatch path and this front door share one oracle).
    */
  def synthWikiBz2(seed: Long, nPages: Int): Array[Byte] = {
    val xml = WikiCodec.synthWikiDump(seed, nPages)
    val cuts = Vector.newBuilder[Int]
    cuts += 0
    var at = xml.indexOf("<page>")
    while (at >= 0) { cuts += at; at = xml.indexOf("<page>", at + 1) }
    cuts += xml.length
    val cs = cuts.result().distinct.sorted
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i + 1 < cs.length) {
      val chunk = xml.substring(cs(i), cs(i + 1))
      if (chunk.nonEmpty) out.write(compress(chunk.getBytes(UTF_8), 1))
      i += 1
    }
    out.toByteArray
  }

  /** `.jsonl.bz2` shard → newline-joined `text` fields (tolerant; null
    * when nothing decodes or no line carries a text member).
    */
  def jsonlBz2Text(b: Array[Byte]): String = {
    if (!isBzip2(b)) return null
    val raw = decompressTolerant(b)
    if (raw == null || raw.length == 0) return null
    val texts = new String(raw, UTF_8).split("\n")
      .iterator.map(GzipShard.textField).filter(_ != null).toSeq
    if (texts.isEmpty) null else texts.mkString("\n")
  }

  /** Full decoded UTF-8 text of all streams (tolerant) — the
    * `gunzip_text`/`unzstd_text`/`unxz_text` analog.
    */
  def unbzip2Text(b: Array[Byte]): String = {
    if (!isBzip2(b)) return null
    val raw = decompressTolerant(b)
    if (raw == null) null else new String(raw, UTF_8)
  }
}
