package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM XZ/LZMA decoder, written from scratch against the public
  * specs (the .xz file format spec and the LZMA specification) — the
  * LAST compressed-shard wall after round 14's zstd: older corpus
  * releases and Wikipedia dump mirrors ship `.xz`. Decode side is
  * complete for the format's ubiquitous configuration: stream
  * header/footer with flag CRCs, block headers (filter chain of one
  * LZMA2 filter, optional size fields, header CRC32), LZMA2 chunking
  * (uncompressed chunks, LZMA chunks, all three reset modes, props
  * changes, dictionary resets), the full LZMA range decoder (bit-tree
  * literal/matched-literal coders, length coders, position slots with
  * aligned/direct bits, the 4-slot rep-distance history and 12-state
  * machine), block padding, all four check types (none, CRC32, CRC64
  * with the ECMA polynomial — implemented here — and SHA-256 via the
  * JDK), index verification, and concatenated streams with stream
  * padding. Loud on damage; [[decompressTolerant]] keeps the codec
  * layer's partial-parse promise for damaged shard tails.
  *
  * Out of subset (loud): filter chains other than a single LZMA2
  * filter (delta/BCJ filters appear in executables, not text shards),
  * dictionary sizes over 128 MiB, and outputs over the caller's cap.
  *
  * Write side is a from-scratch FIXTURE writer emitting REAL `.xz`
  * streams built from LZMA2 uncompressed chunks (both dict-reset and
  * continuation forms) with rotating check types — every container
  * layer (headers, padding, checks, index, footer) exercised without
  * an entropy coder. The spec verifies BOTH directions against the
  * real XZ implementation on the Spark classpath (`xz-1.10.jar`,
  * which Spark ships for `spark.io.compression.codec=xz`... well, for
  * its Hadoop codecs): fixture streams must decode byte-exact through
  * `org.tukaani.xz.XZInputStream`, and `XZOutputStream` output across
  * presets 0/3/6/9 and data shapes must decode byte-exact here — the
  * real encoder exercises every LZMA coding path (matches, all rep
  * forms, matched literals, state resets) that the fixture writer
  * deliberately does not implement.
  *
  * Scale shape: one shard = one row = one bounded decode, no Spark
  * state — identical to [[GzipShard]]/[[ZstdCodec]]; the shard grain
  * is the parallelism grain.
  */
object XzCodec {

  private val Magic = Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0)
  private val MaxDict = 128 << 20

  def isXz(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 && (0 until 6).forall(i => b(i) == Magic(i))

  private def fail(msg: String): Nothing = throw new IllegalArgumentException("xz: " + msg)

  // ------------------------------------------------------------------
  // CRC64 (ECMA-182, reflected, as the xz spec requires)
  // ------------------------------------------------------------------

  private lazy val Crc64Table: Array[Long] = {
    val poly = 0xC96C5795D7870F42L
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var c = i.toLong
      var k = 0
      while (k < 8) { c = if ((c & 1L) != 0) (c >>> 1) ^ poly else c >>> 1; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  def crc64(b: Array[Byte], off: Int, len: Int): Long = {
    var c = ~0L
    var i = off
    while (i < off + len) {
      c = Crc64Table(((c ^ b(i)) & 0xff).toInt) ^ (c >>> 8)
      i += 1
    }
    ~c
  }

  private def crc32(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue.toInt
  }

  // ------------------------------------------------------------------
  // LZMA core (per the public LZMA specification)
  // ------------------------------------------------------------------

  /** Range decoder over `b[pos, end)`; probabilities are 11-bit. */
  private final class RangeDec(b: Array[Byte], var pos: Int, val end: Int) {
    var range: Long = 0xFFFFFFFFL
    var code: Long = 0L
    def init(): Unit = {
      if (pos + 5 > end) fail("LZMA: truncated range-coder init")
      if (b(pos) != 0) fail("LZMA: first rc byte not zero")
      pos += 1
      var i = 0
      while (i < 4) { code = (code << 8) | (b(pos) & 0xffL); pos += 1; i += 1 }
    }
    @inline private def normalize(): Unit =
      if (range < (1L << 24)) {
        range <<= 8
        code = ((code << 8) | (if (pos < end) b(pos) & 0xffL else 0L)) & 0xFFFFFFFFL
        pos += 1
        if (pos > end + 4) fail("LZMA: range coder ran past chunk")
      }
    def decodeBit(probs: Array[Short], i: Int): Int = {
      val p = probs(i)
      val bound = (range >>> 11) * p
      if (code < bound) {
        range = bound
        probs(i) = (p + ((2048 - p) >>> 5)).toShort
        normalize()
        0
      } else {
        range -= bound
        code -= bound
        probs(i) = (p - (p >>> 5)).toShort
        normalize()
        1
      }
    }
    def decodeDirect(n: Int): Int = {
      var res = 0
      var i = 0
      while (i < n) {
        range >>>= 1
        res <<= 1
        if (code >= range) { code -= range; res |= 1 }
        normalize()
        i += 1
      }
      res
    }
    def bitTree(probs: Array[Short], off: Int, nbits: Int): Int = {
      var m = 1
      var i = 0
      while (i < nbits) { m = (m << 1) | decodeBit(probs, off + m); i += 1 }
      m - (1 << nbits)
    }
    def bitTreeReverse(probs: Array[Short], off: Int, nbits: Int): Int = {
      var m = 1
      var sym = 0
      var i = 0
      while (i < nbits) {
        val bit = decodeBit(probs, off + m)
        m = (m << 1) | bit
        sym |= bit << i
        i += 1
      }
      sym
    }
    def finishedCleanly: Boolean = code == 0L
  }

  private def newProbs(n: Int): Array[Short] = Array.fill[Short](n)(1024)

  /** Length coder: choice + 8 low / 8 mid per posState + 256 high. */
  private[sources] final class LenDec {
    val choice: Array[Short] = newProbs(2)
    val low: Array[Short] = newProbs(16 * 8)
    val mid: Array[Short] = newProbs(16 * 8)
    val high: Array[Short] = newProbs(256)
    def decode(rc: RangeDec, posState: Int): Int =
      if (rc.decodeBit(choice, 0) == 0) 2 + rc.bitTree(low, posState * 8, 3)
      else if (rc.decodeBit(choice, 1) == 0) 10 + rc.bitTree(mid, posState * 8, 3)
      else 18 + rc.bitTree(high, 0, 8)
  }

  /** LZMA probability model + state, reused across LZMA2 chunks until
    * a state reset.
    */
  private[sources] final class LzmaState(var lc: Int, var lp: Int, var pb: Int) {
    var state = 0
    var rep0 = 0; var rep1 = 0; var rep2 = 0; var rep3 = 0
    var isMatch: Array[Short] = _
    var isRep: Array[Short] = _
    var isRepG0: Array[Short] = _
    var isRepG1: Array[Short] = _
    var isRepG2: Array[Short] = _
    var isRep0Long: Array[Short] = _
    var posSlot: Array[Short] = _
    var specPos: Array[Short] = _
    var align: Array[Short] = _
    var lenDec: LenDec = _
    var repLenDec: LenDec = _
    var lit: Array[Short] = _
    reset()
    def reset(): Unit = {
      state = 0; rep0 = 0; rep1 = 0; rep2 = 0; rep3 = 0
      isMatch = newProbs(12 << 4)
      isRep = newProbs(12); isRepG0 = newProbs(12)
      isRepG1 = newProbs(12); isRepG2 = newProbs(12)
      isRep0Long = newProbs(12 << 4)
      posSlot = newProbs(4 * 64)
      specPos = newProbs(115)
      align = newProbs(16)
      lenDec = new LenDec; repLenDec = new LenDec
      lit = newProbs(0x300 << (lc + lp))
    }
    def setProps(prop: Int): Unit = {
      if (prop >= 225) fail(s"LZMA: bad props byte $prop")
      lc = prop % 9
      val r = prop / 9
      lp = r % 5
      pb = r / 5
      if (lc + lp > 4) fail(s"LZMA2: lc+lp over 4 ($lc+$lp)")
    }
  }

  /** Output window shared across chunks; `dictStart` marks the last
    * dictionary reset (matches must not reach before it).
    */
  private[sources] final class OutWin(val cap: Int) {
    var buf = new Array[Byte](4096)
    var len = 0
    var dictStart = 0
    def ensure(extra: Int): Unit = {
      if (len + extra > cap) fail(s"decoded output over cap $cap")
      if (len + extra > buf.length) {
        var n = buf.length * 2
        while (n < len + extra) n *= 2
        buf = java.util.Arrays.copyOf(buf, math.min(n.toLong, cap.toLong).toInt)
      }
    }
    @inline def put(x: Byte): Unit = { ensure(1); buf(len) = x; len += 1 }
    @inline def byteBack(dist: Int): Byte = buf(len - dist - 1)
  }

  /** Decode one LZMA chunk of exactly `unpackSize` output bytes. */
  private def lzmaChunk(b: Array[Byte], from: Int, to: Int, st: LzmaState,
      w: OutWin, unpackSize: Int): Unit =
    lzmaCore(b, from, to, st, w, unpackSize, strictEnd = true)

  /** One continuous raw LZMA1 stream (the 7z 0x030101 coder): props
    * external, output size known, NO end-of-stream marker expected —
    * unlike XZ's chunked LZMA2, the range coder need not land on a
    * clean flush and trailing pad bytes may remain.
    */
  private[sources] def lzmaRaw(b: Array[Byte], from: Int, to: Int, props: Int,
      w: OutWin, unpackSize: Int): Unit = {
    val st = new LzmaState(0, 0, 0)
    st.setProps(props)
    st.reset()
    w.dictStart = w.len
    lzmaCore(b, from, to, st, w, unpackSize, strictEnd = false)
  }

  private def lzmaCore(b: Array[Byte], from: Int, to: Int, st: LzmaState,
      w: OutWin, unpackSize: Int, strictEnd: Boolean): Unit = {
    val rc = new RangeDec(b, from, to)
    rc.init()
    val target = w.len + unpackSize
    val pbMask = (1 << st.pb) - 1
    val lpMask = (1 << st.lp) - 1
    while (w.len < target) {
      val posState = ((w.len - w.dictStart) & pbMask)
      if (rc.decodeBit(st.isMatch, (st.state << 4) + posState) == 0) {
        // literal
        val prev = if (w.len > w.dictStart) w.byteBack(0) & 0xff else 0
        val litState = ((((w.len - w.dictStart) & lpMask) << st.lc) + (prev >>> (8 - st.lc)))
        val base = 0x300 * litState
        var symbol = 1
        if (st.state < 7) {
          while (symbol < 0x100) symbol = (symbol << 1) | rc.decodeBit(st.lit, base + symbol)
        } else {
          if (w.len - w.dictStart <= st.rep0) fail("LZMA: matched literal before dict start")
          var matchByte = w.byteBack(st.rep0) & 0xff
          var break = false
          while (!break && symbol < 0x100) {
            val matchBit = (matchByte >> 7) & 1
            matchByte = (matchByte << 1) & 0xff
            val bit = rc.decodeBit(st.lit, base + ((1 + matchBit) << 8) + symbol)
            symbol = (symbol << 1) | bit
            if (matchBit != bit) {
              while (symbol < 0x100) symbol = (symbol << 1) | rc.decodeBit(st.lit, base + symbol)
              break = true
            }
          }
        }
        w.put((symbol & 0xff).toByte)
        st.state = if (st.state < 4) 0 else if (st.state < 10) st.state - 3 else st.state - 6
      } else {
        var len = 0
        if (rc.decodeBit(st.isRep, st.state) == 0) {
          // new match
          st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = st.rep0
          len = st.lenDec.decode(rc, posState)
          st.state = if (st.state < 7) 7 else 10
          val lenToPos = math.min(len - 2, 3)
          val slot = rc.bitTree(st.posSlot, lenToPos * 64, 6)
          if (slot < 4) st.rep0 = slot
          else {
            val direct = (slot >> 1) - 1
            var dist: Long = (2L | (slot & 1)) << direct
            if (slot < 14)
              dist += rc.bitTreeReverse(st.specPos, (dist - slot).toInt, direct)
            else {
              dist += rc.decodeDirect(direct - 4).toLong << 4
              dist += rc.bitTreeReverse(st.align, 0, 4)
            }
            if (dist == 0xFFFFFFFFL) fail("LZMA: end marker inside LZMA2 chunk")
            if (dist > Int.MaxValue) fail("LZMA: distance over 2^31")
            st.rep0 = dist.toInt
          }
        } else {
          // rep match
          if (rc.decodeBit(st.isRepG0, st.state) == 0) {
            if (rc.decodeBit(st.isRep0Long, (st.state << 4) + posState) == 0) {
              // short rep: one byte at rep0
              st.state = if (st.state < 7) 9 else 11
              if (w.len - w.dictStart <= st.rep0) fail("LZMA: short rep before dict start")
              w.put(w.byteBack(st.rep0))
              // (falls through with len 0 — handled below)
              len = -1
            }
          } else {
            var dist = 0
            if (rc.decodeBit(st.isRepG1, st.state) == 0) dist = st.rep1
            else {
              if (rc.decodeBit(st.isRepG2, st.state) == 0) dist = st.rep2
              else { dist = st.rep3; st.rep3 = st.rep2 }
              st.rep2 = st.rep1
            }
            st.rep1 = st.rep0
            st.rep0 = dist
          }
          if (len == 0) {
            len = st.repLenDec.decode(rc, posState)
            st.state = if (st.state < 7) 8 else 11
          }
        }
        if (len > 0) {
          if (w.len - w.dictStart <= st.rep0) fail("LZMA: match reaches before dict start")
          if (w.len + len > target) fail("LZMA: match overruns chunk unpack size")
          w.ensure(len)
          val dist = st.rep0 + 1
          if (dist >= len) {
            System.arraycopy(w.buf, w.len - dist, w.buf, w.len, len)
            w.len += len
          } else {
            var k = 0
            while (k < len) { w.buf(w.len) = w.buf(w.len - dist); w.len += 1; k += 1 }
          }
        }
      }
    }
    if (strictEnd) {
      if (rc.pos != to) fail(s"LZMA: chunk consumed ${rc.pos - from} of ${to - from} bytes")
      if (!rc.finishedCleanly) fail("LZMA: range coder did not finish cleanly")
    } else if (rc.pos > to) fail("LZMA: raw stream overran its packed extent")
  }

  /** LZMA2 chunk sequence at `b[from, to)` → bytes appended to `w`. */
  private[sources] def lzma2(b: Array[Byte], from: Int, to: Int, w: OutWin): Int = {
    var p = from
    var st: LzmaState = null
    var propsKnown = false
    var done = false
    while (!done) {
      if (p >= to) fail("LZMA2: missing end-of-chunks marker")
      val control = b(p) & 0xff
      p += 1
      if (control == 0x00) done = true
      else if (control == 0x01 || control == 0x02) {
        // uncompressed chunk (0x01 = dictionary reset first)
        if (p + 2 > to) fail("LZMA2: truncated uncompressed-chunk size")
        val size = (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) + 1
        p += 2
        if (p + size > to) fail("LZMA2: uncompressed chunk overruns block")
        if (control == 0x01) w.dictStart = w.len
        // an uncompressed chunk invalidates probability state
        if (st != null) st.reset()
        w.ensure(size)
        System.arraycopy(b, p, w.buf, w.len, size)
        w.len += size
        p += size
      } else if (control >= 0x80) {
        if (p + 4 > to) fail("LZMA2: truncated LZMA-chunk sizes")
        val unpack = (((control & 0x1f) << 16) | ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) + 1
        val comp = (((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)) + 1
        p += 4
        val resetMode = (control >> 5) & 3
        if (resetMode == 3) w.dictStart = w.len
        if (resetMode >= 2) {
          if (p >= to) fail("LZMA2: truncated props byte")
          val prop = b(p) & 0xff
          p += 1
          if (st == null) st = new LzmaState(0, 0, 0)
          st.setProps(prop)
          st.reset()
          propsKnown = true
        } else if (resetMode == 1) {
          if (!propsKnown) fail("LZMA2: state reset before any props")
          st.reset()
        } else if (st == null || !propsKnown) fail("LZMA2: chunk without props")
        if (p + comp > to) fail("LZMA2: LZMA chunk overruns block")
        lzmaChunk(b, p, p + comp, st, w, unpack)
        p += comp
      } else fail(f"LZMA2: bad control byte 0x$control%02x")
    }
    p
  }

  // ------------------------------------------------------------------
  // XZ container
  // ------------------------------------------------------------------

  private def readVli(b: Array[Byte], at: Int, limit: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    var p = at
    while (true) {
      if (p >= limit || i >= 9) fail("xz: bad variable-length integer")
      val x = b(p) & 0xff
      v |= (x & 0x7fL) << (7 * i)
      p += 1
      i += 1
      if ((x & 0x80) == 0) return (v, p)
    }
    (v, p) // unreachable
  }

  private def checkSize(checkType: Int): Int = checkType match {
    case 0 => 0
    case 1 => 4
    case 4 => 8
    case 10 => 32
    case t => fail(s"xz: unsupported check type $t")
  }

  /** Decode one XZ stream starting at `at`; returns the offset just
    * past its footer. Appends decoded bytes to `w`.
    */
  private def decodeStream(b: Array[Byte], at: Int, w: OutWin): Int = {
    if (at + 12 > b.length) fail("xz: truncated stream header")
    if (!(0 until 6).forall(i => b(at + i) == Magic(i))) fail("xz: bad magic")
    if (b(at + 6) != 0) fail("xz: reserved stream flag set")
    val checkType = b(at + 7) & 0xff
    val chkLen = checkSize(checkType)
    if (crc32(b, at + 6, 2) != leInt(b, at + 8)) fail("xz: stream-header flag CRC mismatch")
    var p = at + 12
    val blockRecords = Vector.newBuilder[(Long, Long)] // (unpadded, uncompressed)
    var done = false
    while (!done) {
      if (p >= b.length) fail("xz: ran out of data before index")
      val hdrSizeByte = b(p) & 0xff
      if (hdrSizeByte == 0) done = true // index indicator
      else {
        val blockStart = p
        val hdrSize = (hdrSizeByte + 1) * 4
        if (p + hdrSize > b.length) fail("xz: truncated block header")
        if (crc32(b, p, hdrSize - 4) != leInt(b, p + hdrSize - 4))
          fail("xz: block-header CRC mismatch")
        val flags = b(p + 1) & 0xff
        val nFilters = (flags & 3) + 1
        if ((flags & 0x3c) != 0) fail("xz: reserved block flags set")
        var q = p + 2
        // fields live BEFORE the 4-byte header CRC — a CRC-valid but
        // malformed header (field placed at the header end) must fail
        // loudly here, not index into the CRC/past the array (ADVICE r14)
        val fieldEnd = p + hdrSize - 4
        var compSize = -1L
        var unpSize = -1L
        if ((flags & 0x40) != 0) { val (v, n) = readVli(b, q, fieldEnd); compSize = v; q = n }
        if ((flags & 0x80) != 0) { val (v, n) = readVli(b, q, fieldEnd); unpSize = v; q = n }
        if (nFilters != 1) fail(s"xz: $nFilters-filter chains out of subset (single LZMA2 only)")
        val (fid, n1) = readVli(b, q, fieldEnd); q = n1
        if (fid != 0x21) fail(f"xz: filter 0x$fid%x out of subset (LZMA2 only)")
        val (propLen, n2) = readVli(b, q, fieldEnd); q = n2
        if (propLen != 1) fail("xz: LZMA2 props must be one byte")
        if (q >= fieldEnd) fail("xz: block header ends before LZMA2 props byte")
        val dictBits = b(q) & 0xff; q += 1
        val dictSize =
          if (dictBits == 40) 0xFFFFFFFFL
          else if (dictBits > 40) fail("xz: bad dictionary-size byte")
          else (2L | (dictBits & 1)) << (dictBits / 2 + 11)
        if (dictSize > MaxDict) fail(s"xz: dictionary $dictSize over subset cap $MaxDict")
        while (q < p + hdrSize - 4) {
          if (b(q) != 0) fail("xz: nonzero block-header padding")
          q += 1
        }
        p += hdrSize
        val outBefore = w.len
        val dataEnd = lzma2(b, p, b.length, w)
        val compActual = dataEnd - p
        if (compSize >= 0 && compSize != compActual)
          fail(s"xz: block compressed size $compActual != declared $compSize")
        if (unpSize >= 0 && unpSize != (w.len - outBefore))
          fail(s"xz: block uncompressed size ${w.len - outBefore} != declared $unpSize")
        p = dataEnd
        while (((p - blockStart) & 3) != 0) {
          if (p >= b.length || b(p) != 0) fail("xz: bad block padding")
          p += 1
        }
        if (p + chkLen > b.length) fail("xz: truncated block check")
        checkType match {
          case 0 => ()
          case 1 =>
            if (crc32(w.buf, outBefore, w.len - outBefore) != leInt(b, p))
              fail("xz: block CRC32 mismatch")
          case 4 =>
            if (crc64(w.buf, outBefore, w.len - outBefore) != leLong(b, p))
              fail("xz: block CRC64 mismatch")
          case 10 =>
            val md = java.security.MessageDigest.getInstance("SHA-256")
            md.update(w.buf, outBefore, w.len - outBefore)
            val dig = md.digest()
            var i = 0
            while (i < 32) {
              if (dig(i) != b(p + i)) fail("xz: block SHA-256 mismatch")
              i += 1
            }
          case _ => ()
        }
        // unpadded size = header + data + check (without the padding)
        blockRecords += (((hdrSize + compActual + chkLen).toLong, (w.len - outBefore).toLong))
        p += chkLen
      }
    }
    // ---- index
    val indexStart = p
    p += 1 // the 0x00 indicator
    val (nRec, p1) = readVli(b, p, b.length); p = p1
    val recs = blockRecords.result()
    if (nRec != recs.length) fail(s"xz: index says $nRec blocks, stream had ${recs.length}")
    recs.foreach { case (unpadded, unc) =>
      val (u1, pa) = readVli(b, p, b.length); p = pa
      val (u2, pb2) = readVli(b, p, b.length); p = pb2
      if (u1 != unpadded || u2 != unc)
        fail(s"xz: index record ($u1,$u2) != block ($unpadded,$unc)")
    }
    while (((p - indexStart) & 3) != 0) {
      if (p >= b.length || b(p) != 0) fail("xz: bad index padding")
      p += 1
    }
    if (p + 4 > b.length) fail("xz: truncated index CRC")
    if (crc32(b, indexStart, p - indexStart) != leInt(b, p)) fail("xz: index CRC mismatch")
    p += 4
    // ---- footer
    if (p + 12 > b.length) fail("xz: truncated stream footer")
    if (crc32(b, p + 4, 6) != leInt(b, p)) fail("xz: footer CRC mismatch")
    val backward = ((leInt(b, p + 4).toLong & 0xFFFFFFFFL) + 1) * 4
    if (backward != (p - indexStart).toLong) fail("xz: footer backward size mismatch")
    if (b(p + 8) != 0 || (b(p + 9) & 0xff) != checkType) fail("xz: footer flags mismatch")
    if (b(p + 10) != 'Y' || b(p + 11) != 'Z') fail("xz: bad footer magic")
    p + 12
  }

  @inline private def leInt(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) | ((b(at + 2) & 0xff) << 16) |
      ((b(at + 3) & 0xff) << 24)
  @inline private def leLong(b: Array[Byte], at: Int): Long =
    (leInt(b, at).toLong & 0xFFFFFFFFL) | (leInt(b, at + 4).toLong << 32)

  /** Length in bytes of the `.xz` stream starting at `at` WITHOUT
    * decoding: block headers declare their size and LZMA2 chunk
    * headers carry compressed sizes, so a stream walks in O(#chunks)
    * — multi-stream shards split at stream grain for free.
    */
  def streamLength(b: Array[Byte], at: Int): Int = {
    if (at + 12 > b.length) fail("truncated stream header")
    if (!(0 until 6).forall(i => b(at + i) == Magic(i))) fail("bad magic")
    val checkType = b(at + 7) & 0xff
    val chkLen = checkSize(checkType)
    var p = at + 12
    var done = false
    while (!done) {
      if (p >= b.length) fail("ran out of data before index")
      val hdrSizeByte = b(p) & 0xff
      if (hdrSizeByte == 0) done = true
      else {
        val blockStart = p
        val hdrSize = (hdrSizeByte + 1) * 4
        p += hdrSize
        // LZMA2 chunk walk by declared sizes only
        var chunksDone = false
        while (!chunksDone) {
          if (p >= b.length) fail("LZMA2: missing end-of-chunks marker")
          val control = b(p) & 0xff
          p += 1
          if (control == 0x00) chunksDone = true
          else if (control == 0x01 || control == 0x02) {
            if (p + 2 > b.length) fail("LZMA2: truncated size")
            p += 2 + ((((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) + 1)
          } else if (control >= 0x80) {
            if (p + 4 > b.length) fail("LZMA2: truncated sizes")
            val comp = (((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)) + 1
            val resetMode = (control >> 5) & 3
            p += 4 + (if (resetMode >= 2) 1 else 0) + comp
          } else fail(f"LZMA2: bad control byte 0x$control%02x")
          if (p > b.length) fail("chunk overruns input")
        }
        while (((p - blockStart) & 3) != 0) p += 1 // block padding
        p += chkLen
        if (p > b.length) fail("truncated block check")
      }
    }
    val indexStart = p
    p += 1
    val (nRec, p1) = readVli(b, p, b.length); p = p1
    var i = 0L
    while (i < nRec) {
      val (_, pa) = readVli(b, p, b.length); p = pa
      val (_, pb2) = readVli(b, p, b.length); p = pb2
      i += 1
    }
    while (((p - indexStart) & 3) != 0) p += 1
    p += 4 // index CRC
    p += 12 // footer
    if (p > b.length) fail("truncated stream tail")
    p - at
  }

  /** (offset, length) of every stream in a multi-stream shard —
    * computed without decoding; stream padding walked over.
    */
  def streamOffsets(b: Array[Byte]): Array[(Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long)]
    var p = 0
    while (p < b.length) {
      if (b(p) == 0) {
        if (p + 4 > b.length || b(p + 1) != 0 || b(p + 2) != 0 || b(p + 3) != 0)
          fail("bad stream padding")
        p += 4
      } else {
        val len = streamLength(b, p)
        out += ((p.toLong, len.toLong))
        p += len
      }
    }
    out.result().toArray
  }

  /** Decode all concatenated streams (with optional 4-byte-aligned
    * zero stream padding between them); loud on any damage.
    */
  def decompress(b: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    val w = new OutWin(maxOut)
    var p = 0
    while (p < b.length) {
      // stream padding: runs of 4 zero bytes between streams
      if (b(p) == 0) {
        if (p + 4 > b.length || b(p + 1) != 0 || b(p + 2) != 0 || b(p + 3) != 0)
          fail("xz: bad stream padding")
        p += 4
      } else p = decodeStream(b, p, w)
    }
    java.util.Arrays.copyOf(w.buf, w.len)
  }

  /** Best-effort decode: bytes recovered before the first damage. */
  def decompressTolerant(b: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    val w = new OutWin(maxOut)
    try {
      var p = 0
      while (p < b.length) {
        if (b(p) == 0) {
          if (p + 4 > b.length || b(p + 1) != 0 || b(p + 2) != 0 || b(p + 3) != 0)
            fail("xz: bad stream padding")
          p += 4
        } else p = decodeStream(b, p, w)
      }
    } catch { case _: Exception => () }
    java.util.Arrays.copyOf(w.buf, w.len)
  }

  // ------------------------------------------------------------------
  // Fixture writer (container-complete; LZMA2 uncompressed chunks)
  // ------------------------------------------------------------------

  private def writeVli(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while (v >= 0x80) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** One complete `.xz` stream around `data`: stream header, one block
    * (LZMA2 filter, declared sizes) whose LZMA2 payload alternates
    * dict-reset and continuation UNCOMPRESSED chunks, block padding,
    * the requested check, index, footer. Real streams — the oracle
    * spec feeds them to `org.tukaani.xz.XZInputStream`.
    */
  def buildXz(data: Array[Byte], checkType: Int): Array[Byte] = {
    val chkLen = checkSize(checkType)
    val out = new java.io.ByteArrayOutputStream()
    def wLE32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >>> 24) & 0xff) }
    // stream header
    out.write(Magic)
    val flags = Array[Byte](0, checkType.toByte)
    out.write(flags)
    wLE32(crc32(flags, 0, 2))
    // LZMA2 payload: uncompressed chunks of up to 4 KiB, first one a
    // dictionary reset (0x01), the rest continuations (0x02)
    val payload = new java.io.ByteArrayOutputStream()
    if (data.length == 0) {
      // empty block would be invalid; encode one empty-ish chunk is
      // impossible (sizes are +1) — an xz stream with NO blocks is the
      // canonical empty form: index with zero records.
      ()
    } else {
      var at = 0
      var first = true
      while (at < data.length) {
        val n = math.min(4096, data.length - at)
        payload.write(if (first) 0x01 else 0x02)
        payload.write((n - 1) >> 8)
        payload.write((n - 1) & 0xff)
        payload.write(data, at, n)
        at += n
        first = false
      }
      payload.write(0x00) // end of chunks
    }
    val body = payload.toByteArray
    if (data.length == 0) {
      // no blocks: index indicator + 0 records + CRC, then footer
      val idx = new java.io.ByteArrayOutputStream()
      idx.write(0x00)
      writeVli(idx, 0L)
      while ((idx.size() & 3) != 0) idx.write(0)
      val idxB = idx.toByteArray
      out.write(idxB)
      wLE32(crc32(idxB, 0, idxB.length))
      val backward = (idxB.length + 4) / 4 - 1
      val tail = new java.io.ByteArrayOutputStream()
      tail.write(backward & 0xff); tail.write((backward >> 8) & 0xff)
      tail.write((backward >> 16) & 0xff); tail.write((backward >>> 24) & 0xff)
      tail.write(0); tail.write(checkType)
      val tailB = tail.toByteArray
      wLE32(crc32(tailB, 0, tailB.length))
      out.write(tailB)
      out.write('Y'); out.write('Z')
      return out.toByteArray
    }
    // block header: flags with both size fields, LZMA2 filter, 8 MiB dict
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(0) // placeholder for size byte
    hdr.write(0xc0 | 0) // has comp + unp sizes, 1 filter
    writeVli(hdr, body.length.toLong)
    writeVli(hdr, data.length.toLong)
    writeVli(hdr, 0x21L) // LZMA2
    writeVli(hdr, 1L)
    hdr.write(24) // dict-size byte 24 → 8 MiB
    while (((hdr.size() + 4) & 3) != 0) hdr.write(0)
    val hdrB = hdr.toByteArray
    hdrB(0) = ((hdrB.length + 4) / 4 - 1).toByte
    out.write(hdrB)
    wLE32(crc32(hdrB, 0, hdrB.length))
    out.write(body)
    var pad = 0
    while (((body.length + pad) & 3) != 0) { out.write(0); pad += 1 }
    checkType match {
      case 0 => ()
      case 1 => wLE32(crc32(data, 0, data.length))
      case 4 =>
        val c = crc64(data, 0, data.length)
        wLE32((c & 0xFFFFFFFFL).toInt); wLE32((c >>> 32).toInt)
      case 10 =>
        out.write(java.security.MessageDigest.getInstance("SHA-256").digest(data))
      case _ => ()
    }
    val unpadded = (hdrB.length + 4) + body.length + chkLen
    // index
    val idx = new java.io.ByteArrayOutputStream()
    idx.write(0x00)
    writeVli(idx, 1L)
    writeVli(idx, unpadded.toLong)
    writeVli(idx, data.length.toLong)
    while ((idx.size() & 3) != 0) idx.write(0)
    val idxB = idx.toByteArray
    out.write(idxB)
    wLE32(crc32(idxB, 0, idxB.length))
    // footer
    val backward = (idxB.length + 4) / 4 - 1
    val tail = new java.io.ByteArrayOutputStream()
    tail.write(backward & 0xff); tail.write((backward >> 8) & 0xff)
    tail.write((backward >> 16) & 0xff); tail.write((backward >>> 24) & 0xff)
    tail.write(0); tail.write(checkType)
    val tailB = tail.toByteArray
    wLE32(crc32(tailB, 0, tailB.length))
    out.write(tailB)
    out.write('Y'); out.write('Z')
    out.toByteArray
  }

  /** Multi-stream fixture in the [[GzipShard.synthJsonlGz]] shape: one
    * `.xz` stream per member with the check type rotating through
    * CRC32 / CRC64 / SHA-256.
    */
  def synthJsonlXz(seed: Long, nMembers: Int, linesPer: Int): Array[Byte] = {
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
      val check = (m % 3) match { case 0 => 1; case 1 => 4; case _ => 10 }
      out.write(buildXz(sb.toString.getBytes(UTF_8), check))
    }
    out.toByteArray
  }

  /** `.jsonl.xz` shard → newline-joined `text` fields (tolerant; null
    * when nothing decodes or no line carries a text member).
    */
  def jsonlXzText(b: Array[Byte]): String = {
    if (!isXz(b)) return null
    val raw = decompressTolerant(b)
    if (raw == null || raw.length == 0) return null
    val texts = new String(raw, UTF_8).split("\n")
      .iterator.map(GzipShard.textField).filter(_ != null).toSeq
    if (texts.isEmpty) null else texts.mkString("\n")
  }

  /** Full decoded UTF-8 text of all streams (tolerant) — the
    * `gunzip_text`/`unzstd_text` analog.
    */
  def unxzText(b: Array[Byte]): String = {
    if (!isXz(b)) return null
    val raw = decompressTolerant(b)
    if (raw == null) null else new String(raw, UTF_8)
  }
}
