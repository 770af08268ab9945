package graft.sources

/** Pure-JVM FLAC codec — the lossless format speech corpora actually
  * ship (LibriSpeech/MLS/Common Voice are FLAC or FLAC-derived), built
  * from scratch against the public format spec (RFC 9639 / xiph
  * documentation): STREAMINFO metadata walk, frame headers with CRC-8,
  * subframes CONSTANT / VERBATIM / FIXED(0–4) / LPC (quantized
  * coefficients, 64-bit accumulator), Rice-coded residual partitions
  * (both 4- and 5-bit parameter widths, escape-to-raw), wasted-bits
  * shifts, stereo decorrelation (left/side, right/side, mid/side), and
  * frame CRC-16 — everything verified, nothing trusted. Write side is
  * a deterministic fixture encoder that rotates subframe types per
  * frame (CONSTANT on silence, FIXED-2, VERBATIM, and an LPC encoding
  * of the fixed-2 predictor so the LPC bitstream path is exercised
  * with exactly-reproducible residuals) and mid/side frames on stereo.
  *
  * Subset (loud on everything else): 16-bit samples, 1–2 channels,
  * sample rate from STREAMINFO (frame-header overrides parsed, CRC'd
  * and honored for block size; non-streaminfo rate codes accepted
  * only as the spec's direct forms). Decoded output reuses
  * [[AudioCodec.Pcm]], so every existing WAV analysis operator (RMS,
  * VAD windows, resample) composes unchanged. A duration cap is also
  * part of the subset: at most 2^26 total samples per stream (~25 min
  * stereo at 44.1 kHz, ~70 min mono at 16 kHz) — the bound a per-row
  * in-memory decode needs; longer recordings fail loudly, and a
  * 100 TB pipeline should chunk them upstream at the shard grain.
  *
  * Scale shape: bytes → samples per row, no Spark state — rides inside
  * codegen like the WAV/image/PDF codecs.
  */
object FlacCodec {

  def isFlac(b: Array[Byte]): Boolean =
    b != null && b.length > 42 &&
      b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  // ------------------------------------------------------------------
  // bit IO + CRCs
  // ------------------------------------------------------------------

  private final class BitReader(val b: Array[Byte]) {
    var pos = 0L // bit position
    def bytePos: Int = (pos / 8).toInt
    def aligned: Boolean = pos % 8 == 0
    def u(n: Int): Long = {
      require(n >= 0 && n <= 57, s"FLAC: bad read width $n")
      require(pos + n <= b.length.toLong * 8, "FLAC: bitstream truncated")
      var v = 0L
      var k = 0
      while (k < n) {
        val bit = (b((pos / 8).toInt) >> (7 - (pos % 8).toInt)) & 1
        v = (v << 1) | bit
        pos += 1
        k += 1
      }
      v
    }
    def s(n: Int): Long = { // signed two's-complement
      val v = u(n)
      if (n == 0) 0L else if ((v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def unary(): Int = {
      var q = 0
      while (u(1) == 0) {
        q += 1
        require(q <= (1 << 20), "FLAC: runaway unary code")
      }
      q
    }
    def alignToByte(): Unit = if (pos % 8 != 0) { val pad = 8 - (pos % 8).toInt; u(pad); () }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def u(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1L).toInt
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        k -= 1
      }
    }
    def s(v: Long, n: Int): Unit = u(v & ((1L << n) - 1), n)
    def unary(q: Int): Unit = { var k = 0; while (k < q) { u(0, 1); k += 1 }; u(1, 1) }
    def alignToByte(): Unit = if (nBits != 0) u(0, 8 - nBits)
    def toByteArray: Array[Byte] = { require(nBits == 0, "BitWriter: unaligned"); out.toByteArray }
  }

  /** CRC-8, polynomial x⁸+x²+x+1 (0x07), init 0 — the frame-header CRC. */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0 — the whole-frame CRC. */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------------
  // STREAMINFO
  // ------------------------------------------------------------------

  /** [n_samples, sample_rate, channels, bits, duration_ms] straight
    * from STREAMINFO — integer math, SQL-reproducible. Null for
    * non-FLAC bytes (same contract as wavInfo).
    */
  def flacInfo(b: Array[Byte]): Array[Long] = {
    if (!isFlac(b)) return null
    try {
      val si = streamInfo(b)._1
      Array(si.totalSamples, si.sampleRate.toLong, si.channels.toLong, si.bits.toLong,
        if (si.sampleRate == 0) 0L else si.totalSamples * 1000 / si.sampleRate)
    } catch { case _: Exception => null }
  }

  private final case class StreamInfo(minBlock: Int, maxBlock: Int, sampleRate: Int,
                                      channels: Int, bits: Int, totalSamples: Long)

  /** (STREAMINFO, offset of the first audio frame). */
  private def streamInfo(b: Array[Byte]): (StreamInfo, Int) = {
    require(isFlac(b), "FLAC: bad magic")
    var at = 4
    var info: StreamInfo = null
    var last = false
    while (!last) {
      require(at + 4 <= b.length, "FLAC: metadata truncated")
      val hdr = b(at) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((b(at + 1) & 0xff) << 16) | ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)
      require(at + 4 + len <= b.length, "FLAC: metadata block overruns")
      if (typ == 0) {
        require(len >= 34, "FLAC: STREAMINFO too short")
        val r = new BitReader(b)
        r.pos = (at + 4).toLong * 8
        val minB = r.u(16).toInt
        val maxB = r.u(16).toInt
        r.u(24); r.u(24) // min/max frame size (informational)
        val rate = r.u(20).toInt
        val ch = r.u(3).toInt + 1
        val bits = r.u(5).toInt + 1
        val total = r.u(36)
        info = StreamInfo(minB, maxB, rate, ch, bits, total)
      }
      at += 4 + len
    }
    require(info != null, "FLAC: no STREAMINFO")
    (info, at)
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  /** Decode a FLAC stream to interleaved PCM ([[AudioCodec.Pcm]]);
    * throws typed on malformed/out-of-subset input (the expression
    * layer null-guards). Every CRC-8/CRC-16 is verified.
    */
  def decodeFlac(b: Array[Byte]): AudioCodec.Pcm = {
    val (si, firstFrame) = streamInfo(b)
    require(si.bits == 16, s"FLAC: ${si.bits}-bit out of subset (16)")
    require(si.channels >= 1 && si.channels <= 2,
      s"FLAC: ${si.channels} channels out of subset (1-2)")
    // Duration cap, part of the documented subset (see the header note):
    // 2^26 total samples ≈ 25 min stereo at 44.1 kHz / ~70 min mono at
    // 16 kHz — the per-row decode bound; longer recordings are loud,
    // not silently nulled, so callers see the subset edge explicitly.
    require(si.totalSamples <= (1 << 26),
      s"FLAC: ${si.totalSamples} samples over the 2^26 per-row subset cap")
    val out = new Array[Short]((si.totalSamples * si.channels).toInt)
    var written = 0L
    val r = new BitReader(b)
    r.pos = firstFrame.toLong * 8
    while (written < si.totalSamples) {
      val frameStart = r.bytePos
      require(r.aligned, "FLAC: frame not byte-aligned")
      require(r.u(14) == 0x3FFE, "FLAC: lost frame sync")
      r.u(1) // reserved
      r.u(1) // blocking strategy (frame vs sample numbering — both parse below)
      val bsCode = r.u(4).toInt
      val srCode = r.u(4).toInt
      val chAsgn = r.u(4).toInt
      val ssCode = r.u(3).toInt
      r.u(1) // reserved
      // UTF-8-coded frame/sample number (up to 36 bits / 7 bytes)
      val lead = r.u(8).toInt
      var follow = 0
      var l = lead
      while ((l & 0x80) != 0) { follow += 1; l <<= 1 }
      require(follow != 1 && follow <= 7, "FLAC: bad frame-number coding")
      var k = 0
      while (k < math.max(0, follow - 1)) {
        require((r.u(8).toInt & 0xC0) == 0x80, "FLAC: bad frame-number continuation")
        k += 1
      }
      val blockSize = bsCode match {
        case 0 => throw new IllegalArgumentException("FLAC: reserved block size code")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.u(8).toInt + 1
        case 7 => r.u(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match {
        case 0 => // streaminfo
        case 12 => r.u(8) // kHz — parsed, streaminfo is authoritative in subset
        case 13 | 14 => r.u(16)
        case 15 => throw new IllegalArgumentException("FLAC: invalid sample rate code")
        case _ => // one of the fixed table codes, no extra bits
      }
      val bps = ssCode match {
        case 0 => si.bits
        case 4 => 16
        case 1 => 8
        case 2 => 12
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => throw new IllegalArgumentException("FLAC: reserved sample size")
      }
      require(bps == 16, s"FLAC: frame bps $bps out of subset")
      // CRC-8 covers the header bytes up to here
      val headerEnd = r.bytePos
      require(r.aligned, "FLAC: header should be byte-aligned before CRC")
      val declaredCrc8 = r.u(8).toInt
      require(declaredCrc8 == crc8(b, frameStart, headerEnd),
        "FLAC: frame header CRC-8 mismatch")
      val nCh = si.channels
      val (chans, sideMode) = chAsgn match {
        case a if a <= 7 =>
          require(a + 1 == nCh, "FLAC: channel assignment disagrees with STREAMINFO")
          ((0 until nCh).map(_ => 0), 0)
        case 8 => require(nCh == 2, "FLAC: left/side needs stereo"); (Seq(0, 1), 1)
        case 9 => require(nCh == 2, "FLAC: right/side needs stereo"); (Seq(1, 0), 2)
        case 10 => require(nCh == 2, "FLAC: mid/side needs stereo"); (Seq(0, 1), 3)
        case _ => throw new IllegalArgumentException("FLAC: reserved channel assignment")
      }
      val decoded = chans.zipWithIndex.map { case (side, ci) =>
        // side channel of a decorrelated pair carries one extra bit
        val chBps = bps + (if (sideMode != 0 && side == 1) 1 else 0)
        subframe(r, blockSize, chBps)
      }
      // undo decorrelation
      val pcmCh: Seq[Array[Long]] = sideMode match {
        case 0 => decoded
        case 1 => // left/side: right = left - side
          val l = decoded(0); val s = decoded(1)
          Seq(l, Array.tabulate(blockSize)(i => l(i) - s(i)))
        case 2 => // right/side: left = right + side
          val s = decoded(0); val rt = decoded(1)
          Seq(Array.tabulate(blockSize)(i => rt(i) + s(i)), rt)
        case _ => // mid/side
          val m = decoded(0); val s = decoded(1)
          val left = new Array[Long](blockSize)
          val right = new Array[Long](blockSize)
          var i = 0
          while (i < blockSize) {
            val mid = (m(i) << 1) | (s(i) & 1)
            left(i) = (mid + s(i)) >> 1
            right(i) = (mid - s(i)) >> 1
            i += 1
          }
          Seq(left, right)
      }
      r.alignToByte()
      val footerStart = r.bytePos
      val declaredCrc16 = r.u(16).toInt
      require(declaredCrc16 == crc16(b, frameStart, footerStart),
        "FLAC: frame CRC-16 mismatch")
      val take = math.min(blockSize.toLong, si.totalSamples - written).toInt
      var i = 0
      while (i < take) {
        var c = 0
        while (c < nCh) {
          val v = pcmCh(c)(i)
          require(v >= Short.MinValue && v <= Short.MaxValue, "FLAC: sample out of 16-bit range")
          out(((written + i) * nCh + c).toInt) = v.toShort
          c += 1
        }
        i += 1
      }
      written += take
    }
    AudioCodec.Pcm(si.sampleRate, si.channels, out)
  }

  private def subframe(r: BitReader, blockSize: Int, bps: Int): Array[Long] = {
    require(r.u(1) == 0, "FLAC: subframe padding bit set")
    val typ = r.u(6).toInt
    val wastedFlag = r.u(1)
    val wasted = if (wastedFlag == 1) r.unary() + 1 else 0
    val effBps = bps - wasted
    val out: Array[Long] = typ match {
      case 0 => // CONSTANT
        val v = r.s(effBps)
        Array.fill(blockSize)(v)
      case 1 => // VERBATIM
        Array.fill(blockSize)(r.s(effBps))
      case t if (t & 0x38) == 0x08 && (t & 0x07) <= 4 => // FIXED
        val order = t & 0x07
        val warm = Array.fill(order)(r.s(effBps))
        val resid = residual(r, blockSize, order)
        val s = new Array[Long](blockSize)
        System.arraycopy(warm, 0, s, 0, order)
        var i = order
        while (i < blockSize) {
          val p = order match {
            case 0 => 0L
            case 1 => s(i - 1)
            case 2 => 2 * s(i - 1) - s(i - 2)
            case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
            case _ => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
          }
          s(i) = p + resid(i - order)
          i += 1
        }
        s
      case t if (t & 0x20) != 0 => // LPC
        val order = (t & 0x1f) + 1
        val warm = Array.fill(order)(r.s(effBps))
        val precision = r.u(4).toInt + 1
        require(precision <= 15, "FLAC: invalid qlp precision")
        val shift = r.s(5).toInt
        require(shift >= 0, "FLAC: negative qlp shift out of subset")
        val coefs = Array.fill(order)(r.s(precision))
        val resid = residual(r, blockSize, order)
        val s = new Array[Long](blockSize)
        System.arraycopy(warm, 0, s, 0, order)
        var i = order
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j) * s(i - 1 - j); j += 1 }
          s(i) = (acc >> shift) + resid(i - order)
          i += 1
        }
        s
      case t => throw new IllegalArgumentException(s"FLAC: reserved subframe type $t")
    }
    if (wasted > 0) { var i = 0; while (i < out.length) { out(i) <<= wasted; i += 1 } }
    out
  }

  private def residual(r: BitReader, blockSize: Int, order: Int): Array[Long] = {
    val method = r.u(2).toInt
    require(method <= 1, "FLAC: reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.u(4).toInt
    val nParts = 1 << partOrder
    require(blockSize % nParts == 0, "FLAC: partition order does not divide block size")
    require(blockSize / nParts > order || partOrder == 0,
      "FLAC: first partition would have negative sample count")
    val out = new Array[Long](blockSize - order)
    var idx = 0
    var p = 0
    while (p < nParts) {
      val count = (blockSize / nParts) - (if (p == 0) order else 0)
      require(count >= 0, "FLAC: negative partition sample count")
      val param = r.u(paramBits).toInt
      if (param == escape) {
        val raw = r.u(5).toInt
        var i = 0
        while (i < count) { out(idx) = if (raw == 0) 0L else r.s(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary().toLong
          val rem = if (param == 0) 0L else r.u(param)
          val u = (q << param) | rem
          out(idx) = (u >> 1) ^ -(u & 1L) // zigzag
          idx += 1
          i += 1
        }
      }
      p += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // encode (deterministic fixture writer)
  // ------------------------------------------------------------------

  private def zigzag(v: Long): Long = if (v >= 0) v << 1 else ((-v) << 1) - 1

  /** Smallest Rice parameter whose total code length is locally sane:
    * mean-based estimate, deterministic.
    */
  private def riceParam(res: Array[Long]): Int = {
    var sum = 0L
    res.foreach(v => sum += math.abs(v))
    val mean = if (res.isEmpty) 0L else sum / math.max(1, res.length)
    var k = 0
    while ((1L << k) < mean + 1 && k < 14) k += 1
    k
  }

  private def writeResidual(w: BitWriter, res: Array[Long]): Unit = {
    w.u(0, 2) // 4-bit rice params
    w.u(0, 4) // partition order 0
    val k = riceParam(res)
    w.u(k.toLong, 4)
    res.foreach { v =>
      val u = zigzag(v)
      w.unary((u >> k).toInt)
      if (k > 0) w.u(u & ((1L << k) - 1), k)
    }
  }

  /** Encode 16-bit PCM as a spec-shaped FLAC stream. Fixed block size;
    * per-frame subframe rotation: silence → CONSTANT, else frame
    * index mod 3 picks FIXED-2 / VERBATIM / an LPC encoding of the
    * fixed-2 predictor (coefs [2, −1], shift 0 — identical residuals,
    * genuine LPC bitstream). Stereo frames rotate through ALL FOUR
    * channel layouts (independent, mid/side, left/side, right/side)
    * so every decorrelation decode path carries fixture traffic.
    */
  def encodeFlac(pcm: AudioCodec.Pcm, blockSize: Int = 256): Array[Byte] = {
    require(pcm.channels >= 1 && pcm.channels <= 2, "encodeFlac: 1-2 channels")
    require(blockSize >= 16 && blockSize <= 65536, "encodeFlac: bad block size")
    val nCh = pcm.channels
    val nFrames0 = pcm.samples.length / nCh
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO as the single (last) metadata block
    val siw = new BitWriter
    siw.u(1, 1); siw.u(0, 7) // last block, type 0
    siw.u(34, 24)
    siw.u(blockSize.toLong, 16); siw.u(blockSize.toLong, 16)
    siw.u(0, 24); siw.u(0, 24)
    siw.u(pcm.sampleRate.toLong, 20)
    siw.u((nCh - 1).toLong, 3)
    siw.u(15, 5) // bits-1 = 15
    siw.u(nFrames0.toLong, 36)
    (0 until 16).foreach(_ => siw.u(0, 8)) // MD5 unset
    out.write(siw.toByteArray)

    var frameIdx = 0
    var base = 0
    while (base < nFrames0) {
      val bs = math.min(blockSize, nFrames0 - base)
      val chData: Seq[Array[Long]] = (0 until nCh).map { c =>
        Array.tabulate(bs)(i => pcm.samples((base + i) * nCh + c).toLong)
      }
      // stereo decorrelation rotates per frame so every decoder path
      // (independent, mid/side, left/side, right/side) carries fixture
      // traffic: 0 independent, 1 mid/side, 2 left/side, 3 right/side
      val stereoMode = if (nCh == 2) frameIdx % 4 else 0
      val w = new BitWriter
      w.u(0x3FFE, 14)
      w.u(0, 1); w.u(0, 1) // reserved, fixed-blocksize strategy
      w.u(7, 4) // block size: 16-bit at end (covers the short last frame)
      w.u(0, 4) // sample rate: streaminfo
      w.u(stereoMode match {
        case 1 => 10L; case 2 => 8L; case 3 => 9L; case _ => (nCh - 1).toLong
      }, 4)
      w.u(4, 3) // 16-bit samples
      w.u(0, 1)
      // frame number, UTF-8 coded (general multi-byte form: lead byte
      // carries nBytes ones + a zero + (7-nBytes) payload bits, then
      // 6-bit continuations — the same coding the decoder walks)
      if (frameIdx < 0x80) w.u(frameIdx.toLong, 8)
      else {
        var nBytes = 2
        while (frameIdx >= (1L << (6 * (nBytes - 1) + (7 - nBytes))) && nBytes < 7) nBytes += 1
        val leadMask = (0xFF << (8 - nBytes)) & 0xFF
        w.u((leadMask | (frameIdx.toLong >> (6 * (nBytes - 1)))).toLong, 8)
        var k = nBytes - 2
        while (k >= 0) {
          w.u(0x80L | ((frameIdx.toLong >> (6 * k)) & 0x3F), 8)
          k -= 1
        }
      }
      w.u((bs - 1).toLong, 16)
      w.alignToByte()
      val headerBytes = w.toByteArray // CRC-8 over these
      val w2 = new BitWriter
      headerBytes.foreach(x => w2.u((x & 0xff).toLong, 8))
      w2.u(crc8(headerBytes, 0, headerBytes.length).toLong, 8)

      def writeSub(s: Array[Long], bps: Int): Unit = {
        val constant = s.forall(_ == s(0))
        if (constant) {
          w2.u(0, 1); w2.u(0, 6); w2.u(0, 1)
          w2.s(s(0), bps)
        } else if (frameIdx % 3 == 1 || s.length <= 2) {
          w2.u(0, 1); w2.u(1, 6); w2.u(0, 1) // VERBATIM
          s.foreach(v => w2.s(v, bps))
        } else if (frameIdx % 3 == 0) {
          w2.u(0, 1); w2.u(0x08 | 2, 6); w2.u(0, 1) // FIXED order 2
          w2.s(s(0), bps); w2.s(s(1), bps)
          val res = Array.tabulate(s.length - 2)(i => s(i + 2) - 2 * s(i + 1) + s(i))
          writeResidual(w2, res)
        } else {
          // LPC order 2, coefs [2, -1], shift 0 — fixed-2 in LPC clothing
          w2.u(0, 1); w2.u(0x20 | 1, 6); w2.u(0, 1) // LPC, order-1 = 1
          w2.s(s(0), bps); w2.s(s(1), bps)
          w2.u(3, 4) // precision-1 = 3 → 4 bits
          w2.s(0, 5) // shift 0
          w2.s(2, 4); w2.s(-1, 4)
          val res = Array.tabulate(s.length - 2)(i => s(i + 2) - 2 * s(i + 1) + s(i))
          writeResidual(w2, res)
        }
      }

      if (stereoMode != 0) {
        val l = chData(0); val rt = chData(1)
        val side = Array.tabulate(bs)(i => l(i) - rt(i))
        stereoMode match {
          case 1 =>
            writeSub(Array.tabulate(bs)(i => (l(i) + rt(i)) >> 1), 16) // mid
            writeSub(side, 17)
          case 2 =>
            writeSub(l, 16); writeSub(side, 17) // left/side
          case _ =>
            writeSub(side, 17); writeSub(rt, 16) // right/side: side FIRST
        }
      } else chData.foreach(s => writeSub(s, 16))
      w2.alignToByte()
      val body = w2.toByteArray
      out.write(body)
      val fcrc = crc16(body, 0, body.length)
      out.write((fcrc >> 8) & 0xff); out.write(fcrc & 0xff)
      base += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  /** Deterministic FLAC fixture: the SAME ±amp square-wave signal as
    * [[AudioCodec.synthWav]] (8 windows of `wSamples`, amp = 1000 +
    * seed % 9000, [[AudioCodec.SynthPeriod]], `silenceMask` zeroing
    * windows), losslessly FLAC-encoded — so every WAV-side closed form
    * (RMS == amp, window RMS 0-or-amp, sample sums) holds verbatim for
    * the decoded stream. `stereo` duplicates the signal with the right
    * channel inverted (mid = 0, side = 2·left — the mid/side frames
    * get real work).
    */
  def synthFlac(seed: Long, wSamples: Int, rate: Int, silenceMask: Int,
                stereo: Boolean): Array[Byte] = {
    require(seed >= 0, s"synthFlac: seed must be non-negative, got $seed")
    val mono = AudioCodec.decodeWav(AudioCodec.synthWav(seed, wSamples, rate, silenceMask))
    val pcm =
      if (!stereo) mono
      else {
        val s = new Array[Short](mono.samples.length * 2)
        var i = 0
        while (i < mono.samples.length) {
          s(2 * i) = mono.samples(i)
          s(2 * i + 1) = (-mono.samples(i)).toShort
          i += 1
        }
        AudioCodec.Pcm(mono.sampleRate, 2, s)
      }
    encodeFlac(pcm, blockSize = math.max(16, wSamples))
  }

  /** FLAC → canonical WAV bytes, so the whole WAV analysis layer
    * (RMS, VAD, resample) composes on speech-corpus payloads.
    */
  def flacToWav(b: Array[Byte]): Array[Byte] = AudioCodec.encodeWav(decodeFlac(b))
}
