package graft.sources

/** A REAL audio codec with zero new dependencies: the WAV/PCM16
  * container parsed and written byte-for-byte (RIFF chunk walk),
  * deterministic square-wave synthesis for fixtures, exact integer
  * analysis (RMS, per-window RMS for VAD-style segmentation), and
  * integer-rational linear resampling. This upgrades the multimodal
  * audio path from the seeded stub to real bytes — after the round-8
  * image ([[ImageCodec]]) and PDF ([[PdfCodec]]) codecs, VIDEO is the
  * engine's only remaining stubbed media family (the JDK ships no
  * video codec; the reference ships no audio or video path at all, so
  * this whole layer is the training-data extension of SURVEY §2.13).
  *
  * All analysis is integer-exact by construction so results are
  * reproducible cross-engine in the DuckDB oracle: the synth fixture
  * is a ±amp square wave (RMS == amp exactly, no trigonometry), the
  * resampler uses exact rational positions (no floating-point drift),
  * and window RMS over a silence mask is 0-or-amp in closed form.
  *
  * Codec boundary: WAV (here) and FLAC ([[FlacCodec]]) cover the
  * lossless speech-corpus formats; MP3 and OGG-Vorbis are
  * absent-by-constraint — patent-era lossy DSP codecs with no pure-JDK
  * decoder in a zero-egress build, the same class as the H.264/VP9
  * video note in [[AviCodec]]. (The compression walls fell in rounds
  * 14-15: zstd via [[ZstdCodec]], xz/LZMA via [[XzCodec]], bzip2 via
  * [[BzipCodec]], all from-scratch; brotli DECODE fell in round 17 via
  * [[BrotliCodec]] — no JVM oracle exists on this classpath, so its
  * gate is pinned reference-encoder output rather than a live dual
  * oracle, and the ENCODE side stays out of subset for exactly that
  * oracle-gap reason.) Containers are still detected and labeled so a
  * pipeline quarantines them rather than silently dropping.
  */
object AudioCodec {

  /** Decoded PCM16 audio: interleaved samples when channels > 1. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length > 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  @inline private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  @inline private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Parse a PCM16 RIFF/WAVE payload; null for anything else (wrong
    * magic, compressed format codes, truncated chunks, 8/24-bit) —
    * the same null-propagation contract as the image/PDF decoders.
    * Walks the chunk list properly (word-aligned sizes, unknown
    * chunks skipped), so payloads with LIST/INFO metadata chunks
    * decode fine.
    */
  def decodeWav(b: Array[Byte]): Pcm = {
    if (!isWav(b)) return null
    try {
      var off = 12
      var rate = 0
      var ch = 0
      var haveFmt = false
      var data: Array[Short] = null
      while (off + 8 <= b.length) {
        val id = new String(b, off, 4, "US-ASCII")
        val sz = le32(b, off + 4)
        val body = off + 8
        if (sz < 0 || body + sz > b.length) return null // truncated chunk
        id match {
          case "fmt " =>
            if (sz < 16) return null
            val fmt = le16(b, body)
            ch = le16(b, body + 2)
            rate = le32(b, body + 4)
            val bits = le16(b, body + 14)
            if (fmt != 1 || bits != 16 || ch < 1 || rate <= 0) return null
            haveFmt = true
          case "data" =>
            val n = sz / 2
            val s = new Array[Short](n)
            var i = 0
            while (i < n) {
              s(i) = ((b(body + 2 * i) & 0xff) | (b(body + 2 * i + 1) << 8)).toShort
              i += 1
            }
            data = s
          case _ => ()
        }
        off = body + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      if (!haveFmt || data == null) null else Pcm(rate, ch, data)
    } catch { case _: Exception => null }
  }

  /** Canonical 44-byte-header PCM16 WAV bytes (fmt then data). */
  def encodeWav(p: Pcm): Array[Byte] = {
    val dataBytes = p.samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    @inline def put32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    @inline def put16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    @inline def putTag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    putTag(0, "RIFF"); put32(4, 36 + dataBytes); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, p.channels)
    put32(24, p.sampleRate)
    put32(28, p.sampleRate * p.channels * 2) // byte rate
    put16(32, p.channels * 2) // block align
    put16(34, 16)
    putTag(36, "data"); put32(40, dataBytes)
    var i = 0
    while (i < p.samples.length) {
      out(44 + 2 * i) = p.samples(i).toByte
      out(44 + 2 * i + 1) = (p.samples(i) >> 8).toByte
      i += 1
    }
    out
  }

  /** Synth period in samples (fixed; any even value works — every
    * sample is ±amp regardless, keeping RMS == amp exact).
    */
  val SynthPeriod = 16

  /** Deterministic mono square-wave fixture: 8 windows of `wSamples`
    * each at `rate` Hz, amplitude `1000 + seed % 9000` (seed must be
    * ≥ 0 — the formula is mirrored in oracle SQL), alternating ±amp
    * with period [[SynthPeriod]]. Bit i of `silenceMask` (0-7) zeroes
    * window i — giving VAD-style queries an exact closed form: window
    * RMS is amp or 0, never anything in between.
    */
  def synthWav(seed: Long, wSamples: Int, rate: Int, silenceMask: Int): Array[Byte] = {
    require(seed >= 0, s"synthWav: seed must be non-negative, got $seed")
    val amp = (1000 + seed % 9000).toInt
    val w = math.max(1, wSamples)
    val n = 8 * w
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      val silent = ((silenceMask >> (i / w)) & 1) == 1
      if (!silent) {
        val sign = if ((i / (SynthPeriod / 2)) % 2 == 0) 1 else -1
        s(i) = (sign * amp).toShort
      }
      i += 1
    }
    encodeWav(Pcm(rate, 1, s))
  }

  /** [n_samples, sample_rate, channels, duration_ms] with duration as
    * floor(n·1000/rate) per channel-frame — integer math only, exactly
    * reproducible in SQL. Null when not decodable PCM16.
    */
  def wavInfo(b: Array[Byte]): Array[Long] = {
    val p = decodeWav(b)
    if (p == null) null
    else {
      val frames = p.samples.length / p.channels
      Array(p.samples.length.toLong, p.sampleRate.toLong, p.channels.toLong,
        frames.toLong * 1000 / p.sampleRate)
    }
  }

  /** Integer global RMS: round(sqrt(Σs²/n)). Exact (== amp) for the
    * square-wave fixture; -1 for an empty payload, null-contract via
    * the expression layer for non-WAV bytes.
    */
  def rms(b: Array[Byte]): Long = {
    val p = decodeWav(b)
    if (p == null) return -1L
    rmsOf(p.samples, 0, p.samples.length)
  }

  @inline private def rmsOf(s: Array[Short], from: Int, until: Int): Long = {
    val n = until - from
    if (n <= 0) return 0L
    var sum = 0L
    var i = from
    while (i < until) { sum += s(i).toLong * s(i); i += 1 }
    math.round(math.sqrt(sum.toDouble / n))
  }

  /** Per-window integer RMS over `wSamples`-sample windows (last
    * window may be short) — the segmentation primitive VAD-style
    * filters build on. Null for non-WAV payloads.
    */
  def windowRms(b: Array[Byte], wSamples: Int): Array[Long] = {
    val p = decodeWav(b)
    if (p == null || wSamples <= 0) return null
    val n = p.samples.length
    val out = new Array[Long]((n + wSamples - 1) / wSamples)
    var w = 0
    while (w < out.length) {
      out(w) = rmsOf(p.samples, w * wSamples, math.min(n, (w + 1) * wSamples))
      w += 1
    }
    out
  }

  /** Linear resample to `targetRate` using EXACT rational source
    * positions (for output index j, source position is j·src/target:
    * integer index (j·src)/target with remainder-weighted interpolation
    * — no floating point, so output bytes are platform-exact). Output
    * length is n·target/src (floor), mirrored in oracle SQL. Mono or
    * interleaved input resamples per channel-frame only when mono;
    * multi-channel payloads return null (the engine's fixtures are
    * mono; widen when a source needs it). Null for non-WAV bytes.
    */
  def resample(b: Array[Byte], targetRate: Int): Array[Byte] = {
    val p = decodeWav(b)
    if (p == null || targetRate <= 0 || p.channels != 1) return null
    val n = p.samples.length
    val src = p.sampleRate
    if (src == targetRate) return encodeWav(p)
    val outN = (n.toLong * targetRate / src).toInt
    val out = new Array[Short](outN)
    var j = 0
    while (j < outN) {
      val pos = j.toLong * src
      val idx = (pos / targetRate).toInt
      val rem = pos % targetRate
      val a = p.samples(math.min(idx, n - 1)).toLong
      val c = p.samples(math.min(idx + 1, n - 1)).toLong
      out(j) = (a + (c - a) * rem / targetRate).toShort
      j += 1
    }
    encodeWav(Pcm(targetRate, 1, out))
  }
}
