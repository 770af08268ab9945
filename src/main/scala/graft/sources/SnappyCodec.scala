package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** From-scratch SNAPPY codec — raw block format AND the framing format
  * (the `.sz` / snappy-framed stream) — the sixth compressed corpus
  * front door, written against the public `format_description.txt` and
  * `framing_format.txt` specs (github.com/google/snappy; same
  * open-spec discipline as [[ZstdCodec]]/[[XzCodec]]/[[BzipCodec]]/
  * [[Lz4Codec]]). Snappy framing shows up in Hadoop-adjacent shard
  * interchange where decode speed beats ratio.
  *
  * Subset:
  *   - raw blocks: full tag decode (literals with 1-4 extra length
  *     bytes, 1/2/4-byte-offset copies, overlapping copies), varint
  *     preamble, declared-length verification;
  *   - framed streams: stream identifier verified, compressed (0x00)
  *     and uncompressed (0x01) chunks with their MASKED CRC-32C
  *     verified, padding (0xfe) and reserved-skippable (0x80-0xfd)
  *     chunks skipped, reserved-unskippable (0x02-0x7f) loud,
  *     concatenated streams;
  *   - the 65536-byte per-chunk uncompressed bound enforced.
  *
  * The fixture ENCODER (greedy hash-table matcher emitting 1/2-byte-
  * offset copies, store-uncompressed chunk fallback) emits
  * spec-conformant streams the real snappy-java implementation on the
  * Spark classpath must accept byte-exact, and real
  * `SnappyFramedOutputStream` / `Snappy.compress` output must decode
  * byte-exact here (SnappyCodecSpec; snappy-java imports live ONLY in
  * tests). CRC-32C itself comes from `java.util.zip.CRC32C` (JDK
  * built-in), with the framing spec's mask applied here.
  *
  * Scale: member-grain splits come from [[memberOffsets]], which walks
  * DECLARED chunk lengths — ~4 bytes read per chunk, no decode.
  */
object SnappyCodec {
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"snappy: $msg")

  private val StreamId: Array[Byte] =
    Array[Byte](0xff.toByte, 0x06, 0x00, 0x00, 's', 'N', 'a', 'P', 'p', 'Y')
  private val ChunkMax = 65536 // max UNCOMPRESSED bytes per framed chunk

  def isSnappyFramed(b: Array[Byte]): Boolean =
    b != null && b.length >= StreamId.length && {
      var i = 0
      var ok = true
      while (ok && i < StreamId.length) { ok = b(i) == StreamId(i); i += 1 }
      ok
    }

  // ------------------------------------------------------------------
  // CRC-32C masking (framing_format.txt §3)
  // ------------------------------------------------------------------
  private def maskedCrc(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  // ------------------------------------------------------------------
  // Raw block format
  // ------------------------------------------------------------------
  /** Decode ONE raw snappy block (the `Snappy.uncompress` unit); loud
    * on any malformation, including a length preamble that the decoded
    * bytes do not match. `maxOut` is the zip-bomb guard.
    */
  def decodeRaw(b: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] =
    decodeRawAt(b, 0, if (b == null) 0 else b.length, maxOut)

  /** [[decodeRaw]] over a slice — the framed walk's per-chunk entry,
    * so chunk decode never copies the compressed bytes first.
    */
  def decodeRawAt(b: Array[Byte], from: Int, srcLen: Int, maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) fail("null block")
    var p = from
    val end = from + srcLen
    // varint32 uncompressed length
    var declared = 0L
    var shift = 0
    var more = true
    while (more) {
      if (p >= end) fail("truncated length preamble")
      val by = b(p) & 0xff; p += 1
      declared |= (by & 0x7fL) << shift
      shift += 7
      if (shift > 35) fail("length preamble over 5 bytes")
      more = (by & 0x80) != 0
    }
    if (declared > maxOut) fail(s"declared size $declared over cap $maxOut")
    val n = declared.toInt
    val out = new Array[Byte](n)
    var o = 0
    while (p < end) {
      val tag = b(p) & 0xff; p += 1
      (tag & 3) match {
        case 0 => // literal
          var len = (tag >> 2) + 1
          if (len > 60) {
            val extra = len - 61 + 1 // 61..64 → 1..4 extra bytes
            if (p + extra > end) fail("truncated literal length")
            var v = 0L
            var i = 0
            while (i < extra) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
            p += extra
            if (v + 1 > Int.MaxValue) fail("literal length overflow")
            len = (v + 1).toInt
          }
          // len can be up to Int.MaxValue — compare in Long so the
          // guards fail loud instead of wrapping negative
          if (p.toLong + len > end) fail("literal overruns block")
          if (o.toLong + len > n) fail("literal overruns declared size")
          System.arraycopy(b, p, out, o, len)
          p += len; o += len
        case c =>
          var len = 0
          var offset = 0
          if (c == 1) {
            if (p >= end) fail("truncated copy-1")
            len = ((tag >> 2) & 7) + 4
            offset = ((tag >> 5) << 8) | (b(p) & 0xff); p += 1
          } else if (c == 2) {
            if (p + 2 > end) fail("truncated copy-2")
            len = (tag >> 2) + 1
            offset = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8); p += 2
          } else {
            if (p + 4 > end) fail("truncated copy-4")
            len = (tag >> 2) + 1
            offset = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
              ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
            p += 4
            if (offset < 0) fail("copy-4 offset overflow")
          }
          if (offset == 0) fail("zero copy offset")
          if (offset > o) fail("copy reaches before block start")
          if (o + len > n) fail("copy overruns declared size")
          var src = o - offset
          if (offset >= len) {
            // non-overlapping: one block copy (the hot path)
            System.arraycopy(out, src, out, o, len)
          } else {
            // overlapping: the replicating byte walk the format requires
            var i = 0
            while (i < len) { out(o + i) = out(src); src += 1; i += 1 }
          }
          o += len
      }
    }
    if (o != n) fail(s"declared $n bytes, decoded $o")
    out
  }

  /** Compress one raw block: greedy 4-byte hash-table matcher emitting
    * 2-byte-offset copies (1-byte-offset when it fits), literals
    * otherwise — the spec's encoder shape at its simplest conformant.
    */
  def encodeRaw(data: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len / 2 + 16)
    // varint preamble
    var v = len
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    def literal(at: Int, n0: Int): Unit = {
      var at2 = at
      var n = n0
      while (n > 0) {
        val take = math.min(n, 65536) // keep extra-length bytes ≤ 3
        if (take <= 60) out.write(((take - 1) << 2))
        else {
          // extended form: tag values 60..63 announce 1..4 extra
          // length bytes holding len-1 LE (value 59 + byteCount)
          val lv = take - 1
          val extra = if (lv < 256) 1 else if (lv < 65536) 2 else 3
          out.write(((59 + extra) << 2))
          var i = 0
          while (i < extra) { out.write((lv >> (8 * i)) & 0xff); i += 1 }
        }
        out.write(data, at2, take)
        at2 += take; n -= take
      }
    }
    def copy(offset: Int, n0: Int): Unit = {
      var n = n0
      // long matches split into ≤64-byte copy-2 tags (spec range 1..64)
      while (n > 0) {
        val take = if (n > 64 && n < 68) n - 60 else math.min(n, 64)
        if (take >= 4 && take <= 11 && offset < 2048) {
          out.write(1 | ((take - 4) << 2) | ((offset >> 8) << 5))
          out.write(offset & 0xff)
        } else {
          out.write(2 | ((take - 1) << 2))
          out.write(offset & 0xff); out.write((offset >> 8) & 0xff)
        }
        n -= take
      }
    }
    if (len < 4) { literal(from, len); return out.toByteArray }
    val tab = new Array[Int](1 << 13)
    java.util.Arrays.fill(tab, -1)
    def read32(p: Int): Int =
      (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8) |
        ((data(p + 2) & 0xff) << 16) | ((data(p + 3) & 0xff) << 24)
    def hash(x: Int): Int = (x * 0x9E3779B1) >>> (32 - 13)
    val end = from + len
    var anchor = from
    var pos = from
    while (pos + 4 <= end) {
      val h = hash(read32(pos))
      val cand = tab(h)
      tab(h) = pos
      if (cand >= from && pos - cand <= 0xffff && read32(cand) == read32(pos)) {
        var ml = 4
        while (pos + ml < end && data(cand + ml) == data(pos + ml)) ml += 1
        if (pos > anchor) literal(anchor, pos - anchor)
        copy(pos - cand, ml)
        anchor = pos + ml
        pos = anchor
      } else pos += 1
    }
    if (anchor < end) literal(anchor, end - anchor)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Framing format
  // ------------------------------------------------------------------
  /** Decode all framed streams; loud on any damage (CRC, identifier,
    * reserved-unskippable chunks, chunk bounds).
    */
  def decompress(b: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 2))
    var p = walk(b, 0, out, maxOut, want = -1)
    while (p < b.length) p = walk(b, p, out, maxOut, want = -1)
    out.toByteArray
  }

  /** Best-effort decode: verified chunks before the first damage. */
  def decompressTolerant(b: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 2))
    try {
      var p = walk(b, 0, out, maxOut, want = -1)
      while (p < b.length) p = walk(b, p, out, maxOut, want = -1)
    } catch { case _: Exception => () }
    out.toByteArray
  }

  /** Bounded sniff: first `want` decoded bytes, chunk-grain stop. */
  def decodePrefix(b: Array[Byte], want: Int): Array[Byte] = {
    if (b == null) return null
    val out = new java.io.ByteArrayOutputStream(math.min(1 << 16, want + ChunkMax))
    try {
      var p = walk(b, 0, out, want + ChunkMax, want = want)
      while (p < b.length && out.size() < want)
        p = walk(b, p, out, want + ChunkMax, want = want)
    } catch { case _: Exception => () }
    val raw = out.toByteArray
    if (raw.length <= want) raw else java.util.Arrays.copyOf(raw, want)
  }

  /** Walk ONE framed stream starting at `at` (which must be a stream
    * identifier); returns the offset after it (= the next stream's
    * identifier in a concatenated shard).
    */
  private def walk(b: Array[Byte], at: Int, out: java.io.ByteArrayOutputStream,
      maxOut: Int, want: Int): Int = {
    var p = at
    if (p + StreamId.length > b.length) fail("truncated stream identifier")
    var i = 0
    while (i < StreamId.length) {
      if (b(p + i) != StreamId(i)) fail("bad stream identifier")
      i += 1
    }
    p += StreamId.length
    var done = false
    while (!done && p < b.length) {
      if (p + 4 > b.length) fail("truncated chunk header")
      val t = b(p) & 0xff
      val len = (b(p + 1) & 0xff) | ((b(p + 2) & 0xff) << 8) | ((b(p + 3) & 0xff) << 16)
      if (t == 0xff) done = true // next stream's identifier — do not consume
      else {
        p += 4
        if (p + len > b.length) fail("chunk overruns input")
        t match {
          case 0x00 => // compressed data: masked CRC + raw snappy block
            if (len < 4) fail("compressed chunk under 4 bytes")
            val dec = decodeRawAt(b, p + 4, len - 4, ChunkMax)
            if (dec.length > ChunkMax) fail("chunk over 65536 uncompressed bytes")
            if (maskedCrc(dec, 0, dec.length) !=
              ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)))
              fail("chunk CRC mismatch")
            if (out.size() + dec.length > maxOut) fail(s"output over cap ($maxOut bytes)")
            out.write(dec, 0, dec.length)
          case 0x01 => // uncompressed data: masked CRC + raw bytes
            if (len < 4) fail("uncompressed chunk under 4 bytes")
            val n = len - 4
            if (n > ChunkMax) fail("chunk over 65536 uncompressed bytes")
            if (maskedCrc(b, p + 4, n) !=
              ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)))
              fail("chunk CRC mismatch")
            if (out.size() + n > maxOut) fail(s"output over cap ($maxOut bytes)")
            out.write(b, p + 4, n)
          case 0xfe => () // padding
          case r if r >= 0x80 && r <= 0xfd => () // reserved skippable
          case r => fail(f"reserved unskippable chunk type 0x$r%02x")
        }
        p += len
        if (want >= 0 && out.size() >= want) done = true
      }
    }
    p
  }

  /** Byte offsets + lengths of the concatenated framed streams — the
    * member-grain split plan; chunk lengths are declared, so the walk
    * reads 4 bytes per chunk and decodes nothing.
    */
  def memberOffsets(b: Array[Byte]): Array[(Long, Long)] = {
    if (!isSnappyFramed(b)) fail("not a snappy-framed payload")
    val res = Vector.newBuilder[(Long, Long)]
    var p = 0
    while (p < b.length) {
      val start = p
      p += StreamId.length
      var done = false
      while (!done && p < b.length) {
        if (p + 4 > b.length) fail("truncated chunk header")
        val t = b(p) & 0xff
        val len = (b(p + 1) & 0xff) | ((b(p + 2) & 0xff) << 8) | ((b(p + 3) & 0xff) << 16)
        if (t == 0xff) done = true
        else {
          if (t >= 0x02 && t <= 0x7f) fail(f"reserved unskippable chunk type 0x$t%02x")
          p += 4 + len
          if (p > b.length) fail("chunk overruns input")
        }
      }
      res += ((start.toLong, (p - start).toLong))
      if (!done) () // payload ended inside this stream — loop exits
      else if (b(p) != StreamId(0) || p + StreamId.length > b.length ||
        !isSnappyFramed(java.util.Arrays.copyOfRange(b, p, math.min(b.length, p + StreamId.length))))
        fail("bad stream identifier at member boundary")
    }
    res.result().toArray
  }

  /** One framed stream around `data`: ≤65536-byte chunks, each
    * compressed unless compression does not pay (then the spec's
    * uncompressed chunk form), every chunk CRC-stamped. `withPadding`
    * inserts a padding chunk after the identifier — the parser branch
    * real writers (e.g. aligned writers) exercise.
    */
  def compressFramed(data: Array[Byte], withPadding: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    out.write(StreamId, 0, StreamId.length)
    if (withPadding) {
      out.write(0xfe); out.write(3); out.write(0); out.write(0)
      out.write(0); out.write(0); out.write(0)
    }
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    var p = 0
    while (p < data.length || (p == 0 && data.length == 0)) {
      val n = math.min(ChunkMax, data.length - p)
      if (n == 0 && data.length > 0) return out.toByteArray
      val crc = maskedCrc(data, p, n)
      val comp = encodeRaw(data, p, n)
      if (comp.length < n) {
        out.write(0x00)
        val len = comp.length + 4
        out.write(len & 0xff); out.write((len >> 8) & 0xff); out.write((len >> 16) & 0xff)
        w32(crc)
        out.write(comp, 0, comp.length)
      } else {
        out.write(0x01)
        val len = n + 4
        out.write(len & 0xff); out.write((len >> 8) & 0xff); out.write((len >> 16) & 0xff)
        w32(crc)
        out.write(data, p, n)
      }
      p += n
      if (data.length == 0) return out.toByteArray
    }
    out.toByteArray
  }

  /** Multi-stream fixture in the [[GzipShard.synthJsonlGz]] shape: one
    * framed stream per member, padding chunks on every third member so
    * the skip branch stays exercised under the hash gate.
    */
  def synthJsonlSnappy(seed: Long, nMembers: Int, linesPer: Int): Array[Byte] = {
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
      out.write(compressFramed(sb.toString.getBytes(UTF_8), withPadding = m % 3 == 2))
    }
    out.toByteArray
  }

  /** `.jsonl.sz` shard → newline-joined `text` fields (tolerant; null
    * when nothing decodes or no line carries a text member).
    */
  def jsonlSnappyText(b: Array[Byte]): String = {
    if (!isSnappyFramed(b)) return null
    val raw = decompressTolerant(b)
    if (raw == null || raw.length == 0) return null
    val texts = new String(raw, UTF_8).split("\n")
      .iterator.map(GzipShard.textField).filter(_ != null).toSeq
    if (texts.isEmpty) null else texts.mkString("\n")
  }

  // ------------------------------------------------------------------
  // Hadoop block format
  // ------------------------------------------------------------------
  /** The `.snappy` files Hadoop's SnappyCodec writes are NEITHER raw
    * snappy NOR the framing format: `BlockCompressorStream` emits, per
    * buffer-sized block, a 4-byte BE UNCOMPRESSED length followed by
    * one or more [4-byte BE compressed length][raw snappy block]
    * chunks until the block's content is complete. No magic, no
    * checksums — the container is only STRUCTURALLY detectable:
    * [[isHadoopSnappy]] walks the exact geometry (block lengths,
    * chunk lengths, each chunk's declared varint preamble) without
    * decoding, and only a byte-exact walk routes. HDFS exports hit
    * this form before either spec'd one.
    */
  private val HadoopBlockMax = 64 << 20 // sanity cap; buffers are config-scaled in the wild

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  /** Raw snappy varint preamble at `p` — the chunk's DECLARED decoded
    * size, read without decoding (the structural walk's grip).
    */
  private def rawDeclared(b: Array[Byte], p: Int, end: Int): Long = {
    var declared = 0L
    var shift = 0
    var q = p
    var more = true
    while (more) {
      if (q >= end) fail("truncated length preamble")
      val by = b(q) & 0xff; q += 1
      declared |= (by & 0x7fL) << shift
      shift += 7
      if (shift > 35) fail("length preamble over 5 bytes")
      more = (by & 0x80) != 0
    }
    declared
  }

  /** Structural walk of the Hadoop container: calls `onChunk(blockIdx,
    * chunkFrom, chunkLen, declared)` per chunk and returns the block
    * count; loud on any geometry violation. Decodes nothing itself.
    */
  private def hadoopWalk(b: Array[Byte], onChunk: (Int, Int, Int, Int) => Int): Int = {
    var p = 0
    var blocks = 0
    while (p < b.length) {
      if (p + 4 > b.length) fail("hadoop: truncated block length")
      val origLen = be32(b, p)
      // origLen == 0 is REAL: BlockCompressorStream.finish() emits a
      // trailing empty block (observed from Hadoop's own writer)
      if (origLen < 0 || origLen > HadoopBlockMax) fail(s"hadoop: implausible block length $origLen")
      p += 4
      var rem = origLen
      while (rem > 0) {
        if (p + 4 > b.length) fail("hadoop: truncated chunk length")
        val chunkLen = be32(b, p)
        p += 4
        if (chunkLen <= 0 || p.toLong + chunkLen > b.length) fail("hadoop: chunk overruns input")
        val declared = rawDeclared(b, p, p + chunkLen)
        if (declared <= 0 || declared > rem) fail(s"hadoop: chunk declares $declared of $rem remaining")
        rem -= onChunk(blocks, p, chunkLen, declared.toInt)
        p += chunkLen
      }
      blocks += 1
    }
    blocks
  }

  /** True iff the payload is a byte-exact Hadoop-snappy container (at
    * least one block, every length field consistent to the last byte).
    * A heuristic by necessity — the format has no magic — but the
    * full-geometry walk leaves essentially no room for accidental
    * matches on other formats.
    */
  def isHadoopSnappy(b: Array[Byte]): Boolean =
    b != null && b.length >= 9 && {
      // require actual content, not just empty blocks — a run of zero
      // words would otherwise walk "exactly" and route garbage here
      var content = 0L
      try {
        hadoopWalk(b, (_, _, _, declared) => { content += declared; declared })
        content > 0
      } catch { case _: Exception => false }
    }

  /** Decode a Hadoop-snappy container; loud on any damage. */
  def decodeHadoop(b: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 2))
    hadoopWalk(b, (_, from, len, declared) => {
      val dec = decodeRawAt(b, from, len, maxOut)
      if (dec.length != declared) fail("hadoop: chunk decode size mismatch") // unreachable: preamble IS declared
      if (out.size() + dec.length > maxOut) fail(s"output over cap ($maxOut bytes)")
      out.write(dec, 0, dec.length)
      dec.length
    })
    out.toByteArray
  }

  /** Best-effort [[decodeHadoop]]: verified blocks before the first
    * damage (the sibling tolerant-surface contract). Partial blocks
    * are dropped block-grain.
    */
  def decodeHadoopTolerant(b: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] = {
    if (b == null) return null
    val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 2))
    var goodBlocks = 0
    var pending = new java.io.ByteArrayOutputStream()
    try {
      hadoopWalk(b, (blockIdx, from, len, _) => {
        if (blockIdx > goodBlocks) { out.write(pending.toByteArray); pending = new java.io.ByteArrayOutputStream(); goodBlocks = blockIdx }
        val dec = decodeRawAt(b, from, len, maxOut)
        if (out.size() + pending.size() + dec.length > maxOut) fail(s"output over cap ($maxOut bytes)")
        pending.write(dec, 0, dec.length)
        dec.length
      })
      out.write(pending.toByteArray)
    } catch { case _: Exception => () }
    out.toByteArray
  }

  /** Byte offsets + lengths of the container's BLOCKS — the split
    * grain of a Hadoop-snappy shard (each block decodes
    * independently); declared lengths only, no decode.
    */
  def hadoopBlockOffsets(b: Array[Byte]): Array[(Long, Long)] = {
    if (!isHadoopSnappy(b)) fail("not a hadoop-snappy payload")
    val starts = Vector.newBuilder[Long]
    var lastBlock = -1
    var blockStart = 0L
    hadoopWalk(b, (blockIdx, from, _, declared) => {
      if (blockIdx != lastBlock) {
        blockStart = from - 8L // before chunk length + block length words
        starts += blockStart
        lastBlock = blockIdx
      }
      declared
    })
    val s = starts.result() :+ b.length.toLong
    s.sliding(2).map { case Seq(a, e) => (a, e - a) }.toArray
  }

  /** Fixture writer for the Hadoop container. `chunkSize < blockSize`
    * produces the multi-chunk blocks `BlockCompressorStream` emits
    * when its compressor buffer is smaller than the block buffer.
    */
  def encodeHadoop(data: Array[Byte], blockSize: Int = 1 << 18, chunkSize: Int = -1): Array[Byte] = {
    require(blockSize > 0 && blockSize <= HadoopBlockMax, s"hadoop block size $blockSize")
    val cs = if (chunkSize <= 0) blockSize else math.min(chunkSize, blockSize)
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    def wbe32(v: Int): Unit = {
      out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    var p = 0
    while (p < data.length) {
      val n = math.min(blockSize, data.length - p)
      wbe32(n)
      var q = p
      while (q < p + n) {
        val c = math.min(cs, p + n - q)
        val comp = encodeRaw(data, q, c)
        wbe32(comp.length)
        out.write(comp, 0, comp.length)
        q += c
      }
      p += n
    }
    out.toByteArray
  }

  /** Multi-member Hadoop-snappy fixture (appended blocks; the format
    * has no member concept, so members are just more blocks), rotating
    * block and chunk sizes so single- and multi-chunk blocks both sit
    * under the hash gate.
    */
  def synthJsonlSnappyHadoop(seed: Long, nMembers: Int, linesPer: Int): Array[Byte] = {
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
      val data = sb.toString.getBytes(UTF_8)
      out.write(
        if (m % 2 == 0) encodeHadoop(data, blockSize = 1 << 18)
        else encodeHadoop(data, blockSize = 1 << 18, chunkSize = 64))
    }
    out.toByteArray
  }

  /** Bounded sniff: first `want` decoded bytes of the Hadoop
    * container, chunk-grain stop (the [[decodePrefix]] analog for the
    * magic-less form).
    */
  def decodeHadoopPrefix(b: Array[Byte], want: Int): Array[Byte] = {
    if (b == null) return null
    val out = new java.io.ByteArrayOutputStream(math.min(want + 4096, 1 << 20))
    try {
      hadoopWalk(b, (_, from, len, declared) => {
        if (out.size() < want) {
          val dec = decodeRawAt(b, from, len, 1 << 26)
          out.write(dec, 0, dec.length)
          dec.length
        } else declared // past `want`: walk structurally, decode nothing
      })
    } catch { case _: Exception => () }
    val raw = out.toByteArray
    if (raw.length <= want) raw else java.util.Arrays.copyOf(raw, want)
  }

  /** `.snappy` Hadoop-container shard → newline-joined `text` fields
    * (tolerant; null when nothing decodes or no line carries a text
    * member) — the [[jsonlSnappyText]] analog for the HDFS form.
    */
  def jsonlSnappyHadoopText(b: Array[Byte]): String = {
    if (!isHadoopSnappy(b)) return null
    val raw = decodeHadoopTolerant(b)
    if (raw == null || raw.length == 0) return null
    val texts = new String(raw, UTF_8).split("\n")
      .iterator.map(GzipShard.textField).filter(_ != null).toSeq
    if (texts.isEmpty) null else texts.mkString("\n")
  }

  /** Decoded UTF-8 text of a Hadoop-snappy container (tolerant,
    * block-grain prefix on damage); null when the geometry does not
    * walk or nothing decodes.
    */
  def unsnappyHadoopText(b: Array[Byte]): String = {
    if (!isHadoopSnappy(b)) return null
    val raw = decodeHadoopTolerant(b)
    if (raw == null || raw.length == 0) null else new String(raw, UTF_8)
  }

  /** Full decoded UTF-8 text of all framed streams (tolerant) — the
    * sixth member of the gunzip/unzstd/unxz/unbzip2/unlz4 family.
    */
  def unsnappyText(b: Array[Byte]): String = {
    if (!isSnappyFramed(b)) return null
    val raw = decompressTolerant(b)
    if (raw == null || raw.length == 0) null else new String(raw, UTF_8)
  }
}
