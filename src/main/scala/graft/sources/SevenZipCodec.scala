package graft.sources

import java.nio.charset.StandardCharsets.{UTF_8, UTF_16LE}

/** 7-Zip container codec — the archive format code corpora ship in
  * when they aren't tarballs (GitHub release assets, Windows-world
  * datasets). Written against the public `7zFormat.txt` specification
  * (the 7-Zip source distribution's format document; same open-spec
  * discipline as every codec here). The COMPRESSION inside is the
  * LZMA machinery this repo already built for XZ: 7z's LZMA2 coder is
  * byte-identical to XZ's chunked stream ([[XzCodec.lzma2]]) and its
  * classic LZMA coder is one continuous raw stream
  * ([[XzCodec.lzmaRaw]] — external props, no end marker).
  *
  * Subset:
  *   - signature header (CRC-verified), plain AND LZMA-compressed
  *     (`kEncodedHeader`) metadata headers;
  *   - single-coder folders: Copy (0x00), LZMA (0x030101),
  *     LZMA2 (0x21); multi-coder chains (BCJ filters, delta) and
  *     AES-encrypted archives are OUT of subset, loud by method id;
  *   - substream splitting with CRC-32 verification where digests are
  *     present; empty files and empty streams;
  *   - UTF-16LE names (kName), unknown file properties skipped by
  *     their declared size (the format makes them skippable).
  *
  * The fixture WRITER emits store-only (Copy-coder) archives — valid
  * 7z that the real implementation accepts; LZMA/LZMA2-compressed
  * READ coverage comes from real commons-compress `SevenZOutputFile`
  * archives in the spec (the dual-oracle discipline: ours readable
  * there, theirs readable here — commons-compress lives ONLY in
  * tests).
  *
  * Scale: one archive decodes in one task (7z folders are solid —
  * substreams inside a folder share one compressed stream, so the
  * folder is the split grain, not the file; [[entries]] reads ONLY
  * the header, so listing a 100 TB lake of archives never touches
  * payload bytes).
  */
object SevenZipCodec {
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"7z: $msg")

  private val Magic = Array[Byte]('7', 'z', 0xBC.toByte, 0xAF.toByte, 0x27, 0x1C)

  def isSevenZip(b: Array[Byte]): Boolean =
    b != null && b.length >= 32 && {
      var i = 0
      var ok = true
      while (ok && i < 6) { ok = b(i) == Magic(i); i += 1 }
      ok
    }

  private def crc32(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue.toInt
  }

  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def le64(b: Array[Byte], p: Int): Long =
    (le32(b, p).toLong & 0xffffffffL) | ((le32(b, p + 4).toLong & 0xffffffffL) << 32)

  // ------------------------------------------------------------------
  // Property-stream reader
  // ------------------------------------------------------------------
  private final class Rd(val b: Array[Byte], var p: Int, val end: Int) {
    def byte(): Int = {
      if (p >= end) fail("truncated header")
      val v = b(p) & 0xff; p += 1; v
    }
    /** 7z variable-length number (7zFormat.txt REAL_UINT64). */
    def num(): Long = {
      val first = byte()
      var mask = 0x80
      var value = 0L
      var i = 0
      while (i < 8) {
        if ((first & mask) == 0) {
          return value | ((first & (mask - 1)).toLong << (8 * i))
        }
        value |= byte().toLong << (8 * i)
        mask >>= 1
        i += 1
      }
      value
    }
    def numInt(what: String): Int = {
      val v = num()
      if (v < 0 || v > Int.MaxValue) fail(s"$what out of range: $v")
      v.toInt
    }
    def bytes(n: Int): Array[Byte] = {
      if (p + n > end) fail("truncated header")
      val r = java.util.Arrays.copyOfRange(b, p, p + n)
      p += n
      r
    }
    /** Bit vector, MSB-first (7zFormat.txt BoolVector). */
    def bits(n: Int): Array[Boolean] = {
      val r = new Array[Boolean](n)
      var mask = 0
      var cur = 0
      var i = 0
      while (i < n) {
        if (mask == 0) { cur = byte(); mask = 0x80 }
        r(i) = (cur & mask) != 0
        mask >>= 1
        i += 1
      }
      r
    }
    /** AllAreDefined byte then bit vector (BitVector with all-flag). */
    def definedBits(n: Int): Array[Boolean] =
      if (byte() != 0) Array.fill(n)(true) else bits(n)
  }

  // property ids (7zFormat.txt)
  private val kEnd = 0x00
  private val kHeader = 0x01
  private val kMainStreamsInfo = 0x04
  private val kFilesInfo = 0x05
  private val kPackInfo = 0x06
  private val kUnpackInfo = 0x07
  private val kSubStreamsInfo = 0x08
  private val kSize = 0x09
  private val kCRC = 0x0A
  private val kFolder = 0x0B
  private val kCodersUnpackSize = 0x0C
  private val kNumUnpackStream = 0x0D
  private val kEmptyStream = 0x0E
  private val kEmptyFile = 0x0F
  private val kName = 0x11
  private val kEncodedHeader = 0x17

  private final case class Coder(method: Long, props: Array[Byte])
  private final case class Folder(coder: Coder, unpackSize: Long,
                                  numSubstreams: Int, subSizes: Array[Long],
                                  subCrcs: Array[Option[Int]])
  private final case class StreamsInfo(packPos: Long, packSizes: Array[Long],
                                       folders: Array[Folder])

  private def readStreamsInfo(r: Rd): StreamsInfo = {
    var packPos = 0L
    var packSizes: Array[Long] = Array.empty
    var folders: Array[(Coder, Long)] = Array.empty
    var folderCrcs: Array[Option[Int]] = Array.empty
    var numPerFolder: Array[Int] = null
    var subSizes: Array[Array[Long]] = null
    var subCrcs: Array[Array[Option[Int]]] = null
    var t = r.numInt("property id")
    while (t != kEnd) {
      t match {
        case `kPackInfo` =>
          packPos = r.num()
          val n = r.numInt("numPackStreams")
          var t2 = r.numInt("packinfo property")
          while (t2 != kEnd) {
            t2 match {
              case `kSize` => packSizes = Array.fill(n)(r.num())
              case `kCRC` => // pack-stream digests: skippable
                val defined = r.definedBits(n)
                defined.foreach(d => if (d) r.bytes(4))
              case other => fail(f"unexpected packinfo property 0x$other%02x")
            }
            t2 = r.numInt("packinfo property")
          }
          if (packSizes.length != n) fail("pack sizes missing")
        case `kUnpackInfo` =>
          if (r.numInt("folder marker") != kFolder) fail("expected kFolder")
          val nf = r.numInt("numFolders")
          if (r.byte() != 0) fail("external folder definitions out of subset")
          val coders = (0 until nf).map { _ =>
            val numCoders = r.numInt("numCoders")
            if (numCoders != 1)
              fail(s"multi-coder folder ($numCoders coders — BCJ/delta/AES chains) out of subset")
            val flags = r.byte()
            val idSize = flags & 0x0f
            var method = 0L
            (0 until idSize).foreach(_ => method = (method << 8) | r.byte())
            if ((flags & 0x10) != 0) {
              // complex coder: in/out stream counts (must be 1/1 here)
              if (r.num() != 1L || r.num() != 1L) fail("multi-stream coder out of subset")
            }
            val props = if ((flags & 0x20) != 0) r.bytes(r.numInt("props size")) else Array.emptyByteArray
            Coder(method, props)
          }.toArray
          if (r.numInt("unpack-sizes marker") != kCodersUnpackSize) fail("expected kCodersUnpackSize")
          val sizes = coders.map(_ => r.num())
          folders = coders.zip(sizes)
          folderCrcs = Array.fill(nf)(None)
          var t2 = r.numInt("unpackinfo property")
          while (t2 != kEnd) {
            t2 match {
              case `kCRC` =>
                val defined = r.definedBits(nf)
                folderCrcs = defined.map(d => if (d) Some(le32(r.bytes(4), 0)) else None)
              case other => fail(f"unexpected unpackinfo property 0x$other%02x")
            }
            t2 = r.numInt("unpackinfo property")
          }
        case `kSubStreamsInfo` =>
          val nf = folders.length
          numPerFolder = Array.fill(nf)(1)
          var t2 = r.numInt("substreams property")
          var sizesRead = false
          while (t2 != kEnd) {
            t2 match {
              case `kNumUnpackStream` =>
                numPerFolder = Array.fill(nf)(r.numInt("substream count"))
              case `kSize` =>
                // all but the LAST substream of each folder; last = remainder
                subSizes = new Array[Array[Long]](nf)
                var f = 0
                while (f < nf) {
                  val n = numPerFolder(f)
                  val s = new Array[Long](n)
                  var acc = 0L
                  var i = 0
                  while (i < n - 1) { s(i) = r.num(); acc += s(i); i += 1 }
                  if (n > 0) s(n - 1) = folders(f)._2 - acc
                  if (n > 0 && s(n - 1) < 0) fail("substream sizes over folder size")
                  subSizes(f) = s
                  f += 1
                }
                sizesRead = true
              case `kCRC` =>
                // digests for substreams WITHOUT a known folder CRC
                val total = numPerFolder.sum
                val known = (0 until nf).flatMap(f =>
                  if (numPerFolder(f) == 1 && folderCrcs(f).isDefined) Seq(true) else Seq.fill(numPerFolder(f))(false))
                val unknownCount = known.count(!_)
                val defined = r.definedBits(unknownCount)
                val crcs = new Array[Option[Int]](total)
                var u = 0
                var i = 0
                val knownIt = (0 until nf).iterator.flatMap(f =>
                  if (numPerFolder(f) == 1 && folderCrcs(f).isDefined) Iterator(folderCrcs(f))
                  else Iterator.fill(numPerFolder(f))(null: Option[Int]))
                knownIt.foreach { k =>
                  if (k != null) crcs(i) = k
                  else {
                    crcs(i) = if (defined(u)) Some(le32(r.bytes(4), 0)) else None
                    u += 1
                  }
                  i += 1
                }
                subCrcs = new Array[Array[Option[Int]]](nf)
                var at = 0
                var f = 0
                while (f < nf) {
                  subCrcs(f) = java.util.Arrays.copyOfRange(crcs, at, at + numPerFolder(f))
                    .asInstanceOf[Array[Option[Int]]]
                  at += numPerFolder(f)
                  f += 1
                }
              case other => fail(f"unexpected substreams property 0x$other%02x")
            }
            t2 = r.numInt("substreams property")
          }
          if (!sizesRead) {
            subSizes = Array.tabulate(nf)(f =>
              if (numPerFolder(f) == 1) Array(folders(f)._2)
              else fail("multi-substream folder without sizes"))
          }
        case other => fail(f"unexpected streams-info property 0x$other%02x")
      }
      t = r.numInt("property id")
    }
    val nf = folders.length
    if (numPerFolder == null) { // no substreams section: 1 per folder
      numPerFolder = Array.fill(nf)(1)
      subSizes = Array.tabulate(nf)(f => Array(folders(f)._2))
    }
    if (subCrcs == null)
      subCrcs = Array.tabulate(nf)(f =>
        if (numPerFolder(f) == 1) Array(folderCrcs(f)) else Array.fill(numPerFolder(f))(None: Option[Int]))
    StreamsInfo(packPos, packSizes,
      folders.zipWithIndex.map { case ((c, sz), f) =>
        Folder(c, sz, numPerFolder(f), subSizes(f), subCrcs(f))
      })
  }

  // coder method ids
  private val MCopy = 0x00L
  private val MLzma = 0x030101L
  private val MLzma2 = 0x21L

  /** Decode ONE folder's output (its solid stream). `packAt` is the
    * absolute offset of the folder's packed stream.
    */
  private def decodeFolder(b: Array[Byte], folder: Folder, packAt: Long, packSize: Long,
                           maxOut: Int): Array[Byte] = {
    if (folder.unpackSize > maxOut) fail(s"folder output over cap ($maxOut bytes)")
    val from = packAt.toInt
    val to = (packAt + packSize).toInt
    if (packAt < 0 || to > b.length || packAt > to) fail("packed stream overruns archive")
    folder.coder.method match {
      case MCopy =>
        if (packSize != folder.unpackSize) fail("copy folder size mismatch")
        java.util.Arrays.copyOfRange(b, from, to)
      case MLzma =>
        if (folder.coder.props.length < 5) fail("LZMA coder props under 5 bytes")
        val w = new XzCodec.OutWin(folder.unpackSize.toInt)
        XzCodec.lzmaRaw(b, from, to, folder.coder.props(0) & 0xff, w, folder.unpackSize.toInt)
        java.util.Arrays.copyOf(w.buf, w.len)
      case MLzma2 =>
        val w = new XzCodec.OutWin(folder.unpackSize.toInt)
        XzCodec.lzma2(b, from, to, w)
        if (w.len != folder.unpackSize) fail(s"LZMA2 folder decoded ${w.len} of ${folder.unpackSize}")
        java.util.Arrays.copyOf(w.buf, w.len)
      case m =>
        fail(f"coder method 0x$m%x out of subset (only Copy/LZMA/LZMA2; BCJ chains and AES are loud by design)")
    }
  }

  private final case class ParsedHeader(streams: Option[StreamsInfo],
                                        names: Array[String], emptyStream: Array[Boolean],
                                        emptyFile: Array[Boolean])

  private def readHeader(r: Rd, archive: Array[Byte], maxOut: Int): ParsedHeader = {
    val t0 = r.numInt("header type")
    if (t0 == kEncodedHeader) {
      // the header itself is one compressed folder (what `7z a` writes)
      val si = readStreamsInfo(r)
      if (si.folders.length != 1 || si.packSizes.length != 1) fail("encoded header shape")
      val decoded = decodeFolder(archive, si.folders(0), 32 + si.packPos, si.packSizes(0), maxOut)
      si.folders(0).subCrcs(0).foreach(c =>
        if (crc32(decoded, 0, decoded.length) != c) fail("encoded header CRC mismatch"))
      val r2 = new Rd(decoded, 0, decoded.length)
      return readHeader(r2, archive, maxOut)
    }
    if (t0 != kHeader) fail(f"expected kHeader, got 0x$t0%02x")
    var streams: Option[StreamsInfo] = None
    var names: Array[String] = Array.empty
    var emptyStream: Array[Boolean] = Array.empty
    var emptyFile: Array[Boolean] = Array.empty
    var t = r.numInt("header property")
    while (t != kEnd) {
      t match {
        case `kMainStreamsInfo` => streams = Some(readStreamsInfo(r))
        case `kFilesInfo` =>
          val nFiles = r.numInt("numFiles")
          names = Array.fill(nFiles)("")
          emptyStream = Array.fill(nFiles)(false)
          emptyFile = Array.fill(nFiles)(false)
          var pt = r.numInt("files property")
          while (pt != kEnd) {
            val size = r.numInt("files property size")
            val propEnd = r.p + size
            pt match {
              case `kEmptyStream` => emptyStream = r.bits(nFiles)
              case `kEmptyFile` => emptyFile = r.bits(emptyStream.count(identity))
              case `kName` =>
                if (r.byte() != 0) fail("external names out of subset")
                val raw = r.bytes(propEnd - r.p)
                val all = new String(raw, UTF_16LE)
                val parts = all.split("\u0000", -1)
                if (parts.length < nFiles + 1) fail("name table short")
                names = parts.take(nFiles)
              case _ => () // kMTime/kAttributes/etc: skippable by size
            }
            r.p = propEnd
            pt = r.numInt("files property")
          }
        case other => fail(f"unexpected header property 0x$other%02x")
      }
      t = r.numInt("header property")
    }
    ParsedHeader(streams, names, emptyStream, emptyFile)
  }

  private def parse(b: Array[Byte], maxOut: Int): ParsedHeader = {
    if (!isSevenZip(b)) fail("not a 7z archive")
    if (crc32(b, 12, 20) != le32(b, 8)) fail("signature header CRC mismatch")
    val nextOff = le64(b, 12)
    val nextSize = le64(b, 20)
    if (nextOff < 0 || nextSize < 0 || nextSize > Int.MaxValue ||
      32 + nextOff + nextSize > b.length) fail("next header overruns archive")
    val at = (32 + nextOff).toInt
    if (nextSize > 0 && crc32(b, at, nextSize.toInt) != le32(b, 28)) fail("next header CRC mismatch")
    if (nextSize == 0) return ParsedHeader(None, Array.empty, Array.empty, Array.empty)
    readHeader(new Rd(b, at, at + nextSize.toInt), b, maxOut)
  }

  /** One archive member: name, content size, and whether it carries a
    * stream (directories/empty files do not).
    */
  final case class SevenZEntry(name: String, size: Long, hasStream: Boolean)

  /** Archive listing from the HEADER ONLY — no payload byte is
    * decompressed (unless the header itself is an encoded header).
    */
  def entries(b: Array[Byte], maxOut: Int = 1 << 28): Array[SevenZEntry] = {
    val h = parse(b, maxOut)
    val subSizes: Array[Long] = h.streams.map(_.folders.flatMap(_.subSizes)).getOrElse(Array.empty)
    var si = 0
    h.names.zipWithIndex.map { case (n, i) =>
      val empty = i < h.emptyStream.length && h.emptyStream(i)
      if (empty) SevenZEntry(n, 0L, hasStream = false)
      else {
        if (si >= subSizes.length) fail("more stream files than substreams")
        val e = SevenZEntry(n, subSizes(si), hasStream = true)
        si += 1
        e
      }
    }
  }

  /** Extract every streamed member as (name, bytes); folder CRCs and
    * substream CRCs verified where present. Loud on any damage.
    */
  def extractAll(b: Array[Byte], maxOut: Int = 1 << 28): Array[(String, Array[Byte])] = {
    val h = parse(b, maxOut)
    val si = h.streams.getOrElse(return Array.empty)
    // folder f's packed stream: single-coder folders consume pack
    // streams in order, one per folder
    var packAt = 32 + si.packPos
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    val contents = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var total = 0L
    si.folders.zipWithIndex.foreach { case (f, fi) =>
      val packSize = if (fi < si.packSizes.length) si.packSizes(fi) else fail("pack stream missing")
      val decoded = decodeFolder(b, f, packAt, packSize, maxOut)
      packAt += packSize
      total += decoded.length
      if (total > maxOut) fail(s"output over cap ($maxOut bytes)")
      var at = 0L
      var s = 0
      while (s < f.numSubstreams) {
        val n = f.subSizes(s)
        if (at + n > decoded.length) fail("substream overruns folder output")
        val piece = java.util.Arrays.copyOfRange(decoded, at.toInt, (at + n).toInt)
        f.subCrcs(s).foreach(c =>
          if (crc32(piece, 0, piece.length) != c) fail(s"substream CRC mismatch in folder $fi"))
        contents += piece
        at += n
        s += 1
      }
    }
    var ci = 0
    h.names.zipWithIndex.foreach { case (n, i) =>
      val empty = i < h.emptyStream.length && h.emptyStream(i)
      if (!empty) {
        if (ci >= contents.length) fail("more stream files than decoded substreams")
        out += ((n, contents(ci)))
        ci += 1
      }
    }
    out.toArray
  }

  // ------------------------------------------------------------------
  // Store-only fixture writer
  // ------------------------------------------------------------------
  /** One valid 7z archive with Copy-coder folders (one per file, so
    * each member is independently CRC'd) — the from-scratch half of
    * the dual oracle; real 7-Zip and commons-compress both read it.
    */
  def buildStore(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(files.nonEmpty, "7z store fixture needs at least one file")
    val body = new java.io.ByteArrayOutputStream()
    files.foreach { case (_, c) => body.write(c, 0, c.length) }
    val packed = body.toByteArray

    val h = new java.io.ByteArrayOutputStream()
    def num(v0: Long): Unit = {
      // minimal-length 7z number
      var v = v0
      if (v < 0x80) { h.write(v.toInt); return }
      // count bytes needed
      var n = 0
      var t = v
      while (t != 0) { n += 1; t >>>= 8 }
      if (n >= 8) {
        h.write(0xff)
        (0 until 8).foreach { i => h.write(((v0 >>> (8 * i)) & 0xff).toInt) }
        return
      }
      // can the top bits ride in the first byte?
      val firstFree = 7 - n // free low bits in the marker byte
      val high = v0 >>> (8 * n)
      if (high < (1L << firstFree)) {
        val marker = (0xff << (8 - n)) & 0xff
        h.write(marker | high.toInt)
        (0 until n).foreach { i => h.write(((v0 >>> (8 * i)) & 0xff).toInt) }
      } else {
        val marker = (0xff << (8 - (n + 1))) & 0xff
        h.write(marker)
        (0 to n).foreach { i => h.write(((v0 >>> (8 * i)) & 0xff).toInt) }
      }
    }
    h.write(kHeader)
    h.write(kMainStreamsInfo)
    h.write(kPackInfo)
    num(0) // pack pos
    num(files.length) // one pack stream per folder
    h.write(kSize)
    files.foreach { case (_, c) => num(c.length) }
    h.write(kEnd)
    h.write(kUnpackInfo)
    h.write(kFolder)
    num(files.length)
    h.write(0) // not external
    files.foreach { _ =>
      num(1) // one coder
      h.write(0x01) // id size 1, simple, no attributes
      h.write(0x00) // Copy
    }
    h.write(kCodersUnpackSize)
    files.foreach { case (_, c) => num(c.length) }
    h.write(kCRC)
    h.write(1) // all defined
    files.foreach { case (_, c) =>
      val crc = crc32(c, 0, c.length)
      h.write(crc & 0xff); h.write((crc >> 8) & 0xff)
      h.write((crc >> 16) & 0xff); h.write((crc >> 24) & 0xff)
    }
    h.write(kEnd)
    // explicit substreams section (one per folder): redundant per the
    // spec's defaults, but the real reader's hardened statistics pass
    // requires the section to account for the entries
    h.write(kSubStreamsInfo)
    h.write(kNumUnpackStream)
    files.foreach(_ => num(1))
    h.write(kEnd)
    h.write(kEnd) // end of streams info
    h.write(kFilesInfo)
    num(files.length)
    val nameBytes = new java.io.ByteArrayOutputStream()
    nameBytes.write(0) // not external
    files.foreach { case (n, _) =>
      val u = (n + "\u0000").getBytes(UTF_16LE)
      nameBytes.write(u, 0, u.length)
    }
    h.write(kName)
    num(nameBytes.size().toLong)
    nameBytes.writeTo(h)
    h.write(kEnd) // end of files info
    h.write(kEnd) // end of header
    val header = h.toByteArray

    val out = new java.io.ByteArrayOutputStream(32 + packed.length + header.length)
    out.write(Magic, 0, 6)
    out.write(0); out.write(4) // version 0.4
    val tail = new Array[Byte](20)
    def putLe64(at: Int, v: Long): Unit =
      (0 until 8).foreach(i => tail(at + i) = ((v >>> (8 * i)) & 0xff).toByte)
    putLe64(0, packed.length.toLong) // next header offset
    putLe64(8, header.length.toLong) // next header size
    val hCrc = crc32(header, 0, header.length)
    tail(16) = (hCrc & 0xff).toByte; tail(17) = ((hCrc >> 8) & 0xff).toByte
    tail(18) = ((hCrc >> 16) & 0xff).toByte; tail(19) = ((hCrc >> 24) & 0xff).toByte
    val sCrc = crc32(tail, 0, 20)
    out.write(sCrc & 0xff); out.write((sCrc >> 8) & 0xff)
    out.write((sCrc >> 16) & 0xff); out.write((sCrc >> 24) & 0xff)
    out.write(tail, 0, 20)
    out.write(packed, 0, packed.length)
    out.write(header, 0, header.length)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Shard surfaces
  // ------------------------------------------------------------------
  /** Deterministic store-only fixture archive: `nFiles` text members
    * with closed-form names and content.
    */
  def synthSevenZip(seed: Long, nFiles: Int): Array[Byte] =
    buildStore((0 until math.max(1, nFiles)).map { i =>
      (s"dir$i/file_${seed}_$i.txt",
        s"member $i of archive $seed says café line ${(seed + i) % 100}\n".getBytes(UTF_8))
    })

  /** Newline-joined UTF-8 text of every streamed member (tolerant:
    * null for non-7z payloads or when nothing extracts).
    */
  def sevenZipText(b: Array[Byte]): String = {
    if (!isSevenZip(b)) return null
    val files = try extractAll(b) catch { case _: Exception => return null }
    if (files.isEmpty) return null
    files.map { case (_, c) => new String(c, UTF_8) }.mkString("\n")
  }
}
