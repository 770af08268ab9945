package graft.sources

import java.io.ByteArrayOutputStream

/** Pure-JVM TIFF 6.0 container codec — the IFD/tag walker that routes
  * strips to the compression decoders the repo already owns (CCITT G4
  * via [[CcittCodec]], LZW / Deflate / predictors via [[PdfCodec]],
  * PackBits here). Scanned-document corpora ship TIFF next to PDF;
  * the reference opens them transparently through PyMuPDF
  * (reference `app.py:241` — `fitz.open` on arbitrary uploads). Here
  * the container is parsed from scratch against the public TIFF 6.0
  * spec.
  *
  * Subset (loud on everything else): baseline gray 1/8-bit and RGB
  * 8-bit; strip-organized AND tiled layouts (TileWidth/TileLength/
  * TileOffsets assembly with edge-tile clipping); compressions 1
  * (none), 4 (CCITT T.6/G4), 5 (LZW, TIFF early-change), 6 (old-style
  * JPEG via JPEGInterchangeFormat), 7 (new-style JPEG — self-contained
  * strip/tile streams and the JPEGTables-abbreviated form, merged and
  * routed to the ImageIO JPEG decoder [[ImageCodec]] already owns),
  * 8 (Deflate/zlib), 32773 (PackBits), predictor 1/2 (horizontal
  * differencing), photometric 0/1/2 (+ 6 on the JPEG paths, where the
  * JPEG stream itself carries color). Both byte orders (`II*`,
  * `MM*`). First IFD only (multi-page TIFF reads page 0 — the
  * corpus-dispatch grain; `n_ifds` still counts the chain for
  * metadata). Parse errors throw typed messages; expression wrappers
  * null-guard upstream.
  */
object TiffCodec {

  def isTiff(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 42 && b(3) == 0) ||
       (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 42))

  /** Integer-only parse metadata (SQL-reproducible). `nIfds` is
    * CHAIN-GLOBAL — every page's info carries the whole document's
    * IFD count, not a per-page value (it answers "how many pages does
    * this document have", the corpus-dispatch question).
    */
  final case class TiffInfo(width: Int, height: Int, bits: Int, spp: Int,
                            compression: Int, photometric: Int,
                            nStrips: Int, rowsPerStrip: Int, predictor: Int,
                            nIfds: Int, tileWidth: Int = 0, tileLength: Int = 0) {
    /** Tiled layout (nStrips then counts TILES, rowsPerStrip = TileLength). */
    def tiled: Boolean = tileWidth > 0
  }

  // ---------------------------------------------------------------
  // IFD walk
  // ---------------------------------------------------------------

  private final class Reader(val b: Array[Byte], val le: Boolean) {
    def u8(at: Int): Int = {
      require(at >= 0 && at < b.length, s"TIFF: u8 out of bounds at $at")
      b(at) & 0xff
    }
    def u16(at: Int): Int = {
      require(at >= 0 && at + 2 <= b.length, s"TIFF: u16 out of bounds at $at")
      if (le) (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
      else ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
    }
    def u32(at: Int): Long = {
      require(at >= 0 && at + 4 <= b.length, s"TIFF: u32 out of bounds at $at")
      if (le) (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
        ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
      else ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
        ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
    }
  }

  /** One IFD entry's integral values (BYTE/SHORT/LONG); RATIONAL and
    * friends are skipped by the caller.
    */
  private def entryValues(r: Reader, at: Int): (Int, Array[Long]) = {
    val tag = r.u16(at)
    val typ = r.u16(at + 2)
    val count = r.u32(at + 4)
    require(count <= (1L << 20), s"TIFF: implausible entry count $count for tag $tag")
    val elemSize = typ match {
      case 1 | 2 | 6 | 7 => 1 // BYTE/ASCII/SBYTE/UNDEFINED
      case 3 | 8 => 2         // SHORT/SSHORT
      case 4 | 9 => 4         // LONG/SLONG
      case 5 | 10 => 8        // RATIONAL
      case _ => return (tag, null) // unknown type: skip
    }
    if (elemSize == 8) return (tag, null) // rationals not needed in subset
    val total = elemSize * count
    val base = if (total <= 4) at + 8 else r.u32(at + 8).toInt
    val out = new Array[Long](count.toInt)
    var i = 0
    while (i < count) {
      out(i) = elemSize match {
        case 1 => r.u8(base + i).toLong
        case 2 => r.u16(base + i * 2).toLong
        case 4 => r.u32(base + i * 4)
      }
      i += 1
    }
    (tag, out)
  }

  private final case class Ifd(tags: Map[Int, Array[Long]], next: Long)

  private def readIfd(r: Reader, bytes: Array[Byte], off: Int): Ifd = {
    require(off >= 0 && off + 2 <= bytes.length, s"TIFF: IFD offset $off out of bounds")
    val n = r.u16(off)
    require(n >= 1 && n <= 512, s"TIFF: implausible IFD entry count $n")
    var tags = Map.empty[Int, Array[Long]]
    var i = 0
    while (i < n) {
      val (tag, vals) = entryValues(r, off + 2 + i * 12)
      if (vals != null) tags += tag -> vals
      i += 1
    }
    Ifd(tags, r.u32(off + 2 + n * 12))
  }

  /** ONE bounded walk of the whole IFD chain — every entry point
    * (info, first-page decode, all-pages decode) shares it, so no
    * caller parses an IFD twice. A cycle or runaway chain stops loud.
    */
  private def walkIfds(bytes: Array[Byte]): (Reader, Seq[Ifd]) = {
    require(isTiff(bytes), "TIFF: bad magic")
    val r = new Reader(bytes, bytes(0) == 'I')
    val out = scala.collection.mutable.ArrayBuffer(readIfd(r, bytes, r.u32(4).toInt))
    var next = out.head.next
    while (next != 0 && out.length < 64) {
      val ifd = readIfd(r, bytes, next.toInt)
      out += ifd
      next = ifd.next
    }
    require(next == 0 || out.length < 64, "TIFF: IFD chain too long (cycle?)")
    (r, out.toSeq)
  }

  private def parse(bytes: Array[Byte]): (Reader, Ifd, Int) = {
    val (r, ifds) = walkIfds(bytes)
    (r, ifds.head, ifds.length)
  }

  private def one(ifd: Ifd, tag: Int, dflt: Long = -1L): Long =
    ifd.tags.get(tag).filter(_.nonEmpty).map(_(0)).getOrElse {
      require(dflt >= 0, s"TIFF: required tag $tag missing"); dflt
    }

  def tiffInfo(bytes: Array[Byte]): TiffInfo = {
    val (_, ifd, nIfds) = parse(bytes)
    infoOf(ifd, nIfds)
  }

  private def infoOf(ifd: Ifd, nIfds: Int): TiffInfo = {
    val w = one(ifd, 256).toInt
    val h = one(ifd, 257).toInt
    val spp = one(ifd, 277, 1).toInt
    val bitsArr = ifd.tags.getOrElse(258, Array(1L))
    require(bitsArr.forall(_ == bitsArr(0)), "TIFF: heterogeneous BitsPerSample")
    val bits = bitsArr(0).toInt
    val comp = one(ifd, 259, 1).toInt
    val photo = one(ifd, 262).toInt
    val offsets = ifd.tags.getOrElse(273, Array.empty[Long])
    val tileOffs = ifd.tags.getOrElse(324, Array.empty[Long])
    val pred = one(ifd, 317, 1).toInt
    if (tileOffs.nonEmpty) {
      val tw = one(ifd, 322).toInt
      val tl = one(ifd, 323).toInt
      require(tw > 0 && tl > 0, "TIFF: bad tile geometry")
      TiffInfo(w, h, bits, spp, comp, photo, tileOffs.length,
        math.min(tl, h), pred, nIfds, tw, tl)
    } else if (offsets.nonEmpty) {
      val rps = one(ifd, 278, h.toLong).toInt
      TiffInfo(w, h, bits, spp, comp, photo, offsets.length,
        math.min(rps, h), pred, nIfds)
    } else {
      // old-style JPEG: one whole-IFD stream at JPEGInterchangeFormat
      require(comp == 6 && ifd.tags.contains(513),
        "TIFF: no StripOffsets/TileOffsets (and not old-style JPEG)")
      TiffInfo(w, h, bits, spp, comp, photo, 1, h, pred, nIfds)
    }
  }

  // ---------------------------------------------------------------
  // Decode (first IFD) → packed-RGB raster
  // ---------------------------------------------------------------

  def decode(bytes: Array[Byte]): ImageCodec.Px = {
    val (_, ifd, nIfds) = parse(bytes)
    decodeIfd(bytes, ifd, infoOf(ifd, nIfds))
  }

  /** Decode EVERY page of a multi-page document, in chain order — the
    * shape scanned-document corpora actually ship (multi-page fax /
    * scanner output). Each IFD decodes independently, so pages may mix
    * compressions, as real scanner output does.
    */
  def decodeAll(bytes: Array[Byte]): Seq[ImageCodec.Px] = {
    val (_, ifds) = walkIfds(bytes)
    ifds.map(ifd => decodeIfd(bytes, ifd, infoOf(ifd, ifds.length)))
  }

  private def decodeIfd(bytes: Array[Byte], ifd: Ifd, info: TiffInfo): ImageCodec.Px = {
    if (info.compression == 6) return decodeOldJpeg(bytes, ifd, info)
    if (info.compression == 7) return decodeNewJpeg(bytes, ifd, info)
    require(info.bits == 1 || info.bits == 8,
      s"TIFF: BitsPerSample ${info.bits} out of subset (1/8)")
    require(info.spp == 1 || info.spp == 3,
      s"TIFF: SamplesPerPixel ${info.spp} out of subset (1/3)")
    require(info.photometric <= 3, s"TIFF: photometric ${info.photometric} out of subset")
    if (info.bits == 1) require(info.spp == 1, "TIFF: bilevel must be 1 sample/pixel")
    if (info.photometric == 3)
      require(info.bits == 8 && info.spp == 1, "TIFF: palette must be 8-bit single-sample")
    if (info.tiled) return decodeTiled(bytes, ifd, info)
    val offsets = ifd.tags(273)
    val counts = ifd.tags.getOrElse(279,
      { require(info.compression == 1, "TIFF: StripByteCounts required when compressed")
        // uncompressed: infer from geometry
        val rowBytes = (info.width * info.spp * info.bits + 7) / 8
        offsets.indices.map { s =>
          val rows = math.min(info.rowsPerStrip, info.height - s * info.rowsPerStrip)
          (rowBytes * rows).toLong
        }.toArray })
    require(offsets.length == counts.length, "TIFF: strip offset/count length mismatch")
    val rowBytes = (info.width * info.spp * info.bits + 7) / 8
    val raster = new Array[Byte](rowBytes * info.height)
    var strip = 0
    var rowBase = 0
    while (strip < offsets.length) {
      val rows = math.min(info.rowsPerStrip, info.height - rowBase)
      require(rows > 0, "TIFF: more strips than rows")
      val off = offsets(strip).toInt
      val len = counts(strip).toInt
      require(off >= 0 && len >= 0 && off + len <= bytes.length,
        s"TIFF: strip $strip out of bounds")
      val comp = java.util.Arrays.copyOfRange(bytes, off, off + len)
      val plain: Array[Byte] = info.compression match {
        case 1 => comp
        case 4 =>
          // G4 decoder emits 1 = white; convert to sample polarity below
          CcittCodec.decodeG4(comp, info.width, rows)
        case 5 =>
          PdfCodec.unpredict(PdfCodec.lzwDecode(comp), info.predictor,
            info.spp, info.bits, info.width)
        case 8 =>
          PdfCodec.unpredict(PdfCodec.inflate(comp), info.predictor,
            info.spp, info.bits, info.width)
        case 32773 => packBitsDecode(comp)
        case c => throw new IllegalArgumentException(s"TIFF: compression $c out of subset")
      }
      val need = rowBytes * rows
      require(plain.length >= need, s"TIFF: strip $strip short (${plain.length} < $need)")
      System.arraycopy(plain, 0, raster, rowBase * rowBytes, need)
      rowBase += rows
      strip += 1
    }
    require(rowBase == info.height, s"TIFF: strips cover $rowBase of ${info.height} rows")
    materialize(info, raster, rowBytes, colorMap(ifd, info))
  }

  /** Palette (photometric 3): /ColorMap tag 320 — 3 planes of 2^bits
    * 16-bit values (R plane, G plane, B plane); required then.
    */
  private def colorMap(ifd: Ifd, info: TiffInfo): Array[Long] =
    if (info.photometric != 3) null
    else {
      val cm = ifd.tags.getOrElse(320,
        throw new IllegalArgumentException("TIFF: palette image without ColorMap"))
      require(cm.length == 3 * 256, s"TIFF: ColorMap has ${cm.length} entries, want 768")
      cm
    }

  /** Sample raster → packed RGB (shared by the strip and tile paths).
    * `cmap` is the 768-entry ColorMap for photometric 3 (16-bit
    * values; the high byte is the 8-bit channel).
    */
  private def materialize(info: TiffInfo, raster: Array[Byte], rowBytes: Int,
                          cmap: Array[Long] = null): ImageCodec.Px = {
    val out = new Array[Int](info.width * info.height)
    var y = 0
    while (y < info.height) {
      var x = 0
      while (x < info.width) {
        val v: Int =
          if (info.bits == 1) {
            val bit = (raster(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
            if (info.compression == 4)
              // decoder emits 1 = white regardless of stored polarity
              if (bit == 1) 255 else 0
            else if (info.photometric == 0) (if (bit == 1) 0 else 255)
            else (if (bit == 1) 255 else 0)
          } else if (info.spp == 1) {
            val g = raster(y * rowBytes + x) & 0xff
            if (info.photometric == 0) 255 - g else g
          } else -1
        out(y * info.width + x) =
          if (info.spp == 3) {
            val p = y * rowBytes + x * 3
            ((raster(p) & 0xff) << 16) | ((raster(p + 1) & 0xff) << 8) | (raster(p + 2) & 0xff)
          } else if (info.photometric == 3) {
            val idx = v // spp-1 branch left the palette index untouched
            ((((cmap(idx) >> 8) & 0xff) << 16) |
              (((cmap(256 + idx) >> 8) & 0xff) << 8) |
              ((cmap(512 + idx) >> 8) & 0xff)).toInt
          } else (v << 16) | (v << 8) | v
        x += 1
      }
      y += 1
    }
    ImageCodec.Px(info.width, info.height, out)
  }

  // ---------------------------------------------------------------
  // Tiled layout (TIFF 6.0 §15): decode each tile, clip into place
  // ---------------------------------------------------------------

  private def tileGrid(info: TiffInfo): (Int, Int) =
    ((info.width + info.tileWidth - 1) / info.tileWidth,
      (info.height + info.tileLength - 1) / info.tileLength)

  private def decodeTiled(bytes: Array[Byte], ifd: Ifd, info: TiffInfo): ImageCodec.Px = {
    val offsets = ifd.tags(324)
    val counts = ifd.tags.getOrElse(325,
      { require(info.compression == 1, "TIFF: TileByteCounts required when compressed")
        val tileBytes = ((info.tileWidth * info.spp * info.bits + 7) / 8).toLong * info.tileLength
        Array.fill(offsets.length)(tileBytes) })
    require(offsets.length == counts.length, "TIFF: tile offset/count length mismatch")
    val (across, down) = tileGrid(info)
    require(offsets.length == across * down,
      s"TIFF: ${offsets.length} tiles for a ${across}x$down grid")
    // bit-addressed copies stay byte-aligned because TileWidth must be
    // a multiple of 16 (spec) — enforce it rather than mis-assemble
    if (info.bits == 1) require(info.tileWidth % 16 == 0,
      "TIFF: TileWidth must be a multiple of 16")
    val tileRowBytes = (info.tileWidth * info.spp * info.bits + 7) / 8
    val rowBytes = (info.width * info.spp * info.bits + 7) / 8
    val raster = new Array[Byte](rowBytes * info.height)
    var t = 0
    while (t < offsets.length) {
      val off = offsets(t).toInt
      val len = counts(t).toInt
      require(off >= 0 && len >= 0 && off + len <= bytes.length, s"TIFF: tile $t out of bounds")
      val comp = java.util.Arrays.copyOfRange(bytes, off, off + len)
      val plain: Array[Byte] = info.compression match {
        case 1 => comp
        case 4 => CcittCodec.decodeG4(comp, info.tileWidth, info.tileLength)
        case 5 => PdfCodec.unpredict(PdfCodec.lzwDecode(comp), info.predictor,
          info.spp, info.bits, info.tileWidth)
        case 8 => PdfCodec.unpredict(PdfCodec.inflate(comp), info.predictor,
          info.spp, info.bits, info.tileWidth)
        case 32773 => packBitsDecode(comp)
        case c => throw new IllegalArgumentException(s"TIFF: compression $c out of subset")
      }
      require(plain.length >= tileRowBytes * info.tileLength,
        s"TIFF: tile $t short (${plain.length} < ${tileRowBytes * info.tileLength})")
      val x0 = (t % across) * info.tileWidth
      val y0 = (t / across) * info.tileLength
      val visRows = math.min(info.tileLength, info.height - y0)
      val visBytes = (math.min(info.tileWidth, info.width - x0) * info.spp * info.bits + 7) / 8
      var y = 0
      while (y < visRows) {
        System.arraycopy(plain, y * tileRowBytes,
          raster, (y0 + y) * rowBytes + x0 * info.spp * info.bits / 8, visBytes)
        y += 1
      }
      t += 1
    }
    materialize(info, raster, rowBytes, colorMap(ifd, info))
  }

  // ---------------------------------------------------------------
  // JPEG-in-TIFF (compressions 7 and 6) → ImageIO decode
  // ---------------------------------------------------------------

  /** Tag 347 JPEGTables (abbreviated-stream form): shared DQT/DHT
    * tables as `SOI tables EOI`. A strip/tile stream merges as
    * `SOI + tables-middle + strip-after-SOI` (ISO 10918 abbreviated
    * format; what libtiff writes by default).
    */
  private def jpegTables(ifd: Ifd): Array[Byte] =
    ifd.tags.get(347).map(ls => ls.map(_.toByte)).orNull

  private def mergeJpeg(tables: Array[Byte], strip: Array[Byte]): Array[Byte] = {
    require(strip.length >= 2 && (strip(0) & 0xff) == 0xFF && (strip(1) & 0xff) == 0xD8,
      "TIFF: JPEG strip without SOI")
    if (tables == null) return strip
    require(tables.length >= 4 && (tables(0) & 0xff) == 0xFF && (tables(1) & 0xff) == 0xD8,
      "TIFF: JPEGTables without SOI")
    // tables end with EOI (FFD9); middle = between SOI and EOI
    val tEnd = if ((tables(tables.length - 2) & 0xff) == 0xFF &&
                   (tables(tables.length - 1) & 0xff) == 0xD9) tables.length - 2
               else tables.length
    val out = new Array[Byte](2 + (tEnd - 2) + (strip.length - 2))
    out(0) = 0xFF.toByte; out(1) = 0xD8.toByte
    System.arraycopy(tables, 2, out, 2, tEnd - 2)
    System.arraycopy(strip, 2, out, tEnd, strip.length - 2)
    out
  }

  private def jpegDecode(data: Array[Byte]): ImageCodec.Px = {
    val px = ImageCodec.decode(data)
    require(px != null, "TIFF: undecodable JPEG stream")
    px
  }

  /** New-style JPEG (compression 7): every strip/tile is its own JPEG
    * stream (JPEGTables merged when present), decoded by ImageIO and
    * clipped into place. Geometry comes from the TIFF tags; the JPEG
    * streams may be MCU-padded past the visible region.
    */
  private def decodeNewJpeg(bytes: Array[Byte], ifd: Ifd, info: TiffInfo): ImageCodec.Px = {
    val tables = jpegTables(ifd)
    val offsets = ifd.tags.getOrElse(if (info.tiled) 324 else 273, Array.empty[Long])
    val counts = ifd.tags.getOrElse(if (info.tiled) 325 else 279, Array.empty[Long])
    require(offsets.nonEmpty && offsets.length == counts.length,
      "TIFF: JPEG strip/tile offsets and counts required")
    val out = new Array[Int](info.width * info.height)
    val (across, segW, segH) =
      if (info.tiled) { val (a, d) = tileGrid(info)
        require(offsets.length == a * d, s"TIFF: ${offsets.length} tiles for ${a}x$d grid")
        (a, info.tileWidth, info.tileLength) }
      else (1, info.width, info.rowsPerStrip)
    var t = 0
    while (t < offsets.length) {
      val off = offsets(t).toInt
      val len = counts(t).toInt
      require(off >= 0 && len >= 2 && off + len <= bytes.length, s"TIFF: JPEG seg $t out of bounds")
      val px = jpegDecode(mergeJpeg(tables, java.util.Arrays.copyOfRange(bytes, off, off + len)))
      val x0 = (t % across) * segW
      val y0 = (t / across) * segH
      val visW = math.min(math.min(segW, px.w), info.width - x0)
      val visH = math.min(math.min(segH, px.h), info.height - y0)
      require(visW > 0 && visH > 0, s"TIFF: JPEG seg $t outside the image")
      var y = 0
      while (y < visH) {
        System.arraycopy(px.rgb, y * px.w, out, (y0 + y) * info.width + x0, visW)
        y += 1
      }
      t += 1
    }
    ImageCodec.Px(info.width, info.height, out)
  }

  /** Old-style JPEG (compression 6): one whole-IFD stream at
    * JPEGInterchangeFormat/-Length (tags 513/514). The fragmented
    * strip form of old-style JPEG (no 513) is out of subset — loud.
    */
  private def decodeOldJpeg(bytes: Array[Byte], ifd: Ifd, info: TiffInfo): ImageCodec.Px = {
    val off = one(ifd, 513).toInt
    val len = one(ifd, 514, (bytes.length - off).toLong).toInt
    require(off >= 0 && len >= 2 && off + len <= bytes.length,
      "TIFF: JPEGInterchangeFormat out of bounds")
    val px = jpegDecode(java.util.Arrays.copyOfRange(bytes, off, off + len))
    require(px.w >= info.width && px.h >= info.height,
      s"TIFF: old-JPEG stream ${px.w}x${px.h} smaller than ${info.width}x${info.height}")
    if (px.w == info.width && px.h == info.height) px
    else { // MCU padding: clip to the tagged geometry
      val out = new Array[Int](info.width * info.height)
      var y = 0
      while (y < info.height) {
        System.arraycopy(px.rgb, y * px.w, out, y * info.width, info.width)
        y += 1
      }
      ImageCodec.Px(info.width, info.height, out)
    }
  }

  // ---------------------------------------------------------------
  // PackBits (TIFF 6.0 §9)
  // ---------------------------------------------------------------

  def packBitsDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 2)
    var i = 0
    while (i < data.length) {
      val n = data(i)
      i += 1
      if (n >= 0) { // literal run of n+1
        val len = n + 1
        require(i + len <= data.length, "PackBits: truncated literal run")
        out.write(data, i, len)
        i += len
      } else if (n != -128) { // replicate next byte 1-n times
        require(i < data.length, "PackBits: truncated replicate run")
        val len = 1 - n
        val b = data(i); i += 1
        var k = 0
        while (k < len) { out.write(b); k += 1 }
      } // -128: no-op
    }
    out.toByteArray
  }

  def packBitsEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 16)
    var i = 0
    while (i < data.length) {
      // find a replicate run (>= 3 repeats pays off)
      var run = 1
      while (i + run < data.length && data(i + run) == data(i) && run < 128) run += 1
      if (run >= 3) {
        out.write(1 - run)
        out.write(data(i))
        i += run
      } else {
        // literal run up to the next >=3 repeat or 128 bytes
        var j = i
        var lit = 0
        var done = false
        while (!done && j < data.length && lit < 128) {
          var r = 1
          while (j + r < data.length && data(j + r) == data(j) && r < 3) r += 1
          if (r >= 3) done = true
          else { j += 1; lit += 1 }
        }
        out.write(lit - 1)
        out.write(data, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Fixture writers (deterministic, multi-strip, both byte orders)
  // ---------------------------------------------------------------

  /** Gray-8 value at (x, y): the SQL-reproducible fixture pattern. */
  def grayAt(seed: Long, x: Int, y: Int): Int =
    (((x.toLong * 3 + y.toLong * 7 + seed) % 256 + 256) % 256).toInt

  /** Bilevel fixture predicate (same stripe family as the PDF CCITT
    * fixture): white when `y % 11 == 0` or `(x/stripe + y)` is odd.
    */
  def whiteAt(seed: Long, x: Int, y: Int): Boolean = {
    val stripe = (((seed % 7) + 7) % 7 + 3).toInt
    y % 11 == 0 || ((x / stripe + y) % 2 == 1)
  }

  private def putU16(buf: ByteArrayOutputStream, le: Boolean, v: Int): Unit =
    if (le) { buf.write(v & 0xff); buf.write((v >> 8) & 0xff) }
    else { buf.write((v >> 8) & 0xff); buf.write(v & 0xff) }
  private def putU32(buf: ByteArrayOutputStream, le: Boolean, v: Long): Unit =
    if (le) { buf.write((v & 0xff).toInt); buf.write(((v >> 8) & 0xff).toInt)
              buf.write(((v >> 16) & 0xff).toInt); buf.write(((v >> 24) & 0xff).toInt) }
    else { buf.write(((v >> 24) & 0xff).toInt); buf.write(((v >> 16) & 0xff).toInt)
           buf.write(((v >> 8) & 0xff).toInt); buf.write((v & 0xff).toInt) }

  /** One [IFD | overflow values | strip data] block whose internal
    * pointers are absolute file offsets computed from `base` (the
    * block's own absolute position) — the unit a multi-page chain
    * concatenates. `nextIfd` is the absolute offset of the next
    * page's IFD (0 terminates the chain). Block length is independent
    * of the offset VALUES, so a zero-offset dry run measures layout.
    */
  private def ifdBlock(le: Boolean, entries: Seq[(Int, Int, Array[Long])],
                       strips: Seq[Array[Byte]], base: Long, nextIfd: Long): Array[Byte] = {
    val block = new ByteArrayOutputStream()
    val n = entries.length
    val ifdSize = 2 + n * 12 + 4
    val overflowAt = base + ifdSize
    // pre-compute overflow placement
    val overflow = new ByteArrayOutputStream()
    def putVal(buf: ByteArrayOutputStream, elem: Int, v: Long): Unit = elem match {
      case 1 => buf.write((v & 0xff).toInt)
      case 2 => putU16(buf, le, v.toInt)
      case _ => putU32(buf, le, v)
    }
    val placed = entries.sortBy(_._1).map { case (tag, typ, vals) =>
      val elem = typ match { case 1 | 2 | 6 | 7 => 1; case 3 => 2; case _ => 4 }
      val total = elem * vals.length
      if (total <= 4) (tag, typ, vals, -1L)
      else {
        val at = overflowAt + overflow.size()
        vals.foreach(v => putVal(overflow, elem, v))
        if (overflow.size() % 2 == 1) overflow.write(0)
        (tag, typ, vals, at)
      }
    }
    putU16(block, le, n)
    placed.foreach { case (tag, typ, vals, at) =>
      putU16(block, le, tag); putU16(block, le, typ); putU32(block, le, vals.length.toLong)
      if (at >= 0) putU32(block, le, at)
      else {
        // inline (left-justified within the 4-byte field)
        val cell = new ByteArrayOutputStream()
        val elem = typ match { case 1 | 2 | 6 | 7 => 1; case 3 => 2; case _ => 4 }
        vals.foreach(v => putVal(cell, elem, v))
        val raw = cell.toByteArray
        block.write(raw, 0, raw.length)
        var pad = 4 - raw.length
        while (pad > 0) { block.write(0); pad -= 1 }
      }
    }
    putU32(block, le, nextIfd)
    block.write(overflow.toByteArray)
    strips.foreach(block.write)
    block.toByteArray
  }

  private def writeIfd(out: ByteArrayOutputStream, le: Boolean,
                       entries: Seq[(Int, Int, Array[Long])],
                       strips: Seq[Array[Byte]]): Array[Byte] = {
    // layout: header(8) | IFD | overflow values | strip data
    out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
    putU16(out, le, 42)
    putU32(out, le, 8) // IFD right after the header
    out.write(ifdBlock(le, entries, strips, 8L, 0L))
    out.toByteArray
  }

  /** Deterministic gray-8 fixture: `w`×`h`, strips of 5 rows,
    * compression by `variant % 4`: 0 = none, 1 = LZW + predictor 2,
    * 2 = PackBits, 3 = Deflate + predictor 2. Odd seeds write
    * big-endian (`MM`) so both byte orders stay exercised.
    */
  def synthTiff(seed: Long, w: Int, h: Int, variant: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 4096 && h <= 4096, "synthTiff: bad dims")
    val rps = 5
    val nStrips = (h + rps - 1) / rps
    val pred = if (variant % 4 == 1 || variant % 4 == 3) 2 else 1
    val comp = variant % 4 match {
      case 0 => 1; case 1 => 5; case 2 => 32773; case _ => 8
    }
    compose(seed, w, h, bits = 8, comp, photometric = 1, rps, pred,
      gray8Strips(seed, w, h, rps, comp, pred))
  }

  /** The gray-8 fixture's encoded strips (shared by the single- and
    * multi-page composers).
    */
  private def gray8Strips(seed: Long, w: Int, h: Int, rps: Int,
                          comp: Int, pred: Int): Seq[Array[Byte]] = {
    val nStrips = (h + rps - 1) / rps
    (0 until nStrips).map { s =>
      val rows = math.min(rps, h - s * rps)
      val raw = new Array[Byte](w * rows)
      var y = 0
      while (y < rows) {
        var x = 0
        while (x < w) { raw(y * w + x) = grayAt(seed, x, s * rps + y).toByte; x += 1 }
        y += 1
      }
      val filtered = if (pred == 2) predict2(raw, 1, w) else raw
      comp match {
        case 1 => filtered
        case 5 => PdfCodec.lzwEncode(filtered)
        case 8 => PdfCodec.deflate(filtered)
        case 32773 => packBitsEncode(filtered)
      }
    }
  }

  /** Deterministic MULTI-PAGE gray-8 fixture: `nPages` chained IFDs,
    * page `k` drawing [[grayAt]]`(seed + k, …)` pixels under
    * compression variant `(seed + k) % 4` — one document mixing all
    * four strip codecs across its pages, the shape multi-page
    * scanner/fax output ships. Layout: header | block₀ | block₁ | …,
    * each block's IFD pointing at the next.
    */
  def composeMultiTiff(seed: Long, w: Int, h: Int, nPages: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 4096 && h <= 4096, "composeMultiTiff: bad dims")
    require(nPages >= 1 && nPages <= 32, s"composeMultiTiff: bad page count $nPages")
    val le = seed % 2 == 0
    val rps = 5
    val out = new ByteArrayOutputStream()
    out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
    putU16(out, le, 42)
    putU32(out, le, 8)
    var base = 8L
    (0 until nPages).foreach { k =>
      val variant = (((seed + k) % 4 + 4) % 4).toInt
      val pred = if (variant == 1 || variant == 3) 2 else 1
      val comp = variant match { case 0 => 1; case 1 => 5; case 2 => 32773; case _ => 8 }
      val strips = gray8Strips(seed + k, w, h, rps, comp, pred)
      val counts = strips.map(_.length.toLong).toArray
      def entries(offsets: Array[Long]): Seq[(Int, Int, Array[Long])] =
        Seq(
          (256, 4, Array(w.toLong)),
          (257, 4, Array(h.toLong)),
          (258, 3, Array(8L)),
          (259, 3, Array(comp.toLong)),
          (262, 3, Array(1L)),
          (273, 4, offsets),
          (277, 3, Array(1L)),
          (278, 3, Array(rps.toLong)),
          (279, 4, counts)) ++
          (if (pred != 1) Seq((317, 3, Array(pred.toLong))) else Nil)
      val zeros = new Array[Long](strips.length)
      val blockLen = ifdBlock(le, entries(zeros), strips, base, 0L).length
      val stripBase = base + blockLen - counts.sum
      val offsets = new Array[Long](strips.length)
      var at = stripBase
      var i = 0
      while (i < strips.length) { offsets(i) = at; at += counts(i); i += 1 }
      val next = if (k == nPages - 1) 0L else base + blockLen
      out.write(ifdBlock(le, entries(offsets), strips, base, next))
      base += blockLen
    }
    out.toByteArray
  }

  /** Deterministic bilevel G4 fixture (photometric 0, the fax
    * polarity), strips of 7 rows.
    */
  def synthTiffG4(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 4096 && h <= 4096, "synthTiffG4: bad dims")
    val rps = 7
    val nStrips = (h + rps - 1) / rps
    val rowBytes = (w + 7) / 8
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rps, h - s * rps)
      val packed = new Array[Byte](rowBytes * rows)
      var y = 0
      while (y < rows) {
        var x = 0
        while (x < w) {
          if (whiteAt(seed, x, s * rps + y))
            packed(y * rowBytes + (x >> 3)) =
              (packed(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
          x += 1
        }
        y += 1
      }
      CcittCodec.encodeG4(packed, w, rows)
    }
    compose(seed, w, h, bits = 1, compression = 4, photometric = 0, rps,
      predictor = 1, strips)
  }

  /** TIFF horizontal differencing (forward direction, fixture side). */
  private def predict2(data: Array[Byte], spp: Int, columns: Int): Array[Byte] = {
    val rowLen = spp * columns
    val out = data.clone()
    var base = 0
    while (base < out.length) {
      val end = math.min(base + rowLen, out.length)
      var i = end - 1
      while (i >= base + spp) { out(i) = ((data(i) - data(i - spp)) & 0xff).toByte; i -= 1 }
      base += rowLen
    }
    out
  }

  private def compose(seed: Long, w: Int, h: Int, bits: Int, compression: Int,
                      photometric: Int, rps: Int, predictor: Int,
                      strips: Seq[Array[Byte]]): Array[Byte] =
    composeGeneric(seed % 2 == 0, offsets => {
      val counts = strips.map(_.length.toLong).toArray
      Seq(
        (256, 4, Array(w.toLong)),
        (257, 4, Array(h.toLong)),
        (258, 3, Array(bits.toLong)),
        (259, 3, Array(compression.toLong)),
        (262, 3, Array(photometric.toLong)),
        (273, 4, offsets),
        (277, 3, Array(1L)),
        (278, 3, Array(rps.toLong)),
        (279, 4, counts)) ++
        (if (predictor != 1) Seq((317, 3, Array(predictor.toLong))) else Nil)
    }, strips)

  /** Single-IFD writer over arbitrary tag sets and data blocks: the
    * entries builder receives each block's ABSOLUTE file offset
    * (strip/tile offsets, JPEGInterchangeFormat). Offsets come from a
    * zero-offset dry run — entry count and sizes are offset-
    * independent, so both passes lay out identically.
    */
  private def composeGeneric(le: Boolean,
                             entries: Array[Long] => Seq[(Int, Int, Array[Long])],
                             blocks: Seq[Array[Byte]]): Array[Byte] = {
    val zeros = new Array[Long](blocks.length)
    val dry = writeIfd(new ByteArrayOutputStream(), le, entries(zeros), blocks)
    val blockBase = dry.length - blocks.map(_.length).sum
    val offsets = new Array[Long](blocks.length)
    var at = blockBase.toLong
    var i = 0
    while (i < blocks.length) { offsets(i) = at; at += blocks(i).length; i += 1 }
    writeIfd(new ByteArrayOutputStream(), le, entries(offsets), blocks)
  }

  // ---------------------------------------------------------------
  // Tiled + JPEG fixtures
  // ---------------------------------------------------------------

  /** Deterministic TILED gray-8 fixture: 16×16 tiles (the spec's
    * multiple-of-16 grid), compression by `variant % 4` like
    * [[synthTiff]]. Pixel (x,y) = [[grayAt]] inside the image; edge
    * padding draws from the same formula (decode clips it), so the
    * visible pixel sum is the SAME closed form as the strip fixture —
    * one SQL oracle covers both layouts.
    */
  def synthTiffTiled(seed: Long, w: Int, h: Int, variant: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 4096 && h <= 4096, "synthTiffTiled: bad dims")
    val (tw, tl) = (16, 16)
    val across = (w + tw - 1) / tw
    val down = (h + tl - 1) / tl
    val pred = if (variant % 4 == 1 || variant % 4 == 3) 2 else 1
    val comp = variant % 4 match { case 0 => 1; case 1 => 5; case 2 => 32773; case _ => 8 }
    val tiles = (0 until across * down).map { t =>
      val x0 = (t % across) * tw
      val y0 = (t / across) * tl
      val raw = new Array[Byte](tw * tl)
      var y = 0
      while (y < tl) {
        var x = 0
        while (x < tw) { raw(y * tw + x) = grayAt(seed, x0 + x, y0 + y).toByte; x += 1 }
        y += 1
      }
      val filtered = if (pred == 2) predict2(raw, 1, tw) else raw
      comp match {
        case 1 => filtered
        case 5 => PdfCodec.lzwEncode(filtered)
        case 8 => PdfCodec.deflate(filtered)
        case 32773 => packBitsEncode(filtered)
      }
    }
    composeGeneric(seed % 2 == 0, offsets => Seq(
      (256, 4, Array(w.toLong)),
      (257, 4, Array(h.toLong)),
      (258, 3, Array(8L)),
      (259, 3, Array(comp.toLong)),
      (262, 3, Array(1L)),
      (277, 3, Array(1L)),
      (322, 3, Array(tw.toLong)),
      (323, 3, Array(tl.toLong)),
      (324, 4, offsets),
      (325, 4, tiles.map(_.length.toLong).toArray)) ++
      (if (pred != 1) Seq((317, 3, Array(pred.toLong))) else Nil), tiles)
  }

  /** Deterministic PALETTE fixture (photometric 3 — the screenshot/
    * scanned-map family): 8-bit indices in the [[grayAt]] pattern,
    * PackBits strips of 5 rows, and a 768-entry ColorMap whose 8-bit
    * channels are `(i·3+7) % 256` / `(i·5+11) % 256` / `(i·7+13) % 256`
    * (stored ×257 so the 16-bit high byte IS the channel) — the
    * decoded pixel sum is closed-form in (seed, x, y) for the SQL
    * oracle.
    */
  def synthTiffPalette(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 4096 && h <= 4096, "synthTiffPalette: bad dims")
    val rps = 5
    val nStrips = (h + rps - 1) / rps
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rps, h - s * rps)
      val raw = new Array[Byte](w * rows)
      var y = 0
      while (y < rows) {
        var x = 0
        while (x < w) { raw(y * w + x) = grayAt(seed, x, s * rps + y).toByte; x += 1 }
        y += 1
      }
      packBitsEncode(raw)
    }
    val cmap = new Array[Long](768)
    var i = 0
    while (i < 256) {
      cmap(i) = ((i * 3 + 7) % 256).toLong * 257
      cmap(256 + i) = ((i * 5 + 11) % 256).toLong * 257
      cmap(512 + i) = ((i * 7 + 13) % 256).toLong * 257
      i += 1
    }
    composeGeneric(seed % 2 == 0, offsets => Seq(
      (256, 4, Array(w.toLong)),
      (257, 4, Array(h.toLong)),
      (258, 3, Array(8L)),
      (259, 3, Array(32773L)),
      (262, 3, Array(3L)),
      (273, 4, offsets),
      (277, 3, Array(1L)),
      (278, 3, Array(rps.toLong)),
      (279, 4, strips.map(_.length.toLong).toArray),
      (320, 3, cmap)), strips)
  }

  /** Split a full JFIF stream into (JPEGTables stream, abbreviated
    * stream): DQT/DHT segments move to the tables side (`SOI tables
    * EOI`), everything else (APPn/SOF/SOS/entropy data) stays — the
    * layout libtiff writes by default for compression 7.
    */
  private[sources] def splitJpegTables(full: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(full.length >= 4 && (full(0) & 0xff) == 0xFF && (full(1) & 0xff) == 0xD8,
      "splitJpegTables: not a JPEG")
    val tables = new ByteArrayOutputStream()
    val rest = new ByteArrayOutputStream()
    tables.write(0xFF); tables.write(0xD8)
    rest.write(0xFF); rest.write(0xD8)
    var i = 2
    var done = false
    while (!done && i + 4 <= full.length) {
      require((full(i) & 0xff) == 0xFF, s"splitJpegTables: expected marker at $i")
      val marker = full(i + 1) & 0xff
      if (marker == 0xDA) { // SOS: entropy data through EOI stays abbreviated
        rest.write(full, i, full.length - i)
        done = true
      } else {
        val len = ((full(i + 2) & 0xff) << 8) | (full(i + 3) & 0xff)
        require(i + 2 + len <= full.length, "splitJpegTables: truncated segment")
        (if (marker == 0xDB || marker == 0xC4) tables else rest).write(full, i, 2 + len)
        i += 2 + len
      }
    }
    tables.write(0xFF); tables.write(0xD9)
    (tables.toByteArray, rest.toByteArray)
  }

  /** JPEG-in-TIFF fixture family, `mode` selects the layout:
    *   0 = new-style strips (8-row, self-contained streams),
    *   1 = new-style strips + shared JPEGTables (tag 347, abbreviated),
    *   2 = new-style 16×16 tiles,
    *   3 = old-style (compression 6, one JPEGInterchangeFormat stream).
    * Every strip/tile/band is a FLAT gray region (strip s / tile t =
    * grayAt(seed, s|t, 0); old-style: 8-px vertical bands grayAt(seed,
    * x/8, 1) aligned to JPEG blocks), so decoded values sit within a
    * small quantization bound of the closed form —
    * [[jpegFixtureMaxErr]] measures the actual max deviation.
    */
  def synthTiffJpeg(seed: Long, w: Int, h: Int, mode: Int): Array[Byte] = {
    require(w >= 8 && h >= 8 && w <= 4096 && h <= 4096, "synthTiffJpeg: bad dims")
    require(mode >= 0 && mode <= 3, s"synthTiffJpeg: bad mode $mode")
    val le = seed % 2 == 0
    def flat(wp: Int, hp: Int, g: Int): Array[Byte] =
      ImageCodec.encodeJpeg(ImageCodec.Px(wp, hp,
        Array.fill(wp * hp)((g << 16) | (g << 8) | g)), 95)
    def baseTags(comp: Int): Seq[(Int, Int, Array[Long])] = Seq(
      (256, 4, Array(w.toLong)),
      (257, 4, Array(h.toLong)),
      (258, 3, Array(8L, 8L, 8L)),
      (259, 3, Array(comp.toLong)),
      (262, 3, Array(6L)), // YCbCr — the JPEG stream carries color
      (277, 3, Array(3L)))
    mode match {
      case 0 | 1 =>
        val rps = 8
        val nStrips = (h + rps - 1) / rps
        val fulls = (0 until nStrips).map { s =>
          flat(w, math.min(rps, h - s * rps), grayAt(seed, s, 0))
        }
        val (strips, tableTag) =
          if (mode == 0) (fulls, Nil)
          else {
            val split = fulls.map(splitJpegTables)
            val tables = split.head._1
            require(split.forall(_._1.sameElements(tables)),
              "synthTiffJpeg: same-quality strips must share tables")
            (split.map(_._2),
              Seq((347, 7, tables.map(b => (b & 0xff).toLong))))
          }
        composeGeneric(le, offsets => baseTags(7) ++ Seq(
          (273, 4, offsets),
          (278, 3, Array(rps.toLong)),
          (279, 4, strips.map(_.length.toLong).toArray)) ++ tableTag, strips)
      case 2 =>
        val (tw, tl) = (16, 16)
        val across = (w + tw - 1) / tw
        val down = (h + tl - 1) / tl
        val tiles = (0 until across * down).map(t => flat(tw, tl, grayAt(seed, t, 0)))
        composeGeneric(le, offsets => baseTags(7) ++ Seq(
          (322, 3, Array(tw.toLong)),
          (323, 3, Array(tl.toLong)),
          (324, 4, offsets),
          (325, 4, tiles.map(_.length.toLong).toArray)), tiles)
      case _ =>
        val rgb = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = grayAt(seed, x / 8, 1)
            rgb(y * w + x) = (g << 16) | (g << 8) | g
            x += 1
          }
          y += 1
        }
        val jpeg = ImageCodec.encodeJpeg(ImageCodec.Px(w, h, rgb), 95)
        composeGeneric(le, offsets => baseTags(6) ++ Seq(
          (513, 4, Array(offsets(0))),
          (514, 4, Array(jpeg.length.toLong))), Seq(jpeg))
    }
  }

  /** Max |decoded − expected| over a [[synthTiffJpeg]] fixture's
    * visible pixels (all three channels): the lossy-path gate — the
    * oracle pins `max_err <= bound` as a boolean since JPEG DC
    * quantization is not SQL-reproducible, while geometry and tile
    * counts stay exact. Throws on non-fixture geometry (it is a
    * fixture verifier, not a general operator).
    */
  def jpegFixtureMaxErr(bytes: Array[Byte], mode: Int, seed: Long): Long = {
    val info = tiffInfo(bytes)
    val px = decode(bytes)
    val across = (info.width + 15) / 16
    var maxErr = 0L
    var y = 0
    while (y < px.h) {
      var x = 0
      while (x < px.w) {
        val g = mode match {
          case 0 | 1 => grayAt(seed, y / 8, 0)
          case 2 => grayAt(seed, (y / 16) * across + (x / 16), 0)
          case _ => grayAt(seed, x / 8, 1)
        }
        val v = px.rgb(y * px.w + x)
        var c = 0
        while (c < 3) {
          val err = math.abs(((v >> (8 * c)) & 0xff) - g).toLong
          if (err > maxErr) maxErr = err
          c += 1
        }
        x += 1
      }
      y += 1
    }
    maxErr
  }
}
