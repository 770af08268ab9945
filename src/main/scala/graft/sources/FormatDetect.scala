package graft.sources

import java.nio.charset.StandardCharsets

/** Content-based format detection — the first operator a mixed corpus
  * shard hits: route each payload to the right codec by MAGIC BYTES,
  * never by file extension (crawl payloads lie; upload filenames lie
  * harder). Container formats refine one level: a ZIP inspects its
  * central directory to distinguish DOCX/XLSX/PPTX from a plain
  * archive, a gzip member sniffs for WARC. Pure function of the
  * bytes; total (any input maps to a label, null only for null).
  *
  * Labels: pdf, docx, xlsx, pptx, epub, zip, warc, warc-gz, jsonl-gz, gzip,
  * jsonl-zst, zstd, jsonl-xz, xz, jsonl-lz4, lz4, jsonl-snappy, snappy,
  * jsonl-snappy-hadoop, snappy-hadoop (the magic-less HDFS container,
  * structurally detected last), jsonl-bz2, wiki-bz2, bzip2, 7z, tar,
  * rtf, ole (legacy .doc/.xls/.msg —
  * classified for quarantine, no extractor), mbox, jpeg, png, gif,
  * tiff, avro, wav, flac, avi, html, mediawiki (dump-XML shards), xml,
  * text, binary, empty.
  */
object FormatDetect {

  private def startsWith(b: Array[Byte], s: String, at: Int = 0): Boolean =
    b.length >= at + s.length && {
      var i = 0
      var ok = true
      while (ok && i < s.length) { ok = (b(at + i) & 0xff) == s.charAt(i); i += 1 }
      ok
    }

  private def asciiPrefixLower(b: Array[Byte], n: Int): String = {
    val len = math.min(n, b.length)
    val sb = new StringBuilder(len)
    var i = 0
    while (i < len) { sb.append(Character.toLowerCase((b(i) & 0xff).toChar)); i += 1 }
    sb.toString
  }

  /** Mostly-printable valid UTF-8 → text. */
  private def looksTextual(b: Array[Byte]): Boolean = {
    val probe = math.min(b.length, 4096)
    var printable = 0
    var i = 0
    while (i < probe) {
      val c = b(i) & 0xff
      if (c == 0) return false
      if (c >= 0x20 || c == '\n' || c == '\r' || c == '\t') printable += 1
      i += 1
    }
    printable.toDouble / probe >= 0.95
  }

  /** JSON-object-per-line shard sniff over a decompressed prefix: the
    * FIRST line must be a complete `{...}` object (start AND end), so
    * a gzipped pretty-printed JSON document (first line just `{`) is
    * NOT routed to the line-oriented jsonl extractor. When the prefix
    * holds no newline (one long minified line), the object start alone
    * decides — a single-object minified document IS one jsonl line.
    */
  private def looksJsonl(head: Array[Byte]): Boolean = {
    if (head == null || head.isEmpty || head(0) != '{') return false
    var nl = 0
    while (nl < head.length && head(nl) != '\n') nl += 1
    if (nl == head.length) return true // no full first line visible
    var end = nl - 1
    while (end > 0 && (head(end) == ' ' || head(end) == '\t' || head(end) == '\r')) end -= 1
    head(end) == '}'
  }

  def detect(b: Array[Byte]): String = {
    if (b == null) return null
    if (b.length == 0) return "empty"
    if (PdfCodec.isPdf(b)) return "pdf"
    if (startsWith(b, "PK")) {
      // refine by central directory; a damaged archive stays "zip"
      val names = try ZipCodec.entries(b).map(_.name) catch { case _: Exception => Vector.empty[String] }
      if (names.contains("word/document.xml")) return "docx"
      if (names.contains("META-INF/container.xml") || names.contains("mimetype")) return "epub"
      if (names.exists(n => n.startsWith("xl/"))) return "xlsx"
      if (names.exists(n => n.startsWith("ppt/"))) return "pptx"
      return "zip"
    }
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) {
      // gzip: sniff the first decompressed bytes for a WARC member
      val head = try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(b), 512)
        val buf = new Array[Byte](4096)
        var at = 0
        var n = in.read(buf, 0, buf.length)
        while (n > 0 && at + n < buf.length) { at += n; n = in.read(buf, at, buf.length - at) }
        if (n > 0) at += n
        in.close()
        if (at > 0) java.util.Arrays.copyOf(buf, at) else Array.emptyByteArray
      } catch { case _: Exception => Array.emptyByteArray }
      return if (startsWith(head, "WARC/")) "warc-gz"
      else if (looksJsonl(head)) "jsonl-gz"
      else "gzip"
    }
    if (ZstdCodec.isZstd(b)) {
      // same refine for zstd-era shards (Dolma/RedPajama-v2 form).
      // decodePrefix, NOT decompressTolerant-with-small-cap: real
      // shards declare a frame content size over any small cap, which
      // made the tolerant path return 0 bytes and mislabel every
      // >4 KiB-decoded .jsonl.zst shard as plain "zstd" (ADVICE r14).
      val head = ZstdCodec.decodePrefix(b, 4096)
      return if (looksJsonl(head)) "jsonl-zst" else "zstd"
    }
    if (XzCodec.isXz(b)) {
      val head = XzCodec.decompressTolerant(b, maxOut = 4096)
      return if (looksJsonl(head)) "jsonl-xz" else "xz"
    }
    if (Lz4Codec.isLz4(b)) {
      val head = Lz4Codec.decodePrefix(b, 4096)
      return if (looksJsonl(head)) "jsonl-lz4" else "lz4"
    }
    // framed snappy has a 10-byte magic; RAW snappy blocks carry no
    // magic at all and are content-undetectable by design — only the
    // framed form routes (the framing spec exists for exactly this)
    if (SnappyCodec.isSnappyFramed(b)) {
      val head = SnappyCodec.decodePrefix(b, 4096)
      return if (looksJsonl(head)) "jsonl-snappy" else "snappy"
    }
    if (BzipCodec.isBzip2(b)) {
      // the multistream wiki-dump form is bz2's dominant corpus use;
      // sniff the decoded head for the dump root element, then the
      // jsonl shard form; anything else is labeled for quarantine
      val head = BzipCodec.decodePrefix(b, 4096)
      if (looksJsonl(head)) return "jsonl-bz2"
      val s = asciiPrefixLower(head, 256)
      val t = s.dropWhile(c => c == ' ' || c == '\n' || c == '\r' || c == '\t')
      return if (t.startsWith("<mediawiki") ||
        (t.startsWith("<?xml") && s.contains("<mediawiki"))) "wiki-bz2"
      else "bzip2"
    }
    if (startsWith(b, "WARC/")) return "warc"
    if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)
      return "jpeg"
    if (b.length >= 4 && (b(0) & 0xff) == 0x89 && startsWith(b, "PNG", 1)) return "png"
    if (startsWith(b, "GIF8")) return "gif"
    if (startsWith(b, "RIFF") && startsWith(b, "WAVE", 8)) return "wav"
    if (FlacCodec.isFlac(b)) return "flac"
    if (startsWith(b, "RIFF") && startsWith(b, "AVI ", 8)) return "avi"
    if (TiffCodec.isTiff(b)) return "tiff"
    if (AvroCodec.isAvro(b)) return "avro"
    if (SevenZipCodec.isSevenZip(b)) return "7z"
    if (startsWith(b, "ustar", 257)) return "tar"
    if (startsWith(b, "{\\rtf")) return "rtf"
    if (b.length >= 4 && (b(0) & 0xff) == 0xd0 && (b(1) & 0xff) == 0xcf &&
        (b(2) & 0xff) == 0x11 && (b(3) & 0xff) == 0xe0) return "ole" // legacy .doc/.xls/.msg
    if (startsWith(b, "From ")) {
      // mbox needs a header line shortly after the separator — plain
      // prose starting with "From " must stay "text"
      val probe = asciiPrefixLower(b, 512)
      if (probe.contains("\nfrom:") || probe.contains("\nsubject:") ||
          probe.contains("\ndate:")) return "mbox"
    }
    val head = asciiPrefixLower(b, 256)
    val trimmed = head.dropWhile(c => c == ' ' || c == '\n' || c == '\r' || c == '\t' ||
      c == 0xef.toChar || c == 0xbb.toChar || c == 0xbf.toChar) // incl. UTF-8 BOM bytes
    if (trimmed.startsWith("<!doctype html") || trimmed.startsWith("<html")) return "html"
    // MediaWiki dump shards: the root element (with or without an XML
    // prolog) identifies the format — route to the wikitext extractor
    if (trimmed.startsWith("<mediawiki") ||
        (trimmed.startsWith("<?xml") && head.contains("<mediawiki"))) return "mediawiki"
    if (trimmed.startsWith("<?xml")) return "xml"
    if (looksTextual(b)) return "text"
    // Hadoop-snappy (HDFS .snappy exports) carries NO magic — only the
    // exact container geometry identifies it, so this structural check
    // runs LAST, after every magic-based and textual route has passed
    if (SnappyCodec.isHadoopSnappy(b)) {
      val head = SnappyCodec.decodeHadoopPrefix(b, 4096)
      return if (looksJsonl(head)) "jsonl-snappy-hadoop" else "snappy-hadoop"
    }
    "binary"
  }
}

/** POSIX ustar TAR codec — the other archive corpora arrive in
  * (`.tar`, and `.tar.gz` once the gzip layer peels). 512-byte block
  * headers, octal sizes, checksum-verified; read side only plus a
  * deterministic fixture writer. Long names (GNU/K extensions) and
  * sparse files are out of subset (loud).
  */
object TarCodec {

  final case class TarEntry(name: String, size: Long, offset: Long, typeflag: Char)

  private def octal(b: Array[Byte], at: Int, len: Int): Long = {
    var v = 0L
    var i = at
    val end = at + len
    while (i < end) {
      val c = b(i) & 0xff
      if (c >= '0' && c <= '7') v = v * 8 + (c - '0')
      else if (c != ' ' && c != 0) throw new IllegalArgumentException(
        s"TAR: bad octal digit ${c.toChar} at $i")
      i += 1
    }
    v
  }

  def isTar(b: Array[Byte]): Boolean =
    b != null && b.length >= 512 && b(257) == 'u' && b(258) == 's' &&
      b(259) == 't' && b(260) == 'a' && b(261) == 'r'

  /** Walk the header blocks; stops at the zero-block terminator or
    * data end. Checksums verified; typed throws on damage.
    */
  def entries(bytes: Array[Byte]): Vector[TarEntry] = {
    require(bytes != null && bytes.length >= 512, "TAR: too short for a header block")
    val out = Vector.newBuilder[TarEntry]
    var p = 0
    var done = false
    while (!done && p + 512 <= bytes.length) {
      if ((0 until 512).forall(i => bytes(p + i) == 0)) done = true
      else {
        require(bytes(p + 257) == 'u' && bytes(p + 258) == 's' && bytes(p + 259) == 't' &&
          bytes(p + 260) == 'a' && bytes(p + 261) == 'r',
          s"TAR: no ustar magic at block $p")
        // checksum: header bytes with the checksum field read as spaces
        val declared = octal(bytes, p + 148, 7)
        var sum = 0L
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(p + i) & 0xff)
          i += 1
        }
        require(sum == declared, s"TAR: checksum $sum != declared $declared at block $p")
        var nameEnd = p
        while (nameEnd < p + 100 && bytes(nameEnd) != 0) nameEnd += 1
        val name = new String(bytes, p, nameEnd - p, StandardCharsets.UTF_8)
        val size = octal(bytes, p + 124, 11)
        val typeflag = (bytes(p + 156) & 0xff).toChar
        require(typeflag != 'L' && typeflag != 'K' && typeflag != 'x' && typeflag != 'g',
          s"TAR: extension header '$typeflag' is out of subset")
        val dataOff = p + 512
        require(dataOff + size <= bytes.length,
          s"TAR: '$name' data overruns (${dataOff + size} > ${bytes.length})")
        out += TarEntry(name, size, dataOff.toLong, typeflag)
        p = dataOff + (((size + 511) / 512) * 512).toInt
      }
    }
    out.result()
  }

  def extract(bytes: Array[Byte], name: String): Array[Byte] =
    entries(bytes).find(_.name == name).map { e =>
      java.util.Arrays.copyOfRange(bytes, e.offset.toInt, (e.offset + e.size).toInt)
    }.orNull

  /** Deterministic writer: ustar headers, fixed mtime/uid/gid, two
    * zero-block terminator.
    */
  def build(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    files.foreach { case (name, data) =>
      val hdr = new Array[Byte](512)
      val nameB = name.getBytes(StandardCharsets.UTF_8)
      require(nameB.length <= 100, s"TAR build: name '$name' over 100 bytes")
      System.arraycopy(nameB, 0, hdr, 0, nameB.length)
      def putOctal(at: Int, len: Int, v: Long): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes(StandardCharsets.US_ASCII), 0, hdr, at, len - 1)
        hdr(at + len - 1) = 0
      }
      putOctal(100, 8, 420) // mode 0644
      putOctal(108, 8, 0); putOctal(116, 8, 0) // uid/gid
      putOctal(124, 12, data.length.toLong)
      putOctal(136, 12, 0x60000000L) // fixed mtime (deterministic)
      hdr(156) = '0' // regular file
      System.arraycopy("ustar".getBytes(StandardCharsets.US_ASCII), 0, hdr, 257, 5)
      hdr(262) = 0; hdr(263) = '0'; hdr(264) = '0' // POSIX magic + version
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0L
      hdr.foreach(b => sum += (b & 0xff))
      val cs = java.lang.Long.toOctalString(sum)
      val csPadded = ("0" * (6 - cs.length)) + cs
      System.arraycopy(csPadded.getBytes(StandardCharsets.US_ASCII), 0, hdr, 148, 6)
      hdr(154) = 0; hdr(155) = ' '
      out.write(hdr)
      out.write(data)
      val pad = (512 - (data.length % 512)) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }
}
