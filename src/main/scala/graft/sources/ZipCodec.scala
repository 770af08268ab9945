package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, Inflater}
import scala.collection.mutable

/** ZIP container codec — the archive format under every Office
  * document (DOCX/XLSX/PPTX are ZIPs of XML parts) and a routine
  * crawl-payload container in its own right. Pure JVM on
  * `java.util.zip`'s Deflater/Inflater only; the CONTAINER walk is
  * implemented here rather than via `ZipInputStream` so that:
  *
  *   - parsing starts from the End-Of-Central-Directory record and
  *     walks the central directory (the authoritative index — the
  *     shape `ZipInputStream`'s forward scan gets wrong on archives
  *     with data descriptors or prepended junk);
  *   - a poisoned archive yields a typed throw (null upstream), never
  *     an unbounded loop — every offset/length is bounds-checked;
  *   - fixtures are deterministic: the writer emits fixed DOS
  *     timestamps and no extra fields, so oracle inputs are
  *     byte-stable across runs.
  *
  * In subset: stored (0) and deflate (8) methods, classic 32-bit
  * offsets/sizes. Out of subset (loud): ZIP64, encryption, other
  * methods — a corpus shard hitting one routes to quarantine with a
  * groupable reason via the usual check-expression pattern.
  *
  * Scale shape: bytes → entries per row, no Spark state; rides inside
  * codegen like the other container codecs.
  */
object ZipCodec {

  /** One central-directory entry; `offset` points at its local header. */
  final case class ZipEntry(name: String, method: Int, sizeC: Long, sizeU: Long,
                            crc: Long, offset: Long)

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (u16(b, p).toLong) | (u16(b, p + 2).toLong << 16)

  def isZip(b: Array[Byte]): Boolean =
    b != null && b.length > 4 && b(0) == 'P' && b(1) == 'K' &&
      (b(2) == 3 || b(2) == 5) // local header or empty-archive EOCD

  /** Locate the EOCD (scan back over a possible trailing comment) and
    * list the central directory. Typed throws on malformed archives.
    */
  def entries(bytes: Array[Byte]): Vector[ZipEntry] = {
    require(bytes != null && bytes.length >= 22, "ZIP: too short for an EOCD record")
    var p = bytes.length - 22
    val stop = math.max(0, bytes.length - 22 - 65535)
    while (p >= stop &&
           !(bytes(p) == 'P' && bytes(p + 1) == 'K' && bytes(p + 2) == 5 && bytes(p + 3) == 6)) {
      p -= 1
    }
    require(p >= stop && p >= 0, "ZIP: no end-of-central-directory record")
    val count = u16(bytes, p + 10)
    val cdSize = u32(bytes, p + 12)
    val cdOff = u32(bytes, p + 16)
    require(cdOff + cdSize <= bytes.length && cdOff >= 0,
      s"ZIP: central directory [$cdOff, ${cdOff + cdSize}) outside ${bytes.length} bytes")
    require(count != 0xffff && cdOff != 0xffffffffL, "ZIP: ZIP64 is out of subset")
    val out = Vector.newBuilder[ZipEntry]
    var q = cdOff.toInt
    var i = 0
    while (i < count) {
      require(q + 46 <= bytes.length &&
        bytes(q) == 'P' && bytes(q + 1) == 'K' && bytes(q + 2) == 1 && bytes(q + 3) == 2,
        s"ZIP: bad central-directory entry $i at $q")
      val method = u16(bytes, q + 10)
      val crc = u32(bytes, q + 16)
      val sizeC = u32(bytes, q + 20)
      val sizeU = u32(bytes, q + 24)
      val nameLen = u16(bytes, q + 28)
      val extraLen = u16(bytes, q + 30)
      val commentLen = u16(bytes, q + 32)
      val offset = u32(bytes, q + 42)
      require(q + 46 + nameLen <= bytes.length, s"ZIP: entry $i name overruns")
      require(sizeC != 0xffffffffL && sizeU != 0xffffffffL && offset != 0xffffffffL,
        "ZIP: ZIP64 is out of subset")
      val name = new String(bytes, q + 46, nameLen, StandardCharsets.UTF_8)
      out += ZipEntry(name, method, sizeC, sizeU, crc, offset)
      q += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    out.result()
  }

  /** Extract one entry's bytes (stored or deflate), bounds-checked
    * against the local header. Null when the name is absent.
    */
  def extract(bytes: Array[Byte], name: String): Array[Byte] =
    entries(bytes).find(_.name == name).map(e => extractEntry(bytes, e)).orNull

  def extractEntry(bytes: Array[Byte], e: ZipEntry): Array[Byte] = {
    val p = e.offset.toInt
    require(p + 30 <= bytes.length &&
      bytes(p) == 'P' && bytes(p + 1) == 'K' && bytes(p + 2) == 3 && bytes(p + 3) == 4,
      s"ZIP: bad local header for '${e.name}' at $p")
    val nameLen = u16(bytes, p + 26)
    val extraLen = u16(bytes, p + 28)
    val dataOff = p + 30 + nameLen + extraLen
    require(dataOff + e.sizeC <= bytes.length,
      s"ZIP: '${e.name}' data [${dataOff}, ${dataOff + e.sizeC}) overruns ${bytes.length}")
    val raw = java.util.Arrays.copyOfRange(bytes, dataOff, (dataOff + e.sizeC).toInt)
    e.method match {
      case 0 => raw
      case 8 => inflateRaw(raw, e.sizeU)
      case m => throw new IllegalArgumentException(
        s"ZIP: method $m for '${e.name}' is out of subset (stored/deflate)")
    }
  }

  /** Raw-deflate inflate with an output bound (the entry's declared
    * uncompressed size + slack) so a zip-bomb entry cannot balloon.
    */
  private def inflateRaw(data: Array[Byte], sizeU: Long): Array[Byte] = {
    require(sizeU <= 256L * 1024 * 1024, s"ZIP: entry declares $sizeU bytes (bomb guard)")
    val inf = new Inflater(true)
    try {
      // nowrap inflate requires a dummy trailing byte (Inflater javadoc)
      inf.setInput(data :+ 0.toByte)
      val out = new ByteArrayOutputStream(math.min(sizeU + 64, Int.MaxValue.toLong).toInt)
      val buf = new Array[Byte](8192)
      while (!inf.finished && !inf.needsDictionary) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput) {
          require(inf.finished, "ZIP: truncated deflate stream")
        } else {
          out.write(buf, 0, n)
          require(out.size() <= sizeU, "ZIP: entry inflates past its declared size")
        }
      }
      out.toByteArray
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"ZIP: corrupt deflate data (${e.getMessage})")
    } finally inf.end()
  }

  /** Deterministic writer: local headers + central directory, fixed
    * DOS timestamp, no extra fields/comments. `deflate` chooses the
    * method per entry (stored otherwise).
    */
  def build(files: Seq[(String, Array[Byte])], deflate: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    val central = mutable.ArrayBuffer[(String, Int, Long, Long, Long, Long)]()
    files.foreach { case (name, data) =>
      val crc = new CRC32(); crc.update(data)
      val packed = if (deflate) {
        val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(data); d.finish()
        val buf = new ByteArrayOutputStream(data.length / 2 + 64)
        val tmp = new Array[Byte](8192)
        while (!d.finished) buf.write(tmp, 0, d.deflate(tmp))
        d.end()
        buf.toByteArray
      } else data
      val (method, body) =
        if (deflate && packed.length < data.length) (8, packed) else (0, data)
      val nameB = name.getBytes(StandardCharsets.UTF_8)
      val offset = out.size().toLong
      out.write(Array[Byte]('P', 'K', 3, 4))
      w16(20); w16(0); w16(method)
      w16(0); w16(0x5421) // fixed DOS time/date (deterministic bytes)
      w32(crc.getValue); w32(body.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB); out.write(body)
      central += ((name, method, crc.getValue, body.length.toLong, data.length.toLong, offset))
    }
    val cdOff = out.size().toLong
    central.foreach { case (name, method, crc, sizeC, sizeU, offset) =>
      val nameB = name.getBytes(StandardCharsets.UTF_8)
      out.write(Array[Byte]('P', 'K', 1, 2))
      w16(20); w16(20); w16(0); w16(method)
      w16(0); w16(0x5421)
      w32(crc); w32(sizeC); w32(sizeU)
      w16(nameB.length); w16(0); w16(0)
      w16(0); w16(0); w32(0)
      w32(offset)
      out.write(nameB)
    }
    val cdSize = out.size().toLong - cdOff
    out.write(Array[Byte]('P', 'K', 5, 6))
    w16(0); w16(0); w16(central.length); w16(central.length)
    w32(cdSize); w32(cdOff); w16(0)
    out.toByteArray
  }
}
