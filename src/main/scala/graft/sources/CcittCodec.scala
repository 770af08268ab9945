package graft.sources

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** CCITT Group 4 (ITU-T T.6, "MMR") fax codec — the image compression
  * that dominates scanned-document PDFs (/CCITTFaxDecode with /K < 0,
  * the only shape modern writers emit). Pure JVM, from scratch, like
  * the rest of the codec layer; PDF wiring lives in [[PdfCodec]].
  *
  * The 2D algorithm codes each row against the row above via three
  * modes — pass (b2 left of a1), vertical (|a1−b1| ≤ 3), horizontal
  * (two T.4 run-length codes) — over an imaginary all-white reference
  * above row 0. Run lengths use the ITU-T T.4 white/black terminating
  * (0-63) + makeup (64-1728) tables plus the shared extended makeups
  * (1792-2560). The encoder exists for fixtures/specs and emits the
  * same vertical/horizontal/pass decisions a standard coder makes, so
  * encoder and decoder cross-check each other; the mode codes and the
  * common run codes are additionally pinned in the spec against
  * independently bit-packed streams.
  *
  * PDF semantics honored by the wiring: /BlackIs1 default FALSE means
  * 0 bits are black — the decoder emits white=1 rows for the default
  * and inverts when BlackIs1 is true; /EncodedByteAlign starts each
  * row on a byte boundary; decode stops at /Rows, EOFB, or data end.
  *
  * Out of subset (loud): /K ≥ 0 (G3 1D / mixed — legacy scanner
  * output; modern writers transcode), /Uncompressed mode extension.
  *
  * Scale shape: bytes → bytes per image, no Spark state — same
  * per-row codec posture as the rest of [[PdfCodec]].
  */
object CcittCodec {

  // ------------------------------------------------------------------
  // ITU-T T.4 code tables ("bits" as binary strings, parsed at load)
  // ------------------------------------------------------------------

  private val WhiteTerm: Array[String] = Array(
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100", "110101",
    "101010", "101011", "0100111", "0001100", "0001000", "0010111", "0000011", "0000100",
    "0101000", "0101011", "0010011", "0100100", "0011000", "00000010", "00000011", "00011010",
    "00011011", "00010010", "00010011", "00010100", "00010101", "00010110", "00010111", "00101000",
    "00101001", "00101010", "00101011", "00101100", "00101101", "00000100", "00000101", "00001010",
    "00001011", "01010010", "01010011", "01010100", "01010101", "00100100", "00100101", "01011000",
    "01011001", "01011010", "01011011", "01001010", "01001011", "00110010", "00110011", "00110100")

  private val WhiteMakeup: Array[(Int, String)] = Array(
    64 -> "11011", 128 -> "10010", 192 -> "010111", 256 -> "0110111",
    320 -> "00110110", 384 -> "00110111", 448 -> "01100100", 512 -> "01100101",
    576 -> "01101000", 640 -> "01100111", 704 -> "011001100", 768 -> "011001101",
    832 -> "011010010", 896 -> "011010011", 960 -> "011010100", 1024 -> "011010101",
    1088 -> "011010110", 1152 -> "011010111", 1216 -> "011011000", 1280 -> "011011001",
    1344 -> "011011010", 1408 -> "011011011", 1472 -> "010011000", 1536 -> "010011001",
    1600 -> "010011010", 1664 -> "011000", 1728 -> "010011011")

  private val BlackTerm: Array[String] = Array(
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100", "00000111", "000011000",
    "0000010111", "0000011000", "0000001000", "00001100111", "00001101000", "00001101100", "00000110111", "00000101000",
    "00000010111", "00000011000", "000011001010", "000011001011", "000011001100", "000011001101", "000001101000", "000001101001",
    "000001101010", "000001101011", "000011010010", "000011010011", "000011010100", "000011010101", "000011010110", "000011010111",
    "000001101100", "000001101101", "000011011010", "000011011011", "000001010100", "000001010101", "000001010110", "000001010111",
    "000001100100", "000001100101", "000001010010", "000001010011", "000000100100", "000000110111", "000000111000", "000000100111",
    "000000101000", "000001011000", "000001011001", "000000101011", "000000101100", "000001011010", "000001100110", "000001100111")

  private val BlackMakeup: Array[(Int, String)] = Array(
    64 -> "0000001111", 128 -> "000011001000", 192 -> "000011001001", 256 -> "000001011011",
    320 -> "000000110011", 384 -> "000000110100", 448 -> "000000110101", 512 -> "0000001101100",
    576 -> "0000001101101", 640 -> "0000001001010", 704 -> "0000001001011", 768 -> "0000001001100",
    832 -> "0000001001101", 896 -> "0000001110010", 960 -> "0000001110011", 1024 -> "0000001110100",
    1088 -> "0000001110101", 1152 -> "0000001110110", 1216 -> "0000001110111", 1280 -> "0000001010010",
    1344 -> "0000001010011", 1408 -> "0000001010100", 1472 -> "0000001010101", 1536 -> "0000001011010",
    1600 -> "0000001011011", 1664 -> "0000001100100", 1728 -> "0000001100101")

  private val ExtMakeup: Array[(Int, String)] = Array(
    1792 -> "00000001000", 1856 -> "00000001100", 1920 -> "00000001101", 1984 -> "000000010010",
    2048 -> "000000010011", 2112 -> "000000010100", 2176 -> "000000010101", 2240 -> "000000010110",
    2304 -> "000000010111", 2368 -> "000000011100", 2432 -> "000000011101", 2496 -> "000000011110",
    2560 -> "000000011111")

  // mode codes (T.6 §4.2.1)
  private val ModePass = "0001"
  private val ModeHoriz = "001"
  private val ModeV: Map[Int, String] = Map(
    0 -> "1", 1 -> "011", -1 -> "010", 2 -> "000011", -2 -> "000010",
    3 -> "0000011", -3 -> "0000010")
  private val Eol = "000000000001"

  /** Decode maps keyed by (bitLen << 16) | bits. */
  private def buildMap(entries: Iterable[(Int, String)]): java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    entries.foreach { case (run, code) =>
      m.put(Integer.valueOf((code.length << 16) | Integer.parseInt(code, 2)), Integer.valueOf(run))
    }
    m
  }
  private lazy val whiteRunMap = buildMap(
    WhiteTerm.zipWithIndex.map { case (c, r) => r -> c } ++ WhiteMakeup ++ ExtMakeup)
  private lazy val blackRunMap = buildMap(
    BlackTerm.zipWithIndex.map { case (c, r) => r -> c } ++ BlackMakeup ++ ExtMakeup)
  private lazy val modeMap = buildMap(
    ModeV.map { case (d, c) => (d + 10) -> c } ++ Seq(100 -> ModePass, 200 -> ModeHoriz))

  private[sources] def whiteRunCodes: Seq[String] =
    WhiteTerm.toSeq ++ WhiteMakeup.map(_._2) ++ ExtMakeup.map(_._2)
  private[sources] def blackRunCodes: Seq[String] =
    BlackTerm.toSeq ++ BlackMakeup.map(_._2) ++ ExtMakeup.map(_._2)
  private[sources] def modeCodes: Seq[String] =
    Seq(ModePass, ModeHoriz, Eol) ++ ModeV.values

  // ------------------------------------------------------------------
  // bit IO
  // ------------------------------------------------------------------

  private final class BitReader(val data: Array[Byte]) {
    var bitPos = 0
    def eof: Boolean = bitPos >= data.length * 8
    def readBit(): Int = {
      val b = (data(bitPos >> 3) >> (7 - (bitPos & 7))) & 1
      bitPos += 1
      b
    }
    def align(): Unit = bitPos = (bitPos + 7) & ~7
    /** Longest-prefix decode against a (len,bits)→value map; max 14
      * bits. -1 when nothing matches (poisoned stream).
      */
    def readCode(map: java.util.HashMap[Integer, Integer]): Int = {
      var bits = 0
      var len = 0
      while (len < 14 && !eof) {
        bits = (bits << 1) | readBit()
        len += 1
        val hit = map.get(Integer.valueOf((len << 16) | bits))
        if (hit != null) return hit.intValue()
      }
      -1
    }
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def write(code: String): Unit = {
      var i = 0
      while (i < code.length) {
        acc = (acc << 1) | (if (code.charAt(i) == '1') 1 else 0)
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i += 1
      }
    }
    def align(): Unit = if (n > 0) { out.write(acc << (8 - n)); acc = 0; n = 0 }
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  /** Total white run as T.4 codes: extended makeups for ≥ 2560, one
    * makeup for ≥ 64, then the terminating code.
    */
  private def writeRun(w: BitWriter, run0: Int, white: Boolean): Unit = {
    var run = run0
    while (run >= 2560 + 64) { w.write(ExtMakeup.last._2); run -= 2560 }
    if (run >= 1792) {
      val (len, code) = ExtMakeup.filter(_._1 <= run).last
      w.write(code); run -= len
    } else if (run >= 64) {
      val table = if (white) WhiteMakeup else BlackMakeup
      val (len, code) = table.filter(_._1 <= run).last
      w.write(code); run -= len
    }
    w.write(if (white) WhiteTerm(run) else BlackTerm(run))
  }

  /** Cumulative run decode: makeup codes (multiples of 64, incl.
    * extended) accumulate until a terminating code (< 64) arrives.
    */
  private def readRun(r: BitReader, white: Boolean): Int = {
    var total = 0
    var done = false
    while (!done) {
      val v = r.readCode(if (white) whiteRunMap else blackRunMap)
      if (v < 0) throw new IllegalArgumentException("CCITT: bad run code")
      total += v
      if (v < 64) done = true
    }
    total
  }

  // ------------------------------------------------------------------
  // G4 decode
  // ------------------------------------------------------------------

  /** Decode a G4 (/K < 0) stream to packed 1-bit rows, MSB-first,
    * rows byte-padded — 1 = white unless `blackIs1` (PDF default
    * /BlackIs1 false: 0 bits are black). Stops at `rows`, EOFB, or
    * data end; a malformed code mid-stream throws the codec's typed
    * message (poison-guard null upstream).
    */
  def decodeG4(data: Array[Byte], columns: Int, rows: Int,
               blackIs1: Boolean = false, byteAlign: Boolean = false): Array[Byte] = {
    require(columns >= 1, s"CCITT: bad /Columns $columns")
    require(rows >= 1, s"CCITT: bad /Rows $rows")
    val rowBytes = (columns + 7) / 8
    val out = new Array[Byte](rowBytes * rows)
    val r = new BitReader(data)
    // changing elements of the reference line (positions where color
    // flips; even index = white→black); imaginary all-white start
    var ref = Array(columns, columns)
    var refLen = 0
    var row = 0
    var stop = false
    while (row < rows && !stop) {
      if (byteAlign) r.align()
      val cur = mutable.ArrayBuffer[Int]()
      var a0 = -1
      var white = true
      var rowDone = false
      var steps = 0
      while (!rowDone && !stop) {
        steps += 1
        require(steps <= 2 * columns + 16,
          "CCITT: row does not converge (malformed stream)")
        if (r.eof) { stop = true }
        else {
          // b1: first ref transition > a0 changing TO the opposite of
          // the current color (white→black transitions sit at even
          // indices); b2: the one after it
          var i = 0
          val wantParity = if (white) 0 else 1
          while (i < refLen && (ref(i) <= a0 || (i & 1) != wantParity)) i += 1
          val b1 = if (i < refLen) ref(i) else columns
          val b2 = if (i + 1 < refLen) ref(i + 1) else columns
          val mode = r.readCode(modeMap)
          mode match {
            case -1 => stop = true // EOL/EOFB prefix or truncation
            case 100 => // pass
              a0 = b2
            case 200 => // horizontal: two runs from max(a0, 0)
              val start = if (a0 < 0) 0 else a0
              val r1 = readRun(r, white)
              val r2 = readRun(r, !white)
              cur += math.min(start + r1, columns)
              cur += math.min(start + r1 + r2, columns)
              a0 = start + r1 + r2
            case dPlus10 => // vertical
              val a1 = b1 + (dPlus10 - 10)
              cur += math.max(0, math.min(a1, columns))
              a0 = a1
              white = !white
          }
          if (a0 >= columns) rowDone = true
        }
      }
      if (!stop || cur.nonEmpty) {
        // materialize the row: runs alternate white/black from the
        // transition list; white = 1 (inverted below if BlackIs1)
        var x = 0
        var idx = 0
        var isWhite = true
        while (x < columns) {
          val next = if (idx < cur.length) math.min(cur(idx), columns) else columns
          if (isWhite) {
            var p = x
            while (p < next) {
              out(row * rowBytes + (p >> 3)) =
                (out(row * rowBytes + (p >> 3)) | (1 << (7 - (p & 7)))).toByte
              p += 1
            }
          }
          x = next
          idx += 1
          isWhite = !isWhite
        }
        ref = cur.toArray
        refLen = ref.length
        row += 1
      }
    }
    if (blackIs1) { var i = 0; while (i < out.length) { out(i) = (~out(i)).toByte; i += 1 } }
    out
  }

  // ------------------------------------------------------------------
  // G4 encode (fixture/spec support)
  // ------------------------------------------------------------------

  /** Encode packed 1-bit rows (1 = white, the decoder's default
    * orientation) as a G4 stream, EOFB-terminated.
    */
  def encodeG4(packed: Array[Byte], columns: Int, rows: Int,
               byteAlign: Boolean = false): Array[Byte] = {
    val rowBytes = (columns + 7) / 8
    require(packed.length >= rowBytes * rows, "CCITT encode: short input")
    val w = new BitWriter
    def bit(row: Int, x: Int): Int =
      (packed(row * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
    def transitions(row: Int): Array[Int] = {
      val t = mutable.ArrayBuffer[Int]()
      var color = 1 // white
      var x = 0
      while (x < columns) {
        if (bit(row, x) != color) { t += x; color = bit(row, x) }
        x += 1
      }
      t.toArray
    }
    var ref = Array.empty[Int]
    for (row <- 0 until rows) {
      if (byteAlign) w.align()
      val cur = transitions(row)
      var a0 = -1
      var white = true
      var curIdx = 0
      while (a0 < columns) {
        // a1: next coding-line transition > a0 (transition away from
        // the current color); a2: the one after
        while (curIdx < cur.length && cur(curIdx) <= a0) curIdx += 1
        val a1 = if (curIdx < cur.length) cur(curIdx) else columns
        val a2 = if (curIdx + 1 < cur.length) cur(curIdx + 1) else columns
        var i = 0
        val wantParity = if (white) 0 else 1
        while (i < ref.length && (ref(i) <= a0 || (i & 1) != wantParity)) i += 1
        val b1 = if (i < ref.length) ref(i) else columns
        val b2 = if (i + 1 < ref.length) ref(i + 1) else columns
        if (b2 < a1) {
          w.write(ModePass); a0 = b2
        } else if (math.abs(a1 - b1) <= 3) {
          w.write(ModeV(a1 - b1)); a0 = a1; white = !white; curIdx += 1
        } else {
          val start = if (a0 < 0) 0 else a0
          w.write(ModeHoriz)
          writeRun(w, a1 - start, white)
          writeRun(w, a2 - a1, !white)
          a0 = a2; curIdx += 2
        }
      }
      ref = cur
    }
    w.write(Eol); w.write(Eol) // EOFB
    w.bytes
  }
}
