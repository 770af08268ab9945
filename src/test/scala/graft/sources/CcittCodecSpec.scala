package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** CCITT G4 codec: table sanity (prefix-freeness), independent
  * hand-packed decode vectors, encoder/decoder round trips across
  * pattern families (stripes, long runs, extended makeups, random),
  * BlackIs1 / EncodedByteAlign semantics, and hostile-input guards.
  */
class CcittCodecSpec extends AnyFunSuite {

  private def pack(bits: String): Array[Byte] =
    bits.replace(" ", "").padTo((bits.replace(" ", "").length + 7) / 8 * 8, '0')
      .grouped(8).map(g => Integer.parseInt(g, 2).toByte).toArray

  private def rowBits(out: Array[Byte], row: Int, columns: Int): String = {
    val rowBytes = (columns + 7) / 8
    (0 until columns).map { x =>
      (out(row * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
    }.mkString
  }

  test("code tables are prefix-free within each decode context") {
    // mode codes, white runs, and black runs are decoded in separate
    // contexts (a run code only follows a horizontal mode), so each
    // SET must be prefix-free on its own — a transposed table entry
    // that breaks unique decodability fails here
    for (codes <- Seq(CcittCodec.whiteRunCodes, CcittCodec.blackRunCodes,
                      CcittCodec.modeCodes)) {
      assert(codes.distinct.size === codes.size)
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"'$a' is a prefix of '$b'")
    }
  }

  test("independent hand-packed vector: horizontal mode then vertical-0 row copy") {
    // row 1: 4 white + 6 black → horizontal (001) + white-4 (1011) +
    // black-6 (0010); row 2 identical → V0 at the stripe edge, V0 at
    // the row end; EOFB
    val stream = pack("001 1011 0010" + "1 1" + "000000000001 000000000001")
    val out = CcittCodec.decodeG4(stream, columns = 10, rows = 2)
    assert(rowBits(out, 0, 10) === "1111000000")
    assert(rowBits(out, 1, 10) === "1111000000")
  }

  test("independent hand-packed vector: pass mode clears a reference run") {
    // row 1: white2 black2 white6 → H + white-2 (0111) + black-2 (11),
    // then a0=4 white vs nothing ahead: b1=b2=10 → V0 closes the row.
    // row 2: all white → ref has [2,4]: b2=4 < a1=10 → PASS, then V0.
    val stream = pack("001 0111 11" + "1" + "0001 1" + "000000000001 000000000001")
    val out = CcittCodec.decodeG4(stream, columns = 10, rows = 2)
    assert(rowBits(out, 0, 10) === "1100111111")
    assert(rowBits(out, 1, 10) === "1111111111")
  }

  test("round trips: stripes, fixture pattern, long runs, extended makeups, random") {
    val rnd = new scala.util.Random(5)
    def roundTrip(columns: Int, rows: Int, f: (Int, Int) => Int, align: Boolean = false): Unit = {
      val rowBytes = (columns + 7) / 8
      val packed = new Array[Byte](rows * rowBytes)
      for (y <- 0 until rows; x <- 0 until columns) {
        if (f(x, y) == 1)
          packed(y * rowBytes + (x >> 3)) =
            (packed(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
      }
      val enc = CcittCodec.encodeG4(packed, columns, rows, byteAlign = align)
      val dec = CcittCodec.decodeG4(enc, columns, rows, byteAlign = align)
      assert(dec.toSeq === packed.toSeq, s"$columns x $rows")
    }
    roundTrip(70, 12, (x, y) => if (y % 11 == 0) 1 else (x / 5 + y) % 2) // the fixture shape
    roundTrip(100, 8, (x, y) => if ((x + y * 7) % 13 < 6) 1 else 0)
    roundTrip(1, 3, (_, y) => y % 2) // single-column edge
    roundTrip(2000, 4, (x, _) => if (x < 1900) 1 else 0) // white makeup 1792+
    roundTrip(3000, 3, (x, y) => if (y == 0) 0 else if (x < 2900) 0 else 1) // black ext runs
    roundTrip(64, 64, (_, _) => rnd.nextInt(2)) // dense random: every mode fires
    roundTrip(130, 10, (x, y) => rnd.nextInt(2), align = true) // EncodedByteAlign
  }

  test("BlackIs1 inverts the output orientation") {
    val packed = Array[Byte](0xF0.toByte) // 4 white, 4 black
    val enc = CcittCodec.encodeG4(packed, 8, 1)
    assert(CcittCodec.decodeG4(enc, 8, 1).toSeq === Seq(0xF0.toByte))
    assert(CcittCodec.decodeG4(enc, 8, 1, blackIs1 = true).toSeq === Seq(0x0F.toByte))
  }

  test("guards: malformed stream throws typed; truncation stops cleanly") {
    // a black-run request where no valid code exists: 14 zero bits
    val e = intercept[IllegalArgumentException](
      CcittCodec.decodeG4(pack("001" + "00000000000000"), columns = 10, rows = 1))
    assert(e.getMessage.contains("CCITT"))
    // truncation mid-run-code is malformed too — typed, not a hang
    val good = CcittCodec.encodeG4(Array[Byte](0xAA.toByte, 0xAA.toByte), 8, 2)
    val e2 = intercept[IllegalArgumentException](CcittCodec.decodeG4(good.take(1), 8, 2))
    assert(e2.getMessage.contains("CCITT"))
    // data exhausted at a MODE boundary stops cleanly (shape preserved)
    val out = CcittCodec.decodeG4(Array.emptyByteArray, 8, 2)
    assert(out.length === 2 && out.forall(_ == 0))
  }
}
