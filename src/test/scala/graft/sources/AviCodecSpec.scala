package graft.sources

import graft.SparkSpec

/** Byte-level contract of the RIFF-AVI video codec: DIB round trip is
  * pixel-exact, MJPEG round trip preserves geometry/count and decodes
  * near the source, metadata parse, corrupt-payload guards, the
  * transcode path, and fold parity with the GIF analysis on identical
  * frames. The corpus-grain metadata contract is oracle-gated by
  * q_avi_frames / q_avi_transcode.
  */
class AviCodecSpec extends SparkSpec {

  private def solid(w: Int, h: Int, rgb: Int): ImageCodec.Px =
    ImageCodec.Px(w, h, Array.fill(w * h)(rgb))

  test("DIB encode → decode round trip is frame- and pixel-exact") {
    // 10x6: stride 30 → padded to 32, exercising the 4-byte row padding
    val frames = Seq(solid(10, 6, 0x336699), solid(10, 6, 0xFF0000), solid(10, 6, 0x00CC33))
    val avi = AviCodec.encode(frames, fps = 10, mjpeg = false)
    assert(AviCodec.isAvi(avi))
    assert(AviCodec.aviInfo(avi).toSeq === Seq(3L, 10L, 6L, 10L))
    val back = AviCodec.decodeFrames(avi)
    assert(back.length === 3)
    frames.zip(back).foreach { case (a, b) =>
      assert(b.w === a.w && b.h === a.h)
      assert(b.rgb.toSeq === a.rgb.toSeq)
    }
  }

  test("DIB round trip survives arbitrary (non-palette) pixels exactly") {
    val rgb = Array.tabulate(15 * 7)(i => (i * 2654435761L).toInt & 0xffffff)
    val f = ImageCodec.Px(15, 7, rgb)
    val back = AviCodec.decodeFrames(AviCodec.encode(Seq(f), fps = 25, mjpeg = false))
    assert(back.length === 1)
    assert(back(0).rgb.toSeq === rgb.toSeq)
  }

  test("MJPEG encode → decode preserves geometry and count; luma stays near source") {
    val frames = Seq(solid(16, 16, 0x808080), solid(16, 16, 0x202020))
    val avi = AviCodec.encode(frames, fps = 12, mjpeg = true, quality = 90)
    assert(AviCodec.aviInfo(avi).toSeq === Seq(2L, 16L, 16L, 12L))
    val back = AviCodec.decodeFrames(avi)
    assert(back.length === 2)
    assert(back.forall(p => p.w == 16 && p.h == 16))
    // solid gray frames: JPEG DC-only blocks reconstruct within a few codes
    frames.zip(back).foreach { case (a, b) =>
      val d = math.abs(FrameAnalysis.meanLuma(a) - FrameAnalysis.meanLuma(b))
      assert(d <= 4, s"luma drifted by $d")
    }
  }

  test("odd-size JPEG payloads keep the chunk walk word-aligned") {
    // find a quality whose FIRST frame payload has odd length — frames
    // after it only parse if the pad byte is written and skipped
    val f1 = ImageCodec.Px(9, 9, Array.tabulate(81)(i => (i * 41) & 0xffffff))
    val oddQ = (1 to 95).find(q => ImageCodec.encodeJpeg(f1, q).length % 2 == 1)
    assert(oddQ.isDefined, "no quality produced an odd JPEG payload")
    val frames = Seq(f1, solid(9, 9, 0x654321), solid(9, 9, 0x0F0F0F))
    val avi = AviCodec.encode(frames, fps = 10, mjpeg = true, quality = oddQ.get)
    val back = AviCodec.decodeFrames(avi)
    assert(back != null && back.length === 3)
  }

  test("aviInfo: non-AVI / truncated bytes are null, never throw") {
    assert(AviCodec.aviInfo(null) === null)
    assert(AviCodec.aviInfo(Array[Byte](1, 2, 3)) === null)
    assert(AviCodec.aviInfo("RIFFxxxxWAVE".getBytes) === null)
    val avi = AviCodec.synthAvi(1L, 2, 8, 6)
    assert(AviCodec.aviInfo(java.util.Arrays.copyOf(avi, 20)) === null)
    // losing only the trailing idx1 index must NOT lose frames (the
    // walk reads movi, not the index): 2×(8+144)-byte frame chunks +
    // 8+32-byte idx1 at the tail
    val noIdx = java.util.Arrays.copyOf(avi, avi.length - 40)
    assert(AviCodec.decodeFrames(noIdx).length === 2)
    // truncation INSIDE the second frame chunk drops that frame
    val cut = java.util.Arrays.copyOf(avi, avi.length - 40 - 100)
    val back = AviCodec.decodeFrames(cut)
    assert(back === null || back.length < 2)
  }

  test("hostile header dimensions yield null on the data path, never throw") {
    // patch the avih dwWidth/dwHeight of a valid file in place
    def patchDims(avi: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = avi.clone()
      val idx = out.indices.dropRight(3).find(i =>
        out(i) == 'a' && out(i + 1) == 'v' && out(i + 2) == 'i' && out(i + 3) == 'h').get
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(idx + 4 + 4 + 32, w) // chunk id + size + avih offset 32
      bb.putInt(idx + 4 + 4 + 36, h)
      out
    }
    val avi = AviCodec.synthAvi(1L, 2, 8, 6)
    // w = h = 65536: stride*h and w*h overflow Int to 0 — the pre-fix
    // crash (ArrayIndexOutOfBounds through the pixel loop). The parse
    // sane-bound now rejects the header outright.
    val overflow = patchDims(avi, 65536, 65536)
    assert(AviCodec.aviInfo(overflow) === null)
    assert(AviCodec.decodeFrames(overflow) === null)
    assert(AviCodec.frameLumas(overflow) === null)
    // dims inside the sane bound but far past the real payload: the
    // Long-arithmetic payload guard nulls the frame instead of looping
    val tooBig = patchDims(avi, 30000, 30000)
    assert(AviCodec.decodeFrames(tooBig) === null)
    assert(AviCodec.aviInfo(tooBig) !== null) // metadata-only probe still reads
  }

  test("synthAvi lumas are the closed-form webSafe formula; analyze matches GIF folds") {
    val seed = 42L
    val avi = AviCodec.synthAvi(seed, 4, 8, 6)
    val gif = GifCodec.synthGif(seed, 4, 8, 6)
    val (al, am) = AviCodec.analyze(avi)
    val (gl, gm) = GifCodec.analyze(gif)
    assert(al.toSeq === gl.toSeq, "luma parity with the GIF fixture")
    assert(am.toSeq === gm.toSeq, "motion parity with the GIF fixture")
    // closed form: luma of webSafe(seed+k)
    val expect = (0 until 4).map { k =>
      val c = FrameAnalysis.webSafe(seed + k)
      ((77 * ((c >> 16) & 0xff) + 150 * ((c >> 8) & 0xff) + 29 * (c & 0xff)) >> 8).toLong
    }
    assert(al.toSeq === expect)
  }

  test("toMjpeg transcode: DIB in → MJPEG out, geometry/count/fps preserved") {
    val avi = AviCodec.synthAvi(7L, 3, 16, 8)
    val mj = AviCodec.toMjpeg(avi, fps = 10, quality = 85)
    assert(mj != null && AviCodec.isAvi(mj))
    assert(AviCodec.aviInfo(mj).toSeq === Seq(3L, 16L, 8L, 10L))
    val back = AviCodec.decodeFrames(mj)
    assert(back.length === 3)
    assert(back.forall(p => p.w == 16 && p.h == 8))
    assert(AviCodec.toMjpeg("not an avi".getBytes, 10, 85) === null)
  }

  test("frameMotion: single-frame → null; solid-color pair → exact channel delta") {
    assert(AviCodec.frameMotion(AviCodec.synthAvi(1L, 1, 8, 6)) === null)
    val avi = AviCodec.encode(Seq(solid(8, 6, 0x000000), solid(8, 6, 0x333333)), 10, mjpeg = false)
    assert(AviCodec.frameMotion(avi).toSeq === Seq(0x33L * 3))
  }
}
