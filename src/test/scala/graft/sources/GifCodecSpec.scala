package graft.sources

import graft.SparkSpec

/** Byte-level contract of the animated-GIF (video-family) codec:
  * sequence round trip, palette-exact pixel survival, metadata parse,
  * corrupt-payload guards, and the closed-form luma of the synth
  * fixture. The corpus-grain metadata contract is oracle-gated by
  * q_gif_frames.
  */
class GifCodecSpec extends SparkSpec {

  private def solid(w: Int, h: Int, rgb: Int): ImageCodec.Px =
    ImageCodec.Px(w, h, Array.fill(w * h)(rgb))

  test("encode → decode round trip is frame- and pixel-exact for palette colors") {
    val frames = Seq(solid(8, 6, 0x336699), solid(8, 6, 0xFF0000), solid(8, 6, 0x00CC33))
    val gif = GifCodec.encode(frames)
    assert(GifCodec.isGif(gif))
    assert(GifCodec.frameCount(gif) === 3)
    val back = GifCodec.decodeFrames(gif)
    assert(back.length === 3)
    frames.zip(back).foreach { case (a, b) =>
      assert(b.w === a.w && b.h === a.h)
      assert(b.rgb.toSeq === a.rgb.toSeq)
    }
  }

  test("multi-color frames under 256 colors survive the local palette exactly") {
    // a 16x16 gradient of 256 distinct colors — the per-frame palette limit
    val rgb = Array.tabulate(256)(i => (i << 16) | ((255 - i) << 8) | 0x40)
    val f = ImageCodec.Px(16, 16, rgb)
    val back = GifCodec.decodeFrames(GifCodec.encode(Seq(f)))
    assert(back.length === 1)
    assert(back(0).rgb.toSeq === rgb.toSeq)
  }

  test("gifInfo parses count and geometry; non-GIF bytes are null, never throw") {
    val gif = GifCodec.synthGif(5L, 4, 12, 6)
    assert(GifCodec.gifInfo(gif).toSeq === Seq(4L, 12L, 6L))
    assert(GifCodec.gifInfo(null) === null)
    assert(GifCodec.gifInfo("not a gif at all".getBytes) === null)
    assert(GifCodec.gifInfo(Array[Byte]('G', 'I', 'F', '8', '9', 'a', 0)) === null)
    assert(GifCodec.decodeFrames(gif.take(20)) === null) // truncated stream
    assert(GifCodec.frameLumas("GIFgarbage".getBytes) === null)
    assert(GifCodec.frameLuma(gif, -1) === -1L)
    assert(GifCodec.frameLuma(gif, 4) === -1L)
  }

  test("encode refuses empty input and mixed frame sizes") {
    intercept[IllegalArgumentException](GifCodec.encode(Nil))
    intercept[IllegalArgumentException](
      GifCodec.encode(Seq(solid(4, 4, 0), solid(4, 5, 0))))
  }

  test("synth fixture is byte-deterministic and luma matches the closed form") {
    for (seed <- Seq(0L, 7L, 215L, 9999L)) {
      val a = GifCodec.synthGif(seed, 3, 8, 6)
      val b = GifCodec.synthGif(seed, 3, 8, 6)
      assert(a.toSeq === b.toSeq, s"seed=$seed not deterministic")
      val lumas = GifCodec.frameLumas(a)
      assert(lumas.length === 3)
      for (k <- 0 until 3) {
        val v = ((seed + k) % 216).toInt
        val expect = (77 * (v / 36) * 51 + 150 * ((v / 6) % 6) * 51 +
          29 * (v % 6) * 51) >> 8
        assert(lumas(k) === expect.toLong, s"seed=$seed frame=$k")
        assert(GifCodec.frameLuma(a, k) === expect.toLong)
      }
    }
  }

  test("frameMotion: exact channel-delta sums on solids; null on degenerate input") {
    val gif = GifCodec.encode(Seq(
      solid(8, 6, 0x000000), solid(8, 6, 0x333333), solid(8, 6, 0x333333)))
    // frame 0→1: |0x33|*3 = 153; frame 1→2: identical = 0
    assert(GifCodec.frameMotion(gif).toSeq === Seq(153L, 0L))
    val single = GifCodec.encode(Seq(solid(4, 4, 0x102030)))
    assert(GifCodec.frameMotion(single) === null) // no consecutive pair
    assert(GifCodec.frameMotion("plain text".getBytes) === null)
  }

  test("analyze returns both arrays from one decode, agreeing with the split paths") {
    val gif = GifCodec.synthGif(23L, 4, 8, 6)
    val (lumas, motion) = GifCodec.analyze(gif)
    assert(lumas.toSeq === GifCodec.frameLumas(gif).toSeq)
    assert(motion.toSeq === GifCodec.frameMotion(gif).toSeq)
    val single = GifCodec.encode(Seq(solid(4, 4, 0x102030)))
    val (l1, m1) = GifCodec.analyze(single)
    assert(l1.length === 1 && m1 === null) // motion null, matching frameMotion
    assert(GifCodec.analyze("not gif".getBytes) === null)
  }

  test("framesPng yields one decodable PNG per frame with the frame's pixels") {
    val gif = GifCodec.synthGif(11L, 2, 6, 4)
    val pngs = GifCodec.framesPng(gif)
    assert(pngs.length === 2)
    val px = GifCodec.decodeFrames(gif)
    pngs.zip(px).foreach { case (png, p) =>
      val d = ImageCodec.decode(png)
      assert(d != null && d.w === p.w && d.h === p.h)
      assert(d.rgb.toSeq === p.rgb.toSeq)
    }
  }
}
