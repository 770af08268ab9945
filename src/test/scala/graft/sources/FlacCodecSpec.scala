package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec: lossless encode/decode round trips across subframe
  * types (CONSTANT/FIXED-2/VERBATIM/LPC), mono and mid/side stereo,
  * short last frames, CRC enforcement, multi-frame UTF-8 numbering,
  * and hostile-input guards. Pure codec — no SparkSession.
  */
class FlacCodecSpec extends AnyFunSuite {

  private def samplesOf(seed: Long, w: Int, mask: Int): Array[Short] =
    AudioCodec.decodeWav(AudioCodec.synthWav(seed, w, 8000, mask)).samples

  test("mono round trip is lossless across masks and window sizes") {
    for (seed <- Seq(0L, 2L, 14L); w <- Seq(64, 100, 250); mask <- Seq(0, 0x55, 0xFF)) {
      val flac = FlacCodec.synthFlac(seed, w, 8000, mask, stereo = false)
      val pcm = FlacCodec.decodeFlac(flac)
      assert(pcm.sampleRate === 8000 && pcm.channels === 1)
      assert(pcm.samples.toSeq === samplesOf(seed, w, mask).toSeq, s"seed $seed w $w mask $mask")
    }
  }

  test("stereo round trip is lossless across ALL FOUR channel layouts (8 frames rotate independent/mid-side/left-side/right-side)") {
    for (seed <- Seq(1L, 7L); w <- Seq(64, 128); mask <- Seq(0, 0xA1)) {
      val flac = FlacCodec.synthFlac(seed, w, 8000, mask, stereo = true)
      val pcm = FlacCodec.decodeFlac(flac)
      assert(pcm.channels === 2)
      val mono = samplesOf(seed, w, mask)
      (0 until mono.length).foreach { i =>
        assert(pcm.samples(2 * i) === mono(i), s"L $i")
        assert(pcm.samples(2 * i + 1) === -mono(i), s"R $i")
      }
    }
  }

  test("every subframe type appears across a multi-frame stream") {
    // 8 windows = 8 frames at blockSize = w: silence windows CONSTANT,
    // the rest rotate FIXED/VERBATIM/LPC by frame index — decode also
    // covers the short-last-frame path via an odd total length
    val pcm = AudioCodec.decodeWav(AudioCodec.synthWav(9L, 100, 8000, 0x08))
    val trimmed = AudioCodec.Pcm(8000, 1, pcm.samples.take(750)) // 7.5 frames
    val flac = FlacCodec.encodeFlac(trimmed, blockSize = 100)
    val out = FlacCodec.decodeFlac(flac)
    assert(out.samples.toSeq === trimmed.samples.toSeq)
  }

  test("large frame counts exercise multi-byte UTF-8 frame numbers") {
    // 200 frames of 16 samples: frame numbers cross the 1-byte limit
    val raw = Array.tabulate(3200)(i => ((i % 40) * 100 - 2000).toShort)
    val flac = FlacCodec.encodeFlac(AudioCodec.Pcm(16000, 1, raw), blockSize = 16)
    assert(FlacCodec.decodeFlac(flac).samples.toSeq === raw.toSeq)
  }

  test("flacInfo matches STREAMINFO; non-FLAC yields null") {
    val flac = FlacCodec.synthFlac(4L, 200, 12000, 0, stereo = false)
    val info = FlacCodec.flacInfo(flac)
    assert(info.toSeq === Seq(1600L, 12000L, 1L, 16L, 1600L * 1000 / 12000))
    assert(FlacCodec.flacInfo("RIFFnope".getBytes) === null)
    assert(FlacCodec.flacInfo(null) === null)
  }

  test("corrupting any frame byte is caught (CRC or structure), never a wrong decode") {
    val flac = FlacCodec.synthFlac(3L, 64, 8000, 0x10, stereo = false)
    val reference = FlacCodec.decodeFlac(flac).samples.toSeq
    val rnd = new java.util.Random(11)
    var caught = 0
    for (_ <- 0 until 300) {
      val mut = flac.clone()
      val at = 42 + rnd.nextInt(mut.length - 42) // past STREAMINFO: frame bytes
      val delta = (1 + rnd.nextInt(255)).toByte
      mut(at) = (mut(at) + delta).toByte
      try {
        val out = FlacCodec.decodeFlac(mut)
        // undetected by CRC is possible only if the flip landed in
        // trailing padding; the decode must still be byte-identical
        assert(out.samples.toSeq === reference)
      } catch { case _: Exception => caught += 1 }
    }
    assert(caught > 250, s"only $caught of 300 corruptions caught")
  }

  test("wav analysis composes: RMS == amp, window RMS 0-or-amp after FLAC round trip") {
    val flac = FlacCodec.synthFlac(6L, 100, 16000, 0x0F, stereo = false)
    val wav = FlacCodec.flacToWav(flac)
    val amp = 1000 + 6 % 9000
    val wrms = AudioCodec.windowRms(wav, 100)
    assert(wrms.toSeq === (0 until 8).map(i => if (((0x0F >> i) & 1) == 1) 0L else amp.toLong))
  }

  test("format detect labels flac") {
    assert(FormatDetect.detect(FlacCodec.synthFlac(1L, 64, 8000, 0, stereo = false)) === "flac")
  }
}
