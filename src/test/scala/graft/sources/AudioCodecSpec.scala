package graft.sources

import graft.SparkSpec
import graft.sources.AudioCodec.Pcm

/** Byte-level contract of the WAV/PCM16 codec: container round trip,
  * RIFF chunk-walk robustness, corrupt-payload guards, exact-integer
  * analysis, and the rational resampler. The corpus-grain metadata
  * contract is oracle-gated by q_audio_meta / q_audio_vad /
  * q_audio_resample.
  */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  private def pcmOf(rate: Int, samples: Int*): Pcm =
    Pcm(rate, 1, samples.map(_.toShort).toArray)

  test("encode → decode round trip is sample-exact, including negatives") {
    val p = pcmOf(8000, 0, 1, -1, 32767, -32768, 1234, -4321)
    val d = AudioCodec.decodeWav(AudioCodec.encodeWav(p))
    assert(d != null)
    assert(d.sampleRate === 8000 && d.channels === 1)
    assert(d.samples.toSeq === p.samples.toSeq)
  }

  test("chunk walk skips unknown chunks (word-aligned) and still finds data") {
    val base = AudioCodec.encodeWav(pcmOf(16000, 5, -5, 5, -5))
    // splice an odd-sized LIST chunk between fmt and data; RIFF pads
    // chunk bodies to even length, which the walker must honor
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes -> 1 pad byte
    val chunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ listBody ++ Array[Byte](0)
    val spliced = base.slice(0, 36) ++ chunk ++ base.slice(36, base.length)
    // fix the RIFF size field
    val total = spliced.length - 8
    spliced(4) = total.toByte; spliced(5) = (total >> 8).toByte
    spliced(6) = (total >> 16).toByte; spliced(7) = (total >> 24).toByte
    val d = AudioCodec.decodeWav(spliced)
    assert(d != null)
    assert(d.samples.toSeq === Seq[Short](5, -5, 5, -5))
  }

  test("corrupt payloads decode to null, never throw") {
    val good = AudioCodec.encodeWav(pcmOf(8000, 1, 2, 3, 4, 5, 6, 7, 8))
    assert(AudioCodec.decodeWav(null) === null)
    assert(AudioCodec.decodeWav("not audio at all, just text bytes........".getBytes) === null)
    assert(AudioCodec.decodeWav(good.take(50)) === null) // truncated data chunk
    val wrongFmt = good.clone(); wrongFmt(20) = 2 // format code 2 = ADPCM
    assert(AudioCodec.decodeWav(wrongFmt) === null)
    val wrongBits = good.clone(); wrongBits(34) = 8 // 8-bit
    assert(AudioCodec.decodeWav(wrongBits) === null)
  }

  test("synth square wave: RMS is EXACTLY amp; windows follow the silence mask") {
    for (seed <- Seq(0L, 7L, 12345L, 999999L)) {
      val amp = 1000 + seed % 9000
      val wav = AudioCodec.synthWav(seed, 200, 16000, 0)
      assert(AudioCodec.rms(wav) === amp, s"seed=$seed")
      val info = AudioCodec.wavInfo(wav)
      assert(info(0) === 1600L && info(1) === 16000L && info(2) === 1L)
      assert(info(3) === 100L) // 1600 samples at 16 kHz = 100 ms
    }
    // mask 0b10100110: windows 1,2,5,7 silent
    val wav = AudioCodec.synthWav(500L, 100, 16000, Integer.parseInt("10100110", 2))
    val amp = 1000 + 500 % 9000
    assert(AudioCodec.windowRms(wav, 100).toSeq ===
      Seq(amp, 0L, 0L, amp, amp, 0L, amp, 0L))
  }

  test("window RMS covers a short tail window") {
    val p = Pcm(8000, 1, Array.fill(250)(100.toShort))
    val wav = AudioCodec.encodeWav(p)
    assert(AudioCodec.windowRms(wav, 100).toSeq === Seq(100L, 100L, 100L))
  }

  test("resample: floor-length contract, byte-exact identity, amp preserved") {
    val wav = AudioCodec.synthWav(42L, 250, 8000, 0) // 2000 samples
    val out = AudioCodec.resample(wav, 16000)
    val info = AudioCodec.wavInfo(out)
    assert(info(0) === 2000L * 16000 / 8000) // 4000
    assert(info(1) === 16000L)
    assert(out.length === 44 + 2 * 4000)
    // same-rate resample is the identity, byte for byte
    assert(java.util.Arrays.equals(AudioCodec.resample(wav, 8000), wav))
    // downsample: length floors
    assert(AudioCodec.wavInfo(AudioCodec.resample(wav, 11025))(0) === 2000L * 11025 / 8000)
    // square wave survives resampling to within interpolation edges
    val amp = 1000 + 42 % 9000
    val r = AudioCodec.rms(out)
    assert(math.abs(r - amp) < amp / 10, s"rms=$r amp=$amp")
    // non-mono input refuses (documented): null, not garbage
    val stereo = AudioCodec.encodeWav(Pcm(8000, 2, Array.fill(100)(5.toShort)))
    assert(AudioCodec.resample(stereo, 16000) === null)
  }

  test("decodeMedia decodes WAV for real: rate, channels, normalized loudness") {
    val wav = AudioCodec.synthWav(100L, 100, 12000, 0)
    val f = Multimodal.decodeMedia(Multimodal.MediaDoc(9L, "audio/wav", wav))
    assert((f.width, f.height) === (12000, 1))
    assert(f.feature === (1000 + 100 % 9000) / 32767.0)
    // corrupt wav falls back to the stub
    val bad = Multimodal.MediaDoc(10L, "audio/wav", wav.take(50))
    assert(Multimodal.decodeMedia(bad) === Multimodal.decodeStub(bad))
  }

  test("audio expressions null-propagate on non-WAV payloads in a plan") {
    import graft.functions.AudioOps
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "nope".getBytes), (2L, AudioCodec.synthWav(2L, 10, 8000, 0)))
      .toDF("id", "bin")
      .select(col("id"),
        AudioOps.wavInfo(col("bin")).as("info"),
        AudioOps.audioRms(col("bin")).as("rms"),
        AudioOps.audioResample(col("bin"), lit(16000)).as("rs"),
        AudioOps.audioWindowRms(col("bin"), lit(10)).as("wr"))
      .orderBy("id").collect()
    assert(df(0).isNullAt(1) && df(0).isNullAt(2) && df(0).isNullAt(3) && df(0).isNullAt(4))
    assert(!df(1).isNullAt(1) && df(1).getLong(2) === 1000 + 2 % 9000)
  }
}
