package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** SRT/WebVTT cue parsing: both fixtures against the closed-form
  * schedule, timestamp forms, tag/entity handling, malformed-block
  * skipping, totality fuzz.
  */
class SubtitleCodecSpec extends AnyFunSuite {
  import SubtitleCodec._

  test("SRT and VTT fixtures parse to the identical closed-form schedule") {
    for (seed <- Seq(0L, 5L, 43L); n <- Seq(1, 3, 5)) {
      val srt = parseCues(synthSrt(seed, n))
      val vtt = parseCues(synthVtt(seed, n))
      assert(srt.length === n && vtt.length === n, s"seed $seed n $n")
      (0 until n).foreach { j =>
        for (cues <- Seq(srt, vtt)) {
          assert(cues(j).idx === j + 1)
          assert(cues(j).startMs === cueStartMs(seed, j))
          assert(cues(j).endMs === cueEndMs(seed, j))
          assert(cues(j).text === cueText(seed, j))
        }
      }
    }
  }

  test("timestamp forms: hour/short, comma/dot, bounds") {
    assert(parseTimestamp("01:02:03,456") === 3723456L)
    assert(parseTimestamp("01:02:03.456") === 3723456L)
    assert(parseTimestamp("02:03.456") === 123456L) // VTT short form
    assert(parseTimestamp("99:00:00.000") === 99L * 3600000)
    assert(parseTimestamp("00:60:00.000") === -1L)
    assert(parseTimestamp("00:00:61,000") === -1L)
    assert(parseTimestamp("garbage") === -1L)
    assert(parseTimestamp("1:2:3,45") === -1L) // wrong digit counts
  }

  test("VTT settings, cue ids, voice/italic tags, entities") {
    val vtt = "WEBVTT\n\nid-1\n00:00.000 --> 00:01.000 align:start\n" +
      "<v Roger>Hi &amp; <i>bye</i></v>\n\n" +
      "00:02.000 --> 00:03.000\n&lt;tag&gt; stays\n"
    val cues = parseCues(vtt)
    assert(cues.length === 2)
    assert(cues(0).text === "Hi & bye")
    assert(cues(0).endMs === 1000L)
    assert(cues(1).text === "<tag> stays")
  }

  test("malformed blocks skip; NOTE/STYLE blocks skip; end<start drops") {
    val doc = "WEBVTT\n\nNOTE a comment\nspanning lines\n\n" +
      "not a cue at all\n\n" +
      "00:05.000 --> 00:04.000\nbackwards\n\n" +
      "00:01.000 --> 00:02.000\ngood\n"
    val cues = parseCues(doc)
    assert(cues.map(_.text) === Seq("good"))
    assert(parseCues(null) == null)
    assert(parseCues("") === Seq.empty)
  }

  test("SRT with CRLF line endings and a BOM parses identically") {
    val srt = "\uFEFF" + synthSrt(7L, 2).replace("\n", "\r\n")
    val cues = parseCues(srt)
    assert(cues.length === 2)
    assert(cues(1).text === cueText(7L, 1))
  }

  test("totality fuzz: garbage and truncations never throw") {
    val rnd = new scala.util.Random(3)
    (0 until 200).foreach(_ => parseCues(rnd.nextString(rnd.nextInt(200))))
    val vtt = synthVtt(9L, 4)
    (0 to vtt.length by 11).foreach(k => parseCues(vtt.substring(0, k)))
    Seq("-->", "a --> b", "00:00.000 -->", "1\n00:00:00,000 --> oops\ntext").foreach(parseCues(_))
  }
}
