package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** MBOX/MIME mail codec: fixture closed forms, header folding and
  * RFC 2047 edge cases, multipart preference, transfer-decode
  * tolerance, mbox framing (`>From ` unstuffing), and guards.
  */
class MailCodecSpec extends AnyFunSuite {

  test("fixture round trip: subjects, senders, dates and all three body paths") {
    for (n <- 1 to 5) {
      val msgs = MailCodec.parseMbox(MailCodec.composeMbox(70L + n, n))
      assert(msgs.length === n)
      msgs.zipWithIndex.foreach { case (m, i) =>
        assert(m.subject === MailCodec.expectedMailSubject(70L + n, i), s"subject $i")
        assert(m.from === s"Sender $i <sender$i@example.com>")
        assert(m.date === s"Thu, 0${i % 9 + 1} Jan 2026 00:00:00 +0000")
        assert(m.text === MailCodec.expectedMailText(70L + n, i), s"text $i")
      }
    }
  }

  test("headers: folded continuations, Q-encoding, adjacent encoded words") {
    val msg = ("From: a@b.c\n" +
      "Subject: =?utf-8?Q?caf=C3=A9_report?=\n" +
      " =?utf-8?Q?_part_two?=\n" +
      "X-Long: first\n\tsecond\n\n" +
      "body\n").getBytes("ISO-8859-1")
    val m = MailCodec.parseMessage(msg)
    // folding joins; whitespace between adjacent encoded words vanishes
    assert(m.subject === "café report part two")
    assert(m.text === "body")
    // Q '_' means space; B and Q words mix
    assert(MailCodec.decodeHeader("=?iso-8859-1?Q?caf=E9?= et =?utf-8?B?dGjDqQ==?=") ===
      "café et thé")
    // malformed word passes through untouched
    assert(MailCodec.decodeHeader("plain =?bogus") === "plain =?bogus")
  }

  test("multipart: text/plain wins regardless of order; html-only falls back; nesting") {
    def mboxOf(body: String, ctype: String): Array[Byte] =
      (s"From x Thu Jan  1 00:00:00 2026\nFrom: x@y.z\nSubject: s\n" +
        s"Content-Type: $ctype\n\n$body").getBytes("ISO-8859-1")
    // html-only multipart → extracted html text
    val htmlOnly = mboxOf(
      "--bb\nContent-Type: text/html\n\n<p>only html</p>\n--bb--\n",
      "multipart/alternative; boundary=bb")
    assert(MailCodec.parseMbox(htmlOnly).head.text === "only html")
    // nested multipart: plain inside the inner container still wins
    val nested = mboxOf(
      "--out\nContent-Type: multipart/alternative; boundary=in\n\n" +
        "--in\nContent-Type: text/html\n\n<p>h</p>\n" +
        "--in\nContent-Type: text/plain\n\ninner plain\n--in--\n" +
        "--out--\n",
      "multipart/mixed; boundary=out")
    assert(MailCodec.parseMbox(nested).head.text === "inner plain")
    // attachment-style part is skipped, plain kept
    val withAttach = mboxOf(
      "--bb\nContent-Type: application/octet-stream\nContent-Transfer-Encoding: base64\n\nAAAA\n" +
        "--bb\nContent-Type: text/plain\n\nkeep me\n--bb--\n",
      "multipart/mixed; boundary=bb")
    assert(MailCodec.parseMbox(withAttach).head.text === "keep me")
  }

  test("mbox framing: >From unstuffing, separator inside base64 never splits") {
    val mbox = ("From a Thu Jan  1 00:00:00 2026\nFrom: a@b.c\nSubject: one\n\n" +
      "line one\n>From stuffed line\nlast\n" +
      "\nFrom b Thu Jan  1 00:01:00 2026\nFrom: b@b.c\nSubject: two\n\nsecond body\n")
      .getBytes("ISO-8859-1")
    val msgs = MailCodec.parseMbox(mbox)
    assert(msgs.length === 2)
    assert(msgs(0).text === "line one\nFrom stuffed line\nlast")
    assert(msgs(1).text === "second body")
  }

  test("guards: broken base64 degrades to raw, non-mbox null, empty tolerated") {
    val broken = ("From x Thu\nFrom: x@y\nSubject: s\n" +
      "Content-Transfer-Encoding: base64\n\n!!!not-base64!!!\n").getBytes("ISO-8859-1")
    assert(MailCodec.parseMbox(broken).head.text.nonEmpty) // raw passthrough, no throw
    assert(MailCodec.parseMbox("not mail at all".getBytes) === null)
    assert(MailCodec.parseMbox(Array.emptyByteArray) === null)
    assert(MailCodec.parseMbox(null) === null)
    // headerless message: all body
    val m = MailCodec.parseMessage("just a blob with no headers".getBytes)
    assert(m.subject === null && m.text.nonEmpty)
  }

  test("RTF: fixture closed form, unicode fallbacks, destination skipping, guards") {
    for (n <- 1 to 3) {
      val got = RtfCodec.extractText(RtfCodec.composeRtf(40L + n, n))
      val want = (0 until n).map(RtfCodec.expectedRtfPara(40L + n, _)).mkString("\n")
      assert(got === want, s"n=$n")
    }
    def rtf(body: String): String =
      RtfCodec.extractText(s"{\\rtf1\\ansi $body}".getBytes("ISO-8859-1"))
    // \uc2: TWO fallback chars skipped; negative \u wraps mod 65536
    assert(rtf("\\uc2 a\\u26085 ??b\\uc1 \\u-1279 ?c") === "a日bﬁc") // -1279 → U+FB01
    // escapes and special-character words: \~ is a control SYMBOL (no
    // delimiter space eaten, and it emits a true NBSP), while
    // \lquote/\endash are control WORDS eating their delimiter space
    assert(rtf("\\{x\\} \\\\ \\~ \\lquote q\\rquote \\endash") === "{x} \\   ‘q’–")
    // destination groups vanish whole, nested braces inside them too
    // groups vanish but the literal spaces AROUND them survive (3 here)
    assert(rtf("keep {\\*\\unknowndest {nested} gone} {\\fonttbl{\\f0 X;}} end") === "keep   end")
    // stray bytes / not-rtf
    assert(RtfCodec.extractText("plain".getBytes) === null)
    assert(RtfCodec.extractText(Array.emptyByteArray) === null)
    // truncated rtf never throws
    val base = RtfCodec.composeRtf(5L, 2)
    (1 until base.length by 7).foreach(k => RtfCodec.extractText(base.take(k)))
    assert(FormatDetect.detect(base) === "rtf")
    assert(FormatDetect.detect(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1)
      .map(_.toByte)) === "ole")
  }

  test("mutated battery: parser never throws over 200 damaged archives") {
    val rnd = new scala.util.Random(23)
    val base = MailCodec.composeMbox(9L, 4)
    (0 until 200).foreach { i =>
      val mut = i % 4 match {
        case 0 => base
        case 1 => base.take(1 + rnd.nextInt(base.length - 1))
        case 2 =>
          val b = base.clone()
          (0 until 6).foreach { _ =>
            val at = rnd.nextInt(b.length); b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
          }
          b
        case _ => base.drop(rnd.nextInt(base.length))
      }
      MailCodec.parseMbox(mut) // must not throw; null or partial both fine
    }
  }
}
