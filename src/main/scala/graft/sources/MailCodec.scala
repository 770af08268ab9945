package graft.sources

import java.nio.charset.{Charset, StandardCharsets}
import scala.collection.mutable

/** MBOX / RFC 5322 + MIME mail codec — email archives are a standing
  * LLM-corpus source (list archives, public dumps), and their text
  * sits behind three layers a naive reader gets wrong: mbox framing,
  * MIME multipart trees, and per-part transfer encodings. Pure JVM,
  * never-throws posture like the other codecs:
  *
  *   - MBOX split on `From ` separator lines (message start = line
  *     beginning `From ` after a blank line or at offset 0), with
  *     `>From ` unstuffing inside bodies;
  *   - headers: folded continuation lines joined, RFC 2047
  *     encoded-words decoded (`=?charset?B?…?=` base64 and `?Q?`
  *     quoted-printable with `_` = space, adjacent words joined);
  *   - bodies: `multipart/\*` recursion by boundary — text/plain
  *     preferred, text/html falls back through the crawl layer's
  *     [[graft.functions.HtmlOps]] extractor; transfer encodings
  *     base64 (MIME decoder, whitespace-tolerant) and
  *     quoted-printable (soft line breaks, `=XX` octets) decoded;
  *     charsets resolved from the Content-Type parameter (UTF-8 /
  *     Latin-1 / windows-1252 and friends via the JDK).
  *
  * Out of subset (degrade, not throw): attachments (non-text parts
  * are skipped), message/rfc822 nesting beyond depth 4, uuencode.
  *
  * Scale shape: bytes → messages per row; an mbox SHARD is the input
  * split, so one row per archive fans out to message grain via
  * explode — no state, no shuffle before the caller's aggregation.
  */
object MailCodec {

  final case class MailMessage(subject: String, from: String, date: String, text: String)

  // ------------------------------------------------------------------
  // low-level decoders
  // ------------------------------------------------------------------

  /** Quoted-printable (RFC 2045 §6.7): `=XX` octets, `=\n` soft
    * breaks; malformed escapes pass through literally (lenient).
    */
  private[sources] def decodeQp(s: Array[Byte], headerMode: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i) & 0xff
      if (c == '=' && i + 2 < s.length + 1) {
        if (i + 1 < s.length && (s(i + 1) == '\r' || s(i + 1) == '\n')) {
          // soft line break: consume CRLF or LF
          i += (if (i + 2 < s.length && s(i + 1) == '\r' && s(i + 2) == '\n') 3 else 2)
        } else if (i + 2 < s.length) {
          val hi = Character.digit(s(i + 1), 16)
          val lo = Character.digit(s(i + 2), 16)
          if (hi >= 0 && lo >= 0) { out.write((hi << 4) | lo); i += 3 }
          else { out.write(c); i += 1 }
        } else { out.write(c); i += 1 }
      } else if (headerMode && c == '_') { out.write(' '); i += 1 }
      else { out.write(c); i += 1 }
    }
    out.toByteArray
  }

  private def charsetFor(name: String): Charset =
    try Charset.forName(name.trim) catch { case _: Exception => StandardCharsets.ISO_8859_1 }

  /** RFC 2047 encoded-words in a header value; adjacent encoded words
    * join without the intervening whitespace (per spec).
    */
  private[sources] def decodeHeader(raw: String): String = {
    val re = "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=".r
    val sb = new StringBuilder
    var last = 0
    var lastWasWord = false
    var lastEnd = -1
    for (m <- re.findAllMatchIn(raw)) {
      val between = raw.substring(last, m.start)
      // whitespace BETWEEN two encoded words is transparent
      if (!(lastWasWord && between.trim.isEmpty)) sb.append(between)
      val cs = charsetFor(m.group(1))
      val payload = m.group(3)
      val decoded = m.group(2).toLowerCase match {
        case "b" =>
          try new String(java.util.Base64.getMimeDecoder.decode(payload), cs)
          catch { case _: Exception => payload }
        case _ => new String(decodeQp(payload.getBytes(StandardCharsets.ISO_8859_1),
          headerMode = true), cs)
      }
      sb.append(decoded)
      last = m.end
      lastWasWord = true
      lastEnd = m.end
    }
    sb.append(raw.substring(last))
    sb.toString
  }

  // ------------------------------------------------------------------
  // message parsing
  // ------------------------------------------------------------------

  private final case class RawPart(headers: Map[String, String], body: Array[Byte])

  /** Split headers (folded lines joined) from the body at the first
    * blank line. Lenient: a headerless blob is all body.
    */
  private def splitMessage(bytes: Array[Byte]): RawPart = {
    val text = new String(bytes, StandardCharsets.ISO_8859_1)
    val headerEnd = {
      val a = text.indexOf("\r\n\r\n")
      val b = text.indexOf("\n\n")
      if (a < 0 && b < 0) -1
      else if (a < 0) b else if (b < 0) a else math.min(a, b)
    }
    if (headerEnd < 0) return RawPart(Map.empty, bytes)
    val headText = text.substring(0, headerEnd)
    val bodyStart = headerEnd + (if (text.startsWith("\r\n\r\n", headerEnd)) 4 else 2)
    val headers = mutable.LinkedHashMap[String, String]()
    var currentKey: String = null
    headText.split("\r?\n").foreach { line =>
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (currentKey != null)
          headers(currentKey) = headers(currentKey) + " " + line.trim
      } else {
        val colon = line.indexOf(':')
        if (colon > 0) {
          currentKey = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          if (!headers.contains(currentKey)) headers(currentKey) = value
        }
      }
    }
    RawPart(headers.toMap, java.util.Arrays.copyOfRange(bytes, bodyStart, bytes.length))
  }

  private def headerParam(value: String, param: String): Option[String] = {
    val lower = value.toLowerCase
    val key = param.toLowerCase + "="
    val i = lower.indexOf(key)
    if (i < 0) None
    else {
      val rest = value.substring(i + key.length)
      val v = if (rest.startsWith("\"")) {
        val e = rest.indexOf('"', 1)
        if (e < 0) rest.substring(1) else rest.substring(1, e)
      } else rest.takeWhile(c => c != ';' && c != ' ' && c != '\t')
      Some(v)
    }
  }

  private def decodeBody(part: RawPart): Array[Byte] = {
    part.headers.getOrElse("content-transfer-encoding", "7bit").toLowerCase.trim match {
      case "base64" =>
        try java.util.Base64.getMimeDecoder.decode(
          new String(part.body, StandardCharsets.US_ASCII)
            .filter(c => !c.isWhitespace).getBytes(StandardCharsets.US_ASCII))
        catch { case _: Exception => part.body }
      case "quoted-printable" => decodeQp(part.body)
      case _ => part.body
    }
  }

  private def partCharset(part: RawPart): Charset =
    part.headers.get("content-type").flatMap(headerParam(_, "charset"))
      .map(charsetFor).getOrElse(StandardCharsets.UTF_8)

  /** Best text of a (possibly multipart) entity: text/plain preferred,
    * text/html extracted, multipart recursed depth-capped.
    */
  private def bestText(part: RawPart, depth: Int): Option[String] = {
    val ctype = part.headers.getOrElse("content-type", "text/plain").toLowerCase
    if (ctype.startsWith("multipart/") && depth < 4) {
      headerParam(part.headers("content-type"), "boundary") match {
        case None => None
        case Some(boundary) =>
          val text = new String(part.body, StandardCharsets.ISO_8859_1)
          val sep = "--" + boundary
          val chunks = text.split(java.util.regex.Pattern.quote(sep)).toSeq
            .drop(1) // preamble
            .takeWhile(c => !c.startsWith("--")) // terminator `--boundary--`
            .map(_.dropWhile(c => c == '\r' || c == '\n'))
          val parts = chunks.map(c =>
            splitMessage(c.getBytes(StandardCharsets.ISO_8859_1)))
          // prefer the first text/plain ANYWHERE in the tree, then html
          val plains = parts.flatMap { p =>
            val ct = p.headers.getOrElse("content-type", "text/plain").toLowerCase
            if (ct.startsWith("multipart/")) bestText(p, depth + 1)
            else if (ct.startsWith("text/plain")) textOf(p)
            else None
          }
          if (plains.nonEmpty) Some(plains.head)
          else parts.flatMap { p =>
            val ct = p.headers.getOrElse("content-type", "").toLowerCase
            if (ct.startsWith("text/html")) textOf(p) else None
          }.headOption
      }
    } else if (ctype.startsWith("text/html")) textOf(part)
    else if (ctype.startsWith("text/") || !part.headers.contains("content-type")) textOf(part)
    else None
  }

  private def textOf(part: RawPart): Option[String] = {
    val raw = decodeBody(part)
    val s = new String(raw, partCharset(part))
    val ctype = part.headers.getOrElse("content-type", "text/plain").toLowerCase
    val text =
      if (ctype.startsWith("text/html")) graft.functions.HtmlOps.extract(s).text
      else s.replace("\r\n", "\n").replaceAll("\n>From ", "\nFrom ") // mbox unstuffing
    Some(text.trim)
  }

  /** Parse ONE RFC 5322 message. */
  def parseMessage(bytes: Array[Byte]): MailMessage = {
    val msg = splitMessage(bytes)
    MailMessage(
      subject = msg.headers.get("subject").map(decodeHeader).orNull,
      from = msg.headers.get("from").map(decodeHeader).orNull,
      date = msg.headers.get("date").orNull,
      text = bestText(msg, 0).getOrElse(""))
  }

  /** Split an MBOX archive into messages: `From ` at offset 0 or after
    * a newline starts a message (bodies arrive `>From `-stuffed, so a
    * bare body line can't false-trigger in a conforming archive).
    * Null when the bytes don't start with `From `.
    */
  def parseMbox(bytes: Array[Byte]): Array[MailMessage] = {
    if (bytes == null || bytes.length < 5) return null
    val text = new String(bytes, StandardCharsets.ISO_8859_1)
    if (!text.startsWith("From ")) return null
    try {
      val starts = mutable.ArrayBuffer[Int](0)
      var i = text.indexOf("\nFrom ")
      while (i >= 0) { starts += i + 1; i = text.indexOf("\nFrom ", i + 1) }
      starts += text.length
      starts.sliding(2).map { case mutable.ArrayBuffer(a, b) =>
        // drop the `From ` separator line itself
        val nl = text.indexOf('\n', a)
        val msgStart = if (nl < 0 || nl >= b) b else nl + 1
        parseMessage(text.substring(msgStart, b).getBytes(StandardCharsets.ISO_8859_1))
      }.toArray
    } catch { case _: Exception => null }
  }

  // ------------------------------------------------------------------
  // fixture writer
  // ------------------------------------------------------------------

  /** `nMsgs` messages cycling the decode paths: msg m is (m%3):
    *   0 → quoted-printable Latin-1 plain text,
    *   1 → base64 UTF-8 plain text,
    *   2 → multipart/alternative with an html part FIRST and the
    *       preferred text/plain part second.
    * Subjects carry an RFC 2047 encoded word. Expected text is
    * [[expectedMailText]]; expected subject [[expectedMailSubject]].
    */
  def composeMbox(seed: Long, nMsgs: Int): Array[Byte] = {
    val n = math.max(1, nMsgs)
    val sb = new StringBuilder
    (0 until n).foreach { m =>
      val subjWord = java.util.Base64.getEncoder.encodeToString(
        s"Report $seed–$m".getBytes(StandardCharsets.UTF_8)) // en dash: non-ASCII
      sb.append(s"From sender@example.com Thu Jan  1 00:0$m:00 2026\n")
      sb.append(s"From: Sender $m <sender$m@example.com>\n")
      sb.append(s"Subject: =?UTF-8?B?$subjWord?=\n")
      sb.append(s"Date: Thu, 0${m % 9 + 1} Jan 2026 00:00:00 +0000\n")
      m % 3 match {
        case 0 =>
          sb.append("Content-Type: text/plain; charset=iso-8859-1\n")
          sb.append("Content-Transfer-Encoding: quoted-printable\n\n")
          sb.append(s"caf=E9 note $seed line $m =\njoined\n")
        case 1 =>
          val body = java.util.Base64.getMimeEncoder.encodeToString(
            s"body $seed of message $m — unicode ok".getBytes(StandardCharsets.UTF_8))
          sb.append("Content-Type: text/plain; charset=utf-8\n")
          sb.append("Content-Transfer-Encoding: base64\n\n")
          sb.append(body).append('\n')
        case _ =>
          sb.append(s"Content-Type: multipart/alternative; boundary=b$seed\n\n")
          sb.append(s"--b$seed\n")
          sb.append("Content-Type: text/html; charset=utf-8\n\n")
          sb.append(s"<html><body><p>html $seed version $m</p></body></html>\n")
          sb.append(s"--b$seed\n")
          sb.append("Content-Type: text/plain; charset=utf-8\n\n")
          sb.append(s"plain $seed wins $m\n")
          sb.append(s"--b$seed--\n")
      }
      sb.append('\n')
    }
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  def expectedMailSubject(seed: Long, m: Int): String = s"Report $seed–$m"

  def expectedMailText(seed: Long, m: Int): String = m % 3 match {
    case 0 => s"café note $seed line $m joined"
    case 1 => s"body $seed of message $m — unicode ok"
    case _ => s"plain $seed wins $m"
  }
}

/** RTF text extraction — the legacy word-processor format that still
  * surfaces in enterprise shares and email attachments. Single-pass,
  * never-throws tokenizer over the control structure:
  *
  *   - control words `\word[-]N ` (trailing space consumed), with
  *     `\par`/`\line` → newline, `\tab` → TAB, `\'xx` hex bytes in
  *     cp1252, `\uN` unicode (negative = 65536+N) honoring the `\ucN`
  *     fallback-skip count, `\\ \{ \}` escapes, `\~` NBSP;
  *   - destination groups (`{\*…}`, fonttbl, colortbl, stylesheet,
  *     info, pict, header, footer) skipped whole, brace depth
  *     tracked with the `\uc` state scoped per group.
  *
  * Out of subset (degrade): embedded objects, fields beyond their
  * result text, themes. Null when the bytes don't open `{\rtf`.
  */
object RtfCodec {

  private val SkipDests = Set("fonttbl", "colortbl", "stylesheet", "info", "pict",
    "header", "footer", "headerl", "headerr", "footerl", "footerr", "ftnsep",
    "generator", "themedata", "colorschememapping", "datastore", "xmlnstbl")

  def isRtf(b: Array[Byte]): Boolean =
    b != null && b.length > 5 && b(0) == '{' && b(1) == '\\' &&
      b(2) == 'r' && b(3) == 't' && b(4) == 'f'

  def extractText(bytes: Array[Byte]): String = {
    if (!isRtf(bytes)) return null
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = new StringBuilder
    // pending cp1252 bytes flush as a unit so multi-byte \'xx runs
    // decode coherently
    val pend = new java.io.ByteArrayOutputStream()
    def flush(): Unit = if (pend.size() > 0) {
      out.append(new String(pend.toByteArray, Charset.forName("windows-1252")))
      pend.reset()
    }
    var i = 0
    var depth = 0
    var skipDepth = -1 // skipping while depth > skipDepth
    val ucStack = mutable.Stack[Int]()
    var uc = 1
    var done = false
    while (i < s.length && !done) {
      val c = s.charAt(i)
      if (c == '{') { depth += 1; ucStack.push(uc); i += 1 }
      else if (c == '}') {
        depth -= 1
        if (ucStack.nonEmpty) uc = ucStack.pop()
        if (skipDepth >= 0 && depth <= skipDepth) skipDepth = -1
        if (depth <= 0) done = true
        i += 1
      } else if (c == '\\') {
        if (i + 1 >= s.length) done = true
        else {
          val n = s.charAt(i + 1)
          if (n == '\\' || n == '{' || n == '}') {
            if (skipDepth < 0) { flush(); out.append(n) }; i += 2
          } else if (n == '\'') {
            if (i + 3 < s.length) {
              val hi = Character.digit(s.charAt(i + 2), 16)
              val lo = Character.digit(s.charAt(i + 3), 16)
              if (skipDepth < 0 && hi >= 0 && lo >= 0) pend.write((hi << 4) | lo)
              i += 4
            } else done = true
          } else if (n == '~') { if (skipDepth < 0) { flush(); out.append(' ') }; i += 2 }
          else if (n == '*') {
            // {\*\dest …}: unknown destination — skip the group
            if (skipDepth < 0) skipDepth = depth - 1
            i += 2
          } else if (n.isLetter) {
            var j = i + 1
            while (j < s.length && s.charAt(j).isLetter) j += 1
            val word = s.substring(i + 1, j)
            var k = j
            var neg = false
            if (k < s.length && s.charAt(k) == '-') { neg = true; k += 1 }
            var num = 0L
            var hasNum = false
            while (k < s.length && s.charAt(k).isDigit) {
              num = num * 10 + (s.charAt(k) - '0'); hasNum = true; k += 1
            }
            if (k < s.length && s.charAt(k) == ' ') k += 1 // delimiter space
            val value = if (neg) -num else num
            word match {
              case _ if skipDepth >= 0 => // inside a skipped group
              case "par" | "line" | "sect" | "page" =>
                flush()
                while (out.nonEmpty && out.charAt(out.length - 1) == ' ')
                  out.setLength(out.length - 1)
                out.append('\n')
              case "tab" => flush(); out.append('\t')
              case "emdash" => flush(); out.append('—')
              case "endash" => flush(); out.append('–')
              case "lquote" => flush(); out.append('‘')
              case "rquote" => flush(); out.append('’')
              case "ldblquote" => flush(); out.append('“')
              case "rdblquote" => flush(); out.append('”')
              case "uc" if hasNum => uc = value.toInt
              case "u" if hasNum =>
                flush()
                val cp = if (value < 0) 65536 + value else value
                if (cp >= 0 && cp <= 0x10FFFF)
                  out.appendAll(Character.toChars(cp.toInt))
                // skip the `uc` fallback chars (either raw or \'xx)
                var skip = uc
                while (skip > 0 && k < s.length) {
                  if (s.charAt(k) == '\\' && k + 3 < s.length && s.charAt(k + 1) == '\'') {
                    k += 4; skip -= 1
                  } else if (s.charAt(k) == '\\' || s.charAt(k) == '{' || s.charAt(k) == '}') {
                    skip = 0 // structural char: fallback run ended early
                  } else { k += 1; skip -= 1 }
                }
              case w if SkipDests.contains(w) => skipDepth = depth - 1
              case _ => // formatting word: ignored
            }
            i = k
          } else i += 2 // unknown control symbol
        }
      } else {
        if (skipDepth < 0 && c != '\r' && c != '\n') { flush(); out.append(c) }
        i += 1
      }
    }
    flush()
    while (out.nonEmpty && (out.charAt(out.length - 1) == '\n' || out.charAt(out.length - 1) == ' '))
      out.setLength(out.length - 1)
    out.toString
  }

  /** Deterministic fixture: `nParas` paragraphs exercising hex bytes,
    * unicode escapes with fallbacks, special-char words and a skipped
    * font table. Expected text per para: [[expectedRtfPara]].
    */
  def composeRtf(seed: Long, nParas: Int): Array[Byte] = {
    val n = math.max(1, nParas)
    val paras = (0 until n).map { i =>
      s"\\pard Note $i of $seed: caf\\'e9 \\u8212 ?dash \\tab end\\par\n"
    }.mkString
    ("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Helvetica;}}" +
      "{\\*\\generator graft 1.0;}" + paras + "}").getBytes(StandardCharsets.ISO_8859_1)
  }

  def expectedRtfPara(seed: Long, i: Int): String =
    s"Note $i of $seed: café —dash \tend"
}
