package graft.sources

/** SRT / WebVTT transcript parsing at CUE grain — the text half of a
  * speech corpus (audio ships FLAC + SRT/VTT transcripts; alignment
  * against the VAD segmentation is what a data pipeline needs before
  * any ASR-vs-transcript comparison). One pass, line grain, never
  * throws; malformed cues skip.
  *
  * Subset: SRT (`HH:MM:SS,mmm`) and WebVTT (`WEBVTT` header, dot
  * milliseconds, optional `MM:SS.mmm` short form, cue ids, cue
  * settings after the end timestamp, NOTE/STYLE blocks skipped);
  * inline `<i>`/`<b>`/voice tags strip (content flows); cue text
  * lines join with newline. No entity decoding beyond `&amp;`/`&lt;`/
  * `&gt;` (the three VTT requires escaped).
  */
object SubtitleCodec {

  /** One cue: `idx` = declared SRT index (or 1-based position when the
    * block carries no numeric id), times in integer ms.
    */
  final case class Cue(idx: Int, startMs: Long, endMs: Long, text: String)

  /** `[HH:]MM:SS[,.]mmm` → ms; −1 when malformed. */
  private[sources] def parseTimestamp(s: String): Long = {
    val t = s.trim
    val parts = t.split(':')
    if (parts.length < 2 || parts.length > 3) return -1L
    val secMs = parts.last.split("[.,]")
    if (secMs.length != 2 || secMs(0).length != 2 || secMs(1).length != 3) return -1L
    try {
      val h = if (parts.length == 3) parts(0).toLong else 0L
      val m = parts(parts.length - 2).toLong
      val sec = secMs(0).toLong
      val ms = secMs(1).toLong
      if (m > 59 || sec > 59 || h < 0) return -1L
      ((h * 60 + m) * 60 + sec) * 1000 + ms
    } catch { case _: NumberFormatException => -1L }
  }

  /** Strip `<...>` inline tags (italic/bold/voice/timestamps), keep
    * content; decode the three required entities.
    */
  private def cleanCueText(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val gt = s.indexOf('>', i + 1)
        i = if (gt < 0) n else gt + 1
      } else if (c == '&') {
        if (s.regionMatches(i, "&amp;", 0, 5)) { sb.append('&'); i += 5 }
        else if (s.regionMatches(i, "&lt;", 0, 4)) { sb.append('<'); i += 4 }
        else if (s.regionMatches(i, "&gt;", 0, 4)) { sb.append('>'); i += 4 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse an SRT or WebVTT document (auto-detected) to cue grain.
    * Null-safe; malformed blocks skip; never throws.
    */
  def parseCues(doc: String): Seq[Cue] = {
    if (doc == null) return null
    val lines = doc.replace("\uFEFF", "").split("\n", -1).map(l =>
      if (l.endsWith("\r")) l.substring(0, l.length - 1) else l)
    val out = Seq.newBuilder[Cue]
    var i = 0
    var counter = 0
    def isBlank(l: String): Boolean = l.trim.isEmpty
    while (i < lines.length) {
      if (isBlank(lines(i))) i += 1
      else if (lines(i).startsWith("WEBVTT")) {
        // header block: skip through its blank terminator
        while (i < lines.length && !isBlank(lines(i))) i += 1
      } else if (lines(i).startsWith("NOTE") || lines(i).startsWith("STYLE") ||
                 lines(i).startsWith("REGION")) {
        while (i < lines.length && !isBlank(lines(i))) i += 1
      } else {
        // cue block: [id line,] time line, text lines, blank
        val block = Seq.newBuilder[String]
        while (i < lines.length && !isBlank(lines(i))) { block += lines(i); i += 1 }
        val b = block.result()
        val timeAt = b.indexWhere(_.contains("-->"))
        if (timeAt >= 0 && timeAt <= 1) {
          counter += 1
          val idx =
            if (timeAt == 1 && b(0).trim.nonEmpty && b(0).trim.forall(_.isDigit))
              try b(0).trim.toInt catch { case _: NumberFormatException => counter }
            else counter
          val arrow = b(timeAt).indexOf("-->")
          val start = parseTimestamp(b(timeAt).substring(0, arrow))
          // cue settings (VTT `position:…` etc.) follow the end stamp
          val tail = b(timeAt).substring(arrow + 3).trim
          val endTok = tail.split("\\s+").headOption.getOrElse("")
          val end = parseTimestamp(endTok)
          if (start >= 0 && end >= start) {
            val text = b.drop(timeAt + 1).map(cleanCueText).mkString("\n")
            out += Cue(idx, start, end, text)
          }
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // deterministic fixtures (closed-form schedule, shared by SRT + VTT)
  // ------------------------------------------------------------------

  /** Cue `j` (0-based) of seed `seed` starts at `(seed % 7)·10 +
    * j·350` ms and runs `200 + (j % 3)·50` ms — a pure function both
    * oracle SQL and the alignment query replay.
    */
  def cueStartMs(seed: Long, j: Int): Long = (seed % 7) * 10 + j * 350L
  def cueEndMs(seed: Long, j: Int): Long = cueStartMs(seed, j) + 200 + (j % 3) * 50

  /** Cue text closed form (what parsing either container yields). */
  def cueText(seed: Long, j: Int): String =
    s"cue $seed line $j" + (if (j % 2 == 0) s"\nsecond $j" else "")

  private def fmt(ms: Long, sep: Char): String = {
    val h = ms / 3600000
    val m = (ms % 3600000) / 60000
    val s = (ms % 60000) / 1000
    val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d$sep$f%03d"
  }

  /** SRT fixture: numbered cues, comma milliseconds. */
  def synthSrt(seed: Long, nCues: Int): String = {
    val sb = new java.lang.StringBuilder()
    (0 until math.max(1, nCues)).foreach { j =>
      sb.append(j + 1).append('\n')
      sb.append(fmt(cueStartMs(seed, j), ',')).append(" --> ")
        .append(fmt(cueEndMs(seed, j), ',')).append('\n')
      sb.append(s"cue $seed line $j").append('\n')
      if (j % 2 == 0) sb.append(s"second $j").append('\n')
      sb.append('\n')
    }
    sb.toString
  }

  /** WebVTT fixture: header, cue ids, dot milliseconds, cue settings
    * on odd cues, inline italic tags on every third cue (stripped on
    * parse) — same closed-form schedule and text as the SRT twin.
    */
  def synthVtt(seed: Long, nCues: Int): String = {
    val sb = new java.lang.StringBuilder("WEBVTT - graft fixture\n\nNOTE generated\nfixture\n\n")
    (0 until math.max(1, nCues)).foreach { j =>
      sb.append(s"c$j\n")
      sb.append(fmt(cueStartMs(seed, j), '.')).append(" --> ")
        .append(fmt(cueEndMs(seed, j), '.'))
      if (j % 2 == 1) sb.append(" position:50% line:85%")
      sb.append('\n')
      if (j % 3 == 0) sb.append(s"<i>cue $seed</i> line $j").append('\n')
      else sb.append(s"cue $seed line $j").append('\n')
      if (j % 2 == 0) sb.append(s"second $j").append('\n')
      sb.append('\n')
    }
    sb.toString
  }
}
