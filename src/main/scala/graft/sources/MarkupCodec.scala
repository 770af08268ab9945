package graft.sources

/** Plain-text extraction from the two markup dialects that dominate
  * public training corpora next to HTML: Markdown (READMEs, forums,
  * docs) and LaTeX (the arXiv family). Both extractors are
  * deterministic single-pass scanners — no regex, no recursion on
  * input-controlled depth, never throw — with the exact subset
  * documented per rule, so a SQL oracle replays expected output
  * closed-form. The reference pipeline has no markup stage (it routes
  * whole files by extension, `app.py:142-210`); this is corpus-prep
  * generalization in the crawl layer's `html_extract` posture.
  */
object MarkupCodec {

  // ------------------------------------------------------------------
  // Markdown

  /** Markdown → text. Block rules (line grain): fenced code blocks
    * keep their content, fence lines drop; ATX headings lose their
    * `#` markers; blockquote `>` prefixes strip (nested too);
    * thematic-break lines drop; `-`/`*`/`+`/`1.` list markers strip.
    * Inline rules: `![alt](url)` → alt, `[text](url)` → text,
    * backticks and asterisks drop, underscores are KEPT (snake_case
    * dominates code-adjacent corpora and plain-prose `_emphasis_` is
    * rare enough that protecting identifiers wins). Null-safe.
    */
  def markdownText(md: String): String = {
    if (md == null) return null
    val lines = md.split("\n", -1)
    val out = new scala.collection.mutable.ArrayBuffer[String](lines.length)
    var inFence = false
    var fenceCh = '`'
    var li = 0
    while (li < lines.length) {
      val line = lines(li)
      val st = line.dropWhile(c => c == ' ' || c == '\t')
      val isFence = (st.startsWith("```") || st.startsWith("~~~"))
      if (!inFence && isFence) { inFence = true; fenceCh = st.charAt(0) }
      else if (inFence && isFence && st.charAt(0) == fenceCh) inFence = false
      else if (inFence) out += line
      else {
        var l = stripBlockquote(line)
        if (!isThematicBreak(l)) {
          l = stripHeading(l)
          l = stripListMarker(l)
          out += inlineMd(l)
        }
      }
      li += 1
    }
    out.mkString("\n")
  }

  private def stripBlockquote(line: String): String = {
    var i = 0
    val n = line.length
    var changed = true
    while (changed) {
      changed = false
      var j = i
      var sp = 0
      while (j < n && line.charAt(j) == ' ' && sp < 3) { j += 1; sp += 1 }
      if (j < n && line.charAt(j) == '>') {
        j += 1
        if (j < n && line.charAt(j) == ' ') j += 1
        i = j
        changed = true
      }
    }
    if (i == 0) line else line.substring(i)
  }

  private def stripHeading(line: String): String = {
    var i = 0
    val n = line.length
    while (i < n && i < 6 && line.charAt(i) == '#') i += 1
    if (i > 0 && i < n && line.charAt(i) == ' ') line.substring(i + 1)
    else if (i > 0 && i == n) ""
    else line
  }

  private def isThematicBreak(line: String): Boolean = {
    val t = line.trim
    if (t.length < 3) return false
    val c = t.charAt(0)
    if (c != '-' && c != '*' && c != '_') return false
    var marks = 0
    var i = 0
    while (i < t.length) {
      val ch = t.charAt(i)
      if (ch == c) marks += 1
      else if (ch != ' ') return false
      i += 1
    }
    marks >= 3
  }

  private def stripListMarker(line: String): String = {
    var i = 0
    val n = line.length
    while (i < n && line.charAt(i) == ' ') i += 1
    if (i < n) {
      val c = line.charAt(i)
      if ((c == '-' || c == '*' || c == '+') && i + 1 < n && line.charAt(i + 1) == ' ')
        return line.substring(i + 2)
      var j = i
      while (j < n && line.charAt(j) >= '0' && line.charAt(j) <= '9') j += 1
      if (j > i && j + 1 < n && (line.charAt(j) == '.' || line.charAt(j) == ')') &&
          line.charAt(j + 1) == ' ')
        return line.substring(j + 2)
    }
    line
  }

  private def inlineMd(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '!' && i + 1 < n && s.charAt(i + 1) == '[') {
        val k = s.indexOf(']', i + 2)
        if (k > 0 && k + 1 < n && s.charAt(k + 1) == '(') {
          val e = s.indexOf(')', k + 2)
          if (e > 0) { sb.append(s, i + 2, k); i = e + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else if (c == '[') {
        val k = s.indexOf(']', i + 1)
        if (k > 0 && k + 1 < n && s.charAt(k + 1) == '(') {
          val e = s.indexOf(')', k + 2)
          if (e > 0) { sb.append(s, i + 1, k); i = e + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else if (c == '`' || c == '*') i += 1
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------------------------
  // LaTeX

  private val MathEnvs = Set("equation", "equation*", "align", "align*",
    "eqnarray", "eqnarray*", "displaymath", "gather", "gather*", "math",
    "multline", "multline*")

  private val DropArgCmds = Set("cite", "citep", "citet", "ref", "eqref",
    "pageref", "label", "usepackage", "documentclass", "input", "include",
    "includegraphics", "bibliography", "bibliographystyle", "vspace",
    "hspace", "newcommand", "renewcommand", "setlength", "pagestyle",
    "thispagestyle")

  /** LaTeX → text ("detex"). Rules: `%` comments drop to EOL; `$…$`,
    * `$$…$$`, `\(...\)`, `\[...\]` and math environments drop whole;
    * `verbatim` keeps content; other `\begin/\end` markers drop with
    * content flowing; [[DropArgCmds]] drop with ALL their `[..]{..}`
    * args; every other `\command` drops its name + `[..]` options and
    * lets brace groups flow (so `\textbf{x}` → x and `\section{T}` → T
    * without a command whitelist); `\\` → newline, `~` → space,
    * `\%&_$#{}` escapes → the literal; `\'\`\"\^\~` accents compose the
    * common Latin letters. Braces are transparent. Unterminated
    * constructs swallow to EOF — never throws.
    */
  def latexText(tex: String): String = {
    if (tex == null) return null
    val n = tex.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = tex.charAt(i)
      if (c == '%') {
        while (i < n && tex.charAt(i) != '\n') i += 1
      } else if (c == '$') {
        if (i + 1 < n && tex.charAt(i + 1) == '$') {
          val e = tex.indexOf("$$", i + 2)
          i = if (e < 0) n else e + 2
        } else {
          val e = tex.indexOf('$', i + 1)
          i = if (e < 0) n else e + 1
        }
      } else if (c == '{' || c == '}') i += 1
      else if (c == '~') { sb.append(' '); i += 1 }
      else if (c == '\\') {
        if (i + 1 >= n) i += 1
        else {
          val d = tex.charAt(i + 1)
          if (d == '\\') { sb.append('\n'); i += 2 }
          else if (d == '%' || d == '&' || d == '_' || d == '$' || d == '#' ||
                   d == '{' || d == '}') { sb.append(d); i += 2 }
          else if (d == '[') {
            val e = tex.indexOf("\\]", i + 2)
            i = if (e < 0) n else e + 2
          } else if (d == '(') {
            val e = tex.indexOf("\\)", i + 2)
            i = if (e < 0) n else e + 2
          } else if ((d == '\'' || d == '`' || d == '"' || d == '^' || d == '~') &&
                     i + 2 < n) {
            // accent: \'e or \'{e}
            var j = i + 2
            var braced = false
            if (tex.charAt(j) == '{' && j + 1 < n) { braced = true; j += 1 }
            val letter = if (j < n) tex.charAt(j) else ' '
            val composed = accent(d, letter)
            sb.append(composed)
            j += 1
            if (braced && j < n && tex.charAt(j) == '}') j += 1
            i = j
          } else if ((d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z')) {
            var j = i + 1
            while (j < n && ((tex.charAt(j) >= 'a' && tex.charAt(j) <= 'z') ||
                             (tex.charAt(j) >= 'A' && tex.charAt(j) <= 'Z'))) j += 1
            val name = tex.substring(i + 1, j)
            i = j
            if (name == "begin" || name == "end") {
              val (env, after) = braceGroup(tex, i)
              i = after
              if (name == "begin" && MathEnvs.contains(env)) {
                val closer = "\\end{" + env + "}"
                val e = tex.indexOf(closer, i)
                i = if (e < 0) n else e + closer.length
              } else if (name == "begin" && env == "verbatim") {
                val closer = "\\end{verbatim}"
                val e = tex.indexOf(closer, i)
                val stop = if (e < 0) n else e
                sb.append(tex, i, stop)
                i = if (e < 0) n else e + closer.length
              }
            } else if (DropArgCmds.contains(name)) {
              i = skipArgs(tex, i, all = true)
            } else if (name == "item") {
              i = skipOptArgs(tex, i)
            } else {
              i = skipOptArgs(tex, i)
            }
          } else { sb.append(d); i += 2 }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def accent(mark: Char, letter: Char): Char = (mark, letter) match {
    case ('\'', 'a') => 'á'; case ('\'', 'e') => 'é'; case ('\'', 'i') => 'í'
    case ('\'', 'o') => 'ó'; case ('\'', 'u') => 'ú'
    case ('`', 'a') => 'à'; case ('`', 'e') => 'è'; case ('`', 'u') => 'ù'
    case ('"', 'a') => 'ä'; case ('"', 'e') => 'ë'; case ('"', 'i') => 'ï'
    case ('"', 'o') => 'ö'; case ('"', 'u') => 'ü'
    case ('^', 'a') => 'â'; case ('^', 'e') => 'ê'; case ('^', 'o') => 'ô'
    case ('~', 'n') => 'ñ'; case ('~', 'a') => 'ã'; case ('~', 'o') => 'õ'
    case (_, l) => l
  }

  /** `{env}` at `i` (skipping nothing else): returns (content, index
    * after the closing brace); missing group → ("", i).
    */
  private def braceGroup(tex: String, i: Int): (String, Int) = {
    if (i >= tex.length || tex.charAt(i) != '{') return ("", i)
    val e = tex.indexOf('}', i + 1)
    if (e < 0) (tex.substring(i + 1), tex.length)
    else (tex.substring(i + 1, e), e + 1)
  }

  /** Skip consecutive `[..]` (always) and `{..}` (when `all`) groups,
    * brace groups balanced.
    */
  private def skipArgs(tex: String, start: Int, all: Boolean): Int = {
    var i = start
    val n = tex.length
    var go = true
    while (go && i < n) {
      tex.charAt(i) match {
        case '[' =>
          val e = tex.indexOf(']', i + 1)
          i = if (e < 0) n else e + 1
        case '{' if all =>
          var depth = 1
          var j = i + 1
          while (j < n && depth > 0) {
            val c = tex.charAt(j)
            if (c == '{') depth += 1 else if (c == '}') depth -= 1
            j += 1
          }
          i = j
        case _ => go = false
      }
    }
    i
  }

  private def skipOptArgs(tex: String, start: Int): Int =
    skipArgs(tex, start, all = false)

  // ------------------------------------------------------------------
  // sentence segmentation

  /** Words whose trailing period is an abbreviation, not a sentence
    * end (single letters — initials and the e.g./i.e. tails — are
    * guarded separately).
    */
  private val Abbrevs = Set("mr", "mrs", "ms", "dr", "prof", "st", "no",
    "vs", "etc", "fig", "al", "jr", "sr")

  /** Deterministic sentence segmentation — the sequence-packing and
    * per-sentence-dedup precursor. A run of `.!?` ends a sentence iff
    * it is followed by whitespace + an uppercase letter or digit (or
    * end of text), and — for a single `.` — the preceding word is not
    * a known abbreviation or single letter (initials, "e.g."). The
    * lowercase-following rule alone silently guards most abbreviation
    * traps ("e.g. a test" never splits). Sentences are trimmed;
    * empties dropped. One pass, never throws; null → null.
    */
  def sentenceSplit(text: String): Seq[String] = {
    if (text == null) return null
    val out = Seq.newBuilder[String]
    val n = text.length
    var start = 0
    var i = 0
    def emit(endEx: Int): Unit = {
      val s = text.substring(start, endEx).trim
      if (s.nonEmpty) out += s
    }
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        var j = i + 1
        while (j < n && (text.charAt(j) == '.' || text.charAt(j) == '!' ||
                         text.charAt(j) == '?')) j += 1
        var k = j
        while (k < n && Character.isWhitespace(text.charAt(k))) k += 1
        val boundary = k >= n ||
          (k > j && (Character.isUpperCase(text.charAt(k)) ||
                     (text.charAt(k) >= '0' && text.charAt(k) <= '9')))
        val abbrev = c == '.' && j - i == 1 && isAbbrevBefore(text, i)
        if (boundary && !abbrev) { emit(j); start = k; i = k }
        else i = j
      } else i += 1
    }
    if (start < n) emit(n)
    out.result()
  }

  private def isAbbrevBefore(text: String, dot: Int): Boolean = {
    var b = dot
    while (b > 0 && Character.isLetter(text.charAt(b - 1))) b -= 1
    val len = dot - b
    if (len == 0) return false
    if (len == 1) return true // initials, e.g./i.e. tails
    Abbrevs.contains(CodeCodec.asciiLower(text.substring(b, dot)))
  }
}
