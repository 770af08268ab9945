package graft.sources

/** CSV dialect sniffing — the ingest front door for the delimited-text
  * family (the third leg next to `format_detect` and `code_lang`):
  * detect the delimiter, quoting and header row of an unlabeled text
  * shard BEFORE handing it to a parser, the way csv.Sniffer-style
  * tools do, but with a fully deterministic, documented rule set so a
  * SQL oracle can pin every verdict. One bounded pass over at most the
  * first 16 lines; never throws.
  *
  * Rules:
  *   - candidate delimiters are `,` `;` TAB `|`, scored by quote-aware
  *     field count: a candidate scores its per-line field count iff
  *     that count is IDENTICAL on every sampled line and > 1; highest
  *     score wins, ties break in candidate order. No winner → no
  *     delimiter ("" / 1 column).
  *   - quote is `"` iff any sampled field of the winning dialect
  *     starts with `"`.
  *   - header is true iff there are ≥ 2 lines, NO first-row field is
  *     numeric, and ≥ 1 second-row field is numeric (the classic
  *     type-contrast heuristic; numeric = optional sign, digits,
  *     optional decimal part).
  */
object CsvSniff {

  val Candidates: Array[Char] = Array(',', ';', '\t', '|')

  final case class Dialect(delim: String, quote: String, header: Boolean, nCols: Int)

  def sniff(text: String): Dialect = {
    if (text == null || text.isEmpty) return Dialect("", "", header = false, 0)
    val raw = text.split("\n", -1)
    val end = if (raw.length > 1 && raw.last.isEmpty) raw.length - 1 else raw.length
    val lines = raw.view.slice(0, math.min(end, 16)).toArray
    if (lines.isEmpty) return Dialect("", "", header = false, 0)

    var bestDelim = ' '
    var bestScore = 0
    var k = 0
    while (k < Candidates.length) {
      val c = Candidates(k)
      val first = splitQuoted(lines(0), c).length
      var consistent = first > 1
      var i = 1
      while (i < lines.length && consistent) {
        if (splitQuoted(lines(i), c).length != first) consistent = false
        i += 1
      }
      if (consistent && first > bestScore) { bestScore = first; bestDelim = c }
      k += 1
    }
    if (bestScore == 0) return Dialect("", "", header = false, 1)
    val rows = lines.map(splitQuoted(_, bestDelim))
    val quoted = rows.exists(_.exists(f => f.nonEmpty && f.charAt(0) == '"'))
    val header = rows.length >= 2 &&
      !rows(0).exists(isNumeric) && rows(1).exists(isNumeric)
    Dialect(String.valueOf(bestDelim), if (quoted) "\"" else "", header, bestScore)
  }

  /** Split one line on `delim`, honoring `"` quoting with `""`
    * doubling; fields keep their quote characters (the sniffer only
    * needs shape, not unescaped values). Total on unbalanced quotes.
    */
  def splitQuoted(line: String, delim: Char): Array[String] = {
    val out = Array.newBuilder[String]
    val n = line.length
    val sb = new java.lang.StringBuilder
    var i = 0
    var inQ = false
    while (i < n) {
      val c = line.charAt(i)
      if (inQ) {
        sb.append(c)
        if (c == '"') {
          if (i + 1 < n && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQ = false
        }
        i += 1
      } else if (c == '"') { sb.append(c); inQ = true; i += 1 }
      else if (c == delim) { out += sb.toString; sb.setLength(0); i += 1 }
      else { sb.append(c); i += 1 }
    }
    out += sb.toString
    out.result()
  }

  /** Optional sign, ≥1 digit, optional `.`+digits — nothing else. */
  def isNumeric(s: String): Boolean = {
    val n = s.length
    if (n == 0) return false
    var i = if (s.charAt(0) == '-' || s.charAt(0) == '+') 1 else 0
    if (i >= n) return false
    var digits = 0
    while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') { i += 1; digits += 1 }
    if (digits == 0) return false
    if (i == n) return true
    if (s.charAt(i) != '.') return false
    i += 1
    var frac = 0
    while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') { i += 1; frac += 1 }
    frac > 0 && i == n
  }
}
