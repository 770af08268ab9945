package graft.sources

/** MediaWiki wikitext → plain text, plus dump-XML page framing — the
  * single biggest corpus-coverage gap flagged in round 12: Wikipedia
  * dumps sit in essentially every pretraining mix, and without a
  * wikitext branch a Wikipedia shard flows through as raw markup,
  * polluting token statistics and dedup keys. Same posture as the
  * Markdown/LaTeX extractors in [[MarkupCodec]]: a deterministic
  * single-pass scanner — no regex, no recursion on input-controlled
  * depth, never throws — with the subset documented per rule so a SQL
  * oracle replays expected output closed-form. (The reference routes
  * whole files by extension, `app.py:142-210`; it has no wiki stage —
  * this is corpus-prep generalization like the crawl layer.)
  *
  * Extraction rules (the WikiExtractor-family consensus):
  *   - Templates `{{…}}` drop whole, nesting counted (`{{{…}}}` params
  *     fold into the same depth count).
  *   - Tables `{| … |}` drop whole including their lines; a line-start
  *     `{|` nests. The closing `|}`'s line is consumed entirely.
  *   - Comments `<!-- … -->` drop.
  *   - `<nowiki>` keeps its content verbatim; `<ref>…</ref>` (and
  *     self-closing `<ref …/>`) drops with content; any other
  *     `<tag …>`/`</tag>` marker drops, its content flows.
  *   - Internal links: `[[target|text]]` → text (last top-level pipe
  *     wins, as image-caption syntax dictates), `[[target]]` → target;
  *     `File:`/`Image:`/`Category:` namespaces (any case) drop whole.
  *   - External links: `[scheme://url label]` → label,
  *     `[scheme://url]` → nothing (scheme ∈ http/https/ftp).
  *   - Quote runs: `''`/`'''`/`'''''` (any run of ≥ 2 apostrophes)
  *     drop; a single apostrophe is prose.
  *   - Line-start markers: `= Heading =` loses its `=` fences (both
  *     ends), `*`/`#`/`;`/`:` list/indent runs strip (plus one space),
  *     `----` horizontal rules drop their line.
  *   - Entities: the XML five plus nbsp/ndash/mdash and decimal
  *     `&#NNN;` decode; unknown entities stay literal.
  *
  * Out of subset (documented): template EXPANSION (parameters,
  * parser functions — extraction drops templates, it does not render
  * them), wiki-table cell content recovery, `<math>` rendering,
  * language-variant conversion markup.
  */
object WikiCodec {

  private val DropLinkPrefixes = Set("file", "image", "category")

  private val WikiEntities: Array[(String, Char)] = Array(
    "&amp;" -> '&', "&lt;" -> '<', "&gt;" -> '>', "&quot;" -> '"',
    "&apos;" -> '\'', "&nbsp;" -> ' ', "&ndash;" -> '–', "&mdash;" -> '—')

  private val XmlEntities: Array[(String, Char)] = Array(
    "&amp;" -> '&', "&lt;" -> '<', "&gt;" -> '>', "&quot;" -> '"', "&apos;" -> '\'')

  /** Wikitext → plain text. Null-safe; never throws; one pass. */
  def wikitextText(wt: String): String = {
    if (wt == null) return null
    val n = wt.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var atLineStart = true
    var lineStartInSb = 0
    var headingLine = false
    var tableDepth = 0

    def endHeading(): Unit = if (headingLine) {
      var e = sb.length()
      while (e > lineStartInSb &&
             (sb.charAt(e - 1) == '=' || sb.charAt(e - 1) == ' ')) e -= 1
      sb.setLength(e)
      headingLine = false
    }

    // returns chars consumed for an entity at i (wt(i) == '&'), appending
    // the decoded char; 0 = not a recognized entity (caller emits '&')
    def entity(): Int = {
      WikiEntities.foreach { case (e, ch) =>
        if (wt.regionMatches(i, e, 0, e.length)) { sb.append(ch); return e.length }
      }
      if (i + 2 < n && wt.charAt(i + 1) == '#') {
        var j = i + 2
        var v = 0
        while (j < n && j < i + 9 && wt.charAt(j) >= '0' && wt.charAt(j) <= '9') {
          v = v * 10 + (wt.charAt(j) - '0'); j += 1
        }
        if (j > i + 2 && j < n && wt.charAt(j) == ';' && v > 0 && v <= 0x10FFFF &&
            !(v >= 0xD800 && v <= 0xDFFF)) {
          sb.appendCodePoint(v); return j + 1 - i
        }
      }
      0
    }

    while (i < n) {
      val c = wt.charAt(i)
      if (tableDepth > 0) {
        // table mode: nothing emits; line-start {| nests, |} closes and
        // eats the rest of its line
        if (atLineStart && c == '{' && i + 1 < n && wt.charAt(i + 1) == '|') {
          tableDepth += 1; i += 2; atLineStart = false
        } else if (atLineStart && c == '|' && i + 1 < n && wt.charAt(i + 1) == '}') {
          tableDepth -= 1; i += 2
          if (tableDepth == 0) { // consume the closer's line, incl. its newline
            while (i < n && wt.charAt(i) != '\n') i += 1
            if (i < n) i += 1
            atLineStart = true
          } else atLineStart = false
        } else { atLineStart = c == '\n'; i += 1 }
      } else if (atLineStart && c == '{' && i + 1 < n && wt.charAt(i + 1) == '|') {
        tableDepth = 1; i += 2; atLineStart = false
      } else if (atLineStart && c == '=') {
        var j = i
        while (j < n && j < i + 6 && wt.charAt(j) == '=') j += 1
        while (j < n && wt.charAt(j) == ' ') j += 1
        headingLine = true
        i = j; atLineStart = false
      } else if (atLineStart && c == '-' && wt.regionMatches(i, "----", 0, 4)) {
        var j = i + 4
        while (j < n && (wt.charAt(j) == '-' || wt.charAt(j) == ' ')) j += 1
        if (j >= n || wt.charAt(j) == '\n') { // whole line is a rule: drop it
          i = if (j < n) j + 1 else n
          lineStartInSb = sb.length()
        } else { sb.append(c); i += 1; atLineStart = false }
      } else if (atLineStart && (c == '*' || c == '#' || c == ';' || c == ':')) {
        var j = i
        while (j < n && (wt.charAt(j) == '*' || wt.charAt(j) == '#' ||
                         wt.charAt(j) == ';' || wt.charAt(j) == ':')) j += 1
        if (j < n && wt.charAt(j) == ' ') j += 1
        i = j; atLineStart = false
      } else if (c == '\n') {
        endHeading()
        sb.append('\n')
        i += 1; atLineStart = true; lineStartInSb = sb.length()
      } else {
        atLineStart = false
        if (c == '{' && i + 1 < n && wt.charAt(i + 1) == '{') {
          // individual brace balance (not pair counting) so `{{{param}}}`
          // and `{{{{nested}} deep}}` close where MediaWiki closes them.
          // An UNTERMINATED `{{` (markup typo — common in real articles)
          // must not swallow the rest of the page: drop just the marker
          // and let the tail flow as prose.
          var balance = 2
          var j = i + 2
          while (j < n && balance > 0) {
            val ch = wt.charAt(j)
            if (ch == '{') balance += 1
            else if (ch == '}') balance -= 1
            j += 1
          }
          i = if (balance == 0) j else i + 2
        } else if (c == '<' && wt.regionMatches(i, "<!--", 0, 4)) {
          val e = wt.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (c == '<' && wt.regionMatches(i, "<nowiki>", 0, 8)) {
          val e = wt.indexOf("</nowiki>", i + 8)
          val stop = if (e < 0) n else e
          sb.append(wt, i + 8, stop)
          i = if (e < 0) n else e + 9
        } else if (c == '<' && wt.regionMatches(i, "<ref", 0, 4) && i + 4 < n &&
                   (wt.charAt(i + 4) == '>' || wt.charAt(i + 4) == ' ' ||
                    wt.charAt(i + 4) == '/')) {
          val gt = wt.indexOf('>', i + 4)
          if (gt < 0) i = n
          else if (wt.charAt(gt - 1) == '/') i = gt + 1 // self-closing
          else {
            val e = wt.indexOf("</ref>", gt + 1)
            i = if (e < 0) n else e + 6
          }
        } else if (c == '<' && i + 1 < n &&
                   (wt.charAt(i + 1) == '/' || Character.isLetter(wt.charAt(i + 1)))) {
          val gt = wt.indexOf('>', i + 1)
          i = if (gt < 0) n else gt + 1 // tag markers drop, content flows
        } else if (c == '[' && i + 1 < n && wt.charAt(i + 1) == '[') {
          // internal link: matching ]] with [[-nesting (image captions)
          var depth = 1
          var j = i + 2
          while (j < n && depth > 0) {
            if (wt.charAt(j) == '[' && j + 1 < n && wt.charAt(j + 1) == '[') { depth += 1; j += 2 }
            else if (wt.charAt(j) == ']' && j + 1 < n && wt.charAt(j + 1) == ']') { depth -= 1; j += 2 }
            else j += 1
          }
          if (depth > 0) i += 2 // unterminated `[[`: drop the marker, tail flows as prose
          else {
          val content = wt.substring(i + 2, math.max(i + 2, math.min(j - 2, n)))
          i = j
          val colon = content.indexOf(':')
          val firstPipe = content.indexOf('|')
          val prefix = if (colon > 0 && (firstPipe < 0 || colon < firstPipe))
            content.substring(0, colon).toLowerCase(java.util.Locale.ROOT) else ""
          if (!DropLinkPrefixes.contains(prefix)) {
            // last TOP-LEVEL pipe wins (nested [[…|…]] pipes don't count)
            var lastPipe = -1
            var d2 = 0
            var k = 0
            while (k < content.length) {
              if (content.charAt(k) == '[' && k + 1 < content.length &&
                  content.charAt(k + 1) == '[') { d2 += 1; k += 2 }
              else if (content.charAt(k) == ']' && k + 1 < content.length &&
                       content.charAt(k + 1) == ']') { d2 -= 1; k += 2 }
              else { if (d2 == 0 && content.charAt(k) == '|') lastPipe = k; k += 1 }
            }
            sb.append(if (lastPipe < 0) content else content.substring(lastPipe + 1))
          }
          }
        } else if (c == '[' && (wt.regionMatches(i + 1, "http://", 0, 7) ||
                                wt.regionMatches(i + 1, "https://", 0, 8) ||
                                wt.regionMatches(i + 1, "ftp://", 0, 6))) {
          val e = wt.indexOf(']', i + 1)
          val stop = if (e < 0) n else e
          val sp = wt.indexOf(' ', i + 1)
          if (sp > 0 && sp < stop) sb.append(wt, sp + 1, stop)
          i = if (e < 0) n else e + 1
        } else if (c == '\'') {
          var j = i
          while (j < n && wt.charAt(j) == '\'') j += 1
          if (j - i >= 2) i = j // quote markup drops
          else { sb.append(c); i += 1 }
        } else if (c == '&') {
          val consumed = entity()
          if (consumed == 0) { sb.append(c); i += 1 } else i += consumed
        } else { sb.append(c); i += 1 }
      }
    }
    endHeading()
    sb.toString
  }

  // ------------------------------------------------------------------
  // MediaWiki dump-XML page framing
  // ------------------------------------------------------------------

  /** One `<page>` of a dump: title, namespace, page id, RAW wikitext
    * (entity-unescaped; extraction is the caller's next step).
    */
  final case class WikiPage(title: String, ns: Int, pageId: Long, text: String)

  def isWikiDump(s: String): Boolean = {
    if (s == null) return false
    val probe = s.substring(0, math.min(s.length, 512))
    probe.contains("<mediawiki")
  }

  /** One document section: heading level (0 = preamble before any
    * heading), RAW title wikitext, RAW body wikitext (extraction is
    * the caller's next step — [[wikitextText]] composes).
    */
  final case class WikiSection(level: Int, title: String, body: String)

  /** Split raw wikitext into sections at line-start `=`-fenced heading
    * lines — the chunk grain RAG-style and long-context training
    * pipelines feed (a Wikipedia article is a bundle of sections, not
    * one blob). Line grain, total; trailing blank lines drop from each
    * body; a non-empty preamble becomes a level-0 section. Subset
    * (documented): the splitter does not track table/template state
    * across lines, so a heading-shaped line inside a table splits —
    * headings inside tables are markup abuse and survive extraction
    * anyway.
    */
  def sections(wt: String): Seq[WikiSection] = {
    if (wt == null) return null
    val lines = wt.split("\n", -1)
    val out = Seq.newBuilder[WikiSection]
    var level = 0
    var title = ""
    val body = scala.collection.mutable.ArrayBuffer.empty[String]
    def flush(): Unit = {
      while (body.nonEmpty && body.last.isEmpty) body.remove(body.length - 1)
      if (level > 0 || body.nonEmpty) out += WikiSection(level, title, body.mkString("\n"))
      body.clear()
    }
    lines.foreach { line =>
      if (line.nonEmpty && line.charAt(0) == '=') {
        var n = 0
        while (n < line.length && n < 6 && line.charAt(n) == '=') n += 1
        flush()
        level = n
        var end = line.length
        while (end > n && (line.charAt(end - 1) == '=' || line.charAt(end - 1) == ' ')) end -= 1
        title = line.substring(n, end).trim
      } else body += line
    }
    flush()
    out.result()
  }

  /** MediaWiki redirect page: leading `#REDIRECT` (any case, optional
    * leading whitespace) — the dedup-relevant page class a corpus
    * pipeline excludes before token statistics (a large wiki is ~half
    * redirects).
    */
  def isRedirect(wt: String): Boolean = {
    if (wt == null) return false
    var i = 0
    while (i < wt.length && Character.isWhitespace(wt.charAt(i))) i += 1
    wt.regionMatches(true, i, "#REDIRECT", 0, 9)
  }

  /** XML entity unescape for dump payloads (the five XML entities plus
    * decimal/hex character references); lenient, one pass.
    */
  private[sources] def xmlUnescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val hit = XmlEntities.find { case (e, _) => s.regionMatches(i, e, 0, e.length) }
        hit match {
          case Some((e, ch)) => sb.append(ch); i += e.length
          case None =>
            if (i + 2 < n && s.charAt(i + 1) == '#') {
              val hex = s.charAt(i + 2) == 'x' || s.charAt(i + 2) == 'X'
              var j = i + (if (hex) 3 else 2)
              var v = 0
              var digits = 0
              while (j < n && digits < 7 && {
                val d = Character.digit(s.charAt(j), if (hex) 16 else 10)
                if (d >= 0) { v = v * (if (hex) 16 else 10) + d; digits += 1; true } else false
              }) j += 1
              if (digits > 0 && j < n && s.charAt(j) == ';' && v > 0 && v <= 0x10FFFF &&
                  !(v >= 0xD800 && v <= 0xDFFF)) {
                sb.appendCodePoint(v); i = j + 1
              } else { sb.append('&'); i += 1 }
            } else { sb.append('&'); i += 1 }
        }
      }
    }
    sb.toString
  }

  /** Body of the first `<tag …>` … `</tag>` after `from` inside
    * `[from, until)`; null when absent or malformed.
    */
  private def tagBody(xml: String, tag: String, from: Int, until: Int): String = {
    val open = xml.indexOf("<" + tag, from)
    if (open < 0 || open >= until) return null
    val gt = xml.indexOf('>', open)
    if (gt < 0 || gt >= until) return null
    if (xml.charAt(gt - 1) == '/') return "" // self-closing (empty <text/>)
    val close = xml.indexOf("</" + tag + ">", gt + 1)
    if (close < 0 || close > until) return null
    xml.substring(gt + 1, close)
  }

  /** Page-grain framing of a dump shard: every well-formed `<page>`
    * yields (title, ns, page id, unescaped wikitext); malformed pages
    * skip (never throws). Titles and text are XML-entity-unescaped;
    * `ns` defaults 0, missing ids −1 — total on hostile input.
    */
  def dumpPages(xml: String): Seq[WikiPage] = {
    if (xml == null) return null
    val out = Seq.newBuilder[WikiPage]
    var at = 0
    var go = true
    while (go) {
      val open = xml.indexOf("<page>", at)
      if (open < 0) go = false
      else {
        val close = xml.indexOf("</page>", open)
        val until = if (close < 0) xml.length else close
        val title = tagBody(xml, "title", open, until)
        val nsStr = tagBody(xml, "ns", open, until)
        // the page-level <id> precedes the first <revision>; bounding the
        // search there keeps a missing page id from mis-reporting the
        // revision's <id> as page_id
        val revAt = xml.indexOf("<revision", open)
        val idStr = tagBody(xml, "id", open,
          if (revAt >= 0 && revAt < until) revAt else until)
        val text = tagBody(xml, "text", open, until)
        val ns = try { if (nsStr == null) 0 else nsStr.trim.toInt }
          catch { case _: NumberFormatException => 0 }
        val pageId = try { if (idStr == null) -1L else idStr.trim.toLong }
          catch { case _: NumberFormatException => -1L }
        if (title != null && text != null)
          out += WikiPage(xmlUnescape(title), ns, pageId, xmlUnescape(text))
        at = if (close < 0) xml.length else close + 7
        if (close < 0) go = false
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // deterministic fixtures
  // ------------------------------------------------------------------

  /** Closed-form wikitext fixture exercising every extraction rule —
    * headings, bold/italic, piped + plain + namespace links, nested
    * templates, refs (spanning + self-closing), comments, tables,
    * lists, external links, rules, nowiki, entities. Extracted text
    * is [[expectedWikiText]], a pure function of the seed.
    */
  def synthWikitext(seed: Long): String =
    s"== Heading $seed ==\n" +
      s"Intro '''bold''' and ''italic'' with [[Target ${seed % 7}|link text]] and [[Plain ${seed % 5}]].\n" +
      s"{{Infobox thing|name=N $seed|year={{CURRENTYEAR}}}}\n" +
      s"* item one ${seed % 5}\n" +
      s"# item two\n" +
      s"A claim<ref name=\"r$seed\">Cited work $seed</ref> stays<ref name=\"r$seed\" />.\n" +
      s"<!-- hidden $seed -->Visible &amp; kept &#233;.\n" +
      "{| class=\"wikitable\"\n|-\n! h1 !! h2\n|-\n" + s"| cell $seed || c2\n|}\n" +
      s"External [https://example.org/p${seed % 7} site label] and [https://example.org/bare].\n" +
      s"[[File:Pic $seed.png|thumb|caption here]]\n" +
      s"[[Category:Things ${seed % 3}]]\n" +
      "----\n" +
      s"<nowiki>kept ''raw'' $seed</nowiki> tail <span class=\"x\">span text</span> &ndash; done ${seed % 11}.\n"

  /** The text [[wikitextText]] extracts from [[synthWikitext]]`(seed)`
    * — the closed form the oracle replays in SQL.
    */
  def expectedWikiText(seed: Long): String =
    s"Heading $seed\n" +
      s"Intro bold and italic with link text and Plain ${seed % 5}.\n" +
      "\n" + // the template-only line
      s"item one ${seed % 5}\n" +
      s"item two\n" +
      s"A claim stays.\n" +
      s"Visible & kept é.\n" +
      s"External site label and .\n" +
      "\n" + // the File: line
      "\n" + // the Category: line
      s"kept ''raw'' $seed tail span text – done ${seed % 11}.\n"

  /** Deterministic MediaWiki dump-XML shard: `nPages` pages, page `k`
    * titled `Article <seed+k> &`-escaped, ns alternating 0/0/14
    * (14 = Category — the grain a dispatcher filters on), body =
    * [[synthWikitext]]`(seed + k)` XML-escaped — except every FOURTH
    * page (`k % 4 == 3`), which is a `#REDIRECT [[Article <seed> &
    * co]]` page (the class a corpus pipeline must detect and drop).
    * Page ids are `seed*100 + k`.
    */
  def synthWikiDump(seed: Long, nPages: Int): String = {
    val sb = new java.lang.StringBuilder()
    sb.append("<mediawiki xmlns=\"http://www.mediawiki.org/xml/export-0.11/\" version=\"0.11\">\n")
    sb.append("<siteinfo><sitename>Graftipedia</sitename></siteinfo>\n")
    def esc(s: String): String = {
      val b = new java.lang.StringBuilder(s.length)
      s.foreach {
        case '&' => b.append("&amp;")
        case '<' => b.append("&lt;")
        case '>' => b.append("&gt;")
        case c => b.append(c)
      }
      b.toString
    }
    (0 until math.max(1, nPages)).foreach { k =>
      val ns = if (k % 3 == 2) 14 else 0
      sb.append("  <page>\n")
      sb.append(s"    <title>Article ${seed + k} &amp; co</title>\n")
      sb.append(s"    <ns>$ns</ns>\n")
      sb.append(s"    <id>${seed * 100 + k}</id>\n")
      sb.append("    <revision>\n")
      sb.append(s"      <id>${seed * 1000 + k}</id>\n")
      sb.append("      <text bytes=\"0\" xml:space=\"preserve\">")
      sb.append(esc(if (k % 4 == 3) s"#REDIRECT [[Article $seed & co]]\n"
                    else synthWikitext(seed + k)))
      sb.append("</text>\n")
      sb.append("    </revision>\n")
      sb.append("  </page>\n")
    }
    sb.append("</mediawiki>\n")
    sb.toString
  }
}
