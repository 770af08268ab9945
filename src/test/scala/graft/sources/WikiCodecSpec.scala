package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Wikitext extraction rules, MediaWiki dump framing, and the
  * never-throws totality contract. Pure codec — no SparkSession.
  */
class WikiCodecSpec extends AnyFunSuite {
  import WikiCodec._

  test("fixture round trip: extracted text matches the closed form across seeds") {
    for (seed <- Seq(0L, 1L, 7L, 36L, 12345L, 999999937L))
      assert(wikitextText(synthWikitext(seed)) === expectedWikiText(seed), s"seed $seed")
  }

  test("templates: nesting, params, unterminated keeps the tail as prose") {
    assert(wikitextText("a {{t|x={{inner|y}}}} b") === "a  b")
    assert(wikitextText("a {{{param|default}}} b") === "a  b")
    // an unterminated {{ (markup typo, common in real articles) must
    // not discard the remaining prose — only the marker drops
    assert(wikitextText("a {{never closed") === "a never closed")
  }

  test("tables drop whole, nest, and eat the closer's line; inline braces survive") {
    assert(wikitextText("before\n{| class=x\n|-\n| cell\n|}\nafter") === "before\nafter")
    assert(wikitextText("x\n{| outer\n{| inner\n| c\n|}\n| still outer\n|}\ny") === "x\ny")
    assert(wikitextText("x\n{| never closed\n| cell") === "x\n")
    assert(wikitextText("f(x) = {x | x > 0}") === "f(x) = {x | x > 0}")
  }

  test("links: pipes, nested captions, namespaces, anchors") {
    assert(wikitextText("[[Page]]") === "Page")
    assert(wikitextText("[[Page|shown]]") === "shown")
    assert(wikitextText("[[Help:Contents]]") === "Help:Contents")
    assert(wikitextText("[[File:X.png|thumb|cap]]") === "")
    assert(wikitextText("[[image:X.png|cap]]") === "")
    assert(wikitextText("[[Category:Y]]") === "")
    // nested link inside a caption: last TOP-LEVEL pipe wins; the
    // nested link's own markup is emitted raw (re-rendering nested
    // caption markup is out of subset, documented)
    assert(wikitextText("[[a|b [[c|d]] e]]") === "b [[c|d]] e")
    // unterminated [[ drops the marker, tail flows as prose
    assert(wikitextText("[[unterminated") === "unterminated")
  }

  test("external links and quote runs") {
    assert(wikitextText("see [https://x.org/p the label] end") === "see the label end")
    assert(wikitextText("see [https://x.org/p] end") === "see  end")
    assert(wikitextText("see [ftp://x.org/p f] end") === "see f end")
    assert(wikitextText("[just brackets]") === "[just brackets]")
    assert(wikitextText("'''bold''' ''it'' '''''both''''' don't") === "bold it both don't")
  }

  test("line-start markers: headings, lists, rules") {
    assert(wikitextText("== T ==\nbody") === "T\nbody")
    assert(wikitextText("=== Deep ===") === "Deep")
    assert(wikitextText("= T") === "T") // unclosed heading keeps content
    assert(wikitextText("* a\n** b\n# c\n; term\n: def") === "a\nb\nc\nterm\ndef")
    assert(wikitextText("----\nx") === "x")
    assert(wikitextText("---- not a rule\nx") === "---- not a rule\nx")
    assert(wikitextText("a = b\nx") === "a = b\nx") // '=' mid-line is prose
  }

  test("refs, comments, nowiki, generic tags, entities") {
    assert(wikitextText("a<ref>cite</ref>b") === "ab")
    assert(wikitextText("a<ref name=\"x\" />b") === "ab")
    assert(wikitextText("a<ref>never closed") === "a")
    assert(wikitextText("a<!-- c -->b") === "ab")
    assert(wikitextText("a<!-- never closed") === "a")
    assert(wikitextText("<nowiki>''kept''</nowiki>") === "''kept''")
    assert(wikitextText("<span class=x>in</span>") === "in")
    assert(wikitextText("&amp; &lt; &#65; &#x; &bogus; 1 &lt 2") === "& < A &#x; &bogus; 1 &lt 2")
  }

  test("dump framing: titles unescaped, ns, page ids, redirects, extraction composes") {
    val xml = synthWikiDump(9L, 4)
    assert(isWikiDump(xml))
    val pages = dumpPages(xml)
    assert(pages.length === 4)
    assert(pages.map(_.title) === Seq("Article 9 & co", "Article 10 & co",
      "Article 11 & co", "Article 12 & co"))
    assert(pages.map(_.ns) === Seq(0, 0, 14, 0))
    assert(pages.map(_.pageId) === Seq(900L, 901L, 902L, 903L))
    assert(pages.map(p => isRedirect(p.text)) === Seq(false, false, false, true))
    pages.zipWithIndex.foreach { case (p, k) =>
      if (k == 3) assert(wikitextText(p.text) === "REDIRECT Article 9 & co\n")
      else assert(wikitextText(p.text) === expectedWikiText(9L + k), s"page $k")
    }
    assert(isRedirect("  #redirect [[x]]") && isRedirect("#REDIRECT [[y]]"))
    assert(!isRedirect("body mentions #REDIRECT later")) // leading-only
    assert(!isRedirect("prose first\n#REDIRECT [[x]]"))
    assert(!isRedirect(null))
  }

  test("dump framing: malformed pages skip; self-closed text; not a dump") {
    val xml = "<mediawiki>\n<page><title>Ok</title><ns>0</ns><id>5</id>" +
      "<revision><text>body</text></revision></page>\n" +
      "<page><ns>0</ns><id>6</id></page>\n" + // no title/text: skipped
      "<page><title>Empty</title><ns>bad</ns><text/></page>\n" +
      "</mediawiki>"
    val pages = dumpPages(xml)
    assert(pages.map(_.title) === Seq("Ok", "Empty"))
    assert(pages(1).text === "")
    assert(pages(1).ns === 0) // unparseable ns defaults
    assert(pages(1).pageId === -1L)
    assert(!isWikiDump("<html><body>no</body></html>"))
    // unterminated <text> never closes → the page is malformed → skipped
    assert(dumpPages("<page><title>t</title><text>x").isEmpty)
    // a page MISSING its page-level <id> must not report the
    // revision's <id> as page_id (the search is bounded at <revision>)
    val noPageId = "<mediawiki><page><title>NoId</title><ns>0</ns>" +
      "<revision><id>999</id><text>body</text></revision></page></mediawiki>"
    assert(dumpPages(noPageId).head.pageId === -1L)
    // and with both present, the page-level id wins
    val both = "<mediawiki><page><title>B</title><id>7</id>" +
      "<revision><id>999</id><text>b</text></revision></page></mediawiki>"
    assert(dumpPages(both).head.pageId === 7L)
  }

  test("sections: preamble, nesting, empty bodies, trailing blanks, no headings") {
    val wt = "intro line\n== A ==\na body\n\n=== A.1 ===\nnested\n== B ==\n"
    val s = sections(wt)
    assert(s.map(x => (x.level, x.title)) ===
      Seq((0, ""), (2, "A"), (3, "A.1"), (2, "B")))
    assert(s(0).body === "intro line")
    assert(s(1).body === "a body") // trailing blank line dropped
    assert(s(3).body === "") // empty trailing section still emits
    assert(sections("just prose\ntwo lines") ===
      Seq(WikiSection(0, "", "just prose\ntwo lines")))
    assert(sections("") === Seq.empty)
    assert(sections("== only heading ==") === Seq(WikiSection(2, "only heading", "")))
    assert(sections(null) == null)
    // titles carry markup: extraction composes
    val m = sections("== '''Bold''' [[x|title]] ==\nbody")
    assert(wikitextText(m.head.title) === "Bold title")
  }

  test("totality fuzz: random garbage and every truncation of the fixture never throw") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(300))
      wikitextText(s); dumpPages(s) // must not throw
    }
    val wiki = synthWikitext(77L)
    (0 to wiki.length by 7).foreach(k => wikitextText(wiki.substring(0, k)))
    val dump = synthWikiDump(77L, 3)
    (0 to dump.length by 31).foreach(k => dumpPages(dump.substring(0, k)))
    // markup-dense adversarial strings
    Seq("{{{{{{", "}}}}", "[[[[", "]]]]", "<ref", "<!--", "{|{|{|", "''''''''",
        "&#99999999;", "&#1114112;", "[https://", "== ==", "<nowiki>").foreach { s =>
      wikitextText(s); wikitextText(s + "\n" + s)
    }
    assert(wikitextText(null) == null && dumpPages(null) == null)
  }
}
