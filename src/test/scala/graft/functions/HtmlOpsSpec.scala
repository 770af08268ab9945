package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HTML tokenizer contract: visible-text extraction, title, link
  * collection, entity decoding, subtree skipping — plus never-throws
  * over tag soup. Cross-engine pinning happens in q_html_extract.
  */
class HtmlOpsSpec extends SparkSpec {

  test("text: tags strip, blocks break, entities decode, script/style/comments drop") {
    val html =
      """<html><head><title>My &amp; Title</title>
        |<style>p { color: red }</style>
        |<script>if (a < b) { alert("x&y") }</script>
        |</head><body>
        |<!-- a comment with <p>fake tags</p> -->
        |<h1>Heading</h1>
        |<p>One &lt;two&gt; three&nbsp;&#65;&#x42;</p>
        |<span>inline</span> tail
        |</body></html>""".stripMargin
    val e = HtmlOps.extract(html)
    assert(e.title === "My & Title")
    assert(e.text === "Heading\nOne <two> three AB\ninline tail")
    assert(e.links === Seq.empty)
  }

  test("links: quoted, single-quoted, unquoted, area, attribute-case; order kept") {
    val html =
      """<a href="/one">1</a>
        |<A HREF='/two'>2</A>
        |<a class=x href=/three>3</a>
        |<area shape=rect href="/four">
        |<a name="no-href">skip</a>
        |<a xhref="/not-href">skip</a>""".stripMargin
    assert(HtmlOps.extract(html).links === Seq("/one", "/two", "/three", "/four"))
  }

  test("tag soup is total: unclosed tags, stray brackets, empty, null") {
    val soups = Seq(
      "<p>unclosed", "<title>open forever", "text < not a tag > more",
      "<script>never closed", "<a href=", "<>", "&#xZZ; &unknown; &amp",
      "", "<<<<", "<!---->", "<a href=''>e</a>")
    soups.foreach(s => HtmlOps.extract(s)) // no throw
    assert(HtmlOps.extract(null).text === "")
    assert(HtmlOps.extract("<title>open forever").title === "open forever")
    // bare & with no entity match survives as a literal
    assert(HtmlOps.extract("a &unknown; b").text === "a &unknown; b")
  }

  test("sitemap: urlset locs+lastmods, index recursion flag, soup-total") {
    val urlset =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://a.com/p1</loc><lastmod>2026-01-02</lastmod></url>
        |  <url><loc> https://a.com/p2?x=1&amp;y=2 </loc></url>
        |  <url><lastmod>2026-01-03</lastmod></url>
        |</urlset>""".stripMargin
    val p = SitemapOps.parse(urlset)
    assert(!p.isIndex)
    assert(p.locs === Seq("https://a.com/p1", "https://a.com/p2?x=1&y=2"))
    assert(p.lastmods === Seq("2026-01-02", null))
    val index =
      """<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc></sitemap>
        |<sitemap><loc>https://a.com/s2.xml</loc><lastmod>2026-02-01</lastmod></sitemap>
        |</sitemapindex>""".stripMargin
    val pi = SitemapOps.parse(index)
    assert(pi.isIndex && pi.locs === Seq("https://a.com/s1.xml", "https://a.com/s2.xml"))
    assert(pi.lastmods === Seq(null, "2026-02-01"))
    Seq("", "<urlset>", "<url><loc>", "not xml", null).foreach(SitemapOps.parse) // total
    assert(SitemapOps.parse("<urlset><url></url></urlset>").locs === Seq.empty)
  }

  test("charset resolution: BOM > meta charset > strict UTF-8 > Latin-1; total") {
    import java.nio.charset.StandardCharsets._
    // BOM wins even over a contradicting meta
    val bomDoc = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "<meta charset=iso-8859-1>é".getBytes(UTF_8)
    assert(HtmlOps.decodeBytes(bomDoc) === "<meta charset=iso-8859-1>é")
    // meta charset drives the decode of non-UTF-8 bytes
    val latinDoc = "<meta charset=\"iso-8859-1\"><p>café".getBytes(ISO_8859_1)
    assert(HtmlOps.decodeBytes(latinDoc) === "<meta charset=\"iso-8859-1\"><p>café")
    val httpEquiv = ("<meta http-equiv=content-type content=\"text/html; charset=iso-8859-1\">" +
      "café").getBytes(ISO_8859_1)
    assert(HtmlOps.decodeBytes(httpEquiv).endsWith("café"))
    // no meta: valid UTF-8 decodes as UTF-8 …
    assert(HtmlOps.decodeBytes("中文 café".getBytes(UTF_8)) === "中文 café")
    // … and invalid UTF-8 falls back to Latin-1 (total, never throws)
    val invalid = Array[Byte](0x3c, 0x70, 0x3e, 0xE9.toByte, 0xFF.toByte)
    assert(HtmlOps.decodeBytes(invalid) === "<p>éÿ")
    // unknown charset label falls through to the UTF-8/Latin-1 ladder
    assert(HtmlOps.decodeBytes("<meta charset=bogus-enc>ok".getBytes(UTF_8)).endsWith("ok"))
    assert(HtmlOps.decodeBytes(null) === null)
    assert(HtmlOps.decodeBytes(Array.emptyByteArray) === "")
    // UTF-16 BOMs
    assert(HtmlOps.decodeBytes(
      Array[Byte](0xFE.toByte, 0xFF.toByte, 0, 'h', 0, 'i')) === "hi")
    assert(HtmlOps.decodeBytes(
      Array[Byte](0xFF.toByte, 0xFE.toByte, 'h', 0, 'i', 0)) === "hi")
  }

  test("struct expression parses once and null-propagates") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq("<title>T</title><a href='/x'>l</a>body")
      .toDF("h")
      .selectExpr("html_extract(h) AS e")
      .select(col("e.title"), col("e.text"), size(col("e.links")).as("n"))
      .head
    assert(r.getString(0) === "T")
    assert(r.getString(1) === "lbody")
    assert(r.getInt(2) === 1)
    val nul = Seq((1, null: String)).toDF("i", "h")
      .select(HtmlOps.htmlExtract(col("h"))).head
    assert(nul.isNullAt(0))
  }

  test("htmlMeta: robots directives, canonical precedence, comments don't leak") {
    val m0 = HtmlOps.htmlMeta(
      "<head><meta name=\"robots\" content=\"noindex, nofollow\">" +
      "<link rel=\"canonical\" href=\"https://ex.com/p/1\">" +
      "<link rel=\"canonical\" href=\"https://ex.com/p/2\"></head>")
    assert(m0 === HtmlOps.Meta(noindex = true, nofollow = true, "https://ex.com/p/1"))
    assert(HtmlOps.htmlMeta("<meta content='NOFOLLOW' name='ROBOTS'>") ===
      HtmlOps.Meta(noindex = false, nofollow = true, null)) // attr order + case
    assert(HtmlOps.htmlMeta("<META NAME=\"robots\" CONTENT=\"none\">").noindex)
    assert(HtmlOps.htmlMeta("<META NAME=\"robots\" CONTENT=\"none\">").nofollow)
    assert(HtmlOps.htmlMeta("<link rel=canonical href=/c/7>").canonical === "/c/7") // bare values
    assert(HtmlOps.htmlMeta("<!-- <meta name=\"robots\" content=\"noindex\"> -->") ===
      HtmlOps.Meta(noindex = false, nofollow = false, null))
    assert(HtmlOps.htmlMeta("<meta name=\"description\" content=\"noindex\">") ===
      HtmlOps.Meta(noindex = false, nofollow = false, null))
    assert(HtmlOps.htmlMeta("<link rel=canonical href=") === // truncated tag, never throws
      HtmlOps.Meta(noindex = false, nofollow = false, null))
    assert(HtmlOps.htmlMeta(null) === HtmlOps.Meta(noindex = false, nofollow = false, null))
  }

  test("htmlTables: addressed cells, headers, entities, nesting flushes, soup-total") {
    val cells = HtmlOps.htmlTables(
      "<p>pre</p><table><tr><th>h &amp; x</th><td>  a  b </td></tr>" +
      "<tr><td>c</td></tr></table><table><tr><td>d</td></tr></table>")
    assert(cells === Seq(
      HtmlOps.TableCell(0, 0, 0, header = true, "h & x"),
      HtmlOps.TableCell(0, 0, 1, header = false, "a b"),
      HtmlOps.TableCell(0, 1, 0, header = false, "c"),
      HtmlOps.TableCell(1, 0, 0, header = false, "d")))
    // cells outside a <tr> are ignored; script content never leaks
    assert(HtmlOps.htmlTables("<table><td>stray</td></table>") === Seq.empty)
    assert(HtmlOps.htmlTables(
      "<table><tr><td><script>var t = '<td>no</td>';</script>yes</td></tr></table>")
      .map(_.text) === Seq("yes"))
    // unclosed soup is total; prose without tables yields nothing
    assert(HtmlOps.htmlTables("<table><tr><td>open") ===
      Seq(HtmlOps.TableCell(0, 0, 0, header = false, "open")))
    assert(HtmlOps.htmlTables("just prose") === Seq.empty)
    assert(HtmlOps.htmlTables(null) === Seq.empty)
  }

  test("htmlTables: stray tr/td after </table> emit nothing until a new table opens") {
    val cells = HtmlOps.htmlTables(
      "<table><tr><td>in</td></tr></table><tr><td>orphan</td></tr>" +
      "<table><tr><td>next</td></tr></table>")
    assert(cells === Seq(
      HtmlOps.TableCell(0, 0, 0, header = false, "in"),
      HtmlOps.TableCell(1, 0, 0, header = false, "next")))
  }

  test("length-changing lowercase chars (U+0130) cannot drift script/style scan positions") {
    // 'İ'.toLowerCase is TWO chars ('i' + U+0307): indexing the
    // original via positions from a lowercased copy would land one
    // short per İ and misextract; the region scan must not
    val html = "<p>İİİ</p><table><tr><td><script>var x='<td>no</td>';</SCRIPT>ok</td></tr></table>"
    assert(HtmlOps.htmlTables(html).map(_.text) === Seq("ok"))
    val ex = HtmlOps.extract("<p>İİ</p><script>junk()</SCRIPT><p>tail</p>")
    assert(ex.text.contains("tail") && !ex.text.contains("junk"))
  }
}
