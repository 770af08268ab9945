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
}
