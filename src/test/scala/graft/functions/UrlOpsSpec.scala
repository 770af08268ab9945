package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The UrlOps spec, rule by rule, on hand-picked edges. Cross-engine
  * parity of the same rules is gated by q_url_canon / q_url_dedup.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: (String, String)*): Unit = check(UrlOps.urlCanon _, urls)
  private def host(urls: (String, String)*): Unit = check(UrlOps.urlHost _, urls)
  private def domain(urls: (String, String)*): Unit = check(UrlOps.urlDomain _, urls)

  private def check(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                    urls: Seq[(String, String)]): Unit = {
    val got = urls.map(_._1).toDF("u").select(f(col("u"))).collect().map(_.getString(0))
    urls.map(_._2).zip(got).zip(urls.map(_._1)).foreach { case ((want, g), in) =>
      assert(g === want, s"input: $in")
    }
  }

  test("surtKey: CDX urlkey form — reversed host, dropped noise, lowercased path") {
    val surt = (urls: Seq[(String, String)]) => check(UrlOps.surtKey _, urls)
    surt(Seq(
      "https://sub1.crawl2.example.org/Path/9" -> "org,example,crawl2,sub1)/path/9",
      "https://Example.COM/A?B=c" -> "com,example)/a?b=c",
      "HTTP://WWW.Example.com:80/" -> "com,example)/",
      "https://example.com" -> "com,example)/",
      "https://u:p@example.com:8443/x#frag" -> "com,example)/x",
      "https://10.0.0.1/admin" -> "1,0,0,10)/admin",
      "not a url" -> null))
  }

  test("canonical form: case, www, default ports, fragments, trailing slashes") {
    canon(
      "https://Site.Com/doc/5" -> "https://site.com/doc/5",
      "HTTPS://WWW.SITE.COM:443/doc/5/#frag" -> "https://site.com/doc/5",
      "http://site.com:80/a" -> "http://site.com/a",
      "http://site.com:8080/a" -> "http://site.com:8080/a",
      "https://site.com" -> "https://site.com/",
      "https://site.com/a//" -> "https://site.com/a",
      "  https://site.com/x  " -> "https://site.com/x",
      "https://www.www.site.com/x" -> "https://site.com/x", // idempotence: all www prefixes fold
      "\thttps://site.com/x\n" -> "https://site.com/x") // explicit-class outer trim
  }

  test("canonical form: query handling — tracking params drop, order is preserved") {
    canon(
      "https://s.com/p?utm_source=x&ref=1&fbclid=y&gclid" -> "https://s.com/p?ref=1",
      "https://s.com/p?utm_source=x&utm_medium=y" -> "https://s.com/p",
      "https://s.com/p?b=2&a=1" -> "https://s.com/p?b=2&a=1",
      "https://s.com/p?&&a=1&" -> "https://s.com/p?a=1",
      "https://u:pw@s.com:8080/p?ref=1#f" -> "https://s.com:8080/p?ref=1")
  }

  test("non-URLs and empty hosts are null, never garbage") {
    canon(
      "not a url" -> null,
      "site.com/path" -> null, // no scheme
      "https:///path" -> null, // empty host
      "https://a.com/x\ny" -> null, // interior whitespace: invalid per RFC, and the
      "https://a.com/pa th" -> null, // one place Java-$ and RE2-$ could diverge
      null.asInstanceOf[String] -> null)
    host("nope" -> null)
    domain("nope" -> null)
  }

  test("host and registered domain: multi-part suffixes, IPs, single labels") {
    host(
      "https://WWW.News.BBC.co.uk/x" -> "news.bbc.co.uk",
      "http://u@a.b.example.com:81/" -> "a.b.example.com")
    domain(
      "https://www.news.bbc.co.uk/x" -> "bbc.co.uk", // multi-part suffix → 3 labels
      "https://a.b.example.com/x" -> "example.com",
      "https://example.com/x" -> "example.com",
      "http://localhost/x" -> "localhost",
      "http://192.168.0.1/x" -> "192.168.0.1")
  }

  test("urlPath: canonical path+query (the robots.txt match target)") {
    check(UrlOps.urlPath _, Seq(
      "https://s.com" -> "/",
      "https://s.com/a/b/" -> "/a/b",
      "https://s.com/a?utm_source=x&ref=1#f" -> "/a?ref=1",
      "HTTPS://WWW.S.COM:443/q2?a=1" -> "/q2?a=1",
      "not a url" -> null))
  }

  test("urlResolve: RFC 3986 reference resolution incl. the JDK quirk fixes") {
    val cases = Seq(
      ("https://a.com/b/c", "d") -> "https://a.com/b/d",
      ("https://a.com/b/c/", "../x") -> "https://a.com/b/x",
      ("https://a.com/b", "//cdn.com/z") -> "https://cdn.com/z",
      ("https://a.com/b", "?q=1") -> "https://a.com/b?q=1", // JDK would say /?q=1
      ("https://a.com/b#old", "") -> "https://a.com/b", // JDK would say /
      ("https://a.com/b", "#f") -> "https://a.com/b#f",
      ("https://a.com/x/y", "/abs") -> "https://a.com/abs",
      ("https://a.com/b", "javascript:void(0)") -> "javascript:void(0)",
      ("https://a.com/b/", "a b") -> "https://a.com/b/a%20b",
      ("https://a.com/b", "xy") -> null)
    cases.foreach { case ((b, r), want) =>
      assert(UrlOps.resolveRef(b, r) === want, s"base=$b ref=$r")
    }
    // the non-fetchable scheme is rejected by the NEXT stage, as documented
    import spark.implicits._
    val canon = Seq("x").toDF("i")
      .select(UrlOps.urlCanon(lit("javascript:void(0)"))).head
    assert(canon.isNullAt(0))
  }

  test("idnAscii: RFC 3490 ToASCII with identity fast path and never-throws fallback") {
    // the hand-pinned battery the q_url_psl oracle replays (same constants)
    val pinned = Seq(
      "münchen.de" -> "xn--mnchen-3ya.de",
      "日本語.jp" -> "xn--wgv71a119e.jp",
      "テスト.co.uk" -> "xn--zckzah.co.uk",
      "sub.テスト.co.uk" -> "sub.xn--zckzah.co.uk",
      "bücher.example.com" -> "xn--bcher-kva.example.com",
      "xn--mnchen-3ya.de" -> "xn--mnchen-3ya.de")
    pinned.foreach { case (in, want) => assert(UrlOps.idnAscii(in) === want, in) }
    // pure-ASCII fast path is reference-identical (no re-allocation)
    val ascii = "plain.example.com"
    assert(UrlOps.idnAscii(ascii) eq ascii)
    // unmappable hosts keep their raw form, never throw: empty label,
    // over-long label, lone surrogate (prohibited code point)
    val bad = Seq("a..béé", ("ü" * 70) + ".de", "\ud800x.com")
    bad.foreach(h => assert(UrlOps.idnAscii(h) === h, h))
    // column surface: host/domain/canon all agree on the ACE form
    import spark.implicits._
    val r = Seq("https://MÜNCHEN.de/p?utm_source=x").toDF("u")
      .select(UrlOps.urlHost(col("u")), UrlOps.urlDomain(col("u")),
        UrlOps.urlCanon(col("u"))).head
    assert(r.getString(0) === "xn--mnchen-3ya.de")
    assert(r.getString(1) === "xn--mnchen-3ya.de")
    assert(r.getString(2) === "https://xn--mnchen-3ya.de/p")
  }

  test("registered SQL surface: url_canon/url_host/url_domain callable from pure SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT url_canon('HTTPS://WWW.S.COM:443/a/?utm_source=x#f') AS c,
        |       url_host('https://www.s.co.uk/x') AS h,
        |       url_domain('https://a.b.s.co.uk/x') AS d""".stripMargin).head
    assert(r.getString(0) === "https://s.com/a")
    assert(r.getString(1) === "s.co.uk")
    assert(r.getString(2) === "s.co.uk")
  }
}
