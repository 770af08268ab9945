package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PSL registered-domain semantics on every rule family — normal,
  * wildcard, exception, default, private suffixes, IP/bare-TLD
  * carve-outs — plus the fixture's structural invariants. Cross-engine
  * parity of the same rules is gated by q_url_psl.
  */
class PslDomainsSpec extends SparkSpec {

  test("fixture loads and parses: all three rule types present") {
    assert(PslDomains.rules.nonEmpty)
    val byTyp = PslDomains.rules.groupBy(_.typ).view.mapValues(_.size).toMap
    assert(byTyp.getOrElse("n", 0) > 100)
    assert(byTyp.getOrElse("w", 0) >= 8) // *.kawasaki.jp family + wildcard ccTLDs
    assert(byTyp.getOrElse("e", 0) >= 8) // !city.* family + !www.ck
    // format invariants: no rule retains its marker, labels counted right
    PslDomains.rules.foreach { r =>
      assert(!r.suffix.startsWith("*") && !r.suffix.startsWith("!"), r)
      assert(r.nlab === r.suffix.count(_ == '.') + 1, r)
    }
  }

  test("normal rules: ICANN multi-part suffixes incl. the or.jp family") {
    val cases = Seq(
      "www.news.bbc.co.uk" -> "bbc.co.uk",
      "foo.or.jp" -> "foo.or.jp",
      "a.foo.or.jp" -> "foo.or.jp",
      "foo.ne.jp" -> "foo.ne.jp",
      "x.com.au" -> "x.com.au",
      "a.b.nom.br" -> "b.nom.br",
      "x.gob.mx" -> "x.gob.mx")
    cases.foreach { case (h, want) =>
      assert(PslDomains.registeredDomain(h) === want, s"host: $h")
    }
  }

  test("private suffixes: github.io-style hosts stop collapsing onto the provider") {
    assert(PslDomains.registeredDomain("alice.github.io") === "alice.github.io")
    assert(PslDomains.registeredDomain("deep.alice.github.io") === "alice.github.io")
    assert(PslDomains.registeredDomain("me.blogspot.com") === "me.blogspot.com")
    assert(PslDomains.registeredDomain("app.herokuapp.com") === "app.herokuapp.com")
    assert(PslDomains.registeredDomain("bucket.s3.amazonaws.com") === "bucket.s3.amazonaws.com")
  }

  test("wildcard rules: one opaque label under the suffix is public") {
    assert(PslDomains.registeredDomain("shop.foo.ck") === "shop.foo.ck")
    assert(PslDomains.registeredDomain("deep.shop.foo.ck") === "shop.foo.ck")
    assert(PslDomains.registeredDomain("x.sub.kawasaki.jp") === "x.sub.kawasaki.jp")
    assert(PslDomains.registeredDomain("a.x.sub.kawasaki.jp") === "x.sub.kawasaki.jp")
    // the wildcard does NOT match the bare suffix itself
    assert(PslDomains.registeredDomain("foo.ck") === "foo.ck")
  }

  test("exception rules beat wildcards") {
    assert(PslDomains.registeredDomain("www.ck") === "www.ck")
    assert(PslDomains.registeredDomain("shop.www.ck") === "www.ck")
    assert(PslDomains.registeredDomain("city.kawasaki.jp") === "city.kawasaki.jp")
    assert(PslDomains.registeredDomain("sub.city.kawasaki.jp") === "city.kawasaki.jp")
  }

  test("default rule, bare hosts, IPs") {
    assert(PslDomains.registeredDomain("a.b.example.com") === "example.com")
    assert(PslDomains.registeredDomain("example.com") === "example.com")
    assert(PslDomains.registeredDomain("uk") === "uk") // host IS a public suffix → capped
    assert(PslDomains.registeredDomain("co.uk") === "co.uk")
    assert(PslDomains.registeredDomain("localhost") === "localhost")
    assert(PslDomains.registeredDomain("192.168.0.1") === "192.168.0.1")
    assert(PslDomains.registeredDomain("b.example.co") === "example.co")
    assert(PslDomains.registeredDomain("a.com.co") === "a.com.co")
  }

  test("column form and rulesDf relation agree with the static matcher") {
    import spark.implicits._
    val hosts = Seq("foo.or.jp", "deep.alice.github.io", "shop.www.ck", "example.com")
    val got = hosts.toDF("h").select(PslDomains.domainOfHost(col("h")))
      .collect().map(_.getString(0))
    assert(got.toSeq === hosts.map(PslDomains.registeredDomain))
    assert(PslDomains.rulesDf(spark).count() === PslDomains.rules.size.toLong)
  }

  test("urlDomain end-to-end routes through the PSL") {
    import spark.implicits._
    val got = Seq(
      "https://a.foo.or.jp/x",
      "https://deep.alice.github.io/x?utm_source=1",
      "HTTPS://WWW.SHOP.FOO.CK:443/y")
      .toDF("u").select(UrlOps.urlDomain(col("u"))).collect().map(_.getString(0))
    assert(got.toSeq === Seq("foo.or.jp", "alice.github.io", "shop.foo.ck"))
  }
}
