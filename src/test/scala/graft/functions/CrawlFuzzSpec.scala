package graft.functions

import graft.SparkSpec

/** Fuzz contract of the round-10 crawl layer — the same bar the
  * URL/PDF/AVI/WARC surfaces already meet: over seeded random garbage
  * and mutated well-formed inputs, NOTHING throws, outputs satisfy
  * their structural invariants, and the idempotent operators reach a
  * fixed point. Pure-JVM (no Spark job): these are the static methods
  * the codegen'd expressions call, so the property transfers.
  */
class CrawlFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private def garbage(maxLen: Int): String = {
    val pool = "<>/=&#;\"' abcéé中" + "\u0000\u0007\\$*!~%?:" + "😀"
    Seq.fill(rnd.nextInt(math.max(1, maxLen)))(pool(rnd.nextInt(pool.length))).mkString
  }
  private def mutate(s: String): String = {
    if (s.isEmpty) return s
    val at = rnd.nextInt(s.length)
    rnd.nextInt(3) match {
      case 0 => s.substring(0, at) // truncate
      case 1 => s.substring(0, at) + garbage(6) + s.substring(at) // splice
      case _ => s.substring(0, at) + s.substring(math.min(s.length, at + 1 + rnd.nextInt(4)))
    }
  }

  test("html_extract: total over 400 soups; links/title invariants hold") {
    val seed = "<html><head><title>T&amp;t</title><script>x<y</script></head>" +
      "<body><p>a</p><a href=\"/l1\">x</a><a href='h ttp'>y</a></body></html>"
    (0 until 400).foreach { i =>
      val in = if (i % 2 == 0) mutate(seed) else garbage(80)
      val e = HtmlOps.extract(in) // never throws
      assert(e.text != null && e.links != null)
      assert(e.links.forall(_ != null))
      // extracted text never contains an undecoded basic entity of the seed
      assert(!e.text.contains("&amp;"))
    }
  }

  test("html_meta + html_tables: total over 400 soups; addresses stay sane") {
    val seed = "<head><meta name=\"robots\" content=\"noindex, nofollow\">" +
      "<link rel=\"canonical\" href=\"https://e.com/p\"></head>" +
      "<table><tr><th>h</th><td>a &amp; b</td></tr><tr><td>c</td></tr></table>"
    (0 until 400).foreach { i =>
      val in = if (i % 2 == 0) mutate(seed) else garbage(80)
      val m = HtmlOps.htmlMeta(in) // never throws
      assert(m.canonical == null || m.canonical.nonEmpty)
      val cells = HtmlOps.htmlTables(in) // never throws
      cells.foreach { c =>
        assert(c.table >= 0 && c.row >= 0 && c.col >= 0 && c.text != null)
      }
      // addresses are strictly increasing in document order
      val keys = cells.map(c => (c.table, c.row, c.col))
      assert(keys === keys.sorted)
    }
  }

  test("sitemap_parse: total over 400 soups; locs/lastmods stay aligned") {
    val seed = "<urlset><url><loc>https://a.com/1</loc><lastmod>2026-01-01</lastmod></url>" +
      "<url><loc>https://a.com/2</loc></url></urlset>"
    (0 until 400).foreach { i =>
      val in = if (i % 2 == 0) mutate(seed) else garbage(80)
      val p = SitemapOps.parse(in) // never throws
      assert(p.locs.size === p.lastmods.size)
      assert(p.locs.forall(l => l != null && l.nonEmpty))
    }
  }

  test("robots: total over 400 soups; decisions are deterministic booleans") {
    val seed = "User-agent: *\nDisallow: /a\nAllow: /a/b\nCrawl-delay: 2\nSitemap: https://x/s.xml\n"
    (0 until 400).foreach { i =>
      val in = if (i % 2 == 0) mutate(seed) else garbage(80)
      val a1 = RobotsOps.allowed(in, "graftbot", "/a/x") // never throws
      val a2 = RobotsOps.allowed(in, "graftbot", "/a/x")
      assert(a1 === a2) // deterministic
      RobotsOps.crawlDelayMs(in, "graftbot")
      RobotsOps.sitemaps(in)
    }
  }

  test("mojibake fix: total, idempotent, and length-sane over 400 inputs") {
    val seeds = Seq("cafÃ©", "â€™", "café", "中文", "")
    (0 until 400).foreach { i =>
      val in = if (i % 2 == 0) mutate(seeds(i % seeds.size)) else garbage(60)
      val f1 = Mojibake.fix(in) // never throws
      assert(Mojibake.fix(f1) === f1, s"not a fixed point: ${in.take(40)}")
      assert(f1.length <= in.length) // repair only ever contracts
    }
  }

  test("psl registered domain: total, idempotent, label-suffix over 400 hosts") {
    (0 until 400).foreach { i =>
      val host = (if (i % 2 == 0)
        Seq.fill(1 + rnd.nextInt(5))(garbage(5).filter(_.isLetterOrDigit)).mkString(".")
      else mutate("shop.example.co.uk")).toLowerCase(java.util.Locale.ROOT)
      val d = PslDomains.registeredDomain(host) // never throws
      assert(PslDomains.registeredDomain(d) === d, s"not idempotent: $host -> $d")
      assert(d == host || host.endsWith("." + d), s"not a label suffix: $host -> $d")
    }
  }

  test("idn_ascii: total, idempotent, ASCII-out-or-identity over 400 hosts") {
    (0 until 400).foreach { i =>
      val host = i % 3 match {
        case 0 => garbage(40)
        case 1 => mutate(s"sub$i.münchen.日本語.co.uk")
        case _ => s"plain$i.example.com"
      }
      val a = UrlOps.idnAscii(host) // never throws
      assert(a != null)
      assert(UrlOps.idnAscii(a) === a, s"not idempotent: $host -> $a")
      // either fully mapped to ASCII or left as the raw input (fallback)
      assert(a.forall(_ < 0x80) || a == host, s"half-mapped: $host -> $a")
    }
  }

  test("url_resolve: total over 400 (base, ref) pairs; absolute refs dominate") {
    (0 until 400).foreach { i =>
      val base = if (i % 3 == 0) garbage(30) else s"https://s$i.com/a/b?x=1"
      val ref = i % 4 match {
        case 0 => garbage(20)
        case 1 => "../" + garbage(8)
        case 2 => s"https://abs$i.com/p"
        case _ => "/r/" + i
      }
      val out = UrlOps.resolveRef(base, ref) // never throws
      if (ref.startsWith("https://abs") && out != null)
        assert(out === ref, s"absolute ref must pass through: $ref -> $out")
    }
  }
}
