package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fuzz contract of the URL layer: at corpus scale these expressions
  * run over billions of DIRTY strings, so the load-bearing properties
  * are (a) nothing throws, ever; (b) canonicalization is IDEMPOTENT
  * (re-canonicalizing an already-canonical URL is the identity — the
  * property that makes canon keys stable across pipeline re-runs);
  * (c) the three outputs agree structurally (domain is a label-suffix
  * of host; canon embeds scheme://host). One seeded corpus of mutated
  * URL templates + raw garbage, evaluated in a single Spark pass.
  */
class UrlOpsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def fuzzCorpus(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val pool = "abcXYZ019-._~:/?#[]@!$&'()*+,;=% \té中\\\"<>|^"
    val schemes = Seq("http", "https", "HTTPS", "ftp", "x+y-z.1", "")
    val hosts = Seq("WWW.Site.Com", "www.www.Site.Com", "a.b.co.uk", "192.168.0.1", "localhost",
      "u:p@host.org:8080", "site..com", "", ":81", "@", "host.com:")
    val paths = Seq("", "/", "/a/b", "/a//", "/a%20b", "///", "/#", "/?")
    val queries = Seq("", "?utm_source=x", "?a=1&utm_medium=y&b=2", "?&&", "?#f", "?q=%%")
    def rand(len: Int) = Seq.fill(len)(pool(rnd.nextInt(pool.length))).mkString
    (0 until n).map { i =>
      i % 4 match {
        case 0 => // template URL
          s"${schemes(rnd.nextInt(schemes.length))}://${hosts(rnd.nextInt(hosts.length))}" +
            s"${paths(rnd.nextInt(paths.length))}${queries(rnd.nextInt(queries.length))}#${rand(3)}"
        case 1 => // template with random mutation spliced in
          val base = s"https://${hosts(rnd.nextInt(hosts.length))}/a?b=1"
          val at = rnd.nextInt(base.length)
          base.substring(0, at) + rand(1 + rnd.nextInt(4)) + base.substring(at)
        case 2 => rand(1 + rnd.nextInt(40)) // raw garbage
        case _ => if (rnd.nextBoolean()) null else rand(rnd.nextInt(5))
      }
    }
  }

  test("never throws, canon is idempotent, outputs agree structurally (500 fuzzed rows)") {
    val rows = fuzzCorpus(500).toDF("u")
      .select(col("u"),
        UrlOps.urlCanon(col("u")).as("c"),
        UrlOps.urlHost(col("u")).as("h"),
        UrlOps.urlDomain(col("u")).as("d"),
        UrlOps.urlCanon(UrlOps.urlCanon(col("u"))).as("cc"),
        UrlOps.urlHost(UrlOps.urlCanon(col("u"))).as("ch"))
      .collect() // (a) nothing throws across the whole corpus
    var nonNull = 0
    rows.foreach { r =>
      val u = r.getString(0)
      val Seq(c, h, d, cc, ch) = (1 to 5).map(i => if (r.isNullAt(i)) null else r.getString(i))
      // null-agreement: the three outputs are null together
      assert((c == null) == (h == null) && (h == null) == (d == null), s"u=$u c=$c h=$h d=$d")
      if (c != null) {
        nonNull += 1
        assert(cc === c, s"canon not idempotent: $u -> $c -> $cc")
        assert(ch === h, s"host drifts under canon: $u host=$h canon-host=$ch")
        // domain is a label suffix of host (equal for IPs/single labels)
        assert(d == h || h.endsWith("." + d), s"u=$u host=$h domain=$d")
        assert(c.contains("://" + h), s"canon does not embed host: $u -> $c host=$h")
      }
    }
    assert(nonNull > 50, s"fuzz corpus degenerate: only $nonNull parseable URLs")
  }
}
