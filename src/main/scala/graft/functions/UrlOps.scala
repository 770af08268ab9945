package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization + registered-domain extraction — the key
  * primitives of crawl-scale curation that every URL-keyed stage
  * (canonical-URL dedup, per-domain caps, blocklist joins, the
  * PageRank node key) shares. One exact, engine-neutral SPEC, stated
  * once and implemented twice (Spark Columns here, the DuckDB twin in
  * [[canonSql]]/[[hostSql]]/[[domainSql]]), so the cross-engine hash
  * gate pins every rule:
  *
  *   1. trim; strip the fragment (`#...`).
  *   2. scheme = lowercased `^[A-Za-z][A-Za-z0-9+.-]*` before `://`;
  *      no scheme → not a URL → every output null.
  *   3. authority = up to the first `/` or `?`; userinfo (`...@`)
  *      drops; host lowercases; one leading `www.` drops; the port
  *      survives only when non-default for the scheme (http:80 and
  *      https:443 drop). Empty host → null outputs.
  *   4. path = authority end to `?`; empty → `/`; trailing slash runs
  *      collapse away on non-root paths (`/a//` → `/a`).
  *   5. query: split on `&`, DROP tracking params (`utm_*`, `fbclid`,
  *      `gclid` — name match, with or without `=value`) and empty
  *      segments, keep the remaining order (sorting would merge
  *      semantically ordered params); empty result → no `?`.
  *
  * Registered domain (the per-domain aggregation key): PSL-backed via
  * [[PslDomains]] (publicsuffix.org longest-match semantics over the
  * `graft/psl.dat` rule fixture; the DuckDB twin replays the identical
  * rules inline, so the gate pins the semantics). When the fixture is
  * absent from the classpath, a documented last-2-or-3-label heuristic
  * (`co|com|net|org|gov|ac|edu` under a 2-letter ccTLD) survives as
  * the fallback. All-numeric (IP) hosts return unchanged.
  *
  * IDN hosts: a non-ASCII host maps to its ACE (punycode) form via
  * RFC 3490 ToASCII ([[idnAscii]], JDK `java.net.IDN`) BEFORE PSL
  * matching and before appearing in any host/domain/canon output —
  * PSL rules are ASCII, so without this step `münchen.de` or `日本.jp`
  * would bypass rule matching and mis-bucket every per-domain operator
  * (the r10 PSL fix's missing axis). Pure-ASCII hosts take a scan-only
  * fast path (identity, zero allocation); unmappable hosts (prohibited
  * code points, over-long labels, empty labels) keep their raw form
  * rather than nulling a row that upstream stages accepted. Twin
  * expressibility (documented compromise): DuckDB cannot compute
  * punycode, so the oracle battery pins hand-verified ACE forms for
  * its IDN rows; every other gated corpus input is ASCII, where
  * ToASCII is the identity and the twins need no change.
  *
  * Everything is builtin string/regex/array Columns — fully inside
  * whole-stage codegen, no UDF boundary; the only HOF lambda filters
  * a handful of query params per row.
  */
object UrlOps {

  private val SchemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://"
  private val TrackRe = "^(utm_[^=]*|fbclid|gclid)(=|$)"
  private val MultiSuffixes = Seq("co", "com", "net", "org", "gov", "ac", "edu")

  /** Explicit whitespace class, identical in Java regex and RE2 —
    * `\s` itself differs between the engines on U+000B, which would
    * silently fork the twins.
    */
  private val Ws = "[ \\t\\n\\r\\f\\x0B]"

  private def stripFragment(u: Column): Column =
    regexp_replace(regexp_replace(u, s"^$Ws+|$Ws+$$", ""), "#[\\s\\S]*$", "")

  private def restOf(s: Column): Column = regexp_replace(s, SchemeRe, "")

  // Greedy `^.*@`: RFC 3986 delimits userinfo at the LAST `@` in the
  // authority — `http://a@b@h.com/` has host `h.com`, not `b@h.com`
  private def hostPort(s: Column): Column =
    regexp_replace(regexp_extract(restOf(s), "^([^/?]*)", 1), "^.*@", "")

  private def rawHost(s: Column): Column =
    regexp_replace(lower(regexp_replace(hostPort(s), ":[0-9]*$", "")), "^(www\\.)+", "")

  /** RFC 3490 ToASCII of a (lowercased) host: ACE/punycode form for
    * non-ASCII hosts, identity for pure-ASCII ones (scan-only fast
    * path) and for hosts the JDK rejects as unmappable — a total
    * function, never throws. Scaladoc at the object head has the
    * rationale and the oracle-twin compromise.
    */
  def idnAscii(host: String): String = {
    if (host == null) return null
    var i = 0
    while (i < host.length) {
      if (host.charAt(i) >= 0x80) {
        return try java.net.IDN.toASCII(host).toLowerCase(java.util.Locale.ROOT)
        catch { case _: Exception => host }
      }
      i += 1
    }
    host
  }

  def idnAsciiUtf8(h: UTF8String): UTF8String = {
    val s = h.toString
    val r = idnAscii(s)
    if (r eq s) h else UTF8String.fromString(r)
  }

  private def idnHost(c: Column): Column =
    GraftExpr.toColumn(IdnHostExpr(GraftExpr.toExpr(c)))

  /** A URL is rejected outright when whitespace survives inside the
    * non-fragment part: beyond being invalid per RFC 3986, an embedded
    * newline makes Java's `$` (matches before a FINAL newline) and
    * RE2's `$` (end of text only) disagree — the one place the "same
    * regexes" twins could silently fork. Rejecting is both the correct
    * URL semantics and what keeps every later `$`-anchored regex
    * engine-identical.
    */
  private def validUrl(u: Column, s: Column): Column =
    u.isNotNull && s.rlike(SchemeRe) && !s.rlike(Ws) && rawHost(s) =!= ""

  /** Lowercased, `www.`-stripped, IDN-ToASCII host; null when not a
    * URL.
    */
  def urlHost(u: Column): Column = {
    val s = stripFragment(u)
    when(validUrl(u, s), idnHost(rawHost(s)))
  }

  /** Registered domain of the (IDN-normalized) host: PSL-backed
    * ([[PslDomains]]) when the rule fixture is on the classpath, the
    * documented 7-suffix heuristic otherwise; null when not a URL.
    */
  def urlDomain(u: Column): Column = {
    val s = stripFragment(u)
    val host = idnHost(rawHost(s))
    val reg =
      if (PslDomains.rules.nonEmpty) PslDomains.domainOfHost(host)
      else heuristicDomain(host)
    when(validUrl(u, s), reg)
  }

  /** The pre-PSL registered-domain approximation (scaladoc above) —
    * retained only as the no-fixture fallback.
    */
  private def heuristicDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val multi = element_at(labels, -2).isin(MultiSuffixes: _*) &&
      length(element_at(labels, -1)) === 2
    when(host.rlike("^[0-9.]+$"), host)
      .when(n >= 3 && multi,
        concat_ws(".", element_at(labels, -3), element_at(labels, -2), element_at(labels, -1)))
      .when(n >= 2, concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
      .otherwise(host)
  }

  /** Canonical path + retained query of a URL (`/a/b?x=1` — the
    * robots.txt match target, RFC 9309 matches path AND query); null
    * when not a URL. Same path/query rules as [[urlCanon]].
    */
  def urlPath(u: Column): Column = {
    val s = stripFragment(u)
    val pathq = regexp_replace(restOf(s), "^[^/?]*", "")
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path1 = when(path0 === "", "/").otherwise(path0)
    val path = coalesce(nullif(regexp_replace(path1, "/+$", ""), lit("")), lit("/"))
    val query0 = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = filter(split(query0, "&"), p => p =!= "" && !p.rlike(TrackRe))
    val query = array_join(params, "&")
    when(validUrl(u, s),
      concat(path, when(query =!= "", concat(lit("?"), query)).otherwise("")))
  }

  /** RFC 3986 §5 reference resolution: absolutize an extracted href
    * against its page URL — the glue between [[HtmlOps]] link
    * extraction and the frontier. Backed by `java.net.URI.resolve`
    * (the JDK's RFC 3986 implementation) behind a never-throws guard:
    * refs get a whitespace cleanup (trim, inner space → %20, control
    * chars rejected), anything still unparseable yields null. The
    * result is a RAW absolute URL — run [[urlCanon]] on it next, which
    * also rejects non-fetchable schemes (`javascript:`, `mailto:`).
    */
  def resolveRef(base: String, ref: String): String = {
    if (base == null || ref == null) return null
    val b = base.trim
    val r = ref.trim.replace(" ", "%20")
    if (r.exists(_ < ' ')) return null
    def cutAt(s: String, chars: String): String = {
      val i = s.indexWhere(chars.contains(_))
      if (i < 0) s else s.substring(0, i)
    }
    // two documented JDK deviations from RFC 3986 §5.4, fixed here:
    // an EMPTY ref is the base minus fragment (URI.resolve drops the
    // base path), and a QUERY-ONLY ref keeps the base path (URI.resolve
    // resolves it against the root)
    if (r.isEmpty) return cutAt(b, "#")
    if (r.startsWith("?")) return cutAt(b, "?#") + r
    try {
      val resolved = java.net.URI.create(b).resolve(r).toString
      if (resolved.isEmpty) null else resolved
    } catch { case _: Exception => null }
  }

  def resolveRefUtf8(base: UTF8String, ref: UTF8String): UTF8String = {
    val s = resolveRef(base.toString, ref.toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  def urlResolve(base: Column, ref: Column): Column =
    GraftExpr.toColumn(UrlResolveExpr(GraftExpr.toExpr(base), GraftExpr.toExpr(ref)))

  /** The full canonical form (host in IDN-ToASCII form — one canonical
    * spelling per target, consistent with [[urlHost]]/[[urlDomain]]);
    * null when not a URL.
    */
  def urlCanon(u: Column): Column = {
    val s = stripFragment(u)
    val scheme = lower(regexp_extract(s, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hp = hostPort(s)
    val host = idnHost(rawHost(s))
    val port = regexp_extract(hp, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") && !(scheme === "https" && port === "443")
    val pathq = regexp_replace(restOf(s), "^[^/?]*", "")
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path1 = when(path0 === "", "/").otherwise(path0)
    val path = coalesce(nullif(regexp_replace(path1, "/+$", ""), lit("")), lit("/"))
    val query0 = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = filter(split(query0, "&"),
      p => p =!= "" && !p.rlike(TrackRe))
    val query = array_join(params, "&")
    when(validUrl(u, s),
      concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(""),
        path,
        when(query =!= "", concat(lit("?"), query)).otherwise("")))
  }

  // ------------------------------------------------------------ DuckDB twins
  // Same spec, same regexes, same step order; `e` is any SQL string
  // expression. Generated inline so each oracle query stays a single
  // self-contained statement.

  private val SqlWs = "[ \\t\\n\\r\\f\\x0B]"
  private def sqlStrip(e: String) =
    s"regexp_replace(regexp_replace($e, '^$SqlWs+|$SqlWs+$$', '', 'g'), '#[\\s\\S]*$$', '')"
  private def sqlRest(s: String) = s"regexp_replace($s, '$SchemeRe', '')"
  private def sqlHostPort(s: String) =
    s"regexp_replace(regexp_extract(${sqlRest(s)}, '^([^/?]*)', 1), '^.*@', '')"
  private def sqlRawHost(s: String) =
    s"regexp_replace(lower(regexp_replace(${sqlHostPort(s)}, ':[0-9]*$$', '')), '^(www\\.)+', '')"
  private def sqlValid(e: String, s: String) =
    s"($e IS NOT NULL AND regexp_matches($s, '$SchemeRe')" +
      s" AND NOT regexp_matches($s, '$SqlWs') AND ${sqlRawHost(s)} <> '')"

  def hostSql(e: String): String = {
    val s = sqlStrip(e)
    s"CASE WHEN ${sqlValid(e, s)} THEN ${sqlRawHost(s)} END"
  }

  /** SURT key (Sort-friendly URI Reordering Transform) — the `urlkey`
    * of CDX/CDXJ crawl indexes: comma-joined REVERSED host labels +
    * `)` + the lowercased path-and-query, with scheme/userinfo/port/
    * `www.`/fragment dropped exactly as [[urlCanon]] drops them.
    * SURT keys sort host-hierarchically (`com,example)/…` groups all
    * subdomains of example.com), which is why crawl indexes key on
    * them. Subset: query parameters keep wire order (full SURT's
    * param sorting is out of subset — CC's own urlkeys vary here by
    * indexer version anyway). Null when not a URL.
    */
  def surtKey(u: Column): Column = {
    val s = stripFragment(u)
    val path = regexp_extract(regexp_replace(restOf(s), "^[^/?]*", ""), "^([\\s\\S]*)", 1)
    when(validUrl(u, s),
      concat(array_join(reverse(split(rawHost(s), "\\.")), ","), lit(")"),
        when(path === "", lit("/")).otherwise(lower(path))))
  }

  def surtSql(e: String): String = {
    val s = sqlStrip(e)
    val path = s"regexp_replace(${sqlRest(s)}, '^[^/?]*', '')"
    s"""CASE WHEN ${sqlValid(e, s)} THEN (
       |  SELECT array_to_string(list_reverse(string_split(h, '.')), ',') || ')' ||
       |         CASE WHEN p = '' THEN '/' ELSE lower(p) END
       |  FROM (SELECT ${sqlRawHost(s)} AS h, $path AS p)) END""".stripMargin
  }

  def domainSql(e: String): String = {
    val s = sqlStrip(e)
    val host = sqlRawHost(s)
    if (PslDomains.rules.nonEmpty)
      s"CASE WHEN ${sqlValid(e, s)} THEN ${PslDomains.domainOfHostSql(host)} END"
    else {
      val inSet = MultiSuffixes.map("'" + _ + "'").mkString("(", ", ", ")")
      s"""CASE WHEN ${sqlValid(e, s)} THEN (
         |  SELECT CASE
         |    WHEN regexp_matches(h, '^[0-9.]+$$') THEN h
         |    WHEN len(l) >= 3 AND l[-2] IN $inSet AND length(l[-1]) = 2
         |      THEN concat_ws('.', l[-3], l[-2], l[-1])
         |    WHEN len(l) >= 2 THEN concat_ws('.', l[-2], l[-1])
         |    ELSE h END
         |  FROM (SELECT $host AS h, string_split($host, '.') AS l)) END""".stripMargin
    }
  }

  def canonSql(e: String): String = {
    val s = sqlStrip(e)
    // NOTE: generated text is re-embedded in callers' stripMargin
    // blocks, so no line may START with `|` — `||` hangs at line ends
    s"""CASE WHEN ${sqlValid(e, s)} THEN (
       |  SELECT scheme || '://' || host ||
       |    CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
       |                         AND NOT (scheme = 'https' AND port = '443')
       |         THEN ':' || port ELSE '' END ||
       |    coalesce(nullif(regexp_replace(CASE WHEN path0 = '' THEN '/' ELSE path0 END, '/+$$', ''), ''), '/') ||
       |    CASE WHEN q <> '' THEN '?' || q ELSE '' END
       |  FROM (SELECT scheme, host, port, path0,
       |          array_to_string(list_filter(string_split(query0, '&'),
       |            p -> p <> '' AND NOT regexp_matches(p, '$TrackRe')), '&') AS q
       |        FROM (SELECT
       |          lower(regexp_extract($s, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
       |          ${sqlRawHost(s)} AS host,
       |          regexp_extract(${sqlHostPort(s)}, ':([0-9]+)$$', 1) AS port,
       |          regexp_extract(regexp_replace(${sqlRest(s)}, '^[^/?]*', ''), '^([^?]*)', 1) AS path0,
       |          regexp_extract(regexp_replace(${sqlRest(s)}, '^[^/?]*', ''), '\\?(.*)$$', 1) AS query0))) END""".stripMargin
  }
}

/** Codegen'd RFC 3490 ToASCII of a host string ([[UrlOps.idnAscii]]):
  * ACE/punycode for non-ASCII hosts, identity otherwise; total, never
  * throws.
  */
case class IdnHostExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, StringType}
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(h: Any): Any =
    UrlOps.idnAsciiUtf8(h.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.UrlOps.idnAsciiUtf8($h)")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): IdnHostExpr = copy(child = c)
  override def prettyName: String = "idn_host"
}

/** Codegen'd RFC 3986 reference resolution; null when unresolvable or
  * either input is null — see [[UrlOps.resolveRef]].
  */
case class UrlResolveExpr(left: org.apache.spark.sql.catalyst.expressions.Expression,
                          right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, StringType}
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, r: Any): Any =
    UrlOps.resolveRefUtf8(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) => {
      val v = ctx.freshName("resolved")
      s"""
         |UTF8String $v = graft.functions.UrlOps.resolveRefUtf8($b, $r);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): UrlResolveExpr =
    copy(left = l, right = r)
  override def prettyName: String = "url_resolve"
}
