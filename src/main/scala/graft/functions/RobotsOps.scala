package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt policy evaluation (RFC 9309) — the admission rule a crawl
  * frontier applies between URL canonicalization and the fetch: given a
  * host's robots.txt payload, a product token, and a URL path, is the
  * fetch allowed?
  *
  * Semantics implemented, per the RFC:
  *   - groups: consecutive `User-agent:` lines share the following
  *     rule block; the group whose agent token is the LONGEST
  *     case-insensitive match for the product token wins; the `*`
  *     group applies when none match; rules from same-agent groups
  *     merge.
  *   - rules: `Allow:` / `Disallow:` path patterns with `*` wildcards
  *     and a `$` end anchor; an empty `Disallow:` value permits
  *     everything (matches nothing).
  *   - decision: among rules whose pattern matches the path, the
  *     LONGEST pattern (by characters) wins; on a length tie Allow
  *     wins; no matching rule → allowed. A missing/empty/unparseable
  *     robots.txt → allowed (the RFC's unavailable-is-allow posture
  *     for 4xx; transport-level 5xx handling is the fetch stage's
  *     concern, not the evaluator's).
  *
  * Also surfaced: [[crawlDelayMs]] (the group-scoped politeness input
  * a fetch scheduler consumes) and [[sitemaps]] (global directives).
  * Percent-encoding: RFC 9309 §2.2.2 compares OCTETS, so both rule
  * patterns and paths are normalized before matching ([[normPct]]) —
  * escapes of unreserved characters (`%7E` → `~`) decode, every other
  * escape uppercases its hex (`%2f` → `%2F`, which stays distinct
  * from a literal `/`); a lone `%` or bad hex stays literal. A
  * hostile or sloppy robots.txt can therefore no longer disagree with
  * a canonical path over encoding alone.
  *
  * 100 TB shape: one pure function per (robots, agent, path) row inside
  * whole-stage codegen — the robots payload rides a broadcast or a
  * per-domain join upstream; nothing here shuffles. Matching is a
  * two-pointer wildcard walk, no regex compilation per row.
  */
object RobotsOps {

  // `*`/`$` pattern match against a path. An UNANCHORED robots pattern
  // is a PREFIX rule: it matches when the pattern consumes some prefix
  // of the path (pattern "/" + "*.php" matches "/x.phpX" via the prefix
  // "/x.php"); a trailing `$` anchors the match to the whole path.
  // Prefix-match(P, s) ⟺ full-match(P + "*", s), so both forms reduce
  // to one FULL glob match, done with the classic ITERATIVE greedy
  // last-star-backtracking walk: O(|path|·|pattern|) worst case, no
  // recursion, no exponential star fan-out — a crafted robots line
  // cannot stack-overflow or CPU-pin a task (the poison-input bar the
  // PDF/AVI/WARC codecs already meet).
  private[functions] def ruleMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat0 = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val pat = if (anchored) pat0 else pat0 + "*"
    var p = 0; var s = 0
    var starP = -1; var starS = -1
    while (s < path.length) {
      if (p < pat.length && pat.charAt(p) != '*' && pat.charAt(p) == path.charAt(s)) {
        p += 1; s += 1
      } else if (p < pat.length && pat.charAt(p) == '*') {
        starP = p; starS = s; p += 1
      } else if (starP >= 0) {
        p = starP + 1; starS += 1; s = starS
      } else return false
    }
    while (p < pat.length && pat.charAt(p) == '*') p += 1
    p == pat.length
  }

  private[functions] final case class Rule(allow: Boolean, pattern: String)

  private def isUnreservedOctet(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') || (v >= '0' && v <= '9') ||
      v == '-' || v == '.' || v == '_' || v == '~'

  /** RFC 9309 §2.2.2 octet normalization for rule patterns AND paths:
    * percent-escapes of unreserved characters decode (`%7E` → `~`),
    * any other escape uppercases its hex (`%2f` → `%2F` — reserved
    * octets stay encoded, so an escaped `/` remains distinct from a
    * literal one); a lone `%` or non-hex digits pass through
    * literally. `*` and `$` never come OUT of an escape (they are not
    * unreserved), so normalization cannot conjure wildcards/anchors.
    */
  private[functions] def normPct(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var p = 0
    while (p < s.length) {
      val c = s.charAt(p)
      if (c == '%' && p + 2 < s.length &&
          Character.digit(s.charAt(p + 1), 16) >= 0 &&
          Character.digit(s.charAt(p + 2), 16) >= 0) {
        val v = (Character.digit(s.charAt(p + 1), 16) << 4) |
          Character.digit(s.charAt(p + 2), 16)
        if (isUnreservedOctet(v)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(p + 1)))
          sb.append(Character.toUpperCase(s.charAt(p + 2)))
        }
        p += 3
      } else { sb.append(c); p += 1 }
    }
    sb.toString
  }

  /** Parse the document into groups of (agent tokens, rules,
    * crawl-delays). Agent matching is case-insensitive substring of
    * the product token (the practical superset of the RFC's prefix
    * matching — documented approximation), longest token wins, `*` is
    * the fallback; every group carrying a chosen token merges.
    */
  private final case class Group(
      tokens: scala.collection.mutable.ArrayBuffer[String],
      rules: scala.collection.mutable.ArrayBuffer[Rule],
      delays: scala.collection.mutable.ArrayBuffer[Long])

  private def chosenGroups(robots: String, agent: String): Seq[Group] = {
    if (robots == null || robots.isEmpty) return Seq.empty
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var lastWasAgent = false
    robots.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            val token = value.toLowerCase(java.util.Locale.ROOT)
            if (lastWasAgent && groups.nonEmpty) groups.last.tokens += token
            else groups += Group(scala.collection.mutable.ArrayBuffer(token),
              scala.collection.mutable.ArrayBuffer.empty, scala.collection.mutable.ArrayBuffer.empty)
            lastWasAgent = true
          case "allow" | "disallow" =>
            // empty Disallow permits everything: drop it (matches nothing);
            // rules before any User-agent line have no group and are ignored
            if (groups.nonEmpty && !(key == "disallow" && value.isEmpty))
              groups.last.rules += Rule(key == "allow", value)
            lastWasAgent = false
          case "crawl-delay" =>
            if (groups.nonEmpty)
              try groups.last.delays += math.round(value.toDouble * 1000)
              catch { case _: NumberFormatException => () }
            lastWasAgent = false
          case _ => lastWasAgent = false
        }
      }
    }
    val tokens = groups.flatMap(_.tokens).filter(a => a != "*" && agentLc.contains(a))
    val chosen: Set[String] =
      if (tokens.nonEmpty) { val best = tokens.map(_.length).max; tokens.filter(_.length == best).toSet }
      else Set("*")
    groups.filter(_.tokens.exists(chosen.contains)).toSeq
  }

  private[functions] def rulesFor(robots: String, agent: String): Seq[Rule] =
    chosenGroups(robots, agent).flatMap(_.rules)

  /** The RFC 9309 decision for (robots, agent, path). Patterns and
    * path compare octet-normalized ([[normPct]]); longest-match
    * precedence uses the NORMALIZED pattern length (the octet count
    * the RFC's "most specific" rule is defined over).
    */
  def allowed(robots: String, agent: String, path: String): Boolean = {
    val rules = rulesFor(robots, agent)
    val p = normPct(path)
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      val pat = normPct(r.pattern)
      if (pat.length >= bestLen && ruleMatches(pat, p)) {
        if (pat.length > bestLen) { bestLen = pat.length; bestAllow = r.allow }
        else if (r.allow) bestAllow = true // tie: Allow wins
      }
    }
    bestAllow
  }

  def allowedUtf8(robots: UTF8String, agent: UTF8String, path: UTF8String): Boolean =
    allowed(if (robots == null) "" else robots.toString, agent.toString, path.toString)

  /** `Crawl-delay` of the group that applies to `agent` (non-standard
    * but ubiquitous; a scheduler's politeness input), in integer
    * MILLISECONDS so the value gates exactly cross-engine. -1 when the
    * chosen group declares none (the expression maps it to null) —
    * note a specific group with no delay does NOT fall back to `*`'s
    * delay: group selection REPLACES the default group entirely, same
    * as for rules. When merged groups declare several values, the
    * largest (most polite) wins.
    */
  def crawlDelayMs(robots: String, agent: String): Long = {
    val delays = chosenGroups(robots, agent).flatMap(_.delays)
    if (delays.isEmpty) -1L else delays.max
  }

  /** Every `Sitemap:` URL in the document (global directives, not
    * group-scoped per the sitemaps protocol), in order.
    */
  def sitemaps(robots: String): Seq[String] =
    if (robots == null || robots.isEmpty) Seq.empty
    else robots.linesIterator.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0 && line.substring(0, i).trim.equalsIgnoreCase("sitemap"))
        Some(line.substring(i + 1).trim).filter(_.nonEmpty)
      else None
    }.toSeq

  def crawlDelayUtf8(robots: UTF8String, agent: UTF8String): Long =
    crawlDelayMs(if (robots == null) "" else robots.toString, agent.toString)

  def sitemapsArray(robots: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sitemaps(if (robots == null) "" else robots.toString)
        .map(UTF8String.fromString).toArray[Any])

  def robotsAllowed(robots: Column, agent: Column, path: Column): Column =
    GraftExpr.toColumn(RobotsAllowedExpr(
      GraftExpr.toExpr(robots), GraftExpr.toExpr(agent), GraftExpr.toExpr(path)))
  def robotsCrawlDelay(robots: Column, agent: Column): Column =
    GraftExpr.toColumn(RobotsCrawlDelayExpr(GraftExpr.toExpr(robots), GraftExpr.toExpr(agent)))
  def robotsSitemaps(robots: Column): Column =
    GraftExpr.toColumn(RobotsSitemapsExpr(GraftExpr.toExpr(robots)))
}

/** Group-scoped Crawl-delay in ms; null when the applicable group
  * declares none.
  */
case class RobotsCrawlDelayExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def nullSafeEval(r: Any, a: Any): Any = {
    val ms = RobotsOps.crawlDelayUtf8(r.asInstanceOf[UTF8String], a.asInstanceOf[UTF8String])
    if (ms < 0) null else ms
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, a) => {
      val v = ctx.freshName("delayMs")
      s"""
         |long $v = graft.functions.RobotsOps.crawlDelayUtf8($r, $a);
         |if ($v < 0) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RobotsCrawlDelayExpr =
    copy(left = l, right = r)
  override def prettyName: String = "robots_crawl_delay"
}

/** All global Sitemap directives, in document order. */
case class RobotsSitemapsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullSafeEval(r: Any): Any =
    RobotsOps.sitemapsArray(r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, r => s"graft.functions.RobotsOps.sitemapsArray($r)")
  override protected def withNewChildInternal(c: Expression): RobotsSitemapsExpr = copy(child = c)
  override def prettyName: String = "robots_sitemaps"
}

/** Codegen'd robots.txt decision: boolean, null only when an input is
  * null (a MISSING robots payload should be passed as '' — allowed —
  * not null, so the null actually signals "no row").
  */
case class RobotsAllowedExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType, StringType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(r: Any, a: Any, p: Any): Any =
    RobotsOps.allowedUtf8(r.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, a, p) => s"graft.functions.RobotsOps.allowedUtf8($r, $a, $p)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RobotsAllowedExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "robots_allowed"
}
