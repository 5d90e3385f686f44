package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309) — the crawl-GOVERNANCE piece of
  * the WARC family: respectful corpus crawlers gate every fetch on
  * it, so a pipeline that re-filters an existing crawl against
  * updated rules needs the decision as a per-row expression.
  *
  * `robots_allowed(robots, agent, path)` implements the RFC's
  * matching model:
  *  - GROUPS: consecutive `User-agent:` lines share the following
  *    rules; the crawler picks the group whose agent token is the
  *    LONGEST case-insensitive prefix of its product token, falling
  *    back to the `*` group; exactly ONE group applies (rules from
  *    unselected groups never leak in — pinned by the fixture).
  *  - RULES: within the selected group, the `Allow`/`Disallow` rule
  *    with the LONGEST matching path wins; ties go to Allow; an
  *    empty-path rule never matches; no match ⇒ allowed. Paths
  *    support `*` wildcards and the `$` end anchor.
  *  - Lines: comments stripped at `#`, unknown directives ignored
  *    (Crawl-delay, Sitemap — per the RFC's extensibility rule),
  *    field names case-insensitive.
  *
  * Percent-encoding equivalence (RFC 9309 §2.2.2's octet
  * comparison): both rule paths and the query path are normalized
  * with the RFC 3986 rules [[UrlCanonical]] uses — unreserved octets
  * decode, the rest uppercase — so `/a%62c` matches `/abc` while an
  * encoded `%2F` stays distinct from a real slash and encoded
  * `%2A`/`%24` never become wildcards or anchors. A torn escape
  * leaves that component compared as raw text (robots files are
  * messy; rejecting the whole file would fail open).
  *
  * Honest scope: two SEPARATE groups naming the same agent token are
  * not merged (the RFC merges them; the first such group wins here).
  * Disclosed, not guessed.
  */
case class RobotsAllowed(robots: Expression, agent: Expression,
    path: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = robots
  override def second: Expression = agent
  override def third: Expression = path

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, StringType)
  override def dataType: DataType = RobotsAllowed.schema

  override def nullSafeEval(r: Any, a: Any, p: Any): Any =
    RobotsAllowed.compute(r.asInstanceOf[UTF8String].toString,
      a.asInstanceOf[UTF8String].toString,
      p.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, a, p) =>
      s"org.apache.spark.sql.graftnative.RobotsAllowed.compute(" +
        s"$r.toString(), $a.toString(), $p.toString())")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(robots = f, agent = s, path = t)
}

object RobotsAllowed {
  val schema: StructType = StructType(Seq(
    StructField("allowed", BooleanType, nullable = false),
    StructField("rule_path", StringType, nullable = true)))

  private final case class Rule(allow: Boolean, path: String)

  /** Does `rulePath` (with `*` wildcards and an optional trailing `$`
    * anchor) match a prefix of `path`?
    *
    * Linear greedy two-pointer wildcard match (one saved backtrack
    * point per `*`, re-anchored forward only): worst-case
    * O(|path|·|pattern|), never exponential — robots.txt is untrusted
    * crawl input, and a crafted many-wildcard rule (`…a*a*a*…b$`) must
    * not become a per-row CPU bomb (the MaxInflated discipline).
    * A non-anchored rule is a prefix match, which is exactly a full
    * match of `pattern + "*"`.
    */
  private[graftnative] def pathMatches(rulePath: String, path: String): Boolean = {
    val anchored = rulePath.endsWith("$")
    val base = if (anchored) rulePath.substring(0, rulePath.length - 1)
      else rulePath
    val pat = if (anchored) base else base + "*"
    var s = 0
    var p = 0
    var star = -1 // pattern index of the last '*' seen
    var mark = 0 // path index that star is currently matched up to
    while (s < path.length) {
      if (p < pat.length && pat.charAt(p) == '*') {
        star = p
        p += 1
        mark = s
      } else if (p < pat.length && pat.charAt(p) == path.charAt(s)) {
        p += 1
        s += 1
      } else if (star >= 0) {
        // widen the last star by one char and retry after it
        mark += 1
        s = mark
        p = star + 1
      } else return false
    }
    while (p < pat.length && pat.charAt(p) == '*') p += 1
    p == pat.length
  }

  /** §2.2.2 octet normalization with the fail-open fallback. */
  private def norm(s: String): String = {
    val n = UrlCanonical.pctNorm(s)
    if (n == null) s else n
  }

  def compute(robots: String, agent: String, rawPath: String): InternalRow = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val path = norm(rawPath)
    // parse into (agentToken → rules) groups
    var groups = List.empty[(List[String], List[Rule])]
    var curAgents = List.empty[String]
    var curRules = List.empty[Rule]
    var agentRun = false // consecutive User-agent lines accumulate
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups = (curAgents, curRules.reverse) :: groups
      curAgents = List.empty
      curRules = List.empty
    }
    robots.split("\r\n|\n|\r", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          field match {
            case "user-agent" =>
              if (!agentRun) flush()
              curAgents = value.toLowerCase(java.util.Locale.ROOT) :: curAgents
              agentRun = true
            case "allow" =>
              agentRun = false
              if (value.nonEmpty)
                curRules = Rule(allow = true, norm(value)) :: curRules
            case "disallow" =>
              agentRun = false
              if (value.nonEmpty)
                curRules = Rule(allow = false, norm(value)) :: curRules
            case _ => agentRun = false // Crawl-delay, Sitemap, unknown
          }
        }
      }
    }
    flush()
    // group selection: longest agent token that prefixes ours; '*' last.
    // Groups were accumulated by prepending, so reverse to DOCUMENT
    // order — with the strict '>' that makes the FIRST group declaring
    // a duplicate agent token win ties, the behavior the scaladoc
    // discloses (r14 ADVICE: the unreversed walk made the LAST win).
    var best: List[Rule] = null
    var bestLen = -1
    groups.reverse.foreach { case (agents, rules) =>
      agents.foreach { a =>
        if (a == "*") {
          if (bestLen < 0) { best = rules; bestLen = 0 }
        } else if (agentLc.startsWith(a) && a.length > bestLen) {
          best = rules
          bestLen = a.length
        }
      }
    }
    if (best == null)
      return new GenericInternalRow(Array[Any](true, null))
    // longest-match rule; Allow wins ties
    var winner: Rule = null
    best.foreach { r =>
      if (pathMatches(r.path, path)) {
        if (winner == null || r.path.length > winner.path.length ||
          (r.path.length == winner.path.length && r.allow && !winner.allow))
          winner = r
      }
    }
    if (winner == null) new GenericInternalRow(Array[Any](true, null))
    else new GenericInternalRow(Array[Any](winner.allow,
      UTF8String.fromString(winner.path)))
  }
}

/** Fixture ENCODER: a robots.txt with a `*` group (Disallow a
  * /privateK/ subtree, Allow its /public/ corner) and — on
  * `doc mod 4 != 0` — a more specific `graftbot` group (Disallow
  * /tmpJ/, Allow /), plus comments, a Crawl-delay, and a Sitemap
  * line the parser must skip. The paired URL formulas walk both
  * groups' edges (the no-trailing-slash prefix trap included), so
  * group EXCLUSIVITY and longest-match both sit on the oracle hash.
  */
object RobotsSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def hasBotGroup(doc: Long): Boolean = fm(doc, 4) != 0
  def k(doc: Long): Int = fm(doc, 5)
  def j(doc: Long): Int = fm(doc, 3)

  def robotsTxt(doc: Long): String = {
    val sb = new StringBuilder()
    sb.append("# graft fixture ").append(doc).append('\n')
    sb.append("User-agent: *\n")
    sb.append("Disallow: /private").append(k(doc)).append("/\n")
    sb.append("Allow: /private").append(k(doc)).append("/public/\n")
    sb.append("Crawl-delay: 2\n\n")
    if (hasBotGroup(doc)) {
      sb.append("User-agent: graftbot\n")
      sb.append("Disallow: /tmp").append(j(doc)).append("/\n")
      sb.append("Allow: /\n")
    }
    sb.append("Sitemap: https://example.com/sitemap.xml\n")
    for (k <- 0 until extraSitemaps(doc))
      sb.append(s"Sitemap: https://ex${fm(doc, 7)}.org/maps/s$k.xml\n")
    sb.toString
  }

  /** Beyond the constant first line: `doc mod 2` extra sitemap
    * directives (inert for robots_allowed, data for robots_sitemaps).
    */
  def extraSitemaps(doc: Long): Int = fm(doc, 2)

  val NUrls = 8
  def url(doc: Long, u: Int): String = u match {
    case 0 => s"/ok/${fm(doc, 7)}"
    case 1 => s"/private${k(doc)}/a"
    case 2 => s"/private${k(doc)}/public/x"
    case 3 => s"/private${k(doc) + 1}/b"
    case 4 => s"/tmp${j(doc)}/y"
    case 5 => s"/tmp${j(doc) + 1}/z"
    case 6 => s"/private${k(doc)}/public" // no trailing slash: the trap
    case _ => "/"
  }
}

/** Expression wrapping [[RobotsSynth.robotsTxt]]. */
case class SynthRobots(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any = {
    val s = RobotsSynth.robotsTxt(doc.asInstanceOf[Long])
    if (s == null) null else UTF8String.fromString(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      String s = org.apache.spark.sql.graftnative.RobotsSynth.robotsTxt($d);
      if (s == null) { ${ev.isNull} = true; }
      else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(s); }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `Sitemap:` directive collection from robots.txt (RFC 9309 §2.2.4 /
  * sitemaps.org): the governance→discovery link — crawlers learn
  * where a site's sitemaps live from exactly these lines. Values are
  * absolute URLs taken as given (canonicalize downstream), collected
  * in document order from anywhere in the file (the directive is
  * group-independent per the spec); comments and all other fields are
  * ignored.
  */
case class RobotsSitemaps(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    RobotsSitemaps.compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftnative.RobotsSitemaps.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RobotsSitemaps {
  def compute(robots: String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val out = new java.util.ArrayList[Any]()
    robots.split("\r\n|\n|\r", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
        line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) out.add(UTF8String.fromString(v))
      }
    }
    val arr = new Array[Any](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

object RobotsFunctions {
  /** Column API: RFC 9309 allow/deny decision for (robots, agent, path). */
  def robots_allowed(robots: Column, agent: Column, path: Column): Column =
    ExpressionUtils.column(RobotsAllowed(
      ExpressionUtils.expression(robots),
      ExpressionUtils.expression(agent),
      ExpressionUtils.expression(path)))

  /** Column API: two-group robots.txt fixture from a doc seed. */
  def synth_robots(doc: Column): Column =
    ExpressionUtils.column(SynthRobots(ExpressionUtils.expression(doc)))

  /** Column API: Sitemap-directive collection from robots.txt. */
  def robots_sitemaps(robots: Column): Column =
    ExpressionUtils.column(RobotsSitemaps(ExpressionUtils.expression(robots)))
}
