package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 contracts the fixture key can't carry: wildcard and
  * $-anchored paths, agent specificity, longest-match/Allow-wins, and
  * parser robustness.
  */
class RobotsSpec extends AnyFunSuite {

  private def decide(robots: String, agent: String, path: String) = {
    val r = RobotsAllowed.compute(robots, agent, path)
    (r.getBoolean(0), if (r.isNullAt(1)) null else r.getUTF8String(1).toString)
  }

  test("wildcards and the $ anchor") {
    val robots =
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /a/*/private
        |Allow: /a/b/private/open
        |""".stripMargin
    assert(decide(robots, "bot", "/doc.pdf") == ((false, "/*.pdf$")))
    assert(decide(robots, "bot", "/doc.pdfx")._1, "$ must anchor the end")
    assert(decide(robots, "bot", "/a/b/private/z") ==
      ((false, "/a/*/private")))
    // Allow with the longer path beats the wildcard disallow
    assert(decide(robots, "bot", "/a/b/private/open/f")._1)
    assert(decide(robots, "bot", "/b/c")._1, "no rule matches")
  }

  test("agent specificity: the longest matching token's group applies") {
    val robots =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: graft
        |Disallow: /x/
        |
        |User-agent: graftbot
        |Allow: /
        |""".stripMargin
    // 'graftbot' token: its exact group wins over 'graft' and '*'
    assert(decide(robots, "graftbot", "/anything")._1)
    // 'graftcrawler' matches only 'graft': that group's rules apply
    assert(decide(robots, "graftcrawler", "/x/y") == ((false, "/x/")))
    assert(decide(robots, "graftcrawler", "/y")._1)
    // an unrelated bot falls to '*': everything disallowed
    assert(!decide(robots, "otherbot", "/y")._1)
  }

  test("ties go to Allow; empty values and unknown directives are inert") {
    val robots =
      """User-agent: *
        |# both rules match /dir/ with equal length
        |Disallow: /dir/
        |Allow: /dir/
        |Disallow:
        |Crawl-delay: 10
        |Sitemap: https://e.com/s.xml
        |Nonsense: value
        |""".stripMargin
    assert(decide(robots, "bot", "/dir/page")._1, "equal length: Allow wins")
    assert(decide(robots, "bot", "/other")._1, "empty Disallow never matches")
  }

  test("multiple consecutive User-agent lines share one rule block") {
    val robots =
      """User-agent: alpha
        |User-agent: beta
        |Disallow: /shared/
        |""".stripMargin
    assert(!decide(robots, "alpha", "/shared/x")._1)
    assert(!decide(robots, "beta", "/shared/x")._1)
    assert(decide(robots, "gamma", "/shared/x")._1, "no group for gamma")
  }

  test("fixture decisions match the oracle formulas across 20 seeds") {
    for (doc <- 0L to 19L; u <- 0 until RobotsSynth.NUrls) {
      val path = RobotsSynth.url(doc, u)
      val (allowed, _) = decide(RobotsSynth.robotsTxt(doc), "graftbot", path)
      val k = RobotsSynth.k(doc)
      val j = RobotsSynth.j(doc)
      val expect =
        if (RobotsSynth.hasBotGroup(doc)) !path.startsWith(s"/tmp$j/")
        else !(path.startsWith(s"/private$k/") &&
          !path.startsWith(s"/private$k/public/"))
      assert(allowed == expect, s"doc $doc url $u ($path)")
    }
  }

  test("duplicate agent groups: the FIRST declared group wins ties") {
    // two separate groups naming the same token are NOT merged (the
    // disclosed divergence from the RFC's merge rule) — and the first
    // one declared must win, exactly as the scaladoc says (r14 ADVICE:
    // the unreversed group walk silently made the LAST win)
    val robots =
      """User-agent: graftbot
        |Disallow: /first/
        |
        |User-agent: graftbot
        |Allow: /
        |""".stripMargin
    assert(decide(robots, "graftbot", "/first/x") == ((false, "/first/")))
    assert(decide(robots, "graftbot", "/other")._1,
      "first group has no rule for /other: allowed by no-match")
    // same for duplicate '*' groups
    val star =
      """User-agent: *
        |Disallow: /a/
        |
        |User-agent: *
        |Allow: /a/
        |""".stripMargin
    assert(decide(star, "anybot", "/a/x") == ((false, "/a/")))
  }

  test("wildcard match is linear: the crafted backtracking bomb completes instantly") {
    // the r14 ADVICE CPU-bomb shape: many '*'s that each used to fork
    // a recursive scan — exponential before, O(path * pattern) now
    val bomb = "/" + "*a" * 24 + "*b$"
    val path = "/" + "a" * 400
    val t0 = System.nanoTime()
    assert(!RobotsAllowed.pathMatches(bomb, path))
    assert(RobotsAllowed.pathMatches("/" + "*a" * 24 + "*b$", "/" + "a" * 60 + "b"))
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 2000, s"wildcard match took ${elapsedMs}ms")
    // randomized equivalence against the JDK regex engine (prefix
    // semantics = lookingAt, anchored = matches)
    val rnd = new scala.util.Random(9157)
    for (_ <- 0 until 4000) {
      val pat = "/" + Seq.fill(rnd.nextInt(8))(
        "ab*".charAt(rnd.nextInt(3))).mkString +
        (if (rnd.nextBoolean()) "$" else "")
      val p = "/" + Seq.fill(rnd.nextInt(10))(
        "ab".charAt(rnd.nextInt(2))).mkString
      val anchored = pat.endsWith("$")
      val core = if (anchored) pat.dropRight(1) else pat
      val rx = java.util.regex.Pattern.compile(
        core.map {
          case '*' => ".*"
          case c => java.util.regex.Pattern.quote(c.toString)
        }.mkString)
      val m = rx.matcher(p)
      val expect = if (anchored) m.matches() else m.lookingAt()
      assert(RobotsAllowed.pathMatches(pat, p) == expect,
        s"pattern [$pat] path [$p]")
    }
  }

  test("percent-encoding octet comparison (RFC 9309 2.2.2)") {
    // unreserved octets decode on both sides before matching
    val robots =
      """User-agent: *
        |Disallow: /priv%61te/
        |Allow: /private/%70ub
        |""".stripMargin
    assert(decide(robots, "bot", "/private/x") == ((false, "/private/")))
    assert(!decide(robots, "bot", "/priv%61te/x")._1)
    assert(decide(robots, "bot", "/private/pub/y")._1,
      "Allow with an encoded octet must win by length")
    // an encoded slash is NOT a path slash; hex case is insensitive
    val r2 = "User-agent: *\nDisallow: /a%2Fb\n"
    assert(decide(r2, "bot", "/a/b")._1, "%2F stays distinct from /")
    assert(!decide(r2, "bot", "/a%2fb")._1, "octet match is hex-case-blind")
    // an encoded * is a literal octet, never a wildcard
    val r3 = "User-agent: *\nDisallow: /x%2Ay\n"
    assert(decide(r3, "bot", "/xABCy")._1, "%2A must not expand as a wildcard")
    assert(!decide(r3, "bot", "/x%2ay")._1)
    // torn escapes fail open to raw-text comparison, never throw
    val r4 = "User-agent: *\nDisallow: /a%zq\n"
    assert(!decide(r4, "bot", "/a%zq/x")._1)
    assert(decide(r4, "bot", "/azq")._1)
  }

  test("fuzz: garbage and truncations classify, never throw") {
    val base = RobotsSynth.robotsTxt(7L)
    var kk = 0
    while (kk < base.length) {
      RobotsAllowed.compute(base.substring(0, kk), "graftbot", "/x")
      kk += 5
    }
    RobotsAllowed.compute("::::\n\n##\nUser-agent\nAllow /", "b", "/")
    RobotsAllowed.compute("", "b", "/p")
  }
}
