package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** RFC 3986 canonicalization contracts: each normalization rule
  * independently, the adversarial corners, the reject matrix, and the
  * two-spelling collapse the key's group-by relies on.
  */
class UrlSpec extends AnyFunSuite {

  private def c(u: String): String = UrlCanonical.compute(u)

  test("scheme/host case, default ports, fragments") {
    assert(c("HTTP://Example.COM/a") == "http://example.com/a")
    assert(c("http://example.com:80/a") == "http://example.com/a")
    assert(c("https://example.com:443/a") == "https://example.com/a")
    assert(c("http://example.com:443/a") == "http://example.com:443/a",
      "443 is NOT http's default")
    assert(c("https://example.com:8443/a") == "https://example.com:8443/a")
    assert(c("http://example.com/a#frag") == "http://example.com/a")
    assert(c("http://example.com#frag") == "http://example.com/")
    // userinfo preserved verbatim (case-sensitive per the RFC)
    assert(c("http://User:Pw@Example.com/") == "http://User:Pw@example.com/")
  }

  test("dot-segment resolution") {
    assert(c("http://h/a/./b") == "http://h/a/b")
    assert(c("http://h/a/b/../c") == "http://h/a/c")
    assert(c("http://h/a/../../b") == "http://h/b", "leading .. clamps at root")
    assert(c("http://h/a/b/..") == "http://h/a/")
    assert(c("http://h/a/.") == "http://h/a/")
    assert(c("http://h") == "http://h/", "empty path with authority becomes /")
    assert(c("http://h/a//b") == "http://h/a//b", "inner empty segment kept")
  }

  test("percent-encoding: unreserved decode, reserved case-normalize") {
    assert(c("http://h/%74%6fk") == "http://h/tok", "unreserved octets decode")
    assert(c("http://h/a%2fb") == "http://h/a%2Fb",
      "reserved %2F stays encoded, uppercased — decoding would change structure")
    assert(c("http://h/%7e%41") == "http://h/~A")
    // %2E participates in dot-segment removal AFTER decoding
    assert(c("http://h/a/%2E%2E/b") == "http://h/b")
    assert(c("http://h/p?x=%3d&y=%41") == "http://h/p?x=%3D&y=A")
  }

  test("query: sort, empty params dropped, bare ? dropped") {
    assert(c("http://h/p?b=2&a=1") == "http://h/p?a=1&b=2")
    assert(c("http://h/p?b=2&&a=1&") == "http://h/p?a=1&b=2")
    assert(c("http://h/p?") == "http://h/p")
    assert(c("http://h/p?a") == "http://h/p?a")
  }

  test("IPv6 hosts, rejects") {
    assert(c("http://[2001:DB8::1]/x") == "http://[2001:db8::1]/x")
    assert(c("http://[2001:db8::1]:8080/x") == "http://[2001:db8::1]:8080/x")
    assert(c("mailto:a@b.com") == null, "opaque forms reject")
    assert(c("not a url") == null)
    assert(c("://h/p") == null)
    assert(c("1http://h/p") == null, "scheme must start with a letter")
    assert(c("http://h/%zz") == null, "torn percent escape rejects")
    assert(c("http://h/%4") == null)
    assert(c("http://h:80x/p") == null, "non-numeric port rejects")
    assert(c("http:///p") == null, "empty host rejects")
    assert(c("http://[::1/p") == null, "unclosed bracket rejects")
  }

  test("fixture: both messy spellings collapse to the canonical formula") {
    for (doc <- 0L to 39L) {
      assert(c(UrlSynth.messy(doc)) == UrlSynth.canonical(doc),
        s"doc $doc variant 0: ${UrlSynth.messy(doc)}")
      assert(c(UrlSynth.messy2(doc)) == UrlSynth.canonical(doc),
        s"doc $doc variant 1: ${UrlSynth.messy2(doc)}")
      assert(c(UrlSynth.canonical(doc)) == UrlSynth.canonical(doc),
        s"doc $doc: canonicalization must be idempotent")
    }
  }

  test("composition: robots gating on the canonical path") {
    // the crawl chain: canonicalize, then evaluate robots on the PATH
    val canon = c("HTTP://Example.com/./private2/x/../a#s")
    assert(canon == "http://example.com/private2/a")
    val path = canon.substring("http://example.com".length)
    val robots = "User-agent: *\nDisallow: /private2/\n"
    val d = RobotsAllowed.compute(robots, "graftbot", path)
    assert(!d.getBoolean(0), "the dot-segment dodge must not defeat robots")
  }
}
