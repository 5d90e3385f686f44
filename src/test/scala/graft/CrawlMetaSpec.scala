package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap and feed parsing contracts: both dialects' roundtrips,
  * the corners that break naive parsers, and reject sweeps.
  */
class CrawlMetaSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  test("sitemap: urlset and sitemapindex roundtrip across 25 seeds") {
    for (doc <- 0L to 24L) {
      val r = SitemapUrls.compute(SitemapSynth.sitemapXml(doc))
      val kind = if (SitemapSynth.isIndex(doc)) "sitemapindex" else "urlset"
      assert(r.getUTF8String(0).toString == kind, s"doc $doc kind")
      val ne = SitemapSynth.nEntries(doc)
      assert(r.getInt(1) == ne, s"doc $doc entries")
      for (i <- 0 until ne) {
        val e = r.getArray(2).getStruct(i, 3)
        assert(e.getUTF8String(0).toString == SitemapSynth.loc(doc, i),
          s"doc $doc entry $i loc (entity decode)")
        if (SitemapSynth.hasLastmod(doc, i))
          assert(e.getUTF8String(1).toString == SitemapSynth.lastmod(doc, i))
        else assert(e.isNullAt(1))
        if (SitemapSynth.hasPriority(doc, i))
          assert(e.getUTF8String(2).toString == SitemapSynth.priority(doc, i))
        else assert(e.isNullAt(2))
      }
    }
  }

  test("sitemap: rejects — anonymous entry, mixed kinds, torn markup") {
    def kind(xml: String): String =
      SitemapUrls.compute(xml).getUTF8String(0).toString
    assert(kind("<urlset><url><lastmod>2025-01-01</lastmod></url></urlset>") ==
      "unknown", "an entry without loc rejects")
    assert(kind("<urlset><sitemap><loc>x</loc></sitemap></urlset>") ==
      "unknown", "a sitemap entry inside urlset rejects")
    assert(kind("<urlset><url><loc>x</loc>") == "unknown", "torn entry")
    assert(kind("<html><body>not a sitemap</body></html>") == "unknown")
    assert(kind("") == "unknown")
    val ok = SitemapSynth.sitemapXml(3L)
    var k = 0
    while (k < ok.length) { SitemapUrls.compute(ok.substring(0, k)); k += 17 }
  }

  test("feed: RSS and Atom roundtrip across 25 seeds") {
    for (doc <- 0L to 24L) {
      val r = FeedEntries.compute(FeedSynth.feedXml(doc))
      val fmt = if (FeedSynth.isAtom(doc)) "atom" else "rss"
      assert(r.getUTF8String(0).toString == fmt, s"doc $doc format")
      assert(r.getUTF8String(1).toString == FeedSynth.feedTitle(doc),
        s"doc $doc feed title (entity decode)")
      val ne = FeedSynth.nEntries(doc)
      assert(r.getInt(2) == ne, s"doc $doc entries")
      for (i <- 0 until ne) {
        val e = r.getArray(3).getStruct(i, 3)
        assert(e.getUTF8String(0).toString == FeedSynth.entryTitle(doc, i),
          s"doc $doc entry $i title (CDATA/entity lanes)")
        assert(e.getUTF8String(1).toString == FeedSynth.entryLink(doc, i),
          s"doc $doc entry $i link (alternate-wins for Atom)")
        if (FeedSynth.hasTs(doc, i))
          assert(e.getUTF8String(2).toString == FeedSynth.entryTs(doc, i))
        else assert(e.isNullAt(2))
      }
    }
  }

  test("feed: link precedence, missing fields, rejects") {
    // Atom: an enclosure-only entry falls back to... nothing (no
    // alternate, enclosure rel != alternate) — link stays null
    val encOnly = FeedEntries.compute(
      """<feed><title>t</title><entry><title>e</title>
        |<link rel="enclosure" href="https://cdn/x.mp3"/></entry></feed>""".stripMargin)
    assert(encOnly.getUTF8String(0).toString == "atom")
    assert(encOnly.getArray(3).getStruct(0, 3).isNullAt(1),
      "enclosure links are not the entry link")
    // a bare href (no rel) counts as the link
    val bare = FeedEntries.compute(
      "<feed><entry><link href=\"https://h/p\"/></entry></feed>")
    assert(bare.getArray(3).getStruct(0, 3).getUTF8String(1).toString ==
      "https://h/p")
    def fmt(xml: String): String =
      FeedEntries.compute(xml).getUTF8String(0).toString
    assert(fmt("<html>not a feed</html>") == "unknown")
    assert(fmt("<rss><channel><item><title>x</title>") == "unknown", "torn")
    assert(fmt("") == "unknown")
    val ok = FeedSynth.feedXml(2L) // the CDATA lane
    assert(ok.contains("CDATA"))
    var k = 0
    while (k < ok.length) { FeedEntries.compute(ok.substring(0, k)); k += 13 }
  }

  test("composition: sitemap locs gate through canonicalization + robots") {
    // discovery → canonicalize → robots: the crawl-side chain
    val r = SitemapUrls.compute(SitemapSynth.sitemapXml(1L))
    val loc = r.getArray(2).getStruct(0, 3).getUTF8String(0).toString
    val canon = UrlCanonical.compute(loc)
    assert(canon != null && canon.startsWith("https://ex1.org/"))
    val path = canon.substring("https://ex1.org".length)
    val robots = "User-agent: *\nDisallow: /page\n"
    assert(!RobotsAllowed.compute(robots, "graftbot", path).getBoolean(0))
  }
}
