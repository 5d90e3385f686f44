package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** MediaWiki dump parsing + wikitext stripping contracts. */
class WikiSpec extends AnyFunSuite {

  test("dump roundtrip: pages, redirects, entity decoding across 24 seeds") {
    for (doc <- 0L to 23L) {
      val r = MediawikiPages.compute(WikiSynth.dumpXml(doc))
      assert(r.getUTF8String(0).toString == "mediawiki", s"doc $doc rejected")
      val np = WikiSynth.nPages(doc)
      assert(r.getInt(1) == np, s"doc $doc pages")
      for (p <- 0 until np) {
        val row = r.getArray(2).getStruct(p, 6)
        assert(row.getUTF8String(0).toString == WikiSynth.title(doc, p),
          s"doc $doc page $p title (entity decode)")
        assert(row.getLong(1) == WikiSynth.pageId(doc, p),
          s"doc $doc page $p id — the PAGE id, not the revision's")
        assert(row.getInt(2) == 0)
        if (WikiSynth.isRedirect(doc, p))
          assert(row.getUTF8String(3).toString == s"Article $doc/0 <x>")
        else assert(row.isNullAt(3))
        assert(row.getUTF8String(4).toString == WikiSynth.timestamp(doc, p))
        assert(row.getUTF8String(5).toString == WikiSynth.wikitext(doc, p),
          s"doc $doc page $p raw text (double-escape decode)")
      }
    }
  }

  test("wikitext stripping: the fixture articles hit the closed form") {
    for (doc <- 0L to 23L; p <- 0 until WikiSynth.nPages(doc)
         if !WikiSynth.isRedirect(doc, p)) {
      val got = WikitextStrip.compute(WikiSynth.wikitext(doc, p))
      assert(got == WikiSynth.strippedText(doc, p),
        s"doc $doc page $p:\n[$got]\nvs\n[${WikiSynth.strippedText(doc, p)}]")
    }
  }

  test("wikitext rules independently") {
    def w(s: String): String = WikitextStrip.compute(s)
    assert(w("{{cite|a={{nested}}|b}}x") == "x", "templates drop with nesting")
    assert(w("{| \n| a {| inner |} b\n|}done") == "done", "tables drop")
    assert(w("[[Plain]] and [[T|label]]") == "Plain and label")
    assert(w("[[File:x.jpg|thumb|cap with [[Link]]]]after") == "after")
    assert(w("[[Category:Hidden]]text") == "text")
    assert(w("[https://u.org label here] [https://bare.org]") == "label here")
    assert(w("'''b''' ''i'' '''''bi'''''") == "b i bi")
    assert(w("a<ref>gone</ref>b<ref name=x/>c") == "abc")
    assert(w("<nowiki>'''not bold'''</nowiki>") == "'''not bold'''")
    assert(w("x<br/>y <span class=\"z\">kept</span>") == "xy kept")
    assert(w("== H2 ==\n=== H3 ===") == "H2\nH3")
    assert(w("* a\n** b\n# c\n: d\n; e") == "a\nb\nc\nd\ne")
    assert(w("a\n----\nb") == "a\n\nb")
    assert(w("a\n\n\n\nb") == "a\n\nb", "blank runs collapse")
  }

  test("dump rejects: torn page, missing title/id, non-dump XML") {
    def fmt(s: String): String =
      MediawikiPages.compute(s).getUTF8String(0).toString
    assert(fmt("<html>nope</html>") == "unknown")
    assert(fmt("<mediawiki><page><title>t</title>") == "unknown", "torn page")
    assert(fmt("<mediawiki><page><title>t</title></page></mediawiki>") ==
      "unknown", "page without id")
    assert(fmt("<mediawiki><page><id>3</id></page></mediawiki>") ==
      "unknown", "page without title")
    assert(fmt("<mediawiki></mediawiki>") == "mediawiki", "empty dump is valid")
    val ok = WikiSynth.dumpXml(5L)
    var k = 0
    while (k < ok.length) { MediawikiPages.compute(ok.substring(0, k)); k += 37 }
  }

  test("composition: stripped articles feed shingles without markup residue") {
    val t = WikitextStrip.compute(WikiSynth.wikitext(9L, 0))
    assert(!t.contains("{{") && !t.contains("[[") && !t.contains("<ref"))
    assert(!t.contains("Category:") && !t.contains("thumb"))
    val toks = t.split("\\s+").filter(_.nonEmpty)
    assert(toks.length > 20)
  }
}
