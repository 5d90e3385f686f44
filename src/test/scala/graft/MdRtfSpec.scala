package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Markdown stripping and RTF extraction contracts. */
class MdRtfSpec extends AnyFunSuite {

  // ------------------------------------------------------- Markdown

  test("markdown: fixture roundtrip across 25 seeds") {
    for (doc <- 0L to 24L) {
      val got = MarkdownText.compute(MarkdownSynth.markdown(doc))
      assert(got == MarkdownSynth.expectedText(doc),
        s"doc $doc:\n[$got]\nvs\n[${MarkdownSynth.expectedText(doc)}]")
    }
  }

  test("markdown: each rule independently") {
    def md(s: String): String = MarkdownText.compute(s)
    assert(md("# H1") == "H1")
    assert(md("### deep ###") == "deep")
    assert(md("####### seven") == "####### seven", "h7 is not a heading")
    assert(md("Title\n=====") == "Title")
    assert(md("Title\n-----") == "Title", "dash underline after text is setext")
    assert(md("a\n\n---\n\nb") == "a\n\nb", "break between blanks drops")
    assert(md("**b** and *i* and `c()`") == "b and i and c()")
    assert(md("__b__ and _i_") == "b and i")
    assert(md("unpaired ** stays") == "unpaired ** stays")
    assert(md("[t](http://u) and [r][id]\n\n[id]: http://x") == "t and r")
    assert(md("![alt text](i.png)") == "alt text")
    assert(md("<https://a.b/c>") == "https://a.b/c")
    assert(md("<notaurl>") == "<notaurl>")
    assert(md("- a\n* b\n+ c\n1. d\n2) e") == "a\nb\nc\nd\ne")
    assert(md("> quoted\n> > deeper") == "quoted\ndeeper")
    assert(md("```\ncode **not em**\n```") == "code **not em**")
    assert(md("~~~\nx\n~~~") == "x")
    assert(md("\\*literal\\*") == "*literal*")
    assert(md("a\n\n\n\nb") == "a\n\nb", "blank runs collapse")
    assert(md("") == "")
  }

  test("markdown: composition — stripped text dedups like the brief wants") {
    // same template, different seeds: the markup must not contribute
    // shingles (fence markers, link targets, emphasis stars)
    val a = MarkdownText.compute(MarkdownSynth.markdown(1L))
    assert(!a.contains("```") && !a.contains("](") && !a.contains("## "))
    assert(!a.contains("[rg]:"), "reference definitions must vanish")
  }

  // ------------------------------------------------------------ RTF

  test("rtf: fixture roundtrip across 25 seeds") {
    for (doc <- 0L to 24L) {
      val r = RtfText.compute(RtfSynth.rtf(doc))
      assert(r.getUTF8String(0).toString == "rtf", s"doc $doc rejected")
      assert(r.getUTF8String(1).toString == RtfSynth.expectedText(doc),
        s"doc $doc:\n[${r.getUTF8String(1)}]\nvs\n[${RtfSynth.expectedText(doc)}]")
    }
  }

  test("rtf: cp1252 block, unicode fallback, group-scoped uc, rejects") {
    def text(s: String): String = {
      val r = RtfText.compute(s)
      if (r.getUTF8String(0).toString != "rtf") null
      else r.getUTF8String(1).toString
    }
    // 0x80 block goes through cp1252, not Latin-1
    assert(text("{\\rtf1 \\'93q\\'94}") == "“q”")
    assert(text("{\\rtf1 \\'e9}") == "é")
    // \u with negative (signed-16-bit) parameter
    assert(text("{\\rtf1\\uc0 \\u-1535 }") == "度")
    // \uc2 skips TWO fallback chars
    assert(text("{\\rtf1\\uc2 \\u215 AB.}") == "×.")
    // uc is group-scoped: inner override does not leak out
    assert(text("{\\rtf1\\uc1 {\\uc2 \\u215 AB}\\u215 Z}") == "××")
    // escapes
    assert(text("{\\rtf1 a\\{b\\}c\\\\d}") == "a{b}c\\d")
    // destinations vanish wholly, ignorable destinations too
    assert(text("{\\rtf1{\\fonttbl{\\f0 X;}}{\\*\\weird stuff}ok}") == "ok")
    // rejects: wrong magic, unbalanced groups, torn hex
    assert(text("plain text") == null)
    assert(text("{\\rtf1 unclosed") == null)
    assert(text("{\\rtf1 \\'9}") == null)
    // truncation sweep: classify, never throw
    val ok = RtfSynth.rtf(5L)
    var k = 0
    while (k < ok.length) { RtfText.compute(ok.substring(0, k)); k += 11 }
  }
}
