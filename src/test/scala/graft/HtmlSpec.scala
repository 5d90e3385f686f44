package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** HTML text-extraction contracts: the documented rule set on hand
  * goldens (the traps a naive splitter fails), plus the fixture
  * roundtrip.
  */
class HtmlSpec extends AnyFunSuite {

  private def x(html: String) =
    HtmlTextExtract.compute(UTF8String.fromString(html))
  private def text(html: String): String = x(html).getUTF8String(1).toString

  test("fixture roundtrip matches the formula text across 12 seeds") {
    for (seed <- 0L to 11L) {
      val r = x(HtmlSynth.htmlString(seed))
      assert(r.getUTF8String(0).toString == HtmlSynth.title(seed), s"seed $seed")
      assert(r.getInt(2) == HtmlSynth.nLinks(seed), s"seed $seed links")
      val expected = ((0 until HtmlSynth.nParas(seed))
        .map(i => HtmlSynth.paraText(seed, i)) ++
        (0 until HtmlSynth.nLinks(seed)).map(k => HtmlSynth.linkText(seed, k)))
        .mkString("\n")
      assert(r.getUTF8String(1).toString == expected, s"seed $seed text")
    }
  }

  test("quoted '>' inside an attribute does not end the tag") {
    assert(text("""<div data-x="a>b">ok</div>""") == "ok")
    assert(text("""<img alt='1 > 0'>after""") == "after")
  }

  test("script/style/comments drop with contents, incl. '>' inside") {
    assert(text("<script>if (1 > 0) { x('<p>'); }</script>visible") == "visible")
    assert(text("<style>a > b { color: red }</style>t") == "t")
    assert(text("a<!-- x > y -->b") == "ab")
    // torn script: remainder drops, never leaks as text
    assert(text("keep<script>var x = 1;") == "keep")
  }

  test("entities: named, decimal, hex; unknown pass through") {
    assert(text("a&amp;b &lt;x&gt; &quot;q&quot; &#65; &#x42;") ==
      "a&b <x> \"q\" A B")
    assert(text("5 &undefined; 6") == "5 &undefined; 6")
  }

  test("block tags break lines; inline tags flow; whitespace collapses") {
    assert(text("<p>a  b</p><p>c</p>") == "a b\nc")
    assert(text("x<br>y") == "x\ny")
    assert(text("<p>a <b>bold</b> c</p>") == "a bold c")
    assert(text("  \t\n  ") == "")
    assert(text("plain  text, no tags\n at all") == "plain text, no tags at all")
  }

  test("title: first wins, whitespace-collapsed; links need href") {
    val r = x("<title> A  B </title><title>zz</title><a href='u'>l</a><a name='n'>m</a>")
    assert(r.getUTF8String(0).toString == "A B")
    assert(r.getInt(2) == 1, "only the href anchor counts")
  }
}
