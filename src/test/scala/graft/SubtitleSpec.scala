package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Subtitle extraction contracts: both formats' fixture roundtrip, the
  * tag/entity text rules, VTT block skipping, and the reject matrix.
  */
class SubtitleSpec extends AnyFunSuite {

  private def parse(s: String) =
    SubtitleCues.compute(UTF8String.fromString(s))

  test("fixture roundtrip: SRT and WebVTT across 20 seeds") {
    for (doc <- 0L to 19L) {
      val r = parse(SubtitleSynth.subtitleString(doc))
      val fmt = r.getUTF8String(0).toString
      assert(fmt == (if (SubtitleSynth.isVtt(doc)) "webvtt" else "srt"),
        s"doc $doc")
      val cues = r.getArray(1)
      assert(cues.numElements() == SubtitleSynth.nCues(doc), s"doc $doc")
      for (k <- 0 until cues.numElements()) {
        val q = cues.getStruct(k, 4)
        val i = k + 1
        assert(q.getInt(0) == i, s"doc $doc cue $i idx")
        assert(q.getLong(1) == SubtitleSynth.startMs(doc, i), s"doc $doc $i start")
        assert(q.getLong(2) == SubtitleSynth.endMs(doc, i), s"doc $doc $i end")
        assert(q.getUTF8String(3).toString == SubtitleSynth.cueText(doc, i),
          s"doc $doc cue $i text")
      }
    }
  }

  test("VTT: BOM, identifier-less cues, short MM:SS form, NOTE/STYLE skipping") {
    val vtt = "﻿WEBVTT\n\nSTYLE\n::cue { color: red }\n\n" +
      "01:02.500 --> 01:03.000 align:end\nplain cue\n\n" +
      "NOTE ignore me\nstill ignored\n\n" +
      "00:00:04.000 --> 00:00:05.250\nsecond\n"
    val r = parse(vtt)
    assert(r.getUTF8String(0).toString == "webvtt")
    val cues = r.getArray(1)
    assert(cues.numElements() == 2)
    val a = cues.getStruct(0, 4)
    assert(a.getLong(1) == 62500L && a.getLong(2) == 63000L)
    assert(a.getUTF8String(3).toString == "plain cue")
    val b = cues.getStruct(1, 4)
    assert(b.getLong(1) == 4000L && b.getLong(2) == 5250L)
  }

  test("text rules: tags stripped, entities decoded, supplementary planes, garbage preserved") {
    assert(SubtitleCues.cleanText("<v Fred>hi <b>there</b>") == "hi there")
    assert(SubtitleCues.cleanText("a &amp; b &#x1F600; c") == "a & b 😀 c")
    assert(SubtitleCues.cleanText("5 &lt; 6 &gt; 4 &quot;q&quot;") ==
      "5 < 6 > 4 \"q\"")
    // unknown entity and unclosed tag pass through as literal text
    assert(SubtitleCues.cleanText("&bogus; x") == "&bogus; x")
    assert(SubtitleCues.cleanText("a < b") == "a < b")
    assert(SubtitleCues.cleanText("&#xFFFFFFFF; y") == "&#xFFFFFFFF; y")
  }

  test("reject matrix: reversed times, malformed fields, SRT without index, empty") {
    def fmt(s: String): String = parse(s).getUTF8String(0).toString
    assert(fmt("") == "unknown")
    assert(fmt("1\n00:00:02,000 --> 00:00:01,000\nx\n") == "unknown",
      "end before start")
    assert(fmt("1\n00:00:01,000 --> 00:00:01,000\nx\n") == "unknown",
      "zero-length cue")
    assert(fmt("1\n00:77:01,000 --> 00:78:02,000\nx\n") == "unknown",
      "minutes >= 60")
    assert(fmt("1\n00:00:01,00 --> 00:00:02,000\nx\n") == "unknown",
      "2-digit millis")
    assert(fmt("00:00:01,000 --> 00:00:02,000\nx\n") == "unknown",
      "SRT cue without an index line")
    assert(fmt("abc\n00:00:01,000 --> 00:00:02,000\nx\n") == "unknown",
      "non-numeric SRT index")
    // VTT uses dots; commas must reject there (and vice versa)
    assert(fmt("WEBVTT\n\n00:00:01,000 --> 00:00:02,000\nx\n") == "unknown")
    assert(fmt("1\n00:00:01.000 --> 00:00:02.000\nx\n") == "unknown")
  }

  test("fuzz: prefixes and bit flips of both fixtures classify, never throw") {
    for (doc <- Seq(2L, 3L)) {
      val s = SubtitleSynth.subtitleString(doc)
      var k = 0
      while (k < s.length) {
        parse(s.substring(0, k))
        k += 7
      }
      var p = 0
      while (p < s.length) {
        val c = s.toCharArray
        c(p) = (c(p) ^ 0x01).toChar
        parse(new String(c))
        p += 13
      }
    }
  }
}
