package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Email/MIME parsing contracts: the four fixture shapes, RFC 2047
  * corners, the RFC 2046 boundary newline rule, and rejects.
  */
class EmlSpec extends AnyFunSuite {

  test("fixture roundtrip: all four shapes across 24 seeds") {
    for (doc <- 0L to 23L) {
      val r = EmlMessage.compute(EmlSynth.emlString(doc))
      assert(r.getUTF8String(0).toString == "eml", s"doc $doc rejected")
      assert(r.getUTF8String(1).toString == EmlSynth.from(doc))
      assert(r.getUTF8String(2).toString == EmlSynth.to(doc))
      assert(r.getUTF8String(3).toString == EmlSynth.subject(doc),
        s"doc $doc subject (2047 shape ${EmlSynth.shape(doc)})")
      assert(r.getUTF8String(4).toString == EmlSynth.date(doc))
      assert(r.getInt(5) == EmlSynth.nParts(doc), s"doc $doc parts")
      val p0 = r.getArray(6).getStruct(0, 2)
      assert(p0.getUTF8String(0).toString == "text/plain")
      assert(p0.getUTF8String(1).toString == EmlSynth.bodyText(doc),
        s"doc $doc body:\n[${p0.getUTF8String(1)}]\nvs\n[${EmlSynth.bodyText(doc)}]")
      if (EmlSynth.shape(doc) == 2) {
        val p1 = r.getArray(6).getStruct(1, 2)
        assert(p1.getUTF8String(0).toString == "text/html")
        assert(p1.getUTF8String(1).toString == EmlSynth.htmlAltText(doc))
      }
      if (EmlSynth.shape(doc) == 3) {
        val p1 = r.getArray(6).getStruct(1, 2)
        assert(p1.getUTF8String(1).toString == EmlSynth.b64PartText(doc),
          s"doc $doc base64 part")
        val p2 = r.getArray(6).getStruct(2, 2)
        assert(p2.getUTF8String(0).toString == "application/pdf")
        assert(p2.getUTF8String(1).toString == "", "non-text leaf: empty text")
      }
    }
  }

  test("RFC 2047: B/Q forms, adjacent join, unknown charset rejects") {
    assert(EmlMessage.decodeWords("=?utf-8?B?Y2Fmw6k=?=") == "café")
    assert(EmlMessage.decodeWords("=?iso-8859-1?Q?a_b=E9c?=") == "a béc")
    // adjacent encoded words: intervening whitespace drops
    assert(EmlMessage.decodeWords("=?utf-8?B?YWI=?= =?utf-8?B?Y2Q=?=") == "abcd")
    // non-adjacent text keeps its spacing
    assert(EmlMessage.decodeWords("x =?utf-8?B?eQ==?= z") == "x y z")
    // a malformed word passes through verbatim rather than corrupting
    assert(EmlMessage.decodeWords("=?utf-8?B?broken") == "=?utf-8?B?broken")
  }

  test("rejects: missing separator, lost boundary, bad encodings") {
    def fmt(s: String): String =
      EmlMessage.compute(s).getUTF8String(0).toString
    assert(fmt("no header separator at all") == "unknown")
    assert(fmt("Subject: x\r\n\r\nbody ok") == "eml")
    // multipart without boundary param
    assert(fmt("Content-Type: multipart/mixed\r\n\r\nbody") == "unknown")
    // closing boundary never arrives
    assert(fmt("Content-Type: multipart/mixed; boundary=b\r\n\r\n--b\r\n" +
      "Content-Type: text/plain\r\n\r\nx\r\n") == "unknown")
    // unknown transfer encoding / charset
    assert(fmt("Content-Type: text/plain\r\n" +
      "Content-Transfer-Encoding: uuencode\r\n\r\nx") == "unknown")
    assert(fmt("Content-Type: text/plain; charset=koi8-r\r\n" +
      "Content-Transfer-Encoding: base64\r\n\r\neA==") == "unknown")
    // torn QP
    assert(fmt("Content-Type: text/plain; charset=utf-8\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n\r\nbad =Z9 escape") ==
      "unknown")
    // truncation sweep over a nested multipart: classify, never throw
    val ok = EmlSynth.emlString(3L)
    var k = 0
    while (k < ok.length) { EmlMessage.compute(ok.substring(0, k)); k += 17 }
  }

  test("boundary newline rule: part bodies do not grow a trailing newline") {
    val r = EmlMessage.compute(EmlSynth.emlString(2L)) // multipart/alternative
    val body = r.getArray(6).getStruct(0, 2).getUTF8String(1).toString
    assert(!body.endsWith("\n"),
      "the CRLF before a boundary belongs to the delimiter, not the part")
  }

  test("mbox: split, un-stuffing, and the eml composition across 20 seeds") {
    for (doc <- 0L to 19L) {
      val r = MboxSplit.compute(MboxSynth.mboxString(doc))
      assert(r.getUTF8String(0).toString == "mbox", s"doc $doc rejected")
      val nm = MboxSynth.nMessages(doc)
      assert(r.getInt(1) == nm, s"doc $doc messages")
      for (k <- 0 until nm) {
        val msg = r.getArray(2).getUTF8String(k).toString
        val e = EmlMessage.compute(msg)
        assert(e.getUTF8String(0).toString == "eml", s"doc $doc msg $k")
        val seed = MboxSynth.memberSeed(doc, k)
        assert(e.getUTF8String(3).toString == EmlSynth.subject(seed),
          s"doc $doc msg $k subject")
        if (k == 0 && EmlSynth.shape(seed) <= 1) {
          val body = e.getArray(6).getStruct(0, 2).getUTF8String(1).toString
          assert(body.endsWith(s"From the archives: note ${doc % 9}"),
            s"doc $doc: the stuffed line must un-stuff into the body")
          assert(!body.contains(">From"), "no residual stuffing")
        }
      }
    }
    // mboxo-style double-stuffing loses exactly ONE '>'
    val two = MboxSplit.compute("From a\nX: y\n\n>>From deep\n")
    assert(two.getArray(2).getUTF8String(0).toString.endsWith(">From deep"))
    // not an mbox: content before any envelope line
    assert(MboxSplit.compute("plain text\nFrom a\n")
      .getUTF8String(0).toString == "unknown")
    assert(MboxSplit.compute("").getUTF8String(0).toString == "unknown")
  }

  test("robots sitemaps: directives collect in document order") {
    val got = RobotsSitemaps.compute(
      "# c\nUser-agent: *\nDisallow: /x\nSitemap: https://a/s1.xml\n" +
        "User-agent: b\nSITEMAP:   https://a/s2.xml  # trailing\nAllow: /\n")
    assert(got.numElements() == 2)
    assert(got.getUTF8String(0).toString == "https://a/s1.xml")
    assert(got.getUTF8String(1).toString == "https://a/s2.xml",
      "case-insensitive field, comment stripped, value trimmed")
    assert(RobotsSitemaps.compute("User-agent: *\nAllow: /\n")
      .numElements() == 0)
  }

  test("composition: decoded parts feed text analysis; html alt routes to html_text") {
    val r = EmlMessage.compute(EmlSynth.emlString(6L)) // shape 2
    val html = r.getArray(6).getStruct(1, 2).getUTF8String(1).toString
    val stripped = HtmlTextExtract.compute(UTF8String.fromString(html))
    assert(stripped.getUTF8String(1).toString == s"alt ${6 % 9}")
  }
}
