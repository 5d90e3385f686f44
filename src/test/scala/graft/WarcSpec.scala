package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** WARC-in-gzip extraction contracts: the member walk (offsets, the
  * full RFC 1952 optional-field set with a VERIFIED FHCRC,
  * multi-record members, verified CRC-32/ISIZE trailers), record
  * parsing, and the honest-reject matrix.
  */
class WarcSpec extends AnyFunSuite {

  test("fixture roundtrip: warcinfo + conversion records across 12 seeds") {
    for (seed <- 0L to 11L) {
      val b = WarcSynth.warcGzBytes(seed)
      val r = WarcRecords.compute(b)
      assert(r != null, s"seed $seed rejected")
      val n = WarcSynth.nConversion(seed)
      assert(r.getInt(0) == WarcSynth.nMembers(seed), s"seed $seed members")
      val a = r.getArray(1)
      assert(a.getStruct(0, 3).getUTF8String(0).toString == "warcinfo")
      for (k <- 0 until n) {
        val rec = a.getStruct(k + 1, 3)
        assert(rec.getUTF8String(0).toString == "conversion")
        assert(rec.getUTF8String(1).toString == WarcSynth.uri(seed, k))
        assert(rec.getUTF8String(2).toString == WarcSynth.body(seed, k),
          s"seed $seed rec $k body")
      }
    }
  }

  test("trailer gates: a flipped payload bit or a wrong ISIZE rejects") {
    val ok = WarcSynth.warcGzBytes(3L)
    // flip one byte inside the first member's DEFLATE data
    val c1 = ok.clone()
    c1(20) = (c1(20) ^ 0x10).toByte
    assert(WarcRecords.compute(c1) == null, "corrupt deflate data")
    // corrupt the last member's ISIZE (final 4 bytes of the payload)
    val c2 = ok.clone()
    c2(c2.length - 1) = (c2(c2.length - 1) ^ 1).toByte
    assert(WarcRecords.compute(c2) == null, "ISIZE mismatch")
    // corrupt the last member's CRC (bytes -8..-5)
    val c3 = ok.clone()
    c3(c3.length - 8) = (c3(c3.length - 8) ^ 1).toByte
    assert(WarcRecords.compute(c3) == null, "CRC mismatch")
  }

  test("reject matrix: truncation, reserved flags, non-WARC payload") {
    val ok = WarcSynth.warcGzBytes(1L)
    assert(WarcRecords.compute(ok.take(ok.length - 5)) == null, "torn trailer")
    assert(WarcRecords.compute(ok.take(30)) == null, "torn member")
    val c = ok.clone()
    c(3) = 0x20.toByte // reserved flag bit: must reject
    assert(WarcRecords.compute(c) == null, "reserved flag rejects")
    // a gzip member whose payload is not a WARC record
    val raw = "hello world, definitely not WARC".getBytes("UTF-8")
    val gzOut = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(gzOut)
    gz.write(raw); gz.close()
    assert(WarcRecords.compute(gzOut.toByteArray) == null, "non-WARC payload")
    assert(WarcRecords.compute(Array[Byte](1, 2, 3)) == null)
  }

  test("gzip optional fields: FEXTRA/FCOMMENT skip, FHCRC verifies") {
    def rec(u: String): Array[Byte] =
      ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Target-URI: $u\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n")
        .getBytes("UTF-8")
    // all three optional fields on one member
    val m = WarcSynth.gzMember(rec("https://x/a"), name = "a.warc",
      extra = Array[Byte](1, 2, 3, 4), comment = "c", hcrc = true)
    val r = WarcRecords.compute(m)
    assert(r != null && r.getInt(0) == 1, "full optional-field header")
    assert(r.getArray(1).getStruct(0, 3).getUTF8String(1).toString ==
      "https://x/a")
    // corrupt the FHCRC value itself: verified, so it must reject.
    // header: 10 fixed + 2 xlen + 4 extra + 7 name ("a.warc"+NUL) +
    // 2 comment ("c"+NUL) → FHCRC at offset 25
    val c1 = m.clone()
    c1(25) = (c1(25) ^ 0x01).toByte
    assert(WarcRecords.compute(c1) == null, "bad FHCRC rejects")
    // corrupt a header byte covered by the FHCRC (mtime): must reject
    val c2 = m.clone()
    c2(4) = (c2(4) ^ 0x01).toByte
    assert(WarcRecords.compute(c2) == null, "header corruption vs FHCRC")
    // same corruption WITHOUT FHCRC decodes (mtime is not otherwise
    // load-bearing) — proves the reject above is the header CRC's
    val m2 = WarcSynth.gzMember(rec("https://x/a"), name = null)
    val c3 = m2.clone()
    c3(4) = (c3(4) ^ 0x01).toByte
    assert(WarcRecords.compute(c3) != null, "no FHCRC -> mtime is free")
  }

  test("multi-record members: the re-pack shape parses record-by-record") {
    // seed 2 is paired (2 % 4 == 2): records 0 and 1 share one member
    val seed = 2L
    assert(WarcSynth.paired(seed))
    val r = WarcRecords.compute(WarcSynth.warcGzBytes(seed))
    assert(r != null)
    assert(r.getInt(0) == WarcSynth.nMembers(seed))
    assert(r.getInt(0) == 1 + WarcSynth.nConversion(seed) - 1)
    val a = r.getArray(1)
    // record LIST is unchanged by packing
    assert(a.numElements() == 1 + WarcSynth.nConversion(seed))
    for (k <- 0 until WarcSynth.nConversion(seed)) {
      val rec = a.getStruct(k + 1, 3)
      assert(rec.getUTF8String(1).toString == WarcSynth.uri(seed, k))
      assert(rec.getUTF8String(2).toString == WarcSynth.body(seed, k))
    }
    // a member with trailing garbage after the last record rejects
    def rec2(u: String): Array[Byte] =
      ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Target-URI: $u\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n")
        .getBytes("UTF-8")
    val tail = rec2("https://x/1") ++ "garbage".getBytes("UTF-8")
    assert(WarcRecords.compute(WarcSynth.gzMember(tail, name = null)) == null,
      "trailing garbage in a member rejects")
  }

  test("pipeline composition: warc_records -> conversion filter -> html_text") {
    // the literal Common Crawl WET shape: records out of the gzip walk,
    // conversion-filtered, then visible-text extracted
    val htmlBody = "<html><body><p>Hello &amp; welcome</p>" +
      "<script>x()</script></body></html>"
    val recs =
      ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 2\r\n\r\nok\r\n\r\n")
        .getBytes("UTF-8") ++
      ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
        "WARC-Target-URI: https://x/page\r\n" +
        s"Content-Length: ${htmlBody.getBytes("UTF-8").length}\r\n\r\n" +
        htmlBody + "\r\n\r\n").getBytes("UTF-8")
    val gz = WarcSynth.gzMember(recs, name = null, hcrc = true)
    val r = WarcRecords.compute(gz)
    assert(r != null && r.getInt(0) == 1 && r.getArray(1).numElements() == 2)
    val conv = r.getArray(1).getStruct(1, 3)
    assert(conv.getUTF8String(0).toString == "conversion")
    val text = HtmlTextExtract.compute(conv.getUTF8String(2))
    assert(text.getUTF8String(1).toString == "Hello & welcome")
  }

  test("truncation/bit-flip sweep: the member walk never throws") {
    val ok = WarcSynth.warcGzBytes(6L)
    var k = 0
    while (k < ok.length) {
      WarcRecords.compute(ok.take(k)) // null or row, never a throw
      k += 11
    }
    var p = 0
    while (p < ok.length) {
      val c = ok.clone()
      c(p) = (c(p) ^ 0x08).toByte
      WarcRecords.compute(c)
      p += 67
    }
  }

  test("JDK GZIPOutputStream members interoperate (real-world gzip framing)") {
    // build one member with the JDK's own gzip writer around a valid
    // record — proves the walk is not coupled to our fixture's framing
    val rec = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://x/1\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n")
      .getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(rec); gz.close()
    val r = WarcRecords.compute(out.toByteArray)
    assert(r != null && r.getInt(0) == 1)
    assert(r.getArray(1).getStruct(0, 3).getUTF8String(2).toString == "hello")
  }

  test("gzip_text: concatenated jsonl members inflate to the exact shard text") {
    for (doc <- 0L to 9L) {
      val t = GzipText.compute(JsonlSynth.jsonlGzBytes(doc))
      assert(t != null, s"doc $doc")
      val lines = t.toString.split("\n").filter(_.nonEmpty).toSeq
      val exp = (0 until JsonlSynth.nMembers(doc)).flatMap { m =>
        (0 until JsonlSynth.linesIn(doc, m)).map { l =>
          s"""{"id":${JsonlSynth.lineId(doc, m, l)},""" +
            s""""lang":"${JsonlSynth.lang(doc, m, l)}",""" +
            s""""text":"${JsonlSynth.text(doc, m, l)}"}"""
        }
      }
      assert(lines == exp, s"doc $doc")
    }
    // trailer corruption (ISIZE) rejects the whole shard
    val ok = JsonlSynth.jsonlGzBytes(3L)
    val c = ok.clone()
    c(ok.length - 2) = (c(ok.length - 2) ^ 1).toByte
    assert(GzipText.compute(c) == null, "ISIZE gate")
    // truncation sweep: classify, never throw
    var k = 0
    while (k < ok.length) {
      GzipText.compute(ok.take(k))
      k += 7
    }
  }

  test("crawl fixture: WARC decode + HTTP strip + HTML extract recovers crawlText exactly") {
    for (doc <- 0L to 29L) {
      val r = WarcRecords.compute(WarcSynth.warcHtmlGzBytes(doc))
      assert(r != null, s"doc $doc")
      val recs = r.getArray(1)
      // find the response record (index 1 normally, 1 in the paired
      // member too — warcinfo always precedes)
      var body: String = null
      for (i <- 0 until recs.numElements()) {
        val rec = recs.getStruct(i, 3)
        if (rec.getUTF8String(0).toString == "response")
          body = rec.getUTF8String(2).toString
      }
      assert(body != null, s"doc $doc: no response record")
      val html = body.substring(body.indexOf("\r\n\r\n") + 4)
      val h = HtmlTextExtract.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(html))
      assert(h != null)
      val text = h.getUTF8String(1).toString
      assert(text == WarcSynth.crawlText(doc),
        s"doc $doc: extracted [$text] vs [${WarcSynth.crawlText(doc)}]")
      // dup-group contract: variants 0/1 share all but one token
      if (doc % 3 == 1)
        assert(text.startsWith(WarcSynth.crawlText(doc - 1)), s"doc $doc")
    }
  }
}
