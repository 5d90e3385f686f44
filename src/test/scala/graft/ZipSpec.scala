package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** ZIP extraction contracts: both decode methods with CRC gates,
  * offset/csize fidelity, JDK-writer interop, and the reject matrix.
  */
class ZipSpec extends AnyFunSuite {

  test("fixture roundtrip: names, methods, sizes, decode digests across 20 seeds") {
    for (doc <- 0L to 19L) {
      val b = ZipSynth.zipBytes(doc)
      val r = ZipEntries.compute(b)
      assert(r != null, s"doc $doc rejected")
      val n = ZipSynth.nSamples(doc)
      assert(r.getInt(0) == 2 * n, s"doc $doc entries")
      val entries = r.getArray(1)
      for (i <- 0 until n; (ext, method, size, tag) <- Seq(
        ("bin", "stored", ZipSynth.binSize(doc, i), 2 * i),
        ("json", "deflate", ZipSynth.jsonSize(doc, i), 2 * i + 1))) {
        val e = entries.getStruct(tag, 6)
        assert(e.getUTF8String(0).toString == s"s${doc}_$i.$ext")
        assert(e.getUTF8String(1).toString == method)
        assert(e.getLong(4) == size, s"doc $doc entry $tag usize")
        // stored entries: the byte range addresses the formula payload
        if (method == "stored") {
          val off = e.getLong(2)
          assert(e.getLong(3) == size, "stored csize == usize")
          var k = 0L
          while (k < size) {
            assert(b((off + k).toInt) == ZipSynth.payloadByte(doc, tag, k),
              s"doc $doc entry $tag byte $k")
            k += 1
          }
        } else {
          // deflated: the range must hold the compressed stream in-file
          assert(e.getLong(2) + e.getLong(3) <= b.length)
        }
      }
    }
  }

  test("interop: a java.util.zip.ZipOutputStream archive parses identically") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    val payload = Array.tabulate[Byte](300)(k => (k * 7).toByte)
    z.putNextEntry(new java.util.zip.ZipEntry("a/b.txt"))
    z.write(payload, 0, payload.length)
    z.closeEntry()
    val stored = new java.util.zip.ZipEntry("plain.bin")
    stored.setMethod(java.util.zip.ZipOutputStream.STORED)
    stored.setSize(4)
    val sp = Array[Byte](9, 8, 7, 6)
    val crc = new java.util.zip.CRC32()
    crc.update(sp, 0, 4)
    stored.setCrc(crc.getValue)
    z.putNextEntry(stored)
    z.write(sp, 0, 4)
    z.closeEntry()
    z.close()
    val r = ZipEntries.compute(bos.toByteArray)
    assert(r != null, "JDK-written archive must parse")
    assert(r.getInt(0) == 2)
    val e0 = r.getArray(1).getStruct(0, 6)
    assert(e0.getUTF8String(0).toString == "a/b.txt")
    assert(e0.getUTF8String(1).toString == "deflate")
    assert(e0.getLong(4) == 300)
    val e1 = r.getArray(1).getStruct(1, 6)
    assert(e1.getUTF8String(1).toString == "stored")
    assert(e1.getLong(4) == 4)
  }

  test("EPUB: the OCF layout decodes; mimetype first and stored; chapters extract") {
    for (doc <- 0L to 9L) {
      val b = EpubSynth.epubBytes(doc)
      val all = ZipEntries.compute(b)
      assert(all != null, s"doc $doc")
      val first = all.getArray(1).getStruct(0, 6)
      assert(first.getUTF8String(0).toString == "mimetype")
      assert(first.getUTF8String(1).toString == "stored",
        "the OCF magic-number rule: mimetype must be STORED")
      val t = ZipTexts.compute(b, ".xhtml")
      assert(t != null)
      val texts = t.getArray(1)
      assert(texts.numElements() == EpubSynth.nChapters(doc), s"doc $doc")
      for (c <- 0 until texts.numElements()) {
        val row = texts.getStruct(c, 2)
        assert(row.getUTF8String(0).toString == s"OEBPS/chap$c.xhtml")
        val h = HtmlTextExtract.compute(row.getUTF8String(1))
        assert(h.getUTF8String(1).toString == EpubSynth.chapterText(doc, c),
          s"doc $doc chapter $c")
      }
    }
  }

  test("ZIP64: every marker combination resolves to the classic decode") {
    val payloads = Seq(
      ("a.bin", 0, Array.tabulate[Byte](257)(k => (k * 3).toByte),
        Array.emptyByteArray),
      ("b.json", 8, Array.tabulate[Byte](801)(k => (k * 11 + 5).toByte),
        Array.emptyByteArray))
    val classic = ZipEntries.compute(ZipSynth.writeArchive(payloads, "c"))
    assert(classic != null)
    def render(r: org.apache.spark.sql.catalyst.InternalRow): Seq[(String, String, Long, String)] =
      (0 until r.getInt(0)).map { i =>
        val e = r.getArray(1).getStruct(i, 6)
        (e.getUTF8String(0).toString, e.getUTF8String(1).toString,
          e.getLong(4), e.getUTF8String(5).toString)
      }
    for (mode <- Seq(1, 2, 4, 7)) {
      val b = ZipSynth.writeArchive(payloads, "c", mode)
      val r = ZipEntries.compute(b)
      assert(r != null, s"zip64 mode $mode rejected")
      assert(render(r) == render(classic), s"zip64 mode $mode decode")
      // truncation + bit-flip sweeps stay honest on the ZIP64 shapes
      var k = 0
      while (k < b.length) { ZipEntries.compute(b.take(k)); k += 19 }
      var p = 0
      while (p < b.length) {
        val c2 = b.clone()
        c2(p) = (c2(p) ^ 0x20).toByte
        ZipEntries.compute(c2)
        p += 31
      }
    }
    // the fixture rotation exercises all modes across seeds
    for (doc <- 0L to 24L) {
      val r = ZipEntries.compute(ZipSynth.zipBytes(doc))
      assert(r != null, s"doc $doc (zip64 mode ${ZipSynth.zip64Mode(doc)})")
      assert(r.getInt(0) == 2 * ZipSynth.nSamples(doc), s"doc $doc entries")
    }
  }

  test("zip bombs: overlapping central entries and total-output cap reject") {
    // (a) overlapping-entry bomb: duplicate a valid central entry so
    // two entries alias the same local payload — each decodes with a
    // passing CRC, so only the overlap gate can reject it
    val ok = ZipSynth.zipBytes(2L) // no archive comment (doc % 3 != 0)
    assert(ZipEntries.compute(ok) != null)
    def leU16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    var eo = -1
    var ei = ok.length - 22
    while (eo < 0 && ei >= 0) {
      if (ok(ei) == 'P' && ok(ei + 1) == 'K' && ok(ei + 2) == 5 &&
        ok(ei + 3) == 6) eo = ei
      ei -= 1
    }
    val cdOff = (ok(eo + 16) & 0xFF) | ((ok(eo + 17) & 0xFF) << 8) |
      ((ok(eo + 18) & 0xFF) << 16) | ((ok(eo + 19) & 0xFF) << 24)
    val firstLen = 46 + leU16(ok, cdOff + 28) + leU16(ok, cdOff + 30) +
      leU16(ok, cdOff + 32)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ok, 0, eo) // everything through the old central directory
    out.write(ok, cdOff, firstLen) // the duplicated first entry
    val n = leU16(ok, eo + 10)
    val eocd = java.util.Arrays.copyOfRange(ok, eo, ok.length)
    eocd(8) = ((n + 1) & 0xFF).toByte; eocd(9) = ((n + 1) >> 8).toByte
    eocd(10) = eocd(8); eocd(11) = eocd(9)
    val newCdSize = (eo - cdOff) + firstLen
    eocd(12) = (newCdSize & 0xFF).toByte
    eocd(13) = ((newCdSize >> 8) & 0xFF).toByte
    eocd(14) = ((newCdSize >> 16) & 0xFF).toByte
    eocd(15) = ((newCdSize >> 24) & 0xFF).toByte
    out.write(eocd, 0, eocd.length)
    assert(ZipEntries.compute(out.toByteArray) == null,
      "aliased central entries must reject (overlap gate)")
    // (b) cumulative-output bomb: members individually under the
    // 16 MiB per-member cap, 80 MiB total — past the 64 MiB walk cap
    val zeros16M = new Array[Byte](1 << 24)
    val big = ZipSynth.writeArchive(
      (0 until 5).map(i => (s"z$i.bin", 8, zeros16M, Array.emptyByteArray)), "")
    assert(ZipEntries.compute(big) == null, "80 MiB total must reject")
    val okTotal = ZipSynth.writeArchive(
      (0 until 3).map(i => (s"z$i.bin", 8, zeros16M, Array.emptyByteArray)), "")
    assert(ZipEntries.compute(okTotal) != null, "48 MiB total still decodes")
  }

  test("reject matrix: flipped payload bit (CRC), encryption flag, torn tails") {
    // doc 10: classic EOCD lane (doc % 5 == 0), so the hand-doctored
    // sentinels below are not already resolved by a real EOCD64
    val ok = ZipSynth.zipBytes(10L)
    assert(ZipEntries.compute(ok) != null)
    // flip a byte inside the FIRST stored payload: CRC must catch it
    val r = ZipEntries.compute(ok)
    val off = r.getArray(1).getStruct(0, 6).getLong(2)
    val c = ok.clone()
    c(off.toInt) = (c(off.toInt) ^ 1).toByte
    assert(ZipEntries.compute(c) == null, "CRC gate")
    // set the encryption bit in the first CENTRAL directory entry
    // (the authoritative copy compute reads; flags sit at +8)
    var cd = -1
    var ci = 0
    while (cd < 0 && ci + 4 <= ok.length) {
      if (ok(ci) == 'P' && ok(ci + 1) == 'K' && ok(ci + 2) == 1 &&
        ok(ci + 3) == 2) cd = ci
      ci += 1
    }
    assert(cd > 0)
    val enc = ok.clone()
    enc(cd + 8) = (enc(cd + 8) | 1).toByte
    assert(ZipEntries.compute(enc) == null, "encrypted entries reject")
    // ZIP64 sentinel entry count WITHOUT an EOCD64 locator must
    // reject, not wrap (the sentinel now routes through the locator)
    var eo = -1
    var ei = ok.length - 22
    while (eo < 0 && ei >= 0) {
      if (ok(ei) == 'P' && ok(ei + 1) == 'K' && ok(ei + 2) == 5 &&
        ok(ei + 3) == 6) eo = ei
      ei -= 1
    }
    val z64 = ok.clone()
    z64(eo + 10) = 0xFF.toByte
    z64(eo + 11) = 0xFF.toByte
    z64(eo + 8) = 0xFF.toByte
    z64(eo + 9) = 0xFF.toByte
    assert(ZipEntries.compute(z64) == null,
      "sentinel without an EOCD64 locator rejects")
    // torn EOCD
    assert(ZipEntries.compute(ok.take(ok.length - 5)) == null)
    // truncation + bit-flip sweeps: classify, never throw
    var k = 0
    while (k < ok.length) {
      ZipEntries.compute(ok.take(k))
      k += 23
    }
    var p = 0
    while (p < ok.length) {
      val c2 = ok.clone()
      c2(p) = (c2(p) ^ 0x40).toByte
      ZipEntries.compute(c2)
      p += 37
    }
  }
}
