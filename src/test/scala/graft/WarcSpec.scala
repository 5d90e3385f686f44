package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** WARC-in-gzip extraction contracts: the member walk (offsets, FNAME
  * fields, verified CRC-32/ISIZE trailers), record parsing, and the
  * honest-reject matrix.
  */
class WarcSpec extends AnyFunSuite {

  test("fixture roundtrip: warcinfo + conversion records across 12 seeds") {
    for (seed <- 0L to 11L) {
      val b = WarcSynth.warcGzBytes(seed)
      val r = WarcRecords.compute(b)
      assert(r != null, s"seed $seed rejected")
      val n = WarcSynth.nConversion(seed)
      assert(r.getInt(0) == n + 1, s"seed $seed members")
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

  test("reject matrix: truncation, unsupported flags, non-WARC payload") {
    val ok = WarcSynth.warcGzBytes(1L)
    assert(WarcRecords.compute(ok.take(ok.length - 5)) == null, "torn trailer")
    assert(WarcRecords.compute(ok.take(30)) == null, "torn member")
    val c = ok.clone()
    c(3) = 4 // FEXTRA: unsupported, must reject
    assert(WarcRecords.compute(c) == null, "FEXTRA rejects")
    // a gzip member whose payload is not a WARC record
    val raw = "hello world, definitely not WARC".getBytes("UTF-8")
    val gzOut = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(gzOut)
    gz.write(raw); gz.close()
    assert(WarcRecords.compute(gzOut.toByteArray) == null, "non-WARC payload")
    assert(WarcRecords.compute(Array[Byte](1, 2, 3)) == null)
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
}
