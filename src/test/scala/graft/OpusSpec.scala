package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** Ogg Opus packet-lattice contracts: the TOC tables against RFC 6716
  * Table 2, the fixture roundtrip, all four frame-count codes, the
  * 120 ms ceiling, and the reject matrix.
  */
class OpusSpec extends AnyFunSuite {

  test("RFC 6716 Table 2: mode/bandwidth/duration for all 32 configs") {
    // spot-check the table corners
    assert(OpusPackets.frameMsX10(0) == 100) // SILK NB 10ms
    assert(OpusPackets.frameMsX10(3) == 600) // SILK NB 60ms
    assert(OpusPackets.frameMsX10(11) == 600) // SILK WB 60ms
    assert(OpusPackets.frameMsX10(12) == 100) // Hybrid SWB 10ms
    assert(OpusPackets.frameMsX10(15) == 200) // Hybrid FB 20ms
    assert(OpusPackets.frameMsX10(16) == 25) // CELT NB 2.5ms
    assert(OpusPackets.frameMsX10(31) == 200) // CELT FB 20ms
    assert(OpusPackets.bandwidthIdx(0) == 0) // nb
    assert(OpusPackets.bandwidthIdx(4) == 1) // mb
    assert(OpusPackets.bandwidthIdx(8) == 2) // wb
    assert(OpusPackets.bandwidthIdx(12) == 3) // swb
    assert(OpusPackets.bandwidthIdx(14) == 4) // fb
    assert(OpusPackets.bandwidthIdx(16) == 0) // celt nb
    assert(OpusPackets.bandwidthIdx(20) == 2) // celt wb
    assert(OpusPackets.bandwidthIdx(24) == 3) // celt swb
    assert(OpusPackets.bandwidthIdx(28) == 4) // celt fb
  }

  test("fixture roundtrip: headers and the packet lattice across 20 seeds") {
    for (doc <- 0L to 19L) {
      val r = OpusPackets.compute(OpusSynth.oggOpusBytes(doc))
      assert(r.getUTF8String(0).toString == "opus", s"doc $doc")
      assert(r.getInt(1) == 1 + (doc % 2).toInt)
      assert(r.getInt(2) == 312)
      assert(r.getLong(3) == 48000L)
      val ps = r.getArray(4)
      assert(ps.numElements() == OpusSynth.nPackets(doc), s"doc $doc")
      for (p <- 0 until ps.numElements()) {
        val row = ps.getStruct(p, 7)
        val cfg = OpusSynth.config(doc, p)
        assert(row.getInt(0) == cfg, s"doc $doc p $p config")
        assert(row.getBoolean(3) == OpusSynth.stereo(doc))
        assert(row.getInt(4) == OpusSynth.nFrames(doc, p), s"doc $doc p $p")
        assert(row.getInt(5) == OpusPackets.frameMsX10(cfg))
        assert(row.getInt(6) ==
          OpusSynth.nFrames(doc, p) * OpusPackets.frameMsX10(cfg) * 48 / 10)
      }
    }
  }

  test("reject matrix: bad magic, version, empty packet, over-ceiling code 3") {
    def fmt(b: Array[Byte]): String =
      OpusPackets.compute(b).getUTF8String(0).toString
    val ok = OpusSynth.oggOpusBytes(1L)
    assert(fmt(ok) == "opus")
    assert(fmt(ok.take(ok.length - 9)) == "unknown", "torn final page")
    // flip the OpusHead magic: page 0's body starts at 28 (27 + 1 seg)
    val bad = ok.clone()
    bad(28) = 'X'.toByte
    assert(fmt(bad) == "unknown", "bad magic must reject")
    // hand-build: a code-3 packet claiming 3 x 60ms = 180ms > 120ms
    val serial = 91
    val out = new java.io.ByteArrayOutputStream()
    def add(p: Array[Byte]): Unit = out.write(p, 0, p.length)
    val head = new java.io.ByteArrayOutputStream()
    "OpusHead".foreach(c => head.write(c))
    head.write(1); head.write(1)
    head.write(0x38); head.write(1)
    head.write(0x80); head.write(0xBB); head.write(0); head.write(0)
    head.write(0); head.write(0); head.write(0)
    add(OggSynth.page(2, 0, serial, 0, head.toByteArray))
    val tags = new java.io.ByteArrayOutputStream()
    "OpusTags".foreach(c => tags.write(c))
    tags.write(0); tags.write(0); tags.write(0); tags.write(0)
    tags.write(0); tags.write(0); tags.write(0); tags.write(0)
    add(OggSynth.page(0, 0, serial, 1, tags.toByteArray))
    val base = out.toByteArray
    def withAudio(body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(base, 0, base.length)
      val pg = OggSynth.page(4, 960, serial, 2, body)
      o.write(pg, 0, pg.length)
      o.toByteArray
    }
    // config 3 (SILK NB 60ms), code 3, M=3 -> 180ms: must reject
    assert(fmt(withAudio(Array[Byte]((3 << 3 | 3).toByte, 3))) == "unknown")
    // same with M=2 -> 120ms: legal
    assert(fmt(withAudio(Array[Byte]((3 << 3 | 3).toByte, 2))) == "opus")
    // M=0 is invalid per the spec
    assert(fmt(withAudio(Array[Byte]((3 << 3 | 3).toByte, 0))) == "unknown")
    // empty audio packet rejects
    assert(fmt(withAudio(Array[Byte]())) == "unknown")
  }

  test("fuzz: prefixes and bit flips classify, never throw") {
    val ok = OpusSynth.oggOpusBytes(7L)
    var k = 0
    while (k < ok.length) {
      OpusPackets.compute(ok.take(k))
      k += 5
    }
    var p = 0
    while (p < ok.length) {
      val c = ok.clone()
      c(p) = (c(p) ^ 0x20).toByte
      OpusPackets.compute(c)
      p += 7
    }
  }
}
