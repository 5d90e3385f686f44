package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** Ogg Vorbis decode contracts: the fixture roundtrip against an
  * independently written spectral-sum oracle, exact-zero silence
  * propagation, coupling arithmetic, the IMDCT golden, and the
  * honest-reject matrix.
  */
class VorbisSpec extends AnyFunSuite {

  /** The oracle-side arithmetic, written independently of the codec:
    * Σ spectral · 2^20 from the fixture formulas alone. Mono: class-0
    * partitions of the 128-line vector each add two 4-dim book-1
    * entries (value[d] = −2 + 0.5·((e+d) mod 8)); floor is exactly
    * ×1.0. Stereo: the 256-long interleaved type-2 vector deinterleaves
    * to (M, A) and couples square-polar; Σ(L+R) = 2M − A when
    * (M>0)==(A>0), else 2M + A.
    */
  private def expectedSpecQ20(doc: Long): Long = {
    if (VorbisSynth.silent(doc)) return 0L
    val ch = VorbisSynth.channels(doc)
    val nF = VorbisSynth.frames(doc)
    def value(e: Int, d: Int): Double = -2.0 + 0.5 * ((e + d) % 8)
    var total = 0.0
    for (f <- 0 until nF) {
      if (ch == 1) {
        for (p <- 0 until 16; if VorbisSynth.partClass(doc, p) == 0;
             i <- 0 until 2; d <- 0 until 4)
          total += value(VorbisSynth.vqEntry(doc, f, p, i), d)
      } else {
        // build the interleaved vector, then couple
        val v = new Array[Double](256)
        for (p <- 0 until 32; if VorbisSynth.partClass(doc, p) == 0;
             i <- 0 until 2; d <- 0 until 4)
          v(p * 8 + i * 4 + d) = value(VorbisSynth.vqEntry(doc, f, p, i), d)
        for (k <- 0 until 128) {
          val m = v(2 * k)
          val a = v(2 * k + 1)
          total += (if ((m > 0) == (a > 0)) 2 * m - a else 2 * m + a)
        }
      }
    }
    (total * 1048576.0).round
  }

  test("fixture roundtrip: headers, spectra, and silence across 20 seeds") {
    for (doc <- 0L to 19L) {
      val b = VorbisSynth.oggVorbisBytes(doc)
      assert(b != null, s"doc $doc")
      val r = VorbisCodec.compute(b)
      assert(r.getUTF8String(0).toString == "vorbis", s"doc $doc rejected")
      assert(r.getInt(1) == VorbisSynth.channels(doc), s"doc $doc ch")
      assert(r.getInt(2) ==
        VorbisSynth.SampleRate(VorbisSynth.srIdx(doc)), s"doc $doc rate")
      assert(r.getInt(3) == VorbisSynth.frames(doc), s"doc $doc packets")
      assert(r.getInt(4) == (VorbisSynth.frames(doc) - 1) * 128,
        s"doc $doc samples")
      assert(r.getLong(5) == expectedSpecQ20(doc), s"doc $doc spec_sum")
      if (VorbisSynth.silent(doc))
        assert(r.getInt(6) == 0, s"doc $doc: silence must reach PCM exactly")
      else
        assert(r.getInt(6) > 0, s"doc $doc: nonzero spectrum must produce PCM")
      assert(r.getArray(7).numElements() ==
        r.getInt(4) * VorbisSynth.channels(doc))
    }
  }

  test("IMDCT golden: a single-bin spectrum is the spec's cosine, exactly") {
    // n = 8, spectrum = e_0: out(j) = cos(2π/8 · (j + 0.5 + 2) · 0.5)
    val spec = Array(1.0, 0.0, 0.0, 0.0)
    val out = VorbisCodec.imdct(spec, 8)
    for (j <- 0 until 8) {
      val expect = StrictMath.cos(
        2.0 * StrictMath.PI / 8.0 * (j + 0.5 + 2.0) * 0.5)
      assert(math.abs(out(j) - expect) < 1e-12, s"j=$j")
    }
    // linearity: doubling the bin doubles the output
    val out2 = VorbisCodec.imdct(Array(2.0, 0.0, 0.0, 0.0), 8)
    for (j <- 0 until 8) assert(math.abs(out2(j) - 2 * out(j)) < 1e-12)
  }

  test("ogg packet assembly: spanning packets reassemble; CRC gates") {
    // a packet of exactly 255 bytes forces a continuation lacing pair
    val big = Array.tabulate(255)(i => (i % 251).toByte)
    val p1 = OggSynth.page(2, 0, 9, 0, big)
    val ps = VorbisCodec.oggPackets(p1)
    assert(ps != null && ps.length == 1 && ps(0).toSeq == big.toSeq)
    // flip one body byte: the page CRC must reject
    val c = p1.clone()
    c(c.length - 3) = (c(c.length - 3) ^ 1).toByte
    assert(VorbisCodec.oggPackets(c) == null, "CRC gate")
    // a continued-packet flag with no open packet rejects
    val stray = OggSynth.page(1, 0, 9, 0, Array[Byte](1, 2, 3))
    assert(VorbisCodec.oggPackets(stray) == null, "torn continuation")
  }

  test("reject matrix: floor 0, truncation, bad headers, non-audio packet") {
    val ok = VorbisSynth.oggVorbisBytes(1L)
    def fmt(b: Array[Byte]): String =
      VorbisCodec.compute(b).getUTF8String(0).toString
    assert(fmt(ok) == "vorbis")
    assert(fmt(ok.take(ok.length - 7)) == "unknown", "torn final page")
    assert(fmt(Array[Byte](1, 2, 3, 4)) == "unknown")
    // non-Vorbis ident signature
    val c1 = ok.clone()
    // ident packet body starts after page 0's 27+1 header: type byte + "vorbis"
    c1(29) = 'x'.toByte
    assert(fmt(c1) == "unknown", "bad magic must reject")
  }

  test("mixed blocksizes: long-against-short lapping decodes with exact accounting") {
    // frames alternate short(128)/long(256); sample accounting per the
    // spec: each post-first frame returns prevN/4 + n/4
    for (doc <- Seq(1L, 2L, 3L, 5L)) { // 5 = silent
      val b = VorbisSynth.mixedStreamBytes(doc, 4) // S L S L
      val r = VorbisCodec.compute(b)
      assert(r.getUTF8String(0).toString == "vorbis", s"doc $doc rejected")
      assert(r.getInt(3) == 4)
      // outputs: f1: 32+64=96, f2: 64+32=96, f3: 32+64=96 → 288
      assert(r.getInt(4) == 288, s"doc $doc lapping accounting")
      if (VorbisSynth.silent(doc))
        assert(r.getInt(6) == 0, "silence through mixed lapping stays zero")
      else {
        assert(r.getInt(6) > 0)
        // spectral fingerprint: short frames carry 8 partitions, long 16
        def value(e: Int, d: Int): Double = -2.0 + 0.5 * ((e + d) % 8)
        var total = 0.0
        for (f <- 0 until 4) {
          val parts = if (f % 2 == 1) 16 else 8
          for (p <- 0 until parts; if VorbisSynth.partClass(doc, p) == 0;
               i <- 0 until 2; d <- 0 until 4)
            total += value(VorbisSynth.vqEntry(doc, f, p, i), d)
        }
        assert(r.getLong(5) == (total * 1048576.0).round, s"doc $doc spec")
      }
    }
  }

  test("truncation sweep: every prefix decodes to a row or rejects, never throws") {
    // the untrusted-bytes stance: crawled payloads arrive torn at any
    // byte; the decoder must classify, not crash
    val ok = VorbisSynth.oggVorbisBytes(3L)
    var k = 0
    while (k < ok.length) {
      val r = VorbisCodec.compute(ok.take(k))
      assert(r != null) // a row always comes back ('unknown' or valid)
      k += 7
    }
    // and a bit-flip sweep over a sample of positions: same contract
    var p = 0
    while (p < ok.length) {
      val c = ok.clone()
      c(p) = (c(p) ^ 0x40).toByte
      VorbisCodec.compute(c) // must not throw; reject or decode
      p += 97
    }
  }

  test("coupling: stereo PCM differs from channel-duplicated mono decode") {
    // doc 1 is stereo non-silent; its two channels must not be equal
    // (square-polar coupling splits M/A into distinct L/R)
    val r = VorbisCodec.compute(VorbisSynth.oggVorbisBytes(1L))
    assert(r.getInt(1) == 2)
    val s = r.getArray(7).toIntArray()
    var differ = false
    var i = 0
    while (i < s.length && !differ) {
      if (s(i) != s(i + 1)) differ = true
      i += 2
    }
    assert(differ, "L and R must differ under coupling")
  }
}
