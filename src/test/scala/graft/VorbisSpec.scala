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

  /** Rebuild pages from assembled packets with caller-chosen granule
    * positions (index → granulepos; −1 = the spec's "no packet
    * completes" sentinel).
    */
  private def repage(packets: Array[Array[Byte]],
      granuleOf: Int => Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < packets.length) {
      val flags = if (i == 0) 2 else if (i == packets.length - 1) 4 else 0
      val p = OggSynth.page(flags, granuleOf(i), 77, i, packets(i))
      out.write(p, 0, p.length)
      i += 1
    }
    out.toByteArray
  }

  test("EOP inside audio-packet decode is the spec's non-error, not corruption") {
    // every truncation of the LAST audio packet must still decode: a
    // cut inside floor decode renders the frame silent, a cut inside
    // residue keeps the partial vector (spec §4.3) — real encoders
    // routinely truncate packets after the last nonzero residue value
    val full = VorbisSynth.oggVorbisBytes(1L) // stereo, non-silent, 3 frames
    val packets = VorbisCodec.oggPackets(full)
    val nF = VorbisSynth.frames(1L)
    assert(packets.length == 3 + nF)
    def granules(i: Int): Long = if (i < 3) 0L else (i - 3).toLong * 128
    var cut = 0
    while (cut < packets(packets.length - 1).length) {
      val mod = packets.clone()
      mod(mod.length - 1) = mod(mod.length - 1).take(cut)
      val r = VorbisCodec.compute(repage(mod, granules))
      assert(r.getUTF8String(0).toString == "vorbis",
        s"cut=$cut: EOP must not reject the stream")
      if (cut == 0) {
        // the zero-byte packet EOPs before the mode field: the spec
        // drops the PACKET (frame lost, lapping unchanged)
        assert(r.getInt(3) == nF - 1, s"cut=$cut packets")
        assert(r.getInt(4) == (nF - 2) * 128, s"cut=$cut samples")
      } else {
        assert(r.getInt(3) == nF, s"cut=$cut packets")
        assert(r.getInt(4) == (nF - 1) * 128, s"cut=$cut samples")
      }
      cut += 1
    }
    // and structural corruption still rejects: a codeword led into a
    // vacant tree slot is not EOP (covered by the CRC/torn-page matrix;
    // the distinction is pinned by the reject-matrix test above)
  }

  test("granule positions: head offset and end trim clip the decoded PCM") {
    val full = VorbisSynth.oggVorbisBytes(1L)
    val packets = VorbisCodec.oggPackets(full)
    val nF = VorbisSynth.frames(1L) // 3 → 256 lapped samples
    val ch = VorbisSynth.channels(1L)
    // end trim: the EOS page claims 10 samples fewer than decoded
    val trimmed = VorbisCodec.compute(repage(packets,
      i => if (i < 3) 0L
      else if (i == packets.length - 1) (nF - 1).toLong * 128 - 10
      else (i - 3).toLong * 128))
    assert(trimmed.getUTF8String(0).toString == "vorbis")
    assert(trimmed.getInt(4) == (nF - 1) * 128 - 10, "end trim")
    assert(trimmed.getArray(7).numElements() == ((nF - 1) * 128 - 10) * ch)
    // head offset: the first granule-bearing audio page (frame 1,
    // decoded-so-far 128) declares 120 → 8 samples trimmed from the
    // head; EOS declares 248 → total 248
    val offset = VorbisCodec.compute(repage(packets,
      i => if (i < 3) 0L
      else if (i == 3) -1L // frame 0's page: no granule
      else if (i == 4) 120L
      else 248L))
    assert(offset.getUTF8String(0).toString == "vorbis")
    assert(offset.getInt(4) == 248, "head offset + end trim")
    assert(offset.getArray(7).numElements() == 248 * ch)
    // the untouched fixture (granules == decoded accounting) is
    // trim-neutral — pinned by the roundtrip test's exact n_samples
  }

  test("allocation-amplification gate: 1-byte packets cannot claim unbounded PCM") {
    // 8 channels × 8192-sample blocks × one-byte packets: each frame
    // EOPs in floor decode (silent, legal) but claims 32768 output
    // slots; past MaxTotalSamples the stream must reject
    val bomb = VorbisSynth.amplificationStreamBytes(520)
    assert(bomb.length < 32 * 1024, "the attack stream itself is small")
    val r = VorbisCodec.compute(bomb)
    assert(r.getUTF8String(0).toString == "unknown",
      "amplification past the gate must reject")
    // the same shape under the gate decodes (all-silent output)
    val small = VorbisCodec.compute(VorbisSynth.amplificationStreamBytes(6))
    assert(small.getUTF8String(0).toString == "vorbis")
    assert(small.getInt(1) == 8)
    assert(small.getInt(4) == 5 * 4096)
    assert(small.getInt(6) == 0, "EOP-silent frames reach the PCM as zeros")
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
