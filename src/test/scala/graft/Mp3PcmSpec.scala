package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** Layer III PCM decode contracts: the fixture roundtrip (headers,
  * side info, scalefactors, Huffman, requantization — exact dyadic
  * spectrum sums), the exact-zero silence propagation through the FULL
  * filterbank, filterbank frequency localization, the MS golden, and
  * the honest-reject matrix.
  */
class Mp3PcmSpec extends AnyFunSuite {

  /** The oracle-side arithmetic, written independently of the codec:
    * Σ xr · 2^20 from the fixture formulas alone.
    */
  private def expectedSpecQ20(doc: Long): Long = {
    if (Mp3PcmSynth.silent(doc)) return 0L
    val nch = Mp3PcmSynth.channels(doc)
    val sfbL = Mp3L3Codec.SfbLong(Mp3PcmSynth.srIdx(doc))
    def sfbOf(line: Int): Int = {
      var s = 0
      while (sfbL(s + 1) <= line) s += 1
      s
    }
    val isIntensity = Mp3PcmSynth.intensity(doc)
    var total = 0L
    for (g <- 0 until 2; c <- 0 until nch) {
      val k = Mp3PcmSynth.kGain(doc, g, c)
      // the intensity right channel carries region0 only (no count1);
      // its projected share of the left spectrum sums back to exactly
      // the left contribution (kl + kr = 1), so intensity adds NO term
      val intensityRight = isIntensity && c == 1
      def contrib(line: Int, v: Int, signBit: Int): Long =
        if (v == 0) 0L
        else {
          // perfect cubes: v^(4/3) = 1, 16, 81
          val v43 = v match { case 1 => 1L; case 8 => 16L; case 27 => 81L }
          val e = 20 + k - Mp3PcmSynth.sf(doc, sfbOf(line), g, c)
          (if (signBit == 1) -v43 else v43) << e
        }
      val nPairs = if (intensityRight) 6 else Mp3PcmSynth.NPairs
      for (j <- 0 until nPairs) {
        val x = if (j < 6) Mp3PcmSynth.pairX(doc, j, g, c)
          else Mp3PcmSynth.pairXBig(doc, j, g, c)
        val y = if (j < 6) Mp3PcmSynth.pairY(doc, j, g, c)
          else Mp3PcmSynth.pairYBig(doc, j, g, c)
        total += contrib(2 * j, x, Mp3PcmSynth.pairXSign(doc, j, g))
        total += contrib(2 * j + 1, y, Mp3PcmSynth.pairYSign(doc, j, c))
      }
      if (!intensityRight) {
        for (q <- 0 until Mp3PcmSynth.NQuads; s <- 0 until 4) {
          total += contrib(32 + 4 * q + s, Mp3PcmSynth.quadV(doc, q, s, g, c),
            Mp3PcmSynth.quadSign(doc, q, s, g))
        }
      }
    }
    total * Mp3PcmSynth.frames(doc)
  }

  test("fixture roundtrip: headers, spectra, and silence across 20 seeds") {
    for (doc <- 0L to 19L) {
      val b = Mp3PcmSynth.mp3Bytes(doc)
      assert(b != null, s"doc $doc")
      val r = Mp3L3Codec.compute(b)
      assert(r.getUTF8String(0).toString == "mp3", s"doc $doc rejected")
      assert(r.getInt(1) == Mp3PcmSynth.channels(doc), s"doc $doc ch")
      assert(r.getInt(2) == Array(44100, 48000, 32000)(Mp3PcmSynth.srIdx(doc)))
      assert(r.getInt(3) == 128, s"doc $doc bitrate")
      assert(r.getInt(4) == Mp3PcmSynth.frames(doc), s"doc $doc frames")
      assert(r.getInt(5) == Mp3PcmSynth.frames(doc) * 1152, s"doc $doc samples")
      assert(r.getLong(6) == expectedSpecQ20(doc), s"doc $doc spec_sum")
      if (Mp3PcmSynth.silent(doc))
        assert(r.getInt(7) == 0, s"doc $doc: silence must reach the PCM exactly")
      else
        assert(r.getInt(7) > 0, s"doc $doc: nonzero spectrum must produce PCM")
      assert(r.getArray(8).numElements() ==
        Mp3PcmSynth.frames(doc) * 1152 * Mp3PcmSynth.channels(doc))
      // conformance flag: non-silent fixtures rotate region2 through
      // the grade-B linbits families (19/21/24/26), so they must be
      // MARKED bit_exact=false; silent docs never consult a big-value
      // table and stay true
      assert(r.getBoolean(9) == Mp3PcmSynth.silent(doc),
        s"doc $doc bit_exact flag")
    }
  }

  test("huffman data: every shipped table builds a complete prefix-free LUT") {
    // the LUT builder throws on any overlap (prefix violation) or
    // unreachable entry (Kraft under-subscription) — building every
    // table IS the data validation
    val ids = Seq(1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15) ++ (16 to 31)
    for (id <- ids) {
      val lut = Mp3HuffTables.lutFor(id)
      assert(lut != null, s"table $id")
      assert(lut.bits >= 1 && lut.bits <= 19, s"table $id width")
    }
    assert(Mp3HuffTables.count1ALut.bits == 6)
    // not-used ids and table 0 have no code data
    assert(Mp3HuffTables.lutFor(0) == null)
    assert(Mp3HuffTables.lutFor(4) == null)
    assert(Mp3HuffTables.lutFor(14) == null)
    // the 16-23 / 24-31 families share code tables; linbits differ
    assert(Mp3HuffTables.dataFor(17) eq Mp3HuffTables.dataFor(16))
    assert(Mp3HuffTables.dataFor(31) eq Mp3HuffTables.dataFor(24))
    assert(Mp3HuffTables.Linbits(16) == 1 && Mp3HuffTables.Linbits(23) == 13)
    assert(Mp3HuffTables.Linbits(24) == 4 && Mp3HuffTables.Linbits(31) == 13)
    // spot-pin table 1 against its published code strings:
    // (0,0)→"1", (0,1)→"001", (1,0)→"01", (1,1)→"000"
    assert(Mp3HuffTables.t1.toSeq ==
      Seq((1 << 20) | 1, (3 << 20) | 1, (2 << 20) | 1, (3 << 20) | 0))
    // t13 carries the format's deepest codes
    assert(Mp3HuffTables.lutFor(13).bits == 19)
  }

  test("intensity stereo actively projects: clearing mode-ext changes PCM") {
    // doc 1: stereo, non-silent, doc%3==1 → intensity joint stereo
    val b = Mp3PcmSynth.mp3Bytes(1L)
    assert((b(3) & 0xF0) == 0x50, "mode 1 (joint), mode_ext 1 (intensity)")
    val r1 = Mp3L3Codec.compute(b)
    assert(r1.getUTF8String(0).toString == "mp3")
    // clear the intensity bit in EVERY frame header: the stream then
    // decodes as plain joint stereo with no processing. The spectrum
    // fingerprint is INVARIANT (kl + kr = 1 per line), but the PCM must
    // differ — proof the intensity path actively transforms channels.
    val frameLen = 144 * 128000 / 48000 // doc 1: srIdx = 1
    val c = b.clone()
    var f = 0
    while (f * frameLen < c.length) {
      c(f * frameLen + 3) = (c(f * frameLen + 3) & ~0x10).toByte
      f += 1
    }
    val r2 = Mp3L3Codec.compute(c)
    assert(r2.getUTF8String(0).toString == "mp3")
    assert(r1.getLong(6) == r2.getLong(6),
      "spectrum sum must be intensity-invariant")
    val s1 = r1.getArray(8).toIntArray()
    val s2 = r2.getArray(8).toIntArray()
    assert(s1.length == s2.length && !java.util.Arrays.equals(s1, s2),
      "intensity must change the decoded PCM")
  }

  test("intensity is_pos factors: 0 routes all energy right, 6 all left") {
    // hand-check the exact-dyadic positions through a real decode:
    // doc 19 is intensity (19%3==1, stereo, non-silent); its is_pos
    // values per band come from the fixture formula
    for (sfb <- 3 to 20; g <- 0 to 1) {
      val p = Mp3PcmSynth.isPos(19L, sfb, g)
      assert(Seq(0, 3, 6, 7).contains(p))
    }
    val r = Mp3L3Codec.compute(Mp3PcmSynth.mp3Bytes(19L))
    assert(r.getUTF8String(0).toString == "mp3" && r.getInt(7) > 0)
  }

  test("silent stereo uses MS joint stereo and still yields exact zeros") {
    // doc 5: silent (5 % 5 == 0) and stereo (1 + 5 % 2 == 2)
    val b = Mp3PcmSynth.mp3Bytes(5L)
    assert((b(3) & 0xC0) == 0x40 && ((b(3) >> 4) & 3) == 2, "MS joint header")
    val r = Mp3L3Codec.compute(b)
    assert(r.getUTF8String(0).toString == "mp3" && r.getInt(7) == 0)
  }

  test("bit reservoir: main_data_begin reaching back one frame decodes") {
    // hand-shift a two-frame fixture: move the LAST 8 main-data bytes
    // of frame 1's payload area is not trivial to cut safely, so build
    // the reservoir case directly: frame 2's main_data_begin points at
    // bytes that live at the END of frame 1's stuffing region. We
    // rewrite frame 2's side info to main_data_begin = N and prepend
    // its real main data into frame 1's tail padding.
    val doc = 2L // mono (1 + 2%2), 32 kHz, nonzero
    val orig = Mp3PcmSynth.mp3Bytes(doc)
    val frameLen = 144 * 128000 / 32000
    assert(orig.length >= 2 * frameLen)
    // locate frame 2
    val f2 = frameLen
    // main data region of a mono frame: header 4 + side 17
    val mdOff = 21
    val mdLen = frameLen - mdOff
    // choose N = 40 bytes moved back into frame 1's tail
    val n = 40
    val moved = orig.clone()
    // copy frame 2's first n main-data bytes into the last n bytes of
    // frame 1 (stuffing zeros there), then shift frame 2's main data
    // left is NOT needed: the reservoir is byte-contiguous across
    // frames — the decoder concatenates [frame1 main][frame2 main], so
    // moving the bytes means frame 2's data begins n bytes EARLIER in
    // the stream. Rewrite: frame1 tail := first n bytes of frame2 md;
    // frame2 md := remaining bytes shifted left by n (tail zeros).
    var k = 0
    while (k < n) {
      moved(f2 - n + k) = orig(f2 + mdOff + k)
      k += 1
    }
    k = 0
    while (k < mdLen - n) {
      moved(f2 + mdOff + k) = orig(f2 + mdOff + n + k)
      k += 1
    }
    k = 0
    while (k < n) { moved(f2 + mdOff + mdLen - n + k) = 0; k += 1 }
    // set frame 2's main_data_begin = n (first 9 bits of side info)
    moved(f2 + 4) = ((n >> 1) & 0xFF).toByte
    moved(f2 + 5) = (((n & 1) << 7) | (moved(f2 + 5) & 0x7F)).toByte
    val r = Mp3L3Codec.compute(moved)
    assert(r.getUTF8String(0).toString == "mp3", "reservoir stream rejected")
    // identical content → identical spectrum fingerprint
    assert(r.getLong(6) == expectedSpecQ20(doc), "reservoir decode differs")
  }

  test("CRC-16: protected frames verify; a flipped side-info bit rejects") {
    // doc 3 carries protection bit 0 with a real CRC (3 % 7 == 3)
    val b = Mp3PcmSynth.mp3Bytes(3L)
    assert((b(1) & 1) == 0, "protection bit must be 0 on doc 3")
    val r = Mp3L3Codec.compute(b)
    assert(r.getUTF8String(0).toString == "mp3", "CRC frame rejected")
    assert(r.getLong(6) == expectedSpecQ20(3L), "CRC frame content differs")
    // corrupt one side-info byte (covered by the CRC): must reject
    val c = b.clone()
    c(8) = (c(8) ^ 0x40).toByte
    assert(Mp3L3Codec.compute(c).getUTF8String(0).toString == "unknown",
      "CRC mismatch must reject")
    // corrupt the stored CRC itself: must reject too
    val c2 = b.clone()
    c2(4) = (c2(4) ^ 1).toByte
    assert(Mp3L3Codec.compute(c2).getUTF8String(0).toString == "unknown")
  }

  test("reject matrix: truncation, reservoir underrun, unsupported paths") {
    val ok = Mp3PcmSynth.mp3Bytes(1L)
    def fmt(b: Array[Byte]): String =
      Mp3L3Codec.compute(b).getUTF8String(0).toString
    assert(fmt(ok.take(ok.length - 10)) == "unknown", "torn frame")
    // frame 1 with main_data_begin != 0: nothing to reach back into
    val c1 = ok.clone()
    c1(4) = 0x10
    assert(fmt(c1) == "unknown", "reservoir underrun")
    // intensity stereo now DECODES: doc 5 is silent MS stereo; setting
    // mode_ext bit 0 turns on intensity over an all-zero spectrum,
    // which must pass through the full intensity path to exact zeros
    val ms = Mp3PcmSynth.mp3Bytes(5L)
    val c2 = ms.clone()
    c2(3) = (c2(3) | 0x10).toByte
    val r2 = Mp3L3Codec.compute(c2)
    assert(r2.getUTF8String(0).toString == "mp3", "intensity decodes")
    assert(r2.getInt(7) == 0, "silent intensity stays exactly zero")
    // MPEG-2 header rejects the PCM decoder (meta walk still covers it)
    val c3 = ok.clone()
    c3(1) = 0xF3.toByte
    assert(fmt(c3) == "unknown", "MPEG-2 LSF out of PCM scope")
    assert(fmt(Array[Byte](1, 2, 3, 4)) == "unknown")
  }

  test("not-used big-value table ids 4 and 14 reject instead of guessing") {
    // doc 2 is MONO nonzero; table_select(0) sits in side info:
    // bits: 9 (mdb) + 5 (priv) + 4 (scfsi) + 12 + 9 + 8 + 4 + 1 = 52
    // bits into side info → table_select starts at bit 52
    for (bad <- Seq(4, 14)) {
      val c = Mp3PcmSynth.mp3Bytes(2L).clone()
      val bitOff = (4 * 8) + 52 // absolute bit of table_select(0)
      var k = 0
      while (k < 5) {
        val v = (bad >> (4 - k)) & 1
        val byteI = (bitOff + k) >> 3
        val bitI = 7 - ((bitOff + k) & 7)
        c(byteI) = ((c(byteI) & ~(1 << bitI)) | (v << bitI)).toByte
        k += 1
      }
      assert(Mp3L3Codec.compute(c).getUTF8String(0).toString == "unknown",
        s"table $bad must reject")
    }
  }

  test("filterbank envelope: nonzero spectra yield bounded, nonzero PCM") {
    // the spectral lines are O(1/8..8) and the calibrated filterbank
    // must keep the PCM inside a sane envelope — runaway gain or a
    // dead filterbank both fail
    for (doc <- Seq(1L, 2L, 3L, 4L, 6L)) {
      val r = Mp3L3Codec.compute(Mp3PcmSynth.mp3Bytes(doc))
      val peak = r.getInt(7)
      assert(peak > 16 && peak <= 32768, s"doc $doc peak $peak out of envelope")
    }
  }

  test("scfsi: granule-1 scalefactor reuse decodes (hand-patched stream)") {
    // doc 0 is silent mono: flip all four scfsi bits for channel 0 and
    // strip granule 1's scalefactor bits from its part2_3_length.
    // Easier exact check: patch scfsi=1111 AND set gr1 part2_3 to 0 so
    // gr1 reads NO scalefactors and reuses gr0's — silent either way,
    // and the stream must still DECODE (not reject).
    val ok = Mp3PcmSynth.mp3Bytes(0L)
    val c = ok.clone()
    // mono side info: mdb 9 + priv 5 = 14 bits, scfsi bits 14-17
    var k = 0
    while (k < 4) {
      val bitOff = 32 + 14 + k
      val byteI = bitOff >> 3
      val bitI = 7 - (bitOff & 7)
      c(byteI) = (c(byteI) | (1 << bitI)).toByte
      k += 1
    }
    // gr1 part2_3_length: starts at bit 14+4+59 = 77 of side info
    val p23Off = 32 + 77
    k = 0
    while (k < 12) {
      val bitOff = p23Off + k
      val byteI = bitOff >> 3
      val bitI = 7 - (bitOff & 7)
      c(byteI) = (c(byteI) & ~(1 << bitI)).toByte
      k += 1
    }
    val r = Mp3L3Codec.compute(c)
    assert(r.getUTF8String(0).toString == "mp3", "scfsi stream rejected")
    assert(r.getInt(7) == 0)
  }

  test("synthesis window: finite, normalized, and silence-preserving") {
    val d = Mp3L3Codec.DWin
    assert(d.length == 512)
    assert(d.forall(v => !v.isNaN && !v.isInfinite))
    val peak = d.map(math.abs).max
    assert(peak > 1e-4 && peak < 2.0, s"window peak $peak out of range")
  }
}
