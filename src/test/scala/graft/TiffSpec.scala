package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** Baseline-TIFF codec contracts: byte-order equivalence, strip
  * assembly, both PackBits packet kinds, and the honest-reject matrix.
  */
class TiffSpec extends AnyFunSuite {

  private def decode(b: Array[Byte]) = ImageDecode.compute(b)
  private def fmt(r: org.apache.spark.sql.catalyst.InternalRow): String =
    r.getUTF8String(0).toString

  test("II and MM files with the same pixels decode identically") {
    for (seed <- 0L to 5L; (w, h) <- Seq((7, 5), (16, 9), (3, 11))) {
      val ii = decode(TiffSynth.tiffBytes(w, h, seed, 0))
      val mm = decode(TiffSynth.tiffBytes(w, h, seed, 1))
      assert(fmt(ii) == "tiff" && fmt(mm) == "tiff", s"$w x $h seed=$seed")
      assert(ii.getInt(1) == w && ii.getInt(2) == h && ii.getInt(3) == 3)
      assert(java.util.Arrays.equals(ii.getBinary(4), mm.getBinary(4)))
    }
  }

  test("uncompressed RGB pixels match the generative formula across strips") {
    val w = 9; val h = 11 // 3 strips of 4,4,3 rows
    val r = decode(TiffSynth.tiffBytes(w, h, 4L, 0))
    assert(fmt(r) == "tiff")
    val px = r.getBinary(4)
    for (p <- 0 until w * h; c <- 0 until 3)
      assert((px(p * 3 + c) & 0xFF) == TiffSynth.rgbAt(4L, p, c), s"p=$p c=$c")
  }

  test("PackBits gray: run rows and literal rows both reconstruct") {
    val w = 12; val h = 6
    val r = decode(TiffSynth.tiffBytes(w, h, 7L, 2))
    assert(fmt(r) == "tiff")
    assert(r.getInt(3) == 1)
    val px = r.getBinary(4)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xFF) == TiffSynth.grayAt(7L, w, x, y), s"($x,$y)")
  }

  test("PackBits RGB (MM) round-trips the real packer") {
    val r = decode(TiffSynth.tiffBytes(10, 9, 3L, 3))
    assert(fmt(r) == "tiff")
    val px = r.getBinary(4)
    for (p <- 0 until 90; c <- 0 until 3)
      assert((px(p * 3 + c) & 0xFF) == TiffSynth.rgbAt(3L, p, c), s"p=$p c=$c")
  }

  test("hand-built golden: single-strip file with inline SHORT values") {
    // 2x2 gray, uncompressed, one strip, every value inline — pins the
    // inline-value path and LONG/SHORT slot layouts byte-for-byte
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    out.write('I'); out.write('I'); w16(42); w32(8)
    w16(8) // 8 entries
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      w16(tag); w16(typ); w32(count)
      if (typ == 3) { w16(value); w16(0) } else w32(value)
    }
    val dataOff = 8 + 2 + 8 * 12 + 4
    entry(256, 3, 1, 2)  // width as SHORT (inline upper-half layout)
    entry(257, 3, 1, 2)
    entry(258, 3, 1, 8)
    entry(259, 3, 1, 1)
    entry(262, 3, 1, 1)
    entry(273, 4, 1, dataOff)
    entry(278, 3, 1, 2)
    entry(279, 4, 1, 4)
    w32(0)
    out.write(10); out.write(20); out.write(30); out.write(40)
    val r = decode(out.toByteArray)
    assert(fmt(r) == "tiff")
    assert(r.getInt(1) == 2 && r.getInt(2) == 2 && r.getInt(3) == 1)
    assert(r.getBinary(4).toSeq == Seq[Byte](10, 20, 30, 40))
  }

  test("LZW hand golden: the spec walk incl. the KwKwK case decodes") {
    // Codes for [7,7,7,8,8,8,7,7,7] derived by hand from TIFF 6.0 §13:
    // Clear, 7, 258 (KwKwK), 8, 260 (KwKwK), 258, 7, EOI — all 9-bit,
    // MSB-packed to these 9 bytes. Pins bit order, Clear handling, and
    // both add-rule branches independently of our own encoder.
    val stream = Array(128, 1, 224, 64, 136, 36, 8, 15, 1).map(_.toByte)
    val got = TiffCodec.lzwDecode(stream, 0, stream.length, 9)
    assert(got != null && got.toSeq == Seq[Byte](7, 7, 7, 8, 8, 8, 7, 7, 7))
  }

  test("LZW roundtrip across ALL width boundaries and a table-full Clear") {
    // High-entropy data grows the dictionary ~1 entry per input byte:
    // 3 KB crosses 9->10->11 bits, 6 KB reaches 12, 12 KB forces the
    // table-full Clear + width reset mid-stream.
    val rnd = new scala.util.Random(42)
    for (n <- Seq(10, 300, 3000, 6000, 12000)) {
      val data = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      val enc = TiffSynth.lzwEncode(data)
      val dec = TiffCodec.lzwDecode(enc, 0, enc.length, n)
      assert(dec != null, s"n=$n rejected")
      assert(java.util.Arrays.equals(dec, data), s"n=$n mismatch")
    }
    // low-entropy data exercises long KwKwK chains across boundaries
    val runs = Array.tabulate[Byte](9000)(i => (i / 200).toByte)
    val enc = TiffSynth.lzwEncode(runs)
    assert(java.util.Arrays.equals(
      TiffCodec.lzwDecode(enc, 0, enc.length, runs.length), runs))
  }

  test("LZW gray (mode 4) and LZW+predictor RGB (mode 5) match the formulas") {
    val r4 = decode(TiffSynth.tiffBytes(13, 11, 5L, 4))
    assert(fmt(r4) == "tiff" && r4.getInt(3) == 1)
    val px4 = r4.getBinary(4)
    for (y <- 0 until 11; x <- 0 until 13)
      assert((px4(y * 13 + x) & 0xFF) == TiffSynth.grayAt(5L, 13, x, y), s"($x,$y)")
    val r5 = decode(TiffSynth.tiffBytes(9, 7, 6L, 5))
    assert(fmt(r5) == "tiff" && r5.getInt(3) == 3)
    val px5 = r5.getBinary(4)
    for (p <- 0 until 63; c <- 0 until 3)
      assert((px5(p * 3 + c) & 0xFF) == TiffSynth.rgbAt(6L, p, c),
        s"predictor undiff p=$p c=$c")
  }

  test("palette (mode 6): indices map through the 16-bit ColorMap's high byte") {
    val r = decode(TiffSynth.tiffBytes(10, 6, 3L, 6))
    assert(fmt(r) == "tiff" && r.getInt(3) == 3)
    val px = r.getBinary(4)
    for (p <- 0 until 60) {
      val idx = TiffSynth.palIdxAt(3L, p)
      for (c <- 0 until 3)
        assert((px(3 * p + c) & 0xFF) == (TiffSynth.cmapAt(c, idx, 3L) >> 8),
          s"p=$p c=$c")
    }
  }

  test("16-bit gray (modes 7/8): high byte honors the file byte order") {
    for ((mode, label) <- Seq(7 -> "MM", 8 -> "II+LZW")) {
      val r = decode(TiffSynth.tiffBytes(12, 9, 9L, mode))
      assert(fmt(r) == "tiff" && r.getInt(3) == 1, label)
      val px = r.getBinary(4)
      for (p <- 0 until 108)
        assert((px(p) & 0xFF) == (TiffSynth.gray16At(9L, p) >> 8), s"$label p=$p")
    }
    // same pixels travel as MM (7): an endianness bug in the 16-bit
    // path would emit the LOW byte for one of the orders
    val ii = decode(TiffSynth.tiffBytes(12, 9, 9L, 8)).getBinary(4)
    val mm = decode(TiffSynth.tiffBytes(12, 9, 9L, 7)).getBinary(4)
    assert(java.util.Arrays.equals(ii, mm))
  }

  test("tiled (modes 9/10): multi-tile assembly, edge padding, per-tile predictor") {
    // 20x18 -> 2x2 tiles of 16x16 with right/bottom padding
    val r9 = decode(TiffSynth.tiffBytes(20, 18, 4L, 9))
    assert(fmt(r9) == "tiff" && r9.getInt(1) == 20 && r9.getInt(2) == 18 &&
      r9.getInt(3) == 3)
    val px9 = r9.getBinary(4)
    for (p <- 0 until 360; c <- 0 until 3)
      assert((px9(p * 3 + c) & 0xFF) == TiffSynth.rgbAt(4L, p, c),
        s"tiled LZW+pred p=$p c=$c")
    val r10 = decode(TiffSynth.tiffBytes(33, 17, 7L, 10))
    assert(fmt(r10) == "tiff" && r10.getInt(3) == 1)
    val px10 = r10.getBinary(4)
    for (p <- 0 until 33 * 17)
      assert((px10(p) & 0xFF) == (TiffSynth.gray16At(7L, p) >> 8),
        s"tiled MM 16-bit p=$p")
    // exactly-tile-aligned dims also work (no padding path)
    val ra = decode(TiffSynth.tiffBytes(32, 16, 2L, 9))
    assert(fmt(ra) == "tiff" && ra.getInt(1) == 32)
  }

  test("tiled reject: a TileWidth that is not a multiple of 16") {
    val ok = TiffSynth.tiffBytes(20, 18, 1L, 9)
    val c = ok.clone()
    // II layout: find tag 322's entry and set its LONG value to 15
    val n = (c(8) & 0xFF) | ((c(9) & 0xFF) << 8)
    var e = 0
    while (e < n) {
      val off = 10 + 12 * e
      val t = (c(off) & 0xFF) | ((c(off + 1) & 0xFF) << 8)
      if (t == 322) { c(off + 8) = 15; c(off + 9) = 0 }
      e += 1
    }
    assert(fmt(decode(c)) == "unknown")
    // torn tile data
    assert(fmt(decode(ok.take(ok.length - 9))) == "unknown")
  }

  test("reject matrix: planar, missing ColorMap, 16-bit predictor, torn streams") {
    val ok = TiffSynth.tiffBytes(8, 6, 1L, 0)
    assert(fmt(decode(ok)) == "tiff")
    def mutEntry(tag: Int, newValue: Int): Array[Byte] = {
      val c = ok.clone()
      // IFD at 8: count then entries; find the tag (II layout)
      val n = (c(8) & 0xFF) | ((c(9) & 0xFF) << 8)
      var e = 0
      while (e < n) {
        val off = 10 + 12 * e
        val t = (c(off) & 0xFF) | ((c(off + 1) & 0xFF) << 8)
        if (t == tag) {
          c(off + 8) = (newValue & 0xFF).toByte
          c(off + 9) = ((newValue >> 8) & 0xFF).toByte
        }
        e += 1
      }
      c
    }
    assert(fmt(decode(mutEntry(259, 5))) == "unknown",
      "raw bytes relabeled LZW are not a valid code stream")
    assert(fmt(decode(mutEntry(262, 3))) == "unknown",
      "palette without a ColorMap rejects")
    assert(fmt(decode(mutEntry(284, 2))) == "unknown", "planar rejects")
    // unknown predictor value: flip mode 5's tag 317 (MM layout) to 3
    locally {
      val p5 = TiffSynth.tiffBytes(8, 6, 1L, 5)
      val cp = p5.clone()
      val np = ((cp(8) & 0xFF) << 8) | (cp(9) & 0xFF)
      var ep = 0
      while (ep < np) {
        val off = 10 + 12 * ep
        val t = ((cp(off) & 0xFF) << 8) | (cp(off + 1) & 0xFF)
        if (t == 317) cp(off + 9) = 3
        ep += 1
      }
      assert(fmt(decode(cp)) == "unknown", "unknown predictor value rejects")
    }
    assert(fmt(decode(ok.take(ok.length - 10))) == "unknown", "torn strip")
    // PackBits overrun: truncate a packed file mid-stream
    val packed = TiffSynth.tiffBytes(12, 6, 7L, 2)
    assert(fmt(decode(packed.take(packed.length - 5))) == "unknown")
    // torn LZW: truncate an LZW file mid-stream
    val lzw = TiffSynth.tiffBytes(16, 12, 7L, 4)
    assert(fmt(decode(lzw.take(lzw.length - 5))) == "unknown", "torn LZW")
    // 16-bit with BitsPerSample flipped on an 8-bit file: strip byte
    // counts no longer cover the doubled row size
    val g = TiffSynth.tiffBytes(8, 6, 1L, 2)
    val c = g.clone()
    val n = (c(8) & 0xFF) | ((c(9) & 0xFF) << 8)
    var e = 0
    while (e < n) {
      val off = 10 + 12 * e
      val t = (c(off) & 0xFF) | ((c(off + 1) & 0xFF) << 8)
      if (t == 258) c(off + 8) = 16
      e += 1
    }
    assert(fmt(decode(c)) == "unknown", "16-bit with 8-bit strip sizes rejects")
    // predictor 2 on a 16-bit file rejects (8-bit-only support)
    val g16 = TiffSynth.tiffBytes(8, 6, 1L, 7)
    val c2 = g16.clone()
    // MM file: IFD count at 8-9 big-endian, entries from 10
    val n2 = ((c2(8) & 0xFF) << 8) | (c2(9) & 0xFF)
    var e2 = 0
    var done = false
    while (e2 < n2 && !done) {
      val off = 10 + 12 * e2
      val t = ((c2(off) & 0xFF) << 8) | (c2(off + 1) & 0xFF)
      if (t == 284) {
        // no predictor entry exists in mode 7; flip PlanarConfig's tag
        // to 317 (same SHORT layout) with value 2 to fake one
        c2(off) = 0x01; c2(off + 1) = 0x3D // tag 317
        c2(off + 8) = 0; c2(off + 9) = 2
        done = true
      }
      e2 += 1
    }
    assert(done && fmt(decode(c2)) == "unknown", "16-bit predictor rejects")
  }
}
