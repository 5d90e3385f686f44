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

  test("reject matrix: LZW, 16-bit, planar, palette, torn strip, PackBits overrun") {
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
    assert(fmt(decode(mutEntry(259, 5))) == "unknown", "LZW rejects")
    assert(fmt(decode(mutEntry(262, 3))) == "unknown", "palette rejects")
    assert(fmt(decode(mutEntry(284, 2))) == "unknown", "planar rejects")
    assert(fmt(decode(ok.take(ok.length - 10))) == "unknown", "torn strip")
    // PackBits overrun: truncate a packed file mid-stream
    val packed = TiffSynth.tiffBytes(12, 6, 7L, 2)
    assert(fmt(decode(packed.take(packed.length - 5))) == "unknown")
    // 16-bit: gray file with BitsPerSample 16
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
    assert(fmt(decode(c)) == "unknown", "16-bit rejects")
  }
}
