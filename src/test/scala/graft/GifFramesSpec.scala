package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** Animated-GIF frame-extraction contracts: sampling arithmetic,
  * per-frame sums vs the formula, and the reject matrix.
  */
class GifFramesSpec extends AnyFunSuite {

  private def expected(seed: Long, w: Int, h: Int, f: Int): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var p = 0
    while (p < w * h) {
      val idx = java.lang.Math.floorMod(seed * 31 + f * 11 + p * 7, 256)
      r += idx; g += (2 * idx) % 256; b += (3 * idx) % 256
      p += 1
    }
    (r, g, b)
  }

  test("stride sampling keeps the right frames with formula-exact sums") {
    val b = GifAnimSynth.gifAnimBytes(6, 8, 7, seed = 5L)
    assert(b != null)
    for ((stride, want) <- Seq(1 -> (0 to 6), 2 -> Seq(0, 2, 4, 6), 3 -> Seq(0, 3, 6))) {
      val r = GifFrames.compute(b, stride)
      assert(!r.isNullAt(0), s"stride $stride rejected")
      assert(r.getInt(0) == 6 && r.getInt(1) == 8 && r.getInt(3) == 7)
      assert(r.getArray(4).toIntArray().toSeq == want.toSeq, s"stride $stride")
      val rs = r.getArray(5).toLongArray()
      val gs = r.getArray(6).toLongArray()
      val bs = r.getArray(7).toLongArray()
      for ((f, k) <- want.zipWithIndex) {
        val (er, eg, eb) = expected(5L, 6, 8, f)
        assert(rs(k) == er && gs(k) == eg && bs(k) == eb, s"frame $f sums")
      }
    }
  }

  test("single-frame GIF from the existing fixture still walks (n_frames 1)") {
    val b = RasterSynth.gifBytes(5, 4, seed = 9L)
    val r = GifFrames.compute(b, 1)
    assert(!r.isNullAt(0))
    assert(r.getInt(3) == 1)
  }

  test("disposal-using GIF: sampled frames are the RAW per-frame rasters") {
    // Pins the compositing contract (stated in the GifFrames scaladoc):
    // inter-frame disposal/transparency compositing is a renderer
    // concern; each sampled frame's sums cover ONLY its own rect's raw
    // palette-mapped pixels. Frame 1: full 4x4 canvas of index 1 with
    // disposal "do not dispose". Frame 2: a 2x2 sub-rect at (1,1), all
    // index 2, disposal "restore to background" + transparency flag.
    // A compositing decoder would report frame 2 over the full canvas
    // (12 px of palette[1] + 4 px of palette[2]); the raw contract is
    // 4 px of palette[2] only.
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(4); out.write(0); out.write(4); out.write(0) // 4x4 canvas
    out.write(0xF7); out.write(0); out.write(0) // 256-entry GCT
    for (c <- 0 until 256) {
      out.write(c); out.write((2 * c) % 256); out.write((3 * c) % 256)
    }
    def frame(x: Int, y: Int, w: Int, h: Int, fill: Int, disposal: Int,
        transparent: Boolean): Unit = {
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write((disposal << 2) | (if (transparent) 1 else 0))
      out.write(4); out.write(0) // delay
      out.write(0) // transparent index 0 (no pixel uses it here)
      out.write(0)
      out.write(0x2C)
      out.write(x); out.write(0); out.write(y); out.write(0)
      out.write(w); out.write(0); out.write(h); out.write(0)
      out.write(0)
      out.write(8)
      val lzw = RasterSynth.lzwEncode(Array.fill[Byte](w * h)(fill.toByte), 8)
      out.write(lzw.length)
      out.write(lzw, 0, lzw.length)
      out.write(0)
    }
    frame(0, 0, 4, 4, fill = 1, disposal = 1, transparent = false)
    frame(1, 1, 2, 2, fill = 2, disposal = 2, transparent = true)
    out.write(0x3B)
    val r = GifFrames.compute(out.toByteArray, 1)
    assert(!r.isNullAt(0) && r.getInt(3) == 2)
    assert(r.getArray(5).toLongArray().toSeq == Seq(16L, 8L), "r: raw, not composited")
    assert(r.getArray(6).toLongArray().toSeq == Seq(32L, 16L), "g")
    assert(r.getArray(7).toLongArray().toSeq == Seq(48L, 24L), "b")
  }

  test("reject matrix: torn sub-blocks, missing trailer, bad signature") {
    val ok = GifAnimSynth.gifAnimBytes(6, 8, 3, seed = 1L)
    assert(GifFrames.compute(ok.take(ok.length - 1), 1).isNullAt(0), "no trailer")
    assert(GifFrames.compute(ok.take(ok.length / 2), 1).isNullAt(0), "torn")
    val c = ok.clone(); c(3) = 'X'
    assert(GifFrames.compute(c, 1).isNullAt(0), "bad signature")
  }
}
