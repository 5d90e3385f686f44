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

  test("reject matrix: torn sub-blocks, missing trailer, bad signature") {
    val ok = GifAnimSynth.gifAnimBytes(6, 8, 3, seed = 1L)
    assert(GifFrames.compute(ok.take(ok.length - 1), 1).isNullAt(0), "no trailer")
    assert(GifFrames.compute(ok.take(ok.length / 2), 1).isNullAt(0), "torn")
    val c = ok.clone(); c(3) = 'X'
    assert(GifFrames.compute(c, 1).isNullAt(0), "bad signature")
  }
}
