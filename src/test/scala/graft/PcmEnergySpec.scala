package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** Windowed audio energy contracts: window arithmetic incl. the short
  * last window, cross-channel reduction, exact integer math.
  */
class PcmEnergySpec extends AnyFunSuite {

  private def pcm(ch: Int, samples: Array[Int]) =
    PcmDecode.flacRow(ch, 8000, 16, samples.length / ch, samples)

  test("energy and peak per window, short last window included") {
    // 2 channels, 5 frames, window 2 -> windows of frames {0,1},{2,3},{4}
    val s = Array(1, -2, 3, 4, -5, 6, 0, -7, 8, 9)
    val r = PcmEnergyWindows.compute(pcm(2, s), 2)
    assert(r.getInt(0) == 3)
    assert(r.getArray(1).toIntArray().toSeq == Seq(0, 1, 2))
    val e = r.getArray(2).toLongArray()
    val p = r.getArray(3).toLongArray()
    assert(e(0) == 1 + 4 + 9 + 16)
    assert(e(1) == 25 + 36 + 0 + 49)
    assert(e(2) == 64 + 81)
    assert(p.toSeq == Seq(4L, 7L, 9L))
  }

  test("unknown PCM row yields null") {
    assert(PcmEnergyWindows.compute(PcmDecode.unknownFlacRow, 4) == null)
  }
}
