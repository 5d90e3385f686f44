package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** dHash contracts: grid sampling, gradient bits, channel handling. */
class DHashSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int, ch: Int, px: Array[Byte]) =
    ImageDecode.rasterRow(org.apache.spark.unsafe.types.UTF8String
      .fromString("ppm"), w, h, ch, px)

  test("monotone ramp rows hash to all-ones; flat image to all-zeros") {
    val w = 9; val h = 8
    val ramp = Array.tabulate[Byte](w * h)(i => ((i % w) * 20).toByte)
    assert(RasterDHash.compute(raster(w, h, 1, ramp)).longValue() == -1L)
    val flat = Array.fill[Byte](w * h)(100.toByte)
    assert(RasterDHash.compute(raster(w, h, 1, flat)).longValue() == 0L)
  }

  test("RGB gray averaging: (r+g+b)/3 drives the comparison") {
    // two columns: left (10,20,30) -> 20, right (30,30,30) -> 30: bit set
    val w = 9; val h = 8
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      if (x == 1) { px(d) = 30; px(d + 1) = 30; px(d + 2) = 30 }
      else { px(d) = 10; px(d + 1) = 20; px(d + 2) = 30 }
    }
    val dh = RasterDHash.compute(raster(w, h, 3, px)).longValue()
    // gradient up at gx=0 (20 -> 30), down at gx=1 (30 -> 20), flat after
    for (gy <- 0 until 8) {
      assert(((dh >> (gy * 8)) & 1) == 1, s"row $gy bit 0")
      assert(((dh >> (gy * 8 + 1)) & 1) == 0, s"row $gy bit 1")
    }
  }

  test("scale invariance: 2x nearest-neighbor upscaling preserves the hash") {
    val rnd = new scala.util.Random(11)
    val w = 18; val h = 16
    val small = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    val big = new Array[Byte](w * 2 * h * 2)
    for (y <- 0 until h * 2; x <- 0 until w * 2)
      big(y * w * 2 + x) = small((y / 2) * w + x / 2)
    val a = RasterDHash.compute(raster(w, h, 1, small)).longValue()
    val b = RasterDHash.compute(raster(w * 2, h * 2, 1, big)).longValue()
    assert(a == b, "dHash must survive exact 2x NN upscaling")
  }

  test("unknown raster hashes to null") {
    assert(RasterDHash.compute(ImageDecode.unknownRow) == null)
  }

  test("video frame dhash: AVI and MP4 twins hash identically; stride samples") {
    for (doc <- 0L to 9L) {
      val w = 16L * (2 + doc % 3)
      val frames = 3 + doc % 4
      val avi = VideoFrameDhashes.compute(
        AviSynth.aviBytes(w, 32, frames, doc), 1)
      val mp4 = VideoFrameDhashes.compute(
        Mp4SamplesSynth.mp4MjpegBytes(w, 32, frames, doc), 1)
      assert(!avi.isNullAt(0) && !mp4.isNullAt(0), s"doc $doc")
      assert(avi.getInt(0) == frames && mp4.getInt(0) == frames)
      assert(avi.getArray(2).toLongArray().toSeq ==
        mp4.getArray(2).toLongArray().toSeq,
        s"doc $doc: containers must hash identically")
      // stride 2: every other frame, skipped frames cost no decode
      val s2 = VideoFrameDhashes.compute(
        AviSynth.aviBytes(w, 32, frames, doc), 2)
      assert(s2.getArray(1).toIntArray().toSeq ==
        (0 until frames.toInt by 2))
    }
    // truncation sweep: classify, never throw
    val b = AviSynth.aviBytes(32, 32, 4, 3)
    var k = 0
    while (k < b.length) {
      VideoFrameDhashes.compute(b.take(k), 1)
      k += 17
    }
  }
}
