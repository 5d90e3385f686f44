package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** Animated-WebP frame-extraction contracts: sampling, both nested
  * coded forms, and the reject matrix.
  */
class WebpAnimSpec extends AnyFunSuite {

  test("stride sampling over lossy VP8 frames matches the still decoder") {
    val b = WebpAnimSynth.webpAnimBytes(32, 16, 5, seed = 7L)
    assert(b != null)
    for ((stride, want) <- Seq(1 -> Seq(0, 1, 2, 3, 4), 2 -> Seq(0, 2, 4))) {
      val r = WebpAnimFrames.compute(b, stride)
      assert(!r.isNullAt(0), s"stride $stride rejected")
      assert(r.getInt(0) == 32 && r.getInt(1) == 16 && r.getInt(3) == 5)
      assert(r.getArray(4).toIntArray().toSeq == want, s"stride $stride")
      val rs = r.getArray(5).toLongArray()
      for ((f, k) <- want.zipWithIndex) {
        // per-frame sums must equal the still decoder's over the same frame
        val still = ImageDecode.compute(Vp8Synth.vp8Bytes(32, 16, 7L + 131L * f, 1))
        val px = still.getBinary(4)
        var rr = 0L
        var p = 0
        while (p < px.length) { rr += px(p) & 0xFF; p += 3 }
        assert(rs(k) == rr, s"frame $f r_sum")
      }
    }
  }

  test("nested VP8L frames decode through the lossless codec") {
    // hand-wrap a VP8L still as a one-frame animation
    val still = WebpSynth.webpBytes(16, 16, 3L)
    val chunkLen = (still(16) & 0xFF) | ((still(17) & 0xFF) << 8) |
      ((still(18) & 0xFF) << 16) | ((still(19) & 0xFF) << 24)
    val frame = java.util.Arrays.copyOfRange(still, 20, 20 + chunkLen)
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = s.foreach(c => out.write(c))
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def u24(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF); out.write((v >> 16) & 0xFF)
    }
    val anmf = 16 + 8 + frame.length + (frame.length & 1)
    ascii("RIFF"); le32(4 + 18 + 14 + 8 + anmf); ascii("WEBP")
    ascii("VP8X"); le32(10)
    out.write(2); out.write(0); out.write(0); out.write(0)
    u24(15); u24(15)
    ascii("ANIM"); le32(6); le32(0); out.write(0); out.write(0)
    ascii("ANMF"); le32(anmf)
    u24(0); u24(0); u24(15); u24(15); u24(40); out.write(0)
    ascii("VP8L"); le32(frame.length)
    out.write(frame, 0, frame.length)
    if ((frame.length & 1) == 1) out.write(0)
    val r = WebpAnimFrames.compute(out.toByteArray, 1)
    assert(!r.isNullAt(0), "VP8L animation rejected")
    assert(r.getInt(3) == 1)
    val px = ImageDecode.compute(still).getBinary(4)
    var rr = 0L
    var p = 0
    while (p < px.length) { rr += px(p) & 0xFF; p += 3 }
    assert(r.getArray(5).toLongArray()(0) == rr)
  }

  test("disposal/blend flags set: sampled frames are the RAW per-frame rasters") {
    // Pins the compositing contract: the ANMF flags byte (bit 0 =
    // dispose-to-background, bit 1 = do-not-blend) is a renderer
    // concern; per-frame statistics cover each frame's OWN raster. A
    // compositing extractor would place frame 2 (a 16x16 sub-rect at
    // x=16) over the retained 32x16 canvas and report 32x16 sums; the
    // raw contract reports frame 2's standalone 16x16 decode.
    val f1 = Vp8Synth.vp8Bytes(32, 16, 9L, 1)
    val f2 = Vp8Synth.vp8Bytes(16, 16, 10L, 1)
    def inner(full: Array[Byte]): Array[Byte] = {
      val len = (full(16) & 0xFF) | ((full(17) & 0xFF) << 8) |
        ((full(18) & 0xFF) << 16) | ((full(19) & 0xFF) << 24)
      java.util.Arrays.copyOfRange(full, 20, 20 + len)
    }
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = s.foreach(c => out.write(c))
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def u24(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF); out.write((v >> 16) & 0xFF)
    }
    def anmf(frame: Array[Byte], x: Int, w: Int, h: Int, flags: Int): Int =
      16 + 8 + frame.length + (frame.length & 1)
    val i1 = inner(f1); val i2 = inner(f2)
    val total = 4 + 18 + 14 + (8 + anmf(i1, 0, 32, 16, 0)) +
      (8 + anmf(i2, 16, 16, 16, 3))
    ascii("RIFF"); le32(total); ascii("WEBP")
    ascii("VP8X"); le32(10)
    out.write(2); out.write(0); out.write(0); out.write(0)
    u24(31); u24(15)
    ascii("ANIM"); le32(6); le32(0); out.write(0); out.write(0)
    def writeFrame(frame: Array[Byte], x: Int, w: Int, h: Int, flags: Int): Unit = {
      ascii("ANMF"); le32(anmf(frame, x, w, h, flags))
      u24(x / 2); u24(0); u24(w - 1); u24(h - 1); u24(40); out.write(flags)
      ascii("VP8 "); le32(frame.length)
      out.write(frame, 0, frame.length)
      if ((frame.length & 1) == 1) out.write(0)
    }
    writeFrame(i1, 0, 32, 16, flags = 0)
    writeFrame(i2, 16, 16, 16, flags = 3) // dispose-to-bg + do-not-blend
    val r = WebpAnimFrames.compute(out.toByteArray, 1)
    assert(!r.isNullAt(0) && r.getInt(3) == 2)
    def rawRSum(full: Array[Byte]): Long = {
      val px = ImageDecode.compute(full).getBinary(4)
      var rr = 0L; var p = 0
      while (p < px.length) { rr += px(p) & 0xFF; p += 3 }
      rr
    }
    val rs = r.getArray(5).toLongArray()
    assert(rs(0) == rawRSum(f1))
    assert(rs(1) == rawRSum(f2), "frame 2 must be its raw 16x16 raster")
  }

  test("reject matrix: torn ANMF, corrupt frame, no frames") {
    val ok = WebpAnimSynth.webpAnimBytes(16, 16, 3, seed = 1L)
    assert(WebpAnimFrames.compute(ok.take(ok.length / 2), 1).isNullAt(0), "torn")
    // a plain still image has no ANMF chunks
    assert(WebpAnimFrames.compute(Vp8Synth.vp8Bytes(16, 16, 1L, 1), 1)
      .isNullAt(0), "still image is not an animation")
    // corrupt the first frame's VP8 start code (fixture layout:
    // RIFF 12 + VP8X 18 + ANIM 14 = 44; ANMF header 8 + 16, chunk
    // header 8, tag 3 -> start code at 79): the decoder must reject
    val c = ok.clone()
    c(79) = 0x00
    assert(WebpAnimFrames.compute(c, 1).isNullAt(0), "corrupt frame")
  }
}
