package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** MP3 frame-walk contracts: the length arithmetic must land exactly on
  * every sync, across bitrate indexes, padding bits, sample rates, and
  * the four container shapes; off-by-one walks reject.
  */
class Mp3Spec extends AnyFunSuite {

  private def fmt(r: org.apache.spark.sql.catalyst.InternalRow): String =
    r.getUTF8String(0).toString

  test("all container shapes: bare, ID3v2 head, ID3v1 trailer, both") {
    for (mode <- 0 to 3; srIdx <- 0 to 2; ch <- 1 to 2) {
      val b = Mp3Synth.mp3Bytes(ch, srIdx, 17, seed = mode * 31 + srIdx,
        withId3 = (mode & 1) != 0, withV1Tag = (mode & 2) != 0)
      val r = Mp3Meta.compute(b)
      assert(fmt(r) == "mp3", s"mode=$mode srIdx=$srIdx ch=$ch")
      assert(r.getLong(1) == ch)
      assert(r.getLong(2) == Array(44100, 48000, 32000)(srIdx))
      assert(r.isNullAt(3))
      assert(r.getLong(4) == 17L * 1152)
    }
  }

  test("hand-built golden: one MPEG-2 Layer III mono frame (576 samples)") {
    // header FF F3 20 C0: MPEG2 (version bits 10), Layer III, brIdx 2
    // (16 kbit), srIdx 0 (22050), no padding, mono
    // frameLen = 72 * 16000 / 22050 = 52 bytes
    val b = new Array[Byte](52)
    b(0) = 0xFF.toByte; b(1) = 0xF3.toByte
    b(2) = 0x20.toByte; b(3) = 0xC0.toByte
    val r = Mp3Meta.compute(b)
    assert(fmt(r) == "mp3")
    assert(r.getLong(1) == 1 && r.getLong(2) == 22050 && r.getLong(4) == 576)
  }

  test("reject matrix: free format, bad sync, truncated frame, reserved version") {
    val ok = Mp3Synth.mp3Bytes(2, 0, 5, seed = 1, withId3 = false,
      withV1Tag = false)
    assert(fmt(Mp3Meta.compute(ok)) == "mp3")
    def mut(i: Int, v: Int): Array[Byte] = { val c = ok.clone(); c(i) = v.toByte; c }
    assert(fmt(Mp3Meta.compute(mut(0, 0xFE))) == "unknown", "bad sync")
    assert(fmt(Mp3Meta.compute(mut(2, ok(2) & 0x0F))) == "unknown", "free format")
    assert(fmt(Mp3Meta.compute(mut(1, 0xEB))) == "unknown", "reserved version")
    assert(fmt(Mp3Meta.compute(ok.take(ok.length - 3))) == "unknown", "torn frame")
    // a one-byte length error anywhere desyncs the walk
    assert(fmt(Mp3Meta.compute(ok ++ Array[Byte](0))) == "unknown", "trailing junk")
  }

  test("mid-stream parameter change rejects") {
    val a = Mp3Synth.mp3Bytes(2, 0, 3, seed = 1, withId3 = false, withV1Tag = false)
    val b = Mp3Synth.mp3Bytes(1, 0, 3, seed = 1, withId3 = false, withV1Tag = false)
    assert(fmt(Mp3Meta.compute(a ++ b)) == "unknown")
  }
}
