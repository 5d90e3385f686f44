package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-in-AVI contracts: the RIFF/hdrl/movi walk, frame sampling
  * semantics, rec-list grouping, and the reject matrix. The per-frame
  * JPEG decode itself is pinned by the JPEG codec's own suites; here we
  * pin the container and the sampling arithmetic.
  */
class AviSpec extends AnyFunSuite {

  private def frames(b: Array[Byte], stride: Int) =
    AviMjpegFrames.compute(b, stride)

  private def expectedLuma(sf: Long, w: Int, h: Int): Long = {
    var s = 0L
    val nb = (w / 8) * (h / 8)
    var bi = 0
    while (bi < nb) {
      s += 64L * (64 + java.lang.Math.floorMod(sf * 31 + bi * 17, 128))
      bi += 1
    }
    s
  }

  test("sampling: stride 2 keeps frames 0,2,4; stride 1 keeps all; sums match closed form") {
    val b = AviSynth.aviBytes(16, 16, 5, seed = 9L)
    assert(b != null)
    for ((stride, want) <- Seq(1 -> Seq(0, 1, 2, 3, 4), 2 -> Seq(0, 2, 4), 3 -> Seq(0, 3))) {
      val r = frames(b, stride)
      assert(!r.isNullAt(0), s"stride $stride rejected")
      assert(r.getInt(0) == 16 && r.getInt(1) == 16)
      assert(r.getUTF8String(2).toString == "mjpg")
      assert(r.getInt(3) == 5)
      val idx = r.getArray(4).toIntArray()
      assert(idx.toSeq == want, s"stride $stride")
      val rs = r.getArray(5).toLongArray()
      val gs = r.getArray(6).toLongArray()
      val bs = r.getArray(7).toLongArray()
      for ((f, k) <- want.zipWithIndex) {
        val sf = 9L + 131L * f
        val y = expectedLuma(sf, 16, 16)
        val v = java.lang.Math.floorMod(sf, 4).toInt
        val (_, _, sr, sg, sb) = JpegSynth.ChromaVariants(v)
        assert(rs(k) == y + 256L * sr, s"frame $f r")
        assert(gs(k) == y + 256L * sg, s"frame $f g")
        assert(bs(k) == y + 256L * sb, s"frame $f b")
      }
    }
  }

  test("rec-list grouping: frames nested in LIST 'rec ' decode identically") {
    val plain = AviSynth.aviBytes(16, 16, 3, seed = 4L)
    // rebuild: wrap each 00dc chunk of movi in its own LIST/rec
    val r0 = frames(plain, 1)
    // locate movi list
    def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) |
        ((b(i + 3) & 0xFF) << 24)
    var i = 12
    var moviBody = -1
    var moviEnd = -1
    while (i + 8 <= plain.length && moviBody < 0) {
      val sz = le32(plain, i + 4)
      if (plain(i) == 'L' && plain(i + 8) == 'm' && plain(i + 9) == 'o' &&
          plain(i + 10) == 'v' && plain(i + 11) == 'i') {
        moviBody = i + 12; moviEnd = i + 8 + sz
      }
      i += 8 + sz + (sz & 1)
    }
    assert(moviBody > 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(plain, 0, moviBody)
    var j = moviBody
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (j + 8 <= moviEnd && plain(j) == '0') {
      val sz = le32(plain, j + 4)
      chunks += java.util.Arrays.copyOfRange(plain, j, j + 8 + sz + (sz & 1))
      j += 8 + sz + (sz & 1)
    }
    assert(chunks.length == 3)
    for (c <- chunks) {
      out.write('L'); out.write('I'); out.write('S'); out.write('T')
      val sz = 4 + c.length
      out.write(sz & 0xFF); out.write((sz >> 8) & 0xFF)
      out.write((sz >> 16) & 0xFF); out.write((sz >> 24) & 0xFF)
      out.write('r'); out.write('e'); out.write('c'); out.write(' ')
      out.write(c, 0, c.length)
    }
    out.write(plain, j, plain.length - j) // idx1 tail (offsets stale, skipped)
    val rebuilt = out.toByteArray
    // fix the movi LIST size and RIFF size
    val extra = chunks.length * 12
    val moviSize = le32(plain, moviBody - 8) + extra
    val riffSize = le32(plain, 4) + extra
    def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >> 8) & 0xFF).toByte
      b(i + 2) = ((v >> 16) & 0xFF).toByte; b(i + 3) = ((v >> 24) & 0xFF).toByte
    }
    putLe32(rebuilt, 4, riffSize)
    putLe32(rebuilt, moviBody - 8, moviSize)
    val r1 = frames(rebuilt, 1)
    assert(!r1.isNullAt(0), "rec-grouped container rejected")
    assert(r1.getArray(5).toLongArray().toSeq == r0.getArray(5).toLongArray().toSeq)
  }

  test("reject matrix: non-MJPG compression, torn movi, bad magic, corrupt frame") {
    val ok = AviSynth.aviBytes(16, 16, 3, seed = 2L)
    def mut(f: Array[Byte] => Unit): Array[Byte] = { val c = ok.clone(); f(c); c }
    // strf biCompression 'MJPG' -> 'H264': find it (strf body + 16)
    val strfAt = {
      var i = 12
      var at = -1
      while (i + 8 <= ok.length && at < 0) {
        if (ok(i) == 's' && ok(i + 1) == 't' && ok(i + 2) == 'r' && ok(i + 3) == 'f') at = i + 8 + 16
        i += 1
      }
      at
    }
    assert(strfAt > 0)
    assert(frames(mut(b => { b(strfAt) = 'H'; b(strfAt + 1) = '2';
      b(strfAt + 2) = '6'; b(strfAt + 3) = '4' }), 1).isNullAt(0), "H264 gate")
    assert(frames(ok.take(ok.length / 3), 1).isNullAt(0), "torn container")
    assert(frames(mut(b => b(9) = 'X'), 1).isNullAt(0), "bad AVI magic")
    // corrupt the SECOND frame's JPEG SOI: frame decode failure nulls the
    // row. Walk the chunk structure (a byte-scan for '00dc' can false-hit
    // inside JPEG entropy bytes).
    def le32i(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) |
        ((b(i + 3) & 0xFF) << 24)
    val secondSoi = {
      var i = 12
      var moviBody = -1
      var moviEnd = -1
      while (i + 8 <= ok.length && moviBody < 0) {
        val sz = le32i(ok, i + 4)
        if (ok(i) == 'L' && ok(i + 8) == 'm' && ok(i + 9) == 'o' &&
            ok(i + 10) == 'v' && ok(i + 11) == 'i') {
          moviBody = i + 12; moviEnd = i + 8 + sz
        }
        i += 8 + sz + (sz & 1)
      }
      var j = moviBody
      var count = 0
      var at = -1
      while (j + 8 <= moviEnd && at < 0) {
        val sz = le32i(ok, j + 4)
        count += 1
        if (count == 2) at = j + 8
        j += 8 + sz + (sz & 1)
      }
      at
    }
    assert(secondSoi > 0)
    def zap(b: Array[Byte]): Unit = {
      var k = secondSoi
      while (k < secondSoi + 64) { b(k) = 0; k += 1 }
    }
    assert(frames(mut(zap), 1).isNullAt(0), "bad frame")
    // ...but with stride 2 the corrupt frame 1 is never decoded
    assert(!frames(mut(zap), 2).isNullAt(0),
      "stride must skip undecoded frames entirely")
  }
}
