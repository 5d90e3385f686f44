package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** MP4 sample-table contracts: the trak walk, both stsz modes, the
  * stts/stsz consistency gate, v1 mdhd, and the reject matrix.
  */
class Mp4TracksSpec extends AnyFunSuite {

  test("fixture roundtrip across 10 seeds (both stsz modes)") {
    for (seed <- 0L to 9L) {
      val r = Mp4Tracks.compute(Mp4TracksSynth.mp4Bytes(seed))
      assert(r != null, s"seed $seed")
      assert(r.getUTF8String(0).toString == "isom")
      val a = r.getArray(1)
      val expTracks = if (Mp4TracksSynth.hasAudio(seed)) 2 else 1
      assert(a.numElements() == expTracks, s"seed $seed tracks")
      val v = a.getStruct(0, 6)
      assert(v.getUTF8String(0).toString == "vide")
      assert(v.getUTF8String(1).toString == "avc1")
      assert(v.getLong(2) == 30000L)
      val nv = Mp4TracksSynth.nVideo(seed)
      assert(v.getLong(3) == nv * 1001L)
      assert(v.getLong(4) == nv)
      assert(v.getLong(5) ==
        (0 until nv).map(i => Mp4TracksSynth.videoSize(seed, i)).sum)
      if (expTracks == 2) {
        val au = a.getStruct(1, 6)
        assert(au.getUTF8String(1).toString == "mp4a")
        assert(au.getLong(5) ==
          Mp4TracksSynth.nAudio(seed) * Mp4TracksSynth.audioSize(seed))
      }
    }
  }

  test("stts/stsz sample-count disagreement rejects") {
    val ok = Mp4TracksSynth.mp4Bytes(2L) // video-only
    // find the stts box and bump its (single) sample count by 1:
    // stts payload = version(4) entry_count(4) count(4) delta(4)
    val c = ok.clone()
    var i = 0
    var found = -1
    while (found < 0 && i + 8 <= c.length) {
      if (c(i + 4) == 's' && c(i + 5) == 't' && c(i + 6) == 't' && c(i + 7) == 's')
        found = i
      i += 1
    }
    assert(found > 0, "stts not found")
    val countAt = found + 8 + 8 // box header + version/flags + entry_count
    c(countAt + 3) = (c(countAt + 3) + 1).toByte
    assert(Mp4Tracks.compute(c) == null, "count mismatch must reject")
  }

  test("reject matrix: torn boxes, no ftyp, malformed track") {
    val ok = Mp4TracksSynth.mp4Bytes(1L)
    assert(Mp4Tracks.compute(ok.take(ok.length - 6)) == null, "torn moov")
    assert(Mp4Tracks.compute(Array[Byte](0, 0, 0, 8, 'f', 'r', 'e', 'e')) == null)
    assert(Mp4Tracks.compute(Array[Byte](1, 2, 3)) == null)
  }

  test("many sibling boxes: walk is byte-bounded, not sibling-capped") {
    // a structurally valid file with 300 top-level `free` boxes before
    // moov, and 300 `free` siblings before the trak inside moov — a
    // fixed sibling cap would reject it even though the targets exist
    val ok = Mp4TracksSynth.mp4Bytes(2L) // video-only
    val free = Array[Byte](0, 0, 0, 8, 'f', 'r', 'e', 'e')
    // locate moov (top level, right after ftyp in the fixture)
    var i = 4
    while (!(ok(i) == 'm' && ok(i + 1) == 'o' && ok(i + 2) == 'o' &&
      ok(i + 3) == 'v')) i += 1
    val moovStart = i - 4
    val ftyp = ok.slice(0, moovStart)
    val moovBody = ok.slice(moovStart + 8, ok.length)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    (1 to 300).foreach(_ => out.write(free, 0, free.length))
    val newLen = 8 + 300 * 8 + moovBody.length
    out.write((newLen >> 24) & 0xFF); out.write((newLen >> 16) & 0xFF)
    out.write((newLen >> 8) & 0xFF); out.write(newLen & 0xFF)
    out.write('m'); out.write('o'); out.write('o'); out.write('v')
    (1 to 300).foreach(_ => out.write(free, 0, free.length))
    out.write(moovBody, 0, moovBody.length)
    val r = Mp4Tracks.compute(out.toByteArray)
    assert(r != null, "free-box-heavy file must still resolve")
    assert(r.getArray(1).numElements() == 1)
    assert(r.getArray(1).getStruct(0, 6).getUTF8String(1).toString == "avc1")
  }
}
