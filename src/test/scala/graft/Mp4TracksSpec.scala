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

  test("Mp4Samples: chunk resolution matches the layout formulas (stco AND co64)") {
    for (seed <- 0L to 9L) { // even = stco, odd = co64
      val b = Mp4SamplesSynth.mp4SamplesBytes(seed)
      assert(b != null, s"seed $seed")
      val r = Mp4Samples.compute(b)
      assert(r != null, s"seed $seed rejected")
      val tracks = r.getArray(1)
      val nv = Mp4TracksSynth.nVideo(seed)
      val video = tracks.getStruct(0, 4)
      assert(video.getUTF8String(1).toString == "avc1")
      val offs = video.getArray(2).toLongArray()
      val sizes = video.getArray(3).toLongArray()
      assert(offs.length == nv)
      for (j <- 0 until nv) {
        assert(offs(j) == Mp4SamplesSynth.videoOffset(seed, j),
          s"seed $seed video sample $j offset")
        assert(sizes(j) == Mp4TracksSynth.videoSize(seed, j))
      }
      if (Mp4TracksSynth.hasAudio(seed)) {
        val audio = tracks.getStruct(1, 4)
        val aOffs = audio.getArray(2).toLongArray()
        val asz = Mp4TracksSynth.audioSize(seed)
        val base = Mp4SamplesSynth.audioBase(seed)
        assert(aOffs.length == Mp4TracksSynth.nAudio(seed))
        for (j <- aOffs.indices)
          assert(aOffs(j) == base + j * asz, s"seed $seed audio sample $j")
      } else assert(tracks.numElements() == 1)
      // every range must lie inside the file
      for (t <- 0 until tracks.numElements()) {
        val tr = tracks.getStruct(t, 4)
        val o = tr.getArray(2).toLongArray()
        val z = tr.getArray(3).toLongArray()
        for (j <- o.indices) assert(o(j) + z(j) <= b.length)
      }
    }
  }

  test("Mp4Samples reject matrix: bad stsc walk, out-of-file range, no offsets box") {
    val ok = Mp4SamplesSynth.mp4SamplesBytes(2L) // video-only, stco
    assert(Mp4Samples.compute(ok) != null)
    // find stco and corrupt the first chunk offset far past the file
    def find(tag: String): Int = {
      var i = 0
      while (!(ok(i) == tag(0) && ok(i + 1) == tag(1) && ok(i + 2) == tag(2) &&
        ok(i + 3) == tag(3))) i += 1
      i
    }
    val stco = find("stco")
    val c1 = ok.clone()
    c1(stco + 12) = 0x7F.toByte // first offset u32 -> huge
    assert(Mp4Samples.compute(c1) == null, "out-of-file range rejects")
    // stsc first run not starting at chunk 1
    val stsc = find("stsc")
    val c2 = ok.clone()
    c2(stsc + 15) = 2 // first_chunk = 2
    assert(Mp4Samples.compute(c2) == null, "stsc must start at chunk 1")
    // rename stco away: no offsets box at all
    val c3 = ok.clone()
    c3(stco) = 'x'.toByte
    assert(Mp4Samples.compute(c3) == null, "missing stco/co64 rejects")
    // spc = 0 is meaningless
    val c4 = ok.clone()
    c4(stsc + 19) = 0 // samples_per_chunk = 0
    assert(Mp4Samples.compute(c4) == null, "zero samples_per_chunk rejects")
  }

  test("MJPEG parity: MP4 and AVI twins produce byte-identical frame stats") {
    for (seed <- 0L to 5L) {
      val w = 16L * (1 + seed % 2)
      val h = 16L
      val frames = 3L + seed % 4
      val avi = AviMjpegFrames.compute(
        AviSynth.aviBytes(w, h, frames, seed), 2)
      val mp4 = Mp4MjpegFrames.compute(
        Mp4SamplesSynth.mp4MjpegBytes(w, h, frames, seed), 2)
      assert(!avi.isNullAt(0) && !mp4.isNullAt(0), s"seed $seed")
      assert(mp4.getInt(0) == avi.getInt(0), "width")
      assert(mp4.getInt(1) == avi.getInt(1), "height")
      assert(mp4.getUTF8String(2) == avi.getUTF8String(2), "codec")
      assert(mp4.getInt(3) == avi.getInt(3), "n_frames")
      assert(mp4.getArray(4).toIntArray().toSeq ==
        avi.getArray(4).toIntArray().toSeq, "frame_idx")
      assert(mp4.getArray(5).toLongArray().toSeq ==
        avi.getArray(5).toLongArray().toSeq, s"seed $seed r_sums")
      assert(mp4.getArray(6).toLongArray().toSeq ==
        avi.getArray(6).toLongArray().toSeq, s"seed $seed g_sums")
      assert(mp4.getArray(7).toLongArray().toSeq ==
        avi.getArray(7).toLongArray().toSeq, s"seed $seed b_sums")
    }
    // non-MJPEG codec rejects to the null row
    val plain = Mp4SamplesSynth.mp4SamplesBytes(2L) // avc1
    assert(Mp4MjpegFrames.compute(plain, 2).isNullAt(0))
  }

  test("truncation/bit-flip sweeps: samples and mjpeg walks never throw") {
    val ok = Mp4SamplesSynth.mp4SamplesBytes(3L)
    var k = 0
    while (k < ok.length) {
      Mp4Samples.compute(ok.take(k)) // null or row, never a throw
      k += 13
    }
    var p = 0
    while (p < ok.length) {
      val c = ok.clone()
      c(p) = (c(p) ^ 0x20).toByte
      Mp4Samples.compute(c)
      p += 101
    }
    val mj = Mp4SamplesSynth.mp4MjpegBytes(16, 16, 3, 4L)
    k = 0
    while (k < mj.length) {
      Mp4MjpegFrames.compute(mj.take(k), 2)
      k += 53
    }
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

  test("Mp4FragSamples: moof/traf/trun resolution carries the SAME samples as the chunked twin") {
    for (seed <- 0L to 9L) {
      val b = Mp4FragSynth.mp4FragBytes(seed)
      assert(b != null, s"seed $seed")
      val r = Mp4FragSamples.compute(b)
      assert(r != null, s"seed $seed rejected")
      assert(r.getUTF8String(0).toString == "iso5")
      val tracks = r.getArray(1)
      // sample-for-sample identity with the chunked twin: same counts,
      // same sizes (the layouts differ, the logical samples must not)
      val twin = Mp4Samples.compute(Mp4SamplesSynth.mp4SamplesBytes(seed))
      val twinTracks = twin.getArray(1)
      assert(tracks.numElements() == twinTracks.numElements(), s"seed $seed")
      for (t <- 0 until tracks.numElements()) {
        val ft = tracks.getStruct(t, 4)
        val ct = twinTracks.getStruct(t, 4)
        assert(ft.getUTF8String(0).toString == ct.getUTF8String(0).toString)
        assert(ft.getUTF8String(1).toString == ct.getUTF8String(1).toString)
        val fSizes = ft.getArray(3).toLongArray()
        val cSizes = ct.getArray(3).toLongArray()
        assert(fSizes.toSeq == cSizes.toSeq, s"seed $seed track $t sizes")
        // byte identity: the resolved ranges must address the intended
        // payload bytes, not merely in-file bytes
        val offs = ft.getArray(2).toLongArray()
        for (j <- offs.indices) {
          assert(offs(j) >= 0 && offs(j) + fSizes(j) <= b.length)
          var k = 0
          while (k < fSizes(j)) {
            assert(b((offs(j) + k).toInt) ==
              Mp4FragSynth.payloadByte(seed, t, j, k),
              s"seed $seed track $t sample $j byte $k")
            k += 1
          }
        }
      }
    }
  }

  test("Mp4FragSamples: second traf without base flags inherits the previous traf's data end") {
    val b = Mp4FragSynth.multiTrafBytes()
    val r = Mp4FragSamples.compute(b)
    assert(r != null, "multi-traf moof must resolve")
    val tracks = r.getArray(1)
    assert(tracks.numElements() == 2)
    val v = tracks.getStruct(0, 4)
    val vOff = v.getArray(2).toLongArray()
    val vSz = v.getArray(3).toLongArray()
    assert(vSz.toSeq == Seq(10L, 20L))
    // find the moof: video data starts at moof + moofSize(120) + 8
    var moofAt = -1
    var i = 0
    while (moofAt < 0 && i + 8 <= b.length) {
      if (b(i + 4) == 'm' && b(i + 5) == 'o' && b(i + 6) == 'o' &&
        b(i + 7) == 'f') moofAt = i
      i += 1
    }
    assert(vOff(0) == moofAt + 128L && vOff(1) == moofAt + 138L)
    val a = tracks.getStruct(1, 4)
    val aOff = a.getArray(2).toLongArray()
    val aSz = a.getArray(3).toLongArray()
    assert(aSz.toSeq == Seq(5L, 5L, 5L))
    // implicit base = end of traf1's data (video 30 bytes), trun has
    // no data offset → samples contiguous from there
    assert(aOff.toSeq == Seq(moofAt + 158L, moofAt + 163L, moofAt + 168L))
  }

  test("Mp4FragSamples reject matrix: moof before moov, unknown track, sizeless samples") {
    val ok = Mp4FragSynth.mp4FragBytes(2L)
    assert(Mp4FragSamples.compute(ok) != null)
    // moof before moov: swap isn't constructible cheaply, so strip the
    // moov box instead — fragments with no track identities must reject
    var i = 0
    while (!(ok(i + 4) == 'm' && ok(i + 5) == 'o' && ok(i + 6) == 'o' &&
      ok(i + 7) == 'v')) i += 1
    val moovLen = ((ok(i) & 0xFF) << 24) | ((ok(i + 1) & 0xFF) << 16) |
      ((ok(i + 2) & 0xFF) << 8) | (ok(i + 3) & 0xFF)
    val noMoov = ok.slice(0, i) ++ ok.slice(i + moovLen, ok.length)
    assert(Mp4FragSamples.compute(noMoov) == null, "moof before moov")
    // tfhd naming a track moov never declared: flip the track_ID of the
    // first tfhd to 9
    var tf = 0
    while (!(ok(tf + 4) == 't' && ok(tf + 5) == 'f' && ok(tf + 6) == 'h' &&
      ok(tf + 7) == 'd')) tf += 1
    val badTrack = ok.clone()
    badTrack(tf + 15) = 9 // track_ID low byte (u32 at payload+4)
    assert(Mp4FragSamples.compute(badTrack) == null, "unknown track")
  }

  test("Mp4FragSamples truncation/bit-flip sweep: never throws") {
    val ok = Mp4FragSynth.mp4FragBytes(3L)
    var k = 0
    while (k < ok.length) {
      Mp4FragSamples.compute(ok.take(k)) // null or a row, never a throw
      k += 11
    }
    var p = 0
    while (p < ok.length) {
      val c = ok.clone()
      c(p) = (c(p) ^ 0x10).toByte
      val r = Mp4FragSamples.compute(c)
      if (r != null) {
        // a surviving decode must still produce only in-file ranges
        val tracks = r.getArray(1)
        for (t <- 0 until tracks.numElements()) {
          val tr = tracks.getStruct(t, 4)
          val o = tr.getArray(2).toLongArray()
          val z = tr.getArray(3).toLongArray()
          for (j <- o.indices) assert(o(j) >= 0 && o(j) + z(j) <= c.length)
        }
      }
      p += 61
    }
  }
}
