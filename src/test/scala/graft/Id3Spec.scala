package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** ID3v2 text-frame extraction contracts: both tag versions and their
  * different size conventions, all three supported encodings, the
  * padding stop, and the honest-reject matrix.
  */
class Id3Spec extends AnyFunSuite {

  test("fixture roundtrip: v2.3 (even) and v2.4 (odd) across 16 seeds") {
    for (seed <- 0L to 15L) {
      val b = Id3Synth.mp3WithId3(seed)
      assert(b != null)
      val r = Id3Meta.compute(b)
      assert(r != null, s"seed $seed rejected")
      assert(r.getInt(0) == (if (Id3Synth.v24(seed)) 4 else 3), s"seed $seed ver")
      assert(r.getUTF8String(1).toString == Id3Synth.title(seed), s"seed $seed title")
      assert(r.getUTF8String(2).toString == Id3Synth.artist(seed),
        s"seed $seed artist (UTF-16 path on even seeds)")
      assert(r.getUTF8String(3).toString == Id3Synth.album(seed), s"seed $seed album")
      assert(r.getUTF8String(4).toString == Id3Synth.year(seed).toString,
        s"seed $seed year")
      // the tag must not break the frame walk behind it
      val meta = Mp3Meta.compute(b)
      assert(meta.getUTF8String(0).toString == "mp3", s"seed $seed frame walk")
    }
  }

  test("size conventions genuinely differ: a >127-byte v2.4 frame breaks a v2.3 read") {
    // hand-build a v2.4 tag with one 200-byte TIT2 payload: syncsafe
    // size bytes (0,0,1,72); reinterpreted as v2.3 u32 that is 328,
    // which overruns the tag and must reject
    val payload = new Array[Byte](200)
    payload(0) = 3 // UTF-8
    java.util.Arrays.fill(payload, 1, 200, 'a'.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(4); out.write(0); out.write(0)
    val size = 10 + 200
    out.write((size >> 21) & 0x7F); out.write((size >> 14) & 0x7F)
    out.write((size >> 7) & 0x7F); out.write(size & 0x7F)
    out.write('T'); out.write('I'); out.write('T'); out.write('2')
    out.write(0); out.write(0); out.write(1); out.write(72) // syncsafe 200
    out.write(0); out.write(0)
    out.write(payload, 0, 200)
    val v24 = out.toByteArray
    val ok = Id3Meta.compute(v24)
    assert(ok != null && ok.getUTF8String(1).toString == "a" * 199)
    val asV23 = v24.clone()
    asV23(3) = 3
    assert(Id3Meta.compute(asV23) == null,
      "u32-read of a syncsafe size must walk off-frame and reject")
  }

  test("reject matrix: no tag, torn tag, unsync flag, encoding 2 field") {
    assert(Id3Meta.compute(Mp3PcmSynth.mp3Bytes(1L)) == null, "no ID3 tag")
    val ok = Id3Synth.mp3WithId3(2L)
    assert(Id3Meta.compute(ok.take(20)) == null, "torn tag")
    val c = ok.clone()
    c(5) = 0x80.toByte // unsynchronisation
    assert(Id3Meta.compute(c) == null, "unsync rejects")
    // encoding 2 (UTF-16BE no BOM): the FIELD nulls, the struct survives
    // (patch the title frame's encoding byte: v2.3 layout, first frame
    // starts at 10, payload at 20)
    val c2 = ok.clone()
    assert(c2(20) == 0, "expected the ISO-8859-1 encoding byte")
    c2(20) = 2
    val r = Id3Meta.compute(c2)
    assert(r != null && r.isNullAt(1) && !r.isNullAt(3),
      "unsupported encoding nulls only its field")
  }
}
