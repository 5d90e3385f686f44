package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** Ogg page-walk contracts: CRC verification, lacing across segments,
  * and the reject matrix.
  */
class OggSpec extends AnyFunSuite {

  private def fmt(r: org.apache.spark.sql.catalyst.InternalRow): String =
    r.getUTF8String(0).toString

  test("Vorbis and Opus identification headers parse with verified CRCs") {
    val v = OggMeta.compute(OggSynth.oggBytes(2, 44100, 48000, 0))
    assert(fmt(v) == "vorbis")
    assert(v.getLong(1) == 2 && v.getLong(2) == 44100 && v.getLong(4) == 48000)
    val o = OggMeta.compute(OggSynth.oggBytes(6, 48000, 123456, 1))
    assert(fmt(o) == "opus")
    assert(o.getLong(1) == 6 && o.getLong(2) == 48000 && o.getLong(4) == 123456)
  }

  test("segment lacing: a packet spanning multiple 255-byte segments") {
    // vorbis id header padded to 300 bytes -> two lacing segments
    val id = new Array[Byte](300)
    id(0) = 1
    "vorbis".getBytes("US-ASCII").copyToArray(id, 1)
    id(11) = 3
    id(12) = 0x44.toByte; id(13) = 0xAC.toByte // 44100 LE
    val head = OggSynth.page(0x02, 0L, 7, 0, id)
    val tail = OggSynth.page(0x04, 777L, 7, 1, new Array[Byte](0))
    val b = head ++ tail
    val r = OggMeta.compute(b)
    assert(fmt(r) == "vorbis")
    assert(r.getLong(1) == 3 && r.getLong(2) == 44100 && r.getLong(4) == 777)
  }

  test("reject matrix: corrupt CRC, bad version, torn page, unknown codec") {
    val ok = OggSynth.oggBytes(2, 44100, 48000, 0)
    def mut(i: Int, v: Int): Array[Byte] = {
      val c = ok.clone(); c(i) = v.toByte; c
    }
    // flip a body byte without fixing the CRC -> page checksum fails
    assert(fmt(OggMeta.compute(mut(40, 0x55))) == "unknown", "CRC gate")
    assert(fmt(OggMeta.compute(mut(4, 1))) == "unknown", "version gate")
    assert(fmt(OggMeta.compute(ok.take(ok.length - 3))) == "unknown", "torn tail")
    assert(fmt(OggMeta.compute(ok.take(20))) == "unknown", "torn header")
    // BOS packet that is neither vorbis nor OpusHead
    val alien = OggSynth.page(0x02, 0L, 9, 0,
      "NotARealCodecHeaderAtAll......".getBytes("US-ASCII"))
    assert(fmt(OggMeta.compute(alien)) == "unknown", "unknown codec")
  }
}
