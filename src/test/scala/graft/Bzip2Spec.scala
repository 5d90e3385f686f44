package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** bzip2 codec contracts. The encoder and decoder compute the BWT /
  * MTF / Huffman stages by INDEPENDENT algorithms (rotation sort vs
  * counting-sort link walk; explicit code assignment vs limit/base
  * decode), so round-trip equality is a real check, anchored
  * externally by the public CRC-32/BZIP2 check value.
  */
class Bzip2Spec extends AnyFunSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  test("CRC-32/BZIP2 anchor: the public check value") {
    // the standard catalogue check: CRC of the ASCII digits 1-9
    assert(Bzip2Codec.crcOf("123456789".getBytes(Utf8)) == 0xFC891918)
    assert(Bzip2Codec.crcOf(Array.emptyByteArray) == 0,
      "init 0xFFFFFFFF xor-out 0xFFFFFFFF")
  }

  test("round-trip: fixture texts across 30 seeds") {
    for (doc <- 0L to 29L) {
      val bz = Bzip2Synth.bz2Bytes(doc)
      val out = Bzip2Codec.decompress(bz)
      assert(out != null, s"doc $doc rejected")
      assert(new String(out, Utf8) == Bzip2Synth.expectedText(doc),
        s"doc $doc mismatch")
    }
  }

  test("round-trip: adversarial payloads (runs, binary, empty, single byte)") {
    val rnd = new scala.util.Random(7331)
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      Array[Byte](0),
      Array[Byte](65),
      "aaaa".getBytes(Utf8), // exactly one RLE1 4-run, count 0
      "aaaaaaaaa".getBytes(Utf8),
      Array.fill[Byte](300)(7), // long run: RLE1 count saturation
      "abababab".getBytes(Utf8),
      (0 until 256).map(_.toByte).toArray, // full symbol map
      Array.fill[Byte](5000)((rnd.nextInt(4) + 'a').toByte),
      Array.fill[Byte](20000)(rnd.nextInt(256).toByte))
    for ((data, ci) <- cases.zipWithIndex) {
      val out = Bzip2Codec.decompress(Bzip2Codec.compress(data))
      assert(out != null, s"case $ci rejected")
      assert(java.util.Arrays.equals(out, data), s"case $ci mismatch")
    }
  }

  test("concatenated streams decode through (the append shape)") {
    val a = Bzip2Codec.compress("first stream\n".getBytes(Utf8))
    val b = Bzip2Codec.compress("second stream\n".getBytes(Utf8))
    val cat = a ++ b
    val out = Bzip2Codec.decompress(cat)
    assert(out != null)
    assert(new String(out, Utf8) == "first stream\nsecond stream\n")
  }

  test("reject matrix: magic, randomized bit, CRC flip, truncation, bit flips") {
    val ok = Bzip2Codec.compress("reject matrix payload 123\n".getBytes(Utf8))
    assert(Bzip2Codec.decompress(ok) != null)
    // wrong magic
    val bad = ok.clone(); bad(0) = 'G'.toByte
    assert(Bzip2Codec.decompress(bad) == null)
    // flip a bit in the block CRC field (bytes 10..13 hold block CRC
    // after BZh9 + 6-byte magic)
    val crcFlip = ok.clone()
    crcFlip(11) = (crcFlip(11) ^ 0x10).toByte
    assert(Bzip2Codec.decompress(crcFlip) == null, "CRC gate")
    // truncation sweep: classify, never throw
    var k = 0
    while (k < ok.length) {
      Bzip2Codec.decompress(java.util.Arrays.copyOf(ok, k))
      k += 1
    }
    // bit-flip sweep: either null or a DIFFERENT-but-CRC-valid output
    // is impossible — any accepted output must equal the original only
    // when nothing material flipped; we assert no exception escapes
    var p = 0
    while (p < ok.length) {
      val c = ok.clone()
      c(p) = (c(p) ^ 0x20).toByte
      Bzip2Codec.decompress(c)
      p += 3
    }
  }

  test("composition: a bz2-compressed wiki dump parses and strips") {
    val bz = Bzip2Codec.compress(WikiSynth.dumpXml(7L).getBytes(Utf8))
    val xml = new String(Bzip2Codec.decompress(bz), Utf8)
    val r = MediawikiPages.compute(xml)
    assert(r.getUTF8String(0).toString == "mediawiki")
    assert(r.getInt(1) == WikiSynth.nPages(7L))
    val t = WikitextStrip.compute(
      r.getArray(2).getStruct(0, 6).getUTF8String(5).toString)
    assert(t == WikiSynth.strippedText(7L, 0))
  }
}
