package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** tar/WebDataset contracts: checksummed header walk, the extension
  * matrix (GNU longname, PAX path, base-256 sizes), payload range
  * fidelity, and the reject matrix.
  */
class TarSpec extends AnyFunSuite {

  test("fixture roundtrip: names, sizes, offsets, payload bytes across 20 seeds") {
    for (doc <- 0L to 19L) {
      val b = TarSynth.tarBytes(doc)
      assert(b != null && b.length % 512 == 0, s"doc $doc")
      val r = TarMembers.compute(b)
      assert(r != null, s"doc $doc rejected")
      val n = TarSynth.nSamples(doc)
      val members = r.getArray(1)
      assert(r.getInt(0) == 2 * n, s"doc $doc member count")
      for (i <- 0 until n; (ext, tag) <- Seq(("jpg", 2 * i), ("json", 2 * i + 1))) {
        val m = members.getStruct(tag, 4)
        assert(m.getUTF8String(0).toString == TarSynth.memberName(doc, i, ext),
          s"doc $doc member $tag name")
        val size = if (ext == "jpg") TarSynth.jpgSize(doc, i)
          else TarSynth.jsonSize(doc, i)
        assert(m.getLong(3) == size, s"doc $doc member $tag size")
        // the byte range must address the formula payload exactly
        val off = m.getLong(2)
        assert(off + size <= b.length)
        var k = 0L
        while (k < size) {
          assert(b((off + k).toInt) ==
            ((doc * 31 + tag * 17 + k) % 256).toByte,
            s"doc $doc member $tag byte $k")
          k += 1
        }
      }
    }
  }

  test("extension matrix: longname docs, PAX docs, base-256 sizes resolve identically") {
    // doc 1: GNU longname (1%4==1); doc 2: PAX (2%4==2); doc 5/10:
    // base-256 first-member size (doc%5==0)
    val long = TarMembers.compute(TarSynth.tarBytes(1L))
    assert(long.getArray(1).getStruct(0, 4).getUTF8String(0).toString
      .startsWith("shard/xxx"), "longname must come from the L member")
    val pax = TarMembers.compute(TarSynth.tarBytes(2L))
    assert(pax.getArray(1).getStruct(0, 4).getUTF8String(0).toString ==
      "pax/dir/s2_0.jpg", "PAX path must override the header name")
    val b256 = TarMembers.compute(TarSynth.tarBytes(5L))
    assert(b256.getArray(1).getStruct(0, 4).getLong(3) ==
      TarSynth.jpgSize(5L, 0), "base-256 size must parse")
  }

  test("reject matrix: flipped checksum, missing terminator, torn payload") {
    val ok = TarSynth.tarBytes(3L)
    assert(TarMembers.compute(ok) != null)
    // flip a header byte (mode field): checksum must catch it
    val c = ok.clone()
    c(101) = (c(101) ^ 1).toByte
    assert(TarMembers.compute(c) == null, "checksum gate")
    // drop the two-zero terminator
    assert(TarMembers.compute(ok.take(ok.length - 1024)) == null,
      "missing terminator")
    // non-block-aligned input
    assert(TarMembers.compute(ok.take(ok.length - 100)) == null)
    // truncation sweep at block granularity: classify, never throw
    var k = 0
    while (k < ok.length) {
      TarMembers.compute(java.util.Arrays.copyOfRange(ok, 0, k))
      k += 512
    }
    // bit-flip sweep
    var p = 0
    while (p < ok.length) {
      val c2 = ok.clone()
      c2(p) = (c2(p) ^ 0x10).toByte
      TarMembers.compute(c2)
      p += 131
    }
  }

  test("WDS fixture: jpg member ranges slice back the exact JpegSynth bytes") {
    for (doc <- 0L to 5L) {
      val b = TarWdsSynth.tarWdsBytes(doc)
      val r = TarMembers.compute(b)
      assert(r != null, s"doc $doc")
      val n = TarWdsSynth.nSamples(doc)
      assert(r.getInt(0) == 2 * n)
      for (i <- 0 until n) {
        val m = r.getArray(1).getStruct(2 * i, 4)
        assert(m.getUTF8String(0).toString == s"s${doc}_$i.jpg")
        val sliced = java.util.Arrays.copyOfRange(b, m.getLong(2).toInt,
          (m.getLong(2) + m.getLong(3)).toInt)
        val direct = JpegSynth.jpegBytes(TarWdsSynth.width(doc), 16,
          doc + 131L * i, 1)
        assert(java.util.Arrays.equals(sliced, direct),
          s"doc $doc sample $i: tar range must address the exact JPEG")
      }
    }
  }

  test("interop: java.util.zip is absent for tar, so cross-check a hand ustar") {
    // a minimal single-member ustar built independently of TarSynth's
    // writer: proves the parser is not coupled to its own fixture
    val name = "hello.txt"
    val data = "hi there".getBytes("UTF-8")
    val h = new Array[Byte](512)
    System.arraycopy(name.getBytes("UTF-8"), 0, h, 0, name.length)
    def octal(off: Int, len: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      for (i <- padded.indices) h(off + i) = padded.charAt(i).toByte
    }
    octal(100, 8, 420); octal(108, 8, 0); octal(116, 8, 0)
    octal(124, 12, data.length.toLong); octal(136, 12, 1234567L)
    h(156) = '0'
    "ustar".zipWithIndex.foreach { case (ch, i) => h(257 + i) = ch.toByte }
    h(263) = '0'; h(264) = '0'
    for (i <- 148 until 156) h(i) = ' '
    val sum = h.foldLeft(0L)((a, v) => a + (v & 0xFF))
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    for (i <- 0 until 6) h(148 + i) = padded.charAt(i).toByte
    h(154) = 0; h(155) = ' '
    val out = new java.io.ByteArrayOutputStream()
    out.write(h, 0, 512)
    out.write(data, 0, data.length)
    out.write(new Array[Byte](512 - data.length), 0, 512 - data.length)
    out.write(new Array[Byte](1024), 0, 1024)
    val r = TarMembers.compute(out.toByteArray)
    assert(r != null && r.getInt(0) == 1)
    val m = r.getArray(1).getStruct(0, 4)
    assert(m.getUTF8String(0).toString == "hello.txt")
    assert(m.getLong(3) == data.length)
    assert(m.getLong(2) == 512L)
  }
}
