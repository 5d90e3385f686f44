package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** The data-literal override hook: injected tables must actually
  * change decode output (the whole point — when the published ISO/Xiph
  * literals arrive, dropping them in must take effect with zero code),
  * malformed drops must fail fast, and resets must restore the
  * shipped reconstructions exactly.
  */
class DataOverridesSpec extends AnyFunSuite {

  private def tempDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft-overrides").toFile
    d.deleteOnExit()
    d
  }

  private def write(dir: java.io.File, name: String, lines: Seq[String]): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(dir, name + ".tsv"), "UTF-8")
    try lines.foreach(w.println) finally w.close()
  }

  /** A LEGAL alternative assignment for a packed table: permute the
    * code values within each code-length class (the code SET is
    * unchanged, so Kraft completeness and prefix freedom are
    * preserved; the symbol→code mapping is not).
    */
  private def permuted(packed: Array[Int]): Array[Int] = {
    val byLen = packed.zipWithIndex.groupBy(_._1 >>> 20)
    val out = packed.clone()
    byLen.foreach { case (_, entries) =>
      if (entries.length > 1) {
        val codes = entries.map(_._1 & 0xFFFFF)
        val rotated = codes.drop(1) :+ codes.head
        entries.zip(rotated).foreach { case ((p, idx), c) =>
          out(idx) = (p & 0xFFF00000) | c
        }
      }
    }
    out
  }

  test("an injected MP3 table changes decode output; reset restores it") {
    // doc 7: non-silent, its region1/region2 rotation touches the
    // grade-B families (every non-silent doc does — bit_exact false)
    val doc = 7L
    val bytes = Mp3PcmSynth.mp3Bytes(doc) // ENCODED with the builtins
    val base = Mp3L3Codec.compute(bytes)
    assert(base.getUTF8String(0).toString == "mp3")
    assert(!base.getBoolean(9), "doc 7 must consult a grade-B table")
    val baseSum = base.getLong(6)
    val dir = tempDir()
    try {
      // inject permuted assignments for all three grade-B tables
      Seq("mp3_table15" -> Mp3HuffTables.t15, "mp3_table16" -> Mp3HuffTables.t16,
        "mp3_table24" -> Mp3HuffTables.t24).foreach { case (name, t) =>
        write(dir, name,
          permuted(t).map(p => s"${p >>> 20} ${p & 0xFFFFF}").toSeq)
      }
      val swapped = Mp3HuffTables.installOverrides(dir.getAbsolutePath)
      assert(swapped.toSet ==
        Set("mp3_table15", "mp3_table16", "mp3_table24"))
      // decoding the OLD bytes under the NEW assignment must not
      // reproduce the old spectrum (different symbols, or a torn
      // stream rejected outright)
      val after = Mp3L3Codec.compute(bytes)
      val changed = after.getUTF8String(0).toString != "mp3" ||
        after.getLong(6) != baseSum
      assert(changed, "injected assignment did not affect decode")
      // and a FRESH encode round-trips again: synth and decoder share
      // the installed data, so the closed-form spectrum returns
      val fresh = Mp3L3Codec.compute(Mp3PcmSynth.mp3Bytes(doc))
      assert(fresh.getUTF8String(0).toString == "mp3")
      assert(fresh.getLong(6) == baseSum,
        "round-trip under the installed tables must match the formula")
    } finally {
      Mp3HuffTables.resetBuiltins()
    }
    val restored = Mp3L3Codec.compute(bytes)
    assert(restored.getLong(6) == baseSum, "reset must restore the builtins")
  }

  test("an injected synthesis window changes PCM but not the spectrum fingerprint") {
    val doc = 3L // non-silent
    val bytes = Mp3PcmSynth.mp3Bytes(doc)
    val base = Mp3L3Codec.compute(bytes)
    val dir = tempDir()
    try {
      // half-amplitude window: pcm scales down, spec_sum (pre-filterbank)
      // must be untouched
      write(dir, "mp3_synth_window",
        Mp3L3Codec.DWin.map(v => (v / 2).toString).toSeq)
      assert(Mp3L3Codec.installWindow(dir.getAbsolutePath))
      val after = Mp3L3Codec.compute(bytes)
      assert(after.getLong(6) == base.getLong(6), "spec_sum is pre-filterbank")
      // the fixture's PCM clips heavily at full scale, so the halving
      // shows as a pointwise contract: no sample's magnitude may grow,
      // and un-clipped samples must actually shrink
      val b0 = base.getArray(8).toIntArray()
      val a0 = after.getArray(8).toIntArray()
      var shrunk = 0
      for (i <- b0.indices) {
        assert(math.abs(a0(i)) <= math.abs(b0(i)),
          s"sample $i grew under a halved window")
        if (math.abs(a0(i)) < math.abs(b0(i))) shrunk += 1
      }
      // ~91% of this doc's samples clip at full scale even halved; the
      // un-clipped tail (hundreds of samples) is the visible change
      assert(shrunk > 100,
        s"halved window changed only $shrunk of ${b0.length} samples")
    } finally {
      Mp3L3Codec.resetWindow()
    }
    assert(Mp3L3Codec.compute(bytes).getInt(7) == base.getInt(7))
  }

  test("an injected Vorbis dB table scales the spectral fingerprint exactly") {
    val doc = 1L // non-silent stereo
    val bytes = VorbisSynth.oggVorbisBytes(doc)
    val base = VorbisCodec.compute(bytes)
    assert(base.getUTF8String(0).toString == "vorbis")
    val dir = tempDir()
    try {
      // the fixture's floors sit at index 255 exactly: doubling the
      // table doubles spec_sum_q20 on the nose
      write(dir, "vorbis_inverse_db",
        VorbisCodec.InverseDb.map(v => (v * 2).toString).toSeq)
      assert(VorbisCodec.installInverseDb(dir.getAbsolutePath))
      val after = VorbisCodec.compute(bytes)
      assert(after.getLong(5) == 2 * base.getLong(5),
        "doubled dB table must double the flat-floor fingerprint")
    } finally {
      VorbisCodec.resetInverseDb()
    }
    assert(VorbisCodec.compute(bytes).getLong(5) == base.getLong(5))
  }

  test("malformed drops fail fast; absent files are no-ops") {
    val dir = tempDir()
    // absent: no-op
    assert(Mp3HuffTables.installOverrides(dir.getAbsolutePath).isEmpty)
    assert(!Mp3L3Codec.installWindow(dir.getAbsolutePath))
    // wrong line count
    write(dir, "vorbis_inverse_db", Seq("1.0", "2.0"))
    intercept[IllegalArgumentException] {
      VorbisCodec.installInverseDb(dir.getAbsolutePath)
    }
    // Kraft-violating Huffman drop (256 identical 1-bit codes)
    write(dir, "mp3_table15", (0 until 256).map(_ => "1 0"))
    intercept[IllegalArgumentException] {
      Mp3HuffTables.installOverrides(dir.getAbsolutePath)
    }
    // prefix violation in its own dir so the check is the one tested:
    // a valid Kraft-complete LENGTH multiset whose code values overlap
    val dir2 = tempDir()
    // 254 8-bit codes 0..253 plus two 9-bit codes inside 8-bit code
    // 0's interval: the tiling walk reports the overlap
    val badPrefix = (0 until 254).map(i => s"8 $i") ++ Seq("9 0", "9 1")
    write(dir2, "mp3_table16", badPrefix)
    intercept[IllegalArgumentException] {
      Mp3HuffTables.installOverrides(dir2.getAbsolutePath)
    }
    Mp3HuffTables.resetBuiltins()
    VorbisCodec.resetInverseDb()
    // decode still healthy after the failed installs
    assert(Mp3L3Codec.compute(Mp3PcmSynth.mp3Bytes(1L))
      .getUTF8String(0).toString == "mp3")
  }
}
