package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MPEG-1 Audio Layer III PCM decode (ISO/IEC 11172-3) — the lossy
  * format that dominates crawled web audio, decoded for real: frame
  * sync + header tables, the bit RESERVOIR (`main_data_begin` reaches
  * back across frame boundaries), side-info for mono and all stereo
  * modes, scalefactors with scfsi reuse, Huffman-coded spectra,
  * requantization (the 4/3 power with global gain, scalefac_scale,
  * preflag/pretab), mid/side stereo, alias reduction (the eight ISO
  * butterflies), the 36/12-point IMDCT with all four closed-form
  * block windows (normal/start/short/stop, short-block reorder
  * included), frequency inversion, and the 32-band polyphase
  * synthesis filterbank.
  *
  * Honest scope, stated precisely:
  *  - Huffman: ALL big-value tables 0-31 decode (incl. the 16-23 /
  *    24-31 linbits families with ESC values and the spec's
  *    linbits-then-sign order) plus both count1 tables. Table data
  *    provenance is graded in [[Mp3HuffTables]]: tables
  *    1-3/5-13/count1-A/B are constraint-validated transcriptions of
  *    the published spec tables; tables 15/16/24 carry canonical
  *    reconstructions from their (repaired) length matrices, so a
  *    third-party stream selecting those three code tables decodes
  *    through real machinery but without a bit-conformance claim.
  *    Tables 4 and 14 are "not used" per spec and reject.
  *  - Stereo: mid/side, independent, AND intensity stereo (long and
  *    short blocks, per-window bounds, is_pos 7 pass-through, the
  *    exact 0/3/6 projection factors). The one rejected shape is
  *    intensity over MIXED blocks (or an intensity granule pair whose
  *    channels disagree on windowing) — rejecting beats guessing at
  *    band geometry.
  *  - The polyphase SYNTHESIS WINDOW is not the ISO Table 3-B.3
  *    tabulated prototype (512 opaque constants); it is a
  *    code-generated 512-tap lowpass (Blackman-windowed sinc, cutoff
  *    π/64) calibrated at class-init to unity cascade gain through
  *    the paired ISO analysis structure. Every STRUCTURAL element of
  *    the synthesis (cosine matrixing, the V-FIFO shift, the U/W
  *    windowing walk) is the ISO §2.4.3.2 flow; only the 512 window
  *    VALUES differ, which changes out-of-band leakage, not
  *    passband semantics. Swap the table when bit-conformance against
  *    reference decoders is required: drop the published values as
  *    `mp3_synth_window.tsv` under `-Dgraft.data.dir` (see
  *    [[DataOverrides]]) — a data-only change.
  *
  * Everything oracle-checkable is exact: an all-zero spectrum
  * propagates exact 0.0 through every stage to the PCM (the full
  * pipeline runs — nothing is short-circuited), and `spec_sum_q20`
  * fingerprints the REQUANTIZED spectrum (pre-filterbank) so the
  * discrete decode path (headers, side info, scalefactors, Huffman,
  * requantization) hash-compares against an arithmetic oracle.
  */
object Mp3L3Codec {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bitrate_kbps", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("n_samples", IntegerType, nullable = true),
    StructField("spec_sum_q20", LongType, nullable = true),
    StructField("pcm_abs_max", IntegerType, nullable = true),
    StructField("samples", ArrayType(IntegerType, containsNull = false),
      nullable = true),
    // conformance flag: false when any big-value region consulted a
    // grade-B Huffman table (15 / 16-23 / 24-31 — canonical
    // reconstructions whose code ASSIGNMENT may differ from ISO's) so
    // downstream consumers can split bit-exact decodes from
    // plausible-but-unverified spectra instead of trusting both equally
    StructField("bit_exact", BooleanType, nullable = true)))

  private val FmtMp3 = UTF8String.fromString("mp3")
  private val FmtUnknown = UTF8String.fromString("unknown")

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null, null, null, null,
      null, null, null, null, null))

  private val MaxFrames = 2048 // ≈ 2.4M samples/ch ≈ 19 MB of ints stereo

  // ---------------------------------------------------------- tables

  /** Bitrates (kbit/s) for MPEG-1 Layer III, index 1-14. */
  private val Bitrate = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320)
  private val SampleRate = Array(44100, 48000, 32000)

  /** Scalefactor-band boundaries, LONG blocks, per sample rate
    * (ISO 11172-3 Table B.8): 22 bands + the 576 terminator.
    */
  private[graftnative] val SfbLong: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
      162, 196, 238, 288, 342, 418, 576), // 44100
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
      156, 190, 230, 276, 330, 384, 576), // 48000
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
      194, 240, 296, 364, 448, 550, 576)) // 32000

  /** Scalefactor-band boundaries, SHORT blocks (per window). */
  private[graftnative] val SfbShort: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    Array(0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    Array(0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192))

  /** slen1/slen2 from scalefac_compress (Table B.6 semantics). */
  private val Slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  private val Slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  /** preflag pre-emphasis table (long-block bands 0-20). */
  private val Pretab =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2)

  /** Alias-reduction coefficients (Table B.9) and derived cs/ca. */
  private val Ci = Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
    -0.0142, -0.0037)
  private val Cs = Ci.map(c => 1.0 / StrictMath.sqrt(1.0 + c * c))
  private val Ca = Ci.zip(Cs).map { case (c, s) => c * s }

  // Huffman code data lives in [[Mp3HuffTables]] (all 32 big-value
  // ids + both count1 tables, with per-table provenance grading).

  // ------------------------------------------------------- bit reader

  /** MSB-first bit reader over a byte array (MP3 bit order). */
  private[graftnative] final class Br(val b: Array[Byte]) {
    var pos: Long = 0 // absolute bit position
    var ok = true
    def bits(n: Int): Int = {
      if (pos + n > b.length.toLong * 8) { ok = false; return 0 }
      var v = 0
      var k = 0
      while (k < n) {
        val byteI = ((pos + k) >> 3).toInt
        val bitI = 7 - ((pos + k) & 7).toInt
        v = (v << 1) | ((b(byteI) >> bitI) & 1)
        k += 1
      }
      pos += n
      v
    }
    def bit(): Int = bits(1)
    /** Next n ≤ 19 bits MSB-first WITHOUT consuming, zero-padded past
      * the stream end (a final code may resolve from fewer lookahead
      * bits than the LUT width; actually consuming past the end still
      * fails via advance()).
      */
    def peek(n: Int): Int = {
      val byteI = (pos >> 3).toInt
      val bitOff = (pos & 7).toInt
      var acc = 0L
      var i = 0
      while (i < 4) {
        val idx = byteI + i
        acc = (acc << 8) | (if (idx < b.length) (b(idx) & 0xFFL) else 0L)
        i += 1
      }
      ((acc >>> (32 - bitOff - n)) & ((1L << n) - 1)).toInt
    }
    /** Consume n previously peeked bits. */
    def advance(n: Int): Unit = {
      if (pos + n > b.length.toLong * 8) ok = false else pos += n
    }
  }

  /** ISO 11172-3 frame CRC-16: polynomial 0x8005, init 0xFFFF,
    * MSB-first, over two byte ranges (header bytes 3-4 + side info).
    */
  private[graftnative] def crc16(b: Array[Byte], off1: Int, len1: Int,
      off2: Int, len2: Int): Int = {
    var crc = 0xFFFF
    def feed(off: Int, len: Int): Unit = {
      var k = 0
      while (k < len) {
        val byte = b(off + k) & 0xFF
        var bit = 7
        while (bit >= 0) {
          val in = (byte >> bit) & 1
          val c15 = (crc >> 15) & 1
          crc = (crc << 1) & 0xFFFF
          if ((c15 ^ in) == 1) crc ^= 0x8005
          bit -= 1
        }
        k += 1
      }
    }
    feed(off1, len1)
    feed(off2, len2)
    crc
  }

  // ------------------------------------------------- per-granule state

  private final class Granule {
    var part23 = 0
    var bigValues = 0
    var globalGain = 0
    var scalefacCompress = 0
    var windowSwitching = false
    var blockType = 0
    var mixedBlock = false
    val tableSelect = new Array[Int](3)
    val subblockGain = new Array[Int](3)
    var region0 = 0
    var region1 = 0
    var preflag = 0
    var scalefacScale = 0
    var count1Table = 0
    /** Set when big-value decode actually consults a grade-B table
      * (15 / 16–23 / 24–31 — canonical reconstructions, see
      * [[Mp3HuffTables]]'s provenance scaladoc).
      */
    var usedGradeB = false
    // decoded per-granule data
    val scalefacL = new Array[Int](23)
    val scalefacS = Array.ofDim[Int](13, 3)
    val is = new Array[Int](576)
    val xr = new Array[Double](576)
  }

  // ------------------------------------------- synthesis filterbank

  /** Matrixing N[i][k] = cos((16 + i)(2k + 1)π/64) (ISO §2.4.3.2). */
  private val NMat: Array[Array[Double]] = Array.tabulate(64, 32) { (i, k) =>
    StrictMath.cos((16 + i) * (2 * k + 1) * StrictMath.PI / 64.0)
  }

  /** Code-generated 512-tap prototype (see the object scaladoc):
    * Blackman-windowed sinc, cutoff π/64, calibrated below to unity
    * cascade gain through the paired ISO analysis structure.
    */
  private val DWinBuiltin: Array[Double] = {
    val d = new Array[Double](512)
    var i = 0
    while (i < 512) {
      val t = i - 255.5
      val sinc = StrictMath.sin(StrictMath.PI * t / 64.0) / (StrictMath.PI * t / 64.0)
      val x = i / 511.0
      val blackman = 0.42 - 0.5 * StrictMath.cos(2 * StrictMath.PI * x) +
        0.08 * StrictMath.cos(4 * StrictMath.PI * x)
      d(i) = sinc * blackman
      i += 1
    }
    // --- calibrate: run a constant signal through ISO analysis
    // (C = D/32 by the standard windows' relation) + this synthesis,
    // measure the steady-state gain, and normalize it out.
    val MAna = Array.tabulate(32, 64) { (k, q) =>
      StrictMath.cos((2 * k + 1) * (q - 16) * StrictMath.PI / 64.0)
    }
    val xfifo = new Array[Double](512)
    val v = new Array[Double](1024)
    var gain = 0.0
    var blk = 0
    while (blk < 64) {
      // analysis: 32 new unit samples
      System.arraycopy(xfifo, 0, xfifo, 32, 480)
      var j = 0
      while (j < 32) { xfifo(j) = 1.0; j += 1 }
      val y = new Array[Double](64)
      var q = 0
      while (q < 64) {
        var s = 0.0
        var w = 0
        while (w < 8) { s += xfifo(q + 64 * w) * (d(q + 64 * w) / 32.0); w += 1 }
        y(q) = s
        q += 1
      }
      val sb = new Array[Double](32)
      var k = 0
      while (k < 32) {
        var s = 0.0
        q = 0
        while (q < 64) { s += MAna(k)(q) * y(q); q += 1 }
        sb(k) = s
        k += 1
      }
      // synthesis step
      System.arraycopy(v, 0, v, 64, 960)
      var i2 = 0
      while (i2 < 64) {
        var s = 0.0
        k = 0
        while (k < 32) { s += NMat(i2)(k) * sb(k); k += 1 }
        v(i2) = s
        i2 += 1
      }
      val u = new Array[Double](512)
      var seg = 0
      while (seg < 8) {
        j = 0
        while (j < 32) {
          u(seg * 64 + j) = v(seg * 128 + j)
          u(seg * 64 + 32 + j) = v(seg * 128 + 96 + j)
          j += 1
        }
        seg += 1
      }
      // steady-state: average the last block's 32 outputs
      if (blk == 63) {
        var jj = 0
        while (jj < 32) {
          var s = 0.0
          var w = 0
          while (w < 16) { s += d(jj + 32 * w) * u(jj + 32 * w); w += 1 }
          gain += s / 32.0
          jj += 1
        }
      }
      blk += 1
    }
    if (gain != 0.0) {
      // split the correction evenly between the paired windows'
      // appearance in the cascade (window enters twice) so the
      // synthesis window alone stays O(ISO-scale)
      val corr = 1.0 / StrictMath.sqrt(StrictMath.abs(gain))
      val sgn = if (gain < 0) -1.0 else 1.0
      var k = 0
      while (k < 512) { d(k) *= corr * sgn; k += 1 }
      // after scaling, the cascade gain is sgn·|gain|·corr² = 1
    }
    d
  }

  /** The active synthesis window — the calibrated Blackman-sinc by
    * default, or ISO Table 3-B.3 dropped in via [[DataOverrides]]
    * (`mp3_synth_window.tsv`, 512 values) when the published literals
    * are available. Data-only swap; see the object scaladoc.
    */
  @volatile private[graftnative] var DWin: Array[Double] = DWinBuiltin

  /** Install the published window from `dir`; true when swapped. */
  private[graftnative] def installWindow(dir: String): Boolean =
    DataOverrides.doubles(dir, "mp3_synth_window", 512) match {
      case Some(w) => DWin = w; true
      case None => false
    }

  /** Restore the calibrated generated window (test hook). */
  private[graftnative] def resetWindow(): Unit = DWin = DWinBuiltin

  // automatic pickup when the literals are dropped next to the job
  DataOverrides.configuredDir.foreach(installWindow)

  /** Per-channel synthesis state: the 1024-sample V FIFO. */
  private final class SynthState {
    val v = new Array[Double](1024)
    def step(sb: Array[Double], out: Array[Double], outOff: Int): Unit = {
      System.arraycopy(v, 0, v, 64, 960)
      var i = 0
      while (i < 64) {
        var s = 0.0
        var k = 0
        val row = NMat(i)
        while (k < 32) { s += row(k) * sb(k); k += 1 }
        v(i) = s
        i += 1
      }
      var j = 0
      while (j < 32) {
        var s = 0.0
        var seg = 0
        while (seg < 8) {
          // u[seg*64 + j]     = v[seg*128 + j]
          // u[seg*64 + 32 + j] = v[seg*128 + 96 + j]
          s += DWin(seg * 64 + j) * v(seg * 128 + j)
          s += DWin(seg * 64 + 32 + j) * v(seg * 128 + 96 + j)
          seg += 1
        }
        out(outOff + j) = s
        j += 1
      }
    }
  }

  // --------------------------------------------------- IMDCT windows

  /** Long (normal) window sin(π/36 (i + ½)). */
  private val WinNormal = Array.tabulate(36)(i =>
    StrictMath.sin(StrictMath.PI / 36.0 * (i + 0.5)))
  private val WinStart = Array.tabulate(36) { i =>
    if (i < 18) StrictMath.sin(StrictMath.PI / 36.0 * (i + 0.5))
    else if (i < 24) 1.0
    else if (i < 30) StrictMath.sin(StrictMath.PI / 12.0 * (i - 18 + 0.5))
    else 0.0
  }
  private val WinStop = Array.tabulate(36) { i =>
    if (i < 6) 0.0
    else if (i < 12) StrictMath.sin(StrictMath.PI / 12.0 * (i - 6 + 0.5))
    else if (i < 18) 1.0
    else StrictMath.sin(StrictMath.PI / 36.0 * (i + 0.5))
  }
  private val WinShort = Array.tabulate(12)(i =>
    StrictMath.sin(StrictMath.PI / 12.0 * (i + 0.5)))

  /** IMDCT-36 cosine table cos(π/72 (2i + 1 + 18)(2k + 1)). */
  private val Imdct36Cos: Array[Array[Double]] = Array.tabulate(36, 18) { (i, k) =>
    StrictMath.cos(StrictMath.PI / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
  }
  private val Imdct12Cos: Array[Array[Double]] = Array.tabulate(12, 6) { (i, k) =>
    StrictMath.cos(StrictMath.PI / 24.0 * (2 * i + 1 + 6) * (2 * k + 1))
  }

  // ------------------------------------------------------ the decoder

  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return unknown
    var i = 0
    // leading ID3v2 (same walk as Mp3Meta)
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val flags = b(5) & 0xFF
      var sz = 0
      var k = 0
      while (k < 4) {
        val s = b(6 + k) & 0xFF
        if ((s & 0x80) != 0) return unknown
        sz = (sz << 7) | s
        k += 1
      }
      i = 10 + sz + (if ((flags & 0x10) != 0) 10 else 0)
      if (i >= b.length) return unknown
    }
    var nch = -1
    var rate = -1
    var srIdx = -1
    var brKbps = -1
    var mode = -1
    var frames = 0
    // bit reservoir: all main-data bytes seen so far
    val md = new java.io.ByteArrayOutputStream()
    // (bit-position, sideinfo) pending granule work per frame
    final case class FrameJob(mainStart: Int, gr: Array[Array[Granule]],
      scfsi: Array[Array[Int]], msStereo: Boolean, isStereo: Boolean)
    val jobs = scala.collection.mutable.ArrayBuffer.empty[FrameJob]
    while (i < b.length) {
      if (b.length - i == 128 && b(i) == 'T' && b(i + 1) == 'A' &&
          b(i + 2) == 'G' && frames > 0) {
        i = b.length
      } else {
        if (i + 4 > b.length) return unknown
        val h1 = b(i + 1) & 0xFF
        val h2 = b(i + 2) & 0xFF
        val h3 = b(i + 3) & 0xFF
        if ((b(i) & 0xFF) != 0xFF || (h1 & 0xE0) != 0xE0) return unknown
        if (((h1 >> 3) & 3) != 3 || ((h1 >> 1) & 3) != 1) return unknown // MPEG-1 L3 only
        val protection = h1 & 1 // 0 = CRC present
        val brIdx = (h2 >> 4) & 0xF
        val sIdx = (h2 >> 2) & 3
        if (brIdx == 0 || brIdx == 15 || sIdx == 3) return unknown
        val padding = (h2 >> 1) & 1
        val thisMode = (h3 >> 6) & 3
        val modeExt = (h3 >> 4) & 3
        val thisCh = if (thisMode == 3) 1 else 2
        val thisRate = SampleRate(sIdx)
        val frameLen = 144 * (1000 * Bitrate(brIdx)) / thisRate + padding
        if (frameLen < 4 || i + frameLen > b.length) return unknown
        if (frames == 0) {
          nch = thisCh; rate = thisRate; srIdx = sIdx; brKbps = Bitrate(brIdx)
          mode = thisMode
        } else if (nch != thisCh || rate != thisRate) return unknown
        val msStereo = thisMode == 1 && (modeExt & 2) != 0
        val isStereo = thisMode == 1 && (modeExt & 1) != 0
        var off = i + 4
        val sideBytes = if (nch == 1) 17 else 32
        if (protection == 0) {
          // CRC-16 (poly 0x8005, init 0xFFFF, MSB-first) over header
          // bytes 3-4 and the side info — actually VERIFIED, not
          // skipped, the same stance as the Ogg page-CRC gate
          if (i + 6 + sideBytes > i + frameLen) return unknown
          val stored = ((b(i + 4) & 0xFF) << 8) | (b(i + 5) & 0xFF)
          if (crc16(b, i + 2, 2, i + 6, sideBytes) != stored) return unknown
          off += 2
        }
        if (off + sideBytes > i + frameLen) return unknown
        val sbr = new Br(b)
        sbr.pos = off.toLong * 8
        val mainDataBegin = sbr.bits(9)
        sbr.bits(if (nch == 1) 5 else 3) // private bits
        val scfsi = Array.ofDim[Int](nch, 4)
        var c = 0
        while (c < nch) {
          var g = 0
          while (g < 4) { scfsi(c)(g) = sbr.bit(); g += 1 }
          c += 1
        }
        val gr = Array.fill(2, nch)(new Granule)
        var g = 0
        while (g < 2) {
          c = 0
          while (c < nch) {
            val q = gr(g)(c)
            q.part23 = sbr.bits(12)
            q.bigValues = sbr.bits(9)
            q.globalGain = sbr.bits(8)
            q.scalefacCompress = sbr.bits(4)
            q.windowSwitching = sbr.bit() == 1
            if (q.windowSwitching) {
              q.blockType = sbr.bits(2)
              q.mixedBlock = sbr.bit() == 1
              q.tableSelect(0) = sbr.bits(5)
              q.tableSelect(1) = sbr.bits(5)
              q.tableSelect(2) = 0
              var w = 0
              while (w < 3) { q.subblockGain(w) = sbr.bits(3); w += 1 }
              if (q.blockType == 0) return unknown // forbidden
              // spec defaults when window switching is on
              q.region0 = if (q.blockType == 2 && !q.mixedBlock) 8 else 7
              q.region1 = 20 - q.region0
            } else {
              q.blockType = 0
              var t = 0
              while (t < 3) { q.tableSelect(t) = sbr.bits(5); t += 1 }
              q.region0 = sbr.bits(4)
              q.region1 = sbr.bits(3)
            }
            q.preflag = sbr.bit()
            q.scalefacScale = sbr.bit()
            q.count1Table = sbr.bit()
            c += 1
          }
          g += 1
        }
        if (!sbr.ok) return unknown
        if (q0BigValuesTooBig(gr)) return unknown
        // main data of this frame
        val mainOff = off + sideBytes
        val mainLen = i + frameLen - mainOff
        val startOfThisFrame = md.size()
        if (mainDataBegin > startOfThisFrame) return unknown // reservoir underrun
        jobs += FrameJob(startOfThisFrame - mainDataBegin, gr, scfsi, msStereo,
          isStereo)
        md.write(b, mainOff, mainLen)
        frames += 1
        if (frames > MaxFrames) return unknown
        i += frameLen
      }
    }
    if (frames == 0) return unknown

    // ---- decode all granules against the assembled reservoir
    val mdBytes = md.toByteArray
    val nSamples = frames * 1152
    val pcm = new Array[Int](nSamples * nch)
    var specSum = 0.0
    var bitExact = true
    val synth = Array.fill(nch)(new SynthState)
    val overlap = Array.fill(nch, 32, 18)(0.0)
    val outF = new Array[Double](32)
    val tmp = new Array[Double](36)
    var absMax = 0
    var f = 0
    var outPos = 0
    while (f < frames) {
      val job = jobs(f)
      val br = new Br(mdBytes)
      br.pos = job.mainStart.toLong * 8
      var g = 0
      while (g < 2) {
        var c = 0
        while (c < nch) {
          val q = job.gr(g)(c)
          val grStart = br.pos
          if (!readScalefactors(br, q, if (g == 1) job.scfsi(c) else null,
            if (g == 1) job.gr(0)(c) else null)) return unknown
          if (!readHuffman(br, q, grStart, srIdx)) return unknown
          if (q.usedGradeB) bitExact = false
          br.pos = grStart + q.part23
          requantize(q, srIdx)
          c += 1
        }
        // stereo processing (mid/side and/or intensity)
        if (nch == 2 && !stereoDecode(job.gr(g)(0), job.gr(g)(1),
          job.msStereo, job.isStereo, srIdx)) return unknown
        c = 0
        while (c < nch) {
          val q = job.gr(g)(c)
          var s = 0.0
          var li = 0
          while (li < 576) { s += q.xr(li); li += 1 }
          specSum += s
          hybrid(q, overlap(c), tmp)
          // 18 polyphase steps of 32 samples each
          var t = 0
          while (t < 18) {
            var sb = 0
            while (sb < 32) {
              // frequency inversion: odd subbands, odd time samples
              val v = q.xr(sb * 18 + t)
              outF(sb) = if ((sb & 1) == 1 && (t & 1) == 1) -v else v
              sb += 1
            }
            synthStep(synth(c), outF, pcm, (outPos + g * 576 + t * 32) * nch + c,
              nch)
            var j = 0
            while (j < 32) {
              val a = pcm((outPos + g * 576 + t * 32 + j) * nch + c)
              val m = if (a < 0) -a else a
              if (m > absMax) absMax = m
              j += 1
            }
            t += 1
          }
          c += 1
        }
        g += 1
      }
      f += 1
      outPos += 1152
    }
    val q20 = StrictMath.rint(specSum * 1048576.0)
    val q20l = if (q20.isNaN || q20.isInfinite) 0L else q20.toLong
    new GenericInternalRow(Array[Any](FmtMp3, nch, rate, brKbps, frames,
      nSamples, q20l, absMax,
      new GenericArrayData(pcm.map(v => v: Any)), bitExact))
  }

  private def q0BigValuesTooBig(gr: Array[Array[Granule]]): Boolean = {
    var g = 0
    while (g < 2) {
      var c = 0
      while (c < gr(g).length) {
        if (gr(g)(c).bigValues > 288) return true
        c += 1
      }
      g += 1
    }
    false
  }

  /** One synthesis step writing 32 interleaved s16 samples. */
  private def synthStep(st: SynthState, sb: Array[Double], pcm: Array[Int],
      base: Int, nch: Int): Unit = {
    val out = new Array[Double](32)
    st.step(sb, out, 0)
    var j = 0
    while (j < 32) {
      val x = out(j) * 32767.0
      val r = StrictMath.rint(x)
      val s = if (r > 32767.0) 32767 else if (r < -32768.0) -32768 else r.toInt
      pcm(base + j * nch) = s
      j += 1
    }
  }

  // ------------------------------------------------------ scalefactors

  private def readScalefactors(br: Br, q: Granule, scfsi: Array[Int],
      gr0: Granule): Boolean = {
    val s1 = Slen1(q.scalefacCompress)
    val s2 = Slen2(q.scalefacCompress)
    if (q.windowSwitching && q.blockType == 2) {
      if (q.mixedBlock) {
        var sfb = 0
        while (sfb < 8) { q.scalefacL(sfb) = br.bits(s1); sfb += 1 }
        sfb = 3
        while (sfb < 6) {
          var w = 0
          while (w < 3) { q.scalefacS(sfb)(w) = br.bits(s1); w += 1 }
          sfb += 1
        }
        sfb = 6
        while (sfb < 12) {
          var w = 0
          while (w < 3) { q.scalefacS(sfb)(w) = br.bits(s2); w += 1 }
          sfb += 1
        }
      } else {
        var sfb = 0
        while (sfb < 6) {
          var w = 0
          while (w < 3) { q.scalefacS(sfb)(w) = br.bits(s1); w += 1 }
          sfb += 1
        }
        sfb = 6
        while (sfb < 12) {
          var w = 0
          while (w < 3) { q.scalefacS(sfb)(w) = br.bits(s2); w += 1 }
          sfb += 1
        }
      }
    } else {
      // long blocks; scfsi groups (0-5)(6-10)(11-15)(16-20)
      val groups = Array(0, 6, 11, 16, 21)
      var gi = 0
      while (gi < 4) {
        val reuse = scfsi != null && scfsi(gi) == 1
        var sfb = groups(gi)
        while (sfb < groups(gi + 1)) {
          if (reuse) {
            if (gr0 == null) return false
            q.scalefacL(sfb) = gr0.scalefacL(sfb)
          } else {
            q.scalefacL(sfb) = br.bits(if (sfb < 11) s1 else s2)
          }
          sfb += 1
        }
        gi += 1
      }
    }
    br.ok
  }

  // ---------------------------------------------------------- huffman

  /** Decode one (x, y) pair from a big-value table (table 0 emits
    * zeros without consuming bits). Full Table B.7 semantics: LUT
    * symbol resolve, then per value the ESC extension (value 15 plus
    * `linbits` raw bits on the 16-31 families) and the sign bit, in
    * the spec's order (x linbits, x sign, y linbits, y sign).
    */
  private def pair(br: Br, table: Int, out: Array[Int], at: Int): Boolean = {
    if (table == 0) { out(at) = 0; out(at + 1) = 0; return true }
    val lut = Mp3HuffTables.lutFor(table)
    if (lut == null) return false // ids 4 and 14: "not used" per spec
    val e = lut.entries(br.peek(lut.bits))
    br.advance(e >>> 8)
    if (!br.ok) return false
    val sym = e & 0xFF
    val dim = Mp3HuffTables.dimFor(table)
    var x = sym / dim
    var y = sym % dim
    val linbits = Mp3HuffTables.Linbits(table)
    if (x == 15 && linbits > 0) { x += br.bits(linbits); if (!br.ok) return false }
    if (x != 0 && br.bit() == 1) x = -x
    if (y == 15 && linbits > 0) { y += br.bits(linbits); if (!br.ok) return false }
    if (y != 0 && br.bit() == 1) y = -y
    out(at) = x
    out(at + 1) = y
    br.ok
  }

  private def readHuffman(br: Br, q: Granule, grStart: Long, srIdx: Int): Boolean = {
    java.util.Arrays.fill(q.is, 0)
    val sfb = SfbLong(srIdx)
    val bv2 = q.bigValues * 2
    val (r0End, r1End) =
      if (q.windowSwitching) {
        // spec: region0 = 36 samples, region1 = the rest (long-start) /
        // short uses 36 as well through the same arithmetic
        (math.min(36, bv2), bv2)
      } else {
        val b0 = math.min(sfb(math.min(q.region0 + 1, 22)), bv2)
        val b1 = math.min(sfb(math.min(q.region0 + q.region1 + 2, 22)), bv2)
        (b0, b1)
      }
    var li = 0
    while (li < bv2) {
      val table =
        if (li < r0End) q.tableSelect(0)
        else if (li < r1End) q.tableSelect(1)
        else q.tableSelect(2)
      if (table >= 15) q.usedGradeB = true
      if (!pair(br, table, q.is, li)) return false
      li += 2
    }
    // count1: quads until the granule's bit budget is exhausted
    while (br.pos < grStart + q.part23 && li + 4 <= 576) {
      val value =
        if (q.count1Table == 1) {
          // table B: 4-bit one's-complement codes
          val code = br.bits(4)
          if (!br.ok) return false
          15 - code
        } else {
          // table A (Table B.7): a real Huffman code over the 16 quads
          val lut = Mp3HuffTables.count1ALut
          val e = lut.entries(br.peek(lut.bits))
          br.advance(e >>> 8)
          if (!br.ok) return false
          e & 0xFF
        }
      var s = 0
      val quad = new Array[Int](4)
      while (s < 4) {
        quad(s) = (value >> (3 - s)) & 1
        if (quad(s) != 0 && br.bit() == 1) quad(s) = -quad(s)
        s += 1
      }
      if (br.pos > grStart + q.part23) return false // torn quad
      s = 0
      while (s < 4) { q.is(li + s) = quad(s); s += 1 }
      li += 4
    }
    br.pos <= grStart + q.part23 && br.ok
  }

  // ----------------------------------------------------- requantization

  private def pow43(v: Int): Double =
    if (v == 0) 0.0
    else {
      val a = StrictMath.pow(StrictMath.abs(v.toDouble), 4.0 / 3.0)
      if (v < 0) -a else a
    }

  private def requantize(q: Granule, srIdx: Int): Unit = {
    val mult = if (q.scalefacScale == 1) 1.0 else 0.5
    val gainBase = 0.25 * (q.globalGain - 210)
    if (q.windowSwitching && q.blockType == 2) {
      // short (and mixed) blocks: per-window scalefactors + subblock
      // gain, then REORDER from window-interleaved to subband order
      val sfbS = SfbShort(srIdx)
      val sfbL = SfbLong(srIdx)
      val xrTmp = new Array[Double](576)
      val longEnd = if (q.mixedBlock) sfbL(8) else 0
      var li = 0
      while (li < longEnd) {
        var sfb = 0
        while (sfbL(sfb + 1) <= li) sfb += 1
        val pre = if (q.preflag == 1) Pretab(sfb) else 0
        val e = gainBase - mult * (q.scalefacL(sfb) + pre)
        xrTmp(li) = pow43(q.is(li)) * StrictMath.pow(2.0, e)
        li += 1
      }
      // short region: samples appear window-interleaved per sfb
      var sfb = if (q.mixedBlock) 3 else 0
      var src = longEnd
      while (sfb < 12 && src < 576) {
        val width = sfbS(sfb + 1) - sfbS(sfb)
        var w = 0
        while (w < 3) {
          var k = 0
          while (k < width && src < 576) {
            val e = gainBase - 2.0 * q.subblockGain(w) -
              mult * q.scalefacS(sfb)(w)
            // destination: window-major inside the 3·width chunk,
            // reordered to (k-major, window-minor) subband layout
            val base = if (q.mixedBlock) sfbL(8) else 0
            val chunkStart = base + 3 * (sfbS(sfb) - sfbS(if (q.mixedBlock) 3 else 0))
            xrTmp(chunkStart + k * 3 + w) = pow43(q.is(src)) * StrictMath.pow(2.0, e)
            src += 1
            k += 1
          }
          w += 1
        }
        sfb += 1
      }
      System.arraycopy(xrTmp, 0, q.xr, 0, 576)
    } else {
      var li = 0
      var sfb = 0
      val sfbL = SfbLong(srIdx)
      while (li < 576) {
        while (sfb < 21 && sfbL(sfb + 1) <= li) sfb += 1
        // the last partition ("sfb21", lines past sfbL(21)) carries NO
        // scalefactor: the spec treats it as 0, not band 20's value
        val inBand = sfb < 21 && li < sfbL(21)
        val pre = if (q.preflag == 1 && inBand) Pretab(sfb) else 0
        val sf = if (inBand) q.scalefacL(sfb) else 0
        val e = gainBase - mult * (sf + pre)
        q.xr(li) =
          if (q.is(li) == 0) 0.0
          else pow43(q.is(li)) * StrictMath.pow(2.0, e)
        li += 1
      }
    }
  }

  // --------------------------------------------------------- stereo

  /** Mid/side over a line range: L = (M + S)/√2, R = (M − S)/√2. */
  private def msRange(l: Granule, r: Granule, from: Int, to: Int): Unit = {
    val inv = 1.0 / StrictMath.sqrt(2.0)
    var i = from
    while (i < to) {
      val m = l.xr(i)
      val s = r.xr(i)
      l.xr(i) = (m + s) * inv
      r.xr(i) = (m - s) * inv
      i += 1
    }
  }

  /** Intensity-stereo projection factors for is_pos 0-6 (§2.4.3.4.9.3):
    * ratio = tan(is_pos·π/12), left = kl·x, right = kr·x with
    * kl = r/(1+r), kr = 1/(1+r). Positions 0, 3, 6 are pinned to their
    * EXACT values (0/1, 1/2 / 1/2, 1/0) — tan(π/4) in floating point is
    * 1−ulp, and the fixture oracle's integer-exactness contract rides
    * on dyadic kl/kr at those positions. is_pos 7 means "no intensity"
    * for the band.
    */
  private val IsKl: Array[Double] = Array.tabulate(7) {
    case 0 => 0.0
    case 3 => 0.5
    case 6 => 1.0
    case p =>
      val r = StrictMath.tan(p * StrictMath.PI / 12.0)
      r / (1.0 + r)
  }
  private val IsKr: Array[Double] = Array.tabulate(7) {
    case 0 => 1.0
    case 3 => 0.5
    case 6 => 0.0
    case p => 1.0 / (1.0 + StrictMath.tan(p * StrictMath.PI / 12.0))
  }

  /** Joint-stereo processing for one granule pair: mid/side and/or
    * intensity per the frame's mode_extension. Intensity applies to
    * scalefactor bands wholly inside the RIGHT channel's zero part
    * (the bound rounds UP to the next band boundary); the right
    * channel's scalefactors there are is_pos values, is_pos 7 leaving
    * the band on the mid/side (or independent) path. The untransmitted
    * tail band reuses the last transmitted band's is_pos (the
    * established decoder convention). Returns false on the one shape
    * this decoder rejects: intensity with MIXED blocks, or an
    * intensity granule pair whose two channels disagree on windowing
    * (both vanishingly rare; rejecting beats guessing at band
    * geometry).
    */
  private def stereoDecode(l: Granule, r: Granule, ms: Boolean,
      is: Boolean, srIdx: Int): Boolean = {
    if (!is) {
      if (ms) msRange(l, r, 0, 576)
      return true
    }
    if (l.windowSwitching != r.windowSwitching || l.blockType != r.blockType ||
        l.mixedBlock != r.mixedBlock) return false
    if (r.windowSwitching && r.blockType == 2) {
      if (r.mixedBlock) return false
      intensityShort(l, r, ms, srIdx)
    } else {
      intensityLong(l, r, ms, srIdx)
    }
    true
  }

  private def intensityLong(l: Granule, r: Granule, ms: Boolean,
      srIdx: Int): Unit = {
    val sfbL = SfbLong(srIdx)
    var rzero = 576
    while (rzero > 0 && r.is(rzero - 1) == 0) rzero -= 1
    var bound = 0
    while (bound < 22 && sfbL(bound) < rzero) bound += 1
    // below the bound: mid/side if enabled, else independent L/R
    if (ms) msRange(l, r, 0, sfbL(bound))
    var sfb = bound
    while (sfb < 22) {
      val isPos = if (sfb <= 20) r.scalefacL(sfb) else r.scalefacL(20)
      val s = sfbL(sfb)
      val e = sfbL(sfb + 1)
      // is_pos 7 = "no intensity" per spec; anything above 7 is out of
      // the legal 0-6 range and is treated the same way rather than
      // indexing past the factor tables
      if (isPos >= 7) { if (ms) msRange(l, r, s, e) }
      else {
        val kl = IsKl(isPos)
        val kr = IsKr(isPos)
        var i = s
        while (i < e) {
          val v = l.xr(i)
          l.xr(i) = v * kl
          r.xr(i) = v * kr
          i += 1
        }
      }
      sfb += 1
    }
  }

  /** Short-block intensity: per-window bounds from the right channel's
    * PRE-reorder spectrum (where each band's samples sit window-major),
    * applied to the POST-reorder xr through the same (k·3 + w) layout
    * the requantizer used.
    */
  private def intensityShort(l: Granule, r: Granule, ms: Boolean,
      srIdx: Int): Unit = {
    val sfbS = SfbShort(srIdx)
    // last band carrying a nonzero right sample, per window
    val lastNz = Array(-1, -1, -1)
    var sfb = 0
    var src = 0
    while (sfb < 13) {
      val width = sfbS(sfb + 1) - sfbS(sfb)
      var w = 0
      while (w < 3) {
        var k = 0
        while (k < width) {
          if (src < 576 && r.is(src) != 0) lastNz(w) = sfb
          src += 1
          k += 1
        }
        w += 1
      }
      sfb += 1
    }
    sfb = 0
    while (sfb < 13) {
      val start = 3 * sfbS(sfb)
      val width = sfbS(sfb + 1) - sfbS(sfb)
      var w = 0
      while (w < 3) {
        val intens = sfb > lastNz(w)
        val isPos =
          if (!intens) 8 // sentinel: not an intensity band for this window
          else if (sfb <= 11) r.scalefacS(sfb)(w)
          else r.scalefacS(11)(w)
        var k = 0
        while (k < width) {
          val i = start + k * 3 + w
          if (i < 576) {
            if (isPos >= 7) { // 7 = no-intensity; >7 out of legal range
              if (ms) {
                val inv = 1.0 / StrictMath.sqrt(2.0)
                val m = l.xr(i)
                val s = r.xr(i)
                l.xr(i) = (m + s) * inv
                r.xr(i) = (m - s) * inv
              }
            } else {
              val v = l.xr(i)
              l.xr(i) = v * IsKl(isPos)
              r.xr(i) = v * IsKr(isPos)
            }
          }
          k += 1
        }
        w += 1
      }
      sfb += 1
    }
  }

  // ------------------------------------------- alias + IMDCT (hybrid)

  /** Alias reduction + IMDCT + windowing + overlap-add, writing the 18
    * time samples per subband back into `q.xr` (subband-major).
    */
  private def hybrid(q: Granule, overlap: Array[Array[Double]],
      tmp: Array[Double]): Unit = {
    val shortBlock = q.windowSwitching && q.blockType == 2
    // alias reduction (not applied to pure short blocks; applied to
    // the first long band pair of mixed blocks only)
    val aliasBands = if (!shortBlock) 31 else if (q.mixedBlock) 1 else 0
    var b = 1
    while (b <= aliasBands) {
      var k = 0
      while (k < 8) {
        val a = q.xr(18 * b - 1 - k)
        val c = q.xr(18 * b + k)
        q.xr(18 * b - 1 - k) = a * Cs(k) - c * Ca(k)
        q.xr(18 * b + k) = c * Cs(k) + a * Ca(k)
        k += 1
      }
      b += 1
    }
    var sb = 0
    while (sb < 32) {
      val longHere = !shortBlock || (q.mixedBlock && sb < 2)
      if (longHere) {
        val win = q.blockType match {
          case 1 => WinStart
          case 3 => WinStop
          case _ => WinNormal
        }
        // the two lowest subbands of a mixed block always use the
        // normal window
        val w = if (shortBlock) WinNormal else win
        var i = 0
        while (i < 36) {
          var s = 0.0
          var k = 0
          while (k < 18) { s += q.xr(sb * 18 + k) * Imdct36Cos(i)(k); k += 1 }
          tmp(i) = s * w(i)
          i += 1
        }
      } else {
        // three 12-point IMDCTs, windowed and overlapped into 36
        java.util.Arrays.fill(tmp, 0.0)
        var w = 0
        while (w < 3) {
          var i = 0
          while (i < 12) {
            var s = 0.0
            var k = 0
            while (k < 6) {
              s += q.xr(sb * 18 + w + 3 * k) * Imdct12Cos(i)(k)
              k += 1
            }
            tmp(6 + w * 6 + i) += s * WinShort(i)
            i += 1
          }
          w += 1
        }
      }
      // overlap-add with the previous granule's tail
      var i = 0
      while (i < 18) {
        val v = tmp(i) + overlap(sb)(i)
        overlap(sb)(i) = tmp(18 + i)
        q.xr(sb * 18 + i) = v
        i += 1
      }
      sb += 1
    }
  }
}

/** Unary expression surfacing [[Mp3L3Codec.compute]]. */
case class Mp3DecodeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = Mp3L3Codec.schema

  override def nullSafeEval(v: Any): Any =
    Mp3L3Codec.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.Mp3L3Codec.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
