package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Fixture ENCODER for [[Mp3L3Codec]]: complete, valid MPEG-1 Layer III
  * streams whose decoded spectra are pure formulas of the seed — which
  * is what the DuckDB oracle replays. Every frame is really bit-packed:
  * 128 kbit/s headers at all three MPEG-1 sample rates, full side info,
  * written scalefactors (scalefac_compress 15 → slen 4/3),
  * Huffman-coded big values (table 1 over ±1) and count1 quads
  * (table B), and zero-bit stuffing to the exact frame length.
  *
  * Exactness contract: `global_gain = 210 + 4k` and `scalefac_scale=1`
  * make every requantized line a DYADIC rational `±2^(k − sf)` with
  * `k−sf ∈ [−3, 3]`, so the decoder-side spectrum fingerprint
  * `Σ xr · 2^20` is an exact BIGINT the oracle reproduces with integer
  * arithmetic. Silent files (every 5th seed) carry zero spectra whose
  * PCM must be EXACTLY zero through the whole filterbank; silent
  * stereo files use mid/side joint stereo so the MS path sits on the
  * oracle-checked pipeline too.
  */
object Mp3PcmSynth {

  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  // ---- shared seed formulas (the oracle mirrors these)
  def silent(doc: Long): Boolean = fm(doc, 5) == 0
  def channels(doc: Long): Int = 1 + fm(doc, 2)
  def srIdx(doc: Long): Int = fm(doc, 3)
  def frames(doc: Long): Int = 2 + fm(doc, 3)
  def kGain(doc: Long, g: Int, c: Int): Int = fm(doc + 2 * g + 3 * c, 4)
  def sf(doc: Long, sfb: Int, g: Int, c: Int): Int = fm(doc + sfb + g + 2 * c, 4)
  def pairX(doc: Long, j: Int, g: Int, c: Int): Int = fm(doc + 3 * j + g + c, 2)
  def pairXSign(doc: Long, j: Int, g: Int): Int = fm(doc + j + g, 2)
  def pairY(doc: Long, j: Int, g: Int, c: Int): Int = fm(doc + 5 * j + 1 + 2 * g + c, 2)
  def pairYSign(doc: Long, j: Int, c: Int): Int = fm(doc + 7 * j + 3 + c, 2)
  def quadV(doc: Long, q: Int, s: Int, g: Int, c: Int): Int = fm(doc + q + s + g + 2 * c, 2)
  def quadSign(doc: Long, q: Int, s: Int, g: Int): Int = fm(doc + 3 * q + s + g, 2)
  /** Every 7th-mod-3 seed carries a REAL CRC-16 (protection bit 0). */
  def withCrc(doc: Long): Boolean = fm(doc, 7) == 3

  val NPairs = 16
  val NQuads = 4

  private val T1Code = Array(1, 1, 1, 0)
  private val T1Len = Array(1, 3, 2, 3)
  private val SampleRate = Array(44100, 48000, 32000)

  private final class BitW {
    private var buf = new Array[Byte](2048)
    private var bitLen = 0
    def put(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        val byteI = bitLen >> 3
        if (byteI >= buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        if (((v >> k) & 1) == 1) buf(byteI) = (buf(byteI) | (0x80 >> (bitLen & 7))).toByte
        bitLen += 1
        k -= 1
      }
    }
    def lengthBits: Int = bitLen
    def bytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitLen + 7) >> 3)
  }

  /** Main data of one granule/channel; returns (bits, payload). */
  private def granuleData(doc: Long, g: Int, c: Int): (Int, BitW) = {
    val w = new BitW
    // scalefactors: 21 long bands, slen1=4 (0-10), slen2=3 (11-20)
    var sfb = 0
    while (sfb < 21) {
      w.put(sf(doc, sfb, g, c), if (sfb < 11) 4 else 3)
      sfb += 1
    }
    if (!silent(doc)) {
      var j = 0
      while (j < NPairs) {
        val x = pairX(doc, j, g, c)
        val y = pairY(doc, j, g, c)
        val idx = (x << 1) | y
        w.put(T1Code(idx), T1Len(idx))
        if (x != 0) w.put(pairXSign(doc, j, g), 1)
        if (y != 0) w.put(pairYSign(doc, j, c), 1)
        j += 1
      }
      var q = 0
      while (q < NQuads) {
        var value = 0
        var s = 0
        while (s < 4) { value = (value << 1) | quadV(doc, q, s, g, c); s += 1 }
        w.put(15 - value, 4) // count1 table B: one's-complement codes
        s = 0
        while (s < 4) {
          if (quadV(doc, q, s, g, c) != 0) w.put(quadSign(doc, q, s, g), 1)
          s += 1
        }
        q += 1
      }
    }
    (w.lengthBits, w)
  }

  def mp3Bytes(doc: Long): Array[Byte] = {
    if (doc < 0) return null
    val nch = channels(doc)
    val sIdx = srIdx(doc)
    val rate = SampleRate(sIdx)
    val nFrames = frames(doc)
    val isSilent = silent(doc)
    val frameLen = 144 * 128000 / rate // padding 0
    val crc = withCrc(doc)
    // one frame's bytes (content identical across frames)
    val fw = new BitW
    // MPEG-1 Layer III; protection bit 0 = CRC-16 present
    fw.put(0xFF, 8); fw.put(if (crc) 0xFA else 0xFB, 8)
    fw.put((9 << 4) | (sIdx << 2), 8) // 128 kbit/s, padding 0
    // mode: mono=3; stereo: MS joint (mode 1, ext 2) when silent,
    // independent stereo (mode 0) otherwise
    val (mode, modeExt) =
      if (nch == 1) (3, 0) else if (isSilent) (1, 2) else (0, 0)
    fw.put((mode << 6) | (modeExt << 4), 8)
    // granule payloads first (side info needs part2_3_length)
    val data = Array.tabulate(2, nch)((g, c) => granuleData(doc, g, c))
    // side info
    fw.put(0, 9) // main_data_begin: no reservoir use
    fw.put(0, if (nch == 1) 5 else 3)
    var c = 0
    while (c < nch) { fw.put(0, 4); c += 1 } // scfsi
    var g = 0
    while (g < 2) {
      c = 0
      while (c < nch) {
        val bits = data(g)(c)._1
        fw.put(bits, 12) // part2_3_length
        fw.put(if (isSilent) 0 else NPairs, 9) // big_values
        fw.put(210 + 4 * kGain(doc, g, c), 8)
        fw.put(15, 4) // scalefac_compress → slen 4/3
        fw.put(0, 1) // no window switching
        fw.put(if (isSilent) 0 else 1, 5) // table_select region0
        fw.put(0, 5); fw.put(0, 5)
        fw.put(8, 4) // region0_count: bands 0-8 cover all 32 lines
        fw.put(7, 3)
        fw.put(0, 1) // preflag
        fw.put(1, 1) // scalefac_scale → multiplier 1 (dyadic exponents)
        fw.put(1, 1) // count1 table B
        c += 1
      }
      g += 1
    }
    g = 0
    while (g < 2) {
      c = 0
      while (c < nch) {
        val (bits, bw) = data(g)(c)
        val payload = bw.bytes
        var k = 0
        while (k < bits) {
          fw.put((payload(k >> 3) >> (7 - (k & 7))) & 1, 1)
          k += 1
        }
        c += 1
      }
      g += 1
    }
    val plain = fw.bytes
    // CRC frames: splice the real CRC-16 between header and side info
    val frameBytes =
      if (!crc) plain
      else {
        val sideBytes = if (nch == 1) 17 else 32
        val withC = new Array[Byte](plain.length + 2)
        System.arraycopy(plain, 0, withC, 0, 4)
        System.arraycopy(plain, 4, withC, 6, plain.length - 4)
        val v = Mp3L3Codec.crc16(withC, 2, 2, 6, sideBytes)
        withC(4) = ((v >> 8) & 0xFF).toByte
        withC(5) = (v & 0xFF).toByte
        withC
      }
    if (frameBytes.length > frameLen) return null // cannot happen at 128k
    val out = new Array[Byte](frameLen * nFrames)
    var f = 0
    while (f < nFrames) {
      System.arraycopy(frameBytes, 0, out, f * frameLen, frameBytes.length)
      f += 1
    }
    out
  }
}

/** Expression wrapping [[Mp3PcmSynth.mp3Bytes]] (doc-seed only — every
  * stream parameter is a formula of the seed).
  */
case class SynthMp3Pcm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    Mp3PcmSynth.mp3Bytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.Mp3PcmSynth.mp3Bytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp3PcmFunctions {
  /** Column API: full Layer III PCM decode. */
  def mp3_decode(payload: Column): Column =
    ExpressionUtils.column(Mp3DecodeExpr(ExpressionUtils.expression(payload)))

  /** Column API: formula-spectrum Layer III fixture from a doc seed. */
  def synth_mp3_pcm(doc: Column): Column =
    ExpressionUtils.column(SynthMp3Pcm(ExpressionUtils.expression(doc)))
}
