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
  * TABLE-DIVERSE Huffman-coded big values across three regions —
  * region0 rotates the ten small tables 2-12, region1 the 16×16
  * tables 13/15/16, region2 the linbits/ESC families (19, 21, 24, 26:
  * both code tables, three linbits widths, value 27 = symbol 15 + a
  * 12-valued escape extension) — count1 quads alternating tables A
  * and B per doc, and zero-bit stuffing to the exact frame length.
  *
  * Exactness contract: `global_gain = 210 + 4k` and `scalefac_scale=1`
  * make every requantized line `±v^{4/3}·2^(k − sf)`, and every coded
  * value is a PERFECT CUBE (0, 1, 8, 27 → v^{4/3} = 0, 1, 16, 81), so
  * each line is a DYADIC rational and the decoder-side spectrum
  * fingerprint `Σ xr · 2^20` is an exact BIGINT the oracle reproduces
  * with integer arithmetic. Silent files (every 5th seed) carry zero
  * spectra whose PCM must be EXACTLY zero through the whole
  * filterbank; silent stereo files use mid/side joint stereo.
  * Non-silent stereo docs with `doc % 3 == 1` use INTENSITY joint
  * stereo: the right channel carries only region0 (12 lines, so the
  * intensity bound lands on the sfb-3 boundary) and is_pos
  * scalefactors restricted to {0, 3, 6, 7} — the positions whose
  * projection factors are exactly dyadic (0/1, 1/2+1/2, 1/0) or
  * pass-through — keeping the invariant Σ(L′+R′) = Σ L exact, which
  * is why the oracle's spectrum sum needs no intensity term at all.
  */
object Mp3PcmSynth {

  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  // ---- shared seed formulas (the oracle mirrors these)
  def silent(doc: Long): Boolean = fm(doc, 5) == 0
  def channels(doc: Long): Int = 1 + fm(doc, 2)
  def srIdx(doc: Long): Int = fm(doc, 3)
  def frames(doc: Long): Int = 2 + fm(doc, 3)
  def intensity(doc: Long): Boolean =
    channels(doc) == 2 && !silent(doc) && fm(doc, 3) == 1
  def kGain(doc: Long, g: Int, c: Int): Int = fm(doc + 2 * g + 3 * c, 4)
  def sf(doc: Long, sfb: Int, g: Int, c: Int): Int = fm(doc + sfb + g + 2 * c, 4)
  /** is_pos for the intensity right channel, bands 3-20: only the
    * exactly-dyadic positions plus the 7 pass-through. */
  def isPos(doc: Long, sfb: Int, g: Int): Int =
    Array(0, 3, 6, 7)(fm(doc + sfb + g, 4))
  // region0 (pairs 0-5): values in {0, 1}
  def pairX(doc: Long, j: Int, g: Int, c: Int): Int = fm(doc + 3 * j + g + c, 2)
  def pairXSign(doc: Long, j: Int, g: Int): Int = fm(doc + j + g, 2)
  def pairY(doc: Long, j: Int, g: Int, c: Int): Int = fm(doc + 5 * j + 1 + 2 * g + c, 2)
  def pairYSign(doc: Long, j: Int, c: Int): Int = fm(doc + 7 * j + 3 + c, 2)
  // region1 (pairs 6-11): values in {0, 1, 8}; region2 (pairs 12-15):
  // values in {0, 1, 27} (27 = ESC symbol 15 + extension 12)
  private val V1 = Array(0, 1, 8)
  private val V2 = Array(0, 1, 27)
  def pairXBig(doc: Long, j: Int, g: Int, c: Int): Int =
    (if (j < 12) V1 else V2)(fm(doc + 3 * j + g + c, 3))
  def pairYBig(doc: Long, j: Int, g: Int, c: Int): Int =
    (if (j < 12) V1 else V2)(fm(doc + 5 * j + 1 + 2 * g + c, 3))
  def quadV(doc: Long, q: Int, s: Int, g: Int, c: Int): Int = fm(doc + q + s + g + 2 * c, 2)
  def quadSign(doc: Long, q: Int, s: Int, g: Int): Int = fm(doc + 3 * q + s + g, 2)
  /** Every 7th-mod-3 seed carries a REAL CRC-16 (protection bit 0). */
  def withCrc(doc: Long): Boolean = fm(doc, 7) == 3
  /** count1 table: A on even docs, B on odd. */
  def count1TableA(doc: Long): Boolean = fm(doc, 2) == 0
  // per-(doc, granule, channel) table selections
  private val S0 = Array(2, 3, 5, 6, 7, 8, 9, 10, 11, 12)
  private val S1 = Array(13, 15, 16)
  private val S2 = Array(19, 21, 24, 26)
  def table0(doc: Long, g: Int, c: Int): Int = S0(fm(doc + g + c, 10))
  def table1(doc: Long, g: Int, c: Int): Int = S1(fm(doc + 2 * g + c, 3))
  def table2(doc: Long, g: Int, c: Int): Int = S2(fm(doc + g + 2 * c, 4))

  val NPairs = 16
  val NQuads = 4

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

  /** Emit one (x, y) pair through a real Table B.7 code: the Huffman
    * symbol over min(v, 15), then per value the linbits escape
    * extension and the sign bit in the spec's order.
    */
  private def putPair(w: BitW, table: Int, x: Int, y: Int,
      xSign: Int, ySign: Int): Unit = {
    val data = Mp3HuffTables.dataFor(table)
    val dim = Mp3HuffTables.dimFor(table)
    val linbits = Mp3HuffTables.Linbits(table)
    val xs = math.min(x, 15)
    val ys = math.min(y, 15)
    val e = data(xs * dim + ys)
    w.put(e & 0xFFFFF, e >>> 20)
    if (xs == 15 && linbits > 0) w.put(x - 15, linbits)
    if (x != 0) w.put(xSign, 1)
    if (ys == 15 && linbits > 0) w.put(y - 15, linbits)
    if (y != 0) w.put(ySign, 1)
  }

  /** Main data of one granule/channel; returns (bits, payload).
    * `intensityRight` = the right channel of an intensity-stereo doc:
    * region0 lines only (the intensity bound then rounds to the sfb-3
    * boundary at line 12), no count1, is_pos scalefactors from band 3.
    */
  private def granuleData(doc: Long, g: Int, c: Int,
      intensityRight: Boolean): (Int, BitW) = {
    val w = new BitW
    // scalefactors: 21 long bands, slen1=4 (0-10), slen2=3 (11-20)
    var sfb = 0
    while (sfb < 21) {
      val v =
        if (intensityRight && sfb >= 3) isPos(doc, sfb, g)
        else sf(doc, sfb, g, c)
      w.put(v, if (sfb < 11) 4 else 3)
      sfb += 1
    }
    if (!silent(doc)) {
      val t0 = table0(doc, g, c)
      val t1 = table1(doc, g, c)
      val t2 = table2(doc, g, c)
      val nPairs = if (intensityRight) 6 else NPairs
      var j = 0
      while (j < nPairs) {
        if (j < 6) {
          putPair(w, t0, pairX(doc, j, g, c), pairY(doc, j, g, c),
            pairXSign(doc, j, g), pairYSign(doc, j, c))
        } else {
          putPair(w, if (j < 12) t1 else t2,
            pairXBig(doc, j, g, c), pairYBig(doc, j, g, c),
            pairXSign(doc, j, g), pairYSign(doc, j, c))
        }
        j += 1
      }
      if (!intensityRight) {
        val tblA = count1TableA(doc)
        var q = 0
        while (q < NQuads) {
          var value = 0
          var s = 0
          while (s < 4) { value = (value << 1) | quadV(doc, q, s, g, c); s += 1 }
          if (tblA) {
            val e = Mp3HuffTables.count1A(value)
            w.put(e & 0xFFFFF, e >>> 20)
          } else {
            w.put(15 - value, 4) // count1 table B: one's-complement codes
          }
          s = 0
          while (s < 4) {
            if (quadV(doc, q, s, g, c) != 0) w.put(quadSign(doc, q, s, g), 1)
            s += 1
          }
          q += 1
        }
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
    // INTENSITY joint (mode 1, ext 1) on doc%3==1, independent
    // stereo (mode 0) otherwise
    val isIntensity = intensity(doc)
    val (mode, modeExt) =
      if (nch == 1) (3, 0)
      else if (isSilent) (1, 2)
      else if (isIntensity) (1, 1)
      else (0, 0)
    fw.put((mode << 6) | (modeExt << 4), 8)
    // granule payloads first (side info needs part2_3_length)
    val data = Array.tabulate(2, nch)((g, c) =>
      granuleData(doc, g, c, isIntensity && c == 1))
    // side info
    fw.put(0, 9) // main_data_begin: no reservoir use
    fw.put(0, if (nch == 1) 5 else 3)
    var c = 0
    while (c < nch) { fw.put(0, 4); c += 1 } // scfsi
    var g = 0
    while (g < 2) {
      c = 0
      while (c < nch) {
        val intensityRight = isIntensity && c == 1
        val bits = data(g)(c)._1
        fw.put(bits, 12) // part2_3_length
        val bigValues =
          if (isSilent) 0 else if (intensityRight) 6 else NPairs
        fw.put(bigValues, 9)
        fw.put(210 + 4 * kGain(doc, g, c), 8)
        fw.put(15, 4) // scalefac_compress → slen 4/3
        fw.put(0, 1) // no window switching
        // three regions, three tables (zeros when silent)
        fw.put(if (isSilent) 0 else table0(doc, g, c), 5)
        fw.put(if (isSilent) 0 else table1(doc, g, c), 5)
        fw.put(if (isSilent) 0 else table2(doc, g, c), 5)
        fw.put(2, 4) // region0_count: bands 0-2 = lines 0-11
        fw.put(2, 3) // region1_count: through band 5 = lines 12-23
        fw.put(0, 1) // preflag
        fw.put(1, 1) // scalefac_scale → multiplier 1 (dyadic exponents)
        fw.put(if (count1TableA(doc)) 0 else 1, 1)
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
