package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** Lossy-WebP (VP8 key frame, RFC 6386) codec contracts: the fixture
  * encoder really arithmetic-codes; the decoder must invert the bool
  * coder, token trees, dequant, IDCT/WHT, and intra prediction exactly.
  * Lives in the graftnative package to reach the codec internals
  * (BoolDec/BoolEnc, the transforms) directly.
  */
class Vp8Spec extends AnyFunSuite {

  private def decode(b: Array[Byte]) = ImageDecode.compute(b)

  private def fmt(r: org.apache.spark.sql.catalyst.InternalRow): String =
    r.getUTF8String(0).toString

  /** Expected pixel RGB for the fixture: luma target + chroma shift. */
  private def expected(seed: Long, w: Int, mode: Int,
      x: Int, y: Int): (Int, Int, Int) = {
    val mbW = (w + 15) >> 4
    val n =
      if (mode == 0) (y / 4).toLong * (mbW * 4) + x / 4
      else (y / 16).toLong * mbW + x / 16
    val c = Vp8Synth.lumaTarget(seed, n)
    val v = java.lang.Math.floorMod(seed, 4).toInt
    val (_, _, sr, sg, sb) = JpegSynth.ChromaVariants(v)
    (c + sr, c + sg, c + sb)
  }

  private def checkRoundtrip(w: Int, h: Int, seed: Long, mode: Int): Unit = {
    val bytes = Vp8Synth.vp8Bytes(w, h, seed, mode)
    assert(bytes != null, s"synth rejected ($w x $h seed=$seed mode=$mode)")
    val r = decode(bytes)
    assert(fmt(r) == "webp", s"decode rejected ($w x $h seed=$seed mode=$mode)")
    assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == 3)
    val px = r.getBinary(4)
    var bad = 0
    var firstBad = ""
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (er, eg, eb) = expected(seed, w, mode, x, y)
        val d = (y * w + x) * 3
        val gr = px(d) & 0xFF; val gg = px(d + 1) & 0xFF; val gb = px(d + 2) & 0xFF
        if (gr != er || gg != eg || gb != eb) {
          bad += 1
          if (bad == 1) firstBad = s"($x,$y): got ($gr,$gg,$gb) want ($er,$eg,$eb)"
        }
        x += 1
      }
      y += 1
    }
    assert(bad == 0, s"$bad wrong pixels in $w x $h seed=$seed mode=$mode; first $firstBad")
  }

  test("B_PRED frames (mode 0) roundtrip exactly at several dims/seeds") {
    for (seed <- 0L to 7L) checkRoundtrip(16, 16, seed, 0)
    for (seed <- 0L to 3L) {
      checkRoundtrip(32, 16, seed, 0)
      checkRoundtrip(16, 32, seed, 0)
      checkRoundtrip(48, 32, seed, 0)
    }
  }

  test("16x16-mode frames (mode 1, Y2/WHT path) roundtrip exactly") {
    for (seed <- 0L to 7L) checkRoundtrip(16, 16, seed, 1)
    for (seed <- 0L to 3L) {
      checkRoundtrip(32, 16, seed, 1)
      checkRoundtrip(16, 32, seed, 1)
      checkRoundtrip(48, 32, seed, 1)
      checkRoundtrip(64, 48, seed, 1)
    }
  }

  test("non-MB-aligned dims crop correctly") {
    // targets are defined on the padded MB grid; the visible crop must
    // still match the formula at every retained pixel
    checkRoundtrip(20, 12, 5L, 0)
    checkRoundtrip(33, 17, 6L, 1)
    checkRoundtrip(17, 31, 7L, 0)
  }

  test("reject matrix: interframe, bad start code, version > 3, torn stream") {
    val ok = Vp8Synth.vp8Bytes(16, 16, 1L, 0)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = ok.clone(); f(c); c
    }
    // payload starts at RIFF(12) + chunk header(8) = offset 20
    val p = 20
    assert(fmt(decode(mut(b => b(p) = (b(p) | 1).toByte))) == "unknown", "interframe bit")
    assert(fmt(decode(mut(b => b(p) = (b(p) | 0x0E).toByte))) == "unknown", "version 7")
    assert(fmt(decode(mut(b => b(p + 3) = 0x9C.toByte))) == "unknown", "bad start code")
    assert(fmt(decode(ok.take(ok.length / 2))) == "unknown", "torn container")
    assert(fmt(decode(ok.take(24))) == "unknown", "tag only")
  }

  test("bool encoder/decoder roundtrip on random bit/prob streams") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 20) {
      val n = 500 + rnd.nextInt(1500)
      val probs = Array.fill(n)(1 + rnd.nextInt(254))
      val bits = Array.fill(n)(rnd.nextBoolean())
      val e = new Vp8Synth.BoolEnc
      var i = 0
      while (i < n) { e.bool(probs(i), bits(i)); i += 1 }
      val buf = e.finish()
      val d = new Vp8Codec.BoolDec(buf, 0, buf.length)
      i = 0
      while (i < n) {
        assert(d.bit(probs(i)) == (if (bits(i)) 1 else 0), s"bit $i of $n")
        i += 1
      }
      assert(d.overread == 0)
    }
  }

  test("IDCT: DC-only block reconstructs (dc+4)>>3 everywhere; WHT DC spreads (d+3)>>3") {
    val in = new Array[Int](16)
    val out = new Array[Int](16)
    for (dc <- Seq(-100, -9, 0, 7, 200, 1600)) {
      java.util.Arrays.fill(in, 0)
      in(0) = dc
      Vp8Codec.idct4x4(in, out)
      assert(out.forall(_ == (dc + 4) >> 3), s"idct dc=$dc")
      Vp8Codec.iwht4x4(in, out)
      assert(out.forall(_ == (dc + 3) >> 3), s"wht dc=$dc")
    }
  }

  test("IDCT golden: a known mixed block against the RFC butterflies") {
    val in = new Array[Int](16)
    in(0) = 8; in(1) = 4; in(4) = -4
    val out = new Array[Int](16)
    Vp8Codec.idct4x4(in, out)
    // independently computed from the RFC 20091/35468 fixed-point
    // butterflies (column then row pass, +4 >> 3)
    val c1 = 20091; val c2 = 35468
    def pass(i0: Int, i1: Int, i2: Int, i3: Int): Array[Int] = {
      val a1 = i0 + i2; val b1 = i0 - i2
      val cc = ((i1 * c2) >> 16) - (i3 + ((i3 * c1) >> 16))
      val dd = (i1 + ((i1 * c1) >> 16)) + ((i3 * c2) >> 16)
      Array(a1 + dd, b1 + cc, b1 - cc, a1 - dd)
    }
    val cols = (0 until 4).map(c => pass(in(c), in(4 + c), in(8 + c), in(12 + c)))
    var y = 0
    while (y < 4) {
      val r = pass(cols(0)(y), cols(1)(y), cols(2)(y), cols(3)(y))
      var x = 0
      while (x < 4) {
        assert(out(y * 4 + x) == (r(x) + 4) >> 3, s"pixel ($x,$y)")
        x += 1
      }
      y += 1
    }
  }
}

/** Hand-derived golden pins for the VP8 paths the generative fixture
  * does not reach: the eight remaining B_PRED modes, skip flags,
  * multiple token partitions, segmentation, non-zero quantizer
  * indices, and the loop filter (mask gate, normal taps, simple taps).
  */
class Vp8GoldenSpec extends AnyFunSuite {
  import Vp8Tables._

  private def decode(b: Array[Byte]) = ImageDecode.compute(b)
  private def fmt(r: org.apache.spark.sql.catalyst.InternalRow): String =
    r.getUTF8String(0).toString
  private def lum(r: org.apache.spark.sql.catalyst.InternalRow, w: Int,
      x: Int, y: Int): Int = {
    val px = r.getBinary(4)
    val d = (y * w + x) * 3
    val rr = px(d) & 0xFF
    assert((px(d + 1) & 0xFF) == rr && (px(d + 2) & 0xFF) == rr,
      s"expected gray pixel at ($x,$y)")
    rr
  }

  /** One 16x16 B_PRED frame, every subblock in `bmode`, zero residual.
    * Block (0,0) then predicts purely from the synthetic borders
    * (above = 127, left = 129, corner = 127), so its 16 pixels follow
    * from the RFC 6386 §12.3 formulas by hand.
    */
  private def bmodeFrame(bmode: Int, skip: Boolean = false,
      mbNoSkip: Boolean = false): Array[Byte] =
    Vp8TestBuilder.buildTestFrame(16, 16,
      Array(Vp8TestMb(ymode = BPred, bmode = bmode, skip = skip)),
      Vp8TestOpts(mbNoSkip = mbNoSkip))

  private def checkBlock00(bmode: Int, expected: Array[Int]): Unit = {
    val r = decode(bmodeFrame(bmode))
    assert(fmt(r) == "webp", s"bmode $bmode rejected")
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) {
        assert(lum(r, 16, x, y) == expected(y * 4 + x),
          s"bmode $bmode pixel ($x,$y)")
        x += 1
      }
      y += 1
    }
  }

  private def const16(v: Int) = Array.fill(16)(v)

  test("B_DC/B_TM/B_VE/B_HE/B_LD/B_VL/B_HU golden: border-only block (0,0)") {
    // above = 127(x8), left = 129(x4), corner = 127 (RFC synthetic edges)
    checkBlock00(BDc, const16(128)) // (4*127 + 4*129 + 4) >> 3
    checkBlock00(BTm, const16(129)) // clamp(129 + 127 - 127)
    checkBlock00(BVe, const16(127)) // avg3 over all-127 above
    checkBlock00(BHe, const16(129)) // avg3(127,129,129) = 129, rest 129
    checkBlock00(BLd, const16(127)) // avg3 over all-127 above+right
    checkBlock00(BVl, const16(127))
    checkBlock00(BHu, const16(129))
  }

  test("B_RD golden: 128 on the diagonal, 127 above it, 129 below it") {
    checkBlock00(BRd, Array(
      128, 127, 127, 127,
      129, 128, 127, 127,
      129, 129, 128, 127,
      129, 129, 129, 128))
  }

  test("B_VR golden") {
    checkBlock00(BVr, Array(
      127, 127, 127, 127,
      128, 127, 127, 127,
      129, 127, 127, 127,
      129, 128, 127, 127))
  }

  test("B_HD golden") {
    checkBlock00(BHd, Array(
      128, 128, 127, 127,
      129, 129, 128, 128,
      129, 129, 129, 129,
      129, 129, 129, 129))
  }

  test("skip flag: a skipped MB decodes identically to explicit empty blocks") {
    for (bm <- Seq(BDc, BTm, BRd)) {
      val a = decode(bmodeFrame(bm))
      val b = decode(bmodeFrame(bm, skip = true, mbNoSkip = true))
      val c = decode(bmodeFrame(bm, skip = false, mbNoSkip = true))
      assert(fmt(a) == "webp" && fmt(b) == "webp" && fmt(c) == "webp")
      assert(java.util.Arrays.equals(a.getBinary(4), b.getBinary(4)), s"skip bm=$bm")
      assert(java.util.Arrays.equals(a.getBinary(4), c.getBinary(4)), s"noskip-flag bm=$bm")
    }
  }

  test("token partitions: 2 and 4 partitions decode identically to 1") {
    def frame(log2: Int): Array[Byte] = {
      val mbs = (0 until 2 * 4).map { i =>
        Vp8TestMb(ymode = DcPred, kY2 = 10 + 7 * i, kUV = 3)
      }.toArray
      Vp8TestBuilder.buildTestFrame(64, 32, mbs,
        Vp8TestOpts(nPartsLog2 = log2))
    }
    val one = decode(frame(0))
    assert(fmt(one) == "webp")
    for (l <- Seq(1, 2)) {
      val multi = decode(frame(l))
      assert(fmt(multi) == "webp", s"log2=$l rejected")
      assert(java.util.Arrays.equals(one.getBinary(4), multi.getBinary(4)),
        s"log2=$l differs")
    }
  }

  test("segmentation: per-segment absolute quantizers dequantize separately") {
    // MB0 seg0 qi=0 (y2dc = 8): kY2 = 10 -> wht dc 10, residual 1/px.
    // MB1 seg1 qi=4 (DcQ(4) = 8, y2dc = 16): kY2 = 10 -> dc 20, residual 3/px.
    val mbs = Array(
      Vp8TestMb(ymode = DcPred, segment = 0, kY2 = 10),
      Vp8TestMb(ymode = DcPred, segment = 1, kY2 = 10))
    val bytes = Vp8TestBuilder.buildTestFrame(32, 16, mbs,
      Vp8TestOpts(segEnabled = true, segAbsolute = true,
        segQuant = Array(0, 4, 0, 0)))
    val r = decode(bytes)
    assert(fmt(r) == "webp")
    // MB0: DC pred with no neighbors = 128, +1 = 129
    assert(lum(r, 32, 0, 0) == 129 && lum(r, 32, 15, 15) == 129)
    // MB1: DC pred from left column (all 129) = 129, +3 = 132
    assert(lum(r, 32, 16, 0) == 132 && lum(r, 32, 31, 15) == 132)
  }

  test("non-zero quantizer index: DcQ(20) = 21 drives the residual") {
    // B_PRED B_DC block (0,0): pred = 128; K=1 at qi 20 -> dc 21,
    // residual (21+4)>>3 = 3 -> 131
    val mbs = Array(Vp8TestMb(ymode = BPred, bmode = BDc,
      kY = Array.fill(16)(1)))
    val r = decode(Vp8TestBuilder.buildTestFrame(16, 16, mbs,
      Vp8TestOpts(qIndex = 20)))
    assert(fmt(r) == "webp")
    assert(lum(r, 16, 0, 0) == 131 && lum(r, 16, 3, 3) == 131)
  }

  /** Two-MB frame: MB0 constant 129, MB1 constant (129 + d) via Y2. */
  private def edgeFrame(kY2b: Int, level: Int, simple: Boolean): Array[Byte] =
    Vp8TestBuilder.buildTestFrame(32, 16,
      Array(Vp8TestMb(ymode = DcPred, kY2 = 10),
        Vp8TestMb(ymode = DcPred, kY2 = kY2b)),
      Vp8TestOpts(filterLevel = level, simpleFilter = simple))

  test("loop filter mask gate: a 17-step edge at level 10 is left alone") {
    // MB1: kY2 = 132 -> residual 17/px -> constant 146; edge delta 17:
    // 2*17 + 17/2 = 42 > mb_edge_limit 34 -> mask rejects, no filtering
    val unf = decode(edgeFrame(132, 0, simple = false))
    val fil = decode(edgeFrame(132, 10, simple = false))
    assert(fmt(unf) == "webp" && fmt(fil) == "webp")
    assert(java.util.Arrays.equals(unf.getBinary(4), fil.getBinary(4)))
  }

  test("normal loop filter golden: an 8-step MB edge at level 10") {
    // MB0 = 129, MB1 = 137 (kY2 = 66 -> residual 8/px).
    // w = clamp(clamp(129-137) + 3*(137-129)) = 16, hev false ->
    // taps (27w+63)>>7 = 3, (18w+63)>>7 = 2, (9w+63)>>7 = 1:
    // cols 13..18 become 130,131,132 | 134,135,136
    val r = decode(edgeFrame(66, 10, simple = false))
    assert(fmt(r) == "webp")
    val expect = Map(12 -> 129, 13 -> 130, 14 -> 131, 15 -> 132,
      16 -> 134, 17 -> 135, 18 -> 136, 19 -> 137, 20 -> 137)
    for (y <- Seq(0, 7, 15); (x, v) <- expect)
      assert(lum(r, 32, x, y) == v, s"col $x row $y")
  }

  test("coefficient probability updates: header-updated probs drive token decode") {
    // update a handful of probs the fixture's tokens actually consult
    // (type 1 band 0, type 0 band 1, type 2 band 0 / band 1); the
    // builder then codes tokens against the UPDATED table, so a decoder
    // that ignores the update flags (or misreads the 8-bit values)
    // desynchronizes immediately
    val updates = Array(
      ((1 * 8 + 0) * 3 + 0) * 11 + 0 -> 30,
      ((1 * 8 + 0) * 3 + 0) * 11 + 1 -> 200,
      ((0 * 8 + 1) * 3 + 0) * 11 + 0 -> 77,
      ((2 * 8 + 0) * 3 + 0) * 11 + 2 -> 250,
      ((2 * 8 + 1) * 3 + 1) * 11 + 0 -> 5)
    def frame(upd: Array[(Int, Int)]): Array[Byte] = {
      val mbs = (0 until 2).map(i =>
        Vp8TestMb(ymode = DcPred, kY2 = 10 + 56 * i, kUV = 3)).toArray
      Vp8TestBuilder.buildTestFrame(32, 16, mbs,
        Vp8TestOpts(probUpdates = upd))
    }
    val base = decode(frame(Array.empty))
    val upd = decode(frame(updates))
    assert(fmt(base) == "webp" && fmt(upd) == "webp")
    // identical content coded under two probability tables must decode
    // to identical pixels
    assert(java.util.Arrays.equals(base.getBinary(4), upd.getBinary(4)))
  }

  test("VP8X extended container with a leading ALPH chunk still routes to the frame") {
    val plain = Vp8Synth.vp8Bytes(16, 16, 3L, 0)
    // unwrap the bare VP8 chunk payload from the plain container
    val chunkLen = (plain(16) & 0xFF) | ((plain(17) & 0xFF) << 8) |
      ((plain(18) & 0xFF) << 16) | ((plain(19) & 0xFF) << 24)
    val frame = java.util.Arrays.copyOfRange(plain, 20, 20 + chunkLen)
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = s.foreach(c => out.write(c))
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    val alph = Array.tabulate[Byte](7)(i => i.toByte)
    val vp8xBody = 10 + 8 + alph.length + 1 + 8 + frame.length + (frame.length & 1)
    ascii("RIFF"); le32(4 + vp8xBody); ascii("WEBP")
    ascii("VP8X"); le32(10)
    out.write(0x10) // alpha-flag byte
    out.write(0); out.write(0); out.write(0)
    out.write(15); out.write(0); out.write(0) // canvas w-1 (u24)
    out.write(15); out.write(0); out.write(0) // canvas h-1 (u24)
    ascii("ALPH"); le32(alph.length)
    out.write(alph, 0, alph.length); out.write(0) // odd-size pad
    ascii("VP8 "); le32(frame.length)
    out.write(frame, 0, frame.length)
    if ((frame.length & 1) == 1) out.write(0)
    val r = decode(out.toByteArray)
    assert(fmt(r) == "webp", "VP8X/ALPH wrapper rejected")
    val p = decode(plain)
    assert(java.util.Arrays.equals(r.getBinary(4), p.getBinary(4)))
  }

  test("AC coefficients: ZERO runs, the EOB-after-zero rule, and band mapping") {
    // block (0,0) carries a full scan-order level pattern — DC, explicit
    // ZERO tokens inside the run (so the next read starts at tree node
    // 2), context transitions through 0/1/2, and a band-7 coefficient at
    // the last position (no EOB emitted). Expected pixels are computed
    // through the already-pinned IDCT: layered verification of the
    // token/dequant/zigzag stage given the transform stage.
    val levels0 = Array(3, 0, -1, 2, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 4)
    val yl = Array.fill(16)(new Array[Int](16))
    yl(0) = levels0
    val bytes = Vp8TestBuilder.buildTestFrame(16, 16,
      Array(Vp8TestMb(ymode = BPred, bmode = BDc, kUV = 3, yLevels = yl)),
      Vp8TestOpts())
    val r = decode(bytes)
    assert(fmt(r) == "webp")
    val px = r.getBinary(4)
    // expected block (0,0): pred 128 + idct(dequant(levels)); qi=0 so
    // y1dc = y1ac = 4
    val zig = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
    val coeffs = new Array[Int](16)
    for (n <- 0 until 16) coeffs(zig(n)) = levels0(n) * 4
    val resid = new Array[Int](16)
    Vp8Codec.idct4x4(coeffs, resid)
    // chroma: kUV=3 -> all chroma 128 + (3*4+4>>3) = 130 -> cb=cr=2 ->
    // JFIF rounds to (y+3, y-2, y+4)
    for (y <- 0 until 4; x <- 0 until 4) {
      val lum = math.max(0, math.min(255, 128 + resid(y * 4 + x)))
      val d = (y * 16 + x) * 3
      assert((px(d) & 0xFF) == lum + 3, s"r at ($x,$y)")
      assert((px(d + 1) & 0xFF) == lum - 2, s"g at ($x,$y)")
      assert((px(d + 2) & 0xFF) == lum + 4, s"b at ($x,$y)")
    }
    // token desync anywhere in the luma stream would corrupt the chroma
    // blocks decoded after it: the shift relation must hold frame-wide
    for (y <- 0 until 16; x <- 0 until 16) {
      val d = (y * 16 + x) * 3
      assert((px(d) & 0xFF) - (px(d + 1) & 0xFF) == 5, s"r-g at ($x,$y)")
      assert((px(d + 2) & 0xFF) - (px(d + 1) & 0xFF) == 6, s"b-g at ($x,$y)")
    }
  }

  test("animated WebP (ANMF): the first frame decodes, lossy and lossless") {
    def animWrap(plain: Array[Byte]): Array[Byte] = {
      // unwrap the bare frame chunk (VP8 or VP8L) from the plain container
      val tag = new String(plain, 12, 4, "US-ASCII")
      val chunkLen = (plain(16) & 0xFF) | ((plain(17) & 0xFF) << 8) |
        ((plain(18) & 0xFF) << 16) | ((plain(19) & 0xFF) << 24)
      val frame = java.util.Arrays.copyOfRange(plain, 20, 20 + chunkLen)
      val out = new java.io.ByteArrayOutputStream()
      def ascii(s: String): Unit = s.foreach(c => out.write(c))
      def le32(v: Int): Unit = {
        out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
        out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
      }
      def u24(v: Int): Unit = {
        out.write(v & 0xFF); out.write((v >> 8) & 0xFF); out.write((v >> 16) & 0xFF)
      }
      val anmfBody = 16 + 8 + frame.length + (frame.length & 1)
      val total = 4 + (8 + 10) + (8 + 6) + (8 + anmfBody)
      ascii("RIFF"); le32(total); ascii("WEBP")
      ascii("VP8X"); le32(10)
      out.write(0x02); out.write(0); out.write(0); out.write(0) // ANIM flag
      u24(15); u24(15) // canvas w-1, h-1
      ascii("ANIM"); le32(6)
      le32(0); out.write(0); out.write(0) // bg color, loop count
      ascii("ANMF"); le32(anmfBody)
      u24(0); u24(0)   // frame x/2, y/2
      u24(15); u24(15) // frame w-1, h-1
      u24(40)          // duration
      out.write(0)     // flags
      ascii(tag); le32(frame.length)
      out.write(frame, 0, frame.length)
      if ((frame.length & 1) == 1) out.write(0)
      out.toByteArray
    }
    val lossy = Vp8Synth.vp8Bytes(16, 16, 5L, 1)
    val rL = decode(animWrap(lossy))
    assert(fmt(rL) == "webp", "animated lossy first frame rejected")
    assert(java.util.Arrays.equals(rL.getBinary(4), decode(lossy).getBinary(4)))
    val lossless = WebpSynth.webpBytes(16, 16, 5L)
    if (lossless != null) {
      val rV = decode(animWrap(lossless))
      assert(fmt(rV) == "webp", "animated lossless first frame rejected")
      assert(java.util.Arrays.equals(rV.getBinary(4), decode(lossless).getBinary(4)))
    }
  }

  test("fuzz robustness: random single-byte mutations never throw") {
    val rnd = new scala.util.Random(7)
    val base = Vp8Synth.vp8Bytes(32, 32, 9L, 1)
    var rejected = 0
    for (_ <- 0 until 300) {
      val c = base.clone()
      val i = rnd.nextInt(c.length)
      c(i) = (rnd.nextInt(256)).toByte
      val r = decode(c) // must terminate and never throw
      if (fmt(r) == "unknown") rejected += 1
    }
    assert(rejected > 0, "some mutations should reject")
  }

  test("RFC 6386 probability tables: pinned length/sum/FNV-1a digests") {
    // The three large spec tables are exercised only through
    // encoder/decoder roundtrips against the SAME arrays, so an
    // accidental edit (or a bad merge) would pass every roundtrip
    // gate. These digests pin the transcription that was spot-checked
    // row-by-row against RFC 6386 §13.4/§11.5/§13.5; any future drift
    // of a single entry flips the FNV hash.
    def fnv(a: Array[Int]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < a.length) { h = (h ^ (a(i) & 0xFF)) * 0x100000001b3L; i += 1 }
      h
    }
    import org.apache.spark.sql.graftnative.Vp8Tables._
    assert(CoeffUpdateProbs.length == 1056 && CoeffUpdateProbs.sum == 268469 &&
      fnv(CoeffUpdateProbs) == 2953479712176751804L)
    assert(KfBModeProbs.length == 900 && KfBModeProbs.sum == 77557 &&
      fnv(KfBModeProbs) == -356240400359699780L)
    assert(DefaultCoeffProbs.length == 1056 && DefaultCoeffProbs.sum == 174918 &&
      fnv(DefaultCoeffProbs) == 3428204052837526043L)
  }

  test("simple loop filter golden: only p0/q0 move") {
    // same edge; simple filter: f = 16 -> p0 += (16+3)>>3 = 2,
    // q0 -= (16+4)>>3 = 2; all other columns untouched
    val r = decode(edgeFrame(66, 10, simple = true))
    assert(fmt(r) == "webp")
    val expect = Map(13 -> 129, 14 -> 129, 15 -> 131,
      16 -> 135, 17 -> 137, 18 -> 137)
    for (y <- Seq(0, 15); (x, v) <- expect)
      assert(lum(r, 32, x, y) == v, s"col $x row $y")
  }
}
