package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Baseline TIFF pixel decode (TIFF 6.0, the archival/scan format every
  * document corpus yields): BOTH byte orders (`II`/`MM`), the IFD entry
  * walk with inline-vs-offset value resolution, multi-strip assembly
  * via StripOffsets/StripByteCounts/RowsPerStrip, and the two baseline
  * compressions — none (1) and PackBits (32773, the run-length coding
  * TIFF inherited from MacPaint). 8-bit grayscale (PhotometricInterp 1)
  * and 8-bit chunky RGB are decoded; anything else — palette, 16-bit,
  * LZW, planar, tiled — rejects to `'unknown'` honestly, and malformed
  * IFDs / torn strips / PackBits overruns reject rather than guess.
  */
object TiffCodec {

  private val MaxPixelBytes = 1 << 26

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  /** Endian-aware readers; `le` is decided by the header. */
  private def u16(b: Array[Byte], i: Int, le: Boolean): Int =
    if (le) u8(b, i) | (u8(b, i + 1) << 8)
    else (u8(b, i) << 8) | u8(b, i + 1)
  private def u32(b: Array[Byte], i: Int, le: Boolean): Long =
    if (le) u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
    else (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong

  private final class Entry(val typ: Int, val count: Long, val at: Int)

  def isTiff(b: Array[Byte]): Boolean =
    b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && u8(b, 2) == 0x2A && u8(b, 3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 0x2A))

  def decode(b: Array[Byte]): InternalRow = {
    val unknown = ImageDecode.unknownRow
    if (!isTiff(b)) return unknown
    val le = b(0) == 'I'
    val ifdOff = u32(b, 4, le)
    if (ifdOff < 8 || ifdOff + 2 > b.length) return unknown
    val nEntries = u16(b, ifdOff.toInt, le)
    if (ifdOff + 2 + 12L * nEntries > b.length) return unknown
    val entries = new java.util.HashMap[Integer, Entry]()
    var e = 0
    while (e < nEntries) {
      val off = (ifdOff + 2 + 12 * e).toInt
      val tag = u16(b, off, le)
      val typ = u16(b, off + 2, le)
      val count = u32(b, off + 4, le)
      entries.put(tag, new Entry(typ, count, off + 8))
      e += 1
    }
    // value reader: SHORT(3)=2 bytes, LONG(4)=4 bytes; arrays over 4
    // bytes live at the u32 offset in the value slot
    def values(en: Entry, maxN: Int): Array[Long] = {
      if (en == null) return null
      val sz = en.typ match {
        case 3 => 2
        case 4 => 4
        case _ => return null
      }
      if (en.count < 1 || en.count > maxN) return null
      val n = en.count.toInt
      val base =
        if (sz * n <= 4) en.at.toLong
        else u32(b, en.at, le)
      if (base < 0 || base + sz.toLong * n > b.length) return null
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (sz == 2) u16(b, (base + 2 * i).toInt, le)
          else u32(b, (base + 4 * i).toInt, le)
        i += 1
      }
      out
    }
    def one(tag: Int, default: Long = -1L): Long = {
      val v = values(entries.get(tag), 1)
      if (v == null) default else v(0)
    }

    val w = one(256)
    val h = one(257)
    if (w < 1 || h < 1 || w > 65535 || h > 65535) return unknown
    val compression = one(259, 1)
    if (compression != 1 && compression != 32773) return unknown
    val photometric = one(262)
    val spp = one(277, 1).toInt
    val ch =
      if (photometric == 1 && spp == 1) 1
      else if (photometric == 2 && spp == 3) 3
      else return unknown
    if (one(284, 1) != 1) return unknown // chunky only
    val bits = values(entries.get(258), 4)
    if (bits == null || bits.length < ch || bits.take(ch).exists(_ != 8))
      return unknown
    if (ch.toLong * w * h > MaxPixelBytes) return unknown
    val rowsPerStrip = one(278, h)
    if (rowsPerStrip < 1) return unknown
    val nStrips = ((h + rowsPerStrip - 1) / rowsPerStrip).toInt
    val offs = values(entries.get(273), nStrips)
    val counts = values(entries.get(279), nStrips)
    if (offs == null || counts == null || offs.length != nStrips ||
        counts.length != nStrips) return unknown

    val out = new Array[Byte]((ch * w * h).toInt)
    var strip = 0
    var dst = 0
    while (strip < nStrips) {
      val rows = math.min(rowsPerStrip, h - strip.toLong * rowsPerStrip)
      val need = (rows * w * ch).toInt
      val so = offs(strip)
      val sc = counts(strip)
      if (so < 0 || sc < 0 || so + sc > b.length) return unknown
      if (compression == 1) {
        if (sc != need) return unknown
        System.arraycopy(b, so.toInt, out, dst, need)
        dst += need
      } else {
        // PackBits (TIFF 6.0 §9): n in 0..127 -> copy n+1 literals;
        // n in -127..-1 -> repeat next byte 1-n times; -128 is a noop
        var src = so.toInt
        val end = (so + sc).toInt
        var got = 0
        while (got < need) {
          if (src >= end) return unknown
          val n = b(src)
          src += 1
          if (n >= 0) {
            val len = n + 1
            if (src + len > end || got + len > need) return unknown
            System.arraycopy(b, src, out, dst + got, len)
            src += len
            got += len
          } else if (n != -128) {
            val len = 1 - n
            if (src >= end || got + len > need) return unknown
            java.util.Arrays.fill(out, dst + got, dst + got + len, b(src))
            src += 1
            got += len
          }
        }
        dst += need
      }
      strip += 1
    }
    ImageDecode.rasterRow(ImageDecode.FmtTiff, w.toInt, h.toInt, ch, out)
  }
}

/** Fixture ENCODER for baseline TIFF: complete valid files in BOTH byte
  * orders, multi-strip (RowsPerStrip 4), uncompressed or really
  * PackBits-coded (a real run/literal packer, not pre-chunked output).
  * `mode`: 0 = II uncompressed RGB, 1 = MM uncompressed RGB (the
  * same pixels, so endianness bugs flip the hash), 2 = II PackBits
  * GRAYSCALE with alternating constant rows (runs) and varying rows
  * (literals), 3 = MM PackBits RGB. Pixels follow the shared generative
  * formulas, which is what the oracle replays.
  */
object TiffSynth {

  private def floorMod(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  /** RGB pixel formula (modes 0/1/3): channel c of pixel p is
    * `(seed·31 + (3p+c)·7) mod 256` — the shared raster fixture formula.
    */
  def rgbAt(seed: Long, p: Long, c: Int): Int = floorMod(seed * 31 + (3 * p + c) * 7, 256)

  /** Gray formula (mode 2): even rows constant `(seed·31 + y·13) mod
    * 256` (PackBits runs), odd rows vary per pixel (literals).
    */
  def grayAt(seed: Long, w: Long, x: Long, y: Long): Int =
    if (y % 2 == 0) floorMod(seed * 31 + y * 13, 256)
    else floorMod(seed * 31 + (y * w + x) * 7, 256)

  /** Real PackBits packer: maximal runs (≥3 repeats) as repeat packets,
    * everything else as literal packets of up to 128 bytes.
    */
  private def packBits(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < row.length) {
      var run = 1
      while (i + run < row.length && row(i + run) == row(i) && run < 128) run += 1
      if (run >= 3) {
        out.write(1 - run) // -(run-1) as signed byte
        out.write(row(i))
        i += run
      } else {
        var lit = i + run
        // extend the literal until a ≥3-run starts or 128 bytes
        var done = false
        while (!done && lit < row.length && lit - i < 128) {
          var r2 = 1
          while (lit + r2 < row.length && row(lit + r2) == row(lit) && r2 < 3) r2 += 1
          if (r2 >= 3) done = true else lit += r2
        }
        if (lit - i > 128) lit = i + 128
        out.write(lit - i - 1)
        out.write(row, i, lit - i)
        i = lit
      }
    }
    out.toByteArray
  }

  def tiffBytes(wL: Long, hL: Long, seed: Long, mode: Int): Array[Byte] = {
    if (wL < 1 || hL < 1 || wL > 1024 || hL > 1024) return null
    val w = wL.toInt; val h = hL.toInt
    val le = mode == 0 || mode == 2
    val gray = mode == 2
    val packed = mode == 2 || mode == 3
    val ch = if (gray) 1 else 3
    val rowsPerStrip = 4
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    // raw pixel bytes
    val raw = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (gray) raw(y * w + x) = grayAt(seed, w, x, y).toByte
        else {
          val p = y.toLong * w + x
          var c = 0
          while (c < 3) {
            raw((y * w + x) * 3 + c) = rgbAt(seed, p, c).toByte
            c += 1
          }
        }
        x += 1
      }
      y += 1
    }
    // strips
    val strips = new Array[Array[Byte]](nStrips)
    var s = 0
    while (s < nStrips) {
      val r0 = s * rowsPerStrip
      val rows = math.min(rowsPerStrip, h - r0)
      val seg = java.util.Arrays.copyOfRange(raw, r0 * w * ch,
        (r0 + rows) * w * ch)
      strips(s) = if (packed) packBits(seg) else seg
      s += 1
    }

    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      else { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def w32(v: Long): Unit =
      if (le) {
        out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
        out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
      } else {
        out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
        out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
      }
    // header
    if (le) { out.write('I'); out.write('I'); w16(42) }
    else { out.write('M'); out.write('M'); w16(42) }
    w32(8) // IFD at offset 8
    val nEntries = if (gray) 9 else 10
    val ifdSize = 2 + 12 * nEntries + 4
    // layout after IFD: [bits array if rgb: 6 bytes] [strip offsets 4n]
    // [strip counts 4n] [strip data...]
    var cursor = 8L + ifdSize
    val bitsOff = cursor
    if (!gray) cursor += 6
    val needOffArrays = nStrips > 1
    val offArrAt = cursor
    if (needOffArrays) cursor += 4L * nStrips
    val cntArrAt = cursor
    if (needOffArrays) cursor += 4L * nStrips
    val stripOffs = new Array[Long](nStrips)
    s = 0
    while (s < nStrips) { stripOffs(s) = cursor; cursor += strips(s).length; s += 1 }

    w16(nEntries)
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(tag); w16(typ); w32(count)
      if (typ == 3 && count == 1) {
        // SHORT value packs into the upper half of the slot
        w16(value.toInt); w16(0)
      } else w32(value)
    }
    entry(256, 4, 1, w)  // ImageWidth
    entry(257, 4, 1, h)  // ImageLength
    if (gray) entry(258, 3, 1, 8)
    else entry(258, 3, 3, bitsOff) // BitsPerSample array at offset
    entry(259, 3, 1, if (packed) 32773 else 1)
    entry(262, 3, 1, if (gray) 1 else 2)
    if (nStrips == 1) entry(273, 4, 1, stripOffs(0))
    else entry(273, 4, nStrips, offArrAt)
    if (!gray) entry(277, 3, 1, 3)
    entry(278, 4, 1, rowsPerStrip)
    if (nStrips == 1) entry(279, 4, 1, strips(0).length)
    else entry(279, 4, nStrips, cntArrAt)
    entry(284, 3, 1, 1)
    w32(0) // no next IFD
    if (!gray) { w16(8); w16(8); w16(8) }
    if (needOffArrays) {
      s = 0
      while (s < nStrips) { w32(stripOffs(s)); s += 1 }
      s = 0
      while (s < nStrips) { w32(strips(s).length); s += 1 }
    }
    s = 0
    while (s < nStrips) { out.write(strips(s), 0, strips(s).length); s += 1 }
    out.toByteArray
  }
}

/** Codegen-friendly expression wrapping [[TiffSynth.tiffBytes]]. */
case class SynthTiff(first: Expression, second: Expression, third: Expression,
    mode: Int)
    extends TernaryExpression with ImplicitCastInputTypes {

  require(mode >= 0 && mode <= 3,
    s"synth_tiff mode must be 0-3 (II/MM x none/PackBits); got $mode")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(w: Any, h: Any, seed: Any): Any =
    TiffSynth.tiffBytes(w.asInstanceOf[Long], h.asInstanceOf[Long],
      seed.asInstanceOf[Long], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h, s) => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.TiffSynth.tiffBytes($w, $h, $s, $mode);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TiffFunctions {
  /** Column API: complete valid baseline TIFF from `(w, h, seed)`. */
  def synth_tiff(w: Column, h: Column, seed: Column, mode: Int): Column =
    ExpressionUtils.column(SynthTiff(ExpressionUtils.expression(w),
      ExpressionUtils.expression(h), ExpressionUtils.expression(seed), mode))
}
