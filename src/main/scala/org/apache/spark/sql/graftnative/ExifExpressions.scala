package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** EXIF orientation — the one metadata field a training-data image
  * pipeline MUST honor before any geometry-sensitive step (crops,
  * aspect filters, perceptual hashes all change under rotation).
  * [[ExifOrientation]] walks the JPEG marker stream to the APP1
  * `Exif\0\0` segment and reads tag 0x0112 from IFD0 through a real
  * mini-TIFF walk (both byte orders, inline SHORT slot layout);
  * [[RasterOrient]] applies the 1-8 value to a decoded raster — the
  * four flips and four transposes as exact index remaps (dims swap for
  * 5-8), so downstream NN resizes and hashes see the DISPLAYED image.
  * Orientation values outside 1-8, missing APP1, or torn segments
  * yield null / identity, never a guess.
  */
case class ExifOrientation(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val r = ExifOrientation.compute(v.asInstanceOf[Array[Byte]])
    if (r == null) null else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Integer graftExifO = org.apache.spark.sql.graftnative.ExifOrientation.compute($c);
      if (graftExifO == null) { ${ev.isNull} = true; }
      else { ${ev.value} = graftExifO.intValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExifOrientation {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u16(b: Array[Byte], i: Int, le: Boolean): Int =
    if (le) u8(b, i) | (u8(b, i + 1) << 8) else (u8(b, i) << 8) | u8(b, i + 1)
  private def u32(b: Array[Byte], i: Int, le: Boolean): Long =
    if (le) u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
    else (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong

  def compute(b: Array[Byte]): java.lang.Integer = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return null
    var i = 2
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xFF) return null
      val marker = u8(b, i + 1)
      if (marker == 0xD9 || marker == 0xDA) return null // EOI / SOS: no EXIF
      val len = (u8(b, i + 2) << 8) | u8(b, i + 3)
      if (len < 2 || i + 2 + len > b.length) return null
      if (marker == 0xE1 && len >= 16 &&
          b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
          b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) {
        val t = i + 10 // TIFF header start
        val end = i + 2 + len
        if (t + 8 > end) return null
        val le =
          if (b(t) == 'I' && b(t + 1) == 'I') true
          else if (b(t) == 'M' && b(t + 1) == 'M') false
          else return null
        if (u16(b, t + 2, le) != 42) return null
        val ifd = u32(b, t + 4, le)
        val io = t + ifd
        if (ifd < 8 || io + 2 > end) return null
        val n = u16(b, io.toInt, le)
        if (io + 2 + 12L * n > end) return null
        var e = 0
        while (e < n) {
          val off = (io + 2 + 12 * e).toInt
          if (u16(b, off, le) == 0x0112 && u16(b, off + 2, le) == 3 &&
              u32(b, off + 4, le) == 1) {
            val v = u16(b, off + 8, le)
            return if (v >= 1 && v <= 8) java.lang.Integer.valueOf(v) else null
          }
          e += 1
        }
        return null
      }
      i += 2 + len
    }
    null
  }
}

/** Apply an EXIF orientation (1-8) to a decoded raster: exact index
  * remaps — identity, horizontal/vertical flips, 180° rotation, and the
  * four transposed forms (dims swap). Null or out-of-range orientation
  * passes the raster through unchanged; an `'unknown'` raster passes
  * through too.
  */
case class RasterOrient(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == ImageDecode.schema &&
        right.dataType.isInstanceOf[IntegerType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"raster_orient expects (image_decode struct, int), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = ImageDecode.schema

  override def nullSafeEval(r: Any, o: Any): Any =
    RasterOrient.compute(r.asInstanceOf[InternalRow], o.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, o) =>
      s"org.apache.spark.sql.graftnative.RasterOrient.compute($r, $o)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object RasterOrient {
  /** Displayed pixel (x, y) of an oriented raster maps to stored
    * (sx, sy); orientations 5-8 swap the output dims.
    */
  def compute(r: InternalRow, o: Int): InternalRow = {
    if (r.isNullAt(1) || o <= 1 || o > 8) return r
    val w = r.getInt(1); val h = r.getInt(2); val ch = r.getInt(3)
    val px = r.getBinary(4)
    val swap = o >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new Array[Byte](px.length)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val sx = o match {
          case 2 => w - 1 - x
          case 3 => w - 1 - x
          case 4 => x
          case 5 => y
          case 6 => y
          case 7 => w - 1 - y
          case _ => w - 1 - y // 8
        }
        val sy = o match {
          case 2 => y
          case 3 => h - 1 - y
          case 4 => h - 1 - y
          case 5 => x
          case 6 => h - 1 - x
          case 7 => h - 1 - x
          case _ => x // 8
        }
        var c = 0
        while (c < ch) {
          out((y * ow + x) * ch + c) = px((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](r.getUTF8String(0), ow, oh, ch, out))
  }
}

/** Fixture: wrap a [[JpegSynth]] baseline JPEG with an APP1 Exif
  * segment carrying orientation `1 + (seed mod 8)` — inserted right
  * after SOI, exactly where cameras put it.
  */
object ExifSynth {
  def jpegWithExif(w: Long, h: Long, seed: Long, mode: Int): Array[Byte] = {
    val jpeg = JpegSynth.jpegBytes(w, h, seed, mode)
    if (jpeg == null) return null
    val o = 1 + java.lang.Math.floorMod(seed, 8).toInt
    // APP1: Exif\0\0 + II TIFF header + one-entry IFD0 (tag 0x0112)
    val tiff = new java.io.ByteArrayOutputStream()
    tiff.write('I'); tiff.write('I'); tiff.write(42); tiff.write(0)
    tiff.write(8); tiff.write(0); tiff.write(0); tiff.write(0)
    tiff.write(1); tiff.write(0) // one entry
    tiff.write(0x12); tiff.write(0x01) // tag 274
    tiff.write(3); tiff.write(0) // SHORT
    tiff.write(1); tiff.write(0); tiff.write(0); tiff.write(0)
    tiff.write(o); tiff.write(0); tiff.write(0); tiff.write(0)
    tiff.write(0); tiff.write(0); tiff.write(0); tiff.write(0) // next IFD
    val tb = tiff.toByteArray
    val segLen = 2 + 6 + tb.length
    val out = new java.io.ByteArrayOutputStream()
    out.write(jpeg, 0, 2) // SOI
    out.write(0xFF); out.write(0xE1)
    out.write((segLen >> 8) & 0xFF); out.write(segLen & 0xFF)
    out.write('E'); out.write('x'); out.write('i'); out.write('f')
    out.write(0); out.write(0)
    out.write(tb, 0, tb.length)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }
}

/** Expression wrapping [[ExifSynth.jpegWithExif]]. */
case class SynthJpegExif(first: Expression, second: Expression,
    third: Expression, mode: Int)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(w: Any, h: Any, seed: Any): Any =
    ExifSynth.jpegWithExif(w.asInstanceOf[Long], h.asInstanceOf[Long],
      seed.asInstanceOf[Long], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h, s) => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.ExifSynth.jpegWithExif($w, $h, $s, $mode);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ExifFunctions {
  def exif_orientation(payload: Column): Column =
    ExpressionUtils.column(ExifOrientation(ExpressionUtils.expression(payload)))

  def raster_orient(raster: Column, orientation: Column): Column =
    ExpressionUtils.column(RasterOrient(ExpressionUtils.expression(raster),
      ExpressionUtils.expression(orientation)))

  def synth_jpeg_exif(w: Column, h: Column, seed: Column, mode: Int): Column =
    ExpressionUtils.column(SynthJpegExif(ExpressionUtils.expression(w),
      ExpressionUtils.expression(h), ExpressionUtils.expression(seed), mode))
}
