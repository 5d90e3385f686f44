package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native RASTER decode — the real pixel half of the multimodal stage
  * (container metadata lives in [[ImageMeta]]). Three codec-free formats
  * whose pixel payloads are pure header-plus-byte arithmetic, so the
  * decode needs no image library and runs as one bounded byte walk per
  * row inside whole-stage codegen:
  *
  *  - PPM `P6` (Netpbm spec): ASCII header `P6 <w> <h> <maxval>` with
  *    `#` comments and arbitrary whitespace, one whitespace byte, then
  *    `w*h*3` RGB samples row-major top-down (maxval ≤ 255 only — the
  *    single-byte-sample variant).
  *  - PGM `P5`: same header walk, one grayscale channel.
  *  - BMP (BITMAPINFOHEADER, Windows spec): `BM`, pixel-array offset at
  *    byte 10 (le u32), DIB size ≥ 40, width/height le i32 (positive
  *    height = BOTTOM-UP row order), planes 1, 24 bpp, BI_RGB
  *    (uncompressed) only; each row is B,G,R triples padded to a 4-byte
  *    boundary. Decode = strip padding, swap to RGB, flip to top-down.
  *
  * Output is a normalized raster struct
  * `(format, width, height, channels, pixels)` with `pixels` row-major
  * top-down RGB (or single-channel) — every downstream op (resize,
  * channel stats, feature extraction) sees ONE layout regardless of
  * source container. Anything else, truncated headers, or oversized
  * dimensions yield `('unknown', NULL, NULL, NULL, NULL)` — pixels are
  * never guessed. Reference pipeline context: the reference system has
  * no media path at all; this implements the training-data brief's
  * decode→resize→feature stage for real.
  */
case class ImageDecode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ImageDecode.schema

  override def nullSafeEval(v: Any): Any =
    ImageDecode.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.ImageDecode.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDecode {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("pixels", BinaryType, nullable = true)))

  private val FMT_PPM = UTF8String.fromString("ppm")
  private val FMT_PGM = UTF8String.fromString("pgm")
  private val FMT_BMP = UTF8String.fromString("bmp")
  private val FMT_UNKNOWN = UTF8String.fromString("unknown")

  /** Decoded-raster size cap: 64 MiB of samples. A corrupt header must
    * not make one row allocate unbounded memory in an executor.
    */
  private val MaxPixelBytes = 1 << 26

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FMT_UNKNOWN, null, null, null, null))
  private def row(fmt: UTF8String, w: Int, h: Int, ch: Int,
      px: Array[Byte]): InternalRow =
    new GenericInternalRow(Array[Any](fmt, w, h, ch, px))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def leU16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def leI32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B

  /** Skip Netpbm whitespace and `#`-to-end-of-line comments. */
  private def skipWs(b: Array[Byte], start: Int): Int = {
    var i = start
    while (i < b.length) {
      if (isWs(u8(b, i))) i += 1
      else if (u8(b, i) == '#') {
        while (i < b.length && u8(b, i) != '\n') i += 1
      } else return i
    }
    i
  }

  /** Parse an ASCII decimal field; returns (value, next) or (-1, _) when
    * no digit is present or the value is implausibly large.
    */
  private def asciiInt(b: Array[Byte], start: Int): (Int, Int) = {
    var i = start
    var v = 0L
    var digits = 0
    while (i < b.length && u8(b, i) >= '0' && u8(b, i) <= '9') {
      v = v * 10 + (u8(b, i) - '0')
      digits += 1
      if (v > (1L << 24)) return (-1, i)
      i += 1
    }
    if (digits == 0) (-1, i) else (v.toInt, i)
  }

  private def decodeNetpbm(b: Array[Byte], channels: Int,
      fmt: UTF8String): InternalRow = {
    var i = skipWs(b, 2)
    val (w, i1) = asciiInt(b, i)
    i = skipWs(b, i1)
    val (h, i2) = asciiInt(b, i)
    i = skipWs(b, i2)
    val (maxval, i3) = asciiInt(b, i)
    i = i3
    // exactly ONE whitespace byte separates maxval from the sample data
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255 ||
        i >= b.length || !isWs(u8(b, i))) return unknown
    i += 1
    val n = w.toLong * h * channels
    if (n > MaxPixelBytes || b.length - i < n) return unknown
    row(fmt, w, h, channels,
      java.util.Arrays.copyOfRange(b, i, i + n.toInt))
  }

  private def decodeBmp(b: Array[Byte]): InternalRow = {
    if (b.length < 54) return unknown
    val offBits = leI32(b, 10)
    val dibSize = leI32(b, 14)
    val w = leI32(b, 18)
    val hRaw = leI32(b, 22)
    val planes = leU16(b, 26)
    val bpp = leU16(b, 28)
    val compression = leI32(b, 30)
    if (dibSize < 40 || w <= 0 || hRaw == 0 || planes != 1 || bpp != 24 ||
        compression != 0) return unknown
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    val stride = ((3L * w + 3) / 4) * 4
    val n = 3L * w * h
    if (n > MaxPixelBytes || offBits < 54 ||
        offBits.toLong + stride * h > b.length) return unknown
    val out = new Array[Byte](n.toInt)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      val src = offBits + srcRow * stride.toInt
      val dst = y * w * 3
      var x = 0
      while (x < w) {
        // file order is B,G,R — normalize to R,G,B
        out(dst + 3 * x) = b(src + 3 * x + 2)
        out(dst + 3 * x + 1) = b(src + 3 * x + 1)
        out(dst + 3 * x + 2) = b(src + 3 * x)
        x += 1
      }
      y += 1
    }
    row(FMT_BMP, w, h, 3, out)
  }

  /** Decode one payload; called per row from generated and interpreted
    * paths.
    */
  def compute(b: Array[Byte]): InternalRow = {
    if (b.length >= 2 && b(0) == 'P' && b(1) == '6') decodeNetpbm(b, 3, FMT_PPM)
    else if (b.length >= 2 && b(0) == 'P' && b(1) == '5') decodeNetpbm(b, 1, FMT_PGM)
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else unknown
  }
}

/** Nearest-neighbor resize of a decoded raster to a FIXED (targetW,
  * targetH) — the uniform-tensor step every batch-inference pipeline
  * needs before stacking images. Source index map is the standard NN
  * kernel `sx = ⌊x·W/targetW⌋, sy = ⌊y·H/targetH⌋` (pure integer
  * arithmetic, so the result is exactly reproducible by any system that
  * applies the same map — which is what lets the DuckDB oracle mirror
  * it). An `'unknown'` raster passes through unchanged; per-row, zero
  * shuffle, inside whole-stage codegen.
  */
case class ImageResizeNN(child: Expression, targetW: Int, targetH: Int)
    extends UnaryExpression {

  require(targetW > 0 && targetH > 0,
    s"target dims must be positive, got ${targetW}x$targetH")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == ImageDecode.schema)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"image_resize_nn expects the image_decode raster struct, got ${child.dataType}")

  override def dataType: DataType = ImageDecode.schema

  override def nullSafeEval(v: Any): Any =
    ImageResizeNN.compute(v.asInstanceOf[InternalRow], targetW, targetH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.ImageResizeNN.compute($c, $targetW, $targetH)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageResizeNN {
  def compute(r: InternalRow, tw: Int, th: Int): InternalRow = {
    if (r.isNullAt(4)) return r // 'unknown' raster: nothing to resize
    val w = r.getInt(1)
    val h = r.getInt(2)
    val ch = r.getInt(3)
    val px = r.getBinary(4)
    val out = new Array[Byte](tw * th * ch)
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        val sx = x * w / tw
        val src = (sy * w + sx) * ch
        val dst = (y * tw + x) * ch
        var c = 0
        while (c < ch) { out(dst + c) = px(src + c); c += 1 }
        x += 1
      }
      y += 1
    }
    new GenericInternalRow(
      Array[Any](r.getUTF8String(0), tw, th, ch, out))
  }
}

/** Per-channel sample sums of a decoded raster — `array<bigint>` of
  * length `channels` (RGB → [r_sum, g_sum, b_sum]). Integer-exact by
  * construction (byte samples summed as longs), which is what makes a
  * decoded-pixel query HASH-comparable against an oracle that recomputes
  * the same sums arithmetically. NULL for an `'unknown'` raster.
  */
case class RasterChannelSums(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == ImageDecode.schema)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"raster_channel_sums expects the image_decode raster struct, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    RasterChannelSums.compute(v.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.RasterChannelSums.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RasterChannelSums {
  def compute(r: InternalRow): ArrayData = {
    if (r.isNullAt(4)) return null
    val ch = r.getInt(3)
    val px = r.getBinary(4)
    val sums = new Array[Long](ch)
    var i = 0
    while (i < px.length) {
      sums(i % ch) += px(i) & 0xFF
      i += 1
    }
    new GenericArrayData(sums.map(v => v: Any))
  }
}

object RasterFunctions {
  /** Column API: decode PPM/PGM/BMP bytes to the normalized raster
    * struct `(format, width, height, channels, pixels)`.
    */
  def image_decode(payload: Column): Column =
    ExpressionUtils.column(ImageDecode(ExpressionUtils.expression(payload)))

  /** Column API: nearest-neighbor resize of a raster struct. */
  def image_resize_nn(raster: Column, targetW: Int, targetH: Int): Column =
    ExpressionUtils.column(
      ImageResizeNN(ExpressionUtils.expression(raster), targetW, targetH))

  /** Column API: per-channel sample sums (`array<bigint>`). */
  def raster_channel_sums(raster: Column): Column =
    ExpressionUtils.column(
      RasterChannelSums(ExpressionUtils.expression(raster)))
}
