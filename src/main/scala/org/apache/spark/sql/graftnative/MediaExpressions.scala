package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Native image-container metadata — format, width, height — parsed
  * directly from the header bytes of a binary payload column. This is the
  * REAL decode step of the multimodal pipeline's metadata stage (the
  * pixel/feature decode in [[graft.operators.ScaleOps.decodeBatches]]
  * still stubs its codec — this sandbox ships none — but container
  * dimensions need no codec: they are deterministic integer fields at
  * fixed offsets of the published container formats):
  *
  *  - PNG (ISO/IEC 15948 §5.2/§11.2.2): 8-byte signature
  *    `89 50 4E 47 0D 0A 1A 0A`, then the IHDR chunk whose first two
  *    data fields are width and height as big-endian u32.
  *  - JPEG/JFIF (ITU-T T.81 §B.2): `FF D8` (SOI), then a marker walk —
  *    each segment is `FF <marker> <len:u16-be>` where len counts itself;
  *    the frame header (SOF0..SOF15, minus DHT/JPG/DAC/RST/standalone
  *    codes) carries `precision:u8, height:u16-be, width:u16-be`.
  *  - GIF (GIF87a/89a spec): 6-byte version signature, then the logical
  *    screen width and height as LITTLE-endian u16.
  *
  * Anything else (including truncated or corrupt headers of a recognized
  * container) yields `('unknown', NULL, NULL)` — dimensions are never
  * guessed. Width/height are u32-safe longs. One bounded byte walk per
  * row, fully inside whole-stage codegen, zero shuffle — the shape that
  * profiles a 100 TB binary corpus in a single scan. NULL payload yields
  * NULL (standard null-intolerant unary expression).
  */
case class ImageMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ImageMeta.schema

  override def nullSafeEval(v: Any): Any =
    ImageMeta.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.ImageMeta.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageMeta {
  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true)))

  private val FMT_PNG = UTF8String.fromString("png")
  private val FMT_JPEG = UTF8String.fromString("jpeg")
  private val FMT_GIF = UTF8String.fromString("gif")
  private val FMT_UNKNOWN = UTF8String.fromString("unknown")

  private def row(fmt: UTF8String, w: Long, h: Long): InternalRow =
    new GenericInternalRow(Array[Any](fmt, w, h))
  private def unknownOf(fmt: UTF8String): InternalRow =
    new GenericInternalRow(Array[Any](fmt, null, null))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def beU16(b: Array[Byte], i: Int): Long =
    ((u8(b, i) << 8) | u8(b, i + 1)).toLong
  private def beU32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def leU16(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8)).toLong

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def startsWith(b: Array[Byte], sig: Array[Byte]): Boolean = {
    if (b.length < sig.length) return false
    var i = 0
    while (i < sig.length) { if (b(i) != sig(i)) return false; i += 1 }
    true
  }

  /** SOF0..SOF15 minus the four C-range non-frame markers (C4 DHT,
    * C8 JPG, CC DAC) — RSTn/standalone codes are outside 0xC0..0xCF.
    */
  private def isSof(m: Int): Boolean =
    m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

  /** Parse the container header; see class doc for the per-format field
    * layout. Called per row from generated and interpreted paths.
    */
  def compute(b: Array[Byte]): InternalRow = {
    // ---- PNG: signature + IHDR (must be the first chunk, per spec)
    if (startsWith(b, PngSig)) {
      if (b.length >= 24 &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        return row(FMT_PNG, beU32(b, 16), beU32(b, 20))
      return unknownOf(FMT_PNG)
    }
    // ---- JPEG: SOI then the marker walk to a frame header
    if (b.length >= 2 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xFF) return unknownOf(FMT_JPEG)
        // fill bytes: any number of 0xFF may pad before the marker code
        var j = i + 1
        while (j < b.length && u8(b, j) == 0xFF) j += 1
        if (j >= b.length) return unknownOf(FMT_JPEG)
        val m = u8(b, j)
        if (isSof(m)) {
          // FF m len(2) precision(1) height(2) width(2)
          if (j + 7 < b.length && beU16(b, j + 1) >= 8)
            return row(FMT_JPEG, beU16(b, j + 6), beU16(b, j + 4))
          return unknownOf(FMT_JPEG)
        }
        if (m == 0xD9 || m == 0xDA) return unknownOf(FMT_JPEG) // EOI / SOS
        // Reserved codes (0x00 — the stuffed-byte form FF 00 — and
        // 0x02..0xBF) never mark a header segment; treating one as
        // length-prefixed would jump by a garbage-derived length and
        // could land on bytes that parse as a fake SOF. Dimensions are
        // never guessed: bail to unknown instead.
        if (m != 0x01 && m < 0xC0) return unknownOf(FMT_JPEG)
        if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { // standalone, no length
          i = j + 1
        } else {
          if (j + 2 >= b.length) return unknownOf(FMT_JPEG)
          val len = beU16(b, j + 1)
          if (len < 2) return unknownOf(FMT_JPEG)
          i = j + 1 + len.toInt
        }
      }
      return unknownOf(FMT_JPEG)
    }
    // ---- GIF: version signature + little-endian logical screen size
    if (b.length >= 10 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row(FMT_GIF, leU16(b, 6), leU16(b, 8))
    unknownOf(FMT_UNKNOWN)
  }
}

object MediaExpressions {
  /** Column-level API: native image-container metadata
    * `struct(format, width, height)` parsed from a binary column (see
    * [[ImageMeta]]).
    */
  def image_meta(payload: Column): Column =
    ExpressionUtils.column(ImageMeta(ExpressionUtils.expression(payload)))
}
