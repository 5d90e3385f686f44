package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Per-frame dHash over MJPEG video in EITHER container — AVI (RIFF
  * movi chunks, via [[AviMjpegFrames.frameRanges]]) or MP4 (mjpa/jpeg
  * sample entries resolved through the real stsc/stco/stsz machinery,
  * via [[Mp4Samples]]). Each sampled frame is JPEG-decoded and hashed
  * with the SAME 8×9-grid gradient hash as [[RasterDHash]], so a frame
  * carried identically in both containers produces the identical
  * 64-bit hash — the invariant the video near-dup key banks on.
  * Skipped frames (stride) cost their byte range, never a decode.
  *
  * This is the frame-level primitive video corpus dedup needs at
  * 100 TB: hashes are 8 bytes/frame (vs ~KB of pixels), computed
  * per-row with zero shuffle, and the downstream near-dup join bands
  * hashes into buckets — never all-pairs over frames.
  */
case class VideoFrameDhashes(child: Expression, stride: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(stride > 0, s"stride must be positive, got $stride")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = VideoFrameDhashes.schema

  override def nullSafeEval(v: Any): Any =
    VideoFrameDhashes.compute(v.asInstanceOf[Array[Byte]], stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.VideoFrameDhashes.compute($c, $stride)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoFrameDhashes {
  val schema: StructType = StructType(Seq(
    StructField("n_frames", IntegerType, nullable = true),
    StructField("frame_idx", ArrayType(IntegerType, containsNull = false),
      nullable = true),
    StructField("dhash", ArrayType(LongType, containsNull = false),
      nullable = true)))

  private def bad: InternalRow =
    new GenericInternalRow(Array[Any](null, null, null))

  /** Frame byte ranges for either container; null when unaddressable. */
  private def ranges(b: Array[Byte]): (Array[Int], Array[Int]) = {
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F') return AviMjpegFrames.frameRanges(b)
    // MP4: the mjpa/jpeg track's resolved sample table
    val all = Mp4Samples.compute(b)
    if (all == null) return null
    val tracks = all.getArray(1)
    var ti = 0
    while (ti < tracks.numElements()) {
      val t = tracks.getStruct(ti, 4)
      val codec = if (t.isNullAt(1)) null else t.getUTF8String(1).toString
      if (codec == "mjpa" || codec == "jpeg") {
        val offs = t.getArray(2).toLongArray()
        val szs = t.getArray(3).toLongArray()
        val oa = new Array[Int](offs.length)
        val sa = new Array[Int](offs.length)
        var k = 0
        while (k < oa.length) {
          if (offs(k) > Int.MaxValue || szs(k) > Int.MaxValue) return null
          oa(k) = offs(k).toInt
          sa(k) = szs(k).toInt
          k += 1
        }
        return (oa, sa)
      }
      ti += 1
    }
    null
  }

  def compute(b: Array[Byte], stride: Int): InternalRow = {
    val r = ranges(b)
    if (r == null || r._1.length == 0) return bad
    val (offs, szs) = r
    val idx = new java.util.ArrayList[Integer]()
    val hashes = new java.util.ArrayList[java.lang.Long]()
    var n = 0
    while (n < offs.length) {
      if (n % stride == 0) {
        val off = offs(n)
        val sz = szs(n)
        if (sz < 2 || (b(off) & 0xFF) != 0xFF || (b(off + 1) & 0xFF) != 0xD8)
          return bad
        val fb = java.util.Arrays.copyOfRange(b, off, off + sz)
        val dec = JpegCodec.decode(fb)
        if (dec.isNullAt(1)) return bad
        val dh = RasterDHash.compute(dec)
        if (dh == null) return bad
        idx.add(n)
        hashes.add(dh)
      }
      n += 1
    }
    val m = idx.size()
    val ia = new Array[Int](m)
    val ha = new Array[Long](m)
    var k = 0
    while (k < m) { ia(k) = idx.get(k); ha(k) = hashes.get(k); k += 1 }
    new GenericInternalRow(Array[Any](offs.length,
      new GenericArrayData(ia), new GenericArrayData(ha)))
  }
}

object VideoDhashFunctions {
  /** Column API: per-frame dHash over MJPEG video (AVI or MP4). */
  def video_frame_dhashes(payload: Column, stride: Int): Column =
    ExpressionUtils.column(
      VideoFrameDhashes(ExpressionUtils.expression(payload), stride))
}
