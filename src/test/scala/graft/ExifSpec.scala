package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** EXIF orientation contracts: the APP1/TIFF walk and the eight index
  * remaps (group properties + hand goldens on asymmetric rasters).
  */
class ExifSpec extends AnyFunSuite {

  test("orientation extraction: 1 + seed mod 8 from the APP1 segment") {
    for (seed <- 0L to 9L) {
      val b = ExifSynth.jpegWithExif(16, 16, seed, mode = 2)
      assert(b != null)
      val o = ExifOrientation.compute(b)
      assert(o != null && o.intValue() == 1 + (seed % 8).toInt, s"seed $seed")
    }
    // a bare fixture JPEG carries no APP1 -> null
    assert(ExifOrientation.compute(JpegSynth.jpegBytes(16, 16, 1L, 2)) == null)
    assert(ExifOrientation.compute(Array[Byte](1, 2, 3)) == null)
  }

  test("EXIF-wrapped JPEG still decodes to the same pixels") {
    val plain = ImageDecode.compute(JpegSynth.jpegBytes(16, 16, 3L, 2))
    val exif = ImageDecode.compute(ExifSynth.jpegWithExif(16, 16, 3L, 2))
    assert(exif.getUTF8String(0).toString == "jpeg")
    assert(java.util.Arrays.equals(plain.getBinary(4), exif.getBinary(4)))
  }

  private def gray(w: Int, h: Int, px: Array[Byte]) =
    ImageDecode.rasterRow(org.apache.spark.unsafe.types.UTF8String
      .fromString("pgm"), w, h, 1, px)

  private def pixels(r: org.apache.spark.sql.catalyst.InternalRow): Seq[Int] =
    r.getBinary(4).map(_ & 0xFF).toSeq

  test("hand goldens on a 2x1 raster [A, B]") {
    val r = gray(2, 1, Array[Byte](10, 20))
    def o(n: Int) = RasterOrient.compute(r, n)
    assert(pixels(o(1)) == Seq(10, 20))
    assert(pixels(o(2)) == Seq(20, 10), "flip H")
    assert(pixels(o(3)) == Seq(20, 10), "180 on a single row")
    assert(pixels(o(4)) == Seq(10, 20), "flip V on a single row")
    assert(o(5).getInt(1) == 1 && o(5).getInt(2) == 2, "transpose swaps dims")
    assert(pixels(o(5)) == Seq(10, 20), "transpose")
    assert(pixels(o(6)) == Seq(10, 20), "rot90 CW: A on top")
    assert(pixels(o(7)) == Seq(20, 10), "transverse")
    assert(pixels(o(8)) == Seq(20, 10), "rot270 CW: B on top")
  }

  test("group properties: transpose is an involution; rot90 has order 4") {
    val rnd = new scala.util.Random(3)
    val w = 7; val h = 5
    val base = gray(w, h, Array.fill[Byte](w * h)(rnd.nextInt(256).toByte))
    def eq(a: org.apache.spark.sql.catalyst.InternalRow,
        b: org.apache.spark.sql.catalyst.InternalRow): Boolean =
      a.getInt(1) == b.getInt(1) && a.getInt(2) == b.getInt(2) &&
        java.util.Arrays.equals(a.getBinary(4), b.getBinary(4))
    assert(eq(RasterOrient.compute(RasterOrient.compute(base, 5), 5), base))
    assert(eq(RasterOrient.compute(RasterOrient.compute(base, 2), 2), base))
    // flipH then flipV = 180
    assert(eq(RasterOrient.compute(RasterOrient.compute(base, 2), 4),
      RasterOrient.compute(base, 3)))
    // rot90 applied four times = identity
    var cur = base
    for (_ <- 0 until 4) cur = RasterOrient.compute(cur, 6)
    assert(eq(cur, base))
  }

  test("identity and out-of-range orientations pass through") {
    val r = gray(3, 2, Array[Byte](1, 2, 3, 4, 5, 6))
    assert(RasterOrient.compute(r, 1) eq r)
    assert(RasterOrient.compute(r, 0) eq r)
    assert(RasterOrient.compute(r, 9) eq r)
    val u = ImageDecode.unknownRow
    assert(RasterOrient.compute(u, 6) eq u)
  }
}
