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

  test("0xFF fill bytes between markers are skipped, not misread") {
    // ITU T.81 §B.1.1.2: markers may be preceded by any number of 0xFF
    // fill bytes. Insert padding right after SOI; a strict walk would
    // read the pair (FF, FF) as a marker with a bogus length.
    val b = ExifSynth.jpegWithExif(16, 16, 4L, mode = 2)
    val padded = b.take(2) ++ Array.fill[Byte](3)(0xFF.toByte) ++ b.drop(2)
    val o = ExifOrientation.compute(padded)
    assert(o != null && o.intValue() == 5)
  }

  test("null orientation passes the raster through (expression contract)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    val r = gray(2, 1, Array[Byte](10, 20))
    val expr = RasterOrient(Literal(r, ImageDecode.schema),
      Literal(null, IntegerType))
    val out = expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(out != null && pixels(out) == Seq(10, 20),
      "EXIF-less images must NOT be dropped by orientation normalization")
    // null raster still yields null
    val nullR = RasterOrient(Literal(null, ImageDecode.schema), Literal(3, IntegerType))
    assert(nullR.eval(null) == null)
  }

  test("exif_meta: full APP1 block roundtrips in BOTH byte orders") {
    for (seed <- 0L to 11L) { // even = II, odd = MM
      val b = ExifMetaSynth.jpegWithMeta(16, 16, seed, mode = 2)
      assert(b != null)
      val r = ExifMeta.compute(b)
      assert(r != null, s"seed $seed")
      assert(r.getUTF8String(0).toString == ExifMetaSynth.make(seed), s"make $seed")
      assert(r.getUTF8String(1).toString == ExifMetaSynth.model(seed), s"model $seed")
      assert(r.getUTF8String(2).toString == ExifMetaSynth.datetime(seed), s"dto $seed")
      assert(r.getInt(3) == ExifMetaSynth.orientation(seed), s"orient $seed")
      val latMag = ExifMetaSynth.latDeg(seed) + ExifMetaSynth.latMin(seed) / 60.0 +
        (ExifMetaSynth.latS100(seed) / 100.0) / 3600.0
      val lonMag = ExifMetaSynth.lonDeg(seed) + ExifMetaSynth.lonMin(seed) / 60.0 +
        (ExifMetaSynth.lonS100(seed) / 100.0) / 3600.0
      val lat = if (ExifMetaSynth.latSouth(seed)) -latMag else latMag
      val lon = if (ExifMetaSynth.lonWest(seed)) -lonMag else lonMag
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(lat), s"lat $seed")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(5)) ==
        java.lang.Double.doubleToLongBits(lon), s"lon $seed")
    }
  }

  test("exif_meta: missing APP1 -> null struct; orientation-only APP1 -> null fields") {
    assert(ExifMeta.compute(JpegSynth.jpegBytes(16, 16, 1L, 2)) == null)
    // the orientation-only fixture has no make/model/GPS/sub-IFD
    val r = ExifMeta.compute(ExifSynth.jpegWithExif(16, 16, 3L, 2))
    assert(r != null)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getInt(3) == 4) // 1 + 3 % 8
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("exif_meta: a torn GPS offset nulls the GPS fields, not the struct") {
    val b = ExifMetaSynth.jpegWithMeta(16, 16, 2L, mode = 2)
    // the GPS rationals live at the tail; truncating the APP1 segment
    // length would break everything, so instead corrupt the GPS IFD
    // pointer to point past the segment: find tag 0x8825's slot.
    // Easier surgical path: zero the final 48 bytes (both DMS arrays).
    // The dms reader bounds-checks against the segment end, so instead
    // shrink the declared RATIONAL count by flipping type: corrupt one
    // byte of the lat DMS denominator to 0 -> dms returns null.
    val r0 = ExifMeta.compute(b)
    assert(r0 != null && !r0.isNullAt(4))
    // locate the last 48 bytes of the APP1 TIFF block = the two DMS
    // arrays; the lat minute denominator (=1) is at tail-48+12..16
    val segLen = ((b(4) & 0xFF) << 8) | (b(5) & 0xFF)
    val tailAt = 2 + 2 + segLen - 48
    val c = b.clone()
    for (k <- 0 until 4) c(tailAt + 12 + k) = 0 // latMin denominator := 0
    val r = ExifMeta.compute(c)
    assert(r != null && r.isNullAt(4), "lat nulls on a zero denominator")
    assert(!r.isNullAt(5), "lon survives")
    assert(r.getUTF8String(0).toString == ExifMetaSynth.make(2L))
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
