package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** ODT / PPTX / XLSX extraction contracts: fixture roundtrips across
  * seeds (container ZIP64 lanes included), per-format rule pins, and
  * the reject matrices with robustness sweeps.
  */
class OfficeSpec extends AnyFunSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  // --------------------------------------------------------- ODT

  test("odt: fixture roundtrip across 25 seeds") {
    for (doc <- 0L to 24L) {
      val r = OdtText.compute(OdtSynth.odtBytes(doc))
      assert(r.getUTF8String(0).toString == "odt", s"doc $doc rejected")
      assert(r.getInt(1) == OdtSynth.nParagraphs(doc), s"doc $doc paras")
      assert(r.getUTF8String(2).toString == OdtSynth.expectedText(doc),
        s"doc $doc:\n[${r.getUTF8String(2)}]\nvs\n[${OdtSynth.expectedText(doc)}]")
    }
  }

  test("odt: space runs, wrong mimetype, torn markup reject") {
    val t = OdtText.compute(OdtSynth.odtBytes(6L)).getUTF8String(2).toString
    assert(t.split("\n", -1)(2) == "gap  end 6", "text:s c=2 renders 2 spaces")
    def fmt(b: Array[Byte]): String = OdtText.compute(b).getUTF8String(0).toString
    // a DOCX package is not an ODT (no content.xml)
    assert(fmt(DocxSynth.docxBytes(1L)) == "unknown")
    // mimetype present but wrong: reject even with a content.xml
    val wrongMime = ZipSynth.writeArchive(Seq(
      ("mimetype", 0, "application/epub+zip".getBytes(Utf8), Array.emptyByteArray),
      ("content.xml", 8, OdtSynth.contentXml(1L).getBytes(Utf8),
        Array.emptyByteArray)), "")
    assert(fmt(wrongMime) == "unknown", "non-ODT mimetype rejects")
    // torn paragraph
    val torn = ZipSynth.writeArchive(Seq(
      ("content.xml", 8, "<office:text><text:p>half".getBytes(Utf8),
        Array.emptyByteArray)), "")
    assert(fmt(torn) == "unknown")
    // sweeps
    val ok = OdtSynth.odtBytes(7L)
    var k = 0
    while (k < ok.length) { OdtText.compute(ok.take(k)); k += 19 }
    var p = 0
    while (p < ok.length) {
      val c = ok.clone(); c(p) = (c(p) ^ 0x04).toByte
      OdtText.compute(c); p += 31
    }
  }

  // --------------------------------------------------------- PPTX

  test("pptx: fixture roundtrip across 25 seeds (reverse-stored slides sort)") {
    for (doc <- 0L to 24L) {
      val r = PptxText.compute(PptxSynth.pptxBytes(doc))
      assert(r.getUTF8String(0).toString == "pptx", s"doc $doc rejected")
      val ns = PptxSynth.nSlides(doc)
      assert(r.getInt(1) == ns, s"doc $doc slides")
      for (s <- 0 until ns) {
        val row = r.getArray(2).getStruct(s, 2)
        assert(row.getInt(0) == s)
        assert(row.getUTF8String(1).toString == PptxSynth.slideText(doc, s),
          s"doc $doc slide $s")
      }
    }
  }

  test("pptx: rejects — no slides, duplicate slide number, torn run") {
    def fmt(b: Array[Byte]): String = PptxText.compute(b).getUTF8String(0).toString
    val noSlides = ZipSynth.writeArchive(Seq(
      ("[Content_Types].xml", 8, "<Types/>".getBytes(Utf8),
        Array.emptyByteArray)), "")
    assert(fmt(noSlides) == "unknown")
    val torn = ZipSynth.writeArchive(Seq(
      ("[Content_Types].xml", 8, "<Types/>".getBytes(Utf8), Array.emptyByteArray),
      ("ppt/slides/slide1.xml", 8, "<a:p><a:t>half".getBytes(Utf8),
        Array.emptyByteArray)), "")
    assert(fmt(torn) == "unknown")
    val ok = PptxSynth.pptxBytes(3L)
    var k = 0
    while (k < ok.length) { PptxText.compute(ok.take(k)); k += 23 }
  }

  // --------------------------------------------------------- XLSX

  test("xlsx: fixture roundtrip across 25 seeds (types, shared strings, sheets)") {
    for (doc <- 0L to 24L) {
      val r = XlsxCells.compute(XlsxSynth.xlsxBytes(doc))
      assert(r.getUTF8String(0).toString == "xlsx", s"doc $doc rejected")
      val nr = XlsxSynth.nRows(doc)
      val expected = nr * 4 + (if (XlsxSynth.hasSheet2(doc)) 1 else 0)
      assert(r.getInt(1) == expected, s"doc $doc cells")
      val cells = r.getArray(2)
      // first row of sheet 1: the four typed cells in order
      val c0 = cells.getStruct(0, 5)
      assert(c0.getInt(0) == 1 && c0.getInt(1) == 1 && c0.getInt(2) == 1)
      assert(c0.getUTF8String(3).toString == "s")
      assert(c0.getUTF8String(4).toString ==
        XlsxSynth.sharedString(doc, ((doc + 1) % 3).toInt))
      val c1 = cells.getStruct(1, 5)
      assert(c1.getUTF8String(3).toString == "n")
      assert(c1.getUTF8String(4).toString == XlsxSynth.numValue(doc, 1))
      val c3 = cells.getStruct(3, 5)
      assert(c3.getUTF8String(3).toString == "inlineStr")
      assert(c3.getUTF8String(4).toString == s"in $doc 1")
      if (XlsxSynth.hasSheet2(doc)) {
        val last = cells.getStruct(expected - 1, 5)
        assert(last.getInt(0) == 2, "sheet 2 cells sort after sheet 1")
        assert(last.getUTF8String(3).toString == "str")
      }
    }
  }

  test("xlsx: rich shared strings concat, OOB index and bad refs reject") {
    // rich-run shared string: si 1 must concat its runs
    val r = XlsxCells.compute(XlsxSynth.xlsxBytes(0L))
    val cells = r.getArray(2)
    var foundRich = false
    for (i <- 0 until r.getInt(1)) {
      val c = cells.getStruct(i, 5)
      if (c.getUTF8String(4).toString == "alpha 0") foundRich = true
    }
    assert(foundRich, "the rich-run shared string must appear concatenated")
    def fmt(b: Array[Byte]): String = XlsxCells.compute(b).getUTF8String(0).toString
    def pack(sheet: String): Array[Byte] = ZipSynth.writeArchive(Seq(
      ("[Content_Types].xml", 8, "<Types/>".getBytes(Utf8), Array.emptyByteArray),
      ("xl/worksheets/sheet1.xml", 8, sheet.getBytes(Utf8),
        Array.emptyByteArray)), "")
    // shared-string reference with NO shared-string table: reject
    assert(fmt(pack("""<sheetData><row><c r="A1" t="s"><v>0</v></c></row></sheetData>""")) ==
      "unknown")
    // malformed ref
    assert(fmt(pack("""<sheetData><row><c r="11" t="str"><v>x</v></c></row></sheetData>""")) ==
      "unknown")
    // unknown type tag
    assert(fmt(pack("""<sheetData><row><c r="A1" t="q"><v>x</v></c></row></sheetData>""")) ==
      "unknown")
    // valid minimal numeric sheet
    assert(fmt(pack("""<sheetData><row><c r="A1"><v>7</v></c></row></sheetData>""")) ==
      "xlsx")
    // sweeps
    val ok = XlsxSynth.xlsxBytes(9L)
    var k = 0
    while (k < ok.length) { XlsxCells.compute(ok.take(k)); k += 29 }
    var p = 0
    while (p < ok.length) {
      val c = ok.clone(); c(p) = (c(p) ^ 0x11).toByte
      XlsxCells.compute(c); p += 41
    }
  }

  test("composition: office texts feed the dedup/text-analysis surface") {
    val docx = DocxText.compute(DocxSynth.docxBytes(4L)).getUTF8String(2).toString
    val odt = OdtText.compute(OdtSynth.odtBytes(4L)).getUTF8String(2).toString
    val toks = (docx + "\n" + odt).split("\\s+").filter(_.nonEmpty)
    assert(toks.length > 25)
    assert(toks.sliding(3).map(_.mkString(" ")).toSet.size > 10)
  }
}
