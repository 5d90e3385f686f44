package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite

/** DOCX extraction contracts: the fixture roundtrip across seeds (all
  * WML rules + the ZIP64 container lanes), reject matrix, robustness
  * sweeps, and the composition into the text-analysis surface.
  */
class DocxSpec extends AnyFunSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  test("fixture roundtrip: paragraphs and text across 25 seeds") {
    for (doc <- 0L to 24L) {
      val b = DocxSynth.docxBytes(doc)
      assert(b != null)
      val r = DocxText.compute(b)
      assert(r.getUTF8String(0).toString == "docx", s"doc $doc rejected " +
        s"(zip64 mode ${ZipSynth.zip64Mode(doc)})")
      assert(r.getInt(1) == DocxSynth.nParagraphs(doc), s"doc $doc n_paragraphs")
      assert(r.getUTF8String(2).toString == DocxSynth.expectedText(doc),
        s"doc $doc text:\n[${r.getUTF8String(2)}]\nvs\n[${DocxSynth.expectedText(doc)}]")
    }
  }

  test("WML rules: preserve-space, entities, br, tab, tables, rPr no-leak") {
    val t = DocxText.compute(DocxSynth.docxBytes(3L)).getUTF8String(2).toString
    val lines = t.split("\n", -1)
    assert(lines(1) == "split run 3", "split runs + preserve-space join")
    assert(lines(2) == "tab\tafter 3", "w:tab renders a tab")
    assert(lines(3).contains("& lt < dash —"), "entity decoding")
    assert(lines(4) == "line one" || t.contains("line one\nline two 3"),
      "w:br renders a newline inside its paragraph")
    assert(t.contains("cell 1 1 3"), "table cells extract in order")
    assert(!t.contains("Heading1") && !t.contains("w:b"),
      "run/paragraph properties must not leak")
    assert(t.split("\n", -1).last == "", "empty w:p is an empty line")
  }

  test("reject matrix: missing parts, torn XML, corrupt members, sweeps") {
    def fmt(b: Array[Byte]): String =
      DocxText.compute(b).getUTF8String(0).toString
    val ok = DocxSynth.docxBytes(5L)
    assert(fmt(ok) == "docx")
    // not a zip at all
    assert(fmt("plain text, no archive".getBytes(Utf8)) == "unknown")
    // an OPC package without word/document.xml (EPUB fixture)
    assert(fmt(EpubSynth.epubBytes(1L)) == "unknown")
    // a zip without [Content_Types].xml carrying a document.xml
    val noTypes = ZipSynth.writeArchive(Seq(
      ("word/document.xml", 8,
        DocxSynth.documentXml(5L).getBytes(Utf8), Array.emptyByteArray)), "")
    assert(fmt(noTypes) == "unknown", "missing [Content_Types].xml rejects")
    // torn WML: an unclosed w:t / w:p must reject, not emit partial text
    def withXml(xml: String): Array[Byte] = ZipSynth.writeArchive(Seq(
      ("[Content_Types].xml", 8, "<Types/>".getBytes(Utf8), Array.emptyByteArray),
      ("word/document.xml", 8, xml.getBytes(Utf8), Array.emptyByteArray)), "")
    assert(fmt(withXml("<w:body><w:p><w:r><w:t>half")) == "unknown")
    assert(fmt(withXml("<w:body><w:p><w:r><w:t>half</w:t>")) == "unknown")
    assert(fmt(withXml("<w:body><w:p><w:r><w:t>x</w:t></w:r></w:p>")) == "docx")
    // a flipped payload byte fails the container CRC gate
    val r = ZipEntries.compute(ok)
    val off = r.getArray(1).getStruct(3, 6).getLong(2)
    val c = ok.clone()
    c(off.toInt) = (c(off.toInt) ^ 1).toByte
    assert(fmt(c) == "unknown", "corrupt member must fail the CRC gate")
    // truncation + bit-flip sweeps: classify, never throw
    var k = 0
    while (k < ok.length) { DocxText.compute(ok.take(k)); k += 17 }
    var p = 0
    while (p < ok.length) {
      val c2 = ok.clone()
      c2(p) = (c2(p) ^ 0x10).toByte
      DocxText.compute(c2)
      p += 23
    }
  }

  test("composition: extracted text feeds token stats and shingles") {
    val t = DocxText.compute(DocxSynth.docxBytes(9L)).getUTF8String(2).toString
    val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
    assert(toks.size >= 15, "enough tokens for shingling")
    assert(toks.sliding(3).map(_.mkString(" ")).toSeq.distinct.size > 5)
  }
}
