package org.apache.spark.sql.graftnative

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** PDF extraction contracts: the fixture roundtrip across the
  * structural rotation (flate, indirect /Length, two-level page tree,
  * incremental updates), the COS parser edges, honest rejects, and a
  * composition check into the text-analysis surface.
  */
class PdfSpec extends AnyFunSuite {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  test("fixture roundtrip: page text across 30 seeds (all structural variants)") {
    for (doc <- 0L to 29L) {
      val b = PdfSynth.pdfBytes(doc)
      assert(b != null, s"doc $doc")
      val r = PdfText.compute(b)
      assert(r.getUTF8String(0).toString == "pdf", s"doc $doc rejected")
      assert(r.getUTF8String(1).toString == PdfSynth.version(doc))
      val np = PdfSynth.nPages(doc)
      assert(r.getInt(2) == np, s"doc $doc n_pages")
      val pages = r.getArray(3)
      assert(pages.numElements() == np)
      for (p <- 0 until np) {
        val row = pages.getStruct(p, 2)
        assert(row.getInt(0) == p)
        assert(row.getUTF8String(1).toString == PdfSynth.pageText(doc, p),
          s"doc $doc page $p:\n[${row.getUTF8String(1)}]\nvs\n[${PdfSynth.pageText(doc, p)}]")
      }
    }
  }

  test("incremental update: the NEWEST object version wins through /Prev") {
    // doc % 5 == 0 docs are updated; 10 is also an xref-STREAM doc
    // (10 % 7 == 3) and 40 an ObjStm doc (40 % 7 == 5), so the sweep
    // covers classic-over-classic, stream-over-stream, and the
    // direct-object-beats-older-COMPRESSED-object precedence
    for (doc <- Seq(0L, 10L, 15L, 40L)) {
      val r = PdfText.compute(PdfSynth.pdfBytes(doc))
      assert(r.getUTF8String(0).toString == "pdf", s"doc $doc")
      val t = r.getArray(3).getStruct(0, 2).getUTF8String(1).toString
      assert(t.contains("(updated)"), s"doc $doc must surface the update")
      assert(!t.contains("(alpha)"), s"doc $doc: stale object version read")
    }
  }

  test("PDF 1.5 forms: xref streams, PNG predictors, object streams, split contents") {
    val xrefStreamDocs = (0L to 60L).filter(PdfSynth.xrefStreamForm)
    assert(xrefStreamDocs.nonEmpty)
    for (doc <- xrefStreamDocs) {
      val r = PdfText.compute(PdfSynth.pdfBytes(doc))
      assert(r.getUTF8String(0).toString == "pdf", s"doc $doc rejected")
      for (p <- 0 until PdfSynth.nPages(doc))
        assert(r.getArray(3).getStruct(p, 2).getUTF8String(1).toString ==
          PdfSynth.pageText(doc, p), s"doc $doc page $p")
    }
    // split-contents docs (doc % 4 == 3) reassemble across the stream
    // boundary with BT held open
    for (doc <- Seq(3L, 7L, 19L)) {
      val r = PdfText.compute(PdfSynth.pdfBytes(doc))
      assert(r.getArray(3).getStruct(0, 2).getUTF8String(1).toString ==
        PdfSynth.pageText(doc, 0), s"doc $doc split contents")
    }
  }

  test("COS parser edges: octal/paren escapes, hex odd digit, name escapes, kern rule") {
    def onePage(content: String): String = {
      val b = new java.io.ByteArrayOutputStream()
      def raw(s: String): Unit = { val x = s.getBytes(Latin1); b.write(x, 0, x.length) }
      val offs = scala.collection.mutable.Map[Int, Int]()
      raw("%PDF-1.7\n")
      def obj(n: Int, s: String): Unit = { offs(n) = b.size(); raw(s"$n 0 obj\n$s\nendobj\n") }
      obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
      obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
      offs(4) = b.size()
      raw(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
      val xr = b.size()
      raw("xref\n0 1\n0000000000 65535 f \n")
      Seq(1, 2, 3, 4).foreach(n => raw(f"$n 1\n${offs(n)}%010d 00000 n \n"))
      raw("trailer\n<< /Size 8 /Root 1 0 R >>\n")
      raw(s"startxref\n$xr\n%%EOF\n")
      val r = PdfText.compute(b.toByteArray)
      assert(r.getUTF8String(0).toString == "pdf", s"rejected: $content")
      r.getArray(3).getStruct(0, 2).getUTF8String(1).toString
    }
    // octal escape, line continuation, balanced nested parens
    assert(onePage("BT (a\\101b) Tj ET") == "aAb")
    assert(onePage("BT (l1\\\nl2) Tj ET") == "l1l2")
    assert(onePage("BT (x (nested) y) Tj ET") == "x (nested) y")
    // hex string with odd digit count: last nibble zero-padded
    assert(onePage("BT <414> Tj ET") == "A@")
    // kern threshold: -180 inserts a space, -179 does not
    assert(onePage("BT [(a) -180 (b) -179 (c)] TJ ET") == "a bc")
    // text outside BT/ET never shows
    assert(onePage("(ghost) Tj BT (real) Tj ET") == "real")
    // the quote operators start lines
    assert(onePage("BT (a) Tj (b) ' (c) \" ET") == "a\nb\nc")
  }

  test("honest rejects: encryption, Type0 fonts, torn files") {
    val ok = PdfSynth.pdfBytes(1L)
    def fmt(b: Array[Byte]): String = PdfText.compute(b).getUTF8String(0).toString
    assert(fmt(ok) == "pdf")
    // torn tail (startxref gone)
    assert(fmt(ok.take(ok.length - 24)) == "unknown")
    // no header
    assert(fmt("hello world this is not a pdf at all".getBytes(Latin1)) == "unknown")
    // /Encrypt in the trailer
    val s = new String(ok, Latin1)
    val enc = s.replace("/Size 70", "/Size 70 /Encrypt 9 0 R")
    // offsets unchanged: the trailer sits after every object
    assert(fmt(enc.getBytes(Latin1)) == "unknown", "encrypted must reject")
    // a Type0 font in the resources
    val t0 = new String(PdfSynth.pdfBytes(2L), Latin1)
      .replace("/Subtype /Type1", "/Subtype /Type0")
    assert(fmt(t0.getBytes(Latin1)) == "unknown", "CID-keyed must reject")
    // truncation sweep: classify, never throw
    var k = 0
    while (k < ok.length) {
      PdfText.compute(ok.take(k))
      k += 13
    }
    // bit-flip sweep
    var p = 0
    while (p < ok.length) {
      val c = ok.clone()
      c(p) = (c(p) ^ 0x08).toByte
      PdfText.compute(c)
      p += 29
    }
  }

  test("xref-stream rejects: corrupt W, broken predictor columns, torn entry data") {
    // doc 3 is the plain xref-stream form; surgically corrupt its
    // /W array — [1 4 2] -> [1 4 9] makes rows overrun the data
    val ok = PdfSynth.pdfBytes(3L)
    val s = new String(ok, Latin1)
    def fmt(b: Array[Byte]): String = PdfText.compute(b).getUTF8String(0).toString
    assert(fmt(ok) == "pdf")
    val badW = s.replace("/W [1 4 2]", "/W [1 4 9]")
    assert(badW != s, "fixture must carry the W array")
    assert(fmt(badW.getBytes(Latin1)) == "unknown", "oversized W rows reject")
    // doc 5 runs the PNG predictor; claim a wrong Columns count
    val okP = PdfSynth.pdfBytes(5L)
    val sp = new String(okP, Latin1)
    assert(fmt(okP) == "pdf")
    val badCols = sp.replace("/Columns 7", "/Columns 6")
    assert(badCols != sp)
    assert(fmt(badCols.getBytes(Latin1)) == "unknown",
      "predictor row misalignment rejects")
  }

  test("composition: extracted pages feed the text-analysis surface") {
    // the shape the pipeline brief cares about: pdf_text output is a
    // (doc, text) corpus — shingles and token stats must compute on it
    val r = PdfText.compute(PdfSynth.pdfBytes(7L))
    val text = (0 until r.getInt(2))
      .map(p => r.getArray(3).getStruct(p, 2).getUTF8String(1).toString)
      .mkString("\n")
    val toks = text.split("\\s+").toSeq
    assert(toks.size >= 12, "enough tokens for 3-gram shingles")
    val shingles = toks.sliding(3).map(_.mkString(" ")).toSeq
    assert(shingles.distinct.size > 4)
    assert(text.contains("Doc 7 page 0"))
  }
}
