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

  test("Type0/ToUnicode: CID docs extract, ligature/surrogate dsts decode, sweeps hold") {
    // fixture rotation: doc % 11 == 7 routes the page body through a
    // composite /F2 whose codes are NOT ASCII — the roundtrip sweep
    // already asserts text equality; here pin the route explicitly
    val t0docs = (0L to 60L).filter(PdfSynth.type0)
    assert(t0docs.nonEmpty)
    for (doc <- t0docs) {
      val r = PdfText.compute(PdfSynth.pdfBytes(doc))
      assert(r.getUTF8String(0).toString == "pdf", s"doc $doc rejected")
      for (p <- 0 until PdfSynth.nPages(doc))
        assert(r.getArray(3).getStruct(p, 2).getUTF8String(1).toString ==
          PdfSynth.pageText(doc, p), s"doc $doc page $p")
    }
    // a hand-built CMap with a MULTI-UNIT dst (ff ligature) and a
    // SURROGATE-PAIR dst (U+1D400): both decode through UTF-16BE
    def mini(cmap: String, show: String): (String, String) = {
      val b = new java.io.ByteArrayOutputStream()
      def raw(s: String): Unit = { val x = s.getBytes(Latin1); b.write(x, 0, x.length) }
      val offs = scala.collection.mutable.Map[Int, Int]()
      raw("%PDF-1.7\n")
      def obj(n: Int, s: String): Unit = { offs(n) = b.size(); raw(s"$n 0 obj\n$s\nendobj\n") }
      obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
      obj(3, "<< /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /G 5 0 R >> >> /Contents 4 0 R >>")
      val content = s"BT /G 10 Tf $show Tj ET"
      offs(4) = b.size()
      raw(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
      obj(5, "<< /Type /Font /Subtype /Type0 /BaseFont /T /Encoding /Identity-H " +
        "/DescendantFonts [6 0 R] /ToUnicode 7 0 R >>")
      obj(6, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /T >>")
      offs(7) = b.size()
      raw(s"7 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n")
      val xr = b.size()
      raw("xref\n0 1\n0000000000 65535 f \n")
      Seq(1, 2, 3, 4, 5, 6, 7).foreach(n => raw(f"$n 1\n${offs(n)}%010d 00000 n \n"))
      raw("trailer\n<< /Size 8 /Root 1 0 R >>\n")
      raw(s"startxref\n$xr\n%%EOF\n")
      val r = PdfText.compute(b.toByteArray)
      val fmt = r.getUTF8String(0).toString
      (fmt, if (fmt == "pdf")
        r.getArray(3).getStruct(0, 2).getUTF8String(1).toString else null)
    }
    val cmap =
      """begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |3 beginbfchar
        |<0001> <00660066>
        |<0002> <D835DC00>
        |<0003> <0058>
        |endbfchar
        |endcmap""".stripMargin
    assert(mini(cmap, "<000100020003>") ==
      (("pdf", "ff" + "𝐀" + "X")))
    // unmapped code: honest reject
    assert(mini(cmap, "<0009>")._1 == "unknown")
    // torn code (odd byte count against 2-byte codes): reject
    assert(mini(cmap, "<000100>")._1 == "unknown")
    // truncation + bit-flip sweeps over a type0 doc (CMap included)
    val ok = PdfSynth.pdfBytes(7L)
    var k = 0
    while (k < ok.length) { PdfText.compute(ok.take(k)); k += 13 }
    var p = 0
    while (p < ok.length) {
      val c = ok.clone()
      c(p) = (c(p) ^ 0x08).toByte
      PdfText.compute(c)
      p += 29
    }
  }

  test("hybrid /XRefStm: the stream side-channel wins over the classic chain") {
    val hybridDocs = (0L to 120L).filter(PdfSynth.hybridUpdate)
    assert(hybridDocs.nonEmpty)
    for (doc <- hybridDocs) {
      val ok = PdfSynth.pdfBytes(doc)
      val r = PdfText.compute(ok)
      assert(r.getUTF8String(0).toString == "pdf", s"doc $doc rejected")
      val t = r.getArray(3).getStruct(0, 2).getUTF8String(1).toString
      assert(t == PdfSynth.pageText(doc, 0), s"doc $doc page 0")
      assert(t.contains("(updated)"), s"doc $doc must surface the hybrid update")
      // the DIVERGENCE proof: strip the /XRefStm key and the very same
      // file resolves the content stream through the classic chain to
      // the STALE version — the side channel is load-bearing
      val s = new String(ok, Latin1)
      val at = s.lastIndexOf(" /XRefStm ")
      assert(at > 0, s"doc $doc trailer must carry /XRefStm")
      val end = s.indexOf(" >>", at)
      val stripped = (s.substring(0, at) + s.substring(end)).getBytes(Latin1)
      val r2 = PdfText.compute(stripped)
      assert(r2.getUTF8String(0).toString == "pdf", s"doc $doc stripped rejected")
      val t2 = r2.getArray(3).getStruct(0, 2).getUTF8String(1).toString
      assert(t2.contains("(alpha)") && !t2.contains("(updated)"),
        s"doc $doc: classic-only resolution should have yielded the stale text")
    }
  }

  test("incremental delete: a freed object must NOT resurrect from an older section") {
    // r14 ADVICE: free entries were not recorded in the newest-wins
    // set, so an object deleted by a newer update silently resolved to
    // its stale older version. Freeing page 0's content stream must
    // now make the fetch fail (honest reject), not read the old bytes.
    val ok = PdfSynth.pdfBytes(1L) // classic form, no update
    def fmt(b: Array[Byte]): String = PdfText.compute(b).getUTF8String(0).toString
    assert(fmt(ok) == "pdf")
    val s = new String(ok, Latin1)
    val prevAt = {
      val at = s.lastIndexOf("startxref")
      s.substring(at + 10, s.indexOf('\n', at + 10)).trim.toInt
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(ok, 0, ok.length)
    val xr = out.size()
    val upd = s"xref\n20 1\n0000000000 65535 f \n" +
      s"trailer\n<< /Size 70 /Root 1 0 R /Prev $prevAt >>\n" +
      s"startxref\n$xr\n%%EOF\n"
    val ub = upd.getBytes(Latin1)
    out.write(ub, 0, ub.length)
    assert(fmt(out.toByteArray) == "unknown",
      "freed content object resurrected from the older xref section")
  }

  test("content-stream /DecodeParms: PNG predictor decodes, TIFF and filterless reject") {
    def onePageStream(dict: String, data: Array[Byte]): (String, String) = {
      val b = new java.io.ByteArrayOutputStream()
      def raw(s: String): Unit = { val x = s.getBytes(Latin1); b.write(x, 0, x.length) }
      val offs = scala.collection.mutable.Map[Int, Int]()
      raw("%PDF-1.7\n")
      def obj(n: Int, s: String): Unit = { offs(n) = b.size(); raw(s"$n 0 obj\n$s\nendobj\n") }
      obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
      obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
      offs(4) = b.size()
      raw(s"4 0 obj\n$dict\nstream\n")
      b.write(data, 0, data.length)
      raw("\nendstream\nendobj\n")
      val xr = b.size()
      raw("xref\n0 1\n0000000000 65535 f \n")
      Seq(1, 2, 3, 4).foreach(n => raw(f"$n 1\n${offs(n)}%010d 00000 n \n"))
      raw("trailer\n<< /Size 8 /Root 1 0 R >>\n")
      raw(s"startxref\n$xr\n%%EOF\n")
      val r = PdfText.compute(b.toByteArray)
      val fmt = r.getUTF8String(0).toString
      if (fmt != "pdf") (fmt, null)
      else (fmt, r.getArray(3).getStruct(0, 2).getUTF8String(1).toString)
    }
    // PNG Up (predictor 12) filtered content over Columns = 8
    val cols = 8
    val content = {
      val base = "BT (pred ok) Tj ET".getBytes(Latin1)
      val padded = java.util.Arrays.copyOf(base,
        ((base.length + cols - 1) / cols) * cols)
      java.util.Arrays.fill(padded, base.length, padded.length, ' '.toByte)
      padded
    }
    val filtered = {
      val o = new java.io.ByteArrayOutputStream()
      var r = 0
      while (r < content.length / cols) {
        o.write(2) // PNG Up
        var x = 0
        while (x < cols) {
          val cur = content(r * cols + x) & 0xFF
          val up = if (r > 0) content((r - 1) * cols + x) & 0xFF else 0
          o.write((cur - up) & 0xFF)
          x += 1
        }
        r += 1
      }
      o.toByteArray
    }
    val z = {
      val d = new java.util.zip.Deflater()
      d.setInput(filtered); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end()
      o.toByteArray
    }
    val png = onePageStream(s"<< /Length ${z.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $cols >> >>", z)
    assert(png == (("pdf", "pred ok")),
      s"PNG-predictor content must decode through the unfilter: $png")
    // r14 ADVICE regression shape: the same stream with the predictor
    // SILENTLY DROPPED from handling would yield filtered garbage —
    // claim TIFF predictor 2 instead: honest reject
    val tiff = onePageStream(s"<< /Length ${z.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 2 /Columns $cols >> >>", z)
    assert(tiff._1 == "unknown", "TIFF predictor must reject")
    // a predictor on an UNFILTERED stream is malformed: reject
    val nofil = onePageStream(s"<< /Length ${filtered.length} " +
      s"/DecodeParms << /Predictor 12 /Columns $cols >> >>", filtered)
    assert(nofil._1 == "unknown", "predictor without a filter must reject")
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
