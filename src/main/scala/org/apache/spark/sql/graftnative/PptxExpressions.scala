package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PPTX text extraction — presentations round out the office family
  * (ECMA-376 PresentationML): the verified ZIP walk surfaces the
  * `ppt/slides/slideN.xml` members (ordered by their slide NUMBER,
  * not the archive's member order — packages legally store them
  * shuffled), and each slide's DrawingML walk assembles text:
  *
  *  - each `<a:p>` paragraph is one line within its slide; lines
  *    join with `\n`; `<a:br/>` is a newline inside its paragraph;
  *  - `<a:t>` runs contribute verbatim with XML entities decoded;
  *    run properties (`<a:rPr>`) and the layout tree contribute
  *    nothing;
  *  - output is one row per slide `(slide_idx, text)` — the shape
  *    pdf_text established for paged documents.
  *
  * Honest rejects: unreadable archive, missing `[Content_Types].xml`,
  * no slide members, torn markup, or an `<a:t>` left open at EOF.
  */
case class PptxText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = PptxText.schema
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    PptxText.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.PptxText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PptxText {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_slides", IntegerType, nullable = true),
    StructField("slides", ArrayType(StructType(Seq(
      StructField("slide_idx", IntegerType, nullable = false),
      StructField("text", StringType, nullable = false))),
      containsNull = false), nullable = true)))

  private val FmtPptx = UTF8String.fromString("pptx")
  private val FmtUnknown = UTF8String.fromString("unknown")
  private val MaxSlides = 4096
  private val MaxTextChars = 1 << 22

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null, null))

  private val SlideName = "^ppt/slides/slide([0-9]+)\\.xml$".r

  /** One slide's DrawingML walk; null if torn. */
  private[graftnative] def extractSlide(xml: String, budget: Int): String = {
    val n = xml.length
    val lines = new java.util.ArrayList[String]()
    val para = new StringBuilder()
    var inP = false
    var inT = false
    var total = 0
    var i = 0
    def flush(): Unit = {
      total += para.length + 1
      if (total > budget) throw new IllegalStateException("pptx caps")
      lines.add(para.toString)
      para.setLength(0)
    }
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) {
        if (inT || inP) return null
        i = n
      } else {
        if (lt > i && inT) DocxText.decodeXmlInto(xml.substring(i, lt), para)
        if (xml.startsWith("<!--", lt)) {
          val close = xml.indexOf("-->", lt + 4)
          if (close < 0) return null
          i = close + 3
        } else {
          var j = lt + 1
          var quote: Char = 0
          var end = -1
          while (end < 0 && j < n) {
            val c = xml.charAt(j)
            if (quote != 0) { if (c == quote) quote = 0 }
            else if (c == '"' || c == '\'') quote = c
            else if (c == '>') end = j
            j += 1
          }
          if (end < 0) return null
          val inner = xml.substring(lt + 1, end)
          val closing = inner.startsWith("/")
          val selfClosed = inner.endsWith("/")
          val body = if (closing) inner.substring(1) else inner
          var k = 0
          while (k < body.length && (Character.isLetterOrDigit(body.charAt(k)) ||
            body.charAt(k) == ':')) k += 1
          val name = body.substring(0, k)
          i = end + 1
          name match {
            case "a:p" =>
              if (closing) { if (!inP) return null; flush(); inP = false }
              else if (selfClosed) flush()
              else { if (inP) return null; inP = true }
            case "a:t" =>
              if (closing) { if (!inT) return null; inT = false }
              else if (!selfClosed) { if (inT) return null; inT = true }
            case "a:br" => if (!closing && inP) para.append('\n')
            case _ =>
          }
        }
      }
    }
    if (inP || inT) return null
    val sb = new StringBuilder()
    var li = 0
    while (li < lines.size()) {
      if (li > 0) sb.append('\n')
      sb.append(lines.get(li))
      li += 1
    }
    sb.toString
  }

  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 22) return unknown
    val entries = ZipEntries.decodedEntries(b)
    if (entries == null) return unknown
    var hasTypes = false
    val slides = new java.util.TreeMap[Int, Array[Byte]]()
    var e = 0
    while (e < entries.length) {
      val en = entries(e)
      if (en.name == "[Content_Types].xml") hasTypes = true
      else en.name match {
        case SlideName(num) =>
          val idx = num.toIntOption.getOrElse(-1)
          if (idx < 1 || idx > MaxSlides) return unknown
          if (slides.put(idx, en.data) != null) return unknown // dup slide
        case _ =>
      }
      e += 1
    }
    if (!hasTypes || slides.isEmpty) return unknown
    val rows = new Array[Any](slides.size())
    var total = 0
    var outIdx = 0
    val it = slides.entrySet().iterator()
    try {
      while (it.hasNext) {
        val kv = it.next()
        val xml = new String(kv.getValue,
          java.nio.charset.StandardCharsets.UTF_8)
        val text = extractSlide(xml, MaxTextChars - total)
        if (text == null) return unknown
        total += text.length
        rows(outIdx) = new GenericInternalRow(
          Array[Any](outIdx, UTF8String.fromString(text)))
        outIdx += 1
      }
    } catch {
      case _: IllegalStateException => return unknown
    }
    new GenericInternalRow(Array[Any](FmtPptx, slides.size(),
      new GenericArrayData(rows)))
  }
}

/** Fixture ENCODER for [[PptxText]]: a real PresentationML package
  * whose slide texts are a pure seed formula. Slides are written to
  * the archive in REVERSE numeric order (slide3 before slide1), so
  * numeric-order assembly sits on the hash; each slide carries a
  * title paragraph, split runs, an `<a:br/>`, entities, and shape
  * scaffolding that must not leak.
  */
object PptxSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nSlides(doc: Long): Int = 1 + fm(doc, 3)

  def slideText(doc: Long, s: Int): String =
    s"Slide ${s + 1} of deck $doc\n" +
      s"bullet one $doc $s\n" +
      s"two-line${'\n'}bullet ${fm(doc + s, 5)}\n" +
      s"amp & done $s"

  private def slideXml(doc: Long, s: Int): String =
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
      "<p:sld xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\" " +
      "xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\">" +
      "<p:cSld><p:spTree>" +
      "<p:sp><p:txBody><a:bodyPr/>" +
      s"<a:p><a:r><a:rPr b=\"1\"/><a:t>Slide ${s + 1} of deck $doc</a:t>" +
      "</a:r></a:p>" +
      s"<a:p><a:r><a:t>bullet </a:t></a:r><a:r><a:t>one $doc $s</a:t>" +
      "</a:r></a:p>" +
      s"<a:p><a:r><a:t>two-line</a:t></a:r><a:br/><a:r>" +
      s"<a:t>bullet ${fm(doc + s, 5)}</a:t></a:r></a:p>" +
      s"<a:p><a:r><a:t>amp &amp; done $s</a:t></a:r></a:p>" +
      "</p:txBody></p:sp>" +
      "</p:spTree></p:cSld></p:sld>"

  private val ContentTypes =
    "<?xml version=\"1.0\"?><Types xmlns=\"http://schemas.openxmlformats." +
      "org/package/2006/content-types\"><Default Extension=\"xml\" " +
      "ContentType=\"application/xml\"/></Types>"

  def pptxBytes(doc: Long): Array[Byte] = {
    if (doc < 0) return null
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val members = Seq(("[Content_Types].xml", 8,
      ContentTypes.getBytes(utf8), Array.emptyByteArray)) ++
      // reverse order: assembly must sort by slide number
      (nSlides(doc) - 1 to 0 by -1).map { s =>
        (s"ppt/slides/slide${s + 1}.xml", 8,
          slideXml(doc, s).getBytes(utf8), Array.emptyByteArray)
      }
    ZipSynth.writeArchive(members, "", ZipSynth.zip64Mode(doc))
  }
}

/** Expression wrapping [[PptxSynth.pptxBytes]]. */
case class SynthPptx(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    PptxSynth.pptxBytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.PptxSynth.pptxBytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PptxFunctions {
  /** Column API: PPTX (PresentationML) slide-text extraction. */
  def pptx_text(payload: Column): Column =
    ExpressionUtils.column(PptxText(ExpressionUtils.expression(payload)))

  /** Column API: PresentationML fixture from a doc seed. */
  def synth_pptx(doc: Column): Column =
    ExpressionUtils.column(SynthPptx(ExpressionUtils.expression(doc)))
}
