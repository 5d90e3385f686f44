package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ODT text extraction — the OpenDocument (ODF 1.2 / ISO 26300) half
  * of the office-document family, sharing DOCX's container machinery:
  * the verified ZIP walk surfaces `content.xml`, and a linear
  * OpenDocument-text walk assembles text with FIXED rules:
  *
  *  - each `<text:p>` and `<text:h>` is one output line (document
  *    order; heading levels don't change the text), lines join with
  *    `\n`; empty paragraphs are empty lines;
  *  - character data inside paragraphs contributes verbatim with XML
  *    entities decoded; `<text:span>` and other inline markup flow
  *    into the line;
  *  - ODF's whitespace elements render: `<text:s/>` is one space,
  *    `<text:s text:c="N"/>` is N spaces (capped), `<text:tab/>` a
  *    tab, `<text:line-break/>` a newline within its paragraph;
  *  - table cells (`<table:table-cell>`) need no special casing —
  *    their paragraphs are ordinary lines;
  *  - text OUTSIDE paragraphs (styles, settings, `<office:annotation>`
  *    creator stamps…) is ignored.
  *
  * Honest rejects: not a readable archive, a `mimetype` member that
  * is present but names a non-ODT type, missing `content.xml`, torn
  * markup, or a paragraph left open at EOF.
  */
case class OdtText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = OdtText.schema
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    OdtText.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.OdtText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OdtText {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_paragraphs", IntegerType, nullable = true),
    StructField("text", StringType, nullable = true)))

  private val FmtOdt = UTF8String.fromString("odt")
  private val FmtUnknown = UTF8String.fromString("unknown")
  private val OdtMime = "application/vnd.oasis.opendocument.text"
  private val MaxParagraphs = 1 << 16
  private val MaxTextChars = 1 << 22
  private val MaxSpaceRun = 4096

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null, null))

  /** Pull `text:c="N"` out of a `<text:s …>` tag body; 1 if absent. */
  private def spaceCount(body: String): Int = {
    val at = body.indexOf("text:c=")
    if (at < 0) return 1
    val q = body.charAt(at + 7)
    if (q != '"' && q != '\'') return -1
    val end = body.indexOf(q, at + 8)
    if (end < 0) return -1
    try {
      val n = Integer.parseInt(body.substring(at + 8, end))
      if (n < 0 || n > MaxSpaceRun) -1 else n
    } catch { case _: NumberFormatException => -1 }
  }

  /** The OpenDocument-text walk over `content.xml`; null if torn. */
  private[graftnative] def extractOdf(xml: String): (Int, String) = {
    val n = xml.length
    val lines = new java.util.ArrayList[String]()
    val para = new StringBuilder()
    var depthP = 0 // text:p nests inside annotations in theory; track depth
    var total = 0
    var i = 0
    def flush(): Unit = {
      total += para.length + 1
      if (lines.size() >= MaxParagraphs || total > MaxTextChars)
        throw new IllegalStateException("odt caps")
      lines.add(para.toString)
      para.setLength(0)
    }
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) {
        if (depthP > 0) return null
        i = n
      } else {
        if (lt > i && depthP > 0) {
          val seg = new StringBuilder()
          DocxText.decodeXmlInto(xml.substring(i, lt), seg)
          para.append(seg)
        }
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
            body.charAt(k) == ':' || body.charAt(k) == '-')) k += 1
          val name = body.substring(0, k)
          i = end + 1
          name match {
            case "text:p" | "text:h" =>
              if (closing) {
                if (depthP == 0) return null
                depthP -= 1
                if (depthP == 0) flush()
              } else if (selfClosed) { if (depthP == 0) flush() }
              else depthP += 1
            case "text:s" =>
              if (!closing && depthP > 0) {
                val c = spaceCount(body)
                if (c < 0) return null
                var s = 0
                while (s < c) { para.append(' '); s += 1 }
              }
            case "text:tab" => if (!closing && depthP > 0) para.append('\t')
            case "text:line-break" =>
              if (!closing && depthP > 0) para.append('\n')
            case _ => // styles, spans, tables, office:* scaffolding: inert
          }
        }
      }
    }
    if (depthP > 0) return null
    val sb = new StringBuilder()
    var li = 0
    while (li < lines.size()) {
      if (li > 0) sb.append('\n')
      sb.append(lines.get(li))
      li += 1
    }
    (lines.size(), sb.toString)
  }

  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 22) return unknown
    val entries = ZipEntries.decodedEntries(b)
    if (entries == null) return unknown
    var contentXml: Array[Byte] = null
    var e = 0
    while (e < entries.length) {
      val en = entries(e)
      if (en.name == "mimetype") {
        val mime = new String(en.data,
          java.nio.charset.StandardCharsets.US_ASCII)
        if (mime != OdtMime) return unknown // present but not ODT
      } else if (en.name == "content.xml") contentXml = en.data
      e += 1
    }
    if (contentXml == null) return unknown
    val xml = new String(contentXml, java.nio.charset.StandardCharsets.UTF_8)
    try {
      extractOdf(xml) match {
        case null => unknown
        case (nParas, text) =>
          new GenericInternalRow(Array[Any](FmtOdt, nParas,
            UTF8String.fromString(text)))
      }
    } catch {
      case _: IllegalStateException => unknown
    }
  }
}

/** Fixture ENCODER for [[OdtText]]: a real ODF package (STORED
  * `mimetype` first — the ODF magic-number rule — plus manifest and
  * `content.xml`) whose extracted text is a pure seed formula. The
  * content exercises every rule: a heading, split spans, `<text:s
  * text:c>` space runs, tab, line-break, entities, a table, and
  * style scaffolding that must not leak.
  */
object OdtSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nBody(doc: Long): Int = 1 + fm(doc, 3)

  def expectedLines(doc: Long): Seq[String] = {
    val body = (0 until nBody(doc)).map(i =>
      s"odt para $i of $doc " + "v" * (2 + fm(doc + i, 4)))
    Seq(s"Heading $doc",
      s"spans join $doc",
      s"gap${" " * (2 + fm(doc, 3))}end ${fm(doc, 7)}",
      s"tabbed\there $doc",
      s"break${'\n'}line $doc",
      s"ent & < $doc") ++
      body ++
      Seq(s"odt cell 0 $doc", s"odt cell 1 $doc")
  }

  def expectedText(doc: Long): String = expectedLines(doc).mkString("\n")
  def nParagraphs(doc: Long): Int = expectedLines(doc).size

  def contentXml(doc: Long): String = {
    val sb = new StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<office:document-content xmlns:office=\"urn:oasis:names:tc:" +
      "opendocument:xmlns:office:1.0\" xmlns:text=\"urn:oasis:names:tc:" +
      "opendocument:xmlns:text:1.0\" xmlns:table=\"urn:oasis:names:tc:" +
      "opendocument:xmlns:table:1.0\">\n")
    sb.append("<office:automatic-styles><style:style style:name=\"P1\"/>" +
      "</office:automatic-styles>\n")
    sb.append("<office:body><office:text>\n")
    sb.append(s"""<text:h text:outline-level="1">Heading $doc</text:h>\n""")
    sb.append(s"""<text:p text:style-name="P1"><text:span>spans </text:span>""" +
      s"""<text:span>join $doc</text:span></text:p>\n""")
    sb.append(s"""<text:p>gap<text:s text:c="${2 + fm(doc, 3)}"/>end """ +
      s"""${fm(doc, 7)}</text:p>\n""")
    sb.append(s"""<text:p>tabbed<text:tab/>here $doc</text:p>\n""")
    sb.append(s"""<text:p>break<text:line-break/>line $doc</text:p>\n""")
    sb.append(s"""<text:p>ent &amp; &lt; $doc</text:p>\n""")
    for (i <- 0 until nBody(doc))
      sb.append(s"""<text:p>odt para $i of $doc """ +
        "v" * (2 + fm(doc + i, 4)) + "</text:p>\n")
    sb.append("<table:table><table:table-row>")
    for (c <- 0 until 2)
      sb.append(s"""<table:table-cell><text:p>odt cell $c $doc</text:p>""" +
        "</table:table-cell>")
    sb.append("</table:table-row></table:table>\n")
    sb.append("</office:text></office:body></office:document-content>\n")
    sb.toString
  }

  private val Manifest =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">
      |<manifest:file-entry manifest:full-path="/" manifest:media-type="application/vnd.oasis.opendocument.text"/>
      |<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>
      |</manifest:manifest>""".stripMargin

  def odtBytes(doc: Long): Array[Byte] = {
    if (doc < 0) return null
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    ZipSynth.writeArchive(Seq(
      // the ODF magic-number rule: mimetype FIRST and STORED
      ("mimetype", 0,
        "application/vnd.oasis.opendocument.text".getBytes(utf8),
        Array.emptyByteArray),
      ("META-INF/manifest.xml", 8, Manifest.getBytes(utf8),
        Array.emptyByteArray),
      ("content.xml", 8, contentXml(doc).getBytes(utf8),
        Array.emptyByteArray)),
      "", ZipSynth.zip64Mode(doc))
  }
}

/** Expression wrapping [[OdtSynth.odtBytes]]. */
case class SynthOdt(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    OdtSynth.odtBytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.OdtSynth.odtBytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OdtFunctions {
  /** Column API: ODT (OpenDocument text) extraction. */
  def odt_text(payload: Column): Column =
    ExpressionUtils.column(OdtText(ExpressionUtils.expression(payload)))

  /** Column API: ODF/ODT fixture from a doc seed. */
  def synth_odt(doc: Column): Column =
    ExpressionUtils.column(SynthOdt(ExpressionUtils.expression(doc)))
}
