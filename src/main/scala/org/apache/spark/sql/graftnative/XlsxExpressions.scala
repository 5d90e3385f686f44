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

/** XLSX cell extraction — the TABULAR office modality (ECMA-376
  * SpreadsheetML): corpora ship spreadsheets full of the structured
  * data a text pipeline wants as (row, col, value) triples, and the
  * format is an OPC ZIP like DOCX/PPTX, so the verified container
  * walk is shared. Per sheet (numeric `sheetN.xml` order):
  *
  *  - `xl/sharedStrings.xml` parses each `<si>` to the CONCATENATION
  *    of its `<t>` runs (plain and rich-run forms), entities decoded;
  *  - each `<c r="B3" t="…">` cell resolves its reference to 1-based
  *    (row, col), its type tag (`s` shared string, none/`n` numeric,
  *    `b` boolean, `str` formula-cached string, `inlineStr`), and its
  *    value — shared-string indexes LOOK UP (out-of-range rejects),
  *    everything else is the `<v>`/`<is><t>` text verbatim;
  *  - formula bodies (`<f>`) are ignored — the cached value is the
  *    data; empty cells (no value) are skipped.
  *
  * Honest rejects: unreadable archive, missing `[Content_Types].xml`
  * or sheets, malformed cell refs, unknown type tags, shared-string
  * index out of range, torn markup.
  */
case class XlsxCells(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = XlsxCells.schema
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    XlsxCells.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.XlsxCells.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XlsxCells {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_cells", IntegerType, nullable = true),
    StructField("cells", ArrayType(StructType(Seq(
      StructField("sheet", IntegerType, nullable = false),
      StructField("row", IntegerType, nullable = false),
      StructField("col", IntegerType, nullable = false),
      StructField("ctype", StringType, nullable = false),
      StructField("value", StringType, nullable = false))),
      containsNull = false), nullable = true)))

  private val FmtXlsx = UTF8String.fromString("xlsx")
  private val FmtUnknown = UTF8String.fromString("unknown")
  private val MaxCells = 1 << 20
  private val MaxSheets = 1024
  private val MaxSharedStrings = 1 << 20

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null, null))

  private val SheetName = "^xl/worksheets/sheet([0-9]+)\\.xml$".r

  /** One attribute value off a tag body, via a real quote-aware
    * attribute scan (substring probes would match inside other
    * attributes' values).
    */
  private[graftnative] def attr(body: String, key: String): String = {
    var i = 0
    while (i < body.length && !Character.isWhitespace(body.charAt(i))) i += 1
    while (i < body.length) {
      while (i < body.length &&
        (Character.isWhitespace(body.charAt(i)) || body.charAt(i) == '/'))
        i += 1
      if (i >= body.length) return null
      val st = i
      while (i < body.length && body.charAt(i) != '=' &&
        !Character.isWhitespace(body.charAt(i))) i += 1
      if (i >= body.length || body.charAt(i) != '=') return null
      val name = body.substring(st, i)
      i += 1
      if (i >= body.length) return null
      val q = body.charAt(i)
      if (q != '"' && q != '\'') return null
      val end = body.indexOf(q, i + 1)
      if (end < 0) return null
      val v = body.substring(i + 1, end)
      i = end + 1
      if (name == key) return v
    }
    null
  }

  /** Generic mini-walk: calls `onTag(name, body, closing, selfClosed)`
    * and accumulates `<t>`-delimited character data via the handler's
    * state. Returns false if the markup is torn.
    */
  private final class Tag(val name: String, val body: String,
    val closing: Boolean, val selfClosed: Boolean)

  private def walk(xml: String)(onTag: Tag => Boolean)(
      onText: String => Unit): Boolean = {
    val n = xml.length
    var i = 0
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = n }
      else {
        if (lt > i) onText(xml.substring(i, lt))
        if (xml.startsWith("<!--", lt)) {
          val close = xml.indexOf("-->", lt + 4)
          if (close < 0) return false
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
          if (end < 0) return false
          val inner = xml.substring(lt + 1, end)
          val closing = inner.startsWith("/")
          val selfClosed = inner.endsWith("/")
          val body = if (closing) inner.substring(1) else inner
          var k = 0
          while (k < body.length && (Character.isLetterOrDigit(body.charAt(k)) ||
            body.charAt(k) == ':')) k += 1
          if (!onTag(new Tag(body.substring(0, k), body, closing, selfClosed)))
            return false
          i = end + 1
        }
      }
    }
    true
  }

  /** sharedStrings.xml → the si string table (rich runs concatenated). */
  private[graftnative] def parseSharedStrings(xml: String): Array[String] = {
    val out = new java.util.ArrayList[String]()
    val cur = new StringBuilder()
    var inSi = false
    var inT = false
    val ok = walk(xml) { tag =>
      tag.name match {
        case "si" =>
          if (tag.closing) {
            if (!inSi) return null
            if (out.size() >= MaxSharedStrings) return null
            out.add(cur.toString)
            cur.setLength(0)
            inSi = false
          } else if (!tag.selfClosed) inSi = true
          true
        case "t" =>
          if (tag.closing) { if (!inT) return null; inT = false }
          else if (!tag.selfClosed) inT = true
          true
        case _ => true
      }
    } { text => if (inSi && inT) DocxText.decodeXmlInto(text, cur) }
    if (!ok || inSi || inT) return null
    out.toArray(new Array[String](out.size()))
  }

  private final class Cell(val sheet: Int, val row: Int, val col: Int,
    val ctype: String, val value: String)

  /** `B3` → (3, 2); null on a malformed reference. */
  private def parseRef(ref: String): (Int, Int) = {
    var i = 0
    var c = 0
    while (i < ref.length && ref.charAt(i) >= 'A' && ref.charAt(i) <= 'Z') {
      c = c * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    if (i == 0 || i >= ref.length || c <= 0) return null
    var r = 0
    while (i < ref.length) {
      val d = ref.charAt(i)
      if (d < '0' || d > '9') return null
      r = r * 10 + (d - '0')
      if (r > (1 << 24)) return null
      i += 1
    }
    if (r <= 0) return null
    (r, c)
  }

  private def sheetCells(xml: String, sheetIdx: Int, shared: Array[String],
      out: java.util.ArrayList[Cell]): Boolean = {
    var curRef: String = null
    var curType: String = null
    var inV = false
    var inIs = false
    var inT = false
    val valBuf = new StringBuilder()
    var haveVal = false
    val ok = walk(xml) { tag =>
      tag.name match {
        case "c" =>
          if (tag.closing || tag.selfClosed) {
            if (haveVal && curRef != null) {
              val rc = parseRef(curRef)
              if (rc == null) return false
              val t = if (curType == null) "n" else curType
              val value = t match {
                case "s" =>
                  val idx = valBuf.toString.trim.toIntOption.getOrElse(-1)
                  if (idx < 0 || idx >= shared.length) return false
                  shared(idx)
                case "n" | "str" | "b" | "inlineStr" => valBuf.toString
                case _ => return false // unknown type tag: reject
              }
              if (out.size() >= MaxCells) return false
              out.add(new Cell(sheetIdx, rc._1, rc._2,
                if (curType == null) "n" else curType, value))
            }
            curRef = null; curType = null; haveVal = false
            valBuf.setLength(0)
          } else {
            curRef = attr(tag.body, "r")
            curType = attr(tag.body, "t")
          }
          true
        case "v" =>
          if (tag.closing) { if (!inV) return false; inV = false }
          else if (!tag.selfClosed) { inV = true; haveVal = true }
          true
        case "is" =>
          if (tag.closing) { if (!inIs) return false; inIs = false }
          else if (!tag.selfClosed) inIs = true
          true
        case "t" =>
          if (tag.closing) { if (!inT) return false; inT = false }
          else if (!tag.selfClosed && inIs) { inT = true; haveVal = true }
          true
        case _ => true
      }
    } { text => if (inV || (inIs && inT)) DocxText.decodeXmlInto(text, valBuf) }
    ok && !inV && !inIs && !inT
  }

  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 22) return unknown
    val entries = ZipEntries.decodedEntries(b)
    if (entries == null) return unknown
    var hasTypes = false
    var sharedXml: Array[Byte] = null
    val sheets = new java.util.TreeMap[Int, Array[Byte]]()
    var e = 0
    while (e < entries.length) {
      val en = entries(e)
      if (en.name == "[Content_Types].xml") hasTypes = true
      else if (en.name == "xl/sharedStrings.xml") sharedXml = en.data
      else en.name match {
        case SheetName(num) =>
          val idx = num.toIntOption.getOrElse(-1)
          if (idx < 1 || idx > MaxSheets) return unknown
          if (sheets.put(idx, en.data) != null) return unknown
        case _ =>
      }
      e += 1
    }
    if (!hasTypes || sheets.isEmpty) return unknown
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val shared =
      if (sharedXml == null) Array.empty[String]
      else {
        val s = parseSharedStrings(new String(sharedXml, utf8))
        if (s == null) return unknown
        s
      }
    val cells = new java.util.ArrayList[Cell]()
    val it = sheets.entrySet().iterator()
    var sheetIdx = 1
    while (it.hasNext) {
      val kv = it.next()
      if (!sheetCells(new String(kv.getValue, utf8), sheetIdx, shared, cells))
        return unknown
      sheetIdx += 1
    }
    val rows = new Array[Any](cells.size())
    var c = 0
    while (c < cells.size()) {
      val cell = cells.get(c)
      rows(c) = new GenericInternalRow(Array[Any](cell.sheet, cell.row,
        cell.col, UTF8String.fromString(cell.ctype),
        UTF8String.fromString(cell.value)))
      c += 1
    }
    new GenericInternalRow(Array[Any](FmtXlsx, cells.size(),
      new GenericArrayData(rows)))
  }
}

/** Fixture ENCODER for [[XlsxCells]]: a SpreadsheetML package whose
  * cells are a pure seed formula — a shared-string table with a RICH
  * (split-run) entry and entities, per-row cells covering every type
  * tag (`s`, numeric, `b`, `inlineStr`), an empty cell that must be
  * skipped, a second sheet on odd docs, and members written in
  * reverse order so numeric sheet ordering sits on the hash.
  */
object XlsxSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nRows(doc: Long): Int = 2 + fm(doc, 3)
  def hasSheet2(doc: Long): Boolean = fm(doc, 2) == 1

  def sharedString(doc: Long, idx: Int): String = idx match {
    case 0 => s"name $doc"
    case 1 => s"alpha $doc"
    case _ => s"x & y ${fm(doc, 5)}"
  }

  def numValue(doc: Long, r: Int): String = s"${fm(doc * 7 + r * 13, 900)}"

  private def sharedStringsXml(doc: Long): String =
    "<?xml version=\"1.0\"?><sst xmlns=\"http://schemas.openxmlformats.org/" +
      "spreadsheetml/2006/main\" count=\"3\" uniqueCount=\"3\">" +
      s"<si><t>name $doc</t></si>" +
      s"<si><r><rPr><b/></rPr><t>al</t></r><r><t>pha $doc</t></r></si>" +
      s"<si><t>x &amp; y ${fm(doc, 5)}</t></si></sst>"

  private def sheet1Xml(doc: Long): String = {
    val sb = new StringBuilder()
    sb.append("<?xml version=\"1.0\"?><worksheet xmlns=\"http://schemas." +
      "openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    for (r <- 1 to nRows(doc)) {
      sb.append(s"""<row r="$r">""")
      sb.append(s"""<c r="A$r" t="s"><v>${fm(doc + r, 3)}</v></c>""")
      sb.append(s"""<c r="B$r"><v>${numValue(doc, r)}</v></c>""")
      sb.append(s"""<c r="C$r" t="b"><v>${fm(doc + r, 2)}</v></c>""")
      sb.append(s"""<c r="D$r" t="inlineStr"><is><t>in $doc $r</t></is></c>""")
      sb.append(s"""<c r="E$r"/>""") // empty cell: skipped
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  private def sheet2Xml(doc: Long): String =
    "<?xml version=\"1.0\"?><worksheet xmlns=\"x\"><sheetData>" +
      s"""<row r="1"><c r="A1" t="str"><v>sum ${fm(doc, 11)}</v></c>""" +
      "</row></sheetData></worksheet>"

  private val ContentTypes =
    "<?xml version=\"1.0\"?><Types xmlns=\"http://schemas.openxmlformats." +
      "org/package/2006/content-types\"><Default Extension=\"xml\" " +
      "ContentType=\"application/xml\"/></Types>"

  def xlsxBytes(doc: Long): Array[Byte] = {
    if (doc < 0) return null
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val sheets =
      (if (hasSheet2(doc))
        Seq(("xl/worksheets/sheet2.xml", 8, sheet2Xml(doc).getBytes(utf8),
          Array.emptyByteArray))
      else Nil) ++
        Seq(("xl/worksheets/sheet1.xml", 8, sheet1Xml(doc).getBytes(utf8),
          Array.emptyByteArray))
    val members = sheets ++ Seq(
      ("xl/sharedStrings.xml", 8, sharedStringsXml(doc).getBytes(utf8),
        Array.emptyByteArray),
      ("[Content_Types].xml", 8, ContentTypes.getBytes(utf8),
        Array.emptyByteArray))
    ZipSynth.writeArchive(members, "", ZipSynth.zip64Mode(doc))
  }
}

/** Expression wrapping [[XlsxSynth.xlsxBytes]]. */
case class SynthXlsx(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    XlsxSynth.xlsxBytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.XlsxSynth.xlsxBytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XlsxFunctions {
  /** Column API: XLSX (SpreadsheetML) cell extraction. */
  def xlsx_cells(payload: Column): Column =
    ExpressionUtils.column(XlsxCells(ExpressionUtils.expression(payload)))

  /** Column API: SpreadsheetML fixture from a doc seed. */
  def synth_xlsx(doc: Column): Column =
    ExpressionUtils.column(SynthXlsx(ExpressionUtils.expression(doc)))
}
