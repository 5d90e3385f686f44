package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RTF text extraction — the legacy office format email attachments
  * and old document dumps still arrive in (Microsoft RTF 1.9 spec,
  * publicly documented). A real control-word parser, not a regex:
  *
  *  - groups `{…}` maintain a state stack (the `\uc` skip-count is
  *    group-scoped, as the spec requires);
  *  - control words `\word<param>` with their space delimiter:
  *    `\par`/`\line` → newline, `\tab` → tab, `\emdash`/`\endash`/
  *    `\bullet`/`\lquote`/`\rquote`/`\ldblquote`/`\rdblquote`/`\~`
  *    render their characters; formatting words (`\b`, `\i`, `\fs24`,
  *    …) are inert;
  *  - DESTINATION groups drop with their contents: `\fonttbl`,
  *    `\colortbl`, `\stylesheet`, `\info`, `\pict`, `\field`'s
  *    `\fldinst` (the result `\fldrslt` text is kept), and every
  *    `{\*\…}` ignorable destination;
  *  - escapes: `\\ \{ \}`, hex `\'hh` mapped through Windows-1252
  *    (the 0x80–0x9F specials included — straight Latin-1 would be
  *    wrong exactly there), and `\uN` Unicode with the `\uc`
  *    fallback-skip honored (negative N wraps per the spec's signed
  *    16-bit rule);
  *  - raw `\n`/`\r` in the file are ignored (the spec: line breaks
  *    come only from control words).
  *
  * Honest rejects: input not starting `{\rtf`, unbalanced groups,
  * torn escapes.
  */
case class RtfText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = RtfText.schema
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    RtfText.compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.RtfText.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RtfText {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private val FmtRtf = UTF8String.fromString("rtf")
  private val FmtUnknown = UTF8String.fromString("unknown")
  private val MaxTextChars = 1 << 22
  private val MaxDepth = 128

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null))

  /** Windows-1252's 0x80–0x9F block (the cells that differ from
    * Latin-1); 0x81/8D/8F/90/9D are undefined → U+FFFD.
    */
  private val Cp1252High: Array[Char] = Array(
    '€', '�', '‚', 'ƒ', '„', '…', '†',
    '‡', 'ˆ', '‰', 'Š', '‹', 'Œ', '�',
    'Ž', '�', '�', '‘', '’', '“', '”',
    '•', '–', '—', '˜', '™', 'š', '›',
    'œ', '�', 'ž', 'Ÿ')

  private def cp1252(v: Int): Char =
    if (v >= 0x80 && v <= 0x9F) Cp1252High(v - 0x80) else v.toChar

  /** Destinations whose contents are dropped entirely. */
  private val DropDestinations: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("fonttbl", "colortbl", "stylesheet", "info", "pict", "fldinst",
      "header", "footer", "footnote", "object", "themedata",
      "listtable", "listoverridetable", "generator").foreach(s.add)
    s
  }

  def compute(rtf: String): InternalRow = {
    if (!rtf.startsWith("{\\rtf")) return unknown
    val n = rtf.length
    val sb = new StringBuilder()
    // group state stack: (uc skip count, suppressed?)
    var depth = 0
    val ucStack = new Array[Int](MaxDepth + 1)
    val offStack = new Array[Boolean](MaxDepth + 1)
    ucStack(0) = 1
    offStack(0) = false
    var pendingSkip = 0 // \uN fallback chars still to skip
    var i = 0
    def emit(c: Char): Boolean = {
      if (pendingSkip > 0) { pendingSkip -= 1; return true }
      if (!offStack(depth)) {
        sb.append(c)
        if (sb.length > MaxTextChars) return false
      }
      true
    }
    while (i < n) {
      val c = rtf.charAt(i)
      c match {
        case '{' =>
          depth += 1
          if (depth > MaxDepth) return unknown
          ucStack(depth) = ucStack(depth - 1)
          offStack(depth) = offStack(depth - 1)
          pendingSkip = 0
          i += 1
          // {\*\dest …}: ignorable destination — suppress the group
          if (i + 1 < n && rtf.charAt(i) == '\\' && rtf.charAt(i + 1) == '*') {
            offStack(depth) = true
            i += 2
          }
        case '}' =>
          if (depth == 0) return unknown
          depth -= 1
          pendingSkip = 0
          i += 1
        case '\\' =>
          if (i + 1 >= n) return unknown
          val d = rtf.charAt(i + 1)
          if (d == '\\' || d == '{' || d == '}') {
            if (!emit(d)) return unknown
            i += 2
          } else if (d == '\'') {
            if (i + 3 >= n) return unknown
            val h = Character.digit(rtf.charAt(i + 2), 16)
            val l = Character.digit(rtf.charAt(i + 3), 16)
            if (h < 0 || l < 0) return unknown
            if (!emit(cp1252(h * 16 + l))) return unknown
            i += 4
          } else if (d == '~') {
            if (!emit(' ')) return unknown
            i += 2
          } else if (d == '-' || d == '_' || d == ':' || d == '|') {
            i += 2 // optional hyphen & friends: no text
          } else if (Character.isLetter(d)) {
            var j = i + 1
            while (j < n && Character.isLetter(rtf.charAt(j))) j += 1
            val word = rtf.substring(i + 1, j)
            var param = 0
            var hasParam = false
            var neg = false
            if (j < n && (rtf.charAt(j) == '-' || Character.isDigit(rtf.charAt(j)))) {
              if (rtf.charAt(j) == '-') { neg = true; j += 1 }
              val ps = j
              while (j < n && Character.isDigit(rtf.charAt(j))) j += 1
              if (j > ps) {
                hasParam = true
                param = rtf.substring(ps, j).toIntOption.getOrElse(0)
                if (neg) param = -param
              } else if (neg) return unknown // bare \word- : torn
            }
            if (j < n && rtf.charAt(j) == ' ') j += 1 // the delimiter space
            word match {
              case "par" | "line" | "sect" | "page" =>
                if (!emit('\n')) return unknown
              case "tab" => if (!emit('\t')) return unknown
              case "emdash" => if (!emit('—')) return unknown
              case "endash" => if (!emit('–')) return unknown
              case "bullet" => if (!emit('•')) return unknown
              case "lquote" => if (!emit('‘')) return unknown
              case "rquote" => if (!emit('’')) return unknown
              case "ldblquote" => if (!emit('“')) return unknown
              case "rdblquote" => if (!emit('”')) return unknown
              case "uc" => ucStack(depth) = math.max(0, param)
              case "u" =>
                // signed-16-bit wrap: -10179 means 0xD83D etc.
                val cp = if (hasParam) (if (param < 0) param + 65536 else param)
                  else return unknown
                if (cp < 0 || cp > 0xFFFF) return unknown
                if (pendingSkip > 0) pendingSkip -= 1
                else if (!offStack(depth)) {
                  sb.append(cp.toChar)
                  if (sb.length > MaxTextChars) return unknown
                }
                pendingSkip = ucStack(depth)
              case w if DropDestinations.contains(w) =>
                offStack(depth) = true
              case _ => // formatting / unknown control word: inert
            }
            i = j
          } else return unknown // \<digit> etc: malformed
        case '\n' | '\r' => i += 1
        case other =>
          if (!emit(other)) return unknown
          i += 1
      }
    }
    if (depth != 0) return unknown
    new GenericInternalRow(Array[Any](FmtRtf,
      UTF8String.fromString(sb.toString)))
  }
}

/** Fixture for [[RtfText]]: a Word-shaped RTF whose extracted text is
  * a pure seed formula — font/color/stylesheet/info tables and an
  * ignorable `{\*\generator}` that must all vanish, formatting words
  * threaded through the text, `\'hh` cp1252 escapes (one from the
  * 0x80 block), `\uN` with `\uc1` fallback skips, special-character
  * words, and a `\field` whose instruction drops but whose result
  * text stays.
  */
object RtfSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nParas(doc: Long): Int = 1 + fm(doc, 3)

  def expectedText(doc: Long): String = {
    val paras = (0 until nParas(doc)).map(i =>
      s"Para $i of $doc" + "—" + s"x${fm(doc + i, 9)}")
    s"Title “doc $doc”\n" +
      s"café €${fm(doc, 50)} ×${fm(doc, 5)}\n" +
      paras.mkString("\n") + "\n" +
      s"link text ${fm(doc, 7)}\n" +
      s"tab\there $doc\n"
  }

  def rtf(doc: Long): String = {
    val sb = new StringBuilder()
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1\n")
    sb.append("{\\fonttbl{\\f0\\froman Times New Roman;}{\\f1\\fswiss Arial;}}\n")
    sb.append("{\\colortbl;\\red255\\green0\\blue0;}\n")
    sb.append("{\\stylesheet{\\s0 Normal;}}\n")
    sb.append(s"{\\info{\\title secret title $doc}{\\author nobody}}\n")
    sb.append("{\\*\\generator Graft 1.0;}\n")
    sb.append(s"\\pard\\f0\\fs24\\b Title \\ldblquote doc $doc\\rdblquote\\b0\\par\n")
    // \'e9 = é (latin-1 range), \'80 = € (the cp1252-only block),
    // \u215 ? = × with the uc1 fallback '?' skipped
    sb.append(s"caf\\'e9 \\'80${fm(doc, 50)} \\u215 ?${fm(doc, 5)}\\par\n")
    for (i <- 0 until nParas(doc))
      sb.append(s"{\\i Para $i of $doc}\\emdash x${fm(doc + i, 9)}\\par\n")
    sb.append("{\\field{\\*\\fldinst HYPERLINK \"https://ex.org\"}" +
      s"{\\fldrslt link text ${fm(doc, 7)}}}\\par\n")
    sb.append(s"tab\\tab here $doc\\par\n")
    sb.append("}")
    sb.toString
  }
}

/** Expression wrapping [[RtfSynth.rtf]]. */
case class SynthRtf(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    UTF8String.fromString(RtfSynth.rtf(doc.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.spark.sql.graftnative.RtfSynth.rtf($d));
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RtfFunctions {
  /** Column API: RTF text extraction. */
  def rtf_text(payload: Column): Column =
    ExpressionUtils.column(RtfText(ExpressionUtils.expression(payload)))

  /** Column API: Word-shaped RTF fixture from a doc seed. */
  def synth_rtf(doc: Column): Column =
    ExpressionUtils.column(SynthRtf(ExpressionUtils.expression(doc)))
}
