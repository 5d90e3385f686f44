package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Markdown → text stripping — README/docs corpora are one of the
  * largest public text sources, and their markup inflates shingle
  * sets exactly like HTML chrome does. FIXED line-oriented CommonMark
  * subset, documented so the oracle can replay it:
  *
  *  - ATX headings `#…# text` → `text` (closing hashes trimmed);
  *    setext underlines (`===`/`---` under a nonempty line) drop, the
  *    line above stays;
  *  - list markers (`- * +` and `N.`/`N)`) and blockquote `>` prefixes
  *    strip (repeatedly, so nested quotes flatten);
  *  - FENCED code blocks keep their content verbatim, fences drop
  *    (code is corpus text; the fence is markup); inline backtick
  *    spans keep content;
  *  - emphasis/strong delimiters `*`/`**`/`_`/`__` strip when paired
  *    within a line; links `[text](url)` and images `![alt](url)`
  *    keep text/alt and drop the target; autolinks `<https://…>` keep
  *    the URL; reference definitions `[id]: url` drop entirely;
  *  - thematic breaks (`---`, `***`, `___` alone) drop; HTML blocks
  *    pass through [[HtmlTextExtract]]-style stripping of tags is NOT
  *    attempted — raw HTML lines pass through verbatim (disclosed:
  *    mixed Markdown/HTML routes through html_text first);
  *  - blank lines collapse runs; output lines join with `\n`.
  */
case class MarkdownText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      MarkdownText.compute(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"org.apache.spark.sql.graftnative.MarkdownText.compute($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkdownText {

  private def isThematicBreak(t: String): Boolean = {
    val s = t.replace(" ", "")
    s.length >= 3 && (s.forall(_ == '-') || s.forall(_ == '*') ||
      s.forall(_ == '_'))
  }

  private def isSetextUnderline(t: String): Boolean = {
    val s = t.trim
    s.length >= 1 && (s.forall(_ == '=') || s.forall(_ == '-'))
  }

  /** Strip inline markup from one line (emphasis, code, links). */
  private[graftnative] def inline(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '\\' if i + 1 < n && "\\`*_{}[]()#+-.!>".indexOf(s.charAt(i + 1)) >= 0 =>
          out.append(s.charAt(i + 1)); i += 2
        case '`' =>
          // inline code: content verbatim between matching backtick runs
          var run = 0
          while (i + run < n && s.charAt(i + run) == '`') run += 1
          val close = s.indexOf("`" * run, i + run)
          if (close < 0) { out.append(c); i += 1 }
          else { out.append(s.substring(i + run, close)); i = close + run }
        case '*' | '_' =>
          // paired emphasis delimiters strip (content recursed);
          // unpaired runs pass through
          var run = 0
          while (i + run < n && s.charAt(i + run) == c) run += 1
          val delim = c.toString * run
          val close = s.indexOf(delim, i + run)
          if (close >= 0) {
            out.append(inline(s.substring(i + run, close)))
            i = close + run
          } else { out.append(delim); i += run }
        case '!' if i + 1 < n && s.charAt(i + 1) == '[' =>
          i += 1 // image: fall through to the link rule on '['
        case '[' =>
          val closeB = s.indexOf(']', i + 1)
          if (closeB < 0) { out.append(c); i += 1 }
          else if (closeB + 1 < n && s.charAt(closeB + 1) == '(') {
            val closeP = s.indexOf(')', closeB + 2)
            if (closeP < 0) { out.append(c); i += 1 }
            else { out.append(inline(s.substring(i + 1, closeB))); i = closeP + 1 }
          } else if (closeB + 1 < n && s.charAt(closeB + 1) == '[') {
            val closeR = s.indexOf(']', closeB + 2)
            if (closeR < 0) { out.append(c); i += 1 }
            else { out.append(inline(s.substring(i + 1, closeB))); i = closeR + 1 }
          } else { out.append(c); i += 1 }
        case '<' =>
          // autolink: <scheme://…> keeps the URL
          val closeA = s.indexOf('>', i + 1)
          if (closeA > 0 && s.substring(i + 1, closeA).contains("://") &&
            !s.substring(i + 1, closeA).exists(ch => ch == ' ' || ch == '<')) {
            out.append(s.substring(i + 1, closeA))
            i = closeA + 1
          } else { out.append(c); i += 1 }
        case _ => out.append(c); i += 1
      }
    }
    out.toString
  }

  def compute(md: String): String = {
    val lines = md.split("\n", -1)
    val out = new java.util.ArrayList[String]()
    var inFence = false
    var fenceMark = ""
    var i = 0
    while (i < lines.length) {
      val raw = lines(i).stripSuffix("\r")
      val t = raw.trim
      if (inFence) {
        if (t.startsWith(fenceMark)) inFence = false
        else out.add(raw) // code content verbatim
      } else if (t.startsWith("```") || t.startsWith("~~~")) {
        inFence = true
        fenceMark = t.substring(0, 3)
      } else if (t.isEmpty) {
        if (!out.isEmpty && out.get(out.size() - 1).nonEmpty) out.add("")
      } else if (isThematicBreak(t) &&
        (out.isEmpty || out.get(out.size() - 1).isEmpty)) {
        // a --- after text would be a setext underline; skip only the
        // true break form (preceded by blank/document start)
      } else if (isSetextUnderline(t) && !out.isEmpty &&
        out.get(out.size() - 1).nonEmpty) {
        // underline of the heading above: drop
      } else {
        var s = t
        // blockquote prefixes, repeatedly
        while (s.startsWith(">")) s = s.substring(1).trim
        // ATX heading
        if (s.startsWith("#")) {
          var h = 0
          while (h < s.length && s.charAt(h) == '#') h += 1
          if (h <= 6 && (h >= s.length || s.charAt(h) == ' ')) {
            s = s.substring(h).trim
            while (s.endsWith("#")) s = s.substring(0, s.length - 1)
            s = s.trim
          }
        } else {
          // list markers
          if (s.length >= 2 && "-*+".indexOf(s.charAt(0)) >= 0 &&
            s.charAt(1) == ' ') s = s.substring(2).trim
          else {
            var d = 0
            while (d < s.length && Character.isDigit(s.charAt(d))) d += 1
            if (d > 0 && d + 1 < s.length &&
              (s.charAt(d) == '.' || s.charAt(d) == ')') &&
              s.charAt(d + 1) == ' ') s = s.substring(d + 2).trim
          }
        }
        // reference definition: [id]: target — drop the whole line
        val isRefDef = s.startsWith("[") && {
          val cb = s.indexOf("]:")
          cb > 0 && cb + 2 <= s.length
        }
        if (!isRefDef) {
          val stripped = inline(s)
          if (stripped.nonEmpty) out.add(stripped)
        }
      }
      i += 1
    }
    // trim leading/trailing blank lines
    while (!out.isEmpty && out.get(0).isEmpty) out.remove(0)
    while (!out.isEmpty && out.get(out.size() - 1).isEmpty)
      out.remove(out.size() - 1)
    val sb = new StringBuilder()
    var li = 0
    while (li < out.size()) {
      if (li > 0) sb.append('\n')
      sb.append(out.get(li))
      li += 1
    }
    sb.toString
  }
}

/** Fixture for [[MarkdownText]]: a README-shaped document whose
  * stripped text is a pure seed formula — ATX + setext headings,
  * emphasis/strong/code spans, inline + reference links, an image,
  * a fenced code block kept verbatim, nested blockquotes, both list
  * forms, a thematic break, an autolink, and a reference definition
  * that must vanish.
  */
object MarkdownSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nItems(doc: Long): Int = 2 + fm(doc, 3)

  def expectedLines(doc: Long): Seq[String] =
    Seq(s"Project ${fm(doc, 100)}", "",
      s"Intro with bold ${fm(doc, 9)} and italic words plus inline code v$doc.", "",
      "Setext Title", "",
      s"see the docs ${fm(doc, 5)} and ref guide here", "",
      s"val x$doc = ${fm(doc, 7)}", s"println(x$doc)", "") ++
      (0 until nItems(doc)).map(i => s"item $i of $doc") ++
      Seq("", s"quoted wisdom $doc", "",
        s"logo-${fm(doc, 4)}", s"https://ex${fm(doc, 7)}.org/d$doc")

  def expectedText(doc: Long): String = expectedLines(doc).mkString("\n")

  def markdown(doc: Long): String = {
    val sb = new StringBuilder()
    sb.append(s"# Project ${fm(doc, 100)} #\n\n")
    sb.append(s"Intro with **bold ${fm(doc, 9)}** and *italic* words " +
      s"plus `inline code v$doc`.\n\n")
    sb.append("Setext Title\n============\n\n")
    sb.append(s"see [the docs ${fm(doc, 5)}](https://ex.org/docs) " +
      s"and [ref guide][rg] here\n\n")
    sb.append("```scala\n")
    sb.append(s"val x$doc = ${fm(doc, 7)}\n")
    sb.append(s"println(x$doc)\n")
    sb.append("```\n\n")
    for (i <- 0 until nItems(doc)) {
      if (i % 2 == 0) sb.append(s"- item $i of $doc\n")
      else sb.append(s"${i + 1}. item $i of $doc\n")
    }
    sb.append("\n---\n\n")
    sb.append(s"> > quoted wisdom $doc\n\n")
    sb.append(s"![logo-${fm(doc, 4)}](https://ex.org/logo.png)\n")
    sb.append(s"<https://ex${fm(doc, 7)}.org/d$doc>\n\n")
    sb.append("[rg]: https://ex.org/ref\n")
    sb.toString
  }
}

/** Expression wrapping [[MarkdownSynth.markdown]]. */
case class SynthMarkdown(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    UTF8String.fromString(MarkdownSynth.markdown(doc.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.spark.sql.graftnative.MarkdownSynth.markdown($d));
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkdownFunctions {
  /** Column API: Markdown → text stripping. */
  def markdown_text(md: Column): Column =
    ExpressionUtils.column(MarkdownText(ExpressionUtils.expression(md)))

  /** Column API: README-shaped fixture from a doc seed. */
  def synth_markdown(doc: Column): Column =
    ExpressionUtils.column(SynthMarkdown(ExpressionUtils.expression(doc)))
}
