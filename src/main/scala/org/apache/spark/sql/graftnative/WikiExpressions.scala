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

/** MediaWiki dump parsing — Wikipedia dumps are THE canonical public
  * text corpus, shipped as `<mediawiki>` XML of `<page>` elements.
  * Per page: `title` (entity-decoded), `ns`, `id`, the `<redirect
  * title=…/>` target when present, the latest revision's `timestamp`
  * and raw `<text>` (entity-decoded — the dump double-escapes
  * wikitext). Torn markup, a page without title/id, or non-dump XML
  * rejects. Pair with [[WikitextStrip]] for plain text.
  */
case class MediawikiPages(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = MediawikiPages.schema
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    MediawikiPages.compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftnative.MediawikiPages.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediawikiPages {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_pages", IntegerType, nullable = true),
    StructField("pages", ArrayType(StructType(Seq(
      StructField("title", StringType, nullable = false),
      StructField("page_id", LongType, nullable = false),
      StructField("ns", IntegerType, nullable = false),
      StructField("redirect_to", StringType, nullable = true),
      StructField("timestamp", StringType, nullable = true),
      StructField("text", StringType, nullable = false))),
      containsNull = false), nullable = true)))

  private val FmtWiki = UTF8String.fromString("mediawiki")
  private val FmtUnknown = UTF8String.fromString("unknown")
  private val MaxPages = 1 << 16

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null, null))

  private final class Page {
    var title: String = null
    var id: Long = -1
    var ns: Int = 0
    var redirect: String = null
    var timestamp: String = null
    var text: String = ""
    var inRevision = false
    var idSeen = false // the PAGE id is the first <id> (revision has its own)
  }

  def compute(xml: String): InternalRow = {
    val n = xml.length
    var sawRoot = false
    var cur: Page = null
    var field = -1 // 0 title, 1 id, 2 ns, 3 timestamp, 4 text
    val buf = new StringBuilder()
    val out = new java.util.ArrayList[Page]()
    var i = 0
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) {
        if (cur != null || field >= 0) return unknown
        i = n
      } else {
        if (lt > i && field >= 0)
          DocxText.decodeXmlInto(xml.substring(i, lt), buf)
        if (xml.startsWith("<!--", lt)) {
          val close = xml.indexOf("-->", lt + 4)
          if (close < 0) return unknown
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
          if (end < 0) return unknown
          val inner = xml.substring(lt + 1, end)
          val closing = inner.startsWith("/")
          val selfClosed = inner.endsWith("/")
          val body = if (closing) inner.substring(1) else inner
          var k = 0
          while (k < body.length && (Character.isLetterOrDigit(body.charAt(k)) ||
            body.charAt(k) == ':')) k += 1
          val name = body.substring(0, k)
          i = end + 1
          def closeField(f: Int): Unit = if (field == f) {
            val v = buf.toString
            buf.setLength(0)
            field = -1
            if (cur != null) f match {
              case 0 => if (cur.title == null) cur.title = v.trim
              case 1 =>
                if (!cur.idSeen && !cur.inRevision) {
                  cur.id = v.trim.toLongOption.getOrElse(-1L)
                  cur.idSeen = true
                }
              case 2 => cur.ns = v.trim.toIntOption.getOrElse(0)
              case 3 => cur.timestamp = v.trim
              case 4 => cur.text = v
              case _ =>
            }
          }
          name match {
            case "mediawiki" => if (!closing) sawRoot = true
            case "page" =>
              if (closing) {
                if (cur == null) return unknown
                if (cur.title == null || cur.id < 0) return unknown
                if (out.size() >= MaxPages) return unknown
                out.add(cur)
                cur = null
              } else if (!selfClosed) {
                if (cur != null) return unknown
                cur = new Page
              }
            case "revision" =>
              if (cur != null) cur.inRevision = !closing
            case "redirect" =>
              if (cur != null && !closing) {
                val t = XlsxCells.attr(body, "title")
                if (t != null) {
                  val dec = new StringBuilder()
                  DocxText.decodeXmlInto(t, dec)
                  cur.redirect = dec.toString
                }
              }
            case "title" =>
              if (closing) closeField(0)
              else if (!selfClosed && cur != null) { field = 0 }
            case "id" =>
              if (closing) closeField(1)
              else if (!selfClosed && cur != null) { field = 1 }
            case "ns" =>
              if (closing) closeField(2)
              else if (!selfClosed && cur != null) { field = 2 }
            case "timestamp" =>
              if (closing) closeField(3)
              else if (!selfClosed && cur != null) { field = 3 }
            case "text" =>
              if (closing) closeField(4)
              else if (cur != null) {
                if (selfClosed) cur.text = ""
                else field = 4
              }
            case _ => // siteinfo, contributor, sha1, model, format…
              if (field >= 0) return unknown // nested tag inside a field
          }
        }
      }
    }
    if (!sawRoot || cur != null) return unknown
    val rows = new Array[Any](out.size())
    var r = 0
    while (r < out.size()) {
      val p = out.get(r)
      rows(r) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(p.title), p.id, p.ns,
        if (p.redirect == null) null else UTF8String.fromString(p.redirect),
        if (p.timestamp == null) null else UTF8String.fromString(p.timestamp),
        UTF8String.fromString(p.text)))
      r += 1
    }
    new GenericInternalRow(Array[Any](FmtWiki, out.size(),
      new GenericArrayData(rows)))
  }
}

/** Wikitext → plain text stripping with FIXED documented rules (the
  * WikiExtractor-style subset two engines can agree on):
  *
  *  - `{{templates}}` drop entirely, nesting honored; `{| tables |}`
  *    drop entirely (the extractor convention — table markup is not
  *    prose, and cell text without structure misleads dedup);
  *  - internal links: `[[Target]]` → `Target`, `[[T|label]]` →
  *    `label`; `File:`/`Image:`/`Category:`-namespace links drop
  *    entirely (captions are not article prose);
  *  - external links: `[url label]` → `label`, bare `[url]` drops;
  *  - `'''bold'''` / `''italic''` quotes strip when paired;
  *  - `<ref …>…</ref>` drops WITH content (`<ref …/>` likewise);
  *    `<nowiki>` keeps its content verbatim; HTML comments drop; any
  *    other tag drops, its inner text flowing through;
  *  - `== Heading ==` keeps the text; `*`/`#`/`:`/`;` list/indent
  *    prefixes strip (repeatedly); `----` rules drop; blank-line runs
  *    collapse; lines join with `\n`.
  */
case class WikitextStrip(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      WikitextStrip.compute(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"org.apache.spark.sql.graftnative.WikitextStrip.compute($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WikitextStrip {

  private val DropLinkNs = Set("file", "image", "category")

  // private-use fences protecting <nowiki> spans through the inline
  // pass; stripped from the final output (and from any input that
  // happens to carry them, so they cannot leak markup immunity)
  private val NowikiOpen = '\uE000'
  private val NowikiClose = '\uE001'

  /** Strip inline constructs from one template/table-free segment. */
  private def inline(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == NowikiOpen) {
        val close = s.indexOf(NowikiClose, i + 1)
        if (close < 0) { i = n }
        else {
          out.append(s.substring(i + 1, close)) // verbatim span
          i = close + 1
        }
      } else if (c == '[' && i + 1 < n && s.charAt(i + 1) == '[') {
        // internal link: find the matching ]] honoring one nesting
        // level (image captions may carry links)
        var depth = 1
        var j = i + 2
        while (j + 1 < n && depth > 0) {
          if (s.charAt(j) == '[' && s.charAt(j + 1) == '[') { depth += 1; j += 2 }
          else if (s.charAt(j) == ']' && s.charAt(j + 1) == ']') { depth -= 1; j += 2 }
          else j += 1
        }
        if (depth > 0) { out.append(c); i += 1 }
        else {
          val body = s.substring(i + 2, j - 2)
          val colon = body.indexOf(':')
          val ns = if (colon > 0) body.substring(0, colon)
            .toLowerCase(java.util.Locale.ROOT) else ""
          if (!DropLinkNs.contains(ns)) {
            val pipe = body.lastIndexOf('|')
            val label = if (pipe >= 0) body.substring(pipe + 1) else body
            out.append(inline(label))
          } // media/category links: dropped with caption
          i = j
        }
      } else if (c == '[' && i + 1 < n &&
        (s.startsWith("[http://", i) || s.startsWith("[https://", i))) {
        val close = s.indexOf(']', i + 1)
        if (close < 0) { out.append(c); i += 1 }
        else {
          val body = s.substring(i + 1, close)
          val sp = body.indexOf(' ')
          if (sp > 0) out.append(body.substring(sp + 1)) // labeled
          i = close + 1 // bare [url]: numbered link, drops
        }
      } else if (c == '\'' && i + 2 < n && s.charAt(i + 1) == '\'') {
        var run = 0
        while (i + run < n && s.charAt(i + run) == '\'') run += 1
        val delim = "'" * run
        val close = s.indexOf(delim, i + run)
        if (run >= 2 && close >= 0) {
          out.append(inline(s.substring(i + run, close)))
          i = close + run
        } else { out.append(delim); i += run }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Remove `{{…}}` and `{| … |}` blocks (nesting honored) and the
    * tag-level constructs, across the whole document.
    */
  private def stripBlocks(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.startsWith("{{", i)) {
        var depth = 1
        var j = i + 2
        while (j + 1 < n && depth > 0) {
          if (s.startsWith("{{", j)) { depth += 1; j += 2 }
          else if (s.startsWith("}}", j)) { depth -= 1; j += 2 }
          else j += 1
        }
        i = if (depth > 0) n else j
      } else if (s.startsWith("{|", i)) {
        var depth = 1
        var j = i + 2
        while (j + 1 < n && depth > 0) {
          if (s.startsWith("{|", j)) { depth += 1; j += 2 }
          else if (s.startsWith("|}", j)) { depth -= 1; j += 2 }
          else j += 1
        }
        i = if (depth > 0) n else j
      } else if (s.startsWith("<!--", i)) {
        val close = s.indexOf("-->", i + 4)
        i = if (close < 0) n else close + 3
      } else if (s.startsWith("<nowiki>", i)) {
        val close = s.indexOf("</nowiki>", i + 8)
        if (close < 0) i = n
        else {
          // sentinel-fenced so the inline pass leaves it verbatim
          out.append(NowikiOpen)
            .append(s.substring(i + 8, close))
            .append(NowikiClose)
          i = close + 9
        }
      } else if (s.startsWith("<ref", i) &&
        (i + 4 >= n || !Character.isLetter(s.charAt(i + 4)))) {
        val gt = s.indexOf('>', i)
        if (gt < 0) i = n
        else if (s.charAt(gt - 1) == '/') i = gt + 1 // <ref name=x/>
        else {
          val close = s.indexOf("</ref>", gt)
          i = if (close < 0) n else close + 6
        }
      } else if (s.charAt(i) == '<') {
        val gt = s.indexOf('>', i + 1)
        if (gt < 0) { out.append('<'); i += 1 }
        else i = gt + 1 // any other tag: markup drops, text flows
      } else {
        out.append(s.charAt(i))
        i += 1
      }
    }
    out.toString
  }

  def compute(wikitext: String): String = {
    // scrub any pre-existing fence chars so markup immunity cannot be
    // injected from corpus text
    val clean = wikitext.filterNot(c => c == NowikiOpen || c == NowikiClose)
    val lines = stripBlocks(clean).split("\n", -1)
    val out = new java.util.ArrayList[String]()
    for (raw <- lines) {
      var t = raw.trim
      if (t.startsWith("=") && t.endsWith("=") && t.length >= 3) {
        var h = 0
        while (h < t.length && t.charAt(h) == '=') h += 1
        var e = t.length
        while (e > 0 && t.charAt(e - 1) == '=') e -= 1
        t = if (h <= e) t.substring(h, e).trim else ""
      } else if (t.replace("-", "").isEmpty && t.length >= 4) {
        t = "" // ---- horizontal rule
      } else {
        while (t.nonEmpty && "*#:;".indexOf(t.charAt(0)) >= 0)
          t = t.substring(1).trim
      }
      val stripped = inline(t).trim
      if (stripped.isEmpty) {
        if (!out.isEmpty && out.get(out.size() - 1).nonEmpty) out.add("")
      } else out.add(stripped)
    }
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

/** Fixture: a MediaWiki dump whose pages' STRIPPED text is a pure
  * seed formula — an infobox template and a table to drop, bold/
  * italic quotes, piped and plain internal links, a dropped File
  * link, labeled and bare external links, a ref (content dropped), a
  * nowiki span kept verbatim, headings, lists, and a redirect page
  * on one rotation. The dump double-escapes entities in text.
  */
object WikiSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nPages(doc: Long): Int = 1 + fm(doc, 3)
  def isRedirect(doc: Long, p: Int): Boolean = p == 1 && fm(doc, 4) == 1

  def title(doc: Long, p: Int): String = s"Article $doc/$p <x>"
  def pageId(doc: Long, p: Int): Long = doc * 100 + p
  def timestamp(doc: Long, p: Int): String =
    f"2025-${1 + fm(doc + p, 12)}%02d-01T12:00:0${fm(p, 10)}Z"

  /** The stripped text formula both engines agree on. */
  def strippedText(doc: Long, p: Int): String =
    if (isRedirect(doc, p)) ""
    else
      Seq(s"History ${fm(doc + p, 9)}",
        s"The city of Ex$doc lies on the ${fm(doc, 5)}th meridian.",
        s"It was founded in ${1200 + fm(doc * 3 + p, 800)} and renamed twice.",
        "",
        s"Economy trade fishing note ${fm(doc, 7)}",
        s"raw '' markup $doc kept",
        s"External portal ${fm(doc + p, 6)}").mkString("\n")

  def wikitext(doc: Long, p: Int): String =
    if (isRedirect(doc, p)) s"#REDIRECT [[Article $doc/0 <x>]]"
    else {
      val sb = new StringBuilder()
      sb.append(s"{{Infobox city|name=Ex$doc|pop=${fm(doc, 1000)}}}\n")
      sb.append(s"== History ${fm(doc + p, 9)} ==\n")
      sb.append(s"The '''city''' of [[Ex$doc]] lies on the " +
        s"[[Meridian|${fm(doc, 5)}th meridian]].\n")
      sb.append(s"It was ''founded'' in ${1200 + fm(doc * 3 + p, 800)}" +
        s"<ref>dropped source $doc</ref> and renamed twice.\n")
      sb.append(s"[[File:Ex$doc.jpg|thumb|A [[caption]] to drop]]\n")
      sb.append("----\n")
      sb.append("{| class=\"wikitable\"\n|-\n! h\n|-\n| cell\n|}\n")
      sb.append(s"* Economy trade fishing note ${fm(doc, 7)}\n")
      sb.append(s"# <nowiki>raw '' markup $doc kept</nowiki>\n")
      sb.append(s"[https://portal.ex$doc.org External portal " +
        s"${fm(doc + p, 6)}] [https://drop.me]\n")
      sb.append(s"<!-- hidden editorial note $doc -->\n")
      sb.append(s"[[Category:Cities $doc]]\n")
      sb.toString
    }

  def dumpXml(doc: Long): String = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sb = new StringBuilder()
    sb.append("<mediawiki xmlns=\"http://www.mediawiki.org/xml/export-0.11/\"" +
      " version=\"0.11\" xml:lang=\"en\">\n")
    sb.append("<siteinfo><sitename>GraftPedia</sitename>" +
      "<dbname>graftwiki</dbname></siteinfo>\n")
    for (p <- 0 until nPages(doc)) {
      sb.append("<page>\n")
      sb.append(s"<title>${esc(title(doc, p))}</title>\n")
      sb.append(s"<ns>0</ns>\n")
      sb.append(s"<id>${pageId(doc, p)}</id>\n")
      if (isRedirect(doc, p))
        sb.append(s"""<redirect title="${esc(s"Article $doc/0 <x>")}"/>\n""")
      sb.append("<revision>\n")
      sb.append(s"<id>${pageId(doc, p) * 7}</id>\n")
      sb.append(s"<timestamp>${timestamp(doc, p)}</timestamp>\n")
      sb.append("<contributor><username>graft</username>" +
        s"<id>${fm(doc, 50)}</id></contributor>\n")
      sb.append("<model>wikitext</model><format>text/x-wiki</format>\n")
      sb.append(s"""<text bytes="${wikitext(doc, p).length}" """ +
        s"""xml:space="preserve">${esc(wikitext(doc, p))}</text>\n""")
      sb.append("<sha1>deadbeef</sha1>\n")
      sb.append("</revision>\n</page>\n")
    }
    sb.append("</mediawiki>\n")
    sb.toString
  }
}

/** Expression wrapping [[WikiSynth.dumpXml]]. */
case class SynthWikiDump(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    UTF8String.fromString(WikiSynth.dumpXml(doc.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.spark.sql.graftnative.WikiSynth.dumpXml($d));
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WikiFunctions {
  /** Column API: MediaWiki dump page extraction. */
  def mediawiki_pages(xml: Column): Column =
    ExpressionUtils.column(MediawikiPages(ExpressionUtils.expression(xml)))

  /** Column API: wikitext → plain-text stripping. */
  def wikitext_strip(text: Column): Column =
    ExpressionUtils.column(WikitextStrip(ExpressionUtils.expression(text)))

  /** Column API: MediaWiki dump fixture from a doc seed. */
  def synth_wiki_dump(doc: Column): Column =
    ExpressionUtils.column(SynthWikiDump(ExpressionUtils.expression(doc)))
}
