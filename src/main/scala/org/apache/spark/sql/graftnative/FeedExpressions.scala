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

/** Web-feed parsing (RSS 2.0 + Atom / RFC 4287) — the third crawl
  * discovery channel next to robots and sitemaps: feeds surface NEW
  * documents with timestamps before a full re-crawl would. Both
  * dialects parse to one shape:
  *
  *  - RSS: `<rss><channel>` with a feed `<title>`, entries are
  *    `<item>` with `title` / `link` (element TEXT) / `pubDate`;
  *  - Atom: `<feed>` with a feed `<title>`, entries are `<entry>`
  *    with `title` / `link` (the `href` ATTRIBUTE — preferring the
  *    `rel="alternate"` link, else the first) / `updated`;
  *  - entity-decoded text; fields missing in an entry surface null
  *    (feeds in the wild omit freely — rejecting would drop most of
  *    the real corpus, the opposite stance to the strict container
  *    formats, and disclosed here).
  *
  * Output: `(format, feed_title, entries(title, link, ts))`. Torn
  * markup or a document that is neither dialect rejects.
  */
case class FeedEntries(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = FeedEntries.schema
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    FeedEntries.compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.FeedEntries.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FeedEntries {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("feed_title", StringType, nullable = true),
    StructField("n_entries", IntegerType, nullable = true),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("title", StringType, nullable = true),
      StructField("link", StringType, nullable = true),
      StructField("ts", StringType, nullable = true))),
      containsNull = false), nullable = true)))

  private val FmtRss = UTF8String.fromString("rss")
  private val FmtAtom = UTF8String.fromString("atom")
  private val FmtUnknown = UTF8String.fromString("unknown")
  private val MaxEntries = 1 << 16

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null, null, null))

  def compute(xml: String): InternalRow = {
    val n = xml.length
    var atom = false
    var rss = false
    var inChannel = false
    var inEntry = false
    var field = -1 // 0 title, 1 link(text), 2 ts
    val buf = new StringBuilder()
    var feedTitle: String = null
    var title: String = null
    var link: String = null
    var ts: String = null
    var linkIsAlternate = false
    val out = new java.util.ArrayList[(String, String, String)]()
    var i = 0
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) {
        if (inEntry || field >= 0) return unknown
        i = n
      } else {
        if (lt > i && field >= 0)
          DocxText.decodeXmlInto(xml.substring(i, lt), buf)
        if (xml.startsWith("<!--", lt)) {
          val close = xml.indexOf("-->", lt + 4)
          if (close < 0) return unknown
          i = close + 3
        } else if (xml.startsWith("<![CDATA[", lt)) {
          val close = xml.indexOf("]]>", lt + 9)
          if (close < 0) return unknown
          if (field >= 0) buf.append(xml.substring(lt + 9, close))
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
          name match {
            case "rss" => if (!closing) rss = true
            case "feed" => if (!closing) atom = true
            case "channel" => if (rss) inChannel = !closing
            case "item" | "entry" =>
              if ((name == "item" && !rss) || (name == "entry" && !atom))
                return unknown
              if (closing) {
                if (!inEntry) return unknown
                if (out.size() >= MaxEntries) return unknown
                out.add((title, link, ts))
                inEntry = false
                title = null; link = null; ts = null; linkIsAlternate = false
              } else if (!selfClosed) {
                if (inEntry) return unknown
                inEntry = true
              }
            case "title" =>
              if (closing) {
                if (field == 0) {
                  val v = buf.toString.trim
                  buf.setLength(0)
                  field = -1
                  if (inEntry) title = v
                  else if (feedTitle == null) feedTitle = v
                }
              } else if (!selfClosed && (inEntry || inChannel || atom)) {
                if (field >= 0) return unknown
                field = 0
              }
            case "link" =>
              if (atom) {
                // Atom: href attribute; rel="alternate" (or unset) wins
                if (!closing && inEntry && !linkIsAlternate) {
                  val href = XlsxCells.attr(body, "href")
                  val rel = XlsxCells.attr(body, "rel")
                  if (href != null && (rel == null || rel == "alternate")) {
                    if (link == null || rel == "alternate") {
                      link = href
                      if (rel == "alternate") linkIsAlternate = true
                    }
                  }
                }
              } else if (rss) {
                if (closing) {
                  if (field == 1) {
                    val v = buf.toString.trim
                    buf.setLength(0)
                    field = -1
                    if (inEntry) link = v
                  }
                } else if (!selfClosed && inEntry) {
                  if (field >= 0) return unknown
                  field = 1
                }
              }
            case "pubDate" | "updated" =>
              if ((name == "pubDate") == rss || (name == "updated") == atom) {
                if (closing) {
                  if (field == 2) {
                    val v = buf.toString.trim
                    buf.setLength(0)
                    field = -1
                    if (inEntry) ts = v
                  }
                } else if (!selfClosed && inEntry) {
                  if (field >= 0) return unknown
                  field = 2
                }
              }
            case _ =>
              // description/summary/guid/author/category…: if a field
              // capture is open, a nested tag would corrupt it — feeds
              // don't nest markup inside the fields we read
              if (field >= 0) return unknown
          }
        }
      }
    }
    if (!(rss ^ atom) || inEntry) return unknown
    val rows = new Array[Any](out.size())
    var r = 0
    while (r < out.size()) {
      val (t, l, d) = out.get(r)
      rows(r) = new GenericInternalRow(Array[Any](
        if (t == null) null else UTF8String.fromString(t),
        if (l == null) null else UTF8String.fromString(l),
        if (d == null) null else UTF8String.fromString(d)))
      r += 1
    }
    new GenericInternalRow(Array[Any](if (rss) FmtRss else FmtAtom,
      if (feedTitle == null) null else UTF8String.fromString(feedTitle),
      out.size(), new GenericArrayData(rows)))
  }
}

/** Fixture for [[FeedEntries]]: even docs are RSS 2.0 (CDATA title on
  * `doc mod 4 == 2`, a missing pubDate rotation), odd docs are Atom
  * (multi-link entries where `rel="alternate"` must win over an
  * earlier enclosure link); entities in titles either way.
  */
object FeedSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def isAtom(doc: Long): Boolean = fm(doc, 2) == 1
  def nEntries(doc: Long): Int = 1 + fm(doc, 3)

  def feedTitle(doc: Long): String = s"Feed & co $doc"
  def entryTitle(doc: Long, i: Int): String = s"Post $i <ep ${fm(doc + i, 8)}>"
  def entryLink(doc: Long, i: Int): String =
    s"https://ex${fm(doc, 7)}.org/post/$i"
  def hasTs(doc: Long, i: Int): Boolean = fm(doc + i, 4) != 0
  def entryTs(doc: Long, i: Int): String =
    if (isAtom(doc)) f"2025-${1 + fm(doc + i, 12)}%02d-03T10:0$i:00Z"
    else s"Mon, ${1 + fm(doc + i, 28)} Apr 2025 10:0$i:00 GMT"

  def feedXml(doc: Long): String = {
    val sb = new StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    if (isAtom(doc)) {
      sb.append("<feed xmlns=\"http://www.w3.org/2005/Atom\">\n")
      sb.append(s"<title>Feed &amp; co $doc</title>\n")
      sb.append(s"<id>urn:graft:$doc</id>\n")
      for (i <- 0 until nEntries(doc)) {
        sb.append("<entry>")
        sb.append(s"<title>Post $i &lt;ep ${fm(doc + i, 8)}&gt;</title>")
        // an enclosure link FIRST: rel=alternate must still win
        sb.append(s"""<link rel="enclosure" href="https://cdn.ex.org/$i.mp3"/>""")
        sb.append(s"""<link rel="alternate" href="${entryLink(doc, i)}"/>""")
        if (hasTs(doc, i))
          sb.append(s"<updated>${entryTs(doc, i)}</updated>")
        sb.append("</entry>\n")
      }
      sb.append("</feed>\n")
    } else {
      sb.append("<rss version=\"2.0\"><channel>\n")
      sb.append(s"<title>Feed &amp; co $doc</title>\n")
      sb.append(s"<link>https://ex${fm(doc, 7)}.org/</link>\n")
      for (i <- 0 until nEntries(doc)) {
        sb.append("<item>")
        if (fm(doc, 4) == 2)
          sb.append(s"<title><![CDATA[Post $i <ep ${fm(doc + i, 8)}>]]></title>")
        else
          sb.append(s"<title>Post $i &lt;ep ${fm(doc + i, 8)}&gt;</title>")
        sb.append(s"<link>${entryLink(doc, i)}</link>")
        if (hasTs(doc, i))
          sb.append(s"<pubDate>${entryTs(doc, i)}</pubDate>")
        sb.append("</item>\n")
      }
      sb.append("</channel></rss>\n")
    }
    sb.toString
  }
}

/** Expression wrapping [[FeedSynth.feedXml]]. */
case class SynthFeed(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    UTF8String.fromString(FeedSynth.feedXml(doc.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.spark.sql.graftnative.FeedSynth.feedXml($d));
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FeedFunctions {
  /** Column API: RSS 2.0 / Atom feed-entry extraction. */
  def feed_entries(xml: Column): Column =
    ExpressionUtils.column(FeedEntries(ExpressionUtils.expression(xml)))

  /** Column API: two-dialect feed fixture from a doc seed. */
  def synth_feed(doc: Column): Column =
    ExpressionUtils.column(SynthFeed(ExpressionUtils.expression(doc)))
}
