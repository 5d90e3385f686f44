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

/** sitemap.xml parsing (sitemaps.org protocol 0.9) — robots_allowed's
  * discovery sibling in crawl governance: the frontier SEEDS from
  * sitemaps, and re-crawl scheduling reads their `lastmod`. Both
  * document kinds parse:
  *
  *  - `<urlset>` of `<url>` entries: `loc` (required — an entry
  *    without one rejects the document; the protocol has no anonymous
  *    URLs), optional `lastmod` / `changefreq` / `priority`;
  *  - `<sitemapindex>` of `<sitemap>` entries: `loc` + optional
  *    `lastmod` — the shard-of-shards form large sites ship;
  *  - entity-decoded text (ampersands in URLs arrive escaped), the
  *    protocol's 50,000-entry ceiling enforced as a reject (a larger
  *    file is out of spec and truncating silently would lie).
  *
  * Output: `(kind, entries(loc, lastmod, priority))` — `priority`
  * null for index entries. Torn markup or non-sitemap XML rejects.
  */
case class SitemapUrls(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = SitemapUrls.schema
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    SitemapUrls.compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.SitemapUrls.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SitemapUrls {
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("n_entries", IntegerType, nullable = true),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("loc", StringType, nullable = false),
      StructField("lastmod", StringType, nullable = true),
      StructField("priority", StringType, nullable = true))),
      containsNull = false), nullable = true)))

  private val KindUrlset = UTF8String.fromString("urlset")
  private val KindIndex = UTF8String.fromString("sitemapindex")
  private val FmtUnknown = UTF8String.fromString("unknown")
  private val MaxEntries = 50000 // the protocol's own ceiling

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null, null))

  def compute(xml: String): InternalRow = {
    val n = xml.length
    var isIndex = false
    var sawRoot = false
    var inEntry = false
    var field: Int = -1 // 0 loc, 1 lastmod, 2 priority
    val buf = new StringBuilder()
    var loc: String = null
    var lastmod: String = null
    var priority: String = null
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
            case "urlset" =>
              if (!closing) { sawRoot = true; isIndex = false }
            case "sitemapindex" =>
              if (!closing) { sawRoot = true; isIndex = true }
            case "url" | "sitemap" =>
              if ((name == "sitemap") != isIndex && !closing) return unknown
              if (closing) {
                if (!inEntry) return unknown
                if (loc == null) return unknown // anonymous entry: reject
                if (out.size() >= MaxEntries) return unknown
                out.add((loc, lastmod, priority))
                inEntry = false
                loc = null; lastmod = null; priority = null
              } else if (!selfClosed) {
                if (inEntry) return unknown
                inEntry = true
              }
            case "loc" | "lastmod" | "priority" =>
              val f = name match {
                case "loc" => 0
                case "lastmod" => 1
                case _ => 2
              }
              if (closing) {
                if (field != f) return unknown
                val v = buf.toString.trim
                buf.setLength(0)
                field = -1
                if (inEntry) f match {
                  case 0 => loc = v
                  case 1 => lastmod = v
                  case 2 => priority = v
                }
              } else if (!selfClosed && inEntry) {
                if (field >= 0) return unknown
                field = f
              }
            case _ => // changefreq, xhtml:link alternates, decls: inert
          }
        }
      }
    }
    if (!sawRoot || inEntry) return unknown
    val rows = new Array[Any](out.size())
    var r = 0
    while (r < out.size()) {
      val (l, m, p) = out.get(r)
      rows(r) = new GenericInternalRow(Array[Any](UTF8String.fromString(l),
        if (m == null) null else UTF8String.fromString(m),
        if (p == null) null else UTF8String.fromString(p)))
      r += 1
    }
    new GenericInternalRow(Array[Any](if (isIndex) KindIndex else KindUrlset,
      out.size(), new GenericArrayData(rows)))
  }
}

/** Fixture for [[SitemapUrls]]: `2 + doc mod 4` url entries with
  * escaped-ampersand locs, rotating lastmod presence and priority,
  * plus a `sitemapindex` form on `doc mod 5 == 0`; comments and a
  * changefreq the parser must skip.
  */
object SitemapSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def isIndex(doc: Long): Boolean = fm(doc, 5) == 0
  def nEntries(doc: Long): Int = 2 + fm(doc, 4)

  def loc(doc: Long, i: Int): String =
    if (isIndex(doc)) s"https://ex${fm(doc, 7)}.org/sitemap$i.xml.gz"
    else s"https://ex${fm(doc, 7)}.org/page?id=$i&v=${fm(doc + i, 9)}"
  def hasLastmod(doc: Long, i: Int): Boolean = fm(doc + i, 3) != 0
  def lastmod(doc: Long, i: Int): String =
    f"2025-${1 + fm(doc + i, 12)}%02d-${1 + fm(doc * 3 + i, 28)}%02d"
  def hasPriority(doc: Long, i: Int): Boolean =
    !isIndex(doc) && fm(doc + i, 2) == 0
  def priority(doc: Long, i: Int): String = s"0.${1 + fm(doc + i, 9)}"

  def sitemapXml(doc: Long): String = {
    val sb = new StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    val root = if (isIndex(doc)) "sitemapindex" else "urlset"
    val entry = if (isIndex(doc)) "sitemap" else "url"
    sb.append(s"""<$root xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n""")
    sb.append(s"<!-- shard $doc -->\n")
    for (i <- 0 until nEntries(doc)) {
      sb.append(s"<$entry>")
      sb.append(s"<loc>${loc(doc, i).replace("&", "&amp;")}</loc>")
      if (hasLastmod(doc, i))
        sb.append(s"<lastmod>${lastmod(doc, i)}</lastmod>")
      if (!isIndex(doc)) sb.append("<changefreq>daily</changefreq>")
      if (hasPriority(doc, i))
        sb.append(s"<priority>${priority(doc, i)}</priority>")
      sb.append(s"</$entry>\n")
    }
    sb.append(s"</$root>\n")
    sb.toString
  }
}

/** Expression wrapping [[SitemapSynth.sitemapXml]]. */
case class SynthSitemap(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    UTF8String.fromString(SitemapSynth.sitemapXml(doc.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.spark.sql.graftnative.SitemapSynth.sitemapXml($d));
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SitemapFunctions {
  /** Column API: sitemaps.org urlset/sitemapindex parsing. */
  def sitemap_urls(xml: Column): Column =
    ExpressionUtils.column(SitemapUrls(ExpressionUtils.expression(xml)))

  /** Column API: sitemap fixture from a doc seed. */
  def synth_sitemap(doc: Column): Column =
    ExpressionUtils.column(SynthSitemap(ExpressionUtils.expression(doc)))
}
