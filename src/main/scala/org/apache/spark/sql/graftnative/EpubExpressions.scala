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

/** Decoded TEXT members of a ZIP archive, filtered by a name suffix —
  * the piece that makes EPUB (a zip of XHTML chapters per OCF/ISO
  * 21320) consumable by the text pipeline: the same verified central-
  * directory walk as [[ZipEntries]] (every member inflated,
  * CRC-gated), members whose names end with `suffix` surfaced as
  * UTF-8 strings in archive order. Book corpora are a first-class
  * training-data source and EPUB is how they ship; the composition
  * key chains this into [[HtmlTextExtract]] per chapter.
  */
case class ZipTexts(child: Expression, suffix: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(suffix.nonEmpty, "suffix must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ZipTexts.schema
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ZipTexts.compute(v.asInstanceOf[Array[Byte]], suffix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val suf = ctx.addReferenceObj("suffix", suffix, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.ZipTexts.compute($c, $suf);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ZipTexts {
  val schema: StructType = StructType(Seq(
    StructField("n_entries", IntegerType, nullable = false),
    StructField("texts", ArrayType(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("text", StringType, nullable = false))),
      containsNull = false), nullable = false)))

  def compute(b: Array[Byte], suffix: String): InternalRow = {
    val entries = ZipEntries.decodedEntries(b)
    if (entries == null) return null
    val picked = entries.filter(_.name.endsWith(suffix))
    val out = new Array[Any](picked.length)
    var k = 0
    while (k < picked.length) {
      out(k) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(picked(k).name),
        UTF8String.fromBytes(picked(k).data)))
      k += 1
    }
    new GenericInternalRow(Array[Any](entries.length,
      new GenericArrayData(out)))
  }
}

/** Fixture ENCODER for the EPUB composition: a real OCF layout — the
  * STORED `mimetype` entry first (the spec's magic-number rule), a
  * deflated `META-INF/container.xml`, and `1 + doc mod 3` deflated
  * XHTML chapters whose VISIBLE text is a closed-form formula behind
  * real extraction obstacles (head noise, an entity, an inline span).
  */
object EpubSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nChapters(doc: Long): Int = 1 + fm(doc, 3)

  /** The text both engines must agree on for chapter c. */
  def chapterText(doc: Long, c: Int): String =
    s"Chapter $c of book $doc\n" +
      s"body $doc $c " + "tok " * (2 + fm(doc + c, 4)).toInt +
      s"& end"

  private def chapterXhtml(doc: Long, c: Int): String = {
    val toks = "tok " * (2 + fm(doc + c, 4)).toInt
    s"""<html><head><title>Book $doc</title>
       |<style>p { margin: 0 }</style></head>
       |<body><p>Chapter $c of book\t $doc </p>
       |<p>body $doc $c <b>$toks&amp;</b> end</p>
       |</body></html>
       |""".stripMargin
  }

  def epubBytes(doc: Long): Array[Byte] = {
    if (doc < 0) return null
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val members = scala.collection.mutable.ArrayBuffer[
      (String, Int, Array[Byte], Array[Byte])]()
    members += (("mimetype", 0, "application/epub+zip".getBytes(utf8),
      Array.emptyByteArray))
    members += (("META-INF/container.xml", 8,
      ("""<?xml version="1.0"?><container version="1.0"><rootfiles>""" +
        """<rootfile full-path="OEBPS/content.opf"/></rootfiles></container>""")
        .getBytes(utf8), Array.emptyByteArray))
    var c = 0
    while (c < nChapters(doc)) {
      members += ((s"OEBPS/chap$c.xhtml", 8,
        chapterXhtml(doc, c).getBytes(utf8), Array.emptyByteArray))
      c += 1
    }
    ZipSynth.writeArchive(members.toSeq, "")
  }
}

/** Expression wrapping [[EpubSynth.epubBytes]]. */
case class SynthEpub(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    EpubSynth.epubBytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.EpubSynth.epubBytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EpubFunctions {
  /** Column API: decoded text members of a ZIP by name suffix. */
  def zip_texts(payload: Column, suffix: String): Column =
    ExpressionUtils.column(
      ZipTexts(ExpressionUtils.expression(payload), suffix))

  /** Column API: OCF/EPUB-shaped fixture from a doc seed. */
  def synth_epub(doc: Column): Column =
    ExpressionUtils.column(SynthEpub(ExpressionUtils.expression(doc)))
}
