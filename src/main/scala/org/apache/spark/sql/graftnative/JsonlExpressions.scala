package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Concatenated-gzip → UTF-8 text — the LAST container primitive the
  * corpus-ingest family needed: public text corpora (C4, The Pile,
  * RefinedWeb re-releases) ship as `*.jsonl.gz`, and this expression
  * turns one shard into the string the line/JSON machinery Spark
  * already has consumes (`split` → `explode` → `from_json` — the
  * composition the jsonl key gates). The gzip walk is
  * [[WarcRecords]]' RFC 1952-complete member machinery verbatim:
  * FEXTRA/FNAME/FCOMMENT by structure, FHCRC verified, CRC-32 + ISIZE
  * trailers verified, CONCATENATED members supported (gzip's append
  * mode — `cat a.gz b.gz` is a valid shard), inflation bounded.
  * Returns null on any corruption; never partial text.
  */
case class GzipText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    GzipText.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.GzipText.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GzipText {
  private val MaxTotal = 1 << 26 // 64 MB of decompressed shard text

  def compute(b: Array[Byte]): UTF8String = {
    if (b == null || b.length < 18) return null
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < b.length) {
      val m = WarcRecords.member(b, off)
      if (m == null) return null
      out.write(m._1, 0, m._1.length)
      if (out.size() > MaxTotal) return null
      off = m._2
    }
    UTF8String.fromBytes(out.toByteArray)
  }
}

/** Fixture ENCODER for the jsonl.gz composition: `2 + doc mod 3`
  * gzip MEMBERS per shard (the re-pack/append shape), each carrying
  * 1-3 JSON lines `{"id":…,"lang":…,"text":…}` whose fields are seed
  * formulas; every third member carries an FNAME field and every
  * fifth an FHCRC, keeping the hard gzip paths on the hash.
  */
object JsonlSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nMembers(doc: Long): Int = 2 + fm(doc, 3)
  def linesIn(doc: Long, member: Int): Int = 1 + fm(doc + member, 3)
  def lineId(doc: Long, member: Int, l: Int): Long =
    doc * 100 + member * 10 + l
  private val Langs = Array("en", "de", "fr", "ja")
  def lang(doc: Long, member: Int, l: Int): String =
    Langs(fm(doc + 2 * member + l, 4))
  def text(doc: Long, member: Int, l: Int): String =
    s"line $doc $member $l " + "w" * (3 + fm(doc + member + l, 6))

  def jsonlGzBytes(doc: Long): Array[Byte] = {
    if (doc < 0) return null
    val out = new java.io.ByteArrayOutputStream()
    var m = 0
    while (m < nMembers(doc)) {
      val sb = new StringBuilder()
      var l = 0
      while (l < linesIn(doc, m)) {
        sb.append(s"""{"id":${lineId(doc, m, l)},"lang":"${lang(doc, m, l)}","text":"${text(doc, m, l)}"}""")
        sb.append('\n')
        l += 1
      }
      val member = WarcSynth.gzMember(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        name = if (fm(doc + m, 3) == 0) s"part-$m.jsonl" else null,
        hcrc = fm(doc + m, 5) == 0)
      out.write(member, 0, member.length)
      m += 1
    }
    out.toByteArray
  }
}

/** Expression wrapping [[JsonlSynth.jsonlGzBytes]]. */
case class SynthJsonlGz(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    JsonlSynth.jsonlGzBytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.JsonlSynth.jsonlGzBytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonlFunctions {
  /** Column API: concatenated-gzip shard to UTF-8 text. */
  def gzip_text(payload: Column): Column =
    ExpressionUtils.column(GzipText(ExpressionUtils.expression(payload)))

  /** Column API: jsonl.gz corpus-shard fixture from a doc seed. */
  def synth_jsonl_gz(doc: Column): Column =
    ExpressionUtils.column(SynthJsonlGz(ExpressionUtils.expression(doc)))
}
