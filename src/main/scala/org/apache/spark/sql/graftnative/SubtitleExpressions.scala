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

/** Subtitle cue extraction (SRT and WebVTT) — the paired-text half of
  * the video modality: video-text pairs are a first-class training
  * product, and cues carry the only time-aligned text a crawled video
  * ships with. Both formats are parsed for real:
  *
  *  - SRT: numbered blocks `idx / HH:MM:SS,mmm --> HH:MM:SS,mmm /
  *    text…` separated by blank lines; the cue index is the file's.
  *  - WebVTT: the `WEBVTT` signature line (optional BOM), NOTE/STYLE/
  *    REGION blocks skipped whole, an optional cue-identifier line
  *    before the timing line, `[HH:]MM:SS.mmm --> [HH:]MM:SS.mmm` with
  *    hours optional and cue settings after the arrow ignored; cue
  *    indices are assigned in order (1-based) since VTT identifiers
  *    are free-form strings.
  *
  * Cue text rules (fixed, engine-agnostic): lines joined with `\n`,
  * inline markup tags stripped (`<i> <b> <u> <c.*> <v Name> <ruby>`,
  * closing forms, and VTT inline timestamps `<HH:MM:SS.mmm>`), the
  * five XML named entities plus `&nbsp;` decoded, and `&#NN;` /
  * `&#xNN;` numeric references decoded with surrogate-pair emission
  * for supplementary planes. Malformed timing lines, end ≤ start,
  * out-of-range fields (minutes/seconds ≥ 60, ms not 3 digits), or a
  * cue count past the cap reject the whole input ('unknown') — torn
  * subtitle files are common in crawls and guessing alignment would
  * poison every downstream pairing join.
  *
  * The reference has no subtitle path (video stops at whole files in
  * Mongo); this is pipeline-brief surface. At 100 TB the expression is
  * a per-row parse — zero shuffle until the caller explodes cues.
  */
case class SubtitleCues(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = SubtitleCues.schema

  override def nullSafeEval(v: Any): Any =
    SubtitleCues.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.SubtitleCues.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubtitleCues {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("cues", ArrayType(StructType(Seq(
      StructField("idx", IntegerType, nullable = false),
      StructField("start_ms", LongType, nullable = false),
      StructField("end_ms", LongType, nullable = false),
      StructField("text", StringType, nullable = false))),
      containsNull = false), nullable = true)))

  private val FmtSrt = UTF8String.fromString("srt")
  private val FmtVtt = UTF8String.fromString("webvtt")
  private val FmtUnknown = UTF8String.fromString("unknown")
  private val MaxCues = 8192

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null))

  /** Parse `[HH:]MM:SS<sep>mmm` starting at `from`; returns
    * (millis, endIndex) or null. Hours (any digit count ≥ 1) are
    * required when `hoursRequired`; minutes/seconds must be two digits
    * < 60, millis exactly three digits.
    */
  private def timestamp(s: String, from: Int, sep: Char,
      hoursRequired: Boolean): (Long, Int) = {
    var i = from
    def digits(min: Int, max: Int): Int = {
      val st = i
      var v = 0
      while (i < s.length && i - st < max && s.charAt(i) >= '0' &&
        s.charAt(i) <= '9') {
        v = v * 10 + (s.charAt(i) - '0')
        i += 1
      }
      if (i - st < min) -1 else v
    }
    // leading field: HH: (variable width) or MM:
    val first = digits(1, 9)
    if (first < 0 || i >= s.length || s.charAt(i) != ':') return null
    i += 1
    val second = digits(2, 2)
    if (second < 0 || second >= 60) return null
    var hours = 0L
    var minutes = 0
    var seconds = 0
    if (i < s.length && s.charAt(i) == ':') {
      // three fields: HH:MM:SS
      i += 1
      hours = first.toLong
      minutes = second
      if (minutes >= 60) return null
      seconds = digits(2, 2)
      if (seconds < 0 || seconds >= 60) return null
    } else {
      // two fields: MM:SS — VTT's short form
      if (hoursRequired) return null
      minutes = first
      seconds = second
      if (minutes >= 60) return null
    }
    if (i >= s.length || s.charAt(i) != sep) return null
    i += 1
    val ms = digits(3, 3)
    if (ms < 0) return null
    ((((hours * 60 + minutes) * 60 + seconds) * 1000) + ms, i)
  }

  /** Parse a full timing line `ts --> ts [settings]`; returns
    * (startMs, endMs) or null.
    */
  private def timing(line: String, sep: Char,
      hoursRequired: Boolean): (Long, Long) = {
    val a = timestamp(line, 0, sep, hoursRequired)
    if (a == null) return null
    var i = a._2
    while (i < line.length && line.charAt(i) == ' ') i += 1
    if (i + 3 > line.length || line.charAt(i) != '-' ||
      line.charAt(i + 1) != '-' || line.charAt(i + 2) != '>') return null
    i += 3
    while (i < line.length && line.charAt(i) == ' ') i += 1
    val b = timestamp(line, i, sep, hoursRequired)
    if (b == null) return null
    val rest = line.substring(b._2)
    // settings (VTT) must be space-separated tokens; SRT allows nothing
    if (rest.nonEmpty && !rest.startsWith(" ")) return null
    if (b._1 <= a._1) return null // end must follow start
    (a._1, b._1)
  }

  /** Strip inline tags and decode entities per the scaladoc's rules. */
  private[graftnative] def cleanText(raw: String): String = {
    val sb = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '<') {
        val close = raw.indexOf('>', i + 1)
        if (close < 0) { sb.append(c); i += 1 }
        else i = close + 1 // drop the tag whole (markup or timestamp)
      } else if (c == '&') {
        val semi = raw.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 10) { sb.append(c); i += 1 }
        else {
          val name = raw.substring(i + 1, semi)
          val decoded: Int = name match {
            case "amp" => '&'
            case "lt" => '<'
            case "gt" => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => 0xA0
            case _ if name.length > 1 && name.charAt(0) == '#' =>
              try {
                val v =
                  if (name.charAt(1) == 'x' || name.charAt(1) == 'X')
                    Integer.parseInt(name.substring(2), 16)
                  else Integer.parseInt(name.substring(1))
                if (v >= 0 && v <= 0x10FFFF) v else -1
              } catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
          if (decoded < 0) { sb.append(c); i += 1 }
          else { sb.appendAll(Character.toChars(decoded)); i = semi + 1 }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def compute(v: UTF8String): InternalRow = {
    if (v == null) return unknown
    var s = v.toString
    if (s.startsWith("﻿")) s = s.substring(1)
    val lines = s.split("\r\n|\n|\r", -1)
    val isVtt = lines.nonEmpty && (lines(0) == "WEBVTT" ||
      lines(0).startsWith("WEBVTT ") || lines(0).startsWith("WEBVTT\t"))
    val cues = new java.util.ArrayList[InternalRow]()
    var li = if (isVtt) 1 else 0
    var cueIdx = 0
    while (li < lines.length) {
      // skip blank separators
      while (li < lines.length && lines(li).trim.isEmpty) li += 1
      if (li < lines.length) {
        val first = lines(li)
        if (isVtt && (first.startsWith("NOTE") || first.startsWith("STYLE") ||
          first.startsWith("REGION"))) {
          // skip the whole block
          while (li < lines.length && lines(li).trim.nonEmpty) li += 1
        } else {
          // SRT: index line; VTT: optional identifier line (no "-->")
          var timingLine = first
          var fileIdx = -1
          if (!first.contains("-->")) {
            if (isVtt) {
              li += 1
            } else {
              // SRT indices must be numeric
              val t = first.trim
              if (t.isEmpty || !t.forall(c => c >= '0' && c <= '9') ||
                t.length > 9) return unknown
              fileIdx = t.toInt
              li += 1
            }
            if (li >= lines.length) return unknown
            timingLine = lines(li)
          } else if (!isVtt) return unknown // SRT cue without an index
          val t = timing(timingLine, if (isVtt) '.' else ',',
            hoursRequired = !isVtt)
          if (t == null) return unknown
          li += 1
          val textSb = new StringBuilder()
          var nTextLines = 0
          while (li < lines.length && lines(li).trim.nonEmpty) {
            if (nTextLines > 0) textSb.append('\n')
            textSb.append(cleanText(lines(li)))
            nTextLines += 1
            li += 1
          }
          cueIdx += 1
          if (cues.size() >= MaxCues) return unknown
          cues.add(new GenericInternalRow(Array[Any](
            if (fileIdx >= 0) fileIdx else cueIdx,
            t._1, t._2, UTF8String.fromString(textSb.toString))))
        }
      }
    }
    if (cues.isEmpty) return unknown
    val arr = new Array[Any](cues.size())
    var k = 0
    while (k < arr.length) { arr(k) = cues.get(k); k += 1 }
    new GenericInternalRow(Array[Any](if (isVtt) FmtVtt else FmtSrt,
      new GenericArrayData(arr)))
  }
}

/** Fixture ENCODER for [[SubtitleCues]]: deterministic SRT (even docs)
  * and WebVTT (odd docs) files whose cues are pure seed formulas —
  * `3 + doc mod 4` cues, cue i (1-based) spanning
  * `[97·(i−1) + doc mod 13, +211)` ms (small enough to overlap the MP4
  * fixtures' 30000/1001 sample clock for the pairing key). Cue text
  * carries real obstacles: SRT an `&amp;` entity and an `<i>` span
  * over a second line; VTT a NOTE block, per-cue identifier lines,
  * cue settings after the arrow, a `<b>` span, an inline timestamp
  * tag, and a numeric entity — all of which must strip/decode to the
  * same closed-form text the oracle rebuilds.
  */
object SubtitleSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def isVtt(doc: Long): Boolean = fm(doc, 2) == 1
  def nCues(doc: Long): Int = 3 + fm(doc, 4)
  def startMs(doc: Long, i: Int): Long = 97L * (i - 1) + fm(doc, 13)
  def endMs(doc: Long, i: Int): Long = startMs(doc, i) + 211L
  /** The DECODED text both engines must agree on. */
  def cueText(doc: Long, i: Int): String =
    s"cue $doc $i & one\nline $i two"

  private def ts(ms: Long, sep: Char): String = {
    val h = ms / 3600000
    val m = (ms % 3600000) / 60000
    val sec = (ms % 60000) / 1000
    val milli = ms % 1000
    f"$h%02d:$m%02d:$sec%02d$sep$milli%03d"
  }

  def subtitleString(doc: Long): String = {
    if (doc < 0) return null
    val sb = new StringBuilder()
    val n = nCues(doc)
    if (isVtt(doc)) {
      sb.append("WEBVTT\n\nNOTE fixture ").append(doc).append("\nnoise line\n\n")
      var i = 1
      while (i <= n) {
        sb.append("cue-id-").append(doc).append('-').append(i).append('\n')
        sb.append(ts(startMs(doc, i), '.')).append(" --> ")
          .append(ts(endMs(doc, i), '.'))
        if (i % 2 == 0) sb.append(" align:start position:10%")
        sb.append('\n')
        sb.append("cue ").append(doc).append(' ').append(i)
          .append(" <b>&#38;</b> one\n")
        sb.append("<00:00:01.000>line <c.yellow>").append(i).append("</c> two\n\n")
        i += 1
      }
    } else {
      var i = 1
      while (i <= n) {
        sb.append(i).append('\n')
        sb.append(ts(startMs(doc, i), ',')).append(" --> ")
          .append(ts(endMs(doc, i), ',')).append('\n')
        sb.append("cue ").append(doc).append(' ').append(i)
          .append(" &amp; one\n")
        sb.append("<i>line ").append(i).append(" two</i>\n\n")
        i += 1
      }
    }
    sb.toString
  }
}

/** Expression wrapping [[SubtitleSynth.subtitleString]]. */
case class SynthSubtitle(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any = {
    val s = SubtitleSynth.subtitleString(doc.asInstanceOf[Long])
    if (s == null) null else UTF8String.fromString(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      String s = org.apache.spark.sql.graftnative.SubtitleSynth.subtitleString($d);
      if (s == null) { ${ev.isNull} = true; }
      else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(s); }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubtitleFunctions {
  /** Column API: SRT/WebVTT cue extraction. */
  def subtitle_cues(payload: Column): Column =
    ExpressionUtils.column(SubtitleCues(ExpressionUtils.expression(payload)))

  /** Column API: deterministic SRT/WebVTT fixture from a doc seed. */
  def synth_subtitle(doc: Column): Column =
    ExpressionUtils.column(SynthSubtitle(ExpressionUtils.expression(doc)))
}
