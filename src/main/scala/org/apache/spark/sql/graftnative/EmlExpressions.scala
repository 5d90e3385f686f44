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

/** Email parsing (RFC 5322 + MIME RFCs 2045-2047) — mail archives are
  * a canonical large text corpus, and nothing else in the pipeline
  * reads them. One message in, structured text out:
  *
  *  - the header block unfolds (continuation lines join with one
  *    space); `From`/`To`/`Subject`/`Date` surface, with RFC 2047
  *    encoded-words decoded in From/To/Subject — both `B` (base64)
  *    and `Q` (quoted-printable-ish, `_` = space) forms, UTF-8 /
  *    ISO-8859-1 / US-ASCII charsets, ADJACENT encoded words joined
  *    without the intervening whitespace (the spec's rule naive
  *    decoders miss);
  *  - multipart bodies split on the boundary parameter
  *    (quoted or bare), recursing into nested multiparts (depth-
  *    capped); the preamble and epilogue drop;
  *  - leaf parts decode per `Content-Transfer-Encoding`: `7bit`/
  *    `8bit`/absent verbatim, `quoted-printable` (soft line breaks
  *    and `=HH`), `base64` (whitespace-tolerant); bytes decode per
  *    the `charset` parameter (utf-8 / iso-8859-1 / us-ascii;
  *    anything else rejects rather than mojibake);
  *  - text-typed leaves carry their text; other leaves surface
  *    their content type with empty text (the fetch inventory);
  *    every leaf's content type is reported lowercased, parameters
  *    stripped.
  *
  * Honest rejects: no header/body split, a multipart without its
  * boundary parameter, an unknown transfer encoding or charset, torn
  * base64/QP, boundary never found.
  */
case class EmlMessage(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = EmlMessage.schema
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    EmlMessage.compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.EmlMessage.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EmlMessage {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("from", StringType, nullable = true),
    StructField("to", StringType, nullable = true),
    StructField("subject", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("n_parts", IntegerType, nullable = true),
    StructField("parts", ArrayType(StructType(Seq(
      StructField("content_type", StringType, nullable = false),
      StructField("text", StringType, nullable = false))),
      containsNull = false), nullable = true)))

  private val FmtEml = UTF8String.fromString("eml")
  private val FmtUnknown = UTF8String.fromString("unknown")
  private val MaxParts = 256
  private val MaxDepth = 8
  private val MaxTextChars = 1 << 22

  private def unknown: InternalRow =
    new GenericInternalRow(
      Array[Any](FmtUnknown, null, null, null, null, null, null))

  private final class Bad extends RuntimeException("eml", null, false, false)
  private def bad(): Nothing = throw new Bad

  // ------------------------------------------------------- headers

  /** Unfold and split one header block into (lowercased name → value). */
  private def parseHeaders(block: String): java.util.LinkedHashMap[String, String] = {
    val out = new java.util.LinkedHashMap[String, String]()
    val lines = block.split("\r\n|\n", -1)
    var cur: StringBuilder = null
    var curName: String = null
    def flush(): Unit = {
      if (curName != null) out.put(curName, cur.toString.trim)
      curName = null
      cur = null
    }
    for (line <- lines) {
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (cur == null) bad() // continuation without a header
        cur.append(' ').append(line.trim)
      } else if (line.nonEmpty) {
        flush()
        val colon = line.indexOf(':')
        if (colon <= 0) bad()
        curName = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        cur = new StringBuilder(line.substring(colon + 1).trim)
      }
    }
    flush()
    out
  }

  private def decodeCharset(bytes: Array[Byte], charset: String): String = {
    val cs = charset.toLowerCase(java.util.Locale.ROOT)
    cs match {
      case "utf-8" | "utf8" =>
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      case "iso-8859-1" | "latin1" | "us-ascii" | "ascii" =>
        new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      case _ => bad() // unknown charset: reject, don't mojibake
    }
  }

  private def decodeB64(s: String): Array[Byte] = {
    val compact = s.filterNot(c => c == ' ' || c == '\t' || c == '\r' || c == '\n')
    try java.util.Base64.getDecoder.decode(compact)
    catch { case _: IllegalArgumentException => bad() }
  }

  private def decodeQp(s: String, underscoreIsSpace: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=') {
        if (i + 1 < s.length && (s.charAt(i + 1) == '\n' ||
          s.charAt(i + 1) == '\r')) {
          // soft line break: consume the EOL
          i += (if (i + 2 < s.length && s.charAt(i + 1) == '\r' &&
            s.charAt(i + 2) == '\n') 3 else 2)
        } else {
          if (i + 2 >= s.length) bad()
          val h = Character.digit(s.charAt(i + 1), 16)
          val l = Character.digit(s.charAt(i + 2), 16)
          if (h < 0 || l < 0) bad()
          out.write(h * 16 + l)
          i += 3
        }
      } else if (c == '_' && underscoreIsSpace) { out.write(' '); i += 1 }
      else { out.write(c.toInt & 0xFF); i += 1 }
    }
    out.toByteArray
  }

  /** RFC 2047 encoded-words in a header value; adjacent words join. */
  private[graftnative] def decodeWords(v: String): String = {
    val out = new StringBuilder()
    var i = 0
    var lastWasWord = false
    val pending = new StringBuilder() // whitespace between encoded words
    while (i < v.length) {
      val start = v.indexOf("=?", i)
      if (start < 0) {
        out.append(pending).append(v.substring(i))
        i = v.length
      } else {
        val q1 = v.indexOf('?', start + 2)
        val q2 = if (q1 < 0) -1 else v.indexOf('?', q1 + 1)
        val end = if (q2 < 0) -1 else v.indexOf("?=", q2 + 1)
        if (q1 < 0 || q2 < 0 || end < 0) {
          out.append(pending).append(v.substring(i, start + 2))
          pending.setLength(0)
          lastWasWord = false
          i = start + 2
        } else {
          val between = v.substring(i, start)
          if (!(lastWasWord && between.forall(c => c == ' ' || c == '\t'))) {
            out.append(pending).append(between)
          }
          pending.setLength(0)
          val charset = v.substring(start + 2, q1)
          val enc = v.substring(q1 + 1, q2).toLowerCase(java.util.Locale.ROOT)
          val payload = v.substring(q2 + 1, end)
          val bytes = enc match {
            case "b" => decodeB64(payload)
            case "q" => decodeQp(payload, underscoreIsSpace = true)
            case _ => bad()
          }
          out.append(decodeCharset(bytes, charset))
          lastWasWord = true
          i = end + 2
        }
      }
    }
    out.toString
  }

  // ------------------------------------------------------- MIME body

  /** `Content-Type` value → (type/subtype lowercased, params map). */
  private def parseContentType(v: String): (String, Map[String, String]) = {
    val parts = v.split(";")
    val ct = parts(0).trim.toLowerCase(java.util.Locale.ROOT)
    var params = Map.empty[String, String]
    var k = 1
    while (k < parts.length) {
      val p = parts(k).trim
      val eq = p.indexOf('=')
      if (eq > 0) {
        val name = p.substring(0, eq).trim.toLowerCase(java.util.Locale.ROOT)
        var value = p.substring(eq + 1).trim
        if (value.length >= 2 && value.startsWith("\"") && value.endsWith("\""))
          value = value.substring(1, value.length - 1)
        params += (name -> value)
      }
      k += 1
    }
    (ct, params)
  }

  private final class Part(val contentType: String, val text: String)

  /** Parse one entity (headers + body); appends leaf parts. */
  private def parseEntity(entity: String, depth: Int,
      out: java.util.ArrayList[Part]): Unit = {
    if (depth > MaxDepth || out.size() >= MaxParts) bad()
    val sep = {
      val a = entity.indexOf("\r\n\r\n")
      val b = entity.indexOf("\n\n")
      if (a < 0 && b < 0) -1
      else if (a < 0) b else if (b < 0) a else math.min(a, b)
    }
    if (sep < 0) bad()
    val headers = parseHeaders(entity.substring(0, sep))
    val body = entity.substring(
      if (entity.startsWith("\r\n\r\n", sep)) sep + 4 else sep + 2)
    val ctv = headers.getOrDefault("content-type", "text/plain; charset=us-ascii")
    val (ct, params) = parseContentType(ctv)
    if (ct.startsWith("multipart/")) {
      val boundary = params.getOrElse("boundary", bad())
      if (boundary.isEmpty) bad()
      val marker = "--" + boundary
      val lines = body.split("\r\n|\n", -1)
      val parts = new java.util.ArrayList[String]()
      var cur: StringBuilder = null
      var done = false
      // RFC 2046: the line break PRECEDING a boundary belongs to the
      // delimiter, so a part's final empty line is not body content
      def close(): Unit = if (cur != null) {
        val s = cur.toString
        parts.add(if (s.endsWith("\n")) s.substring(0, s.length - 1) else s)
      }
      for (line <- lines if !done) {
        if (line == marker + "--") {
          close()
          cur = null
          done = true
        } else if (line == marker) {
          close()
          cur = new StringBuilder()
        } else if (cur != null) {
          if (cur.nonEmpty) cur.append('\n')
          cur.append(line)
        } // else: preamble — dropped
      }
      if (!done) bad() // closing boundary never seen: torn
      if (parts.isEmpty) bad()
      var p = 0
      while (p < parts.size()) {
        parseEntity(parts.get(p), depth + 1, out)
        p += 1
      }
    } else {
      val cte = headers.getOrDefault("content-transfer-encoding", "7bit")
        .trim.toLowerCase(java.util.Locale.ROOT)
      val charset = params.getOrElse("charset", "us-ascii")
      val text =
        if (!ct.startsWith("text/")) "" // inventory-only leaf
        else cte match {
          case "7bit" | "8bit" | "binary" => body
          case "quoted-printable" =>
            decodeCharset(decodeQp(body, underscoreIsSpace = false), charset)
          case "base64" => decodeCharset(decodeB64(body), charset)
          case _ => bad()
        }
      if (text.length > MaxTextChars) bad()
      out.add(new Part(ct, text))
    }
  }

  def compute(raw: String): InternalRow = {
    try {
      val parts = new java.util.ArrayList[Part]()
      parseEntity(raw, 0, parts)
      // re-parse the top headers for the envelope fields
      val sep = {
        val a = raw.indexOf("\r\n\r\n")
        val b = raw.indexOf("\n\n")
        if (a < 0) b else if (b < 0) a else math.min(a, b)
      }
      val headers = parseHeaders(raw.substring(0, sep))
      def h(name: String, words: Boolean): Any = {
        val v = headers.get(name)
        if (v == null) null
        else UTF8String.fromString(if (words) decodeWords(v) else v)
      }
      val rows = new Array[Any](parts.size())
      var p = 0
      while (p < parts.size()) {
        rows(p) = new GenericInternalRow(Array[Any](
          UTF8String.fromString(parts.get(p).contentType),
          UTF8String.fromString(parts.get(p).text)))
        p += 1
      }
      new GenericInternalRow(Array[Any](FmtEml,
        h("from", words = true), h("to", words = true),
        h("subject", words = true), h("date", words = false),
        parts.size(), new GenericArrayData(rows)))
    } catch {
      case _: Bad => unknown
      case _: StringIndexOutOfBoundsException => unknown
    }
  }
}

/** Fixture for [[EmlMessage]]: seeds rotate through the shapes real
  * mail shows — a plain 7bit single-part, a quoted-printable part
  * with soft breaks and `=C3=A9`, a multipart/alternative with
  * text/plain + text/html and a preamble to drop, and a nested
  * multipart/mixed carrying a base64 UTF-8 part plus a non-text
  * attachment leaf; Subjects rotate RFC 2047 B/Q encoded words with
  * the adjacent-join rule, and headers fold across lines.
  */
object EmlSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def shape(doc: Long): Int = fm(doc, 4)

  def from(doc: Long): String = s"Sender ${fm(doc, 9)} <s${fm(doc, 9)}@ex.org>"
  def to(doc: Long): String = s"r$doc@ex.org"
  def date(doc: Long): String =
    s"Mon, ${1 + fm(doc, 28)} Apr 2025 0${fm(doc, 10)}:30:00 +0000"

  /** The decoded subject both engines must agree on. */
  def subject(doc: Long): String = shape(doc) match {
    case 1 => s"café update ${fm(doc, 50)}" // B-encoded utf-8
    case 2 => s"status report ${fm(doc, 50)}" // Q-encoded with underscores
    case 3 => s"naïve summary ${fm(doc, 50)}" // two ADJACENT words join
    case _ => s"plain subject ${fm(doc, 50)}"
  }

  private def encSubject(doc: Long): String = {
    val b64 = java.util.Base64.getEncoder
    shape(doc) match {
      case 1 =>
        "=?utf-8?B?" + b64.encodeToString(
          subject(doc).getBytes(java.nio.charset.StandardCharsets.UTF_8)) + "?="
      case 2 =>
        "=?iso-8859-1?Q?" +
          s"status_report_${fm(doc, 50)}" + "?="
      case 3 =>
        // split INSIDE the word: adjacent encoded words must join
        val s = subject(doc)
        val cut = 4
        "=?utf-8?B?" + b64.encodeToString(
          s.substring(0, cut).getBytes(java.nio.charset.StandardCharsets.UTF_8)) +
          "?= =?utf-8?B?" + b64.encodeToString(
          s.substring(cut).getBytes(java.nio.charset.StandardCharsets.UTF_8)) + "?="
      case _ => subject(doc)
    }
  }

  def bodyText(doc: Long): String =
    s"Hello ${fm(doc, 9)},\nthe measured value is ${fm(doc * 7, 900)}." +
      (if (shape(doc) == 1) " résumé attached." else "")

  def htmlAltText(doc: Long): String = s"<p>alt ${fm(doc, 9)}</p>"
  def b64PartText(doc: Long): String = s"métrics £${fm(doc, 100)}\nend $doc"

  def nParts(doc: Long): Int = shape(doc) match {
    case 0 | 1 => 1
    case 2 => 2
    case _ => 3
  }

  def emlString(doc: Long): String = {
    val sb = new StringBuilder()
    sb.append(s"From: ${from(doc)}\r\n")
    sb.append(s"To: ${to(doc)}\r\n")
    // folded subject header: folding happens AT whitespace (RFC 5322),
    // and unfolding joins with one space
    val subj = encSubject(doc)
    if (shape(doc) == 0 && subj.contains(' ')) {
      val half = subj.length / 2
      val cut = math.max(subj.lastIndexOf(' ', half), subj.indexOf(' '))
      sb.append(s"Subject: ${subj.substring(0, cut)}\r\n")
      sb.append(s"\t${subj.substring(cut + 1)}\r\n")
    } else sb.append(s"Subject: $subj\r\n")
    sb.append(s"Date: ${date(doc)}\r\n")
    sb.append("MIME-Version: 1.0\r\n")
    shape(doc) match {
      case 0 =>
        sb.append("Content-Type: text/plain; charset=us-ascii\r\n\r\n")
        sb.append(bodyText(doc))
      case 1 =>
        sb.append("Content-Type: text/plain; charset=utf-8\r\n")
        sb.append("Content-Transfer-Encoding: quoted-printable\r\n\r\n")
        val t = bodyText(doc)
        val qp = new StringBuilder()
        for (b <- t.getBytes(java.nio.charset.StandardCharsets.UTF_8)) {
          val u = b & 0xFF
          if (u == '\n') qp.append('\n')
          else if (u >= 33 && u <= 126 && u != '=') qp.append(u.toChar)
          else if (u == ' ') qp.append(' ')
          else qp.append(f"=$u%02X")
        }
        // a soft break mid-stream
        val s = qp.toString
        val cut = s.length / 2
        // never cut inside an =HH triple
        val safe = if (s.lastIndexOf('=', cut) > cut - 3)
          s.lastIndexOf('=', cut) else cut
        sb.append(s.substring(0, safe)).append("=\r\n")
          .append(s.substring(safe))
      case 2 =>
        val b = s"bnd${fm(doc, 1000)}"
        sb.append(s"""Content-Type: multipart/alternative; boundary="$b"\r\n\r\n""")
        sb.append("preamble to drop\r\n")
        sb.append(s"--$b\r\n")
        sb.append("Content-Type: text/plain; charset=us-ascii\r\n\r\n")
        sb.append(bodyText(doc)).append("\r\n")
        sb.append(s"--$b\r\n")
        sb.append("Content-Type: text/html; charset=us-ascii\r\n\r\n")
        sb.append(htmlAltText(doc)).append("\r\n")
        sb.append(s"--$b--\r\n")
        sb.append("epilogue to drop\r\n")
      case _ =>
        val outer = s"out${fm(doc, 1000)}"
        val inner = s"in${fm(doc, 997)}"
        sb.append(s"Content-Type: multipart/mixed; boundary=$outer\r\n\r\n")
        sb.append(s"--$outer\r\n")
        sb.append(s"""Content-Type: multipart/alternative; boundary="$inner"\r\n\r\n""")
        sb.append(s"--$inner\r\n")
        sb.append("Content-Type: text/plain; charset=us-ascii\r\n\r\n")
        sb.append(bodyText(doc)).append("\r\n")
        sb.append(s"--$inner\r\n")
        sb.append("Content-Type: text/plain; charset=utf-8\r\n")
        sb.append("Content-Transfer-Encoding: base64\r\n\r\n")
        val b64 = java.util.Base64.getMimeEncoder(60, "\r\n".getBytes)
          .encodeToString(b64PartText(doc)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        sb.append(b64).append("\r\n")
        sb.append(s"--$inner--\r\n")
        sb.append(s"--$outer\r\n")
        sb.append("Content-Type: application/pdf; name=doc.pdf\r\n")
        sb.append("Content-Transfer-Encoding: base64\r\n\r\n")
        sb.append("JVBERi0=\r\n")
        sb.append(s"--$outer--\r\n")
    }
    sb.toString
  }
}

/** Expression wrapping [[EmlSynth.emlString]]. */
case class SynthEml(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    UTF8String.fromString(EmlSynth.emlString(doc.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.spark.sql.graftnative.EmlSynth.emlString($d));
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** mbox container splitting (the mboxrd convention) — mail archives
  * ship as one file of concatenated messages, each introduced by a
  * `From ` envelope line. Split rules:
  *
  *  - a message starts at a line beginning `"From "` (the envelope
  *    line itself is NOT part of the message);
  *  - `>From`-quoting un-stuffs: a body line matching `>+From ` loses
  *    exactly ONE leading `>` (the mboxrd rule — classic mboxo cannot
  *    round-trip and is why the convention exists);
  *  - text before the first envelope line rejects the file (it is not
  *    an mbox).
  *
  * Output: the raw message strings, ready for [[EmlMessage]] — the
  * composition is the point.
  */
case class MboxSplit(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = MboxSplit.schema
  override def nullable: Boolean = false

  override def nullSafeEval(v: Any): Any =
    MboxSplit.compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.MboxSplit.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MboxSplit {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_messages", IntegerType, nullable = true),
    StructField("messages", ArrayType(StringType, containsNull = false),
      nullable = true)))

  private val FmtMbox = UTF8String.fromString("mbox")
  private val FmtUnknown = UTF8String.fromString("unknown")
  private val MaxMessages = 1 << 16

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null, null))

  def compute(raw: String): InternalRow = {
    val lines = raw.split("\r\n|\n", -1)
    val msgs = new java.util.ArrayList[String]()
    var cur: StringBuilder = null
    // the newline ending a message belongs to the separator (the
    // blank-line convention), mirroring the MIME boundary rule
    def close(): Unit = if (cur != null) {
      val s = cur.toString
      msgs.add(if (s.endsWith("\n")) s.substring(0, s.length - 1) else s)
    }
    for (line <- lines) {
      if (line.startsWith("From ")) {
        close()
        if (msgs.size() >= MaxMessages) return unknown
        cur = new StringBuilder()
      } else if (cur == null) {
        if (line.nonEmpty) return unknown // content before any envelope
      } else {
        // mboxrd un-stuffing: one '>' comes off a >+From line
        val unstuffed =
          if (line.startsWith(">")) {
            var g = 0
            while (g < line.length && line.charAt(g) == '>') g += 1
            if (line.startsWith("From ", g)) line.substring(1) else line
          } else line
        if (cur.nonEmpty) cur.append('\n')
        cur.append(unstuffed)
      }
    }
    close()
    if (msgs.isEmpty) return unknown
    val arr = new Array[Any](msgs.size())
    var i = 0
    while (i < msgs.size()) {
      arr(i) = UTF8String.fromString(msgs.get(i))
      i += 1
    }
    new GenericInternalRow(Array[Any](FmtMbox, msgs.size(),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)))
  }
}

/** Fixture: `1 + doc mod 3` [[EmlSynth]] messages concatenated with
  * `From ` envelope lines, with a body line that needs mboxrd
  * un-stuffing spliced into the first message.
  */
object MboxSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nMessages(doc: Long): Int = 1 + fm(doc, 3)

  /** Message k of the shard is the eml fixture for seed 7·doc+k. */
  def memberSeed(doc: Long, k: Int): Long = 7 * doc + k

  def mboxString(doc: Long): String = {
    val sb = new StringBuilder()
    for (k <- 0 until nMessages(doc)) {
      sb.append(s"From s@ex.org Mon Apr ${1 + fm(doc + k, 28)} 2025\n")
      val eml = EmlSynth.emlString(memberSeed(doc, k))
      if (k == 0) {
        // a stuffed body line the splitter must un-stuff
        sb.append(eml)
        sb.append("\n>From the archives: note ").append(fm(doc, 9)).append('\n')
      } else sb.append(eml)
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    }
    sb.toString
  }
}

/** Expression wrapping [[MboxSynth.mboxString]]. */
case class SynthMbox(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    UTF8String.fromString(MboxSynth.mboxString(doc.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.spark.sql.graftnative.MboxSynth.mboxString($d));
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EmlFunctions {
  /** Column API: RFC 5322 + MIME email parsing. */
  def eml_message(payload: Column): Column =
    ExpressionUtils.column(EmlMessage(ExpressionUtils.expression(payload)))

  /** Column API: four-shape email fixture from a doc seed. */
  def synth_eml(doc: Column): Column =
    ExpressionUtils.column(SynthEml(ExpressionUtils.expression(doc)))

  /** Column API: mboxrd container splitting. */
  def mbox_split(payload: Column): Column =
    ExpressionUtils.column(MboxSplit(ExpressionUtils.expression(payload)))

  /** Column API: mbox shard fixture from a doc seed. */
  def synth_mbox(doc: Column): Column =
    ExpressionUtils.column(SynthMbox(ExpressionUtils.expression(doc)))
}
