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

/** PDF text extraction — the single largest training-data text
  * modality, parsed for real from the bytes up (ISO 32000-1 / the
  * public PDF 1.7 reference):
  *
  *  - `%PDF-1.x` header, `startxref` located from the tail, CLASSIC
  *    cross-reference tables (`xref` subsections of
  *    `offset generation n/f` entries) chained through trailer
  *    `/Prev` — incremental-update files resolve to their NEWEST
  *    object versions because newer xref sections take precedence.
  *  - A real COS object parser: dictionaries, arrays, names with
  *    `#xx` escapes, literal strings with `\`-escapes (including
  *    octal and nested balanced parens), hex strings, numbers,
  *    booleans, null, and `n g R` indirect references resolved
  *    through the xref with cycle/depth caps.
  *  - Streams with direct OR indirect `/Length`, raw or
  *    `/FlateDecode` (zlib inflate, output-capped against
  *    decompression bombs).
  *  - The page tree walked from trailer `/Root → /Pages`, recursive
  *    `/Kids` with intermediate `/Pages` nodes, per page `/Contents`
  *    as one stream or an array (concatenated in order).
  *  - Content-stream text assembly with FIXED engine-agnostic rules:
  *    inside `BT…ET`, `Tj`/`'`/`"` show their string, `TJ` shows its
  *    array (numeric kern adjustments ≤ −180 thousandths render as
  *    one space); `Td`/`TD`/`T*`/`'`/`"` start a new line; page texts
  *    join lines with `\n`.
  *
  * Honest rejects (never guesses): encrypted files (trailer
  * `/Encrypt`), CID-keyed text (any page resource font with
  * `/Subtype /Type0` — glyph-indexed strings are NOT character codes
  * and emitting them would be garbage), cross-reference STREAMS (the
  * PDF 1.5+ compressed-xref form; `startxref` landing on an object
  * rather than `xref` rejects — a disclosed scope bound, not an
  * oversight), torn objects, and missing catalog/page structure.
  * Simple fonts (Type1/TrueType with standard encodings) show byte
  * strings whose printable range coincides with Latin-1, which is
  * exactly the regime where byte-level extraction is sound.
  *
  * The reference pipeline has no document modality at all (text
  * arrives pre-extracted via yfinance JSON); this is pipeline-brief
  * surface. At 100 TB: one per-row parse, zero shuffle until the
  * caller explodes pages.
  */
case class PdfText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = PdfText.schema

  override def nullSafeEval(v: Any): Any =
    PdfText.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.PdfText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PdfText {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("version", StringType, nullable = true),
    StructField("n_pages", IntegerType, nullable = true),
    StructField("pages", ArrayType(StructType(Seq(
      StructField("page_idx", IntegerType, nullable = false),
      StructField("text", StringType, nullable = false))),
      containsNull = false), nullable = true)))

  private val FmtPdf = UTF8String.fromString("pdf")
  private val FmtUnknown = UTF8String.fromString("unknown")

  private val MaxObjects = 1 << 16
  private val MaxPages = 4096
  private val MaxInflated = 1 << 24
  private val MaxTextChars = 1 << 22
  private val MaxRefDepth = 32

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null, null, null))

  // ------------------------------------------------------ COS objects

  private[graftnative] final case class PdfName(s: String)
  private[graftnative] final case class PdfRef(num: Int, gen: Int)
  private[graftnative] final case class PdfStr(bytes: Array[Byte])
  private[graftnative] final class PdfStream(val dict: Map[String, Any],
      val dataOff: Int, val dataLen: Int)

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** COS object lexer/parser over the raw bytes. Throws PdfBad on any
    * malformed construct; compute catches once at the top.
    */
  private final class Bad extends RuntimeException("pdf parse", null, false, false)
  private def bad(): Nothing = throw new Bad

  private final class P(val b: Array[Byte], var pos: Int) {
    def skipWs(): Unit = {
      var more = true
      while (more) {
        while (pos < b.length && isWs(b(pos) & 0xFF)) pos += 1
        if (pos < b.length && b(pos) == '%') { // comment to EOL
          while (pos < b.length && b(pos) != '\n' && b(pos) != '\r') pos += 1
        } else more = false
      }
    }
    def peek: Int = if (pos < b.length) b(pos) & 0xFF else -1
    def keyword(): String = {
      val st = pos
      while (pos < b.length && !isWs(b(pos) & 0xFF) && !isDelim(b(pos) & 0xFF))
        pos += 1
      if (pos == st) bad()
      new String(b, st, pos - st, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    def expect(s: String): Unit = {
      skipWs()
      var i = 0
      while (i < s.length) {
        if (pos >= b.length || b(pos) != s.charAt(i)) bad()
        pos += 1
        i += 1
      }
    }

    def name(): PdfName = {
      if (peek != '/') bad()
      pos += 1
      val sb = new StringBuilder()
      while (pos < b.length && !isWs(b(pos) & 0xFF) && !isDelim(b(pos) & 0xFF)) {
        val c = b(pos) & 0xFF
        if (c == '#' && pos + 2 < b.length) {
          val v = Character.digit(b(pos + 1), 16) * 16 +
            Character.digit(b(pos + 2), 16)
          if (v < 0) bad()
          sb.append(v.toChar)
          pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      PdfName(sb.toString)
    }

    def literalString(): PdfStr = {
      if (peek != '(') bad()
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        if (pos >= b.length) bad()
        val c = b(pos) & 0xFF
        pos += 1
        c match {
          case '(' => depth += 1; out.write(c)
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(c)
          case '\\' =>
            if (pos >= b.length) bad()
            val e = b(pos) & 0xFF
            pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' | ')' | '\\' => out.write(e)
              case '\r' => if (pos < b.length && b(pos) == '\n') pos += 1
              case '\n' => // line continuation: nothing
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && pos < b.length && b(pos) >= '0' && b(pos) <= '7') {
                  v = v * 8 + (b(pos) - '0')
                  pos += 1
                  k += 1
                }
                out.write(v & 0xFF)
              case other => out.write(other) // spec: backslash dropped
            }
          case _ => out.write(c)
        }
      }
      PdfStr(out.toByteArray)
    }

    def hexString(): PdfStr = {
      // caller consumed nothing; peek == '<' and next != '<'
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        if (pos >= b.length) bad()
        val c = b(pos) & 0xFF
        pos += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi * 16) // odd count: last digit 0-padded
          done = true
        } else if (!isWs(c)) {
          val d = Character.digit(c, 16)
          if (d < 0) bad()
          if (hi < 0) hi = d
          else { out.write(hi * 16 + d); hi = -1 }
        }
      }
      PdfStr(out.toByteArray)
    }

    /** Parse one object. Numbers look ahead for `g R` references. */
    def obj(depth: Int): Any = {
      if (depth > 64) bad()
      skipWs()
      peek match {
        case -1 => bad()
        case '/' => name()
        case '(' => literalString()
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Any]
          skipWs()
          while (peek != ']') {
            items += obj(depth + 1)
            skipWs()
            if (peek == -1) bad()
          }
          pos += 1
          items.result()
        case '<' =>
          if (pos + 1 < b.length && b(pos + 1) == '<') {
            pos += 2
            var m = Map.empty[String, Any]
            skipWs()
            while (peek != '>') {
              val k = name()
              m += (k.s -> obj(depth + 1))
              skipWs()
              if (peek == -1) bad()
            }
            expect(">>")
            m
          } else hexString()
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val st = pos
          pos += 1
          while (pos < b.length && ((b(pos) >= '0' && b(pos) <= '9') ||
            b(pos) == '.')) pos += 1
          val tok = new String(b, st, pos - st,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          if (!tok.contains('.') && tok.charAt(0) >= '0') {
            // lookahead: `num gen R`
            val save = pos
            skipWs()
            if (peek >= '0' && peek <= '9') {
              val st2 = pos
              while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') pos += 1
              val gen = new String(b, st2, pos - st2,
                java.nio.charset.StandardCharsets.ISO_8859_1)
              skipWs()
              if (peek == 'R' &&
                (pos + 1 >= b.length || isWs(b(pos + 1) & 0xFF) ||
                  isDelim(b(pos + 1) & 0xFF))) {
                pos += 1
                return PdfRef(tok.toInt, gen.toInt)
              }
            }
            pos = save
          }
          if (tok.contains('.')) tok.toDouble else tok.toLong
        case _ =>
          keyword() match {
            case "true" => java.lang.Boolean.TRUE
            case "false" => java.lang.Boolean.FALSE
            case "null" => null
            case _ => bad()
          }
      }
    }
  }

  // ------------------------------------------------------ document

  private final class Doc(val b: Array[Byte], val xref: Map[Int, Int],
      val trailer: Map[String, Any]) {
    private val memo = new java.util.HashMap[Int, Any]()
    private val inflight = new java.util.HashSet[Int]()

    /** Fetch object `num`: parses `num gen obj … endobj`, returning the
      * body or a PdfStream.
      */
    def fetch(num: Int): Any = {
      val cached = memo.get(num)
      if (cached != null || memo.containsKey(num)) return cached
      val off = xref.getOrElse(num, -1)
      if (off < 0 || off >= b.length) bad()
      if (!inflight.add(num)) bad() // reference cycle through a fetch
      val p = new P(b, off)
      p.skipWs()
      val n2 = p.keyword()
      if (n2.toIntOption.getOrElse(-1) != num) bad()
      p.skipWs()
      p.keyword().toIntOption.getOrElse(bad()) // generation
      p.skipWs()
      if (p.keyword() != "obj") bad()
      val body = p.obj(0)
      p.skipWs()
      val result: Any = body match {
        case dict: Map[String @unchecked, Any @unchecked] if {
          val save = p.pos
          val kw = if (p.peek == -1) "" else p.keyword()
          if (kw != "stream") { p.pos = save; false } else true
        } =>
          // EOL after `stream`: CRLF or LF
          if (p.peek == '\r') p.pos += 1
          if (p.peek == '\n') p.pos += 1
          val len = resolve(dict.getOrElse("Length", null), 0) match {
            case l: java.lang.Long => l.toInt
            case _ => bad()
          }
          if (len < 0 || p.pos + len > b.length) bad()
          new PdfStream(dict, p.pos, len)
        case other => other
      }
      inflight.remove(num)
      memo.put(num, result)
      result
    }

    def resolve(v: Any, depth: Int): Any = v match {
      case PdfRef(num, _) =>
        if (depth > MaxRefDepth) bad()
        resolve(fetch(num), depth + 1)
      case other => other
    }

    /** Decoded stream bytes: raw or FlateDecode. */
    def streamData(s: PdfStream): Array[Byte] = {
      val raw = java.util.Arrays.copyOfRange(b, s.dataOff, s.dataOff + s.dataLen)
      resolve(s.dict.getOrElse("Filter", null), 0) match {
        case null => raw
        case PdfName("FlateDecode") => inflate(raw)
        case v: Vector[Any @unchecked] if v.isEmpty => raw
        case v: Vector[Any @unchecked]
          if v.size == 1 && v.head == PdfName("FlateDecode") => inflate(raw)
        case _ => bad() // other filters: out of scope, reject
      }
    }
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => bad() }
        if (n == 0 && inf.needsInput()) bad() // truncated
        out.write(buf, 0, n)
        if (out.size() > MaxInflated) bad()
      }
      out.toByteArray
    } finally inf.end()
  }

  // --------------------------------------------------------- xref

  /** Load the classic xref chain from `startxref`; newest sections win. */
  private def loadXref(b: Array[Byte]): (Map[Int, Int], Map[String, Any]) = {
    // find `startxref` in the tail
    val tailFrom = math.max(0, b.length - 2048)
    val tail = new String(b, tailFrom, b.length - tailFrom,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val sx = tail.lastIndexOf("startxref")
    if (sx < 0) bad()
    val p0 = new P(b, tailFrom + sx + "startxref".length)
    p0.skipWs()
    var at = p0.keyword().toLongOption.getOrElse(bad()).toInt
    var xref = Map.empty[Int, Int]
    var trailer: Map[String, Any] = null
    var hops = 0
    while (at >= 0) {
      hops += 1
      if (hops > 64 || at >= b.length) bad()
      val p = new P(b, at)
      p.skipWs()
      // a cross-reference STREAM starts with `num gen obj` — disclosed
      // out of scope; only the classic table form is accepted
      if (p.keyword() != "xref") bad()
      var done = false
      while (!done) {
        p.skipWs()
        if (p.peek >= '0' && p.peek <= '9') {
          val start = p.keyword().toIntOption.getOrElse(bad())
          p.skipWs()
          val count = p.keyword().toIntOption.getOrElse(bad())
          if (count < 0 || start < 0 || start + count > MaxObjects) bad()
          var k = 0
          while (k < count) {
            p.skipWs()
            val off = p.keyword()
            p.skipWs()
            p.keyword() // generation
            p.skipWs()
            val typ = p.keyword()
            if (off.length != 10 || typ.length != 1) bad()
            if (typ == "n" && !xref.contains(start + k))
              xref += ((start + k) -> off.toInt)
            else if (typ != "n" && typ != "f") bad()
            k += 1
          }
        } else done = true
      }
      p.skipWs()
      if (p.keyword() != "trailer") bad()
      val t = p.obj(0) match {
        case m: Map[String @unchecked, Any @unchecked] => m
        case _ => bad()
      }
      if (trailer == null) trailer = t
      at = t.getOrElse("Prev", null) match {
        case l: java.lang.Long => l.toInt
        case null => -1
        case _ => bad()
      }
    }
    (xref, trailer)
  }

  // ------------------------------------------------- content streams

  /** Fixed text-assembly rules over one page's concatenated content. */
  private def pageText(content: Array[Byte], budget: Int): String = {
    val p = new P(content, 0)
    val sb = new StringBuilder()
    var inText = false
    def newline(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    def show(s: PdfStr): Unit = {
      var i = 0
      while (i < s.bytes.length) {
        sb.append((s.bytes(i) & 0xFF).toChar) // Latin-1 byte semantics
        i += 1
      }
      if (sb.length > budget) bad()
    }
    val operands = new java.util.ArrayList[Any]()
    var done = false
    while (!done) {
      p.skipWs()
      if (p.peek == -1) done = true
      else {
        val c = p.peek
        if (c == '/' || c == '(' || c == '[' || c == '<' || c == '+' ||
          c == '-' || c == '.' || (c >= '0' && c <= '9')) {
          operands.add(p.obj(0))
        } else {
          val op = p.keywordOrSym().mkString
          op match {
            case "BT" => inText = true; operands.clear()
            case "ET" => inText = false; operands.clear()
            case "Tj" =>
              if (inText && operands.size() > 0)
                operands.get(operands.size() - 1) match {
                  case s: PdfStr => show(s)
                  case _ =>
                }
              operands.clear()
            case "TJ" =>
              if (inText && operands.size() > 0)
                operands.get(operands.size() - 1) match {
                  case arr: Vector[Any @unchecked] =>
                    arr.foreach {
                      case s: PdfStr => show(s)
                      case n: java.lang.Long =>
                        if (n <= -180) { sb.append(' '); if (sb.length > budget) bad() }
                      case d: java.lang.Double =>
                        if (d <= -180) { sb.append(' '); if (sb.length > budget) bad() }
                      case _ =>
                    }
                  case _ =>
                }
              operands.clear()
            case "'" =>
              if (inText) {
                newline()
                if (operands.size() > 0)
                  operands.get(operands.size() - 1) match {
                    case s: PdfStr => show(s)
                    case _ =>
                  }
              }
              operands.clear()
            case "\"" =>
              if (inText) {
                newline()
                if (operands.size() > 0)
                  operands.get(operands.size() - 1) match {
                    case s: PdfStr => show(s)
                    case _ =>
                  }
              }
              operands.clear()
            case "Td" | "TD" | "T*" =>
              if (inText) newline()
              operands.clear()
            case _ => operands.clear() // any other operator: no text effect
          }
        }
      }
    }
    sb.toString
  }

  // one-symbol operators (' and ") plus regular keywords
  private implicit final class POps(val p: P) {
    def keywordOrSym(): Seq[Char] = {
      val c = p.peek
      if (c == '\'' || c == '"') { p.pos += 1; Seq(c.toChar) }
      else p.keyword().toSeq
    }
  }

  // --------------------------------------------------------- compute

  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 32) return unknown
    if (!(b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F' &&
      b(4) == '-')) return unknown
    var ve = 5
    while (ve < math.min(16, b.length) && !isWs(b(ve) & 0xFF)) ve += 1
    val version = new String(b, 5, ve - 5,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    try {
      val (xref, trailer) = loadXref(b)
      if (trailer.contains("Encrypt")) return unknown // honest reject
      val doc = new Doc(b, xref, trailer)
      val root = doc.resolve(trailer.getOrElse("Root", null), 0) match {
        case m: Map[String @unchecked, Any @unchecked] => m
        case _ => bad()
      }
      val pagesRoot = doc.resolve(root.getOrElse("Pages", null), 0) match {
        case m: Map[String @unchecked, Any @unchecked] => m
        case _ => bad()
      }
      // collect leaf pages depth-first
      val pages = new java.util.ArrayList[Map[String, Any]]()
      def walk(node: Map[String, Any], depth: Int): Unit = {
        if (depth > 32 || pages.size() > MaxPages) bad()
        doc.resolve(node.getOrElse("Type", null), 0) match {
          case PdfName("Pages") =>
            doc.resolve(node.getOrElse("Kids", null), 0) match {
              case kids: Vector[Any @unchecked] =>
                kids.foreach { k =>
                  doc.resolve(k, 0) match {
                    case m: Map[String @unchecked, Any @unchecked] =>
                      walk(m, depth + 1)
                    case _ => bad()
                  }
                }
              case _ => bad()
            }
          case PdfName("Page") => pages.add(node)
          case _ => bad()
        }
      }
      walk(pagesRoot, 0)
      if (pages.isEmpty) bad()
      // CID gate: any Type0 font in any page's resources rejects
      var pi = 0
      while (pi < pages.size()) {
        doc.resolve(pages.get(pi).getOrElse("Resources", null), 0) match {
          case res: Map[String @unchecked, Any @unchecked] =>
            doc.resolve(res.getOrElse("Font", null), 0) match {
              case fonts: Map[String @unchecked, Any @unchecked] =>
                fonts.values.foreach { f =>
                  doc.resolve(f, 0) match {
                    case fd: Map[String @unchecked, Any @unchecked] =>
                      if (doc.resolve(fd.getOrElse("Subtype", null), 0) ==
                        PdfName("Type0")) return unknown
                    case _ =>
                  }
                }
              case _ =>
            }
          case _ =>
        }
        pi += 1
      }
      // text per page
      val rows = new Array[Any](pages.size())
      var total = 0
      pi = 0
      while (pi < pages.size()) {
        val contents = doc.resolve(pages.get(pi).getOrElse("Contents", null), 0)
        val buf = new java.io.ByteArrayOutputStream()
        def append(v: Any): Unit = doc.resolve(v, 0) match {
          case s: PdfStream =>
            val d = doc.streamData(s)
            buf.write(d, 0, d.length)
            buf.write('\n') // stream boundary is a token boundary
          case null =>
          case _ => bad()
        }
        contents match {
          case arr: Vector[Any @unchecked] => arr.foreach(append)
          case other => append(other)
        }
        val text = pageText(buf.toByteArray, MaxTextChars - total)
        total += text.length
        rows(pi) = new GenericInternalRow(
          Array[Any](pi, UTF8String.fromString(text)))
        pi += 1
      }
      new GenericInternalRow(Array[Any](FmtPdf,
        UTF8String.fromString(version), pages.size(),
        new GenericArrayData(rows)))
    } catch {
      case _: Bad => unknown
      case _: NumberFormatException => unknown
      case _: StackOverflowError => unknown
    }
  }
}

/** Fixture ENCODER for [[PdfText]]: complete, valid PDFs whose
  * extracted page text is a pure seed formula. Every structural
  * obstacle the parser claims sits on the oracle hash across the seed
  * rotation:
  *
  *  - `1 + doc mod 3` pages; docs with `doc mod 3 == 0` route them
  *    through a TWO-LEVEL page tree (Pages → [Pages[kids…], lastPage]).
  *  - odd docs FlateDecode every content stream; `doc mod 4 == 2`
  *    stores `/Length` as an INDIRECT reference.
  *  - page text exercises `Tj` (with escaped parens), `TJ` (kern
  *    −200 renders a space, −50 does not), the `'` next-line-show
  *    operator, and a HEX string.
  *  - docs with `doc mod 5 == 0` append an INCREMENTAL UPDATE that
  *    re-defines page 0's content stream (new text) behind a second
  *    xref with `/Prev` — extraction must surface the UPDATED text.
  */
object PdfSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nPages(doc: Long): Int = 1 + fm(doc, 3)
  def updated(doc: Long): Boolean = fm(doc, 5) == 0

  /** The text both engines must agree on for page p. */
  def pageText(doc: Long, p: Int): String = {
    val first =
      if (p == 0 && updated(doc)) s"Doc $doc page 0 (updated)"
      else s"Doc $doc page $p (alpha)"
    first + "\n" +
      s"seg $doc one two\n" +
      s"quote 'p$p'\n" +
      s"hex ${java.lang.Long.toHexString(java.lang.Math.floorMod(doc, 256L))}"
  }

  private def contentStream(doc: Long, p: Int, textOverride: String = null): String = {
    val first = if (textOverride != null) textOverride
      else s"Doc $doc page $p \\(alpha\\)"
    val hex = {
      val s = s"hex ${java.lang.Long.toHexString(java.lang.Math.floorMod(doc, 256L))}"
      s.map(c => f"${c.toInt}%02X").mkString
    }
    s"""BT
       |/F1 12 Tf
       |72 720 Td
       |($first) Tj
       |0 -14 TD
       |[(seg $doc) -200 (one) -50 ( two)] TJ
       |(quote 'p$p') '
       |T*
       |<$hex> Tj
       |ET""".stripMargin
  }

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  private final class Builder {
    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.Map[Int, Int]()
    def raw(s: String): Unit = {
      val b = s.getBytes(Latin1)
      out.write(b, 0, b.length)
    }
    def obj(num: Int, body: String): Unit = {
      offsets(num) = out.size()
      raw(s"$num 0 obj\n$body\nendobj\n")
    }
    def streamObj(num: Int, dict: String, data: Array[Byte]): Unit = {
      offsets(num) = out.size()
      raw(s"$num 0 obj\n$dict\nstream\n")
      out.write(data, 0, data.length)
      raw("\nendstream\nendobj\n")
    }
    def xrefAndTrailer(nums: Seq[Int], size: Int, rootRef: String,
        prev: Int = -1): Unit = {
      val xrefAt = out.size()
      raw("xref\n0 1\n0000000000 65535 f \n")
      nums.sorted.foreach { n =>
        raw(f"$n%d 1\n${offsets(n)}%010d 00000 n \n")
      }
      val prevPart = if (prev >= 0) s" /Prev $prev" else ""
      raw(s"trailer\n<< /Size $size /Root $rootRef$prevPart >>\n")
      raw(s"startxref\n$xrefAt\n%%EOF\n")
    }
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(data)
      d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  def pdfBytes(doc: Long): Array[Byte] = {
    if (doc < 0) return null
    val np = nPages(doc)
    val flate = fm(doc, 2) == 1
    val indirectLen = fm(doc, 4) == 2
    val twoLevel = fm(doc, 3) == 0

    val b = new Builder
    b.raw("%PDF-1.4\n%âãÏÓ\n")
    // object plan: 1 catalog, 2 pages root, 3 font,
    // pages at 10+p, contents at 20+p, lengths at 30+p (if indirect),
    // inner pages node at 4 (two-level docs)
    val kidsRefs =
      if (twoLevel && np > 1)
        s"[4 0 R ${10 + np - 1} 0 R]"
      else (0 until np).map(p => s"${10 + p} 0 R").mkString("[", " ", "]")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.obj(2, s"<< /Type /Pages /Kids $kidsRefs /Count $np >>")
    b.obj(3, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    if (twoLevel && np > 1) {
      val inner = (0 until np - 1).map(p => s"${10 + p} 0 R")
        .mkString("[", " ", "]")
      b.obj(4, s"<< /Type /Pages /Kids $inner /Count ${np - 1} /Parent 2 0 R >>")
    }
    for (p <- 0 until np) {
      val parent = if (twoLevel && np > 1 && p < np - 1) "4 0 R" else "2 0 R"
      b.obj(10 + p,
        s"""<< /Type /Page /Parent $parent /MediaBox [0 0 612 792]
           | /Resources << /Font << /F1 3 0 R >> >>
           | /Contents ${20 + p} 0 R >>""".stripMargin)
      val cs = contentStream(doc, p).getBytes(Latin1)
      val data = if (flate) deflate(cs) else cs
      val lenPart =
        if (indirectLen) s"/Length ${30 + p} 0 R"
        else s"/Length ${data.length}"
      val filterPart = if (flate) " /Filter /FlateDecode" else ""
      b.streamObj(20 + p, s"<< $lenPart$filterPart >>", data)
      if (indirectLen) b.obj(30 + p, data.length.toString)
    }
    val baseNums = Seq(1, 2, 3) ++ (if (twoLevel && np > 1) Seq(4) else Nil) ++
      (0 until np).flatMap(p =>
        Seq(10 + p, 20 + p) ++ (if (indirectLen) Seq(30 + p) else Nil))
    b.xrefAndTrailer(baseNums, 64, "1 0 R")

    if (updated(doc)) {
      // incremental update: re-define page 0's content stream and chain
      // the new xref to the previous one
      val firstXrefAt = {
        // recover the base section's startxref target: it is the offset
        // the Builder wrote; recompute by scanning the tail
        val s = new String(b.out.toByteArray, Latin1)
        val at = s.lastIndexOf("startxref")
        s.substring(at + 10, s.indexOf('\n', at + 10)).trim.toInt
      }
      val cs2 = contentStream(doc, 0,
        textOverride = s"Doc $doc page 0 \\(updated\\)").getBytes(Latin1)
      val data2 = if (flate) deflate(cs2) else cs2
      val filterPart = if (flate) " /Filter /FlateDecode" else ""
      b.streamObj(20, s"<< /Length ${data2.length}$filterPart >>", data2)
      b.xrefAndTrailer(Seq(20), 64, "1 0 R", prev = firstXrefAt)
    }
    b.out.toByteArray
  }
}

/** Expression wrapping [[PdfSynth.pdfBytes]]. */
case class SynthPdf(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    PdfSynth.pdfBytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.PdfSynth.pdfBytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PdfFunctions {
  /** Column API: PDF page-text extraction. */
  def pdf_text(payload: Column): Column =
    ExpressionUtils.column(PdfText(ExpressionUtils.expression(payload)))

  /** Column API: structured-PDF fixture from a doc seed. */
  def synth_pdf(doc: Column): Column =
    ExpressionUtils.column(SynthPdf(ExpressionUtils.expression(doc)))
}
