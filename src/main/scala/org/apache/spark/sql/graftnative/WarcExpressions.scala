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

/** WARC-in-gzip record extraction — the storage shape web crawls
  * actually arrive in (Common Crawl WARC/WET/WAT files are
  * CONCATENATED gzip members, one WARC record per member, precisely so
  * records are independently seekable). The walk is real end to end:
  * each member's gzip header is parsed (FHCRC/FEXTRA/FNAME flags —
  * FNAME skipped by its NUL, the others rejected honestly), the
  * DEFLATE body inflated with the JDK `Inflater` (the PNG stance), and
  * the member's CRC-32 AND ISIZE trailers VERIFIED against the
  * decompressed bytes — a flipped payload bit or a short write rejects
  * the whole input rather than emitting corrupt text. Each
  * decompressed member must be one WARC/1.x record: version line,
  * `Name: value` headers to the blank line, `Content-Length` bytes of
  * block, then the record-separating CRLF CRLF. `WARC-Type` and
  * `WARC-Target-URI` are surfaced per record with the block itself,
  * which is what a WET-style text pipeline consumes. Torn members,
  * trailer mismatches, header overruns, or a missing Content-Length
  * yield a null STRUCT — never a partial record list.
  */
case class WarcRecords(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = WarcRecords.schema
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    WarcRecords.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.WarcRecords.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WarcRecords {
  val schema: StructType = StructType(Seq(
    StructField("n_members", IntegerType, nullable = false),
    StructField("records", ArrayType(StructType(Seq(
      StructField("rec_type", StringType, nullable = true),
      StructField("uri", StringType, nullable = true),
      StructField("body", StringType, nullable = false))), containsNull = false),
      nullable = false)))

  private val MaxMembers = 4096
  private val MaxInflated = 1 << 24

  /** Per-thread reusable inflater: a crawl-scale decode walks millions
    * of small members, and per-member native Inflater allocation costs
    * more than the inflate itself; reset() restores fresh-stream state.
    */
  private val tlInf = ThreadLocal.withInitial[java.util.zip.Inflater](() =>
    new java.util.zip.Inflater(true))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def leU32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** Inflate one gzip member starting at `off`; returns
    * (decompressed, nextOffset) or null.
    */
  private[sql] def member(b: Array[Byte], off: Int): (Array[Byte], Int) = {
    if (off + 18 > b.length) return null // header 10 + trailer 8 minimum
    if (u8(b, off) != 0x1F || u8(b, off + 1) != 0x8B || u8(b, off + 2) != 8)
      return null
    val flags = u8(b, off + 3)
    // FTEXT (1) is advisory; FNAME (8) is skippable; FEXTRA (4),
    // FHCRC (2), FCOMMENT (16), reserved: reject honestly
    if ((flags & ~0x09) != 0) return null
    var i = off + 10
    if ((flags & 8) != 0) {
      while (i < b.length && b(i) != 0) i += 1
      if (i >= b.length) return null
      i += 1
    }
    val inf = tlInf.get()
    inf.reset()
    inf.setInput(b, i, b.length - i)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var remaining = -1
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return null // truncated/needs dict
        out.write(buf, 0, n)
        if (out.size() > MaxInflated) return null
      }
      remaining = inf.getRemaining
    } catch {
      case _: java.util.zip.DataFormatException => return null
    }
    val consumed = (b.length - i) - remaining
    val trailerAt = i + consumed
    if (trailerAt + 8 > b.length) return null
    val data = out.toByteArray
    val crc = new java.util.zip.CRC32()
    crc.update(data, 0, data.length)
    if ((crc.getValue & 0xFFFFFFFFL) != leU32(b, trailerAt)) return null
    if ((data.length.toLong & 0xFFFFFFFFL) != leU32(b, trailerAt + 4)) return null
    (data, trailerAt + 8)
  }

  /** Parse one decompressed member as a single WARC record. */
  private[sql] def record(d: Array[Byte]): InternalRow = {
    // version line
    var i = 0
    def line(): String = {
      val start = i
      while (i + 1 < d.length && !(d(i) == '\r' && d(i + 1) == '\n')) i += 1
      if (i + 1 >= d.length) return null
      val s = new String(d, start, i - start,
        java.nio.charset.StandardCharsets.UTF_8)
      i += 2
      s
    }
    val ver = line()
    if (ver == null || !ver.startsWith("WARC/1.")) return null
    var recType: String = null
    var uri: String = null
    var contentLength = -1L
    var walking = true
    while (walking) {
      val l = line()
      if (l == null) return null
      if (l.isEmpty) walking = false
      else {
        val c = l.indexOf(':')
        if (c <= 0) return null
        val name = l.substring(0, c).trim
        val value = l.substring(c + 1).trim
        if (name.equalsIgnoreCase("WARC-Type")) recType = value
        else if (name.equalsIgnoreCase("WARC-Target-URI")) uri = value
        else if (name.equalsIgnoreCase("Content-Length")) {
          try contentLength = java.lang.Long.parseLong(value)
          catch { case _: NumberFormatException => return null }
        }
      }
    }
    if (contentLength < 0 || i + contentLength > d.length) return null
    val body = new String(d, i, contentLength.toInt,
      java.nio.charset.StandardCharsets.UTF_8)
    i += contentLength.toInt
    // the record-separating CRLF CRLF (WARC/1.0 §4)
    if (i + 4 > d.length || d(i) != '\r' || d(i + 1) != '\n' ||
        d(i + 2) != '\r' || d(i + 3) != '\n') return null
    new GenericInternalRow(Array[Any](
      if (recType == null) null else UTF8String.fromString(recType),
      if (uri == null) null else UTF8String.fromString(uri),
      UTF8String.fromString(body)))
  }

  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 18) return null
    val recs = new java.util.ArrayList[InternalRow]()
    var off = 0
    while (off < b.length) {
      if (recs.size() >= MaxMembers) return null
      val m = member(b, off)
      if (m == null) return null
      val r = record(m._1)
      if (r == null) return null
      recs.add(r)
      off = m._2
    }
    if (recs.isEmpty) return null
    val arr = new Array[Any](recs.size())
    var k = 0
    while (k < arr.length) { arr(k) = recs.get(k); k += 1 }
    new GenericInternalRow(Array[Any](recs.size(), new GenericArrayData(arr)))
  }
}

/** Fixture: a WET-style WARC file as concatenated gzip members — one
  * `warcinfo` record then `2 + seed mod 3` `conversion` records with
  * formula URIs and bodies (what the oracle replays), each member
  * REALLY deflate-compressed with correct CRC-32/ISIZE trailers.
  * Odd-seed members carry an FNAME field so the skippable-flag path is
  * exercised on the oracle-checked walk.
  */
object WarcSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  private val tlDefl = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    // BEST_SPEED: the fixture prices the DECODE side; level-6 encode was
  // ~3x the inflate+verify cost and dominated the key's wall time
  new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true))

  def nConversion(seed: Long): Int = 2 + fm(seed, 3)
  def uri(seed: Long, rec: Int): String = s"https://example.com/$seed/$rec"
  def body(seed: Long, rec: Int): String =
    s"text $seed $rec " + "ab" * (5 + fm(seed + rec, 9))

  private def gzMember(payload: Array[Byte], name: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x1F); out.write(0x8B); out.write(8)
    out.write(if (name != null) 8 else 0) // FNAME
    out.write(0); out.write(0); out.write(0); out.write(0) // mtime
    out.write(0); out.write(255) // xfl, os unknown
    if (name != null) {
      val nb = name.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      out.write(nb, 0, nb.length)
      out.write(0)
    }
    val defl = tlDefl.get()
    defl.reset()
    defl.setInput(payload)
    defl.finish()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      out.write(buf, 0, n)
    }
    val crc = new java.util.zip.CRC32()
    crc.update(payload, 0, payload.length)
    val c = crc.getValue
    out.write((c & 0xFF).toInt); out.write(((c >> 8) & 0xFF).toInt)
    out.write(((c >> 16) & 0xFF).toInt); out.write(((c >> 24) & 0xFF).toInt)
    val n = payload.length
    out.write(n & 0xFF); out.write((n >> 8) & 0xFF)
    out.write((n >> 16) & 0xFF); out.write((n >> 24) & 0xFF)
    out.toByteArray
  }

  private def rec(typ: String, uriOpt: String, bodyText: String): Array[Byte] = {
    val body = bodyText.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(typ).append("\r\n")
    if (uriOpt != null) sb.append("WARC-Target-URI: ").append(uriOpt).append("\r\n")
    sb.append("Content-Length: ").append(body.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    out.write(body, 0, body.length)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  def warcGzBytes(seed: Long): Array[Byte] = {
    if (seed < 0) return null
    val out = new java.io.ByteArrayOutputStream()
    val info = gzMember(rec("warcinfo", null, s"software: graft-fixture $seed"), null)
    out.write(info, 0, info.length)
    var r = 0
    val n = nConversion(seed)
    while (r < n) {
      val m = gzMember(rec("conversion", uri(seed, r), body(seed, r)),
        if (fm(seed + r, 2) == 1) s"rec-$r.warc" else null)
      out.write(m, 0, m.length)
      r += 1
    }
    out.toByteArray
  }
}

/** Expression wrapping [[WarcSynth.warcGzBytes]]. */
case class SynthWarcGz(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    WarcSynth.warcGzBytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.WarcSynth.warcGzBytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WarcFunctions {
  def warc_records(payload: Column): Column =
    ExpressionUtils.column(WarcRecords(ExpressionUtils.expression(payload)))

  def synth_warc_gz(doc: Column): Column =
    ExpressionUtils.column(SynthWarcGz(ExpressionUtils.expression(doc)))
}
