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

/** ZIP archive extraction — tar's indexed sibling in dataset
  * distribution (APPNOTE.TXT / ISO 21320): the End-of-Central-
  * Directory record is located from the tail (scanning past a
  * trailing archive comment), the CENTRAL DIRECTORY drives the walk
  * (its sizes are authoritative — streamed entries with bit-3 data
  * descriptors leave the local sizes zeroed), each entry's local
  * header signature is re-verified and its own name/extra lengths
  * (which legally differ from the central copy) locate the payload,
  * and every member is DECODED FOR REAL — stored or DEFLATE via the
  * JDK inflater, output-capped — with its CRC-32 VERIFIED against the
  * decompressed bytes (the gzip/WARC stance: one corrupt member
  * rejects the archive rather than emitting plausible garbage).
  *
  * ZIP64 archives resolve fully (>4 GiB shards are routine at corpus
  * scale): 0xFFFF/0xFFFFFFFF sentinels route through the EOCD64
  * locator + record (APPNOTE §4.3.14/15) and each entry's 0x0001
  * extra field (§4.5.3) for usize/csize/offset/disk overflow — every
  * marker independently, since writers emit any subset.
  *
  * Honest rejects: encrypted entries (general-purpose bit 0),
  * compression methods other than stored/deflate, multi-disk
  * archives, sentinel fields whose ZIP64 record is absent,
  * signature/offset inconsistencies, CRC mismatches.
  *
  * Output: per entry `(name, method, offset, csize, usize,
  * payload_md5)` — byte ranges for a fetch layer plus a decode-proof
  * digest the oracle recomputes from the payload formulas. Per-row,
  * zero shuffle until the caller explodes entries.
  */
case class ZipEntries(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ZipEntries.schema
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ZipEntries.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.ZipEntries.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ZipEntries {
  val schema: StructType = StructType(Seq(
    StructField("n_entries", IntegerType, nullable = false),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("method", StringType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("csize", LongType, nullable = false),
      StructField("usize", LongType, nullable = false),
      StructField("payload_md5", StringType, nullable = false))),
      containsNull = false), nullable = false)))

  private val MaxEntries = 1 << 16
  private val MaxInflated = 1 << 24
  /** Cumulative decompressed-output cap across the whole walk (the
    * GzipText.MaxTotal discipline): 65535 central entries all pointing
    * at one small deflate payload — the classic overlapping-entry zip
    * bomb — must not turn a ~3 MB archive into a terabyte of inflate
    * work. Overlapping local ranges also reject outright (below).
    */
  private val MaxTotalInflated = 1 << 26

  /** Per-thread reusable inflater (the WarcRecords pattern): archive
    * decode walks many small members, and per-member native Inflater
    * allocation costs more than the inflate itself.
    */
  private val tlInf = ThreadLocal.withInitial[java.util.zip.Inflater](() =>
    new java.util.zip.Inflater(true))
  private val MethodStored = UTF8String.fromString("stored")
  private val MethodDeflate = UTF8String.fromString("deflate")

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def leU64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xFFL); k -= 1 }
    v
  }

  private val tlMd5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val HexDigits = "0123456789abcdef".toCharArray

  /** md5 over the payload's LOWERCASE-HEX rendering — a bijective
    * decode proof that stays inside DuckDB's VARCHAR-only md5.
    */
  private def md5OfHex(data: Array[Byte]): String = {
    val hex = new Array[Byte](data.length * 2)
    var i = 0
    while (i < data.length) {
      hex(2 * i) = HexDigits((data(i) & 0xF0) >> 4).toByte
      hex(2 * i + 1) = HexDigits(data(i) & 0x0F).toByte
      i += 1
    }
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(hex)
    val sb = new StringBuilder(32)
    d.foreach(x => sb.append(HexDigits((x & 0xF0) >> 4))
      .append(HexDigits(x & 0x0F)))
    sb.toString
  }

  /** Decoded entry view shared by the range key and the text form. */
  private[graftnative] final class DecodedEntry(val name: String,
    val method: Int, val dataOff: Long, val csize: Long,
    val data: Array[Byte])

  /** The full verified walk: EOCD, central directory, local headers,
    * decode + CRC per member; null on any reject (see the scaladoc).
    */
  private[graftnative] def decodedEntries(b: Array[Byte]): Array[DecodedEntry] = {
    if (b.length < 22) return null
    // EOCD: PK\5\6 scanned backwards past a possible comment (<= 64K)
    var eocd = -1
    var i = b.length - 22
    val stop = math.max(0, b.length - 22 - 65535)
    while (eocd < 0 && i >= stop) {
      if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6 &&
        i + 22 + leU16(b, i + 20) == b.length) eocd = i
      i -= 1
    }
    if (eocd < 0) return null
    var nEntries = leU16(b, eocd + 10)
    if (leU16(b, eocd + 8) != nEntries) return null // multi-disk: reject
    var cdSize = leU32(b, eocd + 12)
    var cdOff = leU32(b, eocd + 16)
    // cd must end where the tail structures begin: the EOCD, or the
    // EOCD64 record when the ZIP64 path below re-points it
    var cdEnd = eocd.toLong
    if (nEntries == 0xFFFF || cdSize == 0xFFFFFFFFL || cdOff == 0xFFFFFFFFL) {
      // ZIP64 (APPNOTE §4.3.14/15): the EOCD64 locator immediately
      // precedes the EOCD and points at the EOCD64 record
      val loc = eocd - 20
      if (loc < 0) return null
      if (!(b(loc) == 'P' && b(loc + 1) == 'K' && b(loc + 2) == 6 &&
        b(loc + 3) == 7)) return null
      if (leU32(b, loc + 4) != 0L) return null // disk with the EOCD64
      if (leU32(b, loc + 16) != 1L) return null // total disks
      val e64 = leU64(b, loc + 8)
      if (e64 < 0 || e64 + 56 > loc) return null
      val at = e64.toInt
      if (!(b(at) == 'P' && b(at + 1) == 'K' && b(at + 2) == 6 &&
        b(at + 3) == 6)) return null
      if (leU32(b, at + 16) != 0L || leU32(b, at + 20) != 0L)
        return null // multi-disk
      val n64 = leU64(b, at + 24)
      if (n64 != leU64(b, at + 32)) return null // per-disk vs total
      if (n64 < 0 || n64 > MaxEntries) return null
      nEntries = n64.toInt
      cdSize = leU64(b, at + 40)
      cdOff = leU64(b, at + 48)
      if (cdSize < 0 || cdOff < 0) return null
      cdEnd = e64
    }
    if (cdOff + cdSize > cdEnd) return null
    if (nEntries > MaxEntries) return null
    val out = new Array[DecodedEntry](nEntries)
    // local-header byte ranges, for the overlap rejection after the walk
    val rangeLo = new Array[Long](nEntries)
    val rangeHi = new Array[Long](nEntries)
    var totalInflated = 0L
    var p = cdOff.toInt
    var e = 0
    while (e < nEntries) {
      if (p + 46 > eocd) return null
      if (!(b(p) == 'P' && b(p + 1) == 'K' && b(p + 2) == 1 && b(p + 3) == 2))
        return null
      val flags = leU16(b, p + 8)
      if ((flags & 1) != 0) return null // encrypted: honest reject
      val method = leU16(b, p + 10)
      val crc = leU32(b, p + 16)
      var csize = leU32(b, p + 20)
      var usize = leU32(b, p + 24)
      val nameLen = leU16(b, p + 28)
      val extraLen = leU16(b, p + 30)
      val commentLen = leU16(b, p + 32)
      val diskStart = leU16(b, p + 34)
      var localOff = leU32(b, p + 42)
      if (p + 46 + nameLen + extraLen > eocd) return null
      // ZIP64 sentinels resolve through the entry's 0x0001 extra
      // field: 8-byte usize/csize/localOff (4-byte disk) present in
      // that order for exactly the fields that overflowed (§4.5.3)
      if (csize == 0xFFFFFFFFL || usize == 0xFFFFFFFFL ||
        localOff == 0xFFFFFFFFL || diskStart == 0xFFFF) {
        var x = p + 46 + nameLen
        val xEnd = x + extraLen
        var found = false
        while (!found && x + 4 <= xEnd) {
          val id = leU16(b, x)
          val len = leU16(b, x + 2)
          if (x + 4 + len > xEnd) return null
          if (id == 1) {
            var q = x + 4
            val qEnd = x + 4 + len
            if (usize == 0xFFFFFFFFL) {
              if (q + 8 > qEnd) return null
              usize = leU64(b, q); q += 8
            }
            if (csize == 0xFFFFFFFFL) {
              if (q + 8 > qEnd) return null
              csize = leU64(b, q); q += 8
            }
            if (localOff == 0xFFFFFFFFL) {
              if (q + 8 > qEnd) return null
              localOff = leU64(b, q); q += 8
            }
            if (diskStart == 0xFFFF) {
              if (q + 4 > qEnd) return null
              if (leU32(b, q) != 0L) return null // multi-disk
              q += 4
            }
            found = true
          }
          x += 4 + len
        }
        if (!found) return null // sentinel without the ZIP64 field
        if (csize < 0 || usize < 0 || localOff < 0) return null
      }
      val name = new String(b, p + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      // local header: re-verify the signature, use ITS name/extra
      // lengths (legally different from the central copy)
      val lh = localOff.toInt
      if (localOff + 30 > b.length) return null
      if (!(b(lh) == 'P' && b(lh + 1) == 'K' && b(lh + 2) == 3 &&
        b(lh + 3) == 4)) return null
      val lNameLen = leU16(b, lh + 26)
      val lExtraLen = leU16(b, lh + 28)
      val dataOff = localOff + 30 + lNameLen + lExtraLen
      if (dataOff + csize > b.length) return null
      if (usize > MaxInflated) return null
      totalInflated += usize
      if (totalInflated > MaxTotalInflated) return null // zip-bomb gate
      rangeLo(e) = localOff
      rangeHi(e) = dataOff + csize
      val raw = java.util.Arrays.copyOfRange(b, dataOff.toInt,
        (dataOff + csize).toInt)
      val data = method match {
        case 0 =>
          if (csize != usize) return null
          raw
        case 8 =>
          val inf = tlInf.get()
          inf.reset()
          inf.setInput(raw)
          val o = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var bad = false
          while (!bad && !inf.finished()) {
            val n =
              try inf.inflate(buf)
              catch {
                case _: java.util.zip.DataFormatException => bad = true; 0
              }
            if (!bad) {
              if (n == 0 && inf.needsInput()) bad = true
              else {
                o.write(buf, 0, n)
                if (o.size() > usize) bad = true
              }
            }
          }
          if (bad) return null
          o.toByteArray
        case _ => return null // other methods: out of scope
      }
      if (data.length != usize) return null
      val check = new java.util.zip.CRC32()
      check.update(data, 0, data.length)
      if (check.getValue != crc) return null // decode-proof gate
      out(e) = new DecodedEntry(name, method, dataOff, csize, data)
      p += 46 + nameLen + extraLen + commentLen
      e += 1
    }
    if (p != cdOff + cdSize) return null // central directory must tile
    // overlapping local ranges reject: two central entries aliasing the
    // same payload bytes are never produced by a real writer and are
    // the other half of the zip-bomb shape
    if (nEntries > 1) {
      val order = (0 until nEntries).sortBy(rangeLo)
      var k = 1
      while (k < nEntries) {
        if (rangeLo(order(k)) < rangeHi(order(k - 1))) return null
        k += 1
      }
    }
    out
  }

  def compute(b: Array[Byte]): InternalRow = {
    val entries = decodedEntries(b)
    if (entries == null) return null
    val out = new Array[Any](entries.length)
    var e = 0
    while (e < entries.length) {
      val en = entries(e)
      out(e) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(en.name),
        if (en.method == 0) MethodStored else MethodDeflate,
        en.dataOff, en.csize, en.data.length.toLong,
        UTF8String.fromString(md5OfHex(en.data))))
      e += 1
    }
    new GenericInternalRow(Array[Any](entries.length,
      new GenericArrayData(out)))
  }
}

/** Fixture ENCODER for [[ZipEntries]]: `2 + doc mod 3` samples of a
  * STORED `{key}.bin` plus a DEFLATED `{key}.json` (both decode paths
  * and the CRC gate on every doc), real CRC-32 fields, an archive
  * comment on `doc mod 3 == 0`, and a local extra field on member 0
  * of `doc mod 4 == 1` (the local/central length divergence). The
  * `doc mod 5` lane forces each ZIP64 marker independently (EOCD64
  * tail, size sentinels, offset sentinel, all three). Payload bytes
  * are the tar fixture's formula, so `payload_md5` has a closed-form
  * oracle.
  */
object ZipSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nSamples(doc: Long): Int = 2 + fm(doc, 3)
  def binSize(doc: Long, i: Int): Long = 100 + fm(doc * 7 + i * 13, 900)
  def jsonSize(doc: Long, i: Int): Long = 40 + fm(doc + i, 50)
  def payloadByte(doc: Long, tag: Int, k: Long): Byte =
    fm(doc * 31 + tag * 17 + k, 256).toByte

  private def payload(doc: Long, tag: Int, size: Long): Array[Byte] =
    Array.tabulate(size.toInt)(k => payloadByte(doc, tag, k))

  private val tlDefl = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true))

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = tlDefl.get()
    d.reset()
    d.setInput(data)
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    out.toByteArray
  }

  /** Generic archive writer shared by the formula fixture and the
    * EPUB fixture: `(name, method 0|8, rawPayload, localExtra)`.
    * `zip64Mode` forces ZIP64 markers independently (writers emit any
    * subset): bit 0 = EOCD64 locator+record with sentinel EOCD
    * fields, bit 1 = central usize/csize sentinels resolved by the
    * 0x0001 extra, bit 2 = central offset sentinel likewise.
    */
  private[graftnative] def writeArchive(
      members: Seq[(String, Int, Array[Byte], Array[Byte])],
      comment: String, zip64Mode: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    def u64(v: Long): Unit = {
      var k = 0
      while (k < 8) { out.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
    }
    val z64Sizes = (zip64Mode & 2) != 0
    val z64Off = (zip64Mode & 4) != 0
    final case class Entry(name: String, method: Int, crc: Long,
      data: Array[Byte], usize: Long, localOff: Long)
    val entries = scala.collection.mutable.ArrayBuffer[Entry]()
    members.foreach { case (name, method, raw, extra) =>
      val crc = new java.util.zip.CRC32()
      crc.update(raw, 0, raw.length)
      val data = if (method == 8) deflate(raw) else raw
      val localOff = out.size().toLong
      u32(0x04034B50L)
      u16(20); u16(0); u16(method)
      u16(0); u16(0) // time/date
      u32(crc.getValue); u32(data.length.toLong); u32(raw.length.toLong)
      u16(name.length); u16(extra.length)
      name.foreach(c => out.write(c))
      out.write(extra, 0, extra.length)
      out.write(data, 0, data.length)
      entries += Entry(name, method, crc.getValue, data, raw.length.toLong,
        localOff)
    }
    val cdOff = out.size().toLong
    entries.foreach { en =>
      // the 0x0001 extra carries exactly the overflowed fields, in
      // the spec's fixed order (usize, csize, localOff)
      val z64Len = (if (z64Sizes) 16 else 0) + (if (z64Off) 8 else 0)
      val extraLen = if (z64Len > 0) 4 + z64Len else 0
      u32(0x02014B50L)
      u16(20); u16(if (z64Len > 0) 45 else 20); u16(0); u16(en.method)
      u16(0); u16(0)
      u32(en.crc)
      if (z64Sizes) { u32(0xFFFFFFFFL); u32(0xFFFFFFFFL) }
      else { u32(en.data.length.toLong); u32(en.usize) }
      u16(en.name.length); u16(extraLen); u16(0)
      u16(0); u16(0); u32(0)
      if (z64Off) u32(0xFFFFFFFFL) else u32(en.localOff)
      en.name.foreach(c => out.write(c))
      if (z64Len > 0) {
        u16(1); u16(z64Len)
        if (z64Sizes) { u64(en.usize); u64(en.data.length.toLong) }
        if (z64Off) u64(en.localOff)
      }
    }
    val cdSize = out.size() - cdOff
    if ((zip64Mode & 1) != 0) {
      // EOCD64 record, then its locator, then a sentinel EOCD
      val e64At = out.size().toLong
      u32(0x06064B50L)
      u64(44L) // size of the remainder of this record
      u16(45); u16(45)
      u32(0L); u32(0L)
      u64(entries.size.toLong); u64(entries.size.toLong)
      u64(cdSize.toLong); u64(cdOff)
      u32(0x07064B50L)
      u32(0L); u64(e64At); u32(1L)
      u32(0x06054B50L)
      u16(0); u16(0)
      u16(0xFFFF); u16(0xFFFF)
      u32(0xFFFFFFFFL); u32(0xFFFFFFFFL)
      u16(comment.length)
      comment.foreach(c => out.write(c))
    } else {
      u32(0x06054B50L)
      u16(0); u16(0)
      u16(entries.size); u16(entries.size)
      u32(cdSize); u32(cdOff)
      u16(comment.length)
      comment.foreach(c => out.write(c))
    }
    out.toByteArray
  }

  /** ZIP64 marker rotation: each marker independently, then all at
    * once — small archives with forced sentinels are the legal shape
    * `force_zip64`-style writers emit, so the resolution machinery
    * sits on the oracle hash without 4 GiB fixtures.
    */
  def zip64Mode(doc: Long): Int = fm(doc, 5) match {
    case 1 => 1 // EOCD64 locator + record only
    case 2 => 2 // central size sentinels via the 0x0001 extra
    case 3 => 4 // central offset sentinel
    case 4 => 7 // everything
    case _ => 0 // classic
  }

  def zipBytes(doc: Long): Array[Byte] = {
    if (doc < 0) return null
    val n = nSamples(doc)
    val members = (0 until n).flatMap { i =>
      Seq(("bin", 0, binSize(doc, i), 2 * i),
        ("json", 8, jsonSize(doc, i), 2 * i + 1)).map {
        case (ext, method, size, tag) =>
          val extra =
            if (tag == 0 && fm(doc, 4) == 1)
              Array[Byte](0x55, 0x54, 4, 0, 1, 2, 3, 4) // an opaque field
            else Array.emptyByteArray
          (s"s${doc}_$i.$ext", method, payload(doc, tag, size), extra)
      }
    }
    writeArchive(members,
      if (fm(doc, 3) == 0) s"graft shard $doc" else "",
      zip64Mode(doc))
  }
}

/** Expression wrapping [[ZipSynth.zipBytes]]. */
case class SynthZip(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    ZipSynth.zipBytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.ZipSynth.zipBytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ZipFunctions {
  /** Column API: ZIP entry extraction with decode-proof digests. */
  def zip_entries(payload: Column): Column =
    ExpressionUtils.column(ZipEntries(ExpressionUtils.expression(payload)))

  /** Column API: two-method ZIP fixture from a doc seed. */
  def synth_zip(doc: Column): Column =
    ExpressionUtils.column(SynthZip(ExpressionUtils.expression(doc)))
}
