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

/** MP4 per-track SAMPLE TABLES — one level deeper than [[Mp4Meta]]'s
  * mvhd fields, and the level a video ingestion pipeline actually
  * needs: which codecs a file carries, how many samples, and how many
  * media bytes, per track. The walk is the real ISO BMFF box
  * hierarchy: `moov → trak → mdia → { mdhd (per-track timescale +
  * duration, v0 AND v1 layouts), hdlr (handler fourcc: vide/soun),
  * minf → stbl → { stsd (first sample-entry fourcc = the codec),
  * stsz (BOTH modes: fixed sample_size, or per-sample u32 entries
  * summed), stts (n_samples = Σ counts; decode duration = Σ count ×
  * delta) } }` — unknown sibling boxes are skipped by length, torn
  * boxes reject the file, and the stts sample count must AGREE with
  * stsz's (the classic inconsistent-file gate). Sample DATA offsets
  * (stco/stsc) are deliberately out of scope here — this is the
  * inventory pass that decides WHETHER to fetch mdat bytes.
  */
case class Mp4Tracks(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = Mp4Tracks.schema
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Mp4Tracks.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.Mp4Tracks.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4Tracks {
  val schema: StructType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("tracks", ArrayType(StructType(Seq(
      StructField("handler", StringType, nullable = true),
      StructField("codec", StringType, nullable = true),
      StructField("timescale", LongType, nullable = true),
      StructField("duration", LongType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("total_bytes", LongType, nullable = true))),
      containsNull = false), nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def beU32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def beU64(b: Array[Byte], i: Int): Long =
    (beU32(b, i) << 32) | beU32(b, i + 4)
  private def is4cc(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  private def boxLen(b: Array[Byte], i: Int, limit: Int): Long = {
    if (i + 8 > limit) return -1
    val s = beU32(b, i)
    val len = if (s == 0) (limit - i).toLong
      else if (s == 1) { if (i + 16 > limit) return -1; beU64(b, i + 8) }
      else s
    if (len < 8 || i + len > limit) -1 else len
  }

  /** Find the first child box `name` inside `[from, limit)`; returns
    * (payloadStart, payloadEnd) or null.
    */
  private def child(b: Array[Byte], from: Int, limit: Int,
      name: String): (Int, Int) = {
    var i = from
    // bounded by byte progress alone: boxLen ≥ 8 guarantees termination,
    // and a fixed sibling cap would reject well-formed files with many
    // boxes (not a format rule)
    while (i + 8 <= limit) {
      val len = boxLen(b, i, limit)
      if (len < 0) return null
      if (is4cc(b, i + 4, name)) {
        val hdr = if (beU32(b, i) == 1) 16 else 8
        return ((i + hdr, (i + len).toInt))
      }
      i += len.toInt
    }
    null
  }

  private def track(b: Array[Byte], from: Int, limit: Int): InternalRow = {
    val mdia = child(b, from, limit, "mdia")
    if (mdia == null) return null
    // mdhd
    var timescale: Any = null
    var duration: Any = null
    val mdhd = child(b, mdia._1, mdia._2, "mdhd")
    if (mdhd != null) {
      val p = mdhd._1
      val v = u8(b, p)
      if (v == 0 && p + 20 <= mdhd._2) {
        timescale = beU32(b, p + 12)
        duration = beU32(b, p + 16)
      } else if (v == 1 && p + 32 <= mdhd._2) {
        timescale = beU32(b, p + 20)
        duration = beU64(b, p + 24)
      } else return null
    }
    // hdlr: version/flags(4) pre_defined(4) handler(4)
    var handler: UTF8String = null
    val hdlr = child(b, mdia._1, mdia._2, "hdlr")
    if (hdlr != null && hdlr._1 + 12 <= hdlr._2)
      handler = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(b, hdlr._1 + 8, hdlr._1 + 12))
    val minf = child(b, mdia._1, mdia._2, "minf")
    if (minf == null) return null
    val stbl = child(b, minf._1, minf._2, "stbl")
    if (stbl == null) return null
    // stsd: version/flags(4) entry_count(4) [size(4) fourcc(4) ...]
    var codec: UTF8String = null
    val stsd = child(b, stbl._1, stbl._2, "stsd")
    if (stsd != null && stsd._1 + 16 <= stsd._2 && beU32(b, stsd._1 + 4) >= 1)
      codec = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(b, stsd._1 + 12, stsd._1 + 16))
    // stsz: version/flags(4) sample_size(4) sample_count(4) [sizes...]
    var nSamples = -1L
    var totalBytes = -1L
    val stsz = child(b, stbl._1, stbl._2, "stsz")
    if (stsz != null && stsz._1 + 12 <= stsz._2) {
      val fixed = beU32(b, stsz._1 + 4)
      val count = beU32(b, stsz._1 + 8)
      if (count > (1 << 22)) return null
      nSamples = count
      if (fixed != 0) totalBytes = fixed * count
      else {
        if (stsz._1 + 12 + 4 * count > stsz._2) return null
        var s = 0L
        var k = 0
        while (k < count) { s += beU32(b, stsz._1 + 12 + 4 * k); k += 1 }
        totalBytes = s
      }
    }
    // stts: version/flags(4) entry_count(4) [(count, delta)...]
    val stts = child(b, stbl._1, stbl._2, "stts")
    if (stts != null && stts._1 + 8 <= stts._2) {
      val nEnt = beU32(b, stts._1 + 4)
      if (nEnt > (1 << 20) || stts._1 + 8 + 8 * nEnt > stts._2) return null
      var cnt = 0L
      var dur = 0L
      var k = 0
      while (k < nEnt) {
        val c = beU32(b, stts._1 + 8 + 8 * k)
        val d = beU32(b, stts._1 + 12 + 8 * k)
        cnt += c
        dur += c * d
        k += 1
      }
      // consistency gate: stts and stsz must agree on the sample count
      if (nSamples >= 0 && cnt != nSamples) return null
      if (nSamples < 0) nSamples = cnt
      if (duration == null) duration = dur
    }
    new GenericInternalRow(Array[Any](handler, codec, timescale, duration,
      if (nSamples < 0) null else nSamples,
      if (totalBytes < 0) null else totalBytes))
  }

  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 16 || boxLen(b, 0, b.length) < 0 || !is4cc(b, 4, "ftyp"))
      return null
    val brand = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, 8, 12))
    var i = 0
    while (i + 8 <= b.length) { // byte-progress bounded (boxLen ≥ 8)
      val len = boxLen(b, i, b.length)
      if (len < 0) return null
      if (is4cc(b, i + 4, "moov")) {
        val limit = (i + len).toInt
        val from = i + (if (beU32(b, i) == 1) 16 else 8)
        val tracks = new java.util.ArrayList[InternalRow]()
        var j = from
        while (j + 8 <= limit) { // byte-progress bounded (boxLen ≥ 8)
          val clen = boxLen(b, j, limit)
          if (clen < 0) return null
          if (is4cc(b, j + 4, "trak")) {
            val hdr = if (beU32(b, j) == 1) 16 else 8
            val t = track(b, j + hdr, (j + clen).toInt)
            if (t == null) return null
            tracks.add(t)
          }
          j += clen.toInt
        }
        val arr = new Array[Any](tracks.size())
        var k = 0
        while (k < arr.length) { arr(k) = tracks.get(k); k += 1 }
        return new GenericInternalRow(
          Array[Any](brand, new GenericArrayData(arr)))
      }
      i += len.toInt
    }
    null
  }
}

/** Fixture: a complete `ftyp` + `moov` with real sample tables. Track
  * 0 is always video (`vide`/`avc1`, timescale 30000, delta 1001,
  * PER-SAMPLE stsz whose sizes are seed formulas); odd seeds add an
  * audio track (`soun`/`mp4a`, timescale 48000, delta 1024, FIXED
  * stsz — both stsz modes on the oracle path). mdhd durations equal
  * the stts sums by construction.
  */
object Mp4TracksSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def nVideo(seed: Long): Int = 10 + fm(seed, 20)
  def videoSize(seed: Long, i: Int): Long = 100 + fm(seed * 7 + i * 13, 900)
  def nAudio(seed: Long): Int = 20 + fm(seed, 30)
  def audioSize(seed: Long): Long = 64 + fm(seed, 64)
  def hasAudio(seed: Long): Boolean = fm(seed, 2) == 1

  private final class Box(val name: String) {
    val out = new java.io.ByteArrayOutputStream()
    def u8v(v: Int): Unit = out.write(v & 0xFF)
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    def ascii(s: String): Unit = {
      var i = 0
      while (i < s.length) { out.write(s.charAt(i)); i += 1 }
    }
    def raw(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def bytes: Array[Byte] = {
      val body = out.toByteArray
      val full = new java.io.ByteArrayOutputStream()
      val len = body.length + 8
      full.write((len >> 24) & 0xFF); full.write((len >> 16) & 0xFF)
      full.write((len >> 8) & 0xFF); full.write(len & 0xFF)
      var i = 0
      while (i < 4) { full.write(name.charAt(i)); i += 1 }
      full.write(body, 0, body.length)
      full.toByteArray
    }
  }

  private def trak(seed: Long, video: Boolean): Array[Byte] = {
    val n = if (video) nVideo(seed) else nAudio(seed)
    val delta = if (video) 1001L else 1024L
    val timescale = if (video) 30000L else 48000L
    val mdhd = new Box("mdhd")
    mdhd.u32(0) // version/flags
    mdhd.u32(0); mdhd.u32(0) // times
    mdhd.u32(timescale)
    mdhd.u32(n * delta)
    mdhd.u32(0x55C40000L) // language + pre_defined
    val hdlr = new Box("hdlr")
    hdlr.u32(0); hdlr.u32(0)
    hdlr.ascii(if (video) "vide" else "soun")
    hdlr.u32(0); hdlr.u32(0); hdlr.u32(0)
    hdlr.u8v(0) // empty name
    val stsd = new Box("stsd")
    stsd.u32(0); stsd.u32(1)
    stsd.u32(16); stsd.ascii(if (video) "avc1" else "mp4a")
    stsd.u32(0); stsd.u32(0) // stub sample-entry tail
    val stts = new Box("stts")
    stts.u32(0); stts.u32(1)
    stts.u32(n); stts.u32(delta)
    val stsz = new Box("stsz")
    stsz.u32(0)
    if (video) {
      stsz.u32(0); stsz.u32(n)
      var i = 0
      while (i < n) { stsz.u32(videoSize(seed, i)); i += 1 }
    } else {
      stsz.u32(audioSize(seed)); stsz.u32(n)
    }
    val stbl = new Box("stbl")
    stbl.raw(stsd.bytes); stbl.raw(stts.bytes); stbl.raw(stsz.bytes)
    val minf = new Box("minf")
    minf.raw(stbl.bytes)
    val mdia = new Box("mdia")
    mdia.raw(mdhd.bytes); mdia.raw(hdlr.bytes); mdia.raw(minf.bytes)
    val t = new Box("trak")
    t.raw(mdia.bytes)
    t.bytes
  }

  def mp4Bytes(seed: Long): Array[Byte] = {
    if (seed < 0) return null
    val ftyp = new Box("ftyp")
    ftyp.ascii("isom"); ftyp.u32(512); ftyp.ascii("isom"); ftyp.ascii("mp41")
    val mvhd = new Box("mvhd")
    mvhd.u32(0); mvhd.u32(0); mvhd.u32(0)
    mvhd.u32(1000); mvhd.u32(60000)
    var k = 0
    while (k < 20) { mvhd.u32(0); k += 1 }
    val moov = new Box("moov")
    moov.raw(mvhd.bytes)
    moov.raw(trak(seed, video = true))
    if (hasAudio(seed)) moov.raw(trak(seed, video = false))
    val out = new java.io.ByteArrayOutputStream()
    val f = ftyp.bytes
    val m = moov.bytes
    out.write(f, 0, f.length)
    out.write(m, 0, m.length)
    out.toByteArray
  }
}

/** Expression wrapping [[Mp4TracksSynth.mp4Bytes]]. */
case class SynthMp4Tracks(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    Mp4TracksSynth.mp4Bytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.Mp4TracksSynth.mp4Bytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4TrackFunctions {
  def mp4_tracks(payload: Column): Column =
    ExpressionUtils.column(Mp4Tracks(ExpressionUtils.expression(payload)))

  def synth_mp4_tracks(doc: Column): Column =
    ExpressionUtils.column(SynthMp4Tracks(ExpressionUtils.expression(doc)))
}
