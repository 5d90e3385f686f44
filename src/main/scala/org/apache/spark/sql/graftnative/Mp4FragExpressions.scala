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

/** FRAGMENTED MP4 per-sample byte ranges — the moof/traf/trun shape
  * crawled video actually arrives in (DASH/CMAF segments, live
  * remuxes), which [[Mp4Samples]]'s moov/stbl resolution cannot
  * address because fragmented files carry EMPTY sample tables in moov.
  * The walk is the real ISO BMFF (14496-12 §8.8) flow:
  *
  *  - `moov → trak → { tkhd (track_ID, v0 and v1), hdlr, stbl → stsd }`
  *    for track identity, and `moov → mvex → trex` for the per-track
  *    inheritance defaults (default_sample_size et al).
  *  - each `moof → traf → { tfhd, trun* }`: tfhd's optional fields are
  *    decoded per its flag bits (base-data-offset 0x1,
  *    sample-description-index 0x2, default-duration 0x8,
  *    default-size 0x10, default-flags 0x20, default-base-is-moof
  *    0x020000); trun's per its bits (data-offset 0x1,
  *    first-sample-flags 0x4, per-sample duration/size/flags/cto
  *    0x100/0x200/0x400/0x800).
  *  - base data offset precedence per §8.8.7: explicit
  *    base_data_offset > default-base-is-moof (the moof's first byte) >
  *    the implicit default — moof start for the FIRST track fragment,
  *    the end of the previous track fragment's data for subsequent
  *    ones. Within a traf, a trun without a data offset continues
  *    where the previous trun's data ended.
  *  - sample size precedence: trun per-sample > tfhd default > trex
  *    default; a sample with no size anywhere rejects (guessing byte
  *    ranges would corrupt every downstream fetch).
  *
  * Every resolved range must lie inside the file, multi-moof streams
  * accumulate per track in moof order, and `mdat` boxes are skipped by
  * length. Honest scope: samples addressed by moov's own stbl (the
  * progressive+fragmented hybrid) are NOT merged here — classic files
  * are [[Mp4Samples]]'s job; sidx/mfra indexes are not consulted (they
  * locate fragments faster but add no ranges).
  *
  * The reference pipeline stops at whole-file media blobs
  * (`crawler/fetch_utils.py` fetches, Mongo stores); sample-level
  * addressing is the capability a 100 TB video corpus needs to fetch
  * frames without reading whole files.
  */
case class Mp4FragSamples(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = Mp4FragSamples.schema
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Mp4FragSamples.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.Mp4FragSamples.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4FragSamples {
  val schema: StructType = Mp4Samples.schema

  private val MaxSamples = 1 << 16

  import Mp4Tracks.{u8, beU32, beU64, is4cc, boxLen, child}

  private final class Track(val trackId: Long, val handler: UTF8String,
      val codec: UTF8String) {
    val offsets = new java.util.ArrayList[java.lang.Long]()
    val sizes = new java.util.ArrayList[java.lang.Long]()
    var trexDefaultSize = -1L // -1 = no trex default
  }

  /** Parse one moov trak: (track_ID, handler, codec) or null. */
  private def trakIdentity(b: Array[Byte], from: Int, limit: Int): Track = {
    val tkhd = child(b, from, limit, "tkhd")
    if (tkhd == null) return null
    val v = u8(b, tkhd._1)
    val trackId =
      if (v == 0 && tkhd._1 + 16 <= tkhd._2) beU32(b, tkhd._1 + 12)
      else if (v == 1 && tkhd._1 + 24 <= tkhd._2) beU32(b, tkhd._1 + 20)
      else return null
    val mdia = child(b, from, limit, "mdia")
    if (mdia == null) return null
    var handler: UTF8String = null
    val hdlr = child(b, mdia._1, mdia._2, "hdlr")
    if (hdlr != null && hdlr._1 + 12 <= hdlr._2)
      handler = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(b, hdlr._1 + 8, hdlr._1 + 12))
    var codec: UTF8String = null
    val minf = child(b, mdia._1, mdia._2, "minf")
    if (minf != null) {
      val stbl = child(b, minf._1, minf._2, "stbl")
      if (stbl != null) {
        val stsd = child(b, stbl._1, stbl._2, "stsd")
        if (stsd != null && stsd._1 + 16 <= stsd._2 &&
            beU32(b, stsd._1 + 4) >= 1)
          codec = UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(b, stsd._1 + 12, stsd._1 + 16))
      }
    }
    new Track(trackId, handler, codec)
  }

  /** Decode one traf against its moof start; returns the end of this
    * fragment's data (the next traf's implicit base) or -1 on
    * corruption. Appends ranges to `track`.
    */
  private def traf(b: Array[Byte], from: Int, limit: Int, moofStart: Long,
      implicitBase: Long, tracks: Array[Track], totalSoFar: Int): Long = {
    val tfhd = child(b, from, limit, "tfhd")
    if (tfhd == null || tfhd._1 + 8 > tfhd._2) return -1
    val tfFlags = (beU32(b, tfhd._1) & 0xFFFFFF).toInt
    val trackId = beU32(b, tfhd._1 + 4)
    var p = tfhd._1 + 8
    var baseOffset =
      if ((tfFlags & 0x020000) != 0) moofStart else implicitBase
    if ((tfFlags & 0x1) != 0) {
      if (p + 8 > tfhd._2) return -1
      baseOffset = beU64(b, p); p += 8
    }
    if ((tfFlags & 0x2) != 0) p += 4 // sample_description_index
    if ((tfFlags & 0x8) != 0) p += 4 // default_sample_duration
    var tfDefaultSize = -1L
    if ((tfFlags & 0x10) != 0) {
      if (p + 4 > tfhd._2) return -1
      tfDefaultSize = beU32(b, p); p += 4
    }
    if (p > tfhd._2) return -1
    var track: Track = null
    var t = 0
    while (t < tracks.length && track == null) {
      if (tracks(t).trackId == trackId) track = tracks(t)
      t += 1
    }
    if (track == null) return -1 // traf for a track moov never declared
    // walk every trun in this traf, in order
    var dataPos = baseOffset
    var dataEnd = baseOffset
    var i = from
    var total = totalSoFar
    while (i + 8 <= limit) {
      val len = boxLen(b, i, limit)
      if (len < 0) return -1
      if (is4cc(b, i + 4, "trun")) {
        val tp0 = i + 8
        if (tp0 + 8 > i + len) return -1
        val trFlags = (beU32(b, tp0) & 0xFFFFFF).toInt
        val count = beU32(b, tp0 + 4)
        if (count < 0 || count > MaxSamples) return -1
        total += count.toInt
        if (total > MaxSamples) return -1
        var tp = tp0 + 8
        if ((trFlags & 0x1) != 0) {
          if (tp + 4 > i + len) return -1
          // signed 32-bit offset relative to the base data offset
          dataPos = baseOffset + beU32(b, tp).toInt
          tp += 4
        }
        if ((trFlags & 0x4) != 0) tp += 4 // first_sample_flags
        val perDur = (trFlags & 0x100) != 0
        val perSize = (trFlags & 0x200) != 0
        val perFlags = (trFlags & 0x400) != 0
        val perCto = (trFlags & 0x800) != 0
        val entry = (if (perDur) 4 else 0) + (if (perSize) 4 else 0) +
          (if (perFlags) 4 else 0) + (if (perCto) 4 else 0)
        if (tp + entry.toLong * count > i + len) return -1
        var k = 0L
        while (k < count) {
          if (perDur) tp += 4
          var size = -1L
          if (perSize) { size = beU32(b, tp); tp += 4 }
          else if (tfDefaultSize >= 0) size = tfDefaultSize
          else if (track.trexDefaultSize >= 0) size = track.trexDefaultSize
          if (size < 0) return -1 // no size anywhere: cannot address
          if (perFlags) tp += 4
          if (perCto) tp += 4
          if (dataPos < 0 || dataPos + size > b.length) return -1
          track.offsets.add(dataPos)
          track.sizes.add(size)
          dataPos += size
          k += 1
        }
        if (dataPos > dataEnd) dataEnd = dataPos
      }
      i += len.toInt
    }
    dataEnd
  }

  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 16 || boxLen(b, 0, b.length) < 0 || !is4cc(b, 4, "ftyp"))
      return null
    val brand = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, 8, 12))
    var tracks: Array[Track] = null
    var total = 0
    var i = 0
    while (i + 8 <= b.length) {
      val len = boxLen(b, i, b.length)
      if (len < 0) return null
      if (is4cc(b, i + 4, "moov")) {
        if (tracks != null) return null // two moovs: corrupt
        val limit = (i + len).toInt
        val from = i + (if (beU32(b, i) == 1) 16 else 8)
        val list = new java.util.ArrayList[Track]()
        var j = from
        while (j + 8 <= limit) {
          val clen = boxLen(b, j, limit)
          if (clen < 0) return null
          if (is4cc(b, j + 4, "trak")) {
            val hdr = if (beU32(b, j) == 1) 16 else 8
            val t = trakIdentity(b, j + hdr, (j + clen).toInt)
            if (t == null) return null
            list.add(t)
          }
          j += clen.toInt
        }
        tracks = new Array[Track](list.size())
        var k = 0
        while (k < tracks.length) { tracks(k) = list.get(k); k += 1 }
        // mvex → trex defaults
        val mvex = child(b, from, limit, "mvex")
        if (mvex != null) {
          var m = mvex._1
          while (m + 8 <= mvex._2) {
            val mlen = boxLen(b, m, mvex._2)
            if (mlen < 0) return null
            if (is4cc(b, m + 4, "trex")) {
              if (m + 8 + 24 > m + mlen) return null
              val tid = beU32(b, m + 12)
              k = 0
              while (k < tracks.length) {
                if (tracks(k).trackId == tid)
                  tracks(k).trexDefaultSize = beU32(b, m + 24)
                k += 1
              }
            }
            m += mlen.toInt
          }
        }
      } else if (is4cc(b, i + 4, "moof")) {
        if (tracks == null) return null // moof before moov: unaddressable
        val limit = (i + len).toInt
        val from = i + 8
        var implicitBase = i.toLong // first traf defaults to moof start
        var j = from
        while (j + 8 <= limit) {
          val clen = boxLen(b, j, limit)
          if (clen < 0) return null
          if (is4cc(b, j + 4, "traf")) {
            val end = traf(b, j + 8, (j + clen).toInt, i.toLong,
              implicitBase, tracks, total)
            if (end < 0) return null
            implicitBase = end
            total = 0
            var k = 0
            while (k < tracks.length) {
              total += tracks(k).offsets.size(); k += 1
            }
          }
          j += clen.toInt
        }
      }
      i += len.toInt
    }
    if (tracks == null) return null
    val arr = new Array[Any](tracks.length)
    var k = 0
    while (k < tracks.length) {
      val t = tracks(k)
      val off = new Array[Any](t.offsets.size())
      val sz = new Array[Any](t.sizes.size())
      var s = 0
      while (s < off.length) {
        off(s) = t.offsets.get(s).longValue()
        sz(s) = t.sizes.get(s).longValue()
        s += 1
      }
      arr(k) = new GenericInternalRow(Array[Any](t.handler, t.codec,
        new GenericArrayData(off), new GenericArrayData(sz)))
      k += 1
    }
    new GenericInternalRow(Array[Any](brand, new GenericArrayData(arr)))
  }
}

/** Fixture ENCODER for [[Mp4FragSamples]]: the SAME logical samples as
  * [[Mp4SamplesSynth.mp4SamplesBytes]] (identical per-sample sizes and
  * track shapes from the shared seed formulas) laid out as a REAL
  * fragmented file — ftyp + moov (tkhd/hdlr/stsd traks + mvex/trex) +
  * free-pad to 4096, then one moof+mdat per fragment. The tfhd/trun
  * FLAG MATRIX rotates by fragment so every inheritance path sits on
  * the oracle hash:
  *
  *  - video fragments (4 samples each, remainder last): EVEN fragment
  *    index → tfhd default-base-is-moof (0x020000), ODD → explicit
  *    base_data_offset (0x1, pointing at the moof); both carry trun
  *    data-offset + per-sample sizes, odd fragments additionally
  *    first-sample-flags.
  *  - audio fragments (8 samples each): non-last → tfhd default-sample-
  *    size (0x10); LAST → no tfhd/trun size anywhere, so the size must
  *    inherit from mvex/trex — the fragmented inheritance chain's
  *    deepest link.
  *
  * Layout arithmetic the oracle replays: video fragment f starts at
  * `F(f) = 4096 + 68·ceil(f/2) + 80·floor(f/2) + 24f + S(4f)` (S =
  * video size prefix sum; 68/80 = moof size less the 4·spc trun
  * entries for the even/odd variants; 24 = 16 entry bytes + 8 mdat
  * header), sample j sits at `F(f) + moofSize(f) + 8 + S(j) − S(4f)`;
  * audio fragment g starts at `A0 + g·(80 + 8·asz)` past the video
  * region, its samples contiguous at `+ (72|68) + 8`.
  */
object Mp4FragSynth {
  import Mp4TracksSynth.{nVideo, videoSize, nAudio, audioSize, hasAudio}

  private def u32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
    out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
  }

  private def box(name: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    u32(out, body.length + 8L)
    var i = 0
    while (i < 4) { out.write(name.charAt(i)); i += 1 }
    out.write(body, 0, body.length)
    out.toByteArray
  }

  private def body(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    f(out)
    out.toByteArray
  }

  private def trakHeader(trackId: Long, handler: String,
      codec: String): Array[Byte] = {
    val tkhd = box("tkhd", body { o =>
      u32(o, 0); u32(o, 0); u32(o, 0); u32(o, trackId); u32(o, 0)
    })
    val hdlr = box("hdlr", body { o =>
      u32(o, 0); u32(o, 0)
      handler.foreach(c => o.write(c))
      u32(o, 0); u32(o, 0); u32(o, 0); o.write(0)
    })
    val stsd = box("stsd", body { o =>
      u32(o, 0); u32(o, 1)
      u32(o, 16); codec.foreach(c => o.write(c)); u32(o, 0); u32(o, 0)
    })
    val stbl = box("stbl", stsd)
    val minf = box("minf", stbl)
    val mdia = box("mdia", {
      val o = new java.io.ByteArrayOutputStream()
      o.write(hdlr, 0, hdlr.length); o.write(minf, 0, minf.length)
      o.toByteArray
    })
    box("trak", {
      val o = new java.io.ByteArrayOutputStream()
      o.write(tkhd, 0, tkhd.length); o.write(mdia, 0, mdia.length)
      o.toByteArray
    })
  }

  private def trex(trackId: Long, defaultSize: Long): Array[Byte] =
    box("trex", body { o =>
      u32(o, 0); u32(o, trackId); u32(o, 1); u32(o, 0)
      u32(o, defaultSize); u32(o, 0)
    })

  /** Per-sample payload byte k of sample (trk, j): a seed formula, so
    * the chunked twin can carry the SAME payload for byte-identity
    * tests.
    */
  def payloadByte(seed: Long, trk: Int, j: Int, k: Int): Byte =
    ((seed + 31 * trk + 7 * j + k) & 0xFF).toByte

  private def samplePayload(seed: Long, trk: Int, j: Int,
      size: Long): Array[Byte] = {
    // payloadByte is a +1 ramp mod 256 in k: fill without per-byte
    // closure boxing (the fixture dominates this key's bench cost)
    val out = new Array[Byte](size.toInt)
    var v = ((seed + 31 * trk + 7 * j) & 0xFF).toInt
    var k = 0
    while (k < out.length) {
      out(k) = v.toByte
      v = (v + 1) & 0xFF
      k += 1
    }
    out
  }

  def mp4FragBytes(seed: Long): Array[Byte] = {
    if (seed < 0) return null
    val nv = nVideo(seed)
    val vSizes = Array.tabulate(nv)(i => videoSize(seed, i))
    val audio = hasAudio(seed)
    val na = if (audio) nAudio(seed) else 0
    val asz = if (audio) audioSize(seed) else 0L

    val out = new java.io.ByteArrayOutputStream()
    val ftyp = box("ftyp", body { o =>
      "iso5".foreach(c => o.write(c)); u32(o, 512)
      "iso5".foreach(c => o.write(c)); "dash".foreach(c => o.write(c))
    })
    out.write(ftyp, 0, ftyp.length)
    val mvexBody = new java.io.ByteArrayOutputStream()
    val tx1 = trex(1, 0)
    mvexBody.write(tx1, 0, tx1.length)
    if (audio) {
      val tx2 = trex(2, asz)
      mvexBody.write(tx2, 0, tx2.length)
    }
    val moovBody = new java.io.ByteArrayOutputStream()
    val tk1 = trakHeader(1, "vide", "avc1")
    moovBody.write(tk1, 0, tk1.length)
    if (audio) {
      val tk2 = trakHeader(2, "soun", "mp4a")
      moovBody.write(tk2, 0, tk2.length)
    }
    val mvex = box("mvex", mvexBody.toByteArray)
    moovBody.write(mvex, 0, mvex.length)
    val moov = box("moov", moovBody.toByteArray)
    out.write(moov, 0, moov.length)
    // free-pad to absolute 4096 (same envelope contract as the twin)
    val headLen = out.size()
    if (headLen + 8 > 4096) return null
    val freeLen = 4096 - headLen
    u32(out, freeLen)
    "free".foreach(c => out.write(c))
    var z = 8
    while (z < freeLen) { out.write(0); z += 1 }

    // video fragments: 4 samples per moof, remainder last
    val nF = (nv + 3) / 4
    var f = 0
    while (f < nF) {
      val s0 = 4 * f
      val spc = math.min(4, nv - s0)
      val odd = f % 2 == 1
      val moofStart = out.size().toLong
      val tfhdBytes =
        if (odd) box("tfhd", body { o =>
          u32(o, 0x000001) // base-data-offset-present
          u32(o, 1) // track_ID
          // base_data_offset = the moof's first byte (u64)
          u32(o, moofStart >>> 32); u32(o, moofStart & 0xFFFFFFFFL)
        })
        else box("tfhd", body { o =>
          u32(o, 0x020000) // default-base-is-moof
          u32(o, 1)
        })
      val moofSize = (if (odd) 80 else 68) + 4 * spc
      val trun = box("trun", body { o =>
        u32(o, if (odd) 0x000205L else 0x000201L)
        u32(o, spc)
        u32(o, moofSize + 8L) // data_offset → mdat payload
        if (odd) u32(o, 0x02000000L) // first_sample_flags
        var k = 0
        while (k < spc) { u32(o, vSizes(s0 + k)); k += 1 }
      })
      val mfhd = box("mfhd", body { o => u32(o, 0); u32(o, f + 1L) })
      val trafB = box("traf", {
        val o = new java.io.ByteArrayOutputStream()
        o.write(tfhdBytes, 0, tfhdBytes.length); o.write(trun, 0, trun.length)
        o.toByteArray
      })
      val moof = box("moof", {
        val o = new java.io.ByteArrayOutputStream()
        o.write(mfhd, 0, mfhd.length); o.write(trafB, 0, trafB.length)
        o.toByteArray
      })
      require(moof.length == moofSize, s"video moof arithmetic: ${moof.length} vs $moofSize")
      out.write(moof, 0, moof.length)
      val mdatBody = new java.io.ByteArrayOutputStream()
      var k = 0
      while (k < spc) {
        val p = samplePayload(seed, 0, s0 + k, vSizes(s0 + k))
        mdatBody.write(p, 0, p.length)
        k += 1
      }
      val mdat = box("mdat", mdatBody.toByteArray)
      out.write(mdat, 0, mdat.length)
      f += 1
    }

    // audio fragments: 8 samples per moof; the LAST inherits its size
    // from trex (no tfhd default, no trun sizes)
    if (audio) {
      val nG = (na + 7) / 8
      var g = 0
      while (g < nG) {
        val s0 = 8 * g
        val spc = math.min(8, na - s0)
        val last = g == nG - 1
        val tfhdBytes =
          if (last) box("tfhd", body { o => u32(o, 0x020000); u32(o, 2) })
          else box("tfhd", body { o =>
            u32(o, 0x020010L) // default-base-is-moof + default-sample-size
            u32(o, 2)
            u32(o, asz)
          })
        val moofSize = if (last) 68 else 72
        val trun = box("trun", body { o =>
          u32(o, 0x000001); u32(o, spc); u32(o, moofSize + 8L)
        })
        val mfhd = box("mfhd", body { o => u32(o, 0); u32(o, nVideoFrags(seed) + g + 1L) })
        val trafB = box("traf", {
          val o = new java.io.ByteArrayOutputStream()
          o.write(tfhdBytes, 0, tfhdBytes.length); o.write(trun, 0, trun.length)
          o.toByteArray
        })
        val moof = box("moof", {
          val o = new java.io.ByteArrayOutputStream()
          o.write(mfhd, 0, mfhd.length); o.write(trafB, 0, trafB.length)
          o.toByteArray
        })
        require(moof.length == moofSize, s"audio moof arithmetic: ${moof.length} vs $moofSize")
        out.write(moof, 0, moof.length)
        val mdatBody = new java.io.ByteArrayOutputStream()
        var k = 0
        while (k < spc) {
          val p = samplePayload(seed, 1, s0 + k, asz)
          mdatBody.write(p, 0, p.length)
          k += 1
        }
        val mdat = box("mdat", mdatBody.toByteArray)
        out.write(mdat, 0, mdat.length)
        g += 1
      }
    }
    out.toByteArray
  }

  def nVideoFrags(seed: Long): Int = (nVideo(seed) + 3) / 4

  /** Test-harness variant: ONE moof carrying TWO trafs, where the
    * second traf sets neither base-data-offset nor default-base-is-moof
    * and its trun carries no data offset — its base MUST resolve to the
    * end of the first track fragment's data (§8.8.7's implicit
    * default), the path the per-fragment gate fixture never exercises.
    * Video: 2 samples (10, 20 bytes, trun sizes); audio: 3 samples of
    * 5 bytes via the tfhd default, laid contiguously after the video
    * bytes in the shared mdat.
    */
  private[graftnative] def multiTrafBytes(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ftyp = box("ftyp", body { o =>
      "iso5".foreach(c => o.write(c)); u32(o, 512)
      "iso5".foreach(c => o.write(c)); "dash".foreach(c => o.write(c))
    })
    out.write(ftyp, 0, ftyp.length)
    val moovBody = new java.io.ByteArrayOutputStream()
    val tk1 = trakHeader(1, "vide", "avc1")
    val tk2 = trakHeader(2, "soun", "mp4a")
    moovBody.write(tk1, 0, tk1.length)
    moovBody.write(tk2, 0, tk2.length)
    val mvexBody = new java.io.ByteArrayOutputStream()
    val tx1 = trex(1, 0)
    val tx2 = trex(2, 0)
    mvexBody.write(tx1, 0, tx1.length)
    mvexBody.write(tx2, 0, tx2.length)
    val mvex = box("mvex", mvexBody.toByteArray)
    moovBody.write(mvex, 0, mvex.length)
    val moov = box("moov", moovBody.toByteArray)
    out.write(moov, 0, moov.length)
    // moof = 8 + mfhd 16 + traf1 52 + traf2 44 = 120
    val moofSize = 120
    val mfhd = box("mfhd", body { o => u32(o, 0); u32(o, 1) })
    val tfhd1 = box("tfhd", body { o => u32(o, 0x020000); u32(o, 1) })
    val trun1 = box("trun", body { o =>
      u32(o, 0x000201); u32(o, 2); u32(o, moofSize + 8L)
      u32(o, 10); u32(o, 20)
    })
    val traf1 = box("traf", {
      val o = new java.io.ByteArrayOutputStream()
      o.write(tfhd1, 0, tfhd1.length); o.write(trun1, 0, trun1.length)
      o.toByteArray
    })
    // traf2: NO base flags; size from the tfhd default; trun has no
    // data offset → data continues at the implicit base
    val tfhd2 = box("tfhd", body { o => u32(o, 0x000010); u32(o, 2); u32(o, 5) })
    val trun2 = box("trun", body { o => u32(o, 0); u32(o, 3) })
    val traf2 = box("traf", {
      val o = new java.io.ByteArrayOutputStream()
      o.write(tfhd2, 0, tfhd2.length); o.write(trun2, 0, trun2.length)
      o.toByteArray
    })
    val moof = box("moof", {
      val o = new java.io.ByteArrayOutputStream()
      o.write(mfhd, 0, mfhd.length)
      o.write(traf1, 0, traf1.length)
      o.write(traf2, 0, traf2.length)
      o.toByteArray
    })
    require(moof.length == moofSize, s"multi-traf arithmetic: ${moof.length}")
    out.write(moof, 0, moof.length)
    val mdat = box("mdat", Array.tabulate(45)(k => k.toByte))
    out.write(mdat, 0, mdat.length)
    out.toByteArray
  }
}

/** Expression wrapping [[Mp4FragSynth.mp4FragBytes]]. */
case class SynthMp4Frag(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    Mp4FragSynth.mp4FragBytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.Mp4FragSynth.mp4FragBytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4FragFunctions {
  /** Column API: fragmented-MP4 (moof/traf/trun) per-sample byte ranges. */
  def mp4_frag_samples(payload: Column): Column =
    ExpressionUtils.column(Mp4FragSamples(ExpressionUtils.expression(payload)))

  /** Column API: fragmented twin of the chunked MP4 fixture. */
  def synth_mp4_frag(doc: Column): Column =
    ExpressionUtils.column(SynthMp4Frag(ExpressionUtils.expression(doc)))
}
