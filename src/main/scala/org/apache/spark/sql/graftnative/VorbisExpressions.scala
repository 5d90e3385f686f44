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

/** Ogg Vorbis PCM decode (Vorbis I, public specification) — web audio's
  * second pillar next to MP3, decoded for real: the Ogg page walk with
  * CRC verification and full lacing-based packet assembly (packets
  * spanning pages included), the three Vorbis headers (identification;
  * comment skipped by structure; setup with complete CODEBOOK parsing —
  * ordered and sparse length lists, the spec's lowest-unused-codeword
  * canonical assignment, VQ lookup types 1 and 2 with float32_unpack
  * and sequence_p), floor type 1 (partition classes, subclass books,
  * the low/high-neighbor render_point prediction with room folding,
  * Bresenham render_line in the dB domain), residue types 0, 1, and 2
  * (classword decode, cascade passes, type-2 channel interleave),
  * square-polar channel coupling, the floor×residue dot product, the
  * direct inverse MDCT, and the sin(π/2·sin²) window with the spec's
  * lapping rules — long blocks against short neighbors included.
  *
  * Spec edge semantics implemented (not just the happy path):
  *  - End-of-packet during floor decode renders the frame SILENT and
  *    keeps decoding (spec §4.3.2's non-error); EOP during residue
  *    decode keeps the partial vector. Only structural corruption —
  *    CRC failures, torn pages, codewords walking into vacant tree
  *    slots, out-of-range floor values — rejects the stream.
  *  - Page granule positions are honored: the first granule-bearing
  *    audio page declares the encoder's initial PCM offset (trimmed
  *    from the head) and the final page's granulepos end-trims the
  *    tail, so `n_samples` matches a reference decoder's accounting
  *    on real encoder output (which pads the first frame and
  *    truncates the last).
  *  - Total decoded output is gated by MaxTotalSamples (≈64 MB of
  *    Int slots) against allocation-amplification from crafted
  *    streams of near-empty audio packets.
  *
  * Honest scope, stated precisely:
  *  - Floor type 0 (LSP) rejects — modern encoders emit floor 1 only.
  *  - The 256-entry floor1_inverse_dB_table is GENERATED as the exact
  *    geometric sequence between the spec's published endpoints
  *    (1.0649863e-7 … 1.0) rather than transcribed literal-by-literal;
  *    index 255 is exactly 1.0. Streams whose floors sit away from the
  *    endpoints decode through real machinery with ≤ float-rounding
  *    deviations from a reference decoder; swapping in the published
  *    literals is a data-only change (`vorbis_inverse_db.tsv` under
  *    `-Dgraft.data.dir`, see [[DataOverrides]]).
  *  - The oracle fingerprint (`spec_sum_q20`) is the SPECTRAL sum
  *    before the IMDCT: the paired fixture emits flat-at-maximum
  *    floors (multiplier slot 0, range 256, both endpoint posts at
  *    255 → dB table index 255 = exactly 1.0) and dyadic VQ values, so
  *    headers, codebooks, floor decode, residue decode, and coupling
  *    all sit on an EXACT integer hash; the IMDCT/window/overlap-add
  *    stages are pinned by unit goldens (exact-zero propagation and a
  *    hand-computed small transform), the same stance as MP3's
  *    filterbank.
  */
object VorbisCodec {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_packets", IntegerType, nullable = true),
    StructField("n_samples", IntegerType, nullable = true),
    StructField("spec_sum_q20", LongType, nullable = true),
    StructField("pcm_abs_max", IntegerType, nullable = true),
    StructField("samples", ArrayType(IntegerType, containsNull = false),
      nullable = true)))

  private val FmtVorbis = UTF8String.fromString("vorbis")
  private val FmtUnknown = UTF8String.fromString("unknown")

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, null, null, null, null,
      null, null, null))

  private val MaxPackets = 4096
  private val MaxBlock = 8192

  /** Cap on total decoded output (samples × channels, as Int slots ≈
    * 64 MB). Without it a few-KB crafted Ogg of ~1-byte audio packets
    * (4096 packets × 8192-sample blocks × 8 channels) could demand
    * ~536 MB — the same allocation-amplification shape
    * WarcRecords.MaxInflated guards against.
    */
  private val MaxTotalSamples = 1 << 24

  /** floor1_inverse_dB_table: geometric from the spec's endpoints (see
    * the scaladoc's provenance note). table(255) is exactly 1.0.
    */
  private val InverseDbBuiltin: Array[Double] = {
    val lo = 1.0649863e-7
    Array.tabulate(256)(i =>
      if (i == 255) 1.0
      else StrictMath.exp(StrictMath.log(lo) * (255 - i) / 255.0))
  }

  /** The active dB table — the geometric reconstruction by default,
    * or the spec's published 256 literals dropped in via
    * [[DataOverrides]] (`vorbis_inverse_db.tsv`). Data-only swap.
    */
  @volatile private[graftnative] var InverseDb: Array[Double] = InverseDbBuiltin

  /** Install the published table from `dir`; true when swapped. */
  private[graftnative] def installInverseDb(dir: String): Boolean =
    DataOverrides.doubles(dir, "vorbis_inverse_db", 256) match {
      case Some(t) => InverseDb = t; true
      case None => false
    }

  /** Restore the generated geometric table (test hook). */
  private[graftnative] def resetInverseDb(): Unit = InverseDb = InverseDbBuiltin

  // automatic pickup when the literals are dropped next to the job
  DataOverrides.configuredDir.foreach(installInverseDb)

  // ---------------------------------------------------------- bit I/O

  /** Vorbis packs LSB-first within bytes. `ok` drops on end-of-packet
    * (the spec's recoverable condition inside audio-packet decode);
    * `corrupt` marks STRUCTURAL invalidity (a codeword walking into a
    * vacant tree slot, an out-of-range floor value) that must reject
    * the stream rather than silence the frame.
    */
  private[graftnative] final class Br(val b: Array[Byte]) {
    var pos: Long = 0
    var ok = true
    var corrupt = false
    def bits(n: Int): Int = {
      if (n == 0) return 0
      if (pos + n > b.length.toLong * 8) { ok = false; return 0 }
      var v = 0
      var k = 0
      while (k < n) {
        val p = pos + k
        val bit = (b((p >> 3).toInt) >> (p & 7).toInt) & 1
        v |= bit << k
        k += 1
      }
      pos += n
      v
    }
    def bitsL(n: Int): Long = {
      if (n <= 24) return bits(n).toLong & 0xFFFFFFFFL
      val lo = bits(24).toLong & 0xFFFFFF
      val hi = bits(n - 24).toLong
      if (!ok) return 0
      lo | (hi << 24)
    }
    def bit(): Int = bits(1)
  }

  private def ilog(x0: Int): Int = {
    var x = x0
    var r = 0
    while (x > 0) { r += 1; x >>= 1 }
    r
  }

  /** Vorbis float32_unpack: 21-bit mantissa, 10-bit biased exponent. */
  private def float32Unpack(x: Long): Double = {
    val mant = (x & 0x1FFFFF).toDouble
    val sign = (x & 0x80000000L) != 0
    val exp = ((x & 0x7FE00000L) >> 21).toInt
    val m = if (sign) -mant else mant
    m * StrictMath.pow(2.0, (exp - 788).toDouble)
  }

  /** lookup1_values: largest v with v^dim ≤ entries. */
  private def lookup1Values(entries: Int, dim: Int): Int = {
    var v = 1
    while (StrictMath.pow((v + 1).toDouble, dim.toDouble) <= entries) v += 1
    v
  }

  // ---------------------------------------------------------- codebook

  /** Decoded codebook: a binary decode tree over the spec's canonical
    * lowest-unused-codeword assignment, plus the VQ value table.
    * Tree arrays: node k's children at tree(2k), tree(2k+1); values
    * < 0 encode (-entry - 1) leaves; 0 = vacant.
    */
  private final class Codebook(val dim: Int, val entries: Int,
      val tree: Array[Int], val vq: Array[Double], val seqP: Boolean)

  private def buildTree(lengths: Array[Int]): Array[Int] = {
    // node 1 = root (index 0 unused); children of node k: tree(2k)/(2k+1)
    var cap = 16
    var tree = new Array[Int](cap)
    var nextNode = 2
    var used = 0
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l > 0) {
        used += 1
        // walk/extend: take the leftmost available path of depth l
        var node = 1
        var depth = 0
        var placed = false
        // depth-first: at each level choose child 0 if it can still
        // host a leaf at remaining depth, else child 1, else fail —
        // this IS the lowest-valued-unused-codeword rule
        def full(n: Int): Boolean = n < 0 // leaf
        while (!placed) {
          if (depth == l) return null // can't happen (guarded below)
          // ensure capacity
          if (2 * node + 1 >= cap) {
            var nc = cap
            while (2 * node + 1 >= nc) nc *= 2
            tree = java.util.Arrays.copyOf(tree, nc)
            cap = nc
          }
          var advanced = false
          var c = 0
          while (c < 2 && !advanced) {
            val slot = 2 * node + c
            val v = tree(slot)
            if (v < 0) { c += 1 } // leaf occupies it
            else if (v == 0) {
              if (depth + 1 == l) {
                tree(slot) = -i - 1
                placed = true
              } else {
                tree(slot) = nextNode
                nextNode += 1
                node = tree(slot)
                depth += 1
              }
              advanced = true
            } else {
              // internal node: usable only if not at leaf depth and
              // subtree still has room — room tracking via a quick
              // probe: an internal node always has room unless both
              // subtrees are saturated; we detect saturation lazily by
              // trying child 0 then child 1 at the NEXT level, so here
              // descend only if depth+1 < l, else try next child
              if (depth + 1 < l) {
                // probe subtree for space at remaining depth
                if (hasRoom(tree, v, l - depth - 1)) {
                  node = v
                  depth += 1
                  advanced = true
                } else c += 1
              } else c += 1
            }
          }
          if (!advanced) return null // over-subscribed lengths
        }
      }
      i += 1
    }
    if (used == 0) return null
    // single-entry codebook special case is handled by the caller
    tree
  }

  /** Does the subtree rooted at `node` still have a vacant slot within
    * `depth` levels?
    */
  private def hasRoom(tree: Array[Int], node: Int, depth: Int): Boolean = {
    if (depth <= 0) return false
    var c = 0
    while (c < 2) {
      val slot = 2 * node + c
      if (slot >= tree.length) return true
      val v = tree(slot)
      if (v == 0) return true
      if (v > 0 && depth > 1 && hasRoom(tree, v, depth - 1)) return true
      c += 1
    }
    false
  }

  /** Parse one codebook from the setup bitstream. */
  private def readCodebook(br: Br): Codebook = {
    if (br.bits(24) != 0x564342) return null
    val dim = br.bits(16)
    val entries = br.bitsL(24).toInt
    if (dim < 1 || dim > 64 || entries < 1 || entries > (1 << 18)) return null
    val lengths = new Array[Int](entries)
    val ordered = br.bit() == 1
    if (!ordered) {
      val sparse = br.bit() == 1
      var i = 0
      while (i < entries) {
        if (sparse) {
          lengths(i) = if (br.bit() == 1) br.bits(5) + 1 else 0
        } else lengths(i) = br.bits(5) + 1
        i += 1
      }
    } else {
      var cur = br.bits(5) + 1
      var i = 0
      while (i < entries) {
        val num = br.bits(ilog(entries - i))
        if (!br.ok || i + num > entries) return null
        var k = 0
        while (k < num) { lengths(i + k) = cur; k += 1 }
        i += num
        cur += 1
        if (cur > 32) return null
      }
    }
    if (!br.ok) return null
    var nUsed = 0
    var i = 0
    while (i < entries) { if (lengths(i) > 0) nUsed += 1; i += 1 }
    val tree =
      if (nUsed == 1) {
        // single-used-entry book: decodes by consuming ONE bit (the
        // established decoder behavior for this spec corner)
        var e = 0
        var k = 0
        while (k < entries) { if (lengths(k) > 0) e = k; k += 1 }
        val t = new Array[Int](4)
        t(2) = -e - 1
        t(3) = -e - 1
        t
      } else buildTree(lengths)
    if (tree == null) return null
    // lookup table
    val lookupType = br.bits(4)
    var vq: Array[Double] = null
    var seqP = false
    if (lookupType == 1 || lookupType == 2) {
      // the value TABLE is entries×dim for both lookup types — gate it
      // (memory bound per row), not just the multiplicand count
      if (entries.toLong * dim > (1 << 22)) return null
      val minV = float32Unpack(br.bitsL(32))
      val deltaV = float32Unpack(br.bitsL(32))
      val valueBits = br.bits(4) + 1
      seqP = br.bit() == 1
      val count =
        if (lookupType == 1) lookup1Values(entries, dim) else entries * dim
      if (count < 0 || count > (1 << 22)) return null
      val mults = new Array[Int](count)
      var k = 0
      while (k < count) { mults(k) = br.bits(valueBits); k += 1 }
      if (!br.ok) return null
      vq = new Array[Double](entries * dim)
      var e = 0
      while (e < entries) {
        var last = 0.0
        if (lookupType == 1) {
          var idxDiv = 1
          var d = 0
          while (d < dim) {
            val off = (e / idxDiv) % count
            vq(e * dim + d) = minV + mults(off) * deltaV + last
            if (seqP) last = vq(e * dim + d)
            idxDiv *= count
            d += 1
          }
        } else {
          var d = 0
          while (d < dim) {
            vq(e * dim + d) = minV + mults(e * dim + d) * deltaV + last
            if (seqP) last = vq(e * dim + d)
            d += 1
          }
        }
        e += 1
      }
    } else if (lookupType != 0) return null
    new Codebook(dim, entries, tree, vq, seqP)
  }

  /** Decode one scalar entry index; -1 on failure. */
  private def decodeEntry(br: Br, cb: Codebook): Int = {
    var node = 1
    while (true) {
      val bit = br.bit()
      if (!br.ok) return -1 // end-of-packet: recoverable per spec §4.3
      val slot = 2 * node + bit
      if (slot >= cb.tree.length || cb.tree(slot) == 0) {
        // a sparse tree's vacant slot: structural corruption
        br.corrupt = true
        br.ok = false
        return -1
      }
      val v = cb.tree(slot)
      if (v < 0) return -v - 1
      node = v
    }
    -1
  }

  // --------------------------------------------------------- setup cfg

  private final class Floor1(val partitions: Int, val partClass: Array[Int],
      val classDims: Array[Int], val classSubs: Array[Int],
      val classMaster: Array[Int], val subBooks: Array[Array[Int]],
      val multiplier: Int, val xList: Array[Int])

  private final class Residue(val typ: Int, val begin: Int, val end: Int,
      val partSize: Int, val nClass: Int, val classbook: Int,
      val cascade: Array[Int], val books: Array[Array[Int]])

  private final class Mapping(val submaps: Int, val couplingSteps: Int,
      val magnitude: Array[Int], val angle: Array[Int], val mux: Array[Int],
      val submapFloor: Array[Int], val submapResidue: Array[Int])

  private final class Setup(val books: Array[Codebook],
      val floors: Array[Floor1], val residues: Array[Residue],
      val mappings: Array[Mapping], val modeBlockflag: Array[Boolean],
      val modeMapping: Array[Int])

  private def readFloor1(br: Br, nBooks: Int): Floor1 = {
    val partitions = br.bits(5)
    val partClass = new Array[Int](partitions)
    var maxClass = -1
    var i = 0
    while (i < partitions) {
      partClass(i) = br.bits(4)
      if (partClass(i) > maxClass) maxClass = partClass(i)
      i += 1
    }
    val nClass = maxClass + 1
    val classDims = new Array[Int](nClass)
    val classSubs = new Array[Int](nClass)
    val classMaster = new Array[Int](nClass)
    val subBooks = new Array[Array[Int]](nClass)
    i = 0
    while (i < nClass) {
      classDims(i) = br.bits(3) + 1
      classSubs(i) = br.bits(2)
      if (classSubs(i) > 0) {
        classMaster(i) = br.bits(8)
        if (classMaster(i) >= nBooks) return null
      } else classMaster(i) = -1
      val nSub = 1 << classSubs(i)
      subBooks(i) = new Array[Int](nSub)
      var k = 0
      while (k < nSub) {
        subBooks(i)(k) = br.bits(8) - 1
        if (subBooks(i)(k) >= nBooks) return null
        k += 1
      }
      i += 1
    }
    val multiplier = br.bits(2) + 1
    val rangebits = br.bits(4)
    var nX = 2
    i = 0
    while (i < partitions) { nX += classDims(partClass(i)); i += 1 }
    if (nX > 65) return null
    val xList = new Array[Int](nX)
    xList(0) = 0
    xList(1) = 1 << rangebits
    var w = 2
    i = 0
    while (i < partitions) {
      var d = 0
      while (d < classDims(partClass(i))) {
        xList(w) = br.bits(rangebits)
        w += 1
        d += 1
      }
      i += 1
    }
    if (!br.ok) return null
    // X values must be unique (the neighbor search divides by dx)
    val seen = new java.util.HashSet[Integer]()
    i = 0
    while (i < nX) {
      if (!seen.add(xList(i))) return null
      i += 1
    }
    new Floor1(partitions, partClass, classDims, classSubs, classMaster,
      subBooks, multiplier, xList)
  }

  private def readResidue(br: Br, typ: Int, nBooks: Int): Residue = {
    val begin = br.bitsL(24).toInt
    val end = br.bitsL(24).toInt
    val partSize = br.bitsL(24).toInt + 1
    val nClass = br.bits(6) + 1
    val classbook = br.bits(8)
    if (begin < 0 || end < begin || classbook >= nBooks) return null
    val cascade = new Array[Int](nClass)
    var i = 0
    while (i < nClass) {
      var bits = br.bits(3)
      if (br.bit() == 1) bits |= br.bits(5) << 3
      cascade(i) = bits
      i += 1
    }
    val books = Array.fill(nClass)(Array.fill(8)(-1))
    i = 0
    while (i < nClass) {
      var p = 0
      while (p < 8) {
        if ((cascade(i) & (1 << p)) != 0) {
          books(i)(p) = br.bits(8)
          if (books(i)(p) >= nBooks) return null
        }
        p += 1
      }
      i += 1
    }
    if (!br.ok) return null
    new Residue(typ, begin, end, partSize, nClass, classbook, cascade, books)
  }

  private def readSetup(br: Br, channels: Int): Setup = {
    val nBooks = br.bits(8) + 1
    val books = new Array[Codebook](nBooks)
    var i = 0
    while (i < nBooks) {
      books(i) = readCodebook(br)
      if (books(i) == null) return null
      i += 1
    }
    // time-domain transforms: placeholder zeros
    val nTimes = br.bits(6) + 1
    i = 0
    while (i < nTimes) { if (br.bits(16) != 0) return null; i += 1 }
    val nFloors = br.bits(6) + 1
    val floors = new Array[Floor1](nFloors)
    i = 0
    while (i < nFloors) {
      val t = br.bits(16)
      if (t != 1) return null // floor 0 (LSP): out of scope, reject
      floors(i) = readFloor1(br, nBooks)
      if (floors(i) == null) return null
      i += 1
    }
    val nRes = br.bits(6) + 1
    val residues = new Array[Residue](nRes)
    i = 0
    while (i < nRes) {
      val t = br.bits(16)
      if (t > 2) return null
      residues(i) = readResidue(br, t, nBooks)
      if (residues(i) == null) return null
      i += 1
    }
    val nMaps = br.bits(6) + 1
    val mappings = new Array[Mapping](nMaps)
    i = 0
    while (i < nMaps) {
      if (br.bits(16) != 0) return null
      val submaps = if (br.bit() == 1) br.bits(4) + 1 else 1
      var couplingSteps = 0
      var mag: Array[Int] = new Array[Int](0)
      var ang: Array[Int] = new Array[Int](0)
      if (br.bit() == 1) {
        couplingSteps = br.bits(8) + 1
        mag = new Array[Int](couplingSteps)
        ang = new Array[Int](couplingSteps)
        var s = 0
        while (s < couplingSteps) {
          mag(s) = br.bits(ilog(channels - 1))
          ang(s) = br.bits(ilog(channels - 1))
          if (mag(s) == ang(s) || mag(s) >= channels || ang(s) >= channels)
            return null
          s += 1
        }
      }
      if (br.bits(2) != 0) return null // reserved
      val mux = new Array[Int](channels)
      if (submaps > 1) {
        var c = 0
        while (c < channels) {
          mux(c) = br.bits(4)
          if (mux(c) >= submaps) return null
          c += 1
        }
      }
      val sFloor = new Array[Int](submaps)
      val sRes = new Array[Int](submaps)
      var s = 0
      while (s < submaps) {
        br.bits(8) // unused time config
        sFloor(s) = br.bits(8)
        if (sFloor(s) >= nFloors) return null
        sRes(s) = br.bits(8)
        if (sRes(s) >= nRes) return null
        s += 1
      }
      mappings(i) = new Mapping(submaps, couplingSteps, mag, ang, mux,
        sFloor, sRes)
      i += 1
    }
    val nModes = br.bits(6) + 1
    val modeBlock = new Array[Boolean](nModes)
    val modeMap = new Array[Int](nModes)
    i = 0
    while (i < nModes) {
      modeBlock(i) = br.bit() == 1
      if (br.bits(16) != 0) return null // window type
      if (br.bits(16) != 0) return null // transform type
      modeMap(i) = br.bits(8)
      if (modeMap(i) >= nMaps) return null
      i += 1
    }
    if (br.bit() != 1 || !br.ok) return null // framing
    new Setup(books, floors, residues, mappings, modeBlock, modeMap)
  }

  // ------------------------------------------------------------ floor1

  private val Floor1Range = Array(256, 128, 86, 64)

  private def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  private def renderLine(x0: Int, y0: Int, x1: Int, y1: Int,
      v: Array[Int], n: Int): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    var ady = math.abs(dy)
    val base = dy / adx
    var x = x0
    var y = y0
    var err = 0
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    if (x0 < n) v(x0) = y
    x = x0 + 1
    while (x < math.min(x1, n)) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      v(x) = y
      x += 1
    }
  }

  /** Decode one channel's floor1; returns the rendered dB-table INDEX
    * vector of length n2 (half block), or null when the channel is
    * UNUSED this frame, or throws ok=false via br on corruption.
    */
  private def decodeFloor1(br: Br, f: Floor1, books: Array[Codebook],
      n2: Int): Array[Int] = {
    if (br.bit() != 1) return null // unused channel
    val range = Floor1Range(f.multiplier - 1)
    val nX = f.xList.length
    val y = new Array[Int](nX)
    val yb = ilog(range - 1)
    y(0) = br.bits(yb)
    y(1) = br.bits(yb)
    var w = 2
    var p = 0
    while (p < f.partitions) {
      val cls = f.partClass(p)
      val cdim = f.classDims(cls)
      val csub = f.classSubs(cls)
      val csubMask = (1 << csub) - 1
      var cval = 0
      if (csub > 0) {
        cval = decodeEntry(br, books(f.classMaster(cls)))
        if (cval < 0) return null // ok/corrupt already set
      }
      var d = 0
      while (d < cdim) {
        val book = f.subBooks(cls)(cval & csubMask)
        cval >>= csub
        if (book >= 0) {
          y(w) = decodeEntry(br, books(book))
          if (y(w) < 0) return null // ok/corrupt already set
        } else y(w) = 0
        w += 1
        d += 1
      }
      p += 1
    }
    if (!br.ok) return null
    // amplitude synthesis (step 2)
    val finalY = new Array[Int](nX)
    val step2 = new Array[Boolean](nX)
    finalY(0) = y(0)
    finalY(1) = y(1)
    step2(0) = true
    step2(1) = true
    var i = 2
    while (i < nX) {
      // low/high neighbors among PRIOR list positions
      var low = 0
      var high = 1
      var k = 0
      while (k < i) {
        if (f.xList(k) < f.xList(i) &&
          (f.xList(k) > f.xList(low) || f.xList(low) >= f.xList(i))) low = k
        if (f.xList(k) > f.xList(i) &&
          (f.xList(k) < f.xList(high) || f.xList(high) <= f.xList(i))) high = k
        k += 1
      }
      val predicted = renderPoint(f.xList(low), finalY(low),
        f.xList(high), finalY(high), f.xList(i))
      val v = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = 2 * math.min(highroom, lowroom)
      if (v != 0) {
        step2(low) = true
        step2(high) = true
        step2(i) = true
        finalY(i) =
          if (v >= room) {
            if (highroom > lowroom) v - lowroom + predicted
            else predicted - (v - highroom) - 1
          } else if ((v & 1) == 1) predicted - ((v + 1) / 2)
          else predicted + v / 2
      } else {
        step2(i) = false
        finalY(i) = predicted
      }
      if (finalY(i) < 0 || finalY(i) >= range) {
        br.corrupt = true; br.ok = false; return null
      }
      i += 1
    }
    // curve synthesis: sorted-X render over step2 posts
    val order = (0 until nX).sortBy(f.xList(_)).toArray
    val out = new Array[Int](n2)
    var lx = 0
    var ly = finalY(order(0)) * f.multiplier
    var oi = 1
    while (oi < nX) {
      val idx = order(oi)
      if (step2(idx)) {
        val hx = f.xList(idx)
        val hy = finalY(idx) * f.multiplier
        renderLine(lx, ly, hx, hy, out, n2)
        lx = hx
        ly = hy
      }
      oi += 1
    }
    // extend the last value to the end of the half block
    var x = lx
    while (x < n2) { out(x) = ly; x += 1 }
    var c = 0
    while (c < n2) {
      if (out(c) < 0) out(c) = 0
      if (out(c) > 255) out(c) = 255
      c += 1
    }
    out
  }

  // ----------------------------------------------------------- residue

  /** Decode one residue application over `vecs` (only channels with
    * doNotDecode(j)==false participate). Type 2 callers pass a single
    * interleaved vector. Returns false on corruption.
    */
  private def decodeResidueInner(br: Br, r: Residue, books: Array[Codebook],
      vecs: Array[Array[Double]], doNotDecode: Array[Boolean],
      n2: Int): Boolean = {
    val limBegin = math.min(r.begin, n2)
    val limEnd = math.min(r.end, n2)
    val nToRead = limEnd - limBegin
    if (nToRead == 0) return true
    val partsToRead = nToRead / r.partSize
    val classbook = books(r.classbook)
    val classwords = classbook.dim
    val ch = vecs.length
    val classifs = Array.ofDim[Int](ch, partsToRead + classwords)
    var pass = 0
    while (pass < 8) {
      var partCount = 0
      while (partCount < partsToRead) {
        if (pass == 0) {
          var j = 0
          while (j < ch) {
            if (!doNotDecode(j)) {
              var temp = decodeEntry(br, classbook)
              // EOP mid-residue is the spec's non-error: keep the
              // partial vector (§4.3); only structural decode
              // failures reject
              if (temp < 0) return !br.corrupt
              var i = classwords - 1
              while (i >= 0) {
                classifs(j)(partCount + i) = temp % r.nClass
                temp /= r.nClass
                i -= 1
              }
            }
            j += 1
          }
        }
        var i = 0
        while (i < classwords && partCount < partsToRead) {
          var j = 0
          while (j < ch) {
            if (!doNotDecode(j)) {
              val vq = classifs(j)(partCount)
              if (vq >= r.nClass) return false
              val book = r.books(vq)(pass)
              if (book >= 0) {
                val cb = books(book)
                if (cb.vq == null) return false
                val offset = limBegin + partCount * r.partSize
                if (r.typ == 0) {
                  // interleaved-by-stride partition layout
                  val step = r.partSize / cb.dim
                  var s = 0
                  while (s < step) {
                    val e = decodeEntry(br, cb)
                    if (e < 0) return !br.corrupt
                    var d = 0
                    while (d < cb.dim) {
                      vecs(j)(offset + s + d * step) += cb.vq(e * cb.dim + d)
                      d += 1
                    }
                    s += 1
                  }
                } else {
                  var s = 0
                  while (s < r.partSize) {
                    val e = decodeEntry(br, cb)
                    if (e < 0) return !br.corrupt
                    var d = 0
                    while (d < cb.dim && s < r.partSize) {
                      vecs(j)(offset + s) += cb.vq(e * cb.dim + d)
                      s += 1
                      d += 1
                    }
                  }
                }
              }
            }
            j += 1
          }
          partCount += 1
          i += 1
        }
      }
      pass += 1
    }
    true
  }

  // ------------------------------------------------------------- MDCT

  /** Cached IMDCT basis per block size: StrictMath.cos dominated the
    * per-row decode profile (≈200k transcendental calls per stereo
    * doc) — the table turns the transform into pure multiply-adds.
    * Capped at n ≤ 2048 (16 MB; the common real-world maximum) —
    * larger legal blocks (≤8192) fall back to the direct loop rather
    * than pinning a 268 MB table.
    */
  private val imdctCosCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  private def imdctCos(n: Int): Array[Array[Double]] =
    imdctCosCache.computeIfAbsent(n, { _ =>
      val f = 2.0 * StrictMath.PI / n
      Array.tabulate(n, n / 2)((j, k) =>
        StrictMath.cos(f * (j + 0.5 + n / 4.0) * (k + 0.5)))
    })

  /** Direct inverse MDCT (spec §1.3.2 definition), n = block size:
    * out(j) = Σ_{k<n/2} spec(k) · cos(2π/n · (j + 0.5 + n/4)(k + 0.5)).
    */
  private[graftnative] def imdct(spec: Array[Double], n: Int): Array[Double] = {
    val n2 = n / 2
    val out = new Array[Double](n)
    if (n <= 2048) {
      val tab = imdctCos(n)
      var j = 0
      while (j < n) {
        val row = tab(j)
        var s = 0.0
        var k = 0
        while (k < n2) {
          s += spec(k) * row(k)
          k += 1
        }
        out(j) = s
        j += 1
      }
      return out
    }
    val f = 2.0 * StrictMath.PI / n
    var j = 0
    while (j < n) {
      var s = 0.0
      val a = j + 0.5 + n / 4.0
      var k = 0
      while (k < n2) {
        s += spec(k) * StrictMath.cos(f * a * (k + 0.5))
        k += 1
      }
      out(j) = s
      j += 1
    }
    out
  }

  /** The Vorbis window over slope position i of slope length n:
    * sin(π/2 · sin²(π(i + 0.5)/(2n))).
    */
  private def winSlope(i: Int, n: Int): Double = {
    val x = StrictMath.sin(StrictMath.PI * (i + 0.5) / (2.0 * n))
    StrictMath.sin(StrictMath.PI / 2.0 * x * x)
  }

  // ------------------------------------------------------------ decode

  /** Assembled packets plus, per packet, the granule position of the
    * page on which it completes — valid only for the LAST packet
    * completed on each page (the spec ties granulepos to that packet);
    * −1 everywhere else, and on pages whose granulepos field is the
    * spec's "no packet completes here" sentinel (all ones).
    */
  private[graftnative] final class PacketStream(
      val packets: Array[Array[Byte]], val granules: Array[Long])

  /** Assemble Ogg packets: returns the packet stream or null. Verifies
    * every page CRC; handles lacing and continued packets; records the
    * page granule positions needed for the spec's head/tail trimming.
    */
  private[graftnative] def oggPacketStream(b: Array[Byte]): PacketStream = {
    val packets = new java.util.ArrayList[Array[Byte]]()
    val granules = new java.util.ArrayList[java.lang.Long]()
    var cur = new java.io.ByteArrayOutputStream()
    var open = false
    var off = 0
    while (off + 27 <= b.length) {
      if (!(b(off) == 'O' && b(off + 1) == 'g' && b(off + 2) == 'g' &&
        b(off + 3) == 'S') || b(off + 4) != 0) return null
      val headerType = b(off + 5) & 0xFF
      val nSegs = b(off + 26) & 0xFF
      if (off + 27 + nSegs > b.length) return null
      var bodyLen = 0
      var s = 0
      while (s < nSegs) { bodyLen += b(off + 27 + s) & 0xFF; s += 1 }
      val pageLen = 27 + nSegs + bodyLen
      if (off + pageLen > b.length) return null
      val stored = (b(off + 22) & 0xFF) | ((b(off + 23) & 0xFF) << 8) |
        ((b(off + 24) & 0xFF) << 16) | ((b(off + 25) & 0xFF) << 24)
      if (OggMeta.pageCrc(b, off, pageLen, off + 22) != stored) return null
      var pageGranule = 0L
      var gi = 0
      while (gi < 8) {
        pageGranule |= (b(off + 6 + gi) & 0xFFL) << (8 * gi)
        gi += 1
      }
      val continued = (headerType & 1) != 0
      if (continued != open) return null // torn continuation
      var p = off + 27 + nSegs
      var lastCompleted = -1
      s = 0
      while (s < nSegs) {
        val seg = b(off + 27 + s) & 0xFF
        cur.write(b, p, seg)
        p += seg
        if (seg < 255) {
          packets.add(cur.toByteArray)
          granules.add(-1L)
          lastCompleted = packets.size() - 1
          cur = new java.io.ByteArrayOutputStream()
          open = false
          if (packets.size() > MaxPackets) return null
        } else open = true
        s += 1
      }
      if (lastCompleted >= 0 && pageGranule != -1L)
        granules.set(lastCompleted, pageGranule)
      off += pageLen
    }
    if (open || off != b.length) return null
    val out = new Array[Array[Byte]](packets.size())
    val g = new Array[Long](packets.size())
    var i = 0
    while (i < out.length) {
      out(i) = packets.get(i)
      g(i) = granules.get(i)
      i += 1
    }
    new PacketStream(out, g)
  }

  private[graftnative] def oggPackets(b: Array[Byte]): Array[Array[Byte]] = {
    val s = oggPacketStream(b)
    if (s == null) null else s.packets
  }

  private def isHeader(p: Array[Byte], typ: Int): Boolean =
    p.length >= 7 && (p(0) & 0xFF) == typ && p(1) == 'v' && p(2) == 'o' &&
      p(3) == 'r' && p(4) == 'b' && p(5) == 'i' && p(6) == 's'

  /** Per-thread memo of parsed setup headers keyed by the exact packet
    * bytes (+ channel count, which gates the mapping parse). Crawl
    * corpora repeat encoder configurations constantly — the same
    * encoder build emits byte-identical setup packets — and the
    * codebook tree builds dominated the per-FILE decode cost at small
    * files. Parsed Setups are immutable; failures are not cached
    * (failing is already cheap).
    */
  private final class SetupKey(val b: Array[Byte], val ch: Int) {
    override val hashCode: Int = java.util.Arrays.hashCode(b) * 31 + ch
    override def equals(o: Any): Boolean = o match {
      case k: SetupKey => k.ch == ch && java.util.Arrays.equals(k.b, b)
      case _ => false
    }
  }
  private val tlSetup =
    ThreadLocal.withInitial[java.util.LinkedHashMap[SetupKey, Setup]](() =>
      new java.util.LinkedHashMap[SetupKey, Setup](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[SetupKey, Setup]): Boolean = size > 8
      })

  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 58) return unknown
    val stream = oggPacketStream(b)
    if (stream == null || stream.packets.length < 3) return unknown
    val packets = stream.packets
    val granules = stream.granules
    // identification header
    if (!isHeader(packets(0), 1)) return unknown
    val idBr = new Br(packets(0))
    idBr.pos = 7 * 8
    if (idBr.bitsL(32) != 0) return unknown // version
    val channels = idBr.bits(8)
    val rate = idBr.bitsL(32).toInt
    idBr.bitsL(32); idBr.bitsL(32); idBr.bitsL(32) // bitrates
    val bsBits = idBr.bits(8)
    val bs0 = 1 << (bsBits & 0xF)
    val bs1 = 1 << (bsBits >> 4)
    if (idBr.bit() != 1 || !idBr.ok) return unknown
    if (channels < 1 || channels > 8 || rate < 1) return unknown
    if (bs0 < 64 || bs1 < bs0 || bs1 > MaxBlock) return unknown
    // comment header: structural skip only
    if (!isHeader(packets(1), 3)) return unknown
    // setup header (memoized per thread by exact packet bytes)
    if (!isHeader(packets(2), 5)) return unknown
    val setupKey = new SetupKey(packets(2), channels)
    val setupCache = tlSetup.get()
    var setup = setupCache.get(setupKey)
    if (setup == null) {
      val sBr = new Br(packets(2))
      sBr.pos = 7 * 8
      setup = readSetup(sBr, channels)
      if (setup == null) return unknown
      setupCache.put(setupKey, setup)
    }

    // audio packet loop
    val modeBits = ilog(setup.modeBlockflag.length - 1)
    var specSum = 0.0
    val pcm = new java.util.ArrayList[Array[Int]]()
    var absMax = 0
    var nSamples = 0
    // overlap state: the right half of the previous window, plus its
    // block size
    var prevRight: Array[Array[Double]] = null
    var prevN = 0
    var pi = 3
    var nAudio = 0
    var haveGranule = false
    var headTrim = 0
    var lastGranule = -1L
    while (pi < packets.length) {
      val p = packets(pi)
      val br = new Br(p)
      if (br.bit() != 0) return unknown // must be an audio packet
      val mode = br.bits(modeBits)
      if (mode >= setup.modeBlockflag.length) return unknown
      if (!br.ok) {
        // EOP before the mode field completes: the spec IGNORES the
        // packet (frame lost, lapping state unchanged) — only a
        // non-audio type bit or an out-of-range mode rejects
        pi += 1
      } else {
      val longBlock = setup.modeBlockflag(mode)
      val n = if (longBlock) bs1 else bs0
      val n2 = n / 2
      // allocation-amplification gate (mirrors WarcRecords.MaxInflated),
      // checked BEFORE any decode work so a few-KB crafted stream of
      // ~1-byte audio packets cannot demand unbounded PCM or CPU
      if (prevRight != null &&
        (nSamples + prevN / 4 + n / 4).toLong * channels > MaxTotalSamples)
        return unknown
      var prevFlag = true
      var nextFlag = true
      if (longBlock && bs0 != bs1) {
        prevFlag = br.bit() == 1
        nextFlag = br.bit() == 1
      }
      val mapping = setup.mappings(setup.modeMapping(mode))
      // floors. End-of-packet during floor decode is the spec's
      // NON-error (§4.3.2): the frame renders silent — every channel
      // zeroed — but still advances the lapping state. Only structural
      // corruption (vacant codeword slots, out-of-range floor values)
      // rejects the stream.
      val floorOut = new Array[Array[Int]](channels)
      val noResidue = new Array[Boolean](channels)
      var frameEop = false
      var c = 0
      while (c < channels && !frameEop) {
        val f = setup.floors(mapping.submapFloor(mapping.mux(c)))
        floorOut(c) = decodeFloor1(br, f, setup.books, n2)
        if (br.corrupt) return unknown
        if (!br.ok) frameEop = true
        noResidue(c) = floorOut(c) == null
        c += 1
      }
      if (frameEop) {
        c = 0
        while (c < channels) {
          floorOut(c) = null
          noResidue(c) = true
          c += 1
        }
      }
      // coupling: if either channel of a pair is nonzero, both decode
      var s = 0
      while (s < mapping.couplingSteps) {
        if (!noResidue(mapping.magnitude(s)) || !noResidue(mapping.angle(s))) {
          noResidue(mapping.magnitude(s)) = false
          noResidue(mapping.angle(s)) = false
        }
        s += 1
      }
      // residue per submap. EOP inside residue keeps the partial
      // vector (decodeResidueInner returns true for it); only
      // structural failures surface as false here.
      val residueVec = Array.ofDim[Double](channels, n2)
      var sm = 0
      while (sm < mapping.submaps && !frameEop) {
        val chIdx = (0 until channels).filter(mapping.mux(_) == sm).toArray
        val r = setup.residues(mapping.submapResidue(sm))
        if (r.typ == 2) {
          val anyDecode = chIdx.exists(!noResidue(_))
          if (anyDecode) {
            val inter = Array.ofDim[Double](1, n2 * chIdx.length)
            if (!decodeResidueInner(br, r, setup.books, inter,
              Array(false), n2 * chIdx.length)) return unknown
            var k = 0
            while (k < n2) {
              var j = 0
              while (j < chIdx.length) {
                residueVec(chIdx(j))(k) = inter(0)(k * chIdx.length + j)
                j += 1
              }
              k += 1
            }
          }
        } else {
          val vecs = chIdx.map(residueVec(_))
          val dnd = chIdx.map(noResidue(_))
          if (!decodeResidueInner(br, r, setup.books, vecs, dnd, n2))
            return unknown
        }
        sm += 1
      }
      // inverse coupling (square polar)
      s = mapping.couplingSteps - 1
      while (s >= 0) {
        val m = residueVec(mapping.magnitude(s))
        val a = residueVec(mapping.angle(s))
        var k = 0
        while (k < n2) {
          val mv = m(k)
          val av = a(k)
          var nm = 0.0
          var na = 0.0
          if (mv > 0) {
            if (av > 0) { nm = mv; na = mv - av }
            else { na = mv; nm = mv + av }
          } else {
            if (av > 0) { nm = mv; na = mv + av }
            else { na = mv; nm = mv - av }
          }
          m(k) = nm
          a(k) = na
          k += 1
        }
        s -= 1
      }
      // dot product + spectral fingerprint
      val spectral = Array.ofDim[Double](channels, n2)
      c = 0
      while (c < channels) {
        if (floorOut(c) != null) {
          var k = 0
          while (k < n2) {
            spectral(c)(k) = residueVec(c)(k) * InverseDb(floorOut(c)(k))
            specSum += spectral(c)(k)
            k += 1
          }
        }
        c += 1
      }
      // IMDCT + window + overlap-add. A channel whose floor is unused
      // renders silence (spec §4.3.7) — its spectral vector is exactly
      // zero, so the transform is skipped outright: silence is common
      // in real corpora and the direct IMDCT is O(n²) at large blocks.
      val frame = Array.ofDim[Double](channels, n)
      c = 0
      while (c < channels) {
        if (floorOut(c) != null) {
          val t = imdct(spectral(c), n)
          // window: equal-lapping for matched neighbors; a long block
          // next to short neighbors gets the spec's offset short slopes
          val leftN = if (longBlock && !prevFlag) bs0 else n
          val rightN = if (longBlock && !nextFlag) bs0 else n
          val leftStart = n / 4 - leftN / 4
          val rightEnd = 3 * n / 4 + rightN / 4
          var j = 0
          while (j < n) {
            val wv =
              if (j < leftStart) 0.0
              else if (j < leftStart + leftN / 2)
                winSlope(j - leftStart, leftN / 2)
              else if (j < rightEnd - rightN / 2) 1.0
              else if (j < rightEnd)
                winSlope(rightEnd - 1 - j, rightN / 2)
              else 0.0
            frame(c)(j) = t(j) * wv
            j += 1
          }
        }
        c += 1
      }
      if (prevRight != null) {
        // output region: overlap of the previous window's right half
        // and this window's left half, centered per the spec's
        // returned-sample accounting
        val outLen = prevN / 4 + n / 4
        val out = new Array[Int](outLen * channels)
        c = 0
        while (c < channels) {
          var j = 0
          while (j < outLen) {
            // previous right half starts at prevN/2 into the previous
            // window; current left half starts at 0 shifted so centers
            // align: map output sample j to prev index prevN/2 + j and
            // cur index j + (n/2 - (prevN/4 + n/4))
            val pIdx = prevN / 2 + j
            val cIdx = j + n / 2 - outLen
            val pv = if (pIdx < prevN) prevRight(c)(pIdx) else 0.0
            val cv = if (cIdx >= 0) frame(c)(cIdx) else 0.0
            val v = pv + cv
            var q = StrictMath.rint(v * 32767.0).toInt
            if (q > 32767) q = 32767
            if (q < -32768) q = -32768
            val aq = math.abs(q)
            if (aq > absMax) absMax = aq
            out(j * channels + c) = q
            j += 1
          }
          c += 1
        }
        pcm.add(out)
        nSamples += outLen
      }
      prevRight = frame
      prevN = n
      nAudio += 1
      if (nAudio > MaxPackets) return unknown
      // granule accounting (spec A.2): a page's granulepos is the
      // absolute PCM position after its last completed packet. The
      // first granule-bearing audio page declares the head offset
      // (decoded-so-far minus granulepos); the final one declares the
      // end trim.
      val g = granules(pi)
      if (g >= 0) {
        if (!haveGranule) {
          haveGranule = true
          headTrim = math.max(0L, nSamples.toLong - g).toInt
        }
        lastGranule = g
      }
      pi += 1
      }
    }
    if (nAudio == 0) return unknown
    var all = new Array[Int](nSamples * channels)
    var w = 0
    var li = 0
    while (li < pcm.size()) {
      val seg = pcm.get(li)
      System.arraycopy(seg, 0, all, w, seg.length)
      w += seg.length
      li += 1
    }
    var nOut = nSamples
    if (haveGranule) {
      val kept = math.max(0L,
        math.min((nSamples - headTrim).toLong, lastGranule)).toInt
      if (headTrim > 0 || kept < nSamples) {
        all = java.util.Arrays.copyOfRange(all, headTrim * channels,
          (headTrim + kept) * channels)
        nOut = kept
        absMax = 0
        var t = 0
        while (t < all.length) {
          val m = if (all(t) < 0) -all(t) else all(t)
          if (m > absMax) absMax = m
          t += 1
        }
      }
    }
    val q20 = StrictMath.rint(specSum * 1048576.0)
    val q20l = if (q20.isNaN || q20.isInfinite) 0L else q20.toLong
    new GenericInternalRow(Array[Any](FmtVorbis, channels, rate, nAudio,
      nOut, q20l, absMax, new GenericArrayData(all)))
  }
}

/** Fixture ENCODER for [[VorbisCodec]]: complete, valid Ogg Vorbis
  * streams whose decoded SPECTRA are pure formulas of the seed. The
  * three headers are really bit-packed (a lookup-0 classbook and a
  * lookup-2 VQ book through the spec's codeword assignment and
  * float32 packing; a floor-1 config with zero partitions; residues
  * of BOTH types 1 and 2; a coupled stereo mapping), and audio
  * packets carry flat-at-maximum floors (multiplier slot 0, posts at
  * 255 → dB index 255 = exactly 1.0) over VQ values that are DYADIC
  * (min −2.0, delta 0.5), so `spec_sum_q20` is an exact BIGINT the
  * oracle replays: per frame, class-0 partitions (class pattern
  * `(seed+p) mod 2` via 2-wide classwords) accumulate two book-1
  * entries each (`entry = (seed + 2f + 3p + i) mod 8`, value[d] =
  * −2 + 0.5·((entry+d) mod 8)); class-1 partitions stay zero (the
  * no-book cascade path). Stereo seeds couple channels square-polar
  * through residue type 2; silent seeds (every 5th) zero every floor
  * flag and must reach the PCM as exact zeros.
  */
object VorbisSynth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  // ---- shared seed formulas (the oracle mirrors these)
  def silent(doc: Long): Boolean = fm(doc, 5) == 0
  def channels(doc: Long): Int = 1 + fm(doc, 2)
  def srIdx(doc: Long): Int = fm(doc, 3)
  def frames(doc: Long): Int = 2 + fm(doc, 3)
  def partClass(doc: Long, p: Int): Int = fm(doc + p, 2)
  def vqEntry(doc: Long, f: Int, p: Int, i: Int): Int =
    fm(doc + 2 * f + 3 * p + i, 8)
  val SampleRate = Array(44100, 48000, 32000)
  val BlockSize = 256

  private final class BitW {
    private var buf = new Array[Byte](1024)
    private var bitLen = 0
    /** LSB-first write of the low n bits of v. */
    def put(v: Long, n: Int): Unit = {
      var k = 0
      while (k < n) {
        val byteI = bitLen >> 3
        if (byteI >= buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        if (((v >> k) & 1) == 1)
          buf(byteI) = (buf(byteI) | (1 << (bitLen & 7))).toByte
        bitLen += 1
        k += 1
      }
    }
    /** A codeword: bits MSB-first (the decode-walk order). */
    def code(c: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { put((c >> k) & 1, 1); k -= 1 }
    }
    def bytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitLen + 7) >> 3)
  }

  private def header(w: BitW, typ: Int): Unit = {
    w.put(typ, 8)
    "vorbis".foreach(c => w.put(c.toLong, 8))
  }

  private def identPacket(ch: Int, rate: Int): Array[Byte] = {
    val w = new BitW
    header(w, 1)
    w.put(0, 32) // version
    w.put(ch, 8)
    w.put(rate, 32)
    w.put(0, 32); w.put(0, 32); w.put(0, 32) // bitrates
    w.put(0x88, 8) // blocksizes 256/256
    w.put(1, 1) // framing
    w.bytes
  }

  private def commentPacket(): Array[Byte] = {
    val w = new BitW
    header(w, 3)
    w.put(0, 32) // vendor length
    w.put(0, 32) // user comment count
    w.put(1, 1)
    w.bytes
  }

  /** Vorbis float32 pack of v = ±mant·2^(exp−788). */
  private def f32(sign: Boolean, exp: Int, mant: Int): Long =
    (if (sign) 0x80000000L else 0L) | (exp.toLong << 21) | mant.toLong

  private def setupPacket(ch: Int): Array[Byte] = {
    val w = new BitW
    header(w, 5)
    w.put(1, 8) // 2 codebooks
    // book 0: classbook, dim 2, 4 entries, all length 2, no lookup
    w.put(0x564342, 24)
    w.put(2, 16); w.put(4, 24)
    w.put(0, 1) // not ordered
    w.put(0, 1) // not sparse
    var i = 0
    while (i < 4) { w.put(1, 5); i += 1 } // length 2 (stored − 1)
    w.put(0, 4) // lookup 0
    // book 1: VQ, dim 4, 8 entries, all length 3, lookup 2
    w.put(0x564342, 24)
    w.put(4, 16); w.put(8, 24)
    w.put(0, 1); w.put(0, 1)
    i = 0
    while (i < 8) { w.put(2, 5); i += 1 } // length 3
    w.put(2, 4) // lookup 2
    w.put(f32(sign = true, 789, 1), 32) // min −2.0
    w.put(f32(sign = false, 787, 1), 32) // delta 0.5
    w.put(2, 4) // value_bits 3 (stored − 1)
    w.put(0, 1) // sequence_p
    var e = 0
    while (e < 8) {
      var d = 0
      while (d < 4) { w.put((e + d) % 8, 3); d += 1 }
      e += 1
    }
    // time transforms
    w.put(0, 6); w.put(0, 16)
    // one floor, type 1, zero partitions, multiplier slot 0, rangebits 7
    w.put(0, 6)
    w.put(1, 16)
    w.put(0, 5) // partitions
    w.put(0, 2) // multiplier − 1 → ×1, range 256
    w.put(7, 4) // rangebits (X domain [0, 128])
    // two residues: type 1 (mono path) and type 2 (coupled stereo)
    w.put(1, 6)
    def residue(typ: Int, end: Int): Unit = {
      w.put(typ, 16)
      w.put(0, 24) // begin
      w.put(end, 24)
      w.put(7, 24) // partition size − 1 → 8
      w.put(1, 6) // classifications − 1 → 2
      w.put(0, 8) // classbook 0
      // class 0: cascade pass-0 bit; class 1: no books
      w.put(1, 3); w.put(0, 1)
      w.put(0, 3); w.put(0, 1)
      w.put(1, 8) // class 0 pass 0 → book 1
    }
    residue(1, 128)
    residue(2, 256)
    // one mapping, type 0
    w.put(0, 6)
    w.put(0, 16)
    w.put(0, 1) // one submap
    if (ch == 2) {
      w.put(1, 1) // coupling present
      w.put(0, 8) // steps − 1
      w.put(0, 1) // magnitude = ch 0 (ilog(1) = 1 bit)
      w.put(1, 1) // angle = ch 1
    } else w.put(0, 1)
    w.put(0, 2) // reserved
    // submaps == 1 → no mux; submap 0 config
    w.put(0, 8) // unused time
    w.put(0, 8) // floor 0
    w.put(if (ch == 2) 1 else 0, 8) // residue: type 2 when coupled
    // one mode
    w.put(0, 6)
    w.put(0, 1) // blockflag
    w.put(0, 16); w.put(0, 16)
    w.put(0, 8) // mapping 0
    w.put(1, 1) // framing
    w.bytes
  }

  private def audioPacket(doc: Long, f: Int, ch: Int): Array[Byte] = {
    val w = new BitW
    w.put(0, 1) // audio packet
    // mode number: ilog(0) = 0 bits
    if (silent(doc)) {
      var c = 0
      while (c < ch) { w.put(0, 1); c += 1 } // floor unused flags
      return w.bytes
    }
    var c = 0
    while (c < ch) {
      w.put(1, 1) // nonzero
      w.put(255, 8) // y0 (range 256 → 8 bits)
      w.put(255, 8) // y1
      c += 1
    }
    // residue: mono → type 1 over 128 lines; stereo → type 2 over the
    // 256-long interleaved vector. Identical emission loop; only the
    // partition count differs.
    val parts = if (ch == 2) 32 else 16
    var p = 0
    while (p < parts) {
      // classword covering partitions p and p+1
      val temp = partClass(doc, p) * 2 + partClass(doc, p + 1)
      w.code(temp, 2) // classbook entry = its own 2-bit codeword
      var pi = 0
      while (pi < 2 && p + pi < parts) {
        if (partClass(doc, p + pi) == 0) {
          var i = 0
          while (i < 2) { // partition size 8 / dim 4 = 2 VQ words
            w.code(vqEntry(doc, f, p + pi, i), 3)
            i += 1
          }
        }
        pi += 1
      }
      p += 2
    }
    w.bytes
  }

  def oggVorbisBytes(doc: Long): Array[Byte] = {
    if (doc < 0) return null
    val ch = channels(doc)
    val rate = SampleRate(srIdx(doc))
    val nF = frames(doc)
    val serial = 77
    val out = new java.io.ByteArrayOutputStream()
    def add(p: Array[Byte]): Unit = out.write(p, 0, p.length)
    add(OggSynth.page(2, 0, serial, 0, identPacket(ch, rate))) // BOS
    add(OggSynth.page(0, 0, serial, 1, commentPacket()))
    add(OggSynth.page(0, 0, serial, 2, setupPacket(ch)))
    var f = 0
    var granule = 0L
    while (f < nF) {
      if (f > 0) granule += BlockSize / 2
      val last = f == nF - 1
      add(OggSynth.page(if (last) 4 else 0, granule, serial, 3 + f,
        audioPacket(doc, f, ch)))
      f += 1
    }
    out.toByteArray
  }

  /** Test-harness variant: a MIXED-blocksize mono stream (128/256, two
    * modes, frames alternating short/long with short prev/next flags)
    * — exercises the long-against-short window lapping the gate
    * fixture's equal blocksizes never reach. Frame f is short when f
    * is even; short frames carry 8 residue partitions (n/2 = 64 caps
    * the residue end), long frames 16.
    */
  private[graftnative] def mixedStreamBytes(doc: Long, nF: Int): Array[Byte] = {
    val w0 = new BitW
    header(w0, 1)
    w0.put(0, 32); w0.put(1, 8); w0.put(44100, 32)
    w0.put(0, 32); w0.put(0, 32); w0.put(0, 32)
    w0.put(0x87, 8) // blocksizes 128/256
    w0.put(1, 1)
    val ident = w0.bytes
    // setup: same books/floor/residues, TWO modes (short, long)
    val w = new BitW
    header(w, 5)
    w.put(1, 8)
    w.put(0x564342, 24); w.put(2, 16); w.put(4, 24)
    w.put(0, 1); w.put(0, 1)
    var i = 0
    while (i < 4) { w.put(1, 5); i += 1 }
    w.put(0, 4)
    w.put(0x564342, 24); w.put(4, 16); w.put(8, 24)
    w.put(0, 1); w.put(0, 1)
    i = 0
    while (i < 8) { w.put(2, 5); i += 1 }
    w.put(2, 4)
    w.put(f32(sign = true, 789, 1), 32)
    w.put(f32(sign = false, 787, 1), 32)
    w.put(2, 4); w.put(0, 1)
    var e = 0
    while (e < 8) {
      var d = 0
      while (d < 4) { w.put((e + d) % 8, 3); d += 1 }
      e += 1
    }
    w.put(0, 6); w.put(0, 16)
    w.put(0, 6); w.put(1, 16)
    w.put(0, 5); w.put(0, 2); w.put(7, 4)
    w.put(0, 6) // one residue (type 1)
    w.put(1, 16); w.put(0, 24); w.put(128, 24); w.put(7, 24)
    w.put(1, 6); w.put(0, 8)
    w.put(1, 3); w.put(0, 1)
    w.put(0, 3); w.put(0, 1)
    w.put(1, 8)
    w.put(0, 6) // one mapping
    w.put(0, 16); w.put(0, 1); w.put(0, 1); w.put(0, 2)
    w.put(0, 8); w.put(0, 8); w.put(0, 8)
    w.put(1, 6) // TWO modes: 0 = short, 1 = long
    w.put(0, 1); w.put(0, 16); w.put(0, 16); w.put(0, 8)
    w.put(1, 1); w.put(0, 16); w.put(0, 16); w.put(0, 8)
    w.put(1, 1)
    val setup = w.bytes
    val serial = 78
    val out = new java.io.ByteArrayOutputStream()
    def add(p: Array[Byte]): Unit = out.write(p, 0, p.length)
    add(OggSynth.page(2, 0, serial, 0, ident))
    add(OggSynth.page(0, 0, serial, 1, commentPacket()))
    add(OggSynth.page(0, 0, serial, 2, setup))
    var f = 0
    var granule = 0L
    while (f < nF) {
      val longBlock = f % 2 == 1
      // true lapped-output accounting: frame f emits
      // (N(f-1) + N(f)) / 4 samples against its predecessor
      if (f > 0) {
        val prevBs = if ((f - 1) % 2 == 1) 256 else 128
        val curBs = if (longBlock) 256 else 128
        granule += (prevBs + curBs) / 4
      }
      val aw = new BitW
      aw.put(0, 1)
      aw.put(if (longBlock) 1 else 0, 1) // mode number (ilog(1) = 1 bit)
      if (longBlock) { aw.put(0, 1); aw.put(0, 1) } // short prev/next
      if (silent(doc)) aw.put(0, 1)
      else {
        aw.put(1, 1); aw.put(255, 8); aw.put(255, 8)
        val parts = if (longBlock) 16 else 8
        var p = 0
        while (p < parts) {
          val temp = partClass(doc, p) * 2 + partClass(doc, p + 1)
          aw.code(temp, 2)
          var pi = 0
          while (pi < 2 && p + pi < parts) {
            if (partClass(doc, p + pi) == 0) {
              var k = 0
              while (k < 2) { aw.code(vqEntry(doc, f, p + pi, k), 3); k += 1 }
            }
            pi += 1
          }
          p += 2
        }
      }
      add(OggSynth.page(if (f == nF - 1) 4 else 0, granule, serial, 3 + f,
        aw.bytes))
      f += 1
    }
    out.toByteArray
  }

  /** Test-harness variant: the adversarial allocation-amplification
    * shape the MaxTotalSamples gate exists for — `nPackets` ONE-byte
    * audio packets against an 8-channel, 8192-sample-block ident.
    * Each ~1-byte packet EOPs inside floor decode (a spec non-error
    * rendering the frame silent) yet claims 4096×8 output slots, so a
    * few-KB stream demands ~0.5 GB without the gate. Granules are
    * written truthfully so the trim path stays inert.
    */
  private[graftnative] def amplificationStreamBytes(nPackets: Int): Array[Byte] = {
    val w = new BitW
    header(w, 1)
    w.put(0, 32) // version
    w.put(8, 8) // channels
    w.put(44100, 32)
    w.put(0, 32); w.put(0, 32); w.put(0, 32)
    w.put(0xDD, 8) // blocksizes 8192/8192
    w.put(1, 1)
    val serial = 79
    val out = new java.io.ByteArrayOutputStream()
    def add(p: Array[Byte]): Unit = out.write(p, 0, p.length)
    add(OggSynth.page(2, 0, serial, 0, w.bytes))
    add(OggSynth.page(0, 0, serial, 1, commentPacket()))
    add(OggSynth.page(0, 0, serial, 2, setupPacket(8)))
    var f = 0
    while (f < nPackets) {
      add(OggSynth.page(if (f == nPackets - 1) 4 else 0, f.toLong * 4096,
        serial, 3 + f, Array[Byte](0)))
      f += 1
    }
    out.toByteArray
  }
}

/** Unary expression surfacing [[VorbisCodec.compute]]. */
case class VorbisDecodeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = VorbisCodec.schema

  override def nullSafeEval(v: Any): Any =
    VorbisCodec.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.VorbisCodec.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Expression wrapping [[VorbisSynth.oggVorbisBytes]]. */
case class SynthOggVorbis(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    VorbisSynth.oggVorbisBytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.VorbisSynth.oggVorbisBytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VorbisFunctions {
  /** Column API: full Ogg Vorbis PCM decode. */
  def vorbis_decode(payload: Column): Column =
    ExpressionUtils.column(VorbisDecodeExpr(ExpressionUtils.expression(payload)))

  /** Column API: formula-spectrum Ogg Vorbis fixture from a doc seed. */
  def synth_ogg_vorbis(doc: Column): Column =
    ExpressionUtils.column(SynthOggVorbis(ExpressionUtils.expression(doc)))
}
