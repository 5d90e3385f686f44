package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** bzip2 decompression from the bytes up — Wikipedia dumps (and many
  * older corpus snapshots) ship as `.bz2`, and the JDK has no codec
  * for it. The full pipeline per block (the format as fixed by the
  * reference implementation, publicly documented):
  *
  *  - `BZh1`–`BZh9` stream header; 48-bit block magics
  *    (compressed π / sqrt-π); MSB-first bit packing throughout;
  *  - per block: CRC, the deprecated `randomized` flag (rejected as
  *    the reference does for modern files), `origPtr`, the two-level
  *    symbol used-map, 2–6 delta-coded Huffman tables with the
  *    canonical limit/base/perm decode, selectors (MTF-coded,
  *    switching tables every 50 symbols);
  *  - RUNA/RUNB bijective base-2 zero runs → MTF decode → inverse
  *    BWT (counting-sort link walk from origPtr) → RLE1 → bytes,
  *    with the block CRC verified over the OUTPUT (CRC-32/BZIP2:
  *    MSB-first 0x04C11DB7, check value 0xFC891918 — pinned in the
  *    spec suite against that public constant);
  *  - the stream-combined CRC verified at the footer; concatenated
  *    streams (bzip2's legal append shape) decode through.
  *
  * Honest rejects: bad magics, the randomized flag, invalid Huffman
  * lengths, origPtr out of range, CRC mismatches, truncation, and an
  * output cap against decompression bombs. Null on any reject.
  */
case class Bzip2Text(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val out = Bzip2Codec.decompress(v.asInstanceOf[Array[Byte]])
    if (out == null) null else UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      byte[] r = org.apache.spark.sql.graftnative.Bzip2Codec.decompress($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes(r); }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Bzip2Codec {
  private val MaxOut = 1 << 24
  private val MaxAlpha = 258
  private val GroupSize = 50

  // ---------------------------------------------- CRC-32/BZIP2
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04C11DB7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private[graftnative] def crcInit: Int = 0xFFFFFFFF
  private[graftnative] def crcUpdate(crc: Int, b: Int): Int =
    (crc << 8) ^ CrcTable(((crc >>> 24) ^ b) & 0xFF)
  private[graftnative] def crcFinish(crc: Int): Int = ~crc

  private[graftnative] def crcOf(data: Array[Byte]): Int = {
    var c = crcInit
    var i = 0
    while (i < data.length) { c = crcUpdate(c, data(i) & 0xFF); i += 1 }
    crcFinish(c)
  }

  // ---------------------------------------------- bit reader (MSB)
  private final class Reader(val b: Array[Byte]) {
    var pos = 0L // bit position
    def read(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val byteAt = (pos >>> 3).toInt
        if (byteAt >= b.length) throw Eof
        val bit = (b(byteAt) >>> (7 - (pos & 7)).toInt) & 1
        v = (v << 1) | bit
        pos += 1
        k += 1
      }
      v
    }
    def read48(): Long = (read(24).toLong << 24) | (read(24).toLong & 0xFFFFFF)
    def alignByte(): Unit = pos = (pos + 7) & ~7L
    def exhausted: Boolean = (pos >>> 3) >= b.length
  }
  private object Eof extends RuntimeException("bz2 eof", null, false, false)

  private val BlockMagic = 0x314159265359L
  private val FooterMagic = 0x177245385090L

  /** Full decode; null on any reject. */
  def decompress(in: Array[Byte]): Array[Byte] = {
    try {
      val out = new java.io.ByteArrayOutputStream()
      val r = new Reader(in)
      var more = true
      while (more) {
        // stream header (byte-aligned)
        if (r.read(8) != 'B' || r.read(8) != 'Z' || r.read(8) != 'h')
          return null
        val level = r.read(8) - '0'
        if (level < 1 || level > 9) return null
        val maxBlock = level * 100000
        var streamCrc = 0
        var inStream = true
        while (inStream) {
          val magic = r.read48()
          if (magic == FooterMagic) {
            val footerCrc = r.read(32)
            if (footerCrc != streamCrc) return null
            inStream = false
          } else if (magic == BlockMagic) {
            val blockCrc = r.read(32)
            if (r.read(1) != 0) return null // randomized: deprecated, reject
            val origPtr = r.read(24)
            // symbol map
            val used16 = r.read(16)
            val inUse = new Array[Boolean](256)
            var nUse = 0
            var i = 0
            while (i < 16) {
              if ((used16 & (0x8000 >>> i)) != 0) {
                val m = r.read(16)
                var j = 0
                while (j < 16) {
                  if ((m & (0x8000 >>> j)) != 0) {
                    inUse(16 * i + j) = true
                    nUse += 1
                  }
                  j += 1
                }
              }
              i += 1
            }
            if (nUse == 0) return null
            val seqToUnseq = new Array[Int](nUse)
            var u = 0
            i = 0
            while (i < 256) {
              if (inUse(i)) { seqToUnseq(u) = i; u += 1 }
              i += 1
            }
            val alphaSize = nUse + 2
            val nGroups = r.read(3)
            if (nGroups < 2 || nGroups > 6) return null
            val nSelectors = r.read(15)
            if (nSelectors < 1) return null
            // selectors, MTF-coded
            val selectorMtf = new Array[Int](nSelectors)
            i = 0
            while (i < nSelectors) {
              var j = 0
              while (r.read(1) == 1) {
                j += 1
                if (j >= nGroups) return null
              }
              selectorMtf(i) = j
              i += 1
            }
            val pos = Array.tabulate(nGroups)(identity)
            val selectors = new Array[Int](nSelectors)
            i = 0
            while (i < nSelectors) {
              val j = selectorMtf(i)
              val v = pos(j)
              var k = j
              while (k > 0) { pos(k) = pos(k - 1); k -= 1 }
              pos(0) = v
              selectors(i) = v
              i += 1
            }
            // Huffman tables: delta-coded lengths
            val lens = Array.ofDim[Int](nGroups, alphaSize)
            var g = 0
            while (g < nGroups) {
              var cur = r.read(5)
              var s = 0
              while (s < alphaSize) {
                var moving = true
                while (moving) {
                  if (cur < 1 || cur > 20) return null
                  if (r.read(1) == 0) moving = false
                  else { if (r.read(1) == 0) cur += 1 else cur -= 1 }
                }
                lens(g)(s) = cur
                s += 1
              }
              g += 1
            }
            // canonical decode tables (limit/base/perm)
            val limit = Array.ofDim[Int](nGroups, 25)
            val base = Array.ofDim[Int](nGroups, 25)
            val perm = Array.ofDim[Int](nGroups, alphaSize)
            val minLens = new Array[Int](nGroups)
            g = 0
            while (g < nGroups) {
              var minLen = 32
              var maxLen = 0
              var s = 0
              while (s < alphaSize) {
                if (lens(g)(s) < minLen) minLen = lens(g)(s)
                if (lens(g)(s) > maxLen) maxLen = lens(g)(s)
                s += 1
              }
              minLens(g) = minLen
              // perm: symbols stably ordered by length
              var pp = 0
              var l = minLen
              while (l <= maxLen) {
                s = 0
                while (s < alphaSize) {
                  if (lens(g)(s) == l) { perm(g)(pp) = s; pp += 1 }
                  s += 1
                }
                l += 1
              }
              val cnt = new Array[Int](25)
              s = 0
              while (s < alphaSize) { cnt(lens(g)(s) + 1) += 1; s += 1 }
              var ii = 1
              while (ii < 25) { cnt(ii) += cnt(ii - 1); ii += 1 }
              var vec = 0
              l = minLen
              while (l <= maxLen) {
                vec += cnt(l + 1) - cnt(l)
                limit(g)(l) = vec - 1
                vec <<= 1
                l += 1
              }
              l = minLen + 1
              while (l <= maxLen) {
                base(g)(l) = ((limit(g)(l - 1) + 1) << 1) - cnt(l)
                l += 1
              }
              g += 1
            }
            // decode the MTF/RLE2 symbol stream into the BWT buffer.
            // Grown on demand (doubling, capped at maxBlock) instead of
            // allocated at the level-9 900 KB upfront: small blocks —
            // the common shard case — then cost KBs, not a fresh 900 KB
            // zeroed allocation per row (measured GC drag on the
            // per-row decode lanes).
            var bwt = new Array[Byte](math.min(maxBlock,
              math.max(4096, in.length * 8)))
            var nBwt = 0
            def ensureBwt(needed: Int): Unit = if (needed > bwt.length) {
              var cap = bwt.length
              while (cap < needed) cap = math.min(maxBlock, cap << 1)
              bwt = java.util.Arrays.copyOf(bwt, cap)
            }
            val unzftab = new Array[Int](256)
            val mtf = seqToUnseq.clone()
            var groupNo = -1
            var groupPos = 0
            var curG = 0
            def nextSym(): Int = {
              if (groupPos == 0) {
                groupNo += 1
                if (groupNo >= nSelectors) throw Eof
                groupPos = GroupSize
                curG = selectors(groupNo)
              }
              groupPos -= 1
              var l = minLens(curG)
              var v = r.read(l)
              while (l <= 23 && v > limit(curG)(l)) {
                l += 1
                v = (v << 1) | r.read(1)
              }
              if (l > 23) throw Eof
              val idx = v - base(curG)(l)
              if (idx < 0 || idx >= alphaSize) throw Eof
              perm(curG)(idx)
            }
            val eob = alphaSize - 1
            var sym = nextSym()
            var done = false
            while (!done) {
              if (sym == eob) done = true
              else if (sym <= 1) {
                // RUNA/RUNB zero run
                var run = 0
                var shift = 0
                while (sym <= 1) {
                  if (sym == 0) run += 1 << shift else run += 2 << shift
                  shift += 1
                  if (shift > 24) return null
                  sym = nextSym()
                }
                val b0 = mtf(0)
                if (nBwt + run > maxBlock) return null
                ensureBwt(nBwt + run)
                unzftab(b0) += run
                var k = 0
                while (k < run) { bwt(nBwt) = b0.toByte; nBwt += 1; k += 1 }
              } else {
                if (nBwt >= maxBlock) return null
                ensureBwt(nBwt + 1)
                // MTF decode symbol sym-1
                val j = sym - 1
                if (j >= nUse) return null
                val v = mtf(j)
                var k = j
                while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
                mtf(0) = v
                unzftab(v) += 1
                bwt(nBwt) = v.toByte
                nBwt += 1
                sym = nextSym()
              }
            }
            if (origPtr >= nBwt) return null
            // inverse BWT: counting-sort link walk
            val starts = new Array[Int](256)
            var tot = 0
            i = 0
            while (i < 256) { starts(i) = tot; tot += unzftab(i); i += 1 }
            val links = new Array[Int](nBwt)
            i = 0
            while (i < nBwt) {
              val b0 = bwt(i) & 0xFF
              links(starts(b0)) = i
              starts(b0) += 1
              i += 1
            }
            // RLE1 decode with CRC over the final bytes
            var crc = crcInit
            var p = links(origPtr)
            var emitted = 0
            var runByte = -1
            var runLen = 0
            var idx2 = 0
            while (idx2 < nBwt) {
              val b0 = bwt(p) & 0xFF
              p = links(p)
              idx2 += 1
              if (runLen == 4) {
                // b0 is the repeat COUNT for the preceding 4-run
                var k = 0
                while (k < b0) {
                  out.write(runByte)
                  crc = crcUpdate(crc, runByte)
                  emitted += 1
                  k += 1
                }
                if (out.size() > MaxOut) return null
                runLen = 0
                runByte = -1
              } else {
                if (b0 == runByte) runLen += 1
                else { runByte = b0; runLen = 1 }
                out.write(b0)
                crc = crcUpdate(crc, b0)
                emitted += 1
                if (out.size() > MaxOut) return null
              }
            }
            if (runLen == 4) return null // 4-run with its count torn off
            if (crcFinish(crc) != blockCrc) return null
            streamCrc = ((streamCrc << 1) | (streamCrc >>> 31)) ^ blockCrc
          } else return null
        }
        // concatenated streams resume at the next byte boundary
        r.alignByte()
        more = !r.exhausted
      }
      out.toByteArray
    } catch {
      case Eof => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  // ================================================== ENCODER (fixtures)

  private final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def write(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v.toLong & ((1L << n) - 1))
      nBits += n
      while (nBits >= 8) {
        out.write(((acc >>> (nBits - 8)) & 0xFF).toInt)
        nBits -= 8
      }
    }
    def write48(v: Long): Unit = {
      write(((v >>> 24) & 0xFFFFFF).toInt, 24)
      write((v & 0xFFFFFF).toInt, 24)
    }
    def flush(): Unit = if (nBits > 0) {
      out.write(((acc << (8 - nBits)) & 0xFF).toInt)
      nBits = 0
    }
  }

  /** Rotation order of all cyclic shifts of `a` (the BWT permutation),
    * by prefix doubling over packed primitive longs. Each pass sorts
    * keys `(rank(i) << 40) | (rank((i+k) mod n) << 20) | i`; two passes
    * double the compared prefix, so ⌈log₂ n⌉ sorts of a primitive
    * long[] replace the per-comparison byte walks of a rotation
    * comparator. Fits because blocks are < 2²⁰ bytes (blockMax 700000),
    * so rank and index each fit 20 bits. Ties (equal full rotations)
    * resolve ascending by index via the low bits — matching a stable
    * sort over ascending indices.
    */
  private def bwtRotationOrder(a: Array[Byte]): Array[Int] = {
    val n = a.length
    val sa = new Array[Int](n)
    if (n <= 1) { if (n == 1) sa(0) = 0; return sa }
    var rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = a(i) & 0xFF; i += 1 }
    val keys = new Array[Long](n)
    var k = 1
    var distinct = false
    var first = true
    // pass with shift k extends rank coverage to 2k chars; stop once
    // coverage ≥ n (k ≥ n entering the test) or ranks are all distinct
    while (first || (!distinct && k < n)) {
      first = false
      i = 0
      while (i < n) {
        val j = i + k
        val jj = if (j >= n) j - n else j
        keys(i) = (rank(i).toLong << 40) | (rank(jj).toLong << 20) | i.toLong
        i += 1
      }
      java.util.Arrays.sort(keys)
      val newRank = new Array[Int](n)
      var r = 0
      newRank((keys(0) & 0xFFFFF).toInt) = 0
      i = 1
      while (i < n) {
        if ((keys(i) >>> 20) != (keys(i - 1) >>> 20)) r += 1
        newRank((keys(i) & 0xFFFFF).toInt) = r
        i += 1
      }
      rank = newRank
      distinct = r == n - 1
      k <<= 1
    }
    i = 0
    while (i < n) { sa(i) = (keys(i) & 0xFFFFF).toInt; i += 1 }
    sa
  }

  /** Compress `data` as one-block-per-900k bzip2 (level 9). The
    * encoder favors LEGALITY over ratio: a complete two-length
    * canonical Huffman code shared by two groups. Exists for the
    * fixtures; the decode side is the product.
    */
  def compress(data: Array[Byte]): Array[Byte] = {
    val w = new Writer
    w.write('B', 8); w.write('Z', 8); w.write('h', 8); w.write('9', 8)
    var streamCrc = 0
    var off = 0
    val blockMax = 700000 // RLE1 can expand 1.25x; 875k stays under 900k
    if (data.isEmpty) {
      // an empty stream still carries the footer with combined CRC 0
      w.write48(FooterMagic)
      w.write(0, 32)
      w.flush()
      return w.out.toByteArray
    }
    while (off < data.length) {
      val chunk = java.util.Arrays.copyOfRange(data, off,
        math.min(data.length, off + blockMax))
      off += chunk.length
      val blockCrc = crcOf(chunk)
      streamCrc = ((streamCrc << 1) | (streamCrc >>> 31)) ^ blockCrc
      // RLE1
      val rle1 = {
        val o = new java.io.ByteArrayOutputStream()
        var i = 0
        while (i < chunk.length) {
          val b = chunk(i)
          var run = 1
          while (i + run < chunk.length && chunk(i + run) == b && run < 255)
            run += 1
          if (run >= 4) {
            o.write(b); o.write(b); o.write(b); o.write(b)
            o.write(math.min(run, 255) - 4)
            i += math.min(run, 255)
          } else {
            var k = 0
            while (k < run) { o.write(b); k += 1 }
            i += run
          }
        }
        o.toByteArray
      }
      // BWT via prefix-doubling rotation sort: O(n log² n) on primitive
      // long keys (rank₁ | rank₂ | index packed into one long, sorted with
      // Arrays.sort) — the boxed O(n²·log n) rotation-comparator this
      // replaces dominated the wiki_dump_bz2 lane (14.2 s → the fixture
      // encoder was 25× the decode). Equal rotations tie-break ascending
      // by index, which is exactly the order the stable boxed sort
      // produced, so the emitted bytes are bit-identical.
      val n = rle1.length
      val sa = bwtRotationOrder(rle1)
      var origPtr = -1
      val bwt = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val s = sa(i)
        if (s == 0) origPtr = i
        bwt(i) = rle1(if (s == 0) n - 1 else s - 1)
        i += 1
      }
      // MTF + RLE2
      val inUse = new Array[Boolean](256)
      i = 0
      while (i < n) { inUse(rle1(i) & 0xFF) = true; i += 1 }
      val seq = (0 until 256).filter(inUse(_)).toArray
      val nUse = seq.length
      val alphaSize = nUse + 2
      val eob = alphaSize - 1
      val mtf = seq.clone()
      val syms = new java.util.ArrayList[Integer]()
      var zeroRun = 0
      def flushRun(): Unit = {
        var m = zeroRun
        while (m > 0) {
          m -= 1
          syms.add(Integer.valueOf(if ((m & 1) == 0) 0 else 1))
          m >>= 1
        }
        zeroRun = 0
      }
      i = 0
      while (i < n) {
        val b = bwt(i) & 0xFF
        var j = 0
        while (mtf(j) != b) j += 1
        if (j == 0) zeroRun += 1
        else {
          flushRun()
          syms.add(Integer.valueOf(j + 1))
          var k = j
          while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
          mtf(0) = b
        }
        i += 1
      }
      flushRun()
      syms.add(Integer.valueOf(eob))
      // complete two-length canonical code over alphaSize symbols
      var bits = 1
      while ((1 << bits) < alphaSize) bits += 1
      val nShort = (1 << bits) - alphaSize // symbols at length bits-1
      val lens = new Array[Int](alphaSize)
      i = 0
      while (i < alphaSize) {
        lens(i) = if (i < nShort && bits > 1) bits - 1 else bits
        i += 1
      }
      // canonical codes in the bzip2 assignment order
      val codes = new Array[Int](alphaSize)
      var vec = 0
      var l = lens.min
      val maxLen = lens.max
      while (l <= maxLen) {
        i = 0
        while (i < alphaSize) {
          if (lens(i) == l) { codes(i) = vec; vec += 1 }
          i += 1
        }
        vec <<= 1
        l += 1
      }
      val nSelectors = (syms.size() + GroupSize - 1) / GroupSize
      // ---- emit the block
      w.write48(BlockMagic)
      w.write(blockCrc, 32)
      w.write(0, 1) // not randomized
      w.write(origPtr, 24)
      // used map
      var used16 = 0
      i = 0
      while (i < 16) {
        var j = 0
        var any = false
        while (j < 16) { if (inUse(16 * i + j)) any = true; j += 1 }
        if (any) used16 |= 0x8000 >>> i
        i += 1
      }
      w.write(used16, 16)
      i = 0
      while (i < 16) {
        if ((used16 & (0x8000 >>> i)) != 0) {
          var m = 0
          var j = 0
          while (j < 16) {
            if (inUse(16 * i + j)) m |= 0x8000 >>> j
            j += 1
          }
          w.write(m, 16)
        }
        i += 1
      }
      w.write(2, 3) // nGroups = 2 (the legal minimum)
      w.write(nSelectors, 15)
      i = 0
      while (i < nSelectors) { w.write(0, 1); i += 1 } // all group 0 (MTF 0)
      // two identical delta-coded tables
      var g = 0
      while (g < 2) {
        var cur = lens(0)
        w.write(cur, 5)
        i = 0
        while (i < alphaSize) {
          while (cur < lens(i)) { w.write(2, 2); cur += 1 } // 10 = increment
          while (cur > lens(i)) { w.write(3, 2); cur -= 1 } // 11 = decrement
          w.write(0, 1)
          i += 1
        }
        g += 1
      }
      // symbol stream
      i = 0
      while (i < syms.size()) {
        val s = syms.get(i).intValue()
        w.write(codes(s), lens(s))
        i += 1
      }
    }
    w.write48(FooterMagic)
    w.write(streamCrc, 32)
    w.flush()
    w.out.toByteArray
  }
}

/** Fixture for [[Bzip2Text]]: formula text with RLE1-triggering runs,
  * entity-ish punctuation, and enough byte variety to exercise the
  * symbol map; `doc mod 4 == 1` concatenates TWO streams (bzip2's
  * legal append shape).
  */
object Bzip2Synth {
  private def fm(a: Long, m: Long): Int = java.lang.Math.floorMod(a, m).toInt

  def text(doc: Long): String = {
    val sb = new StringBuilder()
    for (i <- 0 until 2 + fm(doc, 3)) {
      sb.append(s"line $i of shard $doc ")
      sb.append("a" * (3 + fm(doc + i, 6))) // RLE1 run
      sb.append(s" value=${fm(doc * 7 + i, 900)}\n")
    }
    sb.toString
  }

  def text2(doc: Long): String = s"appended tail ${fm(doc, 9)}\n"
  def hasSecondStream(doc: Long): Boolean = fm(doc, 4) == 1

  def expectedText(doc: Long): String =
    text(doc) + (if (hasSecondStream(doc)) text2(doc) else "")

  def bz2Bytes(doc: Long): Array[Byte] = {
    if (doc < 0) return null
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val a = Bzip2Codec.compress(text(doc).getBytes(utf8))
    if (!hasSecondStream(doc)) a
    else {
      val b = Bzip2Codec.compress(text2(doc).getBytes(utf8))
      val out = new Array[Byte](a.length + b.length)
      System.arraycopy(a, 0, out, 0, a.length)
      System.arraycopy(b, 0, out, a.length, b.length)
      out
    }
  }
}

/** Expression wrapping [[Bzip2Synth.bz2Bytes]]. */
case class SynthBzip2(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    Bzip2Synth.bz2Bytes(doc.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.Bzip2Synth.bz2Bytes($d);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bz2-compressed MediaWiki dump fixture (the literal enwiki shard
  * shape) — [[WikiSynth.dumpXml]] through [[Bzip2Codec.compress]].
  */
case class SynthWikiDumpBz2(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any): Any =
    Bzip2Codec.compress(WikiSynth.dumpXml(doc.asInstanceOf[Long])
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = org.apache.spark.sql.graftnative.Bzip2Codec.compress(
        org.apache.spark.sql.graftnative.WikiSynth.dumpXml($d)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8));
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Bzip2Functions {
  /** Column API: bzip2 decompression to UTF-8 text. */
  def bzip2_text(payload: Column): Column =
    ExpressionUtils.column(Bzip2Text(ExpressionUtils.expression(payload)))

  /** Column API: bzip2 fixture from a doc seed. */
  def synth_bzip2(doc: Column): Column =
    ExpressionUtils.column(SynthBzip2(ExpressionUtils.expression(doc)))

  /** Column API: bz2-compressed MediaWiki dump fixture. */
  def synth_wiki_dump_bz2(doc: Column): Column =
    ExpressionUtils.column(SynthWikiDumpBz2(ExpressionUtils.expression(doc)))
}
