package org.apache.spark.sql.graftnative

/** Load-from-file overrides for the three GENERATED data tables whose
  * published literals the build environment cannot fetch (zero
  * egress): the MP3 grade-B Huffman code assignments (tables 15 /
  * 16-23 / 24-31), the ISO 11172-3 Table 3-B.3 polyphase synthesis
  * window, and the Vorbis floor1 inverse-dB table. When the literals
  * arrive, the swap is a DATA DROP — no code change:
  *
  *  - point `-Dgraft.data.dir=<dir>` (or `GRAFT_DATA_DIR`) at a
  *    directory containing any of:
  *      `mp3_table15.tsv`, `mp3_table16.tsv`, `mp3_table24.tsv` —
  *        one `length code` pair per line (whitespace-separated
  *        decimal), 256 lines in row-major (x·16 + y) order;
  *      `mp3_synth_window.tsv` — 512 lines, one decimal double each
  *        (ISO Table 3-B.3 in coefficient order);
  *      `vorbis_inverse_db.tsv` — 256 lines, one double each.
  *  - absent files are silently skipped (partial drops are fine);
  *    MALFORMED files fail fast with a message naming the file —
  *    a half-loaded conformance table would be worse than none.
  *  - Huffman overrides are validated on load with the same joint
  *    constraint the grade-A transcriptions passed: code lengths must
  *    be Kraft-COMPLETE and the code values prefix-free.
  *
  * Each consumer re-checks its table at class initialization and
  * exposes a `private[graftnative]` install/reset pair so the swap is
  * also testable at runtime (DataOverridesSpec proves an injected
  * table changes decode output).
  */
object DataOverrides {

  def configuredDir: Option[String] =
    sys.props.get("graft.data.dir").orElse(sys.env.get("GRAFT_DATA_DIR"))
      .filter(_.nonEmpty)

  private def lines(dir: String, name: String): Option[Array[String]] = {
    val f = new java.io.File(dir, name + ".tsv")
    if (!f.isFile) return None
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try Some(src.getLines().map(_.trim).filter(_.nonEmpty).toArray)
    finally src.close()
  }

  /** A packed `(len << 20) | code` Huffman table from `name.tsv`,
    * validated Kraft-complete and prefix-free. None when the file is
    * absent; IllegalArgumentException when present but malformed.
    */
  def packedTable(dir: String, name: String, entries: Int): Option[Array[Int]] =
    lines(dir, name).map { ls =>
      require(ls.length == entries,
        s"$name.tsv: expected $entries lines, got ${ls.length}")
      val packed = ls.zipWithIndex.map { case (l, i) =>
        val parts = l.split("\\s+")
        require(parts.length == 2, s"$name.tsv line ${i + 1}: want 'len code'")
        val len = parts(0).toInt
        val code = java.lang.Long.parseLong(parts(1))
        require(len >= 1 && len <= 19, s"$name.tsv line ${i + 1}: len $len")
        require(code >= 0 && code < (1L << len),
          s"$name.tsv line ${i + 1}: code $code exceeds $len bits")
        (len << 20) | code.toInt
      }
      // joint validation (the transcription methodology's gate):
      // Kraft-complete AND prefix-free, checked as one interval-tiling
      // condition — code c of length l owns [c·2^(max−l), (c+1)·2^(max−l))
      // and a valid table tiles [0, 2^max) exactly
      val maxLen = packed.map(_ >>> 20).max
      val ivs = packed.map { p =>
        val len = p >>> 20
        val c = (p & 0xFFFFF).toLong
        (c << (maxLen - len), 1L << (maxLen - len))
      }.sortBy(_._1)
      var at = 0L
      ivs.foreach { case (start, width) =>
        require(start == at,
          s"$name.tsv: codes are not prefix-free/Kraft-complete (gap or overlap at $start)")
        at = start + width
      }
      require(at == (1L << maxLen),
        s"$name.tsv: lengths are not Kraft-complete")
      packed
    }

  /** A fixed-length double table from `name.tsv`. */
  def doubles(dir: String, name: String, entries: Int): Option[Array[Double]] =
    lines(dir, name).map { ls =>
      require(ls.length == entries,
        s"$name.tsv: expected $entries lines, got ${ls.length}")
      ls.map(_.toDouble)
    }
}
