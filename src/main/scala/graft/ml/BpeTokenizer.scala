package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application, Spark-first
  * (Sennrich et al. 2016, the algorithm behind GPT-2/LLaMA-family
  * tokenizers).
  *
  * The scale insight the whole design leans on: BPE pre-tokenizes at word
  * boundaries, so training NEVER touches the corpus again after one
  * word-frequency aggregation — the merge loop runs on the DISTINCT-WORD
  * table (Zipf: millions of rows at 100 TB, each a short symbol array),
  * and each ROUND is one flatMap + one aggregate over that compact
  * frame plus a bounded top-K collect from which a provably-sequential
  * PREFIX of merges is admitted at once (see [[train]] — exactness
  * argument in its doc). Encoding likewise never
  * re-runs merges over raw text: every distinct word's final segmentation
  * is computed ONCE (`segmentWords`), and documents pick up token counts
  * by joining their exploded words against that dictionary.
  *
  * Determinism: pair selection breaks frequency ties by (left, right)
  * lexicographic order — in UNSIGNED UTF-8 BYTE order, the order Spark's
  * UTF8String comparison natively uses (Java String UTF-16 code-unit
  * order disagrees for supplementary-plane mixes; the reference
  * implementation in BpeSpec compares encoded bytes to match) — and
  * merge application is greedy left-to-right —
  * both stated below and pinned against a plain-Scala reference
  * implementation in BpeSpec (the executable-spec pin, as CharEntropyStats).
  */
object BpeTokenizer {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** The classic BPE pre-tokenization: corpus → distinct-word frequency
    * table. The ONE pass over raw text in the whole training story.
    */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right application of one merge to a symbol array —
    * non-overlapping, exactly as reference BPE implementations rewrite.
    */
  def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Train up to `nMerges` merges over a (word, freq) table. Each ROUND:
    * adjacent-pair counts weighted by word frequency (one aggregate on
    * the compact word frame), a bounded TakeOrdered of the top `batchK`
    * pairs by the deterministic order (freq DESC, left ASC, right ASC —
    * ties in UTF-8 byte order, which is what Spark's string comparison
    * uses), then ONE per-row rewrite applying the whole admitted batch.
    * Each rewrite is eagerly LOCAL-CHECKPOINTED so the logical plan is
    * truncated every round (the flat-lineage rule the
    * connected-components loop also follows). Stops early when no
    * adjacent pair remains.
    *
    * BATCHED-YET-EXACT: the admitted batch is always a PREFIX of the
    * sequential merge sequence — the scan over the ranked candidates
    * stops at the first candidate it cannot PROVE sequential. Candidate
    * t is provably the next sequential merge given already-admitted
    * merges S when both hold:
    *
    *  1. Count invariance: for every s ∈ S, `r_t ≠ l_s` and `l_t ≠ r_s`
    *     (merging `l_s r_s` destroys an occurrence of t only by
    *     consuming t's left token as s's right half, or t's right token
    *     as s's left half) and neither side of t equals the created
    *     token `l_s+r_s` (the only way a merge CREATES occurrences).
    *     Then count(t) after applying S equals its pre-round count.
    *  2. Dominance: count(t) strictly exceeds every pair S could have
    *     created or boosted. A pair created by s is bounded by
    *     U_s = min(freq_s, max over pre-round counts of pairs ending in
    *     l_s / starting with r_s) (each created occurrence `x l_s r_s`
    *     contains both a merged occurrence and a pre-existing
    *     `(x, l_s)`); a PRE-EXISTING pair can grow only if it touches
    *     some created token, so its post count is ≤ maxBase + ΣU where
    *     maxBase is the largest pre-round count touching any created
    *     token (0 when none exists and the candidate table was
    *     collected in full). Strict `>` means no interloper can win
    *     even on tie-break.
    *
    * Everything admitted is therefore EXACTLY what one-merge-per-round
    * training would produce, with identical recorded frequencies —
    * pinned against the plain sequential reference in BpeSpec — while
    * the driver round-trips drop by the average batch width (the
    * one-job-per-merge pattern was the scale bottleneck: a production
    * vocab is thousands of sequential Spark jobs).
    */
  def train(spark: SparkSession, wf: DataFrame, nMerges: Int,
      batchK: Int = 8192, localVocabLimit: Long = 1L << 16): Seq[Merge] = {
    import spark.implicits._
    val typed = wf
      .select(col("word"), col("freq")).as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString): Seq[String], f) }
      .localCheckpoint(true)
    val nWords = typed.count()
    // small-vocab short-circuit (the broadcast-join instinct applied to
    // training): after Zipf pre-tokenization the DISTINCT-WORD table is
    // often tiny even for a large corpus — when it fits comfortably on
    // the driver, running the textbook sequential loop there is exact by
    // construction and replaces hundreds of per-round Spark jobs with
    // in-memory arithmetic. Identical semantics to the distributed loop
    // (same UTF-8-byte tie-breaks, same greedy rewrite), pinned against
    // each other in BpeSpec, which forces localVocabLimit = 0 to
    // exercise the distributed path on the same corpora.
    if (nWords <= localVocabLimit)
      return trainLocal(typed.collect(), nMerges)
    // size the word frame by VOCABULARY, not by the corpus-derived
    // partition count it arrives with: the merge loop runs dozens to
    // thousands of rounds over this one frame, so per-round task
    // overhead scales with its partition count. ~64k distinct words per
    // partition keeps a Zipf-scale production vocab (tens of millions of
    // rows at 100 TB) properly parallel while a fixture-scale vocab runs
    // single-partition rounds instead of scheduling empty tasks.
    val parts = math.min(spark.sparkContext.defaultParallelism,
      (nWords / 65536 + 1).toInt)
    var words: Dataset[(Seq[String], Long)] =
      if (parts < typed.rdd.getNumPartitions)
        typed.repartition(parts).localCheckpoint(true)
      else typed
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var done = false
    var rounds = 0
    try {
      while (merges.size < nMerges && !done) {
        val top = words
          .flatMap { case (syms, f) =>
            syms.sliding(2).collect { case Seq(a, b) => ((a, b), f) }
          }
          .toDF("pair", "f")
          .groupBy(col("pair")).agg(sum(col("f")).as("freq"))
          .orderBy(col("freq").desc, col("pair._1"), col("pair._2"))
          .limit(batchK)
          .select(col("pair._1"), col("pair._2"), col("freq"))
          .as[(String, String, Long)].collect()
        if (top.isEmpty) done = true
        else {
          rounds += 1
          // any pair NOT in the collected top-batchK has count ≤ floor
          val floor = if (top.length < batchK) 0L else top.last._3
          def sideMax(pred: ((String, String, Long)) => Boolean): Long = {
            var m = floor
            var i = 0
            while (i < top.length) {
              if (pred(top(i))) m = math.max(m, top(i)._3)
              i += 1
            }
            m
          }
          val selected = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
          var maxU = 0L
          var sumU = 0L
          var maxBase = 0L
          var stop = false
          var i = 0
          while (!stop && i < top.length &&
              merges.size + selected.size < nMerges) {
            val (l, r, f) = top(i)
            val clash = selected.exists { case (sl, sr, _) =>
              r == sl || l == sr || l == sl + sr || r == sl + sr
            }
            val interloperBound =
              if (maxBase == 0L) maxU else math.max(maxU, maxBase + sumU)
            if (!clash && (selected.isEmpty || f > interloperBound)) {
              selected += ((l, r, f))
              val u = math.min(f,
                math.max(sideMax(p => p._2 == l), sideMax(p => p._1 == r)))
              maxU = math.max(maxU, u)
              sumU += u
              maxBase = math.max(maxBase,
                sideMax(p => p._1 == l + r || p._2 == l + r))
              i += 1
            } else stop = true
          }
          // the first candidate of a round is always admitted, so the
          // loop always progresses
          selected.foreach { case (l, r, f) =>
            merges += Merge(merges.size, l, r, f)
          }
          val batch = selected.toList
          val next = words.map { case (syms, fq) =>
            var s = syms
            batch.foreach { case (l, r, _) => s = applyMerge(s, l, r) }
            (s, fq)
          }.localCheckpoint(true)
          words.unpersist()
          words = next
        }
      }
    } finally { words.unpersist(); () }
    if (merges.nonEmpty)
      spark.sparkContext.setLocalProperty("graft.bpe.lastRounds", rounds.toString)
    merges.toSeq
  }

  /** Unsigned UTF-8 byte comparison — the order Spark's UTF8String
    * comparisons use. Both trainer paths must break ties identically, so
    * the driver-side path compares encoded bytes, never Java Strings
    * (UTF-16 code-unit order disagrees on supplementary-plane mixes).
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Driver-side sequential trainer for vocabularies small enough to
    * collect — the textbook loop: full pair recount, argmax by
    * (freq DESC, left UTF-8 ASC, right UTF-8 ASC), greedy rewrite of
    * every word. Kept deliberately simple (recount per merge) because
    * the short-circuit only fires for small word tables.
    */
  private def trainLocal(collected: Array[(Seq[String], Long)],
      nMerges: Int): Seq[Merge] = {
    var words = collected.map { case (syms, f) => (syms, f) }
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var done = false
    while (merges.size < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.reduceLeft { (p, q) =>
          val ((pl, pr), pc) = p
          val ((ql, qr), qc) = q
          val qWins = qc > pc ||
            (qc == pc && (utf8Lt(ql, pl) || (ql == pl && utf8Lt(qr, pr))))
          if (qWins) q else p
        }
        merges += Merge(merges.size, l, r, f)
        words = words.map { case (syms, fq) =>
          (if (syms.length > 1) applyMerge(syms, l, r) else syms, fq)
        }
      }
    }
    merges.toSeq
  }

  /** Segment one word under a trained merge list: start from characters,
    * apply every merge in RANK order (rank = merge priority, exactly how
    * BPE encoders replay the learned table).
    */
  def segment(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    merges.foreach { m =>
      if (syms.length > 1) syms = applyMerge(syms, m.left, m.right)
    }
    syms
  }

  /** Final segmentation dictionary: every distinct word → its token
    * array + count. Computed once; the corpus-side encode is a join
    * against this frame (broadcast at fixture scale, shuffle-hash when
    * the vocabulary outgrows the broadcast threshold — AQE's call).
    */
  def segmentWords(spark: SparkSession, wf: DataFrame, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val ms = merges // stable closure capture (small: nMerges rows)
    wf.select(col("word")).as[String]
      .map { w =>
        val s = segment(w, ms)
        (w, s, s.length.toLong)
      }
      .toDF("word", "bpe_tokens", "n_bpe")
  }

  /** Trained merges for `dir`'s documents corpus, memoized per (corpus
    * stamp, nMerges) — the offline-artifact stance of the ANN codebooks.
    */
  def mergesFor(spark: SparkSession, dir: String, nMerges: Int): Seq[Merge] =
    graft.ArtifactMemo.cached(
      s"bpe#${graft.ArtifactMemo.stamp(dir, "documents.parquet")}#$nMerges") {
      train(spark, wordFreq(graft.Tables.documents(spark, dir)), nMerges)
    }
}
