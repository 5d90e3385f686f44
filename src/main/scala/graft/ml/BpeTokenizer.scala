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
  * and each iteration is one flatMap + one aggregate over that compact
  * frame with a single-row argmax collect. Encoding likewise never
  * re-runs merges over raw text: every distinct word's final segmentation
  * is computed ONCE (`segmentWords`), and documents pick up token counts
  * by joining their exploded words against that dictionary.
  *
  * Determinism: pair selection breaks frequency ties by (left, right)
  * lexicographic order, and merge application is greedy left-to-right —
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

  /** Train up to `nMerges` merges over a (word, freq) table. Each
    * iteration: adjacent-pair counts weighted by word frequency (one
    * aggregate on the compact word frame), deterministic argmax
    * (freq DESC, left ASC, right ASC — a bounded TakeOrdered, never a
    * global sort), then a per-row rewrite of the affected words. The
    * driver sees ONE row per iteration; each rewrite is eagerly
    * LOCAL-CHECKPOINTED so the logical plan is truncated every round —
    * without that the nested map lineage grows until plan
    * analysis/rendering dominates (the same flat-lineage rule the
    * connected-components loop follows with its durable checkpoints).
    * Stops early when no adjacent pair remains (fully merged corpus).
    */
  def train(spark: SparkSession, wf: DataFrame, nMerges: Int): Seq[Merge] = {
    import spark.implicits._
    var words: Dataset[(Seq[String], Long)] = wf
      .select(col("word"), col("freq")).as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString): Seq[String], f) }
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 0
    var done = false
    try {
      while (rank < nMerges && !done) {
        val best = words
          .flatMap { case (syms, f) =>
            syms.sliding(2).collect { case Seq(a, b) => ((a, b), f) }
          }
          .toDF("pair", "f")
          .groupBy(col("pair")).agg(sum(col("f")).as("freq"))
          .orderBy(col("freq").desc, col("pair._1"), col("pair._2"))
          .limit(1).collect()
        if (best.isEmpty) done = true
        else {
          val row = best.head
          val p = row.getStruct(0)
          val (l, r) = (p.getString(0), p.getString(1))
          merges += Merge(rank, l, r, row.getLong(1))
          val next = words.map { case (syms, f) => (applyMerge(syms, l, r), f) }
            .localCheckpoint(true)
          words.unpersist()
          words = next
          rank += 1
        }
      }
    } finally { words.unpersist(); () }
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
