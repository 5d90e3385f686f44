package graft

import org.apache.spark.sql.functions._

import graft.ml.BpeTokenizer
import graft.ml.BpeTokenizer.Merge

/** Executable-spec pins for the BPE tokenizer: the distributed trainer
  * must reproduce a plain single-node reference implementation exactly
  * (same tie-breaking, same greedy rewrite), and the corpus-side token
  * counts must equal re-encoding every document with the learned table.
  */
class BpeSpec extends SparkSpec {

  /** Reference BPE: the textbook in-memory implementation — word-freq
    * map, weighted adjacent-pair counts, argmax by (freq DESC, left ASC,
    * right ASC), greedy left-to-right rewrite. Symbol ties break in
    * UNSIGNED UTF-8 BYTE order — the order Spark's UTF8String comparison
    * (and hence the distributed trainer's orderBy) uses. Java String
    * compareTo (UTF-16 code-unit order) DISAGREES with it when
    * supplementary-plane characters mix with U+E000..U+FFFF, so the
    * reference must compare the encoded bytes, not the String values.
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

  private def referenceTrain(words: Map[String, Long], nMerges: Int): Seq[Merge] = {
    var table: Map[Seq[String], Long] =
      words.groupBy(_._1.map(_.toString): Seq[String])
        .map { case (k, vs) => k -> vs.values.sum }
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      table.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.toSeq.reduceLeft { (p, q) =>
          val ((pl, pr), pc) = p
          val ((ql, qr), qc) = q
          val qWins = qc > pc ||
            (qc == pc && (utf8Lt(ql, pl) ||
              (ql == pl && utf8Lt(qr, pr))))
          if (qWins) q else p
        }
        out += Merge(rank, l, r, f)
        table = table.groupBy { case (syms, _) => BpeTokenizer.applyMerge(syms, l, r) }
          .map { case (k, vs) => k -> vs.values.sum }
        rank += 1
      }
    }
    out.toSeq
  }

  test("crafted corpus: merge order and frequencies are the hand-computed ones") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab ab"), (2L, "abc")).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(spark, BpeTokenizer.wordFreq(docs), 8)
    // words: ab×3, abc×1 → pair (a,b) freq 4 merges first; then (ab,c) freq 1
    assert(merges == Seq(Merge(0, "a", "b", 4L), Merge(1, "ab", "c", 1L)))
    // the distributed path must produce the identical table (the default
    // call short-circuits to the driver-side trainer at this vocab size)
    val dist = BpeTokenizer.train(spark, BpeTokenizer.wordFreq(docs), 8,
      localVocabLimit = 0)
    assert(dist == merges)
    assert(BpeTokenizer.segment("abc", merges) == Seq("abc"))
    assert(BpeTokenizer.segment("abab", merges) == Seq("ab", "ab"))
    assert(BpeTokenizer.segment("ba", merges) == Seq("b", "a"))
  }

  test("distributed trainer reproduces the reference implementation on the sf0.001 corpus") {
    val docs = Tables.documents(spark, sf0001)
    val wf = BpeTokenizer.wordFreq(docs)
    val wordsMap = wf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // force the DISTRIBUTED batched path (the default call would take
    // the small-vocab driver short-circuit on this corpus)
    val got = BpeTokenizer.train(spark, wf, 32, localVocabLimit = 0)
    val want = referenceTrain(wordsMap, 32)
    assert(got == want, s"merge tables diverge:\n got=$got\nwant=$want")
    assert(got.nonEmpty)
    // and the driver short-circuit produces the identical table
    assert(BpeTokenizer.train(spark, wf, 32) == want)
    // frequencies must be non-increasing is NOT guaranteed by BPE (a
    // merge can create a new frequent pair) — but every recorded
    // frequency is positive and ranks are dense
    assert(got.map(_.rank) == got.indices)
    assert(got.forall(_.freq > 0))
    // the batched trainer must have admitted more than one merge per
    // driver round on this corpus — the whole point of the batching
    val rounds = spark.sparkContext
      .getLocalProperty("graft.bpe.lastRounds").toInt
    info(s"32 merges in $rounds driver rounds")
    assert(rounds < 32, "batching admitted nothing — one job per merge again")
  }

  test("batched trainer stays exact on an interference-heavy corpus") {
    import spark.implicits._
    // crafted so NAIVE batching diverges: merging the top pair (t,h)
    // creates ("th","e") with weight 60 — higher than the pre-round
    // runner-up (i,n) at 50 — so an exact trainer must CUT the batch and
    // recount instead of admitting (i,n) second; plus symbol-sharing
    // candidates ((h,e) shares with (t,h)) and a self-pair (aa).
    val docs = Seq(
      (1L, Seq.fill(60)("the").mkString(" ")),
      (2L, Seq.fill(50)("in").mkString(" ")),
      (3L, Seq.fill(40)("he").mkString(" ")),
      (4L, Seq.fill(30)("aaa").mkString(" ")),
      (5L, Seq.fill(20)("there in aaaa").mkString(" "))
    ).toDF("doc_id", "text")
    val wf = BpeTokenizer.wordFreq(docs)
    val wordsMap = wf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (n <- Seq(1, 2, 3, 5, 8, 12)) {
      val got = BpeTokenizer.train(spark, wf, n, localVocabLimit = 0)
      val want = referenceTrain(wordsMap, n)
      assert(got == want, s"nMerges=$n diverges:\n got=$got\nwant=$want")
      assert(BpeTokenizer.train(spark, wf, n) == want, s"driver path, n=$n")
    }
  }

  test("bpe_token_count equals re-encoding every document with the learned table") {
    val merges = BpeTokenizer.mergesFor(spark, sf0001, 32)
    val got = Queries.all("bpe_token_count").fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      (id, ws.length.toLong,
        ws.map(w => BpeTokenizer.segment(w, merges).length.toLong).sum)
    }.sortBy(_._1).toSeq
    assert(got == want)
    // sanity: BPE compresses — token count strictly between word and char counts
    got.zip(want).foreach { case ((_, nw, nb), _) => assert(nb >= nw) }
  }
}
