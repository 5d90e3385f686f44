package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k distinct-hash sketch — the KMV distinct-count estimator
  * (Bar-Yossef et al., RANDOM 2002; Beyer et al., SIGMOD 2007).
  *
  * State is the k smallest DISTINCT values seen, kept as a sorted
  * primitive array: ≤ k longs per partial aggregate, so each map task
  * ships at most k values per group and the shuffle carries O(groups·k)
  * rows where exact DISTINCT would exchange the full vocabulary. The
  * estimator downstream is `(k-1) / U_(k)` with `U_(k)` the k-th smallest
  * hash normalized to (0,1); when fewer than k distinct values exist the
  * sketch is exhaustive and the count exact.
  *
  * Unlike HLL++ (engine-private hash seeding and bias tables), the
  * bottom-k set is a pure order-independent function of the input hashes,
  * so any engine that computes the same hashes derives the identical
  * estimate — this is the sketch a DuckDB oracle CAN mirror, which is why
  * the `corpus_stats_kmv` key hash-checks where `corpus_stats_approx`
  * (built-in HLL/GK) stays rows-only.
  *
  * Inserts allocate a fresh array (O(k) copy), but once the buffer holds
  * k values only hashes below the current k-th minimum insert — expected
  * O(k·(1+log(n/k))) total insertions per partition, so the steady-state
  * per-row cost is one binary search.
  */
class BottomKDistinctAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(b: Array[Long], x: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(b, x)
    if (i >= 0) b // already tracked — distinctness is the point
    else {
      val ins = -i - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = x
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) { // below the current k-th min: the max falls out
        val out = new Array[Long](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = x
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      } else b
    }
  }

  /** Single-pass sorted-merge of two sketches: both inputs are sorted
    * distinct arrays, so one linear walk emits the k smallest of their
    * union — O(k) per merge where folding [[reduce]] over one side is
    * O(k²) in array copies. Merges run once per (group, partition) pair
    * at shuffle-combine time, so on wide corpora this is the hot half of
    * the aggregate.
    */
  def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.isEmpty) return b1
    if (b1.isEmpty) return b2
    val out = new Array[Long](math.min(k, b1.length + b2.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < b1.length || j < b2.length)) {
      val takeLeft = j >= b2.length || (i < b1.length && b1(i) <= b2(j))
      val v = if (takeLeft) b1(i) else b2(j)
      if (takeLeft) i += 1 else j += 1
      if (i < b1.length && b1(i) == v) i += 1 // equal heads: consume both
      if (j < b2.length && b2(j) == v) j += 1
      out(o) = v
      o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  def finish(b: Array[Long]): Seq[Long] = b.toSeq

  def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
