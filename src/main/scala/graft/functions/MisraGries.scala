package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter sketch as a typed `Aggregator` — the bounded-
  * memory candidate generator for frequency top-k at corpus scale.
  *
  * The exact top-k (`ngram_counts`) must shuffle and count EVERY distinct
  * n-gram — O(vocabulary) state spread over the cluster, with the salted
  * two-phase window absorbing the per-language skew. This sketch replaces
  * that full-vocabulary pass for the candidate-generation stage: each
  * partial aggregate keeps at most `capacity` counters (classic
  * Misra-Gries: increment a tracked key, open a counter while space
  * remains, otherwise decrement ALL counters by one and drop zeros), and
  * partials merge by summing counters then subtracting the (capacity+1)-th
  * largest value (Agarwal et al., "Mergeable Summaries", PODS 2012) —
  * associative, commutative up to the summary guarantee, constant size.
  *
  * Guarantee: a final counter undercounts its key's true frequency by at
  * most N/(capacity+1), so every key with true frequency above that bound
  * SURVIVES the sketch. With capacity ≫ k·(vocabulary skew), the true
  * top-k is contained in the ≤capacity survivors; an exact counting pass
  * over ONLY the surviving keys (a broadcast semi-join — the survivors are
  * tiny) then yields exact counts, so the final top-k ranking carries no
  * approximation at all when containment holds. The sketch VALUES are
  * bounds, not counts — consumers must re-count, which is why the query
  * key built on this runs the verify pass instead of trusting them.
  *
  * The buffer is a mutable HashMap serialized with Kryo only at partial-
  * aggregation boundaries (Spark's typed-imperative aggregate keeps the
  * live object in memory within a partition); `reduce` mutates in place.
  * The O(capacity) decrement sweep amortizes: each sweep pays for
  * `capacity` preceding increments.
  */
class MisraGriesAgg(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {

  def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def reduce(b: mutable.HashMap[String, Long], x: String): mutable.HashMap[String, Long] = {
    b.get(x) match {
      case Some(c) => b.update(x, c + 1L)
      case None if b.size < capacity => b.update(x, 1L)
      case None =>
        // decrement-all: every tracked counter pays one; zeros drop out
        val dead = mutable.ArrayBuffer.empty[String]
        b.mapValuesInPlace((_, v) => v - 1L)
        b.foreach { case (k, v) => if (v <= 0L) dead += k }
        dead.foreach(b.remove)
    }
    b
  }

  def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, v) => b1.update(k, b1.getOrElse(k, 0L) + v) }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all, drop ≤0 —
      // the mergeable-summaries compaction preserving the error bound
      val cut = b1.values.toArray.sortWith(_ > _).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace((_, v) => v - cut)
      b1.foreach { case (k, v) => if (v <= 0L) dead += k }
      dead.foreach(b1.remove)
    }
    b1
  }

  def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap

  def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
