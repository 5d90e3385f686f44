package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column-level API over Spark's runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the same pair
  * Catalyst's `InjectRuntimeFilter` wires into shuffle joins when
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` is on).
  *
  * graft states the pattern explicitly for the fact-side pre-filter of a
  * selective dim join: build the bloom over the dim keys (one partial-agg
  * pass, a few-hundred-KB serialized filter), then probe it on the fact
  * scan BEFORE the shuffle — every probe miss never enters the exchange.
  * False positives are removed by the join itself; there are no false
  * negatives, so `bloomJoin(fact, dim) ≡ join(fact, dim)` exactly — which
  * is what the `bloom_join` oracle asserts.
  *
  * Both expressions are Spark-native and codegen'd: the probe is one
  * xxhash64 + bit-test per row inside whole-stage codegen — no UDF, no
  * broadcast of the dim rows themselves.
  */
object BloomFilters {

  /** Aggregate column: serialized bloom filter over `xxhash64(key)`.
    * `numBits` sizes the filter (n·10 bits ≈ 1% fpp); both are literal
    * parameters exactly as in Catalyst's injected form.
    */
  def bloom_agg(key: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Predicate column: does the serialized bloom possibly contain
    * `xxhash64(key)`? Never false for an inserted key.
    */
  def bloom_might_contain(bloom: Array[Byte], key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
