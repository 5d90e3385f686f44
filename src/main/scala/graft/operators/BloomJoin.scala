package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftnative.BloomFilters

/** Bloom-filtered selective join — the explicit, composable form of
  * Catalyst's runtime bloom filter (`InjectRuntimeFilter`). Build a bloom
  * over the (selective) dim side's join keys, probe it on the fact scan
  * BEFORE the exchange, then run the real join to discard the false
  * positives. Exact by construction: no false negatives, and the join
  * removes the probes' false positives, so the composition equals the
  * plain join (the `bloom_join` oracle contract).
  *
  * 100 TB shape: the serialized filter (numBits/8 bytes ≈ 125 KB at the
  * defaults) is collected once on the driver — the bounded-artifact
  * stance of the ANN centroid collects — and re-broadcast to fact tasks
  * as a codegen'd literal; every probe miss is a fact row that never
  * enters the shuffle. Prefer the built-in injected filter when AQE can
  * see the join; state this form when the filter must cross a pipeline
  * boundary (e.g. the dim is resolved in one job, the fact scanned in a
  * later one).
  */
object BloomJoin {

  /** One partial-agg pass over the dim: serialized bloom of `key`.
    * ~10 bits/key ≈ 1% false-positive rate at `expectedItems` keys.
    */
  def keyBloom(dim: DataFrame, key: Column,
      expectedItems: Long = 100000L, numBits: Long = 1000000L): Array[Byte] =
    dim.select(BloomFilters.bloom_agg(key, expectedItems, numBits).as("bf"))
      .head.getAs[Array[Byte]](0)

  /** Fact-side pre-filter: keep rows whose key the bloom may contain. */
  def probeFilter(fact: DataFrame, key: Column, bloom: Array[Byte]): DataFrame =
    fact.filter(BloomFilters.bloom_might_contain(bloom, key))

  /** The full composition. The shuffle-hash hint states the big-big
    * shape this operator exists for — a dim too large to broadcast (were
    * broadcasting possible, the bloom pre-filter would be moot).
    */
  def bloomJoin(fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column,
      expectedItems: Long = 100000L, numBits: Long = 1000000L): DataFrame = {
    val bloom = keyBloom(dim, dimKey, expectedItems, numBits)
    probeFilter(fact, factKey, bloom)
      .join(dim.hint("shuffle_hash"), factKey === dimKey)
  }
}
