package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended defaults. Local mode for
  * tests/bench; the same knobs transfer to cluster submissions (where
  * shuffle.partitions should track total cores and AQE coalesces the rest).
  */
object GraftSession {

  /** Optimizer rules excluded in every engine session.
    *
    * `InferFiltersFromGenerate` synthesizes `size(g) > 0 AND
    * isnotnull(g)` below each explode. For a generator over a scanned
    * column that can prune I/O; every generator in this engine is a
    * COMPUTED expression (decode codecs, shingle builders), so the
    * inferred filter re-evaluates the full expression once in the
    * filter and again in the projection — measured as a full duplicate
    * decode pass on wiki_dump_bz2 and the minhash shingle stage, and it
    * prunes nothing (exploding an empty array already emits no rows).
    * Excluding the rule halves every decode-then-explode lane at any
    * scale (optimization guide §4.4: stop the optimizer duplicating
    * expensive expressions).
    */
  val ExcludedRules =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  def builder(cores: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.optimizer.excludedRules", ExcludedRules)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE: runtime partition coalescing + skew-join splitting — the
      // default-on safety net for the skewed-symbol case at scale
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // columnar parquet + pushdown are defaults; pinned here as contract
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
