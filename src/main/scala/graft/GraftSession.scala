package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended defaults. Local mode for
  * tests/bench; the same knobs transfer to cluster submissions (where
  * shuffle.partitions should track total cores and AQE coalesces the rest).
  */
object GraftSession {

  def builder(cores: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
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
