package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time (and optionally explain) a single query key in
  * isolation — `runMain graft.TimeOne <key> [sfDir] [reps] [explain]`.
  * Same session config as [[Bench]] so numbers are comparable.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", GraftSession.ExcludedRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    // comma-separated keys run in sequence in ONE session — reproduces
    // cross-query interactions (broadcast/GC state) the per-key isolation
    // of a fresh JVM would hide
    key.split(",").foreach { k =>
      val fn = SparkEntry.queries(k)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      val times = (1 to reps).map { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[timeone] $k rep$i: $s%.3f s ($n rows)")
        s
      }
      println(f"[timeone] $k best: ${times.min}%.3f s")
    }
    spark.stop()
  }
}
