package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one query by name with timing, optionally dumping the
  * formatted physical plan. Usage:
  *   runMain graft.Explain <queryName> [sfDir] [plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val showPlan = args.contains("plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", GraftSession.ExcludedRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
    val df = Queries.all(name).fn(spark, sfDir)
    if (showPlan) df.explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = Queries.all(name).fn(spark, sfDir).count()
      println(f"[explain] $name run$i rows=$n  ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
