package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump `.explain("formatted")` for one or more query keys
  * WITHOUT executing them — `runMain graft.PlanDump <key>[,key...] [sfDir]
  * [outDir]`. Writes `<outDir>/<key>.txt` per key (stdout when no outDir).
  * Same session config as [[Bench]] so plans match what the bench runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", GraftSession.ExcludedRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      outDir match {
        case Some(d) =>
          val p = java.nio.file.Paths.get(d)
          java.nio.file.Files.createDirectories(p)
          java.nio.file.Files.writeString(p.resolve(s"$k.txt"), out.toString)
          println(s"[plandump] wrote $d/$k.txt")
        case None => println(s"===== $k =====\n" + out.toString)
      }
    }
    spark.stop()
  }
}
