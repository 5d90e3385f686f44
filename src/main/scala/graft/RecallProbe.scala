package graft

import org.apache.spark.sql.SparkSession

/** Offline ANN recall probe: runs the approximate ladder (LSH, IVF-flat,
  * IVF-trained, PQ, IVF-PQ, and the persisted IVF-PQ serving read)
  * against the exact brute-force `similarity_topk` truth at a given SF
  * dir, printing one JSON line of recall@10 per rung. The ScalaTest
  * recall floors are pinned at sf0.001/0.01; fixed-parameter LSH/IVF
  * recall typically degrades as the corpus grows around the same
  * bucket/cell structure, so this is the tool that answers "do the knobs
  * still hold at 10×?" before anything ships — measured numbers live in
  * ARCHITECTURE.md's ⊘-key registry.
  *
  * Usage: `runMain graft.RecallProbe /root/testdata/sf0.1`
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pairs(key: String): Set[(Long, Long)] =
      Queries.all(key).fn(spark, sfDir)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs("similarity_topk")
    // a broken/empty truth set must fail loudly, not print NaN recalls
    // that look superficially valid
    require(brute.nonEmpty,
      s"brute-force similarity_topk returned no rows for $sfDir — " +
        "the recall denominators would all be NaN")
    val rungs = Seq("ann_lsh_topk", "ann_ivf_topk", "ann_ivf_trained_topk",
      "ann_ivf_append", "ann_pq_topk", "ann_ivfpq_topk", "ann_ivfpq_served")
    val entries = rungs.map { key =>
      val recall = brute.count(pairs(key).contains).toDouble / brute.size
      f""""$key": $recall%.4f"""
    }
    println(entries.mkString(s"""{"sf_dir": "$sfDir", """, ", ", "}"))
    spark.stop()
  }
}
