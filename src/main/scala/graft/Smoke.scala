package graft

import org.apache.spark.sql.SparkSession

/** Local smoke main mirroring the driver's t1 check: SparkEntry.entry
  * must return rows > 0 on sf0.001.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n cols=${df.columns.length}")
    df.show(3, truncate = false)
    assert(n > 0, "entry returned 0 rows")
    spark.stop()
  }
}
