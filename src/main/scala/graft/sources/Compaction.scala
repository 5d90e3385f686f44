package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-files compaction — the operational follow-up to every streaming/
  * incremental sink in this engine: micro-batches and per-increment appends
  * accumulate many small parquet files, which at scale dominate scan
  * planning time and NameNode/listing pressure. Rewrites a directory into
  * ~targetBytes files while preserving the data.
  */
object Compaction {

  /** Total bytes of data files under a path (recursive, ignores metadata). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    total
  }

  def dataFileCount(spark: SparkSession, dir: String): Long = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var n = 0L
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }

  /** Rewrite `dir` into ceil(bytes / targetBytes) files (at least 1),
    * optionally re-partitioned by layout columns. Writes to a sibling tmp
    * dir then swaps, so a crash mid-compaction never loses data.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20,
      layoutCols: Seq[String] = Nil): Unit = {
    val bytes = dataBytes(spark, dir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val tmp = dir + "_compact_tmp"
    val writer = df.repartition(nFiles).write.mode(SaveMode.Overwrite)
    (if (layoutCols.nonEmpty) writer.partitionBy(layoutCols: _*) else writer).parquet(tmp)

    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val bak = new Path(dir + "_compact_bak")
    fs.delete(bak, true)
    fs.rename(p, bak)
    fs.rename(new Path(tmp), p)
    fs.delete(bak, true)
  }
}
