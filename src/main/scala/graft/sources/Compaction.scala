package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-files compaction — the operational follow-up to every streaming/
  * incremental sink in this engine: micro-batches and per-increment appends
  * accumulate many small parquet files, which at scale dominate scan
  * planning time and NameNode/listing pressure. Rewrites a directory into
  * ~targetBytes files while preserving the data.
  *
  * REQUIRES exclusive access to `dir` for the duration of the run: files
  * appended concurrently with the rewrite would be swept away with the old
  * snapshot. Pause the writers (or compact a partition no writer touches).
  * A crash mid-swap leaves either the original dir or a complete
  * `_compact_bak` copy; [[recoverIfNeeded]] restores the latter.
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

  /** Restore `dir` from a `_compact_bak` left by a crash between the two
    * swap renames. Call before reading/compacting if a prior compaction
    * may have died mid-swap.
    */
  def recoverIfNeeded(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val bak = new Path(dir + "_compact_bak")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) && fs.exists(bak)) { require(fs.rename(bak, p)); true }
    else false
  }

  /** Rewrite `dir` into ceil(bytes / targetBytes) files (at least 1),
    * optionally re-partitioned by layout columns (rows are co-located by
    * the layout key first so partitionBy doesn't fan each task out into
    * one file per value). Writes to a sibling tmp dir then swaps with
    * checked renames; the backup is deleted only after a successful
    * promote.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20,
      layoutCols: Seq[String] = Nil, mergeSchema: Boolean = false): Unit = {
    recoverIfNeeded(spark, dir)
    val bytes = dataBytes(spark, dir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    // mergeSchema: a directory whose later batches EVOLVED the schema
    // must compact under the union of footers — the default
    // single-footer read would silently drop columns absent from the
    // sampled file (pinned in CompactionSpec)
    val df = (if (mergeSchema) spark.read.option("mergeSchema", "true")
              else spark.read).parquet(dir)
    val tmp = dir + "_compact_tmp"
    val repartitioned =
      if (layoutCols.nonEmpty)
        df.repartition(nFiles, layoutCols.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nFiles)
    val writer = repartitioned.write.mode(SaveMode.Overwrite)
    (if (layoutCols.nonEmpty) writer.partitionBy(layoutCols: _*) else writer).parquet(tmp)

    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val bak = new Path(dir + "_compact_bak")
    def renameOrDie(src: Path, dst: Path): Unit =
      require(fs.rename(src, dst), s"compaction rename failed: $src -> $dst")
    fs.delete(bak, true)
    renameOrDie(p, bak)
    renameOrDie(new Path(tmp), p)
    fs.delete(bak, true)
  }
}
