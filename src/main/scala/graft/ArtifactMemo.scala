package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once cache for offline artifacts (codebooks, index segments,
  * cluster maps, trained models) — the one place that owns the
  * staleness rule every memoized artifact shares: the cache key embeds
  * the SOURCE PARQUET's mtime ([[stamp]]), so a long-lived JVM that
  * regenerates testdata under the same path rebuilds instead of serving
  * a stale artifact (the Tables.symbolUniverseCsv recipe). Centralizing
  * the pattern keeps the memo-key shape uniform across artifacts — four
  * hand-rolled copies of this had already drifted on sentinel and stamp
  * details once.
  */
object ArtifactMemo {

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Source-staleness stamp: `dir@mtime` of the parquet the artifact is
    * derived from. Fails fast on a missing source — `lastModified` of an
    * absent (or still-being-written) file is 0, which would memoize an
    * artifact built against nothing under a stable-looking key.
    */
  def stamp(dir: String, sourceFile: String): String = {
    val f = new java.io.File(s"$dir/$sourceFile")
    require(f.exists(), s"ArtifactMemo.stamp: source $f does not exist")
    s"$dir@${f.lastModified()}"
  }

  /** Build-once value for `key` (include a [[stamp]] in it). The build
    * runs OUTSIDE any map lock: artifacts nest (the IVF base segment's
    * build loads the codebook artifact), and a nested
    * `computeIfAbsent` on one shared map is a recursive update —
    * forbidden by the CHM contract and an `IllegalStateException`
    * whenever the two keys land in one bin. Racing builders may both
    * compute; the first `putIfAbsent` wins and the loser's result is
    * discarded (builds are deterministic, so this wastes work, never
    * correctness).
    */
  def cached[T <: AnyRef](key: String)(build: => T): T = {
    val existing = memo.get(key)
    if (existing != null) existing.asInstanceOf[T]
    else {
      val built = build.asInstanceOf[AnyRef]
      val prev = memo.putIfAbsent(key, built)
      (if (prev != null) prev else built).asInstanceOf[T]
    }
  }

  /** Build-once parquet artifact: materializes `build` under a fresh
    * temp directory and returns the path (read it back with
    * `spark.read.parquet`).
    */
  def parquet(key: String, name: String)(build: => DataFrame): String =
    cached[String](s"$key#$name") {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_${name}_").toFile
      tmp.deleteOnExit()
      val path = new java.io.File(tmp, name).getPath
      build.write.mode("overwrite").parquet(path)
      path
    }

  /** Build-once PARTITIONED parquet artifact — the serving-store layout:
    * readers that filter on the partition columns scan only the matching
    * directories (partition pruning), so a probe query touches its cells'
    * files and nothing else.
    */
  def parquetPartitioned(key: String, name: String, partitionCols: Seq[String])
      (build: => DataFrame): String =
    cached[String](s"$key#$name#${partitionCols.mkString(",")}") {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_${name}_").toFile
      tmp.deleteOnExit()
      val path = new java.io.File(tmp, name).getPath
      build.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
      path
    }
}
