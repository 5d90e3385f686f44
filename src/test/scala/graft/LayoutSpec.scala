package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.ZOrderLayout

/** Data-layout contracts: the z-order clustering write must buy measurable
  * row-group skipping under the 2-D box filter it exists for.
  */
class LayoutSpec extends SparkSpec {

  test("zValue: Morton interleave puts x in even bits, y in odd bits") {
    val df = spark.range(1).select(
      ZOrderLayout.zValue(lit(3L), lit(5L)).as("a"),    // 011 ⨯ 101
      ZOrderLayout.zValue(lit(0L), lit(1L)).as("b"),
      ZOrderLayout.zValue(lit(65535L), lit(0L)).as("c"),
      ZOrderLayout.zValue(lit(65536L), lit(0L)).as("d")) // only low 16 bits
    val r = df.head
    assert(r.getLong(0) == 39L)          // 100111: x bits 0,2; y bits 1,5
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 1431655765L)  // 0101…01 over 32 bits
    assert(r.getLong(3) == 0L)
  }

  test("z-ordered layout prunes row groups under a 2-D box filter; round-robin cannot") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val total = li.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout_").toFile
    try {
    val naiveDir = new java.io.File(tmp, "naive").getPath
    val zDir = new java.io.File(tmp, "zorder").getPath
    li.repartition(8).write.parquet(naiveDir)
    ZOrderLayout.clusterByZ(li, col("l_partkey"), col("l_suppkey"), 8)
      .write.parquet(zDir)

    // same pushed box filter against both layouts; scan numOutputRows =
    // rows surviving row-group/page pruning (before the residual filter)
    def measure(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .filter(col("l_partkey").between(0, 49) && col("l_suppkey").between(0, 2))
      // collect() (not count()) so the metric-bearing plan is the one
      // that actually executed — count() builds a separate QueryExecution
      val result = df.collect().length.toLong
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = plan.collect { case f: FileSourceScanExec => f }
      assert(scans.size == 1)
      (result, scans.head.metrics("numOutputRows").value)
    }

    val (naiveResult, naiveScanned) = measure(naiveDir)
    val (zResult, zScanned) = measure(zDir)
    assert(naiveResult == zResult, "layouts must return identical data")
    // round-robin spreads the box across every file: nothing skips
    assert(naiveScanned == total, s"expected unprunable naive layout, scanned $naiveScanned")
    // the z-ordered clustering makes row-group stats tight boxes:
    // at least half the corpus must be skipped at the scan
    assert(zScanned <= total / 2,
      s"z-order skipped too little: scanned $zScanned of $total")
    assert(zScanned >= zResult, "scan cannot output fewer rows than the result")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }
}
