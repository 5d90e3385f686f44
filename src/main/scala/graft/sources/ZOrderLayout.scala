package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton-curve) data layout: interleave the bits of two scan
  * dimensions so that a 2-D box filter maps to a small number of
  * contiguous runs of the sort key — then range-partition + sort the
  * write so parquet row-group min/max stats become tight boxes and the
  * reader's pushed predicates prune whole row groups on BOTH dimensions.
  *
  * A single-column sort gives perfect skipping on that column and none
  * on any other; the interleave trades a little of each for useful
  * skipping on both — the standard lakehouse layout trick for the
  * two-filter scan pattern (`WHERE part BETWEEN … AND supp BETWEEN …`).
  *
  * 100 TB shape: `zValue` is pure per-row bit math inside whole-stage
  * codegen; the layout write is one range exchange on the z-value (the
  * same cost as any global sort-on-write) and pays for itself on every
  * subsequent scan. Skipping effectiveness is pinned by measurement in
  * LayoutSpec (z-ordered scan outputs strictly fewer row-group rows
  * than the round-robin layout under the same pushed box filter).
  */
object ZOrderLayout {

  /** Even/odd bit-interleave of the low 16 bits of `x` and `y` — plain
    * long arithmetic (the classic mask-spread sequence), identical on
    * any engine; the `zorder_layout` oracle restates it in ANSI SQL.
    */
  def zValue(x: Column, y: Column): Column = {
    def spread(c: Column): Column = {
      val m = c.cast(LongType).bitwiseAND(lit(65535L))
      val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(16711935L))
      val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(252645135L))
      val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(858993459L))
      d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(1431655765L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** Cluster `df` into `numFiles` z-ordered files: range exchange on the
    * z-value, z-sorted within each partition, z dropped from the data
    * (it is a layout key, not a data column — recomputable on demand).
    */
  def clusterByZ(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame =
    df.withColumn("_graft_z", zValue(x, y))
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
}
