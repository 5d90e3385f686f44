package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Semantics for the round-4 additions: bucketized range join, weekly OHLC
  * resample, duplicated-n-gram fraction (and its xxhash64 twin), and
  * cluster-balanced sampling.
  */
class RangeResampleSpec extends SparkSpec {

  test("RangeJoin.pointInInterval equals the naive range-condition join") {
    import spark.implicits._
    // spans crossing bucket boundaries, empty intervals, multi-key
    val points = Seq(
      ("A", "2024-01-01"), ("A", "2024-01-06"), ("A", "2024-01-07"),
      ("A", "2024-01-14"), ("B", "2024-01-06"))
      .toDF("k", "pt").select(col("k"), col("pt").cast("date").as("pt"))
    val intervals = Seq(
      (1L, "A", "2024-01-01", "2024-01-06"), // 2 buckets @width=7, 2 hits
      (2L, "A", "2024-01-05", "2024-01-20"), // 4 hits
      (3L, "A", "2024-02-01", "2024-02-05"), // empty — must survive (left)
      (4L, "B", "2024-01-01", "2024-01-06")) // keyed match only
      .toDF("id", "k", "lo", "hi")
      .select(col("id"), col("k"), col("lo").cast("date").as("lo"),
        col("hi").cast("date").as("hi"))

    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "pt", "lo", "hi", widthDays = 7)
      .groupBy("id").agg(sum(when(col("_in_range"), 1L).otherwise(0L)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val naive = intervals.as("i").join(points.as("p"),
        col("p.k") === col("i.k") &&
          col("p.pt") >= col("i.lo") && col("p.pt") <= col("i.hi"), "left")
      .groupBy("id").agg(count(col("pt")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(got == naive, s"bucketized=$got naive=$naive")
    assert(got(3L) == 0L, "empty interval must survive with zero matches")
  }

  test("resample_ohlc: weekly bars agree with a per-group recompute") {
    val weekly = Queries.all("resample_ohlc").fn(spark, sf0001).collect()
    assert(weekly.nonEmpty)
    // high >= low everywhere; n_days within 1..5 business days is not
    // guaranteed by the synthetic calendar, but must be >= 1 and the sum
    // of n_days must equal the daily row count
    weekly.foreach { r =>
      assert(r.getAs[Double]("high") >= r.getAs[Double]("low"))
      assert(r.getAs[Long]("n_days") >= 1L)
    }
    val daily = graft.operators.AsOfJoin.latestPerKeyTime(
      Tables.ohlcv(spark, sf0001), "symbol", "trading_date",
      Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
    assert(weekly.map(_.getAs[Long]("n_days")).sum == daily.count())
    // spot-check one (symbol, week): open = open of the earliest day
    val r0 = weekly.head
    val wk = daily
      .filter(col("symbol") === r0.getAs[String]("symbol") &&
        to_date(date_trunc("week", col("trading_date"))) === lit(r0.getAs[java.sql.Date]("week_start")))
      .orderBy("trading_date").select("open", "close").collect()
    assert(r0.getAs[Double]("open") == wk.head.getDouble(0))
    assert(r0.getAs[Double]("close") == wk.last.getDouble(1))
  }

  test("dup_ngram_fraction: exact duplicates are flagged, and the xxhash64 twin agrees") {
    val md5Rows = Queries.all("dup_ngram_fraction").fn(spark, sf0001).collect()
    // dupedDocs unions an exact copy of every doc — every doc with >= 1
    // shingle has dup_frac 1.0 on this corpus
    assert(md5Rows.nonEmpty)
    assert(md5Rows.forall(_.getAs[Boolean]("flagged")),
      "exact-duplicate corpus: every doc's shingles all recur")
    val xxRows = Queries.all("dup_ngram_fraction_prod").fn(spark, sf0001).collect()
    val md5Map = md5Rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_dup"))).toMap
    val xxMap = xxRows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_dup"))).toMap
    assert(md5Map == xxMap,
      "string-keyed and xxhash64-keyed df joins must count identically " +
        "(hash collisions would only ever INFLATE n_dup)")
  }

  test("mix_sources: sqrt-temperature quotas damp dominant sources, draw is capped") {
    val rows = Queries.all("mix_sources").fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val quota = rs.head.getAs[Long]("quota")
      assert(rs.length.toLong == quota, s"$src drew ${rs.length} of quota $quota")
    }
    // α = 0.5 damping: sampled fraction of a SMALL source must be >= the
    // fraction of a LARGE one (sqrt flattens the distribution)
    val fracs = bySource.map { case (_, rs) =>
      (rs.head.getAs[Long]("n_docs"), rs.length.toDouble / rs.head.getAs[Long]("n_docs")) }
      .toSeq.sortBy(_._1)
    if (fracs.size >= 2)
      assert(fracs.head._2 >= fracs.last._2 - 1e-9,
        s"small source sampled at lower rate than large: $fracs")
    // never exceeds the target budget
    assert(rows.length <= 500)
  }

  test("cluster_sample: per-cluster cap respected, sample deterministic") {
    val rows = Queries.all("cluster_sample").fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("c_id"))
    byCluster.foreach { case (cId, rs) =>
      val n = rs.map(_.getAs[Long]("n_members")).head
      assert(rs.length == math.min(32L, n),
        s"cluster $cId: ${rs.length} sampled of $n members")
      assert(rs.map(_.getAs[Int]("samp_rank")).sorted.toSeq == (1 to rs.length))
    }
    // total membership covers the corpus exactly once
    val total = byCluster.map { case (_, rs) => rs.head.getAs[Long]("n_members") }.sum
    assert(total == Tables.embeddings(spark, sf0001).count())
    // deterministic: a second run returns the identical sample
    val again = Queries.all("cluster_sample").fn(spark, sf0001).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
