package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks latest quote <= probe time, same-instant included, unmatched dropped") {
    val quotes = Seq(
      ("A", "2020-01-01", 10.0), ("A", "2020-01-05", 20.0),
      ("B", "2020-01-02", 99.0))
      .toDF("k", "d", "v").withColumn("qt", to_timestamp(col("d"))).drop("d")
    val probes = Seq(
      ("A", "2020-01-03", 1L),  // -> 10.0 (latest <= 01-03)
      ("A", "2020-01-05", 2L),  // -> 20.0 (same instant counts)
      ("A", "2019-12-31", 3L),  // -> dropped (no preceding quote)
      ("B", "2020-06-01", 4L))  // -> 99.0
      .toDF("k", "d", "id").withColumn("pt", to_timestamp(col("d"))).drop("d")

    val got = AsOfJoin.asofJoin(probes, quotes, "k", "pt", "qt", "v", "asof_v")
      .select("id", "asof_v").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 10.0, 2L -> 20.0, 4L -> 99.0))
  }

  test("latestPerKeyTime dedupes ties by greatest tiebreaker") {
    val quotes = Seq(("A", "2020-01-01", 1L, 10.0), ("A", "2020-01-01", 2L, 11.0))
      .toDF("k", "d", "seq", "v").withColumn("qt", to_timestamp(col("d")))
    val one = AsOfJoin.latestPerKeyTime(quotes, "k", "qt", Seq(col("seq")))
    assert(one.count() == 1)
    assert(one.select("v").head.getDouble(0) == 11.0)
  }

  test("asof_join query runs and every matched order has a real close") {
    val out = Queries.all("asof_join").fn(spark, sf0001)
    assert(out.count() > 0)
    assert(out.filter(col("asof_close").isNull).count() == 0)
  }
}
