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

  test("asofJoinChunked equals asofJoin on real data at several chunk widths") {
    // same probe/quote frames the asof_join oracle query uses
    val quotes = AsOfJoin.latestPerKeyTime(
      Tables.ohlcv(spark, sf0001), "symbol", "trading_date",
      Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
      .select(col("symbol"), col("trading_date"), col("close"))
    val probes = Tables.orders(spark, sf0001)
      .withColumn("symbol",
        when(col("o_orderstatus") === "F", lit("A"))
          .when(col("o_orderstatus") === "O", lit("N"))
          .otherwise(lit("R")))
      .select(col("o_orderkey"), col("symbol"), col("o_orderdate"))

    val plain = AsOfJoin.asofJoin(probes, quotes, "symbol", "o_orderdate",
        "trading_date", "close", "asof_close")
      .select("o_orderkey", "asof_close").as[(Long, Double)].collect().toMap

    // year chunks (coarse: few boundaries) and month chunks (fine: many
    // quote-less probe chunks must pull their value across MULTIPLE prior
    // chunks through the summary carry-forward)
    def run(chunkOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      AsOfJoin.asofJoinChunked(probes, quotes, "symbol", "o_orderdate",
        "trading_date", "close", "asof_close", chunkOf)
        .select("o_orderkey", "asof_close").as[(Long, Double)].collect().toMap
    assert(run(t => year(t)) == plain)
    assert(run(t => date_trunc("month", t)) == plain)
  }

  test("asofJoin matches a brute-force reference on randomized data with ties and null quotes") {
    val rnd = new scala.util.Random(7)
    val keys = Vector("A", "B", "C")
    val quotes = (1 to 300).map { _ =>
      (keys(rnd.nextInt(3)), rnd.nextInt(100),
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(50).toDouble))
    }
    val probes = (1 to 200).map { i => (keys(rnd.nextInt(3)), rnd.nextInt(100), i.toLong) }
    val qdf = quotes.toDF("k", "qt", "v")
    val pdf = probes.toDF("k", "pt", "id")

    // reference: latest non-null quote at or before pt; greatest value on
    // tied times (the declared duplicate-quote contract); no match -> drop
    val expect = probes.flatMap { case (k, pt, id) =>
      val c = quotes.collect { case (`k`, qt, Some(v)) if qt <= pt => (qt, v) }
      if (c.isEmpty) None else Some(id -> c.max._2)
    }.toMap

    val got = AsOfJoin.asofJoin(pdf, qdf, "k", "pt", "qt", "v", "av")
      .select("id", "av").as[(Long, Double)].collect().toMap
    assert(got == expect)
    val gotChunked = AsOfJoin.asofJoinChunked(pdf, qdf, "k", "pt", "qt", "v", "av",
        t => floor(t / 10))
      .select("id", "av").as[(Long, Double)].collect().toMap
    assert(gotChunked == expect)
  }

  test("duplicate (key, time) quotes: both paths deterministically pick the greatest value") {
    // NOT pre-deduped: two quotes at the same instant. The _v sort
    // tiebreaker (plain) and the max(struct(_t, _v)) summary (chunked)
    // must agree — greatest value wins — for arbitrary right inputs.
    val quotes = Seq(
      ("A", "2020-01-01", 10.0), ("A", "2020-01-01", 12.0),  // dup instant
      ("A", "2020-03-01", 5.0), ("A", "2020-03-01", 7.0))    // dup in later chunk
      .toDF("k", "d", "v").withColumn("qt", to_timestamp(col("d"))).drop("d")
    val probes = Seq(
      ("A", "2020-01-15", 1L),  // carried across the dup -> 12.0
      ("A", "2020-04-01", 2L))  // next-chunk probe pulls dup summary -> 7.0
      .toDF("k", "d", "id").withColumn("pt", to_timestamp(col("d"))).drop("d")
    val plain = AsOfJoin.asofJoin(probes, quotes, "k", "pt", "qt", "v", "asof_v")
      .select("id", "asof_v").as[(Long, Double)].collect().toMap
    val chunked = AsOfJoin.asofJoinChunked(probes, quotes, "k", "pt", "qt", "v",
        "asof_v", t => date_trunc("month", t))
      .select("id", "asof_v").as[(Long, Double)].collect().toMap
    assert(plain == Map(1L -> 12.0, 2L -> 7.0))
    assert(chunked == plain)
  }
}
