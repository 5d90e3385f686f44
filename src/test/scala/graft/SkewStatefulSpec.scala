package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Skew
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Tick, TickerUpdate}

class SkewStatefulSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum equals plain groupBy sum on skewed data") {
    // 90% of rows share one hot key
    val rows = (1 to 10000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    val salted = Skew.saltedSum(df, Seq("k"), "v")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(plain == salted)
  }

  test("saltedDimJoin equals plain join on skewed fact") {
    val fact = (1 to 5000).map(i => (if (i % 20 == 0) i % 5 else 1, i.toLong))
      .toDF("dim_key", "v")
    val dim = (0 until 5).map(k => (k, s"name_$k")).toDF("dim_key", "name")
    val plain = fact.join(dim, "dim_key")
      .groupBy("name").agg(sum("v").as("s"))
      .orderBy("name").as[(String, Long)].collect().toSeq
    val salted = Skew.saltedDimJoin(fact, dim, "dim_key")
      .groupBy("name").agg(sum("v").as("s"))
      .orderBy("name").as[(String, Long)].collect().toSeq
    assert(plain == salted)
  }

  test("flatMapGroupsWithState keeps per-ticker state across micro-batches") {
    implicit val s = spark
    val mem = MemoryStream[Tick](spark)
    val out = StatefulOps.runningSummary(mem.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ticker_state")
      .start()
    // micro-batch 1
    mem.addData(Tick("AAPL", 10.0, 100L), Tick("AAPL", 12.0, 50L), Tick("MSFT", 20.0, 10L))
    q.processAllAvailable()
    // micro-batch 2: state must continue from n=2 for AAPL
    mem.addData(Tick("AAPL", 8.0, 25L))
    q.processAllAvailable()
    q.stop()

    val updates = spark.sql("select * from ticker_state")
      .as[TickerUpdate].collect().filter(_.ticker == "AAPL")
    assert(updates.exists(u => u.n == 2 && u.maxClose == 12.0), s"batch1 missing: ${updates.toSeq}")
    assert(updates.exists(u => u.n == 3 && u.lastClose == 8.0 &&
      u.minClose == 8.0 && u.maxClose == 12.0 && u.totalVolume == 175L),
      s"batch2 state lost: ${updates.toSeq}")
  }

  test("streaming funnelStages matches the batch funnel on in-order events") {
    import graft.streaming.StatefulOps.{FunnelEvent, FunnelUpdate}
    implicit val s = spark
    val mem = MemoryStream[FunnelEvent](spark)
    val q = StatefulOps.funnelStages(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_state").start()
    // user 1 completes across two batches; user 2 clicks BEFORE any view
    // (must not advance) then completes view+click but never purchases;
    // user 3 views only
    mem.addData(
      FunnelEvent(1L, "view", 100L), FunnelEvent(1L, "click", 200L),
      FunnelEvent(2L, "click", 50L), FunnelEvent(2L, "view", 150L),
      FunnelEvent(3L, "view", 10L), FunnelEvent(1L, "error", 250L))
    q.processAllAvailable()
    mem.addData(
      FunnelEvent(1L, "purchase", 300L), FunnelEvent(2L, "click", 160L),
      // stage already taken: a second, later view must not move t1
      FunnelEvent(3L, "view", 20L))
    q.processAllAvailable()
    q.stop()
    // resolve the final state per user with the same (t3,t2,t1)-max
    // aggregation the stream_funnel key uses — positional .last on the
    // memory sink's collect order would flake if it ever diverged from
    // batch order
    val last = StatefulOps.latestPerUser(spark.sql("select * from funnel_state"))
      .as[FunnelUpdate].collect().map(u => u.user_id -> u).toMap
    assert(last(1L) == FunnelUpdate(1L, 100L, 200L, 300L))
    assert(last(2L) == FunnelUpdate(2L, 150L, 160L, StatefulOps.FunnelUnset),
      s"pre-view click must not count: ${last(2L)}")
    assert(last(3L) == FunnelUpdate(3L, 10L, StatefulOps.FunnelUnset, StatefulOps.FunnelUnset))
    // parity with the batch formulation (funnel_steps logic) on the
    // same in-order history: first view, first click after it, first
    // purchase after that
    assert(last.values.toSet == Set(
      FunnelUpdate(1L, 100L, 200L, 300L),
      FunnelUpdate(2L, 150L, 160L, StatefulOps.FunnelUnset),
      FunnelUpdate(3L, 10L, StatefulOps.FunnelUnset, StatefulOps.FunnelUnset)))
  }
}
