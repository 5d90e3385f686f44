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
}
