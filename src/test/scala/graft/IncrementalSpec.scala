package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Incremental

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def mkInput(days: Range) = {
    days.map { i =>
      ("S", f"2024-01-${i}%02d", 100.0 + i, 100.0 + i, 100.0 + i, 100.0 + i, 10L)
    }.toDF("symbol", "d", "close", "open", "high", "low", "volume")
      .withColumn("trading_date", to_date(col("d")))
      .withColumn("timestamp", to_timestamp(col("d")))
      .drop("d")
  }

  // total order on this synthetic data (one row per date)
  private val specOrd = Seq("trading_date", "timestamp")

  private def tmp() = Files.createTempDirectory("graft_inc").toString

  test("two-batch overlap-reload run equals single-batch run") {
    val (st1, out1) = (tmp() + "/wm", tmp() + "/out")
    val (st2, out2) = (tmp() + "/wm", tmp() + "/out")

    // single shot
    Incremental.runIncremental(spark, mkInput(1 to 20), st1, out1, Incremental.OverlapReload, specOrd)
    // two increments
    Incremental.runIncremental(spark, mkInput(1 to 12), st2, out2, Incremental.OverlapReload, specOrd)
    Incremental.runIncremental(spark, mkInput(1 to 20), st2, out2, Incremental.OverlapReload, specOrd)

    val a = spark.read.parquet(out1).select("symbol_date_key", "sma_5", "obv", "rsi")
      .orderBy("symbol_date_key").collect().toSeq
    val b = spark.read.parquet(out2).select("symbol_date_key", "sma_5", "obv", "rsi")
      .orderBy("symbol_date_key").collect().toSeq
    assert(a.size == 20 && b.size == 20)
    // overlap mode: warm frames agree except OBV (running sum restarts at
    // each increment boundary, as in the reference); SMA/RSI must be exact
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(x.getDouble(1) == y.getDouble(1), s"sma_5 mismatch at ${x.getString(0)}")
    }
  }

  test("truncated mode: second increment restarts warm-up (reference semantics)") {
    val (st, out) = (tmp() + "/wm", tmp() + "/out")
    Incremental.runIncremental(spark, mkInput(1 to 12), st, out, Incremental.Truncated, specOrd)
    val second = Incremental.runIncremental(spark, mkInput(1 to 20), st, out, Incremental.Truncated, specOrd)
    // first row of the new increment has a 1-row SMA-5 frame = its own close
    val first = second.orderBy("trading_date").select("close", "sma_5").head
    assert(first.getDouble(0) == first.getDouble(1))
  }

  test("idempotent re-run: same watermark -> zero new rows") {
    val (st, out) = (tmp() + "/wm", tmp() + "/out")
    Incremental.runIncremental(spark, mkInput(1 to 10), st, out, Incremental.Truncated, specOrd)
    val rerun = Incremental.runIncremental(spark, mkInput(1 to 10), st, out, Incremental.Truncated, specOrd)
    assert(rerun.isEmpty)
  }

  test("overlap-reload on REAL ohlcv data (with ties) equals single-batch run") {
    val ord = Queries.tieCols
    val base = Tables.ohlcv(spark, sf0001)
    val half = base.filter(col("timestamp") < lit("1995-06-01"))

    val (st1, out1) = (tmp() + "/wm", tmp() + "/out")
    Incremental.runIncremental(spark, base, st1, out1, Incremental.OverlapReload, ord)
    val (st2, out2) = (tmp() + "/wm", tmp() + "/out")
    Incremental.runIncremental(spark, half, st2, out2, Incremental.OverlapReload, ord)
    Incremental.runIncremental(spark, base, st2, out2, Incremental.OverlapReload, ord)

    def snap(dir: String) = spark.read.parquet(dir)
      .select("symbol", "trading_date", "l_orderkey", "l_linenumber",
        "l_partkey", "l_suppkey", "sma_5", "rsi", "bb_middle")
      .orderBy("symbol", "trading_date", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .collect().toSeq
    val (a, b) = (snap(out1), snap(out2))
    assert(a.size == b.size && a.size == 6000)
    a.zip(b).foreach { case (x, y) =>
      (6 until 9).foreach { i =>
        assert(x.getDouble(i) == y.getDouble(i),
          s"col $i differs at ${x.get(0)}/${x.get(2)}: ${x.getDouble(i)} vs ${y.getDouble(i)}")
      }
    }
  }

  test("watermark state advances to max timestamp per symbol") {
    val (st, out) = (tmp() + "/wm", tmp() + "/out")
    Incremental.runIncremental(spark, mkInput(1 to 10), st, out, Incremental.Truncated, specOrd)
    val wm = Incremental.readWatermarks(spark, st).collect()
    assert(wm.length == 1)
    assert(wm.head.getAs[java.sql.Timestamp]("last_processed_timestamp").toString.startsWith("2024-01-10"))
  }
}
