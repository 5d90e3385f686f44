package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Indicators

/** Chunked overlap-and-trim must equal the single-partition window path
  * whenever every chunk holds >= maxFrame-1 rows (SURVEY §4 skew scheme).
  */
class ChunkedSpec extends SparkSpec {
  import spark.implicits._

  test("chunked indicators equal plain indicators on synthetic data") {
    // 2 symbols x 1000 rows, chunks of 250 rows (>= 199 warm-up requirement)
    val rows = for (s <- Seq("A", "B"); i <- 0 until 1000) yield {
      val close = 100.0 + 10 * math.sin(i / 10.0) + (if (s == "A") i % 7 else i % 11)
      (s, i, close, (i % 50) + 1L)
    }
    val df = rows.toDF("symbol", "idx", "close", "volume")
      .withColumn("trading_date", expr("date_add(date '2010-01-01', idx)"))

    val plainW = Window.partitionBy("symbol").orderBy("trading_date")
    val plain = Indicators.withIndicators(df, plainW)
      .select(col("symbol"), col("trading_date"), col("sma_5"), col("sma_200"),
        col("macd"), col("signal_line"), col("rsi"), col("obv"),
        col("bb_upper"), col("month_change_pct"))
      .orderBy("symbol", "trading_date").collect()

    val chunked = Indicators.chunkedIndicators(df, floor(col("idx") / 250),
        orderCols = Seq("trading_date"))
      .select(col("symbol"), col("trading_date"), col("sma_5"), col("sma_200"),
        col("macd"), col("signal_line"), col("rsi"), col("obv"),
        col("bb_upper"), col("month_change_pct"))
      .orderBy("symbol", "trading_date").collect()

    assert(plain.length == chunked.length)
    plain.zip(chunked).foreach { case (p, c) =>
      assert(p.getString(0) == c.getString(0) && p.getDate(1) == c.getDate(1))
      (2 until p.length).foreach { i =>
        val (a, b) = (p.isNullAt(i), c.isNullAt(i))
        assert(a == b, s"null mismatch col $i at ${p.get(1)}")
        if (!a) assert(math.abs(p.getDouble(i) - c.getDouble(i)) < 1e-9,
          s"col $i at ${p.get(1)}: ${p.getDouble(i)} vs ${c.getDouble(i)}")
      }
    }
  }

  test("chunked OBV is exact even with small chunks (offset decomposition)") {
    val rows = (0 until 100).map(i => ("S", i, 100.0 + (i % 13), (i % 5) + 1L))
    val df = rows.toDF("symbol", "idx", "close", "volume")
      .withColumn("trading_date", expr("date_add(date '2010-01-01', idx)"))
    val plainW = Window.partitionBy("symbol").orderBy("trading_date")
    val plain = Indicators.withIndicators(df, plainW)
      .select("trading_date", "obv").orderBy("trading_date").as[(java.sql.Date, Double)].collect()
    // 10-row chunks: far below maxFrame, but OBV must still be exact
    val chunked = Indicators.chunkedIndicators(df, floor(col("idx") / 10),
        orderCols = Seq("trading_date"))
      .select("trading_date", "obv").orderBy("trading_date").as[(java.sql.Date, Double)].collect()
    assert(plain.toSeq == chunked.toSeq)
  }
}
