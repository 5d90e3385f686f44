package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.MicroBatch
import graft.sources.CsvSource

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def msg(ticker: String, date: String, close: Double): String =
    s"""{"ticker":"$ticker","date":"$date","open":$close,"high":$close,"low":$close,"close":$close,"volume":10,"timestamp":"$date 00:00:00"}"""

  test("S8 decode: parse, drop ticker-less messages, stamp consumed_at") {
    val raw = Seq(msg("AAPL", "2024-01-01", 10.5), """{"noticker":1}""", "not json")
      .toDF("value")
    val out = MicroBatch.decode(raw)
    assert(out.count() == 1)
    val r = out.head
    assert(r.getAs[String]("ticker") == "AAPL")
    assert(r.getAs[Double]("close") == 10.5)
    assert(r.getAs[java.sql.Timestamp]("consumed_at") != null)
  }

  test("S6/S8 encode-decode round trip") {
    val df = Seq(("AAPL", "2024-01-01", 1.0, 2.0, 0.5, 1.5, 100L, "2024-01-01 00:00:00"))
      .toDF("ticker", "date", "open", "high", "low", "close", "volume", "timestamp")
    val wire = MicroBatch.encode(df)
    assert(wire.columns.toSeq == Seq("key", "value"))
    val back = MicroBatch.decode(wire)
    assert(back.select("ticker", "close").as[(String, Double)].head == (("AAPL", 1.5)))
  }

  test("S7/S5 micro-batch stream with idempotent sink dedups on es_id") {
    val mem = MemoryStream[String](spark)
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    // duplicate message in the same batch -> single row after dedup
    mem.addData(msg("AAPL", "2024-01-01", 10.0), msg("AAPL", "2024-01-01", 10.0),
      msg("MSFT", "2024-01-01", 20.0))
    val decoded = MicroBatch.decode(mem.toDF())
    val q = MicroBatch.idempotentSink(decoded, out, ckpt)
    q.awaitTermination(60000)

    val rows = spark.read.parquet(out)
    assert(rows.count() == 2)
    assert(rows.select("es_id").as[String].collect().sorted.toSeq ==
      Seq("AAPL_2024-01-01", "MSFT_2024-01-01"))
  }

  test("stateful dedup removes duplicates ACROSS micro-batches") {
    val mem = MemoryStream[String](spark)
    val out = Files.createTempDirectory("graft_xbatch_out").toString
    val ckpt = Files.createTempDirectory("graft_xbatch_ckpt").toString
    val decoded = MicroBatch.decode(mem.toDF())
    // batch 1
    mem.addData(msg("AAPL", "2024-01-01", 10.0))
    val q1 = MicroBatch.idempotentSink(decoded, out, ckpt)
    q1.awaitTermination(60000)
    // batch 2 re-delivers the same record (at-least-once) + one new
    mem.addData(msg("AAPL", "2024-01-01", 10.0), msg("AAPL", "2024-01-02", 11.0))
    val q2 = MicroBatch.idempotentSink(decoded, out, ckpt)
    q2.awaitTermination(60000)

    val rows = spark.read.parquet(out)
    assert(rows.count() == 2, "cross-batch duplicate was not removed")
    assert(rows.select("es_id").as[String].collect().sorted.toSeq ==
      Seq("AAPL_2024-01-01", "AAPL_2024-01-02"))
  }

  test("watermark-bounded dedup collapses duplicates within the lateness horizon") {
    val mem = MemoryStream[String](spark)
    val out = Files.createTempDirectory("graft_wmdedup_out").toString
    val ckpt = Files.createTempDirectory("graft_wmdedup_ckpt").toString
    val decoded = MicroBatch.decode(mem.toDF())
      .withColumn("event_ts", to_timestamp(col("timestamp")))
    // batch 1: in-batch duplicate
    mem.addData(msg("AAPL", "2024-01-01", 10.0), msg("AAPL", "2024-01-01", 10.0))
    val q1 = MicroBatch.idempotentSink(decoded, out, ckpt,
      dedupWatermark = Some(("event_ts", "1 hour")))
    q1.awaitTermination(60000)
    // batch 2: re-delivery within the horizon + one new record
    mem.addData(msg("AAPL", "2024-01-01", 10.0), msg("AAPL", "2024-01-02", 11.0))
    val q2 = MicroBatch.idempotentSink(decoded, out, ckpt,
      dedupWatermark = Some(("event_ts", "1 hour")))
    q2.awaitTermination(60000)
    val rows = spark.read.parquet(out)
    assert(rows.select("es_id").as[String].collect().sorted.toSeq ==
      Seq("AAPL_2024-01-01", "AAPL_2024-01-02"),
      "duplicates inside the watermark horizon must collapse; state stays bounded")
  }

  test("idempotentSink refuses a fresh checkpoint against a populated outDir") {
    val mem = MemoryStream[String](spark)
    val out = Files.createTempDirectory("graft_guard_out").toString
    val ckpt1 = Files.createTempDirectory("graft_guard_ckpt1").toString
    mem.addData(msg("AAPL", "2024-01-01", 10.0))
    val q = MicroBatch.idempotentSink(MicroBatch.decode(mem.toDF()), out, ckpt1)
    q.awaitTermination(60000)
    assert(spark.read.parquet(out).count() == 1)
    // same outDir, brand-new checkpoint: batch ids would restart at 0
    val ckpt2 = Files.createTempDirectory("graft_guard_ckpt2").toString
    val ex = intercept[IllegalArgumentException] {
      MicroBatch.idempotentSink(MicroBatch.decode(mem.toDF()), out, ckpt2)
    }
    assert(ex.getMessage.contains("fresh"))
  }

  test("tumbling window counts with watermark over events-shaped stream") {
    val mem = MemoryStream[(java.sql.Timestamp, String)](spark)
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), "click"),
      (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "view"))
    val events = mem.toDF().toDF("ts", "event_type")
    val agg = MicroBatch.tumblingCounts(events)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tumble")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("select * from tumble").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString, r.getAs[String]("event_type"), r.getAs[Long]("n_events")))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      ("2024-01-01 10:00:00.0", "click", 2L),
      ("2024-01-01 11:00:00.0", "view", 1L)))
  }

  test("kafka source config carries the reference consumer's flow control") {
    val cfg = MicroBatch.kafkaSource("broker:9092", "stock_ohlcv")
    assert(cfg.format == "kafka")
    assert(cfg.options("kafka.bootstrap.servers") == "broker:9092")
    assert(cfg.options("subscribe") == "stock_ohlcv")
    // 500 = the consumer's size-flush (consumer.py:35-36)
    assert(cfg.options("maxOffsetsPerTrigger") == "500")
    assert(cfg.options("startingOffsets") == "earliest")
    assert(cfg.options("failOnDataLoss") == "false")
  }

  test("file source config streams messages end-to-end through decode") {
    val dir = Files.createTempDirectory("graft_filesrc").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "m.jsonl"),
      (msg("AAPL", "2024-01-01", 10.0) + "\n" + msg("TSLA", "2024-01-02", 20.0))
        .getBytes("UTF-8"))
    val src = MicroBatch.openSource(spark, MicroBatch.fileSource(dir))
    assert(src.isStreaming && src.columns.toSeq == Seq("value"))
    val q = MicroBatch.decode(src).writeStream
      .format("memory").queryName("filesrc")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.sql("select ticker from filesrc").as[String].collect().sorted.toSeq ==
      Seq("AAPL", "TSLA"))
  }

  test("S10 csv symbols source with fallback") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Seq("AAPL", "TSLA").toDF("Symbol").write.option("header", "true").csv(dir + "/ok")
    val ok = CsvSource.readSymbols(spark, dir + "/ok")
    assert(ok.as[String].collect().sorted.toSeq == Seq("AAPL", "TSLA"))
    val missing = CsvSource.readSymbols(spark, dir + "/nope")
    assert(missing.count() == CsvSource.defaultSymbols.size)
  }
}
