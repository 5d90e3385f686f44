package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Clean, Indicators}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's full ETL
    * pipeline (clean → 15 technical indicators → composite sink key),
    * mirroring `/root/reference/spark-job/etl_job.py:524-568` as one
    * declarative plan over all symbols at once (the reference loops
    * per-symbol sequentially; window partitioning parallelizes it).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val base = Tables.ohlcv(spark, dir)
    val cleaned = Clean.dropNullRows(Clean.castNumeric(base))
    val processed = Indicators.withIndicators(cleaned, Indicators.baseWindow())
    processed.withColumn("symbol_date_key",
      Clean.compositeKey(org.apache.spark.sql.functions.col("symbol"),
        org.apache.spark.sql.functions.col("trading_date")))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Queries.all.collect { case (k, Queries.Q(_, Some(sql))) => k -> sql }
}
