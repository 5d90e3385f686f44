package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.Try

/** CSV symbol-universe source (S10, `crawler/fetch_utils.py:75-114`):
  * header CSV with a `Symbol` column → list of symbols, falling back to a
  * default universe when the file is missing/malformed — the reference's
  * defensive fallback, kept as an explicit operator.
  */
object CsvSource {

  val defaultSymbols: Seq[String] = Seq("AAPL", "MSFT", "GOOG", "AMZN", "TSLA")

  def readSymbols(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    Try {
      val df = spark.read.option("header", "true").csv(path)
      require(df.columns.contains("Symbol"), s"no Symbol column in $path")
      df.select(col("Symbol").as("symbol")).filter(col("symbol").isNotNull)
    }.getOrElse(defaultSymbols.toDF("symbol"))
  }

  /** S11 — per-symbol timestamped CSV backup sink (`crawler.py:53-73`). */
  def backupCsv(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(dir)
}
