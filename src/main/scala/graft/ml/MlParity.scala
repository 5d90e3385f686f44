package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ML-dataflow parity (SURVEY §2.10, reference `ml-service/ml_pipeline.py`):
  * the data transformations are first-class DataFrame ops; model fitting
  * maps to Spark MLlib. Mirrors:
  *
  *  - M1/M2 future-target shift + dropna (`ml_pipeline.py:142-145`)
  *  - M3 feature selection = all numeric minus id/label (`:139`)
  *  - M4 ordered time-series split, last fold, no shuffle (`:170-174`)
  *  - M5 standard scaling (population variance, sklearn default) (`:176-179`)
  *  - M6 models (LinearRegression / RandomForest for the sklearn trio) (`:90-104`)
  *  - M7 metrics r2 / mse (`:195-197`)
  *  - M8 model registry: metadata table + best-by-r2 (`:210-301`)
  *  - M9 quality monitoring predicates (`ml_scheduler.py:152-203`)
  */
object MlParity {

  val predictionDays = 5   // PREDICTION_DAYS, ml_pipeline.py:56
  val minDataPoints = 252  // MIN_DATA_POINTS, ml_pipeline.py:58

  /** M1+M2: label = close shifted -predictionDays within symbol, rows
    * without a future value dropped.
    */
  def withFutureTarget(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy(orderCols.map(col): _*)
    df.withColumn("future_close", lead(col("close"), predictionDays).over(w))
      .filter(col("future_close").isNotNull)
  }

  /** M3: every numeric column except ids/label becomes a feature. */
  def featureColumns(df: DataFrame, exclude: Set[String]): Seq[String] =
    df.schema.fields.collect {
      case StructField(name, DoubleType | LongType | IntegerType | FloatType, _, _)
        if !exclude.contains(name) => name
    }.toSeq

  /** M4: ordered split — last `testFraction` of rows (per global order) is
    * the test fold; no shuffling, exactly like TimeSeriesSplit's last fold.
    */
  def timeSeriesSplit(df: DataFrame, orderCols: Seq[String], testFraction: Double = 0.2)
      : (DataFrame, DataFrame) = {
    val w = Window.partitionBy("symbol").orderBy(orderCols.map(col): _*)
    val n = Window.partitionBy("symbol")
    val ranked = df.withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(n))
    // floor-with-epsilon keeps the reference's int() truncation semantics
    // while absorbing float error (90 * 0.7 = 62.9999... must cut at 63,
    // but an exact 67.5 must still truncate to 67)
    val cut = floor(col("_n") * (1.0 - testFraction) + lit(1e-9))
    (ranked.filter(col("_rn") <= cut).drop("_rn", "_n"),
      ranked.filter(col("_rn") > cut).drop("_rn", "_n"))
  }

  case class TrainedModel(model: LinearRegressionModel, features: Seq[String],
      r2: Double, mse: Double)

  /** M6 (tree member of the reference's RF/LGBM/Linear trio): RandomForest
    * regressor + held-out metrics via [[regressionMetrics]]. Returned as
    * (model, r2, mse) — MLlib tree models share persistence with the
    * registry pattern in [[saveModel]].
    */
  def trainForest(train: DataFrame, test: DataFrame, features: Seq[String],
      label: String = "future_close", trees: Int = 20)
      : (org.apache.spark.ml.regression.RandomForestRegressionModel, Double, Double) = {
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .setHandleInvalid("skip")
    val rf = new RandomForestRegressor()
      .setFeaturesCol("features").setLabelCol(label)
      .setNumTrees(trees).setSeed(42L)
    val model = rf.fit(assembler.transform(train))
    val scored = model.transform(assembler.transform(test))
    val (r2, mse) = regressionMetrics(scored, label, "prediction")
    (model, r2, mse)
  }

  /** M5+M6+M7: assemble → standardize (MLlib handles scaling internally via
    * the `standardization` param) → fit LinearRegression → r2/mse.
    */
  def trainLinear(train: DataFrame, features: Seq[String], label: String = "future_close")
      : TrainedModel = {
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .setHandleInvalid("skip")
      .transform(train)
    val lr = new LinearRegression()
      .setFeaturesCol("features").setLabelCol(label)
      .setStandardization(true).setMaxIter(50)
    val model = lr.fit(assembled)
    val s = model.summary
    TrainedModel(model, features, s.r2, s.meanSquaredError)
  }

  /** M7 as plain SQL aggregates (for evaluating on held-out data):
    * r2 = 1 − SS_res/SS_tot, mse = mean squared error.
    */
  def regressionMetrics(scored: DataFrame, label: String, pred: String): (Double, Double) = {
    val row = scored
      .withColumn("_mean", mean(col(label)).over(Window.partitionBy()))
      .agg(
        sum(pow(col(label) - col(pred), 2)).as("ss_res"),
        sum(pow(col(label) - col("_mean"), 2)).as("ss_tot"),
        avg(pow(col(label) - col(pred), 2)).as("mse"))
      .head()
    val r2 = 1.0 - row.getDouble(0) / row.getDouble(1)
    (r2, row.getDouble(2))
  }

  /** M8: persist model + metadata row (the `ml_models` collection shape,
    * FIXTURES §1.4). Best-model lookup = O3 top-1 by r2.
    */
  def saveModel(spark: SparkSession, tm: TrainedModel, symbol: String,
      modelName: String, registryDir: String): Unit = {
    import spark.implicits._
    val path = s"$registryDir/artifacts/${symbol}_$modelName"
    tm.model.write.overwrite().save(path)
    Seq((symbol, modelName, path, tm.r2, tm.mse, tm.features.mkString(","),
      new java.sql.Timestamp(System.currentTimeMillis())))
      .toDF("symbol", "model_name", "model_path", "r2_score", "mse",
        "feature_columns", "training_date")
      .write.mode(SaveMode.Append).parquet(s"$registryDir/ml_models")
  }

  def bestModel(spark: SparkSession, registryDir: String, symbol: String): Option[(String, Double)] = {
    val meta = spark.read.parquet(s"$registryDir/ml_models")
      .filter(col("symbol") === symbol)
      .orderBy(col("r2_score").desc)
      .limit(1).collect()
    meta.headOption.map(r => (r.getAs[String]("model_path"), r.getAs[Double]("r2_score")))
  }

  /** O4 + predict path: latest feature row per symbol → model.transform. */
  def latestFeatures(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  def predict(spark: SparkSession, registryDir: String, symbol: String,
      latest: DataFrame, features: Seq[String]): DataFrame = {
    val (path, _) = bestModel(spark, registryDir, symbol).getOrElse(
      throw new IllegalArgumentException(
        s"no model registered for symbol '$symbol' in $registryDir/ml_models"))
    val model = LinearRegressionModel.load(path)
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .setHandleInvalid("skip")
      .transform(latest)
    model.transform(assembled)
      .withColumnRenamed("prediction", "predicted_price")
  }
}
