package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor,
  LinearRegression, LinearRegressionModel, RandomForestRegressionModel,
  RandomForestRegressor}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.ml.util.MLWritable
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

  /** A grid-searched member of the reference's model trio, ready for the
    * registry: a fitted MLlib model plus its held-out metrics.
    */
  case class TunedModel(modelType: String, model: Transformer with MLWritable,
      features: Seq[String], r2: Double, mse: Double)

  /** M6 full parity — the reference's 3-model grid search
    * (`ml_pipeline.py:90-104,182-197`): RandomForest over
    * {n_estimators, max_depth}, a gradient-boosted model over
    * {n_estimators, learning_rate} (LightGBM → MLlib `GBTRegressor`,
    * SURVEY §2.10 M6), and plain LinearRegression with no grid — each
    * tuned by 3-fold cross-validated grid search scored on r² (sklearn's
    * default regressor scoring), then evaluated on the held-out test
    * fold. Declared divergence: MLlib's `CrossValidator` folds are random
    * (seeded) splits, not sklearn's `TimeSeriesSplit` ordered folds — the
    * outer train/test split stays ordered via [[timeSeriesSplit]].
    *
    * Grid defaults mirror the reference; pass smaller grids for tests.
    * Scale note: CV fits |grid|×folds models; each fit is a distributed
    * job, so the search parallelizes per-model via `setParallelism` while
    * the data stays partitioned — no driver-side training loop.
    */
  def trainTrioCv(train: DataFrame, test: DataFrame, features: Seq[String],
      label: String = "future_close", numFolds: Int = 3,
      rfTrees: Seq[Int] = Seq(50, 100), rfDepth: Seq[Int] = Seq(10, 20),
      gbtIters: Seq[Int] = Seq(50, 100), gbtLr: Seq[Double] = Seq(0.05, 0.1))
      : Seq[TunedModel] = {
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .setHandleInvalid("skip")
    // CV re-reads the assembled frame |grid|×folds times — cache it for
    // the duration of the search (bounded: one assembled copy of train)
    val trainA = assembler.transform(train).cache()
    // test side is evaluated once per trio member — cache it too
    val testA = assembler.transform(test).cache()
    try {
      val evaluator = new RegressionEvaluator()
        .setLabelCol(label).setPredictionCol("prediction").setMetricName("r2")
      def crossValidated(est: org.apache.spark.ml.Estimator[_ <: org.apache.spark.ml.Model[_]],
          grid: Array[org.apache.spark.ml.param.ParamMap]): Transformer with MLWritable =
        new CrossValidator()
          .setEstimator(est).setEvaluator(evaluator)
          .setEstimatorParamMaps(grid)
          .setNumFolds(numFolds).setSeed(42L).setParallelism(2)
          .fit(trainA).bestModel.asInstanceOf[Transformer with MLWritable]

      val rf = new RandomForestRegressor()
        .setFeaturesCol("features").setLabelCol(label).setSeed(42L)
      val rfBest = crossValidated(rf, new ParamGridBuilder()
        .addGrid(rf.numTrees, rfTrees).addGrid(rf.maxDepth, rfDepth).build())

      val gbt = new GBTRegressor()
        .setFeaturesCol("features").setLabelCol(label).setSeed(42L)
      val gbtBest = crossValidated(gbt, new ParamGridBuilder()
        .addGrid(gbt.maxIter, gbtIters).addGrid(gbt.stepSize, gbtLr).build())

      // linear member has an empty grid — fit directly, like the reference
      val lrBest = new LinearRegression()
        .setFeaturesCol("features").setLabelCol(label)
        .setStandardization(true).setMaxIter(50)
        .fit(trainA)

      Seq(("random_forest", rfBest: Transformer with MLWritable),
          ("gbt", gbtBest), ("linear_regression", lrBest))
        .map { case (name, m) =>
          val (r2, mse) = regressionMetrics(m.transform(testA), label, "prediction")
          TunedModel(name, m, features, r2, mse)
        }
    } finally { trainA.unpersist(); testA.unpersist(); () }
  }

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
    * FIXTURES §1.4). Best-model lookup = O3 top-1 by r2. The row carries a
    * `model_type` discriminator so [[predict]] can dispatch the right
    * MLlib loader — `model_name` is a free-form label, not a type.
    */
  def saveModel(spark: SparkSession, tm: TrainedModel, symbol: String,
      modelName: String, registryDir: String): Unit =
    registerModel(spark, TunedModel("linear_regression", tm.model, tm.features,
      tm.r2, tm.mse), symbol, modelName, registryDir)

  /** Registry write for any trio member (tree models included). */
  def registerModel(spark: SparkSession, tm: TunedModel, symbol: String,
      modelName: String, registryDir: String): Unit = {
    import spark.implicits._
    require(loaders.contains(tm.modelType),
      s"unknown model_type '${tm.modelType}' — predict could never load it " +
        s"(known: ${loaders.keys.mkString(", ")})")
    val path = s"$registryDir/artifacts/${symbol}_$modelName"
    tm.model.write.overwrite().save(path)
    Seq((symbol, modelName, tm.modelType, path, tm.r2, tm.mse,
      tm.features.mkString(","),
      new java.sql.Timestamp(System.currentTimeMillis())))
      .toDF("symbol", "model_name", "model_type", "model_path", "r2_score",
        "mse", "feature_columns", "training_date")
      .write.mode(SaveMode.Append).parquet(s"$registryDir/ml_models")
  }

  /** model_type → loader. GBT/RF artifacts are directories of trees; all
    * three MLlib loaders share the same path layout as save().
    */
  private val loaders: Map[String, String => Transformer] = Map(
    "linear_regression" -> (p => LinearRegressionModel.load(p)),
    "random_forest" -> (p => RandomForestRegressionModel.load(p)),
    "gbt" -> (p => GBTRegressionModel.load(p)))

  def bestModel(spark: SparkSession, registryDir: String, symbol: String)
      : Option[(String, String, Double)] = {
    // mergeSchema: a registry can MIX files written before the model_type
    // discriminator existed with files written after (Append mode) — a
    // single-footer schema would either drop the column or null it for the
    // old rows. Merged read + coalesce stamps old rows as linear, which is
    // the only type that existed before the discriminator.
    val reg = spark.read.option("mergeSchema", "true").parquet(s"$registryDir/ml_models")
    val typed =
      if (reg.columns.contains("model_type"))
        reg.withColumn("model_type",
          coalesce(col("model_type"), lit("linear_regression")))
      else reg.withColumn("model_type", lit("linear_regression"))
    val meta = typed
      .filter(col("symbol") === symbol)
      .orderBy(col("r2_score").desc)
      .limit(1).collect()
    meta.headOption.map(r => (r.getAs[String]("model_path"),
      r.getAs[String]("model_type"), r.getAs[Double]("r2_score")))
  }

  /** O4 + predict path: latest feature row per symbol → model.transform. */
  def latestFeatures(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  def predict(spark: SparkSession, registryDir: String, symbol: String,
      latest: DataFrame, features: Seq[String]): DataFrame = {
    val (path, modelType, _) = bestModel(spark, registryDir, symbol).getOrElse(
      throw new IllegalArgumentException(
        s"no model registered for symbol '$symbol' in $registryDir/ml_models"))
    val model = loaders.getOrElse(modelType,
      throw new IllegalArgumentException(s"unloadable model_type '$modelType' at $path"))(path)
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .setHandleInvalid("skip")
      .transform(latest)
    model.transform(assembled)
      .withColumnRenamed("prediction", "predicted_price")
  }
}
