package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ml.MlParity

class MlParitySpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic linear data: future_close is an exact linear function of the
    * features, so LinearRegression must recover it (r2 ≈ 1).
    */
  private def mkData(n: Int) = {
    (1 to n).map { i =>
      val x1 = i.toDouble; val x2 = (i % 7).toDouble
      ("S", f"2024-${1 + i / 28}%02d-${1 + i % 28}%02d", x1, x2, 3.0 * x1 + 5.0)
    }.toDF("symbol", "d", "x1", "x2", "close")
      .withColumn("trading_date", to_date(col("d"))).drop("d")
  }

  test("M1/M2: future target shifts -5 within symbol and drops tail") {
    val out = MlParity.withFutureTarget(mkData(20), Seq("trading_date"))
    assert(out.count() == 15)
    val first = out.orderBy("trading_date").select("close", "future_close").head
    // future_close of row i = close of row i+5 = 3*(i+5) + 5
    assert(first.getDouble(1) == 3.0 * 6 + 5.0)
  }

  test("M3: feature selection keeps numerics, drops excluded") {
    val cols = MlParity.featureColumns(mkData(5), Set("close"))
    assert(cols.toSet == Set("x1", "x2"))
  }

  test("M4: time-series split is ordered with last fold as test") {
    val (train, test) = MlParity.timeSeriesSplit(mkData(100), Seq("trading_date"))
    assert(train.count() == 80 && test.count() == 20)
    val maxTrain = train.agg(max("trading_date")).head.getDate(0)
    val minTest = test.agg(min("trading_date")).head.getDate(0)
    assert(maxTrain.before(minTest))
  }

  test("M6/M7: linear model recovers exact linear relation (r2 ~ 1)") {
    val data = MlParity.withFutureTarget(mkData(120), Seq("trading_date"))
    val tm = MlParity.trainLinear(data, Seq("x1", "x2"))
    assert(tm.r2 > 0.9999, s"r2 = ${tm.r2}")
  }

  test("M8/O4: registry save, best-by-r2 lookup, predict path") {
    val dir = Files.createTempDirectory("graft_ml").toString
    val data = MlParity.withFutureTarget(mkData(120), Seq("trading_date"))
    val tm = MlParity.trainLinear(data, Seq("x1", "x2"))
    MlParity.saveModel(spark, tm, "S", "linear_regression", dir)
    // worse model second: best lookup must still pick the first
    MlParity.saveModel(spark, tm.copy(r2 = 0.1), "S", "bad_model", dir)
    val Some((path, mtype, r2)) = MlParity.bestModel(spark, dir, "S")
    assert(r2 == tm.r2 && path.contains("linear_regression"))
    assert(mtype == "linear_regression")

    val latest = MlParity.latestFeatures(data, Seq("trading_date"))
    val pred = MlParity.predict(spark, dir, "S", latest, Seq("x1", "x2"))
    val p = pred.select("predicted_price").head.getDouble(0)
    val expected = latest.select("future_close").head.getDouble(0)
    assert(math.abs(p - expected) / expected < 1e-6, s"pred $p vs $expected")
  }

  test("M6: random forest learns the monotone relation on held-out data") {
    val data = MlParity.withFutureTarget(mkData(200), Seq("trading_date"))
    val (train, test) = MlParity.timeSeriesSplit(data, Seq("trading_date"))
    val (_, r2, mse) = MlParity.trainForest(train, test, Seq("x1", "x2"))
    // trees extrapolate poorly on a trend, but must beat the mean baseline
    // hands-down on interpolatable structure; sanity: finite + mse bounded
    assert(!r2.isNaN && mse >= 0.0)
    val (_, r2In, _) = MlParity.trainForest(train, train, Seq("x1", "x2"))
    assert(r2In > 0.95, s"in-sample r2 $r2In")
  }

  test("M6: CV grid search trains the full trio; tree models round-trip the registry") {
    val data = MlParity.withFutureTarget(mkData(200), Seq("trading_date"))
    val (train, test) = MlParity.timeSeriesSplit(data, Seq("trading_date"))
    // reference grid shape, shrunk for test runtime (2 RF combos, 1 GBT)
    val trio = MlParity.trainTrioCv(train, test, Seq("x1", "x2"),
      rfTrees = Seq(5), rfDepth = Seq(3, 5), gbtIters = Seq(5), gbtLr = Seq(0.1))
    assert(trio.map(_.modelType).toSet ==
      Set("random_forest", "gbt", "linear_regression"))
    trio.foreach(t => assert(!t.r2.isNaN && t.mse >= 0.0, s"${t.modelType} metrics"))
    // exact linear data: the linear member must dominate held-out r2
    val byType = trio.map(t => t.modelType -> t).toMap
    assert(byType("linear_regression").r2 > 0.9999)

    // registry round-trip with the discriminator: a TREE model registered as
    // best must load through the dispatched loader, not the linear one
    val dir = Files.createTempDirectory("graft_ml_cv").toString
    MlParity.registerModel(spark, byType("random_forest").copy(r2 = 0.99), "S", "rf_best", dir)
    MlParity.registerModel(spark, byType("linear_regression").copy(r2 = 0.5), "S", "lr_worse", dir)
    val Some((path, mtype, _)) = MlParity.bestModel(spark, dir, "S")
    assert(mtype == "random_forest" && path.contains("rf_best"))
    val latest = MlParity.latestFeatures(data, Seq("trading_date"))
    val pred = MlParity.predict(spark, dir, "S", latest, Seq("x1", "x2"))
    assert(!pred.select("predicted_price").head.getDouble(0).isNaN)
  }

  test("registry mixes pre-discriminator and typed files without losing model_type") {
    // round-1 registries have no model_type column; Append-mode growth puts
    // 7-column and 8-column parquet files in one directory. bestModel must
    // read BOTH schemas (mergeSchema) and stamp old rows linear, not null.
    val dir = Files.createTempDirectory("graft_ml_mixed").toString
    val data = MlParity.withFutureTarget(mkData(120), Seq("trading_date"))
    val tm = MlParity.trainLinear(data, Seq("x1", "x2"))
    // simulate an old row: same shape minus model_type
    val path = s"$dir/artifacts/S_legacy"
    tm.model.write.overwrite().save(path)
    Seq(("S", "legacy", path, 0.7, 0.1, "x1,x2",
      new java.sql.Timestamp(System.currentTimeMillis())))
      .toDF("symbol", "model_name", "model_path", "r2_score", "mse",
        "feature_columns", "training_date")
      .write.mode("append").parquet(s"$dir/ml_models")
    // new typed row with a WORSE score: legacy row must win and load
    MlParity.saveModel(spark, tm.copy(r2 = 0.2), "S", "lr_new", dir)
    val Some((bestPath, mtype, r2)) = MlParity.bestModel(spark, dir, "S")
    assert(bestPath == path && r2 == 0.7)
    assert(mtype == "linear_regression", s"legacy row must default to linear, got '$mtype'")
    val latest = MlParity.latestFeatures(data, Seq("trading_date"))
    val pred = MlParity.predict(spark, dir, "S", latest, Seq("x1", "x2"))
    assert(!pred.select("predicted_price").head.getDouble(0).isNaN)
  }

  test("M6: determinism — same seed, same CV winner and metrics") {
    val data = MlParity.withFutureTarget(mkData(150), Seq("trading_date"))
    val (train, test) = MlParity.timeSeriesSplit(data, Seq("trading_date"))
    def run() = MlParity.trainTrioCv(train, test, Seq("x1", "x2"),
      rfTrees = Seq(5), rfDepth = Seq(3), gbtIters = Seq(5), gbtLr = Seq(0.1))
      .map(t => (t.modelType, t.r2, t.mse))
    assert(run() == run())
  }

  test("M7: regressionMetrics matches hand computation") {
    val df = Seq((1.0, 1.1), (2.0, 1.9), (3.0, 3.2)).toDF("y", "yhat")
    val (r2, mse) = MlParity.regressionMetrics(df, "y", "yhat")
    val ssRes = 0.01 + 0.01 + 0.04
    val ssTot = 1.0 + 0.0 + 1.0
    assert(math.abs(r2 - (1 - ssRes / ssTot)) < 1e-9)
    assert(math.abs(mse - ssRes / 3) < 1e-9)
  }

  test("quality_classifier: distilled filter agrees with the rule filter on holdout") {
    val scored = Queries.all("quality_classifier").fn(spark, sf0001).cache()
    try {
      val hold = scored.filter(!col("is_train"))
      val n = hold.count().toDouble
      val agree = hold.filter(col("keep") === col("rule_passes")).count() / n
      val keepRate = hold.filter(col("rule_passes")).count() / n
      // the contract: the learned filter must beat the majority-class
      // baseline (~0.85 keep rate) by a real margin (measured 0.97 at
      // sf0.001, 0.99 at sf0.1)
      assert(agree >= 0.9, s"holdout agreement $agree (majority $keepRate)")
      // and the decision column must be exactly the 0.5 threshold on p
      assert(scored.filter(col("keep") !== (col("p_keep") > 0.5)).count() == 0)
    } finally { scored.unpersist(); () }
  }

  test("quality_classifier: in-JVM determinism — same memoized model, same scores") {
    val a = Queries.all("quality_classifier").fn(spark, sf0001).collect()
    val b = Queries.all("quality_classifier").fn(spark, sf0001).collect()
    assert(a.sameElements(b))
  }
}
