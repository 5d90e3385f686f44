package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.{HashingTF, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Learned model-based quality filter — the fasttext-style linear
  * classifier every large pretraining pipeline runs alongside the
  * rule-based pass (GPT-3 and LLaMA both gate web text on a linear
  * quality score over hashed text features). Labels here are the
  * rule-based Gopher filter's own keep decision (`quality_filter`'s
  * `passes` column) — DISTILLATION of the heuristic filter into a
  * smooth scorer, the standard bootstrap when no curated positive
  * corpus exists: the heuristics label cheaply at corpus scale, the
  * learned model generalizes them and yields a rankable probability
  * instead of a hard AND-of-thresholds.
  *
  * Features: hashed unigram counts (HashingTF, Murmur3 — deterministic,
  * vocabulary-free, fixed 4096-dim width at any corpus size) plus the
  * four Gopher statistics as dense dimensions. Training runs on a
  * hash-deterministic 80% fold (pmod(xxhash64(doc_id), 10) < 8 —
  * append-stable, no sampling RNG); at 100 TB it runs on a sample of
  * that fold (a 4100-dim linear model converges far below corpus size,
  * exactly like the IVF codebook trains on a sample). Scoring is one
  * broadcast of the ~4 KiB coefficient vector and a per-row dot
  * product — zero shuffle. The model artifact is memoized per
  * (dir, source-mtime) like [[IvfCodebook.codebookPath]] so a
  * regenerated fixture retrains. Rows-only query key (L-BFGS float
  * output is partition-order-dependent); the contract — holdout
  * agreement with the rule filter ≥ 0.9 and in-JVM determinism — is
  * pinned in MlParitySpec.
  */
object QualityClassifier {

  val numFeatures = 1 << 12

  /** The Gopher rule statistics + the rule filter's keep decision —
    * STRUCTURALLY the same implementation `quality_filter` serves
    * ([[graft.operators.ScaleOps.withQualityRules]]), so the distillation
    * label cannot drift from the rule filter it distills.
    */
  def withRuleLabel(docs: DataFrame): DataFrame =
    graft.operators.ScaleOps.withQualityRules(docs)
      .withColumnRenamed("passes", "rule_passes")

  /** Hashed bag-of-words + the four rule statistics as one vector. */
  def featurize(docs: DataFrame): DataFrame = {
    val tf = new HashingTF().setInputCol("_toks").setOutputCol("_tf")
      .setNumFeatures(numFeatures)
    val assembled = new VectorAssembler()
      .setInputCols(Array("_tf", "n_words", "mean_word_len",
        "stopword_frac", "distinct_bigram_ratio"))
      .setOutputCol("features")
      .transform(tf.transform(
        withRuleLabel(docs).withColumn("_toks", split(col("text"), " "))))
    assembled.drop("_toks", "_tf")
  }

  /** Hash-deterministic train-fold flag (80%): stable under appends and
    * re-runs, mirrors the `dataset_split` recipe.
    */
  def trainFold(docs: DataFrame): DataFrame =
    docs.withColumn("is_train", pmod(xxhash64(col("doc_id")), lit(10)) < 8)

  def train(docs: DataFrame): LogisticRegressionModel = {
    val fit = featurize(trainFold(docs).filter(col("is_train")))
      .withColumn("label", col("rule_passes").cast(DoubleType))
    new LogisticRegression().setMaxIter(200).setRegParam(1e-4)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(fit)
  }


  /** Memoized model for `dir`'s documents table (offline artifact, same
    * staleness stamp recipe as the IVF codebook).
    */
  def model(spark: SparkSession, dir: String): LogisticRegressionModel =
    graft.ArtifactMemo.cached(
      s"${graft.ArtifactMemo.stamp(dir, "documents.parquet")}#quality_lr") {
      train(graft.Tables.documents(spark, dir))
    }

  /** Score every document: keep-probability, binary keep decision, fold
    * tag and the rule label (for offline agreement audits). Per-row work
    * only — the coefficients ride the plan as a broadcast model.
    */
  def score(m: LogisticRegressionModel, docs: DataFrame): DataFrame =
    m.transform(featurize(trainFold(docs)))
      .withColumn("p_keep", vector_to_array(col("probability")).getItem(1))
      .withColumn("keep", col("p_keep") > 0.5)
      .select(col("doc_id"), col("rule_passes"), col("is_train"),
        col("p_keep"), col("keep"))
}
