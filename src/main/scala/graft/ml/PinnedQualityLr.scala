package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L80 — the model-based quality classifier (the one standard curation
  * stage rule/LM scores don't cover): GPT-3 (Brown et al. 2020, appendix A)
  * and LLaMA (Touvron et al. 2023 §2.1) filter CommonCrawl with a TRAINED
  * linear classifier ("does this page look like the reference corpus?"),
  * not only hand rules (l15) or LM perplexity (l32/l39/l43). This is the
  * first op bridging the H family (MLlib estimators, ml/Train.scala) and
  * the L family (corpus curation): MLlib `LogisticRegression` is fit ONCE
  * on deterministic weak labels over the l15 feature vector, the fitted
  * coefficients are FROZEN here as literals (the l44 pinned-rules idiom),
  * and the declared `l80_quality_classifier` query scores any corpus with
  * the frozen weights — sigmoid(w·x + b) as a pure per-row expression the
  * DuckDB oracle replays exactly.
  *
  * Train-once / score-everywhere is not a test convenience — it IS the
  * production deployment: the published pipelines train the filter on a
  * small labeled set, then score the 100 TB crawl with frozen weights
  * (retraining per-run would make corpus membership non-reproducible).
  * Scoring cost at 100 TB: the l15 metric scan the pipeline already pays,
  * plus four multiply-adds and one exp per row — zero shuffles, no fit
  * pass, no broadcast (the model is four literals).
  *
  * Weak labels (the "wiki-like" proxy, trainable without human labels):
  * positive = `lang = 'en' AND l15-keep` — the reference-corpus slice a
  * curation team would bootstrap from. The classes OVERLAP in feature
  * space (non-en docs share feature profiles with en docs), so the MLE is
  * finite; a small ridge term makes the optimum unique and the refit
  * bit-stable (TrainSpec pins refit ≡ frozen to 1e-6).
  *
  * FEATURES (order matters — the dot product below folds left-to-right in
  * this order on BOTH engines, so cross-engine floats are bit-identical):
  *   x1 = round(ln(n_tokens), 6)        — length, log scale
  *   x2 = dup_bigram_frac   (6 dp)      — l15 repetition metric
  *   x3 = top_bigram_frac   (6 dp)      — l15 repetition metric
  *   x4 = short_token_frac  (6 dp)      — l15 fragment metric
  * All four are the ROUNDED metrics both engines already hash-agree on
  * (l15's oracle), so the classifier's inputs carry no cross-engine noise.
  */
object PinnedQualityLr {

  /** Hyperparameters of the frozen fit — also what [[fit]] uses, so the
    * spec's refit runs the EXACT estimator the pinned values came from.
    * regParam: small ridge (unique optimum, stable refit); standardization
    * on (conditioning only — the reported coefficients are in ORIGINAL
    * feature units, MLlib de-standardizes them). */
  val MaxIter = 200
  val Tol = 1e-12
  val RegParam = 1e-4

  val FeatureCols: Seq[String] =
    Seq("x_log_tokens", "dup_bigram_frac", "top_bigram_frac", "short_token_frac")

  /** The frozen model: fit on /root/testdata/sf0.001 by [[QualityLrFit]]
    * (deterministic: fixed fixture, fixed partitioning-insensitive
    * treeAggregate objective, ridge-unique optimum) — TrainSpec re-derives
    * these from the same fixture and asserts equality to 1e-6. */
  val Intercept: Double = -0.21287580818579777
  val Weights: Seq[Double] = Seq(
    0.27889214833903064, // x_log_tokens
    -33.59719829293843, // dup_bigram_frac
    -31.253847062078957, // top_bigram_frac
    -4.2224991337325415 // short_token_frac
  )

  /** Weak-label column over the l15 quality frame: reference-class = an
    * English doc the rule filter keeps. */
  def weakLabel: Column =
    (col("lang") === "en" && col("keep") === 1).cast("double")

  /** The feature frame over l15's quality metrics (qualityCached /
    * qualityMetricsFrame output): adds x_log_tokens, keeps the rounded
    * metric columns as-is. */
  def featureFrame(quality: DataFrame): DataFrame =
    quality.withColumn("x_log_tokens", round(log(col("n_tokens").cast("double")), 6))

  /** The frozen-coefficient margin w·x + b, folded left-to-right in
    * [[FeatureCols]] order — the EXACT association the oracle SQL uses, so
    * the sign test (wiki_like) and the 6-dp score agree bit-for-bit. */
  def margin: Column =
    FeatureCols.zip(Weights).foldLeft(lit(Intercept)) {
      case (acc, (c, w)) => acc + col(c) * lit(w)
    }

  /** score = sigmoid(margin), 6 dp. */
  def score: Column = round(lit(1.0) / (lit(1.0) + exp(-margin)), 6)

  /** The SQL form of [[margin]] — identical literal text and fold order. */
  def marginSql: String =
    FeatureCols.zip(Weights).foldLeft(Intercept.toString) {
      case (acc, (c, w)) => s"($acc + $c * $w)"
    }

  /** The trainer the frozen values came from — the spec refits with it and
    * pins refit ≡ frozen. `quality` is the l15 metric frame ([[featureFrame]]
    * is applied here). */
  def fit(quality: DataFrame): LogisticRegressionModel = {
    val data = featureFrame(quality)
      .withColumn("label", weakLabel)
      .na.drop(FeatureCols :+ "label")
    val assembled = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("features")
      .transform(data)
    new LogisticRegression()
      .setMaxIter(MaxIter).setTol(Tol).setRegParam(RegParam)
      .setElasticNetParam(0.0).setStandardization(true)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(assembled)
  }
}

/** Derivation tool for the pinned values: prints the fitted intercept +
  * coefficients for a given sfDir (default the sf0.001 fixture the frozen
  * model is declared against). Rerun after any change to the feature
  * definition and paste the output into [[PinnedQualityLr]]. */
object QualityLrFit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.prep(spark)
    val quality = graft.queries.LlmQueries.qualityMetricsFrameFor(spark, sfDir)
    val m = PinnedQualityLr.fit(quality)
    println(s"intercept = ${m.intercept}")
    PinnedQualityLr.FeatureCols.zip(m.coefficients.toArray).foreach {
      case (c, w) => println(s"$c = $w")
    }
    spark.stop()
  }
}
