package graft.dist

import graft.bbha.Star
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{MinMaxScaler, PolynomialExpansion, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned execution-time predictor — the reference's one cost-based
  * physical scheduler (/root/reference/scripts/metaheuristics.py:105-166):
  * features `[star_n_features, n_samples, kernel_enc, optimizer_enc]`,
  * ordinal-encoded categoricals (unknown → −1), MinMax scaling of the
  * numeric pair, GradientBoostingRegressor — here the Spark ML natives
  * (StringIndexer / MinMaxScaler / PolynomialExpansion / GBTRegressor)
  * assembled into one PipelineModel.
  *
  * The reference loads pretrained pickles (not portable); this engine
  * closes the loop the reference leaves open ("to train future load
  * balancer models", core.py:247-248): [[LoadBalancerModel.train]]
  * consumes the accumulated experiment metrics (n_features / n_samples /
  * kernel / optimizer / execution time rows) and fits the same pipeline.
  * Prediction is driver-side over ≤ n_stars rows — negligible next to a
  * single fitness call.
  */
object LoadBalancerModel {

  case class SvmParameters(numberOfSamples: Int, kernel: String,
      optimizer: String)

  /** @param training rows: (n_features, n_samples, kernel, optimizer,
    *                 execution_time)
    */
  def train(spark: SparkSession, training: DataFrame,
      polyDegree: Option[Int] = None, useMinMax: Boolean = true,
      regressor: String = "gbt"): PipelineModel = {
    val reg = regressor match {
      case "gbt" => new GBTRegressor().setLabelCol("execution_time")
        .setFeaturesCol("features").setMaxIter(50).setMaxDepth(4).setSeed(42)
      case "linear" => new LinearRegression().setLabelCol("execution_time")
        .setFeaturesCol("features").setMaxIter(100)
      case other => throw new IllegalArgumentException(s"unknown regressor $other")
    }
    val stages = prepStages(useMinMax,
        if (polyDegree.isDefined) "features_raw" else "features") ++
      polyDegree.map(d => new PolynomialExpansion()
        .setInputCol("features_raw").setOutputCol("features").setDegree(d)).toSeq ++
      Seq(reg)
    new Pipeline().setStages(stages.toArray).fit(training)
  }

  /** The ONE feature-prep stage list (StringIndexer / MinMax /
    * assembler) — every variant, including the MLP pair, derives its
    * features from this builder, so the "byte-identical features"
    * invariant cannot drift between copies.
    */
  private def prepStages(useMinMax: Boolean,
      assemblerOut: String): Seq[org.apache.spark.ml.PipelineStage] = {
    val kernelIx = new StringIndexer().setInputCol("kernel")
      .setOutputCol("kernel_enc").setHandleInvalid("keep")
      .setStringOrderType("alphabetAsc")
    val optimizerIx = new StringIndexer().setInputCol("optimizer")
      .setOutputCol("optimizer_enc").setHandleInvalid("keep")
      .setStringOrderType("alphabetAsc")
    val numAssembler = new VectorAssembler()
      .setInputCols(Array("n_features", "n_samples")).setOutputCol("num_raw")
    val scaler = new MinMaxScaler().setInputCol("num_raw")
      .setOutputCol("num_scaled")
    val assembler = new VectorAssembler()
      .setInputCols(Array(if (useMinMax) "num_scaled" else "num_raw",
        "kernel_enc", "optimizer_enc"))
      .setOutputCol(assemblerOut)
    Seq(kernelIx, optimizerIx, numAssembler) ++
      (if (useMinMax) Seq(scaler) else Nil) ++ Seq(assembler)
  }

  /** The ≤ n_stars prediction frame, shared by every predictor. */
  private def starRows(spark: SparkSession, stars: Array[Star],
      params: SvmParameters): DataFrame = {
    import spark.implicits._
    stars.map(s => (s.idx, s.nSelected, params.numberOfSamples,
      params.kernel, params.optimizer)).toSeq
      .toDF("star_idx", "n_features", "n_samples", "kernel", "optimizer")
  }

  /** NN twin of the reference's `best_nn_model[_no_min_max].pkl`
    * (metaheuristics.py:92-102): the SAME StringIndexer/MinMax feature
    * prep as every other variant (fitted as a regressor-less pipeline),
    * then [[MlpRegressor]] on the collected (features, time) rows.
    * Training data is the accumulated metrics table — bounded per run —
    * so the collect here moves the same rows the reference pickles.
    */
  def trainMlp(spark: SparkSession, training: DataFrame,
      useMinMax: Boolean = true, hidden: Int = 100, maxIter: Int = 200,
      lr: Double = 1e-3, seed: Long = 42L): (PipelineModel, MlpRegressor.Model) = {
    val prep = trainPrep(training, useMinMax)
    val rows = prep.transform(training)
      .select(col("features"), col("execution_time").cast("double"))
      .collect()
    val xs = rows.map(_.getAs[org.apache.spark.ml.linalg.Vector](0).toArray)
    val ys = rows.map(_.getDouble(1))
    (prep, MlpRegressor.fit(xs, ys, hidden, maxIter, lr, seed))
  }

  /** Per-star predicted seconds through the MLP: prep pipeline on the
    * ≤ n_stars rows, pure driver-side forward pass.
    */
  def predictMlp(spark: SparkSession, prep: PipelineModel,
      mlp: MlpRegressor.Model, stars: Array[Star],
      params: SvmParameters): Map[Int, Double] = {
    prep.transform(starRows(spark, stars, params))
      .select(col("star_idx"), col("features"))
      .collect()
      .map(r => r.getInt(0) ->
        mlp.predict(r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray))
      .toMap
  }

  /** The shared feature-prep stages fitted WITHOUT a regressor, so the
    * MLP variants see byte-identical features to the Spark ML ones. */
  private def trainPrep(training: DataFrame, useMinMax: Boolean): PipelineModel = {
    new Pipeline().setStages(prepStages(useMinMax, "features").toArray)
      .fit(training)
  }

  /** The debug model-comparison report (`report_all_load_balancer_models`,
    * /root/reference/scripts/metaheuristics.py:29-102): per-star predicted
    * times from every pipeline variant, one log line each. The reference
    * loads 10 pretrained pickles (linear d∈{1,2,3} ±MinMax, gradient
    * booster ±MinMax, NN ±MinMax); this engine trains all 10 variants
    * from the accumulated metrics instead — linear d∈{1,2,3} ±MinMax,
    * GBT ±MinMax, and the [[MlpRegressor]] NN pair (Spark ML ships no
    * MLP regressor, so the NN twin is the in-repo exact-math one).
    * Log-only and opt-in — debug cost, never on the scheduling path.
    */
  def reportAllModels(spark: SparkSession, training: DataFrame,
      stars: Array[Star], params: SvmParameters,
      log: String => Unit = s => System.err.println(s"[load-balancer] $s")): Unit = {
    val variants: Seq[(String, Option[Int], Boolean, String)] = Seq(
      ("Linear d=1 with MinMax", None, true, "linear"),
      ("Linear d=1 NO MinMax", None, false, "linear"),
      ("Linear d=2 with MinMax", Some(2), true, "linear"),
      ("Linear d=2 NO MinMax", Some(2), false, "linear"),
      ("Linear d=3 with MinMax", Some(3), true, "linear"),
      ("Linear d=3 NO MinMax", Some(3), false, "linear"),
      ("Gradient booster with MinMax", None, true, "gbt"),
      ("Gradient booster NO MinMax", None, false, "gbt"))
    def logTimes(label: String, timed: () => Map[Int, Double]): Unit = {
      val start = System.nanoTime()
      val times = timed()
      val diff = math.round((System.nanoTime() - start) / 1e5) / 1e4
      val byStar = times.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k: ${math.round(v * 1e4) / 1e4}" }
        .mkString("{", ", ", "}")
      log(s"Predicted $label (in $diff seconds): $byStar")
    }
    variants.foreach { case (label, degree, minMax, reg) =>
      val model = train(spark, training, degree, minMax, reg)
      logTimes(label, () => predict(spark, model, stars, params))
    }
    Seq(("NN with MinMax", true), ("NN NO MinMax", false)).foreach {
      case (label, minMax) =>
        val (prep, mlp) = trainMlp(spark, training, minMax)
        logTimes(label, () => predictMlp(spark, prep, mlp, stars, params))
    }
  }

  /** Per-star predicted seconds (`predict_execution_times_svm`,
    * metaheuristics.py:105-153): one small driver-side DataFrame through
    * the pipeline.
    */
  def predict(spark: SparkSession, model: PipelineModel,
      stars: Array[Star], params: SvmParameters): Map[Int, Double] = {
    model.transform(starRows(spark, stars, params))
      .select(col("star_idx"), col("prediction"))
      .collect()
      .map(r => r.getInt(0) -> r.getDouble(1))
      .toMap
  }

  /** Balancer hook for [[FitnessExecutor]]: predict → guard negatives
    * (executor aborts like metaheuristics.py:261-269) → LPT bins.
    */
  def balancer(spark: SparkSession, model: PipelineModel,
      params: SvmParameters): Array[Star] => Map[Int, Double] =
    stars => predict(spark, model, stars, params)
}
