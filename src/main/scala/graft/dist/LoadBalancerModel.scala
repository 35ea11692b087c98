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
    val kernelIx = new StringIndexer().setInputCol("kernel")
      .setOutputCol("kernel_enc").setHandleInvalid("keep")
      .setStringOrderType("alphabetAsc")
    val optimizerIx = new StringIndexer().setInputCol("optimizer")
      .setOutputCol("optimizer_enc").setHandleInvalid("keep")
      .setStringOrderType("alphabetAsc")
    val numAssembler = new VectorAssembler()
      .setInputCols(Array("n_features", "n_samples")).setOutputCol("num_raw")
    val scaler = new MinMaxScaler().setInputCol("num_raw").setOutputCol("num_scaled")
    val assembler = new VectorAssembler()
      .setInputCols(Array(if (useMinMax) "num_scaled" else "num_raw",
        "kernel_enc", "optimizer_enc"))
      .setOutputCol(if (polyDegree.isDefined) "features_raw" else "features")
    val reg = regressor match {
      case "gbt" => new GBTRegressor().setLabelCol("execution_time")
        .setFeaturesCol("features").setMaxIter(50).setMaxDepth(4).setSeed(42)
      case "linear" => new LinearRegression().setLabelCol("execution_time")
        .setFeaturesCol("features").setMaxIter(100)
      case other => throw new IllegalArgumentException(s"unknown regressor $other")
    }
    val stages = Seq(kernelIx, optimizerIx, numAssembler) ++
      (if (useMinMax) Seq(scaler) else Nil) ++ Seq(assembler) ++
      polyDegree.map(d => new PolynomialExpansion()
        .setInputCol("features_raw").setOutputCol("features").setDegree(d)).toSeq ++
      Seq(reg)
    new Pipeline().setStages(stages.toArray).fit(training)
  }

  /** The debug model-comparison report (`report_all_load_balancer_models`,
    * /root/reference/scripts/metaheuristics.py:29-102): per-star predicted
    * times from every pipeline variant, one log line each. The reference
    * loads 10 pretrained pickles (linear d∈{1,2,3} ±MinMax, gradient
    * booster ±MinMax, NN ±MinMax); this engine trains its variants from
    * the accumulated metrics instead — linear d∈{1,2,3} ±MinMax and GBT
    * ±MinMax. (Spark ML ships no MLP *regressor*, so the two NN pickles
    * have no twin; the GBT pair is the reference's own best model.)
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
    variants.foreach { case (label, degree, minMax, reg) =>
      val model = train(spark, training, degree, minMax, reg)
      val start = System.nanoTime()
      val times = predict(spark, model, stars, params)
      val diff = math.round((System.nanoTime() - start) / 1e5) / 1e4
      val byStar = times.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k: ${math.round(v * 1e4) / 1e4}" }
        .mkString("{", ", ", "}")
      log(s"Predicted $label (in $diff seconds): $byStar")
    }
  }

  /** Per-star predicted seconds (`predict_execution_times_svm`,
    * metaheuristics.py:105-153): one small driver-side DataFrame through
    * the pipeline.
    */
  def predict(spark: SparkSession, model: PipelineModel,
      stars: Array[Star], params: SvmParameters): Map[Int, Double] = {
    import spark.implicits._
    val rows = stars.map(s => (s.idx, s.nSelected, params.numberOfSamples,
      params.kernel, params.optimizer)).toSeq
      .toDF("star_idx", "n_features", "n_samples", "kernel", "optimizer")
    model.transform(rows)
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
