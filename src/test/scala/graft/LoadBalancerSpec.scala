package graft

import graft.bbha.{ImprovedBbha, Star}
import graft.dist.{FitnessExecutor, LoadBalancerModel}
import graft.fitness.FitnessResult
import org.scalatest.funsuite.AnyFunSuite

class ImprovedBbhaSpec extends AnyFunSuite {
  private def toyFitness(mask: Array[Int]): Double =
    mask.take(3).sum - 0.01 * mask.sum

  val cfg = ImprovedBbha.Config(nStars = 8, nIterations = 10,
    randomState = Some(5L))

  test("coefficient validation matches the paper grid") {
    intercept[IllegalArgumentException] {
      ImprovedBbha.run(cfg.copy(coeff1 = 9.9), 10, toyFitness)
    }
    intercept[IllegalArgumentException] {
      ImprovedBbha.run(cfg.copy(coeff2 = 0.7), 10, toyFitness)
    }
  }

  test("deterministic under a fixed seed and improves the objective") {
    val a = ImprovedBbha.run(cfg, 10, toyFitness)
    val b = ImprovedBbha.run(cfg, 10, toyFitness)
    assert(a.bestMask.toSeq == b.bestMask.toSeq)
    assert(a.bestFitness >= 1.0, s"fitness ${a.bestFitness}")
    assert(a.bestMask.forall(v => v == 0 || v == 1))
  }
}

class LoadBalancerModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("GBT pipeline learns a feature-count cost model; bins balance") {
    import spark.implicits._
    val rng = new scala.util.Random(4)
    // synthetic history: time grows quadratically with n_features
    val hist = (1 to 300).map { _ =>
      val f = 1 + rng.nextInt(50)
      val s = 100
      val t = 0.01 * f * f + 0.5 + rng.nextGaussian() * 0.05
      (f, s, "linear", "avltree", t)
    }.toDF("n_features", "n_samples", "kernel", "optimizer", "execution_time")
    val model = LoadBalancerModel.train(spark, hist)

    val stars = Array.tabulate(12) { i =>
      Star(i, Array.tabulate(50)(j => if (j < (i + 1) * 4) 1 else 0))
    }
    val params = LoadBalancerModel.SvmParameters(100, "linear", "avltree")
    val times = LoadBalancerModel.predict(spark, model, stars, params)
    assert(times.size == 12)
    // bigger subsets must predict as slower (monotone trend on extremes)
    assert(times(11) > times(0), s"t11=${times(11)} t0=${times(0)}")
    // unknown kernel must not throw (handleInvalid=keep ≙ unknown −1)
    val unknown = LoadBalancerModel.predict(spark, model, stars.take(2),
      params.copy(kernel = "mystery"))
    assert(unknown.size == 2)

    // LPT bins over predictions are balanced within the largest item
    val bins = graft.dist.LoadBalancer.binPack(times, 3)
    val loads = bins.groupBy(_._2).view.mapValues(_.keys.map(times).sum)
    assert(loads.values.max - loads.values.min <= times.values.max + 1e-9)
  }

  test("debug report enumerates every pipeline variant (metaheuristics.py:29-102)") {
    import spark.implicits._
    val rng = new scala.util.Random(8)
    val hist = (1 to 60).map { _ =>
      val f = 1 + rng.nextInt(30)
      (f, 100, "linear", "avltree", 0.02 * f + rng.nextGaussian() * 0.01)
    }.toDF("n_features", "n_samples", "kernel", "optimizer", "execution_time")
    val stars = Array.tabulate(3)(i =>
      Star(i, Array.tabulate(30)(j => if (j <= i * 10) 1 else 0)))
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    LoadBalancerModel.reportAllModels(spark, hist, stars,
      LoadBalancerModel.SvmParameters(100, "linear", "avltree"), lines += _)
    val expected = Seq(
      "Linear d=1 with MinMax", "Linear d=1 NO MinMax",
      "Linear d=2 with MinMax", "Linear d=2 NO MinMax",
      "Linear d=3 with MinMax", "Linear d=3 NO MinMax",
      "Gradient booster with MinMax", "Gradient booster NO MinMax",
      "NN with MinMax", "NN NO MinMax")
    assert(lines.size == expected.size)
    expected.zip(lines).foreach { case (label, line) =>
      assert(line.contains(s"Predicted $label"), line)
      // one rounded prediction per star, reference log shape
      assert(line.matches(""".*\{0: -?[\d.]+, 1: -?[\d.]+, 2: -?[\d.]+\}"""), line)
    }
  }

  test("MLP regressor learns a nonlinear cost curve the linear model cannot") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // quadratic time law — d=1 linear is structurally unable to fit it
    val data = (1 to 400).map { _ =>
      val f = 1 + rng.nextInt(40)
      (f, 100, "linear", "avltree", 0.01 * f * f + 0.2)
    }
    val hist = data.toDF("n_features", "n_samples", "kernel", "optimizer",
      "execution_time")
    val (prep, mlp) = LoadBalancerModel.trainMlp(spark, hist, useMinMax = true,
      hidden = 32, maxIter = 4000, lr = 1e-2)
    val linear = LoadBalancerModel.train(spark, hist, None, true, "linear")
    val stars = Array.tabulate(8)(i =>
      Star(i, Array.tabulate(40)(j => if (j < (i + 1) * 5) 1 else 0)))
    val params = LoadBalancerModel.SvmParameters(100, "linear", "avltree")
    val mlpT = LoadBalancerModel.predictMlp(spark, prep, mlp, stars, params)
    val linT = LoadBalancerModel.predict(spark, linear, stars, params)
    def mse(pred: Map[Int, Double]): Double = stars.map { s =>
      val truth = 0.01 * s.nSelected * s.nSelected + 0.2
      val e = pred(s.idx) - truth; e * e
    }.sum / stars.length
    assert(mse(mlpT) < mse(linT) / 4,
      s"mlp mse ${mse(mlpT)} vs linear ${mse(linT)}")
    // monotone on the extremes like every other predictor in the report
    assert(mlpT(7) > mlpT(0), s"t7=${mlpT(7)} t0=${mlpT(0)}")
  }

  test("MLP fit is deterministic under a fixed seed") {
    val rng = new scala.util.Random(3)
    val xs = Array.fill(120)(Array.fill(4)(rng.nextDouble()))
    val ys = xs.map(x => 2 * x(0) - x(1) + 0.5 * x(2) * x(2))
    val a = graft.dist.MlpRegressor.fit(xs, ys, hidden = 16, maxIter = 4000,
      lr = 1e-2)
    val b = graft.dist.MlpRegressor.fit(xs, ys, hidden = 16, maxIter = 4000,
      lr = 1e-2)
    val probe = Array(0.3, 0.7, 0.1, 0.9)
    assert(a.predict(probe) == b.predict(probe))
    // and it actually learned: far better than predicting the mean
    val meanY = ys.sum / ys.length
    val sse = xs.zip(ys).map { case (x, y) => val e = a.predict(x) - y; e * e }.sum
    val sst = ys.map(y => (y - meanY) * (y - meanY)).sum
    assert(sse < 0.1 * sst, s"R2 too low: sse=$sse sst=$sst")
  }
}
