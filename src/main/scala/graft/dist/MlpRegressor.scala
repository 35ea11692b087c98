package graft.dist

/** Single-hidden-layer MLP regressor — the Spark-side twin of the two NN
  * load-balancer pickles the reference's debug comparison loads
  * (`best_nn_model.pkl` / `best_nn_model_no_min_max.pkl`,
  * /root/reference/scripts/metaheuristics.py:92-102). Spark ML ships an
  * MLP *classifier* but no regressor, so this closes the one documented
  * coverage drop with ~100 lines of exact, dependency-free driver math.
  *
  * Approximates the sklearn `MLPRegressor` *architecture* those pickles
  * were trained with — one ReLU hidden layer (default 100 units),
  * identity output, squared-error loss, Adam (lr 1e-3, β₁ 0.9, β₂ 0.999,
  * ε 1e-8), Glorot-uniform weight init from a caller-fixed seed — but
  * NOT its training defaults: sklearn uses minibatch Adam
  * (batch_size=min(200,n)), L2 penalty alpha=1e-4, and also
  * Glorot-initialises biases, where this trains full-batch,
  * unregularised, zero-bias-init. Parity with the reference pickles is
  * therefore functional (same model family and capacity), not
  * weight-for-weight.
  *
  * Scale posture: this trains DRIVER-SIDE on the accumulated experiment
  * metrics table — at most a few thousand (n_features, n_samples, kernel,
  * optimizer, time) rows per experiment run, the same data volume the
  * reference round-trips through a pickle. The distributed side only
  * provides the feature prep (StringIndexer/MinMax pipeline in
  * [[LoadBalancerModel]]); nothing here ever touches a full table.
  */
object MlpRegressor {

  /** Immutable fitted weights; `predict` is pure so the model can ship
    * inside a broadcast or a balancer closure like any other predictor.
    */
  final case class Model(w1: Array[Array[Double]], b1: Array[Double],
      w2: Array[Double], b2: Double) extends Serializable {
    def predict(x: Array[Double]): Double = {
      var out = b2
      var h = 0
      while (h < w2.length) {
        var z = b1(h)
        val wh = w1(h)
        var j = 0
        while (j < wh.length) { z += wh(j) * x(j); j += 1 }
        if (z > 0) out += w2(h) * z
        h += 1
      }
      out
    }
  }

  /** Full-batch Adam on squared-error loss. Deterministic: same
    * (xs, ys, hyperparams, seed) ⇒ bit-identical model.
    */
  def fit(xs: Array[Array[Double]], ys: Array[Double], hidden: Int = 100,
      maxIter: Int = 200, lr: Double = 1e-3, seed: Long = 42L): Model = {
    require(xs.nonEmpty && xs.length == ys.length, "xs/ys must align")
    val d = xs(0).length
    val n = xs.length
    val rng = new java.util.Random(seed)
    def glorot(fanIn: Int, fanOut: Int): Double = {
      val lim = math.sqrt(6.0 / (fanIn + fanOut))
      (rng.nextDouble() * 2 - 1) * lim
    }
    val w1 = Array.fill(hidden, d)(glorot(d, hidden))
    val b1 = new Array[Double](hidden)
    val w2 = Array.fill(hidden)(glorot(hidden, 1))
    var b2 = 0.0

    // Adam moments, one slot per parameter group
    val mW1 = Array.ofDim[Double](hidden, d); val vW1 = Array.ofDim[Double](hidden, d)
    val mB1 = new Array[Double](hidden); val vB1 = new Array[Double](hidden)
    val mW2 = new Array[Double](hidden); val vW2 = new Array[Double](hidden)
    var mB2 = 0.0; var vB2 = 0.0
    val beta1 = 0.9; val beta2 = 0.999; val eps = 1e-8

    val z = new Array[Double](hidden) // pre-activation scratch
    var iter = 1
    while (iter <= maxIter) {
      // gradient accumulators
      val gW1 = Array.ofDim[Double](hidden, d)
      val gB1 = new Array[Double](hidden)
      val gW2 = new Array[Double](hidden)
      var gB2 = 0.0
      var i = 0
      while (i < n) {
        val x = xs(i)
        var pred = b2
        var h = 0
        while (h < hidden) {
          var s = b1(h)
          val wh = w1(h)
          var j = 0
          while (j < d) { s += wh(j) * x(j); j += 1 }
          z(h) = s
          if (s > 0) pred += w2(h) * s
          h += 1
        }
        val err = (pred - ys(i)) / n // d(MSE/2)/dpred, batch-averaged
        gB2 += err
        h = 0
        while (h < hidden) {
          if (z(h) > 0) {
            gW2(h) += err * z(h)
            val back = err * w2(h)
            gB1(h) += back
            val gh = gW1(h)
            var j = 0
            while (j < d) { gh(j) += back * x(j); j += 1 }
          }
          h += 1
        }
        i += 1
      }
      // Adam update with bias correction
      val c1 = 1 - math.pow(beta1, iter)
      val c2 = 1 - math.pow(beta2, iter)
      @inline def step(g: Double, m: Double, v: Double): (Double, Double, Double) = {
        val m2 = beta1 * m + (1 - beta1) * g
        val v2 = beta2 * v + (1 - beta2) * g * g
        (lr * (m2 / c1) / (math.sqrt(v2 / c2) + eps), m2, v2)
      }
      var h = 0
      while (h < hidden) {
        var j = 0
        while (j < d) {
          val (dw, m2, v2) = step(gW1(h)(j), mW1(h)(j), vW1(h)(j))
          w1(h)(j) -= dw; mW1(h)(j) = m2; vW1(h)(j) = v2
          j += 1
        }
        val (db, mb, vb) = step(gB1(h), mB1(h), vB1(h))
        b1(h) -= db; mB1(h) = mb; vB1(h) = vb
        val (dw2, m2, v2) = step(gW2(h), mW2(h), vW2(h))
        w2(h) -= dw2; mW2(h) = m2; vW2(h) = v2
        h += 1
      }
      val (db2, mb2n, vb2n) = step(gB2, mB2, vB2)
      b2 -= db2; mB2 = mb2n; vB2 = vb2n
      iter += 1
    }
    Model(w1, b1, w2, b2)
  }
}
