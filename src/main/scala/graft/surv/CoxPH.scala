package graft.surv

/** Cox proportional-hazards regression via Newton–Raphson on the Breslow
  * partial likelihood.
  *
  * The reference fits `lifelines.CoxPHFitter` on a frame
  * `{E, T, group}` where `group` is the cluster id as a single *numeric*
  * covariate (/root/reference/scripts/main.py:88-98 — no one-hot), and
  * scores with `cph.score(df, scoring_method)` for
  * `concordance_index` | `log_likelihood`
  * (/root/reference/scripts/main.py:100-102). This implementation keeps
  * exactly that shape: p covariates (p = 1 for the clustering fitness),
  * Breslow tie handling, score = average partial log-likelihood or
  * C-index of the linear predictor.
  *
  * Runs driver/task-local over ≤ a few hundred samples — no Spark here;
  * the engine fans *whole fitness calls* out, not the Newton iterations.
  */
object CoxPH {

  case class Fit(beta: Array[Double], logLik: Double, iterations: Int,
      converged: Boolean)

  /** Newton–Raphson on the Breslow partial likelihood.
    * @param x n×p covariate matrix
    */
  def fit(x: Array[Array[Double]], y: Array[Clinical], maxIter: Int = 100,
      tol: Double = 1e-9): Fit = {
    val n = x.length
    val p = if (n == 0) 0 else x(0).length
    val beta = new Array[Double](p)
    var ll = logLikelihood(x, y, beta)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val (grad, hess) = gradHess(x, y, beta)
      // solve hess * delta = grad  (hess is the negative Hessian, p.d.)
      val delta = solve(hess, grad)
      var step = 1.0
      var improved = false
      while (step > 1e-4 && !improved) { // halving line search
        val cand = Array.tabulate(p)(k => beta(k) + step * delta(k))
        val candLl = logLikelihood(x, y, cand)
        if (candLl >= ll - 1e-12) {
          System.arraycopy(cand, 0, beta, 0, p)
          converged = math.abs(candLl - ll) < tol
          ll = candLl
          improved = true
        } else step /= 2
      }
      if (!improved) converged = true // stuck — accept current beta
      iter += 1
    }
    Fit(beta, ll, iter, converged)
  }

  /** Breslow partial log-likelihood at beta. */
  def logLikelihood(x: Array[Array[Double]], y: Array[Clinical],
      beta: Array[Double]): Double = {
    val n = x.length
    val eta = Array.tabulate(n)(i => dot(x(i), beta))
    // sort by time ascending; risk set = samples with t_j >= t_i
    val order = (0 until n).sortBy(i => y(i).time).toArray
    var ll = 0.0
    // iterate distinct event times; Breslow: each event at time t
    // contributes eta_i - log(sum_{t_j >= t} exp(eta_j))
    var k = n - 1
    var riskSum = 0.0
    // walk times descending, accumulating the risk-set denominator
    var idx = n - 1
    while (idx >= 0) {
      val t = y(order(idx)).time
      // add all samples with this time into the risk set
      while (k >= 0 && y(order(k)).time >= t) {
        riskSum += math.exp(eta(order(k)))
        k -= 1
      }
      if (y(order(idx)).event) ll += eta(order(idx)) - math.log(riskSum)
      idx -= 1
    }
    ll
  }

  /** Gradient and negative Hessian of the Breslow partial likelihood. */
  private def gradHess(x: Array[Array[Double]], y: Array[Clinical],
      beta: Array[Double]): (Array[Double], Array[Array[Double]]) = {
    val n = x.length
    val p = beta.length
    val eta = Array.tabulate(n)(i => dot(x(i), beta))
    val order = (0 until n).sortBy(i => y(i).time).toArray
    val grad = new Array[Double](p)
    val hess = Array.ofDim[Double](p, p)
    var s0 = 0.0
    val s1 = new Array[Double](p)
    val s2 = Array.ofDim[Double](p, p)
    var k = n - 1
    var idx = n - 1
    while (idx >= 0) {
      val t = y(order(idx)).time
      while (k >= 0 && y(order(k)).time >= t) {
        val i = order(k)
        val w = math.exp(eta(i))
        s0 += w
        var a = 0
        while (a < p) {
          s1(a) += w * x(i)(a)
          var b = 0
          while (b < p) { s2(a)(b) += w * x(i)(a) * x(i)(b); b += 1 }
          a += 1
        }
        k -= 1
      }
      if (y(order(idx)).event) {
        val i = order(idx)
        var a = 0
        while (a < p) {
          val ez1 = s1(a) / s0
          grad(a) += x(i)(a) - ez1
          var b = 0
          while (b < p) {
            hess(a)(b) += s2(a)(b) / s0 - ez1 * (s1(b) / s0)
            b += 1
          }
          a += 1
        }
      }
      idx -= 1
    }
    (grad, hess)
  }

  /** lifelines `score(df, 'log_likelihood')`: average partial
    * log-likelihood per observation.
    */
  def scoreLogLikelihood(fit: Fit, x: Array[Array[Double]],
      y: Array[Clinical]): Double =
    logLikelihood(x, y, fit.beta) / x.length

  /** lifelines `score(df, 'concordance_index')`: C-index of the linear
    * predictor (higher eta = higher risk).
    */
  def scoreConcordance(fit: Fit, x: Array[Array[Double]],
      y: Array[Clinical]): Double =
    CIndex.concordance(y, Array.tabulate(x.length)(i => dot(x(i), fit.beta)))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Gaussian elimination with partial pivoting (p ≤ a handful). */
  private def solve(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val p = v.length
    val a = Array.tabulate(p, p + 1)((i, j) => if (j < p) m(i)(j) else v(i))
    var col = 0
    while (col < p) {
      var piv = col
      var r = col + 1
      while (r < p) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val d = a(col)(col)
      if (math.abs(d) < 1e-12) {
        // singular (e.g. constant covariate): zero step on this axis
        a(col)(p) = 0.0; a(col)(col) = 1.0
      } else {
        var j = col
        while (j <= p) { a(col)(j) /= d; j += 1 }
        r = 0
        while (r < p) {
          if (r != col) {
            val f = a(r)(col)
            var jj = col
            while (jj <= p) { a(r)(jj) -= f * a(col)(jj); jj += 1 }
          }
          r += 1
        }
      }
      col += 1
    }
    Array.tabulate(p)(i => a(i)(p))
  }
}
