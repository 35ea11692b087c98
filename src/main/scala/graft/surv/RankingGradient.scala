package graft.surv

/** O(n log n) squared-hinge ranking loss + gradient via an
  * order-statistic structure — the role sksurv's `avltree`/`rbtree`
  * optimizers play in `FastKernelSurvivalSVM`
  * (/root/reference/scripts/main.py:36-40): instead of sweeping all
  * comparable pairs, samples are ranked by score and a Fenwick tree
  * (order-statistic over score ranks, tracking count/sum/sum²) answers
  * the "partners inside the margin" prefix queries.
  *
  * Loss L = Σ_{(i,j): t_i < t_j, e_i} max(0, 1 − (s_j − s_i))², with
  *   ∂L/∂s_j = −2 Σ_{i qual} (1 − s_j + s_i)
  *   ∂L/∂s_i = +2 Σ_{j qual} (1 − s_j + s_i)
  * where "qual" additionally requires the margin to be active
  * (s_i > s_j − 1 strictly; zero-margin pairs contribute nothing).
  */
object RankingGradient {

  /** Fenwick tree over score ranks carrying (count, Σv, Σv²). */
  private final class Fenwick(n: Int) {
    private val cnt = new Array[Long](n + 1)
    private val sum = new Array[Double](n + 1)
    private val sq = new Array[Double](n + 1)
    def add(rank: Int, v: Double): Unit = {
      var i = rank + 1
      while (i <= n) { cnt(i) += 1; sum(i) += v; sq(i) += v * v; i += i & -i }
    }
    /** prefix over ranks [0, rank] inclusive → (count, Σ, Σ²) */
    def prefix(rank: Int): (Long, Double, Double) = {
      var i = rank + 1
      var c = 0L; var s = 0.0; var q = 0.0
      while (i > 0) { c += cnt(i); s += sum(i); q += sq(i); i -= i & -i }
      (c, s, q)
    }
    var totalCnt = 0L
    var totalSum = 0.0
    var totalSq = 0.0
    def addTotal(v: Double): Unit = { totalCnt += 1; totalSum += v; totalSq += v * v }
  }

  /** @return (loss, dL/ds as an array aligned with s) */
  def lossAndGradient(y: Array[Clinical], s: Array[Double]): (Double, Array[Double]) = {
    val n = s.length
    val grad = new Array[Double](n)
    if (n == 0) return (0.0, grad)
    // dense score ranks
    val sortedScores = s.clone().sorted
    def rankOf(v: Double): Int = { // index of v in sortedScores (first)
      var lo = 0; var hi = n - 1
      while (lo < hi) { val m = (lo + hi) >>> 1; if (sortedScores(m) < v) lo = m + 1 else hi = m }
      lo
    }
    val byTime = (0 until n).sortBy(i => y(i).time).toArray

    // Pass A — ascending time: for each j, earlier-event partners i with
    // s_i > s_j − 1 give the j-side gradient and the loss.
    var loss = 0.0
    val fenA = new Fenwick(n)
    var k = 0
    var idx = 0
    while (idx < n) {
      val t = y(byTime(idx)).time
      // insert all strictly-earlier event samples
      while (k < n && y(byTime(k)).time < t) {
        val i = byTime(k)
        if (y(i).event) { fenA.add(rankOf(s(i)), s(i)); fenA.addTotal(s(i)) }
        k += 1
      }
      // process every j at this time
      while (idx < n && y(byTime(idx)).time == t) {
        val j = byTime(idx)
        val sj = s(j)
        // partners require s_i > s_j − 1 STRICTLY: subtract prefix of
        // ranks with s_i <= s_j − 1
        val bound = lastRankBelowOrEqual(sortedScores, sj - 1)
        val (cLe, sLe, qLe) = if (bound >= 0) fenA.prefix(bound) else (0L, 0.0, 0.0)
        val c = fenA.totalCnt - cLe
        val sSum = fenA.totalSum - sLe
        val sSq = fenA.totalSq - qLe
        if (c > 0) {
          val om = 1.0 - sj
          loss += c * om * om + 2.0 * om * sSum + sSq
          grad(j) += -2.0 * (c * om + sSum)
        }
        idx += 1
      }
    }

    // Pass B — descending time: for each event sample i, later partners j
    // (any censoring) with s_j < s_i + 1 give the i-side gradient.
    val fenB = new Fenwick(n)
    k = n - 1
    idx = n - 1
    while (idx >= 0) {
      val t = y(byTime(idx)).time
      while (k >= 0 && y(byTime(k)).time > t) {
        val j = byTime(k)
        fenB.add(rankOf(s(j)), s(j))
        k -= 1
      }
      while (idx >= 0 && y(byTime(idx)).time == t) {
        val i = byTime(idx)
        if (y(i).event) {
          val si = s(i)
          // partners: s_j < s_i + 1 strictly → prefix of ranks with
          // score <= the largest value < s_i + 1
          val bound = lastRankStrictlyBelow(sortedScores, si + 1)
          if (bound >= 0) {
            val (c, sSum, _) = fenB.prefix(bound)
            if (c > 0) grad(i) += 2.0 * (c * (1.0 + si) - sSum)
          }
        }
        idx -= 1
      }
    }
    (loss, grad)
  }

  /** greatest index with arr(idx) <= v, or -1 */
  private def lastRankBelowOrEqual(arr: Array[Double], v: Double): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) { val m = (lo + hi) >>> 1; if (arr(m) <= v) lo = m + 1 else hi = m }
    lo - 1
  }

  /** greatest index with arr(idx) < v, or -1 */
  private def lastRankStrictlyBelow(arr: Array[Double], v: Double): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) { val m = (lo + hi) >>> 1; if (arr(m) < v) lo = m + 1 else hi = m }
    lo - 1
  }

  /** Naive O(pairs) reference used by the specs and small-n paths. */
  def lossAndGradientNaive(y: Array[Clinical], s: Array[Double]): (Double, Array[Double]) = {
    val n = s.length
    val grad = new Array[Double](n)
    var loss = 0.0
    var i = 0
    while (i < n) {
      if (y(i).event) {
        var j = 0
        while (j < n) {
          if (i != j && y(i).time < y(j).time) {
            val m = 1.0 - (s(j) - s(i))
            if (m > 0) { loss += m * m; grad(j) -= 2 * m; grad(i) += 2 * m }
          }
          j += 1
        }
      }
      i += 1
    }
    (loss, grad)
  }
}
