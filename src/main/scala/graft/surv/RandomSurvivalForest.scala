package graft.surv

import graft.fitness.SurvivalEstimator
import scala.util.Random

/** Random survival forest: bootstrapped log-rank survival trees with
  * Nelson–Aalen leaf estimators.
  *
  * JVM re-implementation of the capability the reference gets from
  * `sksurv.ensemble.RandomSurvivalForest(n_estimators, min_samples_split=10,
  * min_samples_leaf=15, max_features="sqrt", random_state)`
  * (/root/reference/scripts/main.py:29-35): trees split on the feature/
  * threshold maximizing the two-sample log-rank statistic; a sample's
  * risk score is its ensemble-averaged cumulative hazard summed over the
  * training event-time grid (sksurv's `predict`). Runs task-local —
  * n_samples is a few hundred; the cluster parallelizes fitness calls,
  * and tree fitting could additionally be thread-parallel per task.
  */
object RandomSurvivalForest {

  private case class Node(feature: Int, threshold: Double,
      left: Node, right: Node, leafChf: Array[Double]) // chf over time grid

  final class Model(trees: Array[Node], times: Array[Double])
      extends SurvivalEstimator {
    def risk(row: Array[Double]): Double = {
      var s = 0.0
      var t = 0
      while (t < trees.length) { s += chfSum(trees(t), row); t += 1 }
      s / trees.length
    }
    private def chfSum(node: Node, row: Array[Double]): Double = {
      var n = node
      while (n.leafChf == null)
        n = if (row(n.feature) <= n.threshold) n.left else n.right
      var s = 0.0; var i = 0
      while (i < n.leafChf.length) { s += n.leafChf(i); i += 1 }
      s
    }
    def iterations: Int = trees.length
  }

  /** Fits `nEstimators` bootstrapped trees, optionally on a task-local
    * thread pool (`treeNJobs` — the reference's `--tree-n-jobs`,
    * /root/reference/scripts/parameters.py:119-121; ≤0 = all cores).
    * Each tree draws from its own splitmix-derived RNG stream, so the
    * fitted model is bit-identical for any `treeNJobs` — parallelism is
    * a schedule, never a semantic.
    */
  def fit(x: Array[Array[Double]], y: Array[Clinical], nEstimators: Int = 10,
      minSamplesSplit: Int = 10, minSamplesLeaf: Int = 15,
      seed: Long = 0L, treeNJobs: Int = 1): Model = {
    val n = x.length
    val p = x(0).length
    val mtry = math.max(1, math.sqrt(p).round.toInt)
    val times = y.filter(_.event).map(_.time).distinct.sorted
    def growTree(t: Int): Node = {
      val rng = new Random(mixSeed(seed, t))
      val boot = Array.fill(n)(rng.nextInt(n))
      grow(x, y, boot, times, mtry, minSamplesSplit, minSamplesLeaf, rng)
    }
    val jobs = math.min(
      if (treeNJobs <= 0) Runtime.getRuntime.availableProcessors() else treeNJobs,
      nEstimators)
    val trees =
      if (jobs <= 1) Array.tabulate(nEstimators)(growTree)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(jobs)
        try {
          val futures = (0 until nEstimators).map { t =>
            pool.submit(new java.util.concurrent.Callable[Node] {
              def call(): Node = growTree(t)
            })
          }
          try futures.map(_.get()).toArray
          catch {
            // surface the ORIGINAL tree-grow failure (the serial path's
            // behavior) so error-sentinel matching is schedule-independent,
            // and stop still-running sibling trees instead of letting the
            // pool drain them
            case e: java.util.concurrent.ExecutionException =>
              pool.shutdownNow()
              throw Option(e.getCause).getOrElse(e)
          }
        } finally pool.shutdown()
      }
    new Model(trees, times)
  }

  /** splitmix64 finalizer over (seed, tree index): decorrelated per-tree
    * streams independent of execution order.
    */
  private def mixSeed(seed: Long, t: Int): Long = {
    var z = seed + 0x9E3779B97F4A7C15L * (t + 1)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def grow(x: Array[Array[Double]], y: Array[Clinical],
      idx: Array[Int], times: Array[Double], mtry: Int,
      minSplit: Int, minLeaf: Int, rng: Random): Node = {
    if (idx.length < minSplit || idx.map(i => y(i).time).distinct.length <= 1)
      return leaf(y, idx, times)
    val p = x(0).length
    val features = rng.shuffle((0 until p).toVector).take(mtry)
    var bestStat = 0.0
    var bestF = -1
    var bestT = 0.0
    for (f <- features) {
      val vals = idx.map(i => x(i)(f)).distinct.sorted
      var v = 0
      while (v < vals.length - 1) {
        val thr = (vals(v) + vals(v + 1)) / 2
        val left = idx.filter(i => x(i)(f) <= thr)
        if (left.length >= minLeaf && idx.length - left.length >= minLeaf) {
          val stat = logRank(y, left, idx.filter(i => x(i)(f) > thr))
          if (stat > bestStat) { bestStat = stat; bestF = f; bestT = thr }
        }
        v += 1
      }
    }
    if (bestF < 0) leaf(y, idx, times)
    else {
      val l = idx.filter(i => x(i)(bestF) <= bestT)
      val r = idx.filter(i => x(i)(bestF) > bestT)
      Node(bestF, bestT,
        grow(x, y, l, times, mtry, minSplit, minLeaf, rng),
        grow(x, y, r, times, mtry, minSplit, minLeaf, rng), null)
    }
  }

  /** Nelson–Aalen cumulative hazard of the node's samples, evaluated on
    * the global event-time grid: d_t / n_t at each DISTINCT event time t,
    * with the at-risk set counting every sample whose time ≥ t (ties,
    * censored included) — the counting-process definition sksurv uses.
    */
  private def leaf(y: Array[Clinical], idx: Array[Int],
      times: Array[Double]): Node = {
    val sorted = idx.sortBy(i => y(i).time)
    val chf = new Array[Double](times.length)
    var cum = 0.0
    var ti = 0
    var k = 0
    while (ti < times.length) {
      val t = times(ti)
      while (k < sorted.length && y(sorted(k)).time <= t) {
        val tk = y(sorted(k)).time
        val atRisk = sorted.length - k // every sample with time >= tk
        var d = 0
        var k2 = k
        while (k2 < sorted.length && y(sorted(k2)).time == tk) {
          if (y(sorted(k2)).event) d += 1
          k2 += 1
        }
        if (d > 0) cum += d.toDouble / atRisk
        k = k2
      }
      chf(ti) = cum
      ti += 1
    }
    Node(-1, 0.0, null, null, chf)
  }

  /** Two-sample log-rank statistic (O1−E1)²/V — the split criterion. */
  def logRank(y: Array[Clinical], g1: Array[Int], g2: Array[Int]): Double = {
    val all = (g1.map((_, 0)) ++ g2.map((_, 1))).sortBy { case (i, _) => y(i).time }
    val n = all.length
    var n1 = g1.length
    var nTot = n
    var o1 = 0.0; var e1 = 0.0; var v = 0.0
    var k = 0
    while (k < n) {
      val t = y(all(k)._1).time
      // gather ties at time t
      var d = 0; var d1 = 0; var c1 = 0; var cTot = 0
      while (k < n && y(all(k)._1).time == t) {
        if (y(all(k)._1).event) { d += 1; if (all(k)._2 == 0) d1 += 1 }
        if (all(k)._2 == 0) c1 += 1
        cTot += 1
        k += 1
      }
      if (d > 0 && nTot > 1) {
        o1 += d1
        e1 += d.toDouble * n1 / nTot
        v += d.toDouble * (n1.toDouble / nTot) * (1.0 - n1.toDouble / nTot) *
          (nTot - d) / (nTot - 1)
      }
      n1 -= c1
      nTot -= cTot
    }
    if (v <= 0) 0.0 else (o1 - e1) * (o1 - e1) / v
  }
}
