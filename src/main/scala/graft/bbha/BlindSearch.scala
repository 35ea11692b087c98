package graft.bbha

import org.apache.spark.SparkContext

/** Exhaustive feature-subset search — `Algorithm.BLIND_SEARCH = 0`, which
  * the reference declares but never implements (TODO at
  * /root/reference/src/emr.py:10-14; both enum values route to the BBHA
  * entrypoint). Implemented here as the enum promises: evaluate every
  * non-empty subset, distributed.
  *
  * Shape: subsets are the integers 1..2ⁿ−1 (bit i = feature i), fanned
  * out with `sc.range` — no driver-side subset materialization — and
  * reduced to the winner with a deterministic total order
  * (fitness, fewer-features, lower index), so the result is independent
  * of partition/reduce order. Only (index, fitness, popcount) triples
  * move; masks rematerialize from the index.
  *
  * Practical bound: n ≤ 20 (≈10⁶ fitness calls). Beyond that the search
  * space, not Spark, is the limit — that is what BBHA is for.
  */
object BlindSearch {

  case class Outcome(bestMask: Array[Int], bestFitness: Double,
      evaluated: Long)

  def mask(idx: Long, nFeatures: Int): Array[Int] =
    Array.tabulate(nFeatures)(f => ((idx >> f) & 1L).toInt)

  def run(sc: SparkContext, nFeatures: Int, moreIsBetter: Boolean,
      fitness: Array[Int] => Double, slices: Int = 0): Outcome = {
    require(nFeatures >= 1 && nFeatures <= 20,
      s"blind search is exhaustive; $nFeatures features is ${
        if (nFeatures > 20) "beyond the 2^20 evaluation bound" else "invalid"}")
    val total = (1L << nFeatures) - 1
    val numSlices = if (slices > 0) slices
      else math.max(sc.defaultParallelism, 1)
    val nF = nFeatures
    val fitnessFn = fitness
    val best = sc.range(1L, total + 1, numSlices = numSlices)
      .map { idx =>
        val m = mask(idx, nF)
        (idx, fitnessFn(m), m.sum)
      }
      .reduce { (a, b) =>
        val cmp =
          if (a._2 != b._2) {
            if (moreIsBetter == a._2 > b._2) a else b
          }
          else if (a._3 != b._3) { if (a._3 < b._3) a else b }
          else if (a._1 < b._1) a else b
        cmp
      }
    Outcome(mask(best._1, nFeatures), best._2, total)
  }
}
