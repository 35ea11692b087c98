package graft.bbha

import scala.util.Random

/** Improved BBHA variant (`improved_binary_black_hole`,
  * /root/reference/scripts/metaheuristics.py:330-465; per Gholizadeh,
  * Razavi & Shojaei, "Improved black hole and multiverse algorithms for
  * discrete sizing optimization of planar structures").
  *
  * Sequential by design — the reference marks it "TODO: convert to
  * Spark" (metaheuristics.py:342) and only reaches it behind a hardcoded
  * `run_improved_bbha=False` (main.py:266). Faithful to the reference's
  * acknowledged quirks:
  *  - the swap/best comparisons ignore `more_is_better` (TODOs at
  *    metaheuristics.py:405-412) — they always maximize;
  *  - the horizon denominator `np.sum(1 / stars_fitness_values)` reads
  *    the INITIAL fitness array, which is never updated after init;
  *  - horizon capture toggles exactly ONE random dimension;
  *  - the update uses per-star best positions with weights
  *    d1 = coeff1 + w, d2 = coeff2 + w, w = 1 − i/n_iterations, and
  *    coeff validation {2.2, 2.35} × {0.1, 0.2, 0.3}.
  */
object ImprovedBbha {

  val Coeff1Values: Set[Double] = Set(2.2, 2.35)
  val Coeff2Values: Set[Double] = Set(0.1, 0.2, 0.3)

  case class Config(
      nStars: Int = 30,
      nIterations: Int = 30,
      coeff1: Double = 2.35,
      coeff2: Double = 0.2,
      moreIsBetter: Boolean = true, // accepted but unused in comparisons,
                                    // matching the reference's TODO state
      randomState: Option[Long] = None,
      binaryThreshold: Option[Double] = Some(0.6))

  case class Outcome(bestMask: Array[Int], bestFitness: Double)

  def run(cfg: Config, nFeatures: Int,
      fitness: Array[Int] => Double): Outcome = {
    require(Coeff1Values.contains(cfg.coeff1),
      s"coeff_1 must be one of $Coeff1Values")
    require(Coeff2Values.contains(cfg.coeff2),
      s"coeff_2 must be one of $Coeff2Values")
    val rng = new Random(cfg.randomState.getOrElse(Random.nextLong()))

    val stars = Array.fill(cfg.nStars)(
      Bbha.randomSubset(nFeatures, None, rng))
    val starsBest = stars.map(_.clone())
    val fitnessInit = stars.map(fitness) // frozen denominator, see above
    val bestFitness = fitnessInit.clone()

    var bhIdx = 0
    var i = 1
    while (i < cfg.nStars) { // argmax (maximize, per the reference TODO)
      if (fitnessInit(i) > fitnessInit(bhIdx)) bhIdx = i
      i += 1
    }
    var bhMask = stars(bhIdx).clone()
    var bhFitness = fitnessInit(bhIdx)
    val horizonDenominator = fitnessInit.map(1.0 / _).sum

    for (iter <- 0 until cfg.nIterations) {
      for (a <- 0 until cfg.nStars if a != bhIdx) {
        var curMask = stars(a)
        var curFitness = fitness(curMask)
        if (curFitness > bestFitness(a)) {
          bestFitness(a) = curFitness
          starsBest(a) = curMask.clone()
        }
        if (curFitness > bhFitness ||
            (curFitness == bhFitness &&
              curMask.sum < bhMask.sum)) {
          bhIdx = a
          val t = bhMask; bhMask = curMask.clone(); curMask = t
          val tf = bhFitness; bhFitness = curFitness; curFitness = tf
        }
        val eventHorizon = (1.0 / bhFitness) / horizonDenominator
        if (Bbha.maskDistance(bhMask, curMask) < eventHorizon) {
          val d = rng.nextInt(nFeatures) // toggle ONE dimension
          stars(a)(d) ^= 1
        }
      }
      val w = 1.0 - iter.toDouble / cfg.nIterations
      val d1 = cfg.coeff1 + w
      val d2 = cfg.coeff2 + w
      for (a <- 0 until cfg.nStars if a != bhIdx) {
        var d = 0
        while (d < nFeatures) {
          val xOld = stars(a)(d).toDouble
          val threshold = cfg.binaryThreshold.getOrElse(rng.nextDouble())
          val xNew = xOld +
            d1 * rng.nextDouble() * (bhMask(d) - xOld) +
            d2 * rng.nextDouble() * (starsBest(a)(d) - xOld)
          stars(a)(d) = if (math.abs(math.tanh(xNew)) > threshold) 1 else 0
          d += 1
        }
      }
    }
    Outcome(bhMask, bhFitness)
  }
}
