package graft.surv

/** Clinical survival target: one record per sample.
  * Reference: /root/reference/scripts/utils.py:58-63 (structured array
  * `(event: bool, time: float)`).
  */
case class Clinical(event: Boolean, time: Double)

/** Harrell's concordance index.
  *
  * The metric behind the reference's fitness everywhere: sksurv
  * estimators' `.score` used through `cross_validate`
  * (/root/reference/scripts/main.py:125 — "This is the C-Index") and
  * `CoxPHFitter.score(..., 'concordance_index')`
  * (/root/reference/scripts/main.py:101-102).
  *
  * Comparable pairs (i, j): `t_i < t_j` and `event_i` (the earlier sample
  * experienced the event). Concordant when the earlier-event sample has
  * the higher predicted risk; tied predictions count 0.5.
  * O(n²) pairwise — n is a few hundred samples inside one fitness task,
  * so the simple loop beats the O(n log n) BIT variant in practice.
  */
object CIndex {

  /** @param risk higher = more at risk (expected earlier event) */
  def concordance(y: Array[Clinical], risk: Array[Double]): Double = {
    require(y.length == risk.length, "y and risk must align")
    var concordant = 0.0
    var comparable = 0L
    var i = 0
    while (i < y.length) {
      if (y(i).event) {
        var j = 0
        while (j < y.length) {
          if (i != j && y(i).time < y(j).time) {
            comparable += 1
            if (risk(i) > risk(j)) concordant += 1.0
            else if (risk(i) == risk(j)) concordant += 0.5
          }
          j += 1
        }
      }
      i += 1
    }
    if (comparable == 0) 0.5 else concordant / comparable
  }
}
