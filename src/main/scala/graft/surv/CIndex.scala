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

  /** O(n log n) exact twin of [[concordance]] for big cohorts (the
    * DataFrame aggregator's finish at up to 10⁶ rows, where the pairwise
    * loop's 10¹² comparisons are infeasible): samples are processed in
    * time order; a Fenwick tree over dense risk ranks counts, for each
    * sample, how many strictly-earlier EVENT samples carry a
    * greater/equal/smaller risk. Bit-identical to the naive loop — both
    * accumulate sums of 1.0/0.5 (exactly representable), so only the
    * order differs, and addition of exact halves is associative here.
    * Assumes no NaN times (the cleaning pipeline drops them); NaN risks
    * follow the naive loop's comparison semantics (never greater, never
    * equal — credit 0, still comparable).
    */
  def concordanceLogN(y: Array[Clinical], risk: Array[Double]): Double = {
    require(y.length == risk.length, "y and risk must align")
    val n = y.length
    if (n == 0) return 0.5
    // canonicalize -0.0 to 0.0: the naive loop's `==` treats them equal,
    // binarySearch's total order does not
    def canon(r: Double): Double = if (r == 0.0) 0.0 else r
    val uniq: Array[Double] = risk.collect { case r if !r.isNaN => canon(r) }
      .distinct.sorted
    def rankOf(r: Double): Int = java.util.Arrays.binarySearch(uniq, canon(r)) + 1
    val order = Array.tabulate(n)(identity).sortBy(i => y(i).time)
    // Fenwick over ranks 1..uniq.length, holding earlier EVENT samples
    val tree = new Array[Long](uniq.length + 1)
    def add(i0: Int): Unit = {
      var i = i0; while (i < tree.length) { tree(i) += 1; i += i & -i }
    }
    def prefix(i0: Int): Long = {
      var i = i0; var s = 0L; while (i > 0) { s += tree(i); i -= i & -i }; s
    }
    var bitCount = 0L   // event samples inserted with a non-NaN risk
    var nanEvents = 0L  // event samples inserted with a NaN risk
    var concordant = 0.0
    var comparable = 0L
    var gi = 0
    while (gi < n) {
      // one group = one distinct time: query the whole group against the
      // strictly-earlier events BEFORE inserting any of its own events
      var gj = gi
      val t = y(order(gi)).time
      while (gj < n && y(order(gj)).time == t) gj += 1
      var k = gi
      while (k < gj) {
        val j = order(k)
        val tot = bitCount + nanEvents
        comparable += tot
        val rj = risk(j)
        if (!rj.isNaN && bitCount > 0) {
          val r = rankOf(rj)
          val le = prefix(r)
          val eq = le - prefix(r - 1)
          concordant += (bitCount - le) + 0.5 * eq
        }
        k += 1
      }
      k = gi
      while (k < gj) {
        val i = order(k)
        if (y(i).event) {
          if (risk(i).isNaN) nanEvents += 1
          else { add(rankOf(risk(i))); bitCount += 1 }
        }
        k += 1
      }
      gi = gj
    }
    if (comparable == 0) 0.5 else concordant / comparable
  }
}
