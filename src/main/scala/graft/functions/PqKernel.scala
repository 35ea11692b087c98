package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Per-row PQ code assignment over a DRIVER-COLLECTED codebook — the
  * §4 kernel form of the (vector, subspace) argmin.
  *
  * Why a kernel: every (vector, subspace) argmin group is emitted by
  * ONE input row of the codebook crossJoin, so BOTH distributed
  * spellings pay for machinery that dedups/sorts nothing — the r16
  * rank-1 window sorted codebook× rows through an exchange, and the
  * r17 min(struct) hash aggregate's exchange + final level carried one
  * already-final row per group (measured at sf10: window 17.9 s,
  * min(struct) 19.6 s over the five-query family). A literal-expression
  * respelling (least() over |codebook| struct candidates per row) fell
  * out of whole-stage codegen and ran 2.3× SLOWER still — so the argmin
  * is one static call per row, like [[ShingleKernel]]: the projection
  * stays inside codegen and the candidate loop runs on primitive
  * arrays. The codebook is quantizer-bounded by construction
  * (|labels| × nSubspaces rows — the e31/e28 bounded-collect pattern),
  * never corpus-sized.
  *
  * Exactness contract (mirrors the crossJoin spelling term for term):
  * dist = round(cnorm2 − 2·dot(x_s, c), 6) with the same sequential
  * [[VecOps.dotFloatDouble]] fold over the same slice window (slices
  * past the array end shorten the fold exactly like `slice`), the same
  * HALF_UP BigDecimal snap Spark's Round applies (non-finite passes
  * through), comparisons via java.lang.Double.compare (Catalyst's
  * double ordering), ties broken by label-ascending candidate order —
  * the Book's candidates MUST be label-sorted by the builder.
  */
object PqKernel {

  /** One subspace's candidates, label-ascending: 0-based dim offset,
    * codewords (K × subDim), self-norms² (K).
    */
  final class Book(val starts: Array[Int],
      val cws: Array[Array[Array[Double]]],
      val cn2: Array[Array[Double]]) extends Serializable {
    require(starts.length == cws.length && starts.length == cn2.length)
  }

  /** Spark Round(x, 6) for doubles: HALF_UP at scale 6, non-finite
    * passes through.
    */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Per subspace: (winning candidate index, its rounded distance) —
    * one struct row per subspace, subspace order = Book order.
    */
  def argmins(emb: ArrayData, b: Book): ArrayData = {
    val n = emb.numElements()
    val out = new Array[AnyRef](b.starts.length)
    var s = 0
    while (s < b.starts.length) {
      val start = b.starts(s)
      val cands = b.cws(s)
      val norms = b.cn2(s)
      var best = -1
      var bestDist = 0.0
      var k = 0
      while (k < cands.length) {
        val cw = cands(k)
        // slice(embedding, start+1, |cw|) shortens at the array end;
        // dotFloatDouble folds over min length — mirror both
        val m = math.min(cw.length, math.max(0, n - start))
        var dot = 0.0
        var i = 0
        while (i < m) {
          dot += emb.getFloat(start + i).toDouble * cw(i)
          i += 1
        }
        val dist = round6(norms(k) - 2.0 * dot)
        if (best < 0 || java.lang.Double.compare(dist, bestDist) < 0) {
          best = k
          bestDist = dist
        }
        k += 1
      }
      out(s) = new GenericInternalRow(Array[Any](best, bestDist))
      s += 1
    }
    new GenericArrayData(out)
  }
}
