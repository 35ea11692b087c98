package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static vector kernels called from generated code (see
  * [[org.apache.spark.sql.graftfn.FloatVecDot]]).
  */
object VecOps {
  /** Σ (double)a[i] * (double)b[i], sequential left-to-right — the same
    * IEEE operation order as the `aggregate(zip_with(...))` fold and
    * DuckDB's `list_reduce`, so results are bit-identical across all
    * three formulations.
    */
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Float-array · double-weights, sequential left-to-right. */
  def dotFloatDouble(a: ArrayData, w: ArrayData): Double = {
    val n = math.min(a.numElements(), w.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * w.getDouble(i)
      i += 1
    }
    s
  }
}
