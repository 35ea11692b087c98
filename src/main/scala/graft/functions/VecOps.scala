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
    *
    * Mirrors the HOF form on degenerate input too (so the
    * [[org.apache.spark.sql.graftfn.FloatDotRewrite]] optimizer rule is
    * semantics-preserving for EVERY matched input, not just clean ones):
    * `zip_with` pads unequal lengths with null and a null element
    * null-poisons the fold, so both cases return null (boxed) here.
    */
  def dotFloat(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Σ a[i] * b[i] over two long arrays, sequential left-to-right —
    * the codegen'd replacement for the interpreted
    * `aggregate(zip_with(a, b, _*_), 0L, _+_)` fold on integer-micro
    * vectors (s27's two 64-element lambdas per candidate row were the
    * query's hot path, r17). Long addition is associative and exact, so
    * the value is identical to the HOF fold AND to DuckDB's
    * `list_reduce`; degenerate inputs mirror the HOF form like
    * [[dotFloat]] (unequal lengths / null element → null).
    */
  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
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
