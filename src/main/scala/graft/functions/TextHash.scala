package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's Unicode code points:
  * `h ← (h·31 + cp) mod (2³¹ − 1)`, h₀ = 0.
  *
  * The per-document fingerprint primitive (t7): O(len) per row, one pass,
  * no allocation — as a native codegen'd expression
  * ([[org.apache.spark.sql.graftfn.RollingHashExpr]]) it stays inside
  * whole-stage codegen at 10⁹ documents. The arithmetic is chosen for
  * cross-engine exactness: h < 2³¹ and base 31 keep `h·31 + cp` far below
  * 2⁶³, so the identical BIGINT recurrence in DuckDB
  * (`list_reduce` over `unicode()` code points) produces the identical
  * value — no overflow, no floats.
  */
object TextHash {
  final val Mod = 2147483647L // 2^31 − 1
  final val Base = 31L

  /** Static entry used from generated code. Iterates code points (not
    * UTF-16 units) to match DuckDB's `unicode()` beyond the BMP.
    */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}
