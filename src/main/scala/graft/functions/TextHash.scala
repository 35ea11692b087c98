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

  /** Static entry used from generated code. Decodes UTF-8 code points
    * in place from the UTF8String's bytes (matching DuckDB's `unicode()`
    * beyond the BMP) — no `toString`, which would allocate and decode a
    * full String copy of every document in the hot path.
    */
  def rollingHash(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; len = 2 }
        else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; len = 3 }
        else { cp = b0 & 0x07; len = 4 }
        var j = 1
        while (j < len && i + j < n) {
          cp = (cp << 6) | (s.getByte(i + j) & 0x3f)
          j += 1
        }
      }
      h = (h * Base + cp) % Mod
      i += len
    }
    h
  }
}
