package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static per-document winnowing kernels behind the codegen'd
  * expressions [[org.apache.spark.sql.graftfn.WinnowEkExpr]] /
  * [[org.apache.spark.sql.graftfn.WinnowMinSelectExpr]].
  *
  * Winnowing is per-document-local: every shingle hash, window min,
  * and selection derives from the document's own token array, which
  * arrives contiguous in its row. The first r13 array rewrite spelled
  * this as `transform`/`slice`/`array_min` higher-order functions —
  * plan-correct (no token-scale shuffle) but each lambda element
  * evaluates through the interpreted expression path (boxed longs, a
  * fresh slice array per window), which benched 2.3× SLOWER than the
  * window pipeline at sf0.1. These kernels are the tight-loop form:
  * one md5 per shingle (thread-local digest via [[FastMd5]]'s
  * discipline), primitive long arrays, an O(n·w) min scan (w ≤ 8),
  * and a sort+dedup finish — called ONCE per row through a static
  * codegen hook, so the projection stays inside whole-stage codegen.
  *
  * Value parity with the window pipeline (`winnowHashed` →
  * `winnowSelect`) and the DuckDB oracle is pinned by
  * `WinnowLocalParitySpec`: same composite `h·F + (F−1−min(pos,F−1))`
  * key, same full-window gate, same per-doc distinct.
  */
object WinnowKernel {

  private val digest = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  /** Composite winnow keys over the 3-gram shingles of a token array:
    * ek(i) = h(i)·F + (F−1−min(i, F−1)) where h is the first
    * `hexChars` hex chars (4·hexChars bits) of md5 of the
    * space-joined shingle. Fewer than 3 tokens → empty. Null tokens
    * are skipped like `concat_ws` (dead path for split output, kept
    * for parity with the window spelling).
    */
  def ekArray(toks: ArrayData, hexChars: Int, posField: Long): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return Empty
    val md = digest.get()
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      md.reset()
      var first = true
      var j = i
      while (j < i + 3) {
        if (!toks.isNullAt(j)) {
          if (!first) md.update(' '.toByte)
          val t = toks.getUTF8String(j)
          md.update(t.getBytes)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      var h = 0L
      var k = 0
      while (k < hexChars) {
        val b = d(k >> 1) & 0xff
        h = (h << 4) | (if ((k & 1) == 0) b >> 4 else b & 0xf)
        k += 1
      }
      val pos = if (i.toLong < posField - 1L) i.toLong else posField - 1L
      out(i) = h * posField + (posField - 1L - pos)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct window minima / F over a precomputed ek array — the
    * selection rule at width `w`. Fewer than `w` full windows → empty.
    * Output is sorted ascending (deterministic; consumers treat the
    * selections as a set).
    */
  def select(ek: ArrayData, w: Int, posField: Long): ArrayData = {
    val m = ek.numElements()
    if (m < w) return Empty
    val eks = ek.toLongArray()
    val sel = new Array[Long](m - w + 1)
    var i = 0
    while (i <= m - w) {
      var mn = eks(i)
      var j = i + 1
      while (j < i + w) {
        if (eks(j) < mn) mn = eks(j)
        j += 1
      }
      sel(i) = mn / posField
      i += 1
    }
    java.util.Arrays.sort(sel)
    var out = 1
    var r = 1
    while (r < sel.length) {
      if (sel(r) != sel(out - 1)) { sel(out) = sel(r); out += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, out))
  }
}
