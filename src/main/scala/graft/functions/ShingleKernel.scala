package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static per-document shingle kernel behind the codegen'd expression
  * [[org.apache.spark.sql.graftfn.DistinctShinglesExpr]].
  *
  * The word-3-gram inverted-index input (`TextDedup.shingleIndex`) is
  * per-document-local: every shingle and the per-doc distinct derive
  * from the document's own token array, which arrives contiguous in its
  * row. The window spelling (posexplode → corpus-wide doc_id
  * exchange + sort → lead×2 → corpus-wide distinct exchange) pays TWO
  * full postings shuffles to compute a value that never needed to leave
  * the row (optimization guide §2.4: remove shuffles outright). This
  * kernel is the tight-loop form — one `concat_ws(" ", t, t1, t2)` per
  * window position, a hash-set dedup, first-occurrence order — called
  * once per row through a static codegen hook, so the documents
  * projection stays inside whole-stage codegen (the
  * [[WinnowKernel]] discipline applied to the raw-shingle space).
  *
  * Value parity with the window spelling is pinned by
  * `ShingleKernelSpec`: same tokens → same shingle SET per doc (consumers
  * treat the index as a set — joins, groupBys, distinct counts — so
  * row order is immaterial), <3 tokens → empty, null tokens skipped
  * inside a shingle exactly like `concat_ws`.
  */
object ShingleKernel {

  private val Space = UTF8String.fromString(" ")

  private val Empty = new GenericArrayData(new Array[AnyRef](0))

  /** Distinct word-3-gram shingles of a token array, first-occurrence
    * order. Fewer than 3 tokens → empty array.
    */
  def distinctShingles(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return Empty
    // UTF8String.concatWs copies bytes, so stored keys never alias the
    // (reused) underlying row buffer
    val seen = new java.util.LinkedHashSet[UTF8String](Math.max(16, n))
    var i = 0
    while (i < n - 2) {
      // windowed-spelling parity (r17 ADVICE): shingleIndexWindowed
      // filters t2.isNotNull, so a position whose THIRD token is null
      // yields no shingle there (concatWs would have emitted a
      // truncated one); null first/second tokens are skipped by
      // concat_ws on both spellings. Unreachable via split()-derived
      // token arrays, contracted set-identical anyway.
      if (!toks.isNullAt(i + 2)) {
        seen.add(UTF8String.concatWs(Space,
          if (toks.isNullAt(i)) null else toks.getUTF8String(i),
          if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1),
          toks.getUTF8String(i + 2)))
      }
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
