package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r17 kernel shingle build ([[graft.queries.TextDedup.
  * shingleIndex]] via [[graft.functions.ShingleKernel]]) set-identical
  * to the window-based reference spelling (`shingleIndexWindowed`) it
  * replaced in the hot path — the two must stay interchangeable because
  * the DuckDB oracle mirrors the WINDOW spelling (posexplode → lead×2 →
  * distinct) while the engine runs the per-row kernel. Consumers treat
  * the index as a (doc_id, shingle) SET (joins, groupBys, df counts),
  * so set equality is the contract. Coverage: the real corpus, the
  * short-document boundary (<3 tokens → empty), duplicate shingles
  * inside one document (per-doc distinct), and multi-whitespace
  * normalization through the shared `toks` tokenizer.
  */
class ShingleKernelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  import graft.queries.TextDedup

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("kernel index ≡ window index on the real corpus") {
    val docs = Tables.documents(spark, dir)
    val win = rows(TextDedup.shingleIndexWindowed(docs))
    val ker = rows(TextDedup.shingleIndex(docs))
    assert(ker == win, s"diff=${(ker diff win).take(3)} / " +
      s"${(win diff ker).take(3)} (|ker|=${ker.size}, |win|=${win.size})")
    assert(ker.nonEmpty)
  }

  test("boundary: <3 tokens empty, in-doc duplicates distinct, " +
      "whitespace runs collapse") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""), (2L, "a"), (3L, "a b"),
      (4L, "a b c"),                       // one shingle
      (5L, "a b c a b c a b c"),           // duplicate shingles collapse
      (6L, "  A   b\tC  d "),              // trim/lower/multi-ws tokenize
      (7L, "x y z w"))                     // two overlapping shingles
      .toDF("doc_id", "text")
    val win = rows(TextDedup.shingleIndexWindowed(docs))
    val ker = rows(TextDedup.shingleIndex(docs))
    assert(ker == win, s"ker=$ker win=$win")
    assert(ker((4L, "a b c")) && ker((6L, "a b c")) && ker((7L, "x y z")))
    assert(ker.count(_._1 == 5L) == 3, "doc 5 has 3 distinct shingles: " +
      ker.filter(_._1 == 5L).toString)
    assert(!ker.exists(_._1 <= 3L))
  }

  test("null token elements mirror the windowed spelling (r17 ADVICE): " +
      "null third token skips the position, null first/second are " +
      "concat_ws-elided") {
    // unreachable via the split() tokenizer (never yields null
    // elements), but the kernel is contracted set-identical to the
    // windowed/oracle spelling for ALL inputs: shingleIndexWindowed
    // filters t2.isNotNull (drop the position) while concat_ws skips
    // null heads (truncated shingle)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ts: Option[String]*): GenericArrayData =
      new GenericArrayData(
        ts.map(_.map(UTF8String.fromString).orNull).toArray[Any])
    def shingles(ts: Option[String]*): Seq[String] = {
      val out = graft.functions.ShingleKernel.distinctShingles(arr(ts: _*))
      (0 until out.numElements()).map(out.getUTF8String(_).toString)
    }
    val (a, b, c, d, n) =
      (Some("a"), Some("b"), Some("c"), Some("d"), None)
    assert(shingles(a, n, c, d) == Seq("a c", "c d"))
    assert(shingles(n, b, c) == Seq("b c"))
    assert(shingles(a, b, n) == Seq.empty) // t2 null: position dropped
    assert(shingles(a, b, n, d) == Seq("b d")) // only i=1 has non-null t2
    assert(shingles(n, n, c) == Seq("c"))
  }
}
