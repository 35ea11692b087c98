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
}
