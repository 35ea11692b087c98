package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 session operators: invariants the oracle hash can't
  * localize for p34's canonical-split accounting.
  */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("p34: rows conserve docs and tokens; dups = docs − components; " +
      "shares stay in [0, 1)") {
    val rows = graft.queries.TextDedup.p34DedupDividend(spark, dir)
      .collect()
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val nTokens = docs
      .agg(sum(size(split(trim(lower(col("text"))), "\\s+"))))
      .head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == nDocs)
    assert(rows.map(_.getLong(3)).sum == nTokens)
    // every component elects exactly one canonical, so the corpus-wide
    // duplicate count is docs − distinct components
    val nComponents = graft.queries.TextDedup.winnowLabels(spark, dir)
      .select(col("component")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == nDocs - nComponents)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"dups>docs in $r")
      assert(r.getLong(4) <= r.getLong(3), s"dup_tokens>tokens in $r")
      val s = r.getDouble(5)
      assert(s >= 0.0 && s < 1.0, s"share out of range in $r")
    }
    // the harness corpus has near-dups: some source must show a saving
    assert(rows.exists(_.getLong(2) > 0L))
  }
}
