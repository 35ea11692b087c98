package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 session operators and scale-valve changes: the d33
  * hot-fingerprint cap, the scale-aware d9b/d6b stop-shingle fraction,
  * and this round's new operators — driver-side twins and the cut
  * semantics the oracle hash can't localize.
  */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("winnowPairsCapped: the cap cuts hot-fingerprint pairs " +
      "deterministically by doc_id rank") {
    import spark.implicits._
    // 5 docs all carrying fingerprints 10 and 20 (a hot bucket), plus
    // docs 1 and 2 sharing the cold fingerprints 30 and 40
    val fp = (for (id <- 1L to 5L; f <- Seq(10L, 20L)) yield (id, f))
      .++(Seq((1L, 30L), (2L, 30L), (1L, 40L), (2L, 40L)))
      .toDF("doc_id", "fp")
    def pairsAt(cap: Int): Set[(Long, Long)] =
      graft.queries.TextDedup.winnowPairsCapped(fp, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // uncapped: all C(5,2) hot pairs (each shares fps 10 AND 20)
    val un = pairsAt(Int.MaxValue)
    assert(un == (for (a <- 1L to 5L; b <- a + 1 to 5L) yield (a, b)).toSet)
    // cap 2: per fingerprint only doc_ids {1, 2} survive the rank —
    // hot pairs collapse to (1,2); the cold fps 30/40 also pair (1,2)
    assert(pairsAt(2) == Set((1L, 2L)))
    // cap 3: hot bucket keeps {1,2,3} → pairs among them only
    assert(pairsAt(3) ==
      (for (a <- 1L to 3L; b <- a + 1 to 3L) yield (a, b)).toSet)
    // a dropped pair survives via other uncapped fingerprints: give
    // docs 4 and 5 two private cold fps — the hot-bucket cut no longer
    // removes them from the answer
    val fp2 = fp.unionAll(Seq((4L, 50L), (5L, 50L), (4L, 60L), (5L, 60L))
      .toDF("doc_id", "fp"))
    assert(graft.queries.TextDedup.winnowPairsCapped(fp2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (4L, 5L)))
  }
}
