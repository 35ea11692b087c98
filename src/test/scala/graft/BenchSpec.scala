package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The bench's error contract (round-8 lesson): a query that throws must
  * surface as an error in both JSON artifacts and vanish from every
  * timing aggregate — never masquerade as a fast timing that makes the
  * total look better than the code is.
  */
class BenchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("n")
  private val alsoGood: (SparkSession, String) => DataFrame =
    (s, _) => s.range(3).toDF("n")
  private val broken: (SparkSession, String) => DataFrame =
    (s, _) => {
      import org.apache.spark.sql.functions._
      // analysis-time failure, the exact r8 failure mode
      s.range(1).toDF("n").select(expr("n div 'not_a_number_col'") + col("nope"))
    }

  test("a healthy query set benches with no errors key and all queries timed") {
    val out = Bench.runBench(spark, "/unused",
      Map("qa_one" -> good, "qb_two" -> alsoGood), timedPasses = 3)
    assert(out.errors.isEmpty)
    assert(!out.headline.contains("\"errors\""))
    assert(!out.full.contains("\"errors\""))
    assert(out.headline.contains("\"qa\":") && out.headline.contains("\"qb\":"))
    assert(out.full.contains("\"qa_one\":") && out.full.contains("\"qb_two\":"))
    // the tail-proof summary (r9: the per-query headline outgrew the
    // driver's 2000-char tail at 202 queries; r10: a queries-free
    // summary still parsed null): full headline schema with a bounded
    // top-20 "queries" map, small enough to always survive the tail
    assert(out.summary.contains("\"n\":2") && out.summary.contains("\"errors\":0"),
      out.summary)
    assert(out.summary.contains("\"queries\":{") &&
      out.summary.contains("\"qa\":") && out.summary.contains("\"qb\":"),
      out.summary)
    assert(out.summary.length < 600, out.summary)
  }

  test("a throwing query lands in errors and is excluded from every aggregate") {
    val out = Bench.runBench(spark, "/unused",
      Map("qa_one" -> good, "qx_broken" -> broken), timedPasses = 3)
    assert(out.errors.keySet == Set("qx_broken"), out.errors)
    // both artifacts carry the error; stdout gets the short query id +
    // exception class (the 2000-char tail budget), the file gets the
    // full name and message
    assert(out.headline.contains("\"errors\""), out.headline)
    assert(out.headline.contains("\"qx\":"), out.headline)
    assert(out.full.contains("\"errors\""), out.full.takeRight(400))
    assert(out.full.contains("qx_broken"), out.full.takeRight(400))
    // the broken query must NOT appear as a timing anywhere
    assert(!out.full.contains("\"qx_broken\":0"), out.full.takeRight(600))
    assert(!out.headline.split("\"errors\"")(0).contains("qx"),
      out.headline)
    // the healthy query still benches
    assert(out.headline.contains("\"qa\":"), out.headline)
    // the total is the healthy query's alone (a broken-query total of
    // ~0.05 s per failure was r8's integrity hole)
    val total = out.headline.split("\"value\":")(1).split(",")(0).toDouble
    assert(total >= 0.0 && total < 60.0)
    // the summary reports the failure count so a mass-failure round is
    // visible even when only the last 100 chars of the log survive
    assert(out.summary.contains("\"n\":1") && out.summary.contains("\"errors\":1"),
      out.summary)
  }
}
