package graft

import org.apache.spark.sql.graftfn.PlanBridge
import org.scalatest.funsuite.AnyFunSuite

/** The cache-leak gate (r15, round-14 verdict directive 2).
  *
  * Contract: a gated query's cached intermediates are parked by its
  * [[graft.queries.QueryScope]] scope and die at the NEXT gated call —
  * or immediately at one [[graft.queries.QueryScope.releaseAll]], the
  * caller's single explicit release point. Before r15, ~45 query-layer
  * persists had no matching unpersist: bench/verify mask that with
  * `clearCache()` between queries, but a library/service caller would
  * grow the block manager on every call (and compositions doubled it —
  * r14's p26w cached the d10w pair frame twice). This spec runs EVERY
  * registered query at sf0.001, materializes its result, and fails by
  * name on the next persist that survives releaseAll().
  *
  * The census reads the CacheManager (via [[PlanBridge.cacheIsEmpty]]),
  * not `getPersistentRDDs`: the latter also carries `localCheckpoint`
  * RDDs (star-contraction rounds, MMR iterations) whose release is the
  * ContextCleaner's — GC-driven and asynchronous, so a census on it
  * would flake on exactly the queries that need lineage truncation.
  */
class CacheHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("every gated query's cache census returns to baseline after " +
      "one QueryScope.releaseAll (r14 verdict, directive 2)") {
    spark.catalog.clearCache()
    val leaks = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val res =
        try fn(spark, dir)
        catch { case e: Throwable => fail(s"$name failed to run: $e") }
      res.count() // materialize like any consumer would
      graft.queries.QueryScope.releaseAll() // the caller's one release
      if (!PlanBridge.cacheIsEmpty(spark)) {
        leaks += name
        spark.catalog.clearCache() // isolate: next query starts clean
      }
    }
    assert(leaks.result().isEmpty,
      s"queries leaving cache entries behind: ${leaks.result().mkString(", ")}")
  }
}
