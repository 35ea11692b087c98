package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.graftfn.PlanBridge
import org.scalatest.funsuite.AnyFunSuite

/** Whole-frame (empty-partition-spec) windows are the one place a
  * driver-side bottleneck could hide behind Spark's `No Partition
  * Defined for Window operation` warning — which bench/verify sessions
  * now SUPPRESS (see [[Bench.main]]) so a real regression can't drown
  * in 200 known-bounded repeats. This spec is the replacement signal:
  * it walks EVERY registered query's optimized plan at sf0.001, finds
  * every Window with an empty partitionSpec, and proves the window's
  * input is at most [[BoundedWindowSpec.MaxWholeFrameRows]] rows — the
  * documented bound for the quantizer/offset-frame finishers (≤32-row
  * frames in r9's audit; the margin covers growth without ever
  * admitting a corpus-sized frame). A new query that windows an
  * unpartitioned corpus-sized frame fails here by name.
  */
class BoundedWindowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  /** Any whole-frame window larger than this is a scale bug: the
    * legitimate sites window bounded aggregates (quantizer frames,
    * percentile scaffolds, |types|-sized matrices), never documents/
    * events/lineitem themselves. sf0.001's documents table alone is
    * ~600 rows, so the bound also separates "bounded aggregate" from
    * "whole small-SF corpus" at the test scale factor. */
  val MaxWholeFrameRows = 4096L

  test("every empty-partition window in every query reads a bounded frame") {
    val offenders = Seq.newBuilder[String]
    // rawQueries: the scoped registry EXECUTES each query to pin its
    // output (r15 cache hygiene), which would both slow this walk and
    // hide Window nodes behind InMemoryRelation leaves — the unscoped
    // surface keeps the plans lazy and fully visible
    SparkEntry.rawQueries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.optimizedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      val frames: Seq[LogicalPlan] = plan.collect {
        case w: Window if w.partitionSpec.isEmpty => w.child
      }
      frames.foreach { child =>
        val n = PlanBridge.ofRows(spark, child).count()
        if (n > MaxWholeFrameRows)
          offenders += s"$name: whole-frame window over $n rows"
      }
      spark.catalog.clearCache()
    }
    assert(offenders.result().isEmpty, offenders.result().mkString("; "))
  }
}
