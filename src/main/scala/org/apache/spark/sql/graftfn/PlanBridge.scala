package org.apache.spark.sql.graftfn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-support bridge into `private[sql]` plan surfaces.
  *
  * `BoundedWindowSpec` audits every query's optimized plan for
  * whole-frame (empty-partition-spec) Window operators and proves each
  * one's INPUT is no larger than its documented row bound — the guard
  * that lets the engine suppress Spark's `No Partition Defined for
  * Window operation` warning in bench/verify logs without losing the
  * regression signal the warning exists for. Turning a logical subplan
  * back into a countable DataFrame needs `Dataset.ofRows`, which is
  * `private[sql]`; this one-liner lives in the graftfn bridge package
  * (beside the extension/expression registrations) to expose it.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** True when the session's SQL cache holds no entries — the census
    * `CacheHygieneSpec` takes after each gated query's
    * `result.unpersist()` (r15). The CacheManager is the right ledger
    * for the leak contract: it tracks exactly the Dataset persists the
    * query layer creates, while `sparkContext.getPersistentRDDs` also
    * carries `localCheckpoint` RDDs whose release is the
    * ContextCleaner's (GC-driven, asynchronous — a census on it would
    * flake). `sharedState` is `private[sql]`, hence this bridge.
    */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
