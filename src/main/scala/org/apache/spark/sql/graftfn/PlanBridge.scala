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
}
