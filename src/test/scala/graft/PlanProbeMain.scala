package graft

/** Scratch: print executed plans while iterating on PlanShapeSpec pins.
  * Kept checked in — `sbt "Test/runMain graft.PlanProbeMain"` is the
  * fastest way to eyeball a plan when adding the next pin.
  */
object PlanProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    for ((n, df) <- Seq(
      "p3" -> graft.queries.TextDedup.p3TokenBudget(spark, dir),
      "d10" -> graft.queries.TextDedup.d10Decontamination(spark, dir),
      "e10" -> graft.queries.Events.e10CohortRetention(spark, dir))) {
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
