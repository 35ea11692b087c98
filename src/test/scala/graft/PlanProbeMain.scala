package graft

/** Ad-hoc physical-plan dump for whatever operator is under the loupe.
  * Kept checked in — `sbt "Test/runMain graft.PlanProbeMain"` is the
  * fastest way to eyeball a plan when adding the next pin.
  */
object PlanProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    for ((n, df) <- Seq(
      "e14" -> graft.queries.Events.e14TimedFunnel(spark, dir),
      "q27" -> graft.queries.Relational.q27RollingRevenue(spark, dir),
      "t18" -> graft.queries.TextDedup.t18IntradocRep(spark, dir),
      "s13" -> graft.queries.Embeddings.s13KnnClassify(spark, dir))) {
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
