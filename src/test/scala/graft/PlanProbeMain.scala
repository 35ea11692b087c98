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
      "s11" -> graft.queries.Embeddings.s11PqAdc(spark, dir))) {
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
