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
      "d11" -> graft.queries.TextDedup.d11ChunkDedup(spark, dir),
      "d12" -> graft.queries.TextDedup.d12TrainOverlap(spark, dir),
      "t13" -> graft.queries.TextDedup.t13TopBigramFrac(spark, dir),
      "s6" -> graft.queries.Embeddings.s6SemanticDedup(spark, dir))) {
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
