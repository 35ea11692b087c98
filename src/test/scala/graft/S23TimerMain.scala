package graft

/** Wall-clock timer for the s23 greedy loop — runs the REAL operator
  * (no copied body: a drifted twin measures the wrong thing), twice, so
  * the first number carries codegen/JIT warmup and the second is the
  * steady state: `sbt "Test/runMain graft.S23TimerMain [sfDir]"`.
  *
  * History: the round-12 phase-level instrumentation of this main
  * localized two scale bugs — embedding payloads riding the top-k
  * window exchanges, and per-round plan doubling under plain persist
  * (fixed with slim ranking + localCheckpoint; see SCALE.md).
  */
object S23TimerMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s23-timer] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    timed("run 1 (warmup)") {
      graft.queries.Embeddings.s23MmrDiversify(spark, dir).collect().length
    }
    spark.sqlContext.clearCache()
    timed("run 2 (steady)") {
      graft.queries.Embeddings.s23MmrDiversify(spark, dir).collect().length
    }
    spark.stop()
  }
}
