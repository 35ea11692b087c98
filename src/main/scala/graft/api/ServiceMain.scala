package graft.api

import graft.app.{Experiment, Main}
import org.apache.spark.sql.SparkSession

/** Standalone job-service process: REST lifecycle over an in-process
  * Spark backend — the local-mode stand-in for the reference's
  * Flask + EMR-on-EKS pair (spark-submit parameters assembled from env,
  * README.md:29-58; here one shared local SparkSession).
  */
object ServiceMain {
  def main(args: Array[String]): Unit = {
    val port = sys.env.getOrElse("PORT", "8591").toInt
    lazy val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-job-service")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    val backend = new JobService.InProcessBackend(job => {
      // job.args is the marshalled --key value list; reuse the CLI parser
      val argMap = Main.parseArgs(job.args.toArray)
      Experiment.run(spark, Main.buildConfig(argMap))
    })
    val svc = new JobService(backend)
    val actual = svc.start(port)
    println(s"[graft-service] listening on :$actual")
    Thread.currentThread().join() // serve forever
  }
}
