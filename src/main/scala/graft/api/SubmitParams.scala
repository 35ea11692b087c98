package graft.api

/** Cluster-submission parameter assembly — the reference's
  * `get_spark_submit_params_str` (/root/reference/src/emr.py:105-137):
  * the spark-submit conf string an EMR-on-EKS / Kubernetes backend
  * attaches to a job run, built from the deployment config. Pure and
  * backend-agnostic; a cloud `JobBackend` passes it to its submit API,
  * a local backend ignores it.
  *
  * The large heartbeat/network timeouts are load-bearing (single fitness
  * tasks legitimately run minutes — SURVEY §4.2, Dockerfile:16-17).
  */
object SubmitParams {

  case class ClusterConfig(
      bucket: String,
      appArchive: String, // the reference ships py-files; here the jar
      driverTemplate: String = "pod-template-driver.yaml",
      executorTemplate: String = "pod-template-executor.yaml",
      image: String = "graft:latest",
      executorCores: Int = 1,
      executorMemory: String = "4g",
      driverCores: Int = 1,
      driverMemory: String = "4g",
      driverMaxResultSize: String = "2g",
      executorInstances: Int = 3,
      executorHeartbeatInterval: String = "600s",
      networkTimeout: String = "2400s",
      datasetsPath: String = "/var/data",
      resultsPath: String = "/var/results")

  def sparkSubmitParams(cfg: ClusterConfig, jobName: String): String =
    Seq(
      s"--jars s3://${cfg.bucket}/jars/${cfg.appArchive}",
      s"--conf spark.kubernetes.driver.podTemplateFile=s3://${cfg.bucket}/templates/${cfg.driverTemplate}",
      s"--conf spark.kubernetes.executor.podTemplateFile=s3://${cfg.bucket}/templates/${cfg.executorTemplate}",
      s"--conf spark.kubernetes.container.image=${cfg.image}",
      s"--conf spark.executor.cores=${cfg.executorCores}",
      s"--conf spark.executor.memory=${cfg.executorMemory}",
      s"--conf spark.driver.cores=${cfg.driverCores}",
      s"--conf spark.driver.maxResultSize=${cfg.driverMaxResultSize}",
      s"--conf spark.driver.memory=${cfg.driverMemory}",
      s"--conf spark.executor.instances=${cfg.executorInstances}",
      s"--conf spark.executor.heartbeatInterval=${cfg.executorHeartbeatInterval}",
      s"--conf spark.network.timeout=${cfg.networkTimeout}",
      s"--conf spark.kubernetes.driverEnv.DATASETS_PATH=${cfg.datasetsPath}",
      s"--conf spark.kubernetes.driverEnv.RESULTS_PATH=${cfg.resultsPath}",
      s"--conf spark.kubernetes.driverEnv.JOB_NAME=$jobName",
    ).mkString(" ")

  /** Env-driven config with the reference's defaults (Dockerfile:3-30). */
  def fromEnv(env: Map[String, String] = sys.env): ClusterConfig =
    ClusterConfig(
      bucket = env.getOrElse("S3_BUCKET_NAME", "graft-jobs"),
      appArchive = env.getOrElse("APP_ARCHIVE", "graft.jar"),
      image = env.getOrElse("CONTAINER_IMAGE", "graft:latest"),
      executorCores = env.getOrElse("EXECUTOR_CORES", "1").toInt,
      executorMemory = env.getOrElse("EXECUTOR_MEMORY", "4g"),
      driverCores = env.getOrElse("DRIVER_CORES", "1").toInt,
      driverMemory = env.getOrElse("DRIVER_MEMORY", "4g"),
      driverMaxResultSize = env.getOrElse("DRIVER_MAX_RESULT_SIZE", "2g"),
      executorInstances = env.getOrElse("EXECUTOR_INSTANCES", "3").toInt,
      executorHeartbeatInterval = env.getOrElse("EXECUTOR_HEARTBEAT_INTERVAL", "600s"),
      networkTimeout = env.getOrElse("NETWORK_TIMEOUT", "2400s"),
      datasetsPath = env.getOrElse("DATASETS_PATH", "/var/data"),
      resultsPath = env.getOrElse("RESULTS_PATH", "/var/results"))
}
