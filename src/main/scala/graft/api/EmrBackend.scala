package graft.api

import graft.api.JobService.{Job, JobBackend, JobState}

import java.util.concurrent.{ConcurrentHashMap, Executors}

/** EMR-on-EKS execution backend — the reference's actual submit path
  * (`boto3.client('emr-containers')`, /root/reference/src/emr.py:28-102)
  * re-expressed against a narrow client seam so the request assembly,
  * state mapping, and the reference's per-exception taxonomy are all
  * spec-testable without AWS.
  *
  * Shape parity with emr.py:
  *  - `startJobRun` carries name, virtualClusterId, executionRoleArn,
  *    releaseLabel, a sparkSubmitJobDriver {entryPoint =
  *    s3://bucket/scripts/<entrypoint>, entryPointArguments,
  *    sparkSubmitParameters} and the s3 monitoring logUri
  *    s3://bucket/joblogs (emr.py:32-51);
  *  - `describeJobRun`/`cancelJobRun` take (id, virtualClusterId)
  *    (emr.py:68-71, 88-91);
  *  - errors split into Validation / ResourceNotFound / InternalServer,
  *    each logged with its message (emr.py:52-60) — validation and
  *    not-found are terminal, internal-server is treated as transient
  *    during polling (the reference's PATCH-callback flow simply
  *    re-describes later).
  *
  * The reference is notified of completion by EMR calling back into the
  * service (EKS_EMR_SERVICE_URL, emr.py:185). That push channel cannot
  * exist in-process, so the adapter closes the same loop by polling
  * `describeJobRun` on a daemon thread until the run is terminal — the
  * state-refresh call is the one the reference's `get()` makes.
  */
object EmrBackend {

  /** boto3 `sparkSubmitJobDriver` block (emr.py:37-43). */
  case class SparkSubmitJobDriver(
      entryPoint: String,
      entryPointArguments: Seq[String],
      sparkSubmitParameters: String)

  /** boto3 `start_job_run` request (emr.py:32-51). */
  case class StartJobRunRequest(
      name: String,
      virtualClusterId: String,
      executionRoleArn: String,
      releaseLabel: String,
      jobDriver: SparkSubmitJobDriver,
      s3LogUri: String)

  /** `describe_job_run` response slice the service consumes. */
  case class JobRunStatus(id: String, state: String,
      stateDetails: Option[String] = None)

  /** The reference's handled exception taxonomy (emr.py:52-60). */
  sealed abstract class EmrError(val message: String) extends RuntimeException(message)
  final class ValidationException(m: String) extends EmrError(m)
  final class ResourceNotFoundException(m: String) extends EmrError(m)
  final class InternalServerException(m: String) extends EmrError(m)

  /** Narrow seam over the `emr-containers` API — exactly the three calls
    * the reference makes. A production impl wraps the AWS SDK; specs use
    * a fake.
    */
  trait EmrContainersClient {
    /** Returns the EMR job-run id. */
    def startJobRun(req: StartJobRunRequest): String
    def describeJobRun(id: String, virtualClusterId: String): JobRunStatus
    def cancelJobRun(id: String, virtualClusterId: String): Unit
  }

  /** Deployment config (the reference reads these from env —
    * emr.py:166-186; entrypoint script per algorithm via
    * `ALGO_<NAME>_ENTRYPOINT`).
    */
  case class EmrConfig(
      virtualClusterId: String,
      executionRoleArn: String,
      releaseLabel: String,
      entrypoints: Map[Int, String], // algorithm ordinal -> script name
      cluster: SubmitParams.ClusterConfig,
      pollIntervalMs: Long = 5000L)

  def fromEnv(env: Map[String, String] = sys.env): EmrConfig =
    EmrConfig(
      virtualClusterId = env.getOrElse("EMR_VIRTUAL_CLUSTER_ID", ""),
      executionRoleArn = env.getOrElse("EMR_EXECUTION_ROLE_ARN", ""),
      releaseLabel = env.getOrElse("EMR_RELEASE_LABEL", "emr-6.9.0-latest"),
      entrypoints = Map(
        JobService.Algorithm.BlindSearch.id ->
          env.getOrElse("ALGO_BLIND_SEARCH_ENTRYPOINT", "main.py"),
        JobService.Algorithm.Bbha.id ->
          env.getOrElse("ALGO_BBHA_ENTRYPOINT", "main.py")),
      cluster = SubmitParams.fromEnv(env))

  /** EMR run states → service job states. `CANCEL_PENDING` stays
    * non-terminal (the cancel confirmation arrives on a later describe).
    */
  def mapState(emrState: String): Option[(JobState, Boolean)] = emrState match {
    case "PENDING" | "SUBMITTED" | "RUNNING" | "CANCEL_PENDING" =>
      Some((JobState.Running, false))
    case "COMPLETED" => Some((JobState.Completed, true))
    case "FAILED"    => Some((JobState.Failed, true))
    case "CANCELLED" => Some((JobState.Cancelled, true))
    case _ => None
  }

  /** The start_job_run request for a job (emr.py:28-51 + 105-137). */
  def buildRequest(cfg: EmrConfig, job: Job): StartJobRunRequest = {
    val entrypoint = cfg.entrypoints.getOrElse(job.algorithm, "main.py")
    StartJobRunRequest(
      name = job.name,
      virtualClusterId = cfg.virtualClusterId,
      executionRoleArn = cfg.executionRoleArn,
      releaseLabel = cfg.releaseLabel,
      jobDriver = SparkSubmitJobDriver(
        entryPoint = s"s3://${cfg.cluster.bucket}/scripts/$entrypoint",
        entryPointArguments = job.args,
        sparkSubmitParameters =
          SubmitParams.sparkSubmitParams(cfg.cluster, job.name)),
      s3LogUri = s"s3://${cfg.cluster.bucket}/joblogs")
  }
}

class EmrBackend(client: EmrBackend.EmrContainersClient,
    cfg: EmrBackend.EmrConfig,
    log: String => Unit = System.err.println) extends JobBackend {
  import EmrBackend._

  // service job id -> EMR job-run id
  private val runIds = new ConcurrentHashMap[String, String]()
  private val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r); t.setDaemon(true); t
  }

  /** Starts the run and polls it to a terminal state. A start-time EMR
    * error is logged with the reference's wording and rethrown so the
    * service answers 500 (the reference returns None → app.py 500s).
    */
  def submit(job: Job, onFinish: (JobState, Option[String]) => Unit): Unit = {
    val runId =
      try client.startJobRun(buildRequest(cfg, job))
      catch { case e: EmrError => logEmr(e); throw e }
    runIds.put(job.id, runId)
    pool.execute(() => poll(job, runId, onFinish))
  }

  private def poll(job: Job, runId: String,
      onFinish: (JobState, Option[String]) => Unit): Unit = {
    var done = false
    // once terminal, finish exactly once even if the callback throws
    def finish(state: JobState, details: Option[String]): Unit = {
      done = true
      try onFinish(state, details)
      catch {
        case scala.util.control.NonFatal(e) =>
          log(s"[emr-backend] onFinish for ${job.id} threw: $e")
      }
    }
    while (!done) {
      try {
        val st = client.describeJobRun(runId, cfg.virtualClusterId)
        mapState(st.state) match {
          case Some((jobState, true)) => finish(jobState, st.stateDetails)
          case _ => // still running (or unknown state — keep watching)
        }
      } catch {
        case e: ResourceNotFoundException =>
          // the run vanished server-side: terminal, nothing to re-describe
          logEmr(e); finish(JobState.Failed, Some(e.message))
        case e: ValidationException =>
          logEmr(e); finish(JobState.Failed, Some(e.message))
        case e: InternalServerException =>
          logEmr(e) // transient server fault — re-describe next tick
        case _: InterruptedException =>
          // shutdown: stop watching without inventing a terminal state
          log(s"[emr-backend] monitor for ${job.id} interrupted"); done = true
        case scala.util.control.NonFatal(e) =>
          // a real SDK client throws beyond the modeled taxonomy (network
          // blips, credential refresh) — the monitor must survive those,
          // not die silently and leave the job Running forever
          log(s"[emr-backend] monitor error for ${job.id} (will retry): $e")
      }
      if (!done) {
        try Thread.sleep(cfg.pollIntervalMs)
        catch { case _: InterruptedException => done = true }
      }
    }
    runIds.remove(job.id)
  }

  /** cancel_job_run (emr.py:85-102): true when EMR accepted the cancel,
    * false on any handled EMR error (logged, per the reference).
    */
  def cancel(job: Job): Boolean =
    Option(runIds.get(job.id)).exists { runId =>
      try { client.cancelJobRun(runId, cfg.virtualClusterId); true }
      catch { case e: EmrError => logEmr(e); false }
    }

  /** The reference logs a taxonomy headline + the error message
    * (emr.py:52-60).
    */
  private def logEmr(e: EmrError): Unit = {
    val headline = e match {
      case _: ValidationException => "Job validation exception"
      case _: ResourceNotFoundException => "Resource not found exception"
      case _: InternalServerException => "Internal server exception"
    }
    log(s"[emr-backend] $headline: ${e.message}")
  }
}
