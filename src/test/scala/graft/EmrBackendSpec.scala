package graft

import graft.api.{EmrBackend, JobService, SubmitParams}
import graft.api.EmrBackend._
import graft.api.JobService.{Job, JobState}
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Instant
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Drives schedule/poll/cancel through a fake `emr-containers` client,
  * asserting the request shape the reference sends
  * (/root/reference/src/emr.py:28-102) and the error taxonomy handling.
  */
class EmrBackendSpec extends AnyFunSuite {

  private val cluster = SubmitParams.ClusterConfig(
    bucket = "test-bucket", appArchive = "graft.jar")

  private def config(pollMs: Long = 5) = EmrConfig(
    virtualClusterId = "vc-123",
    executionRoleArn = "arn:aws:iam::1:role/emr",
    releaseLabel = "emr-6.9.0-latest",
    entrypoints = Map(0 -> "blind.py", 1 -> "bbha.py"),
    cluster = cluster,
    pollIntervalMs = pollMs)

  /** Scripted fake: records every call; `describeJobRun` walks the given
    * state sequence (sticky on the last).
    */
  private class FakeClient(states: Seq[() => JobRunStatus],
      startError: Option[EmrError] = None,
      cancelError: Option[EmrError] = None) extends EmrContainersClient {
    val started = new ConcurrentLinkedQueue[StartJobRunRequest]()
    val described = new ConcurrentLinkedQueue[(String, String)]()
    val cancelled = new ConcurrentLinkedQueue[(String, String)]()
    private val calls = new AtomicInteger(0)
    def startJobRun(req: StartJobRunRequest): String = {
      startError.foreach(throw _)
      started.add(req); s"emr-run-${started.size()}"
    }
    def describeJobRun(id: String, vc: String): JobRunStatus = {
      described.add((id, vc))
      val i = math.min(calls.getAndIncrement(), states.size - 1)
      states(i)()
    }
    def cancelJobRun(id: String, vc: String): Unit = {
      cancelError.foreach(throw _)
      cancelled.add((id, vc))
    }
  }

  private def status(state: String): () => JobRunStatus =
    () => JobRunStatus("emr-run-1", state)

  private def job(name: String = "exp1", algo: Int = 1) =
    Job(id = "job-1", name = name, algorithm = algo,
      args = Seq("--app-name", "exp1", "--n-stars", "5"),
      createdAt = Instant.now())

  test("start_job_run request shape matches emr.py:32-51") {
    val req = buildRequest(config(), job())
    assert(req.name == "exp1")
    assert(req.virtualClusterId == "vc-123")
    assert(req.executionRoleArn == "arn:aws:iam::1:role/emr")
    assert(req.releaseLabel == "emr-6.9.0-latest")
    // per-algorithm entrypoint under s3://bucket/scripts/ (emr.py:38-39)
    assert(req.jobDriver.entryPoint == "s3://test-bucket/scripts/bbha.py")
    assert(buildRequest(config(), job(algo = 0)).jobDriver.entryPoint
      == "s3://test-bucket/scripts/blind.py")
    // marshalled --k v pairs pass through verbatim (emr.py:40)
    assert(req.jobDriver.entryPointArguments
      == Seq("--app-name", "exp1", "--n-stars", "5"))
    // the submit-params string carries the 11 confs + 3 driver envs
    val p = req.jobDriver.sparkSubmitParameters
    for (frag <- Seq(
        "spark.kubernetes.driver.podTemplateFile=s3://test-bucket/templates/",
        "spark.kubernetes.executor.podTemplateFile=s3://test-bucket/templates/",
        "spark.kubernetes.container.image=", "spark.executor.cores=",
        "spark.executor.memory=", "spark.driver.cores=",
        "spark.driver.maxResultSize=", "spark.driver.memory=",
        "spark.executor.instances=", "spark.executor.heartbeatInterval=",
        "spark.network.timeout=", "spark.kubernetes.driverEnv.DATASETS_PATH=",
        "spark.kubernetes.driverEnv.RESULTS_PATH=",
        "spark.kubernetes.driverEnv.JOB_NAME=exp1"))
      assert(p.contains(frag), s"missing $frag in: $p")
    // s3 monitoring log uri (emr.py:45-49)
    assert(req.s3LogUri == "s3://test-bucket/joblogs")
  }

  test("submit polls describe_job_run to COMPLETED") {
    val fake = new FakeClient(Seq(
      status("PENDING"), status("RUNNING"), status("COMPLETED")))
    val backend = new EmrBackend(fake, config())
    val latch = new CountDownLatch(1)
    @volatile var finalState: JobState = null
    backend.submit(job(), (st, _) => { finalState = st; latch.countDown() })
    assert(latch.await(5, TimeUnit.SECONDS))
    assert(finalState == JobState.Completed)
    assert(fake.started.size() == 1)
    // every describe carried (run id, virtual cluster id) — emr.py:68-71
    fake.described.forEach { case (id, vc) =>
      assert(id == "emr-run-1" && vc == "vc-123")
    }
    assert(fake.described.size() >= 3)
  }

  test("CANCEL_PENDING is non-terminal; CANCELLED finishes as Cancelled") {
    val fake = new FakeClient(Seq(
      status("RUNNING"), status("CANCEL_PENDING"), status("CANCELLED")))
    val backend = new EmrBackend(fake, config())
    val latch = new CountDownLatch(1)
    @volatile var finalState: JobState = null
    backend.submit(job(), (st, _) => { finalState = st; latch.countDown() })
    assert(latch.await(5, TimeUnit.SECONDS))
    assert(finalState == JobState.Cancelled)
    assert(fake.described.size() >= 3)
  }

  test("InternalServerException during polling is transient (emr.py taxonomy)") {
    val logged = new ConcurrentLinkedQueue[String]()
    val fake = new FakeClient(Seq(
      () => throw new InternalServerException("blip"),
      status("COMPLETED")))
    val backend = new EmrBackend(fake, config(), log = logged.add(_))
    val latch = new CountDownLatch(1)
    @volatile var finalState: JobState = null
    backend.submit(job(), (st, _) => { finalState = st; latch.countDown() })
    assert(latch.await(5, TimeUnit.SECONDS))
    assert(finalState == JobState.Completed, "ISE must not kill the run")
    assert(logged.stream().anyMatch(_.contains("Internal server exception")))
  }

  test("ResourceNotFoundException during polling is terminal Failed") {
    val logged = new ConcurrentLinkedQueue[String]()
    val fake = new FakeClient(Seq(
      () => throw new ResourceNotFoundException("no such run")))
    val backend = new EmrBackend(fake, config(), log = logged.add(_))
    val latch = new CountDownLatch(1)
    @volatile var finalState: JobState = null
    @volatile var details: Option[String] = None
    backend.submit(job(), (st, d) => { finalState = st; details = d; latch.countDown() })
    assert(latch.await(5, TimeUnit.SECONDS))
    assert(finalState == JobState.Failed)
    assert(details.exists(_.contains("no such run")))
    assert(logged.stream().anyMatch(_.contains("Resource not found exception")))
  }

  test("cancel routes to cancel_job_run with the EMR run id; errors → false") {
    val fake = new FakeClient(Seq(status("RUNNING")))
    val backend = new EmrBackend(fake, config(pollMs = 50))
    backend.submit(job(), (_, _) => ())
    // give the backend a beat to register the run id
    Thread.sleep(20)
    assert(backend.cancel(job()))
    assert(fake.cancelled.peek() == ("emr-run-1", "vc-123"))
    // unknown job: nothing to cancel
    assert(!backend.cancel(job().copy(id = "other")))
    // EMR rejecting the cancel → false, logged (emr.py:92-102)
    val logged = new ConcurrentLinkedQueue[String]()
    val failing = new FakeClient(Seq(status("RUNNING")),
      cancelError = Some(new ValidationException("not cancellable")))
    val b2 = new EmrBackend(failing, config(pollMs = 50), log = logged.add(_))
    b2.submit(job(), (_, _) => ())
    Thread.sleep(20)
    assert(!b2.cancel(job()))
    assert(logged.stream().anyMatch(_.contains("Job validation exception")))
  }

  test("full service loop over the EMR backend: 201 → COMPLETED") {
    val fake = new FakeClient(Seq(status("RUNNING"), status("COMPLETED")))
    val svc = new JobService(new EmrBackend(fake, config()),
      multiomixUrl = None, sleepTimeMs = 10)
    val port = svc.start()
    try {
      val client = HttpClient.newHttpClient()
      val post = client.send(HttpRequest.newBuilder()
        .uri(URI.create(s"http://localhost:$port/job"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"name": "exp1", "algorithm": 1,
            |"entrypoint_arguments": [{"name": "app-name", "value": "exp1"}]}""".stripMargin))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(post.statusCode() == 201)
      val id = (JsonMethods.parse(post.body()) \ "id").values.toString
      // poll the service until the backend's describe loop finishes it
      var state = ""
      val deadline = System.nanoTime() + 5e9.toLong
      while (state != "COMPLETED" && System.nanoTime() < deadline) {
        val get = client.send(HttpRequest.newBuilder()
          .uri(URI.create(s"http://localhost:$port/job/$id")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        state = (JsonMethods.parse(get.body()) \ "state").values.toString
        if (state != "COMPLETED") Thread.sleep(10)
      }
      assert(state == "COMPLETED")
      assert(fake.started.peek().name == "exp1")
    } finally svc.stop()
  }

  test("start_job_run ValidationException → service answers 500 (app.py None → 500)") {
    val fake = new FakeClient(Seq(status("RUNNING")),
      startError = Some(new ValidationException("bad role")))
    val svc = new JobService(new EmrBackend(fake, config()),
      multiomixUrl = None, sleepTimeMs = 10)
    val port = svc.start()
    try {
      val client = HttpClient.newHttpClient()
      val post = client.send(HttpRequest.newBuilder()
        .uri(URI.create(s"http://localhost:$port/job"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"name": "exp1", "algorithm": 1,
            |"entrypoint_arguments": [{"name": "app-name", "value": "exp1"}]}""".stripMargin))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(post.statusCode() == 500)
    } finally svc.stop()
  }
}
