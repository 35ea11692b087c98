package graft

import graft.api.JobService
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.CountDownLatch

class JobServiceSpec extends AnyFunSuite {
  import JobService._

  private val client = HttpClient.newHttpClient()

  private def req(port: Int, method: String, path: String,
      body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder().uri(URI.create(s"http://localhost:$port$path"))
    val withBody =
      if (body.isEmpty) b.method(method, HttpRequest.BodyPublishers.noBody())
      else b.method(method, HttpRequest.BodyPublishers.ofString(body))
        .header("Content-Type", "application/json")
    client.send(withBody.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def withService(run: Job => Unit = _ => Thread.sleep(50))(
      f: (Int, JobService) => Unit): Unit = {
    val svc = new JobService(new InProcessBackend(run), multiomixUrl = None,
      sleepTimeMs = 10)
    val port = svc.start()
    try f(port, svc) finally svc.stop()
  }

  val validBody: String =
    """{"name": "exp1", "algorithm": 1,
      |"entrypoint_arguments": [
      |  {"name": "app-name", "value": "exp1"},
      |  {"name": "n-stars", "value": 5}]}""".stripMargin

  test("schedule → 201 with Location; status reaches COMPLETED") {
    val latch = new CountDownLatch(1)
    withService(_ => latch.countDown()) { (port, svc) =>
      val r = req(port, "POST", "/job", validBody)
      assert(r.statusCode() == 201)
      val id = (JsonMethods.parse(r.body()) \ "id").values.toString
      assert(r.headers().firstValue("Location").get() == s"/job/$id")
      latch.await()
      Thread.sleep(200) // let onFinish run
      val status = req(port, "GET", s"/job/$id")
      assert(status.statusCode() == 200)
      val json = JsonMethods.parse(status.body())
      assert((json \ "state").values == "COMPLETED")
      assert((json \ "name").values == "exp1")
      assert((json \ "finishedAt").values != null)
      // marshalled args reached the job
      assert(svc.getJob(id).get.args == Seq("--app-name", "exp1", "--n-stars", "5"))
    }
  }

  test("validation: missing app-name → 400; missing keys → 400; bad json → 400") {
    withService() { (port, _) =>
      val noAppName =
        """{"name": "x", "algorithm": 1,
          |"entrypoint_arguments": [{"name": "other", "value": "1"}]}""".stripMargin
      assert(req(port, "POST", "/job", noAppName).statusCode() == 400)
      assert(req(port, "POST", "/job", """{"name": "x"}""").statusCode() == 400)
      assert(req(port, "POST", "/job", "not json at all").statusCode() == 400)
      assert(req(port, "POST", "/job",
        validBody.replace("\"algorithm\": 1", "\"algorithm\": 9"))
        .statusCode() == 400)
    }
  }

  test("null name generates multiomix-<algo>-<6 letters>-<6 digits>") {
    withService() { (port, _) =>
      val r = req(port, "POST", "/job", validBody.replace("\"exp1\",", "null,"))
      assert(r.statusCode() == 201)
      val id = (JsonMethods.parse(r.body()) \ "id").values.toString
      val name = (JsonMethods.parse(req(port, "GET", s"/job/$id").body()) \ "name")
        .values.toString
      assert(name.matches("multiomix-bbha-[a-z]{6}-[0-9]{6}"), name)
    }
  }

  test("unknown job → 404; DELETE cancels a running job") {
    withService(_ => Thread.sleep(60000)) { (port, _) =>
      assert(req(port, "GET", "/job/nope").statusCode() == 404)
      assert(req(port, "DELETE", "/job/nope").statusCode() == 404)
      val id = (JsonMethods.parse(req(port, "POST", "/job", validBody).body()) \ "id")
        .values.toString
      val del = req(port, "DELETE", s"/job/$id")
      assert(del.statusCode() == 200)
      val after = JsonMethods.parse(req(port, "GET", s"/job/$id").body())
      assert((after \ "state").values == "CANCELLED")
      // second delete: no longer cancellable
      assert(req(port, "DELETE", s"/job/$id").statusCode() == 409)
    }
  }

  test("PATCH returns 204 immediately and relays after the settle delay") {
    // relay target server
    val received = new java.util.concurrent.LinkedBlockingQueue[String]()
    val relay = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    relay.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      received.put(new String(ex.getRequestBody.readAllBytes()))
      ex.sendResponseHeaders(200, 0); ex.close()
    })
    relay.start()
    val relayPort = relay.getAddress.getPort
    val svc = new JobService(new InProcessBackend(_ => ()),
      multiomixUrl = Some(s"http://localhost:$relayPort"), sleepTimeMs = 30)
    val port = svc.start()
    try {
      val id = (JsonMethods.parse(req(port, "POST", "/job", validBody).body()) \ "id")
        .values.toString
      val t0 = System.nanoTime()
      val patch = req(port, "PATCH", s"/job/$id")
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(patch.statusCode() == 204)
      assert(elapsedMs < 1000, s"PATCH must not block on the settle delay ($elapsedMs ms)")
      val relayed = received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
      assert(relayed != null, "no relay arrived")
      assert((JsonMethods.parse(relayed) \ "id").values.toString == id)
    } finally { svc.stop(); relay.stop(0) }
  }

  test("version banner on GET /") {
    withService() { (port, _) =>
      val r = req(port, "GET", "/")
      assert(r.statusCode() == 200 && r.body().contains("graft"))
    }
  }

  test("arg marshalling and job-name shapes (emr.py:140-164 fixtures)") {
    assert(marshalArgs(Seq("a" -> "1")) == Seq("--a", "1"))
    assert(marshalArgs(Seq("x" -> "y", "z" -> "w")) == Seq("--x", "y", "--z", "w"))
    val n = generateJobName(0, new scala.util.Random(1))
    assert(n.matches("multiomix-blindsearch-[a-z]{6}-[0-9]{6}"), n)
  }

  // ---- failure paths (reference emr.py:53-60 / app.py:55-57, 116-134) ----

  test("backend submission failure → 500 and no zombie job record") {
    // the reference's emr.schedule catches the AWS exception, logs it and
    // returns None; app.py then abort(500)s and persists NOTHING
    val throwing = new JobBackend {
      def submit(job: Job, onFinish: (JobState, Option[String]) => Unit): Unit =
        throw new RuntimeException("ValidationException: bad virtual cluster")
      def cancel(job: Job): Boolean = false
    }
    val svc = new JobService(throwing, multiomixUrl = None, sleepTimeMs = 10)
    val port = svc.start()
    try {
      val r = req(port, "POST", "/job", validBody)
      assert(r.statusCode() == 500, r.body())
      assert((JsonMethods.parse(r.body()) \ "error").values.toString
        .contains("ValidationException"))
      // the failed submission left no record behind — and the service
      // still serves subsequent requests
      assert(req(port, "GET", "/").statusCode() == 200)
      assert(req(port, "POST", "/job", "not json").statusCode() == 400)
    } finally svc.stop()
  }

  test("relay timeout: one attempt, logged not retried, service healthy") {
    // target accepts the request then stalls past the (injected) relay
    // timeout — the app.py:121-127 requests.Timeout branch
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val stall = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    stall.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      attempts.incrementAndGet()
      Thread.sleep(2000) // > relayTimeoutMs
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    stall.start()
    val svc = new JobService(new InProcessBackend(_ => ()),
      multiomixUrl = Some(s"http://localhost:${stall.getAddress.getPort}"),
      sleepTimeMs = 10, relayTimeoutMs = 150)
    val port = svc.start()
    try {
      val id = (JsonMethods.parse(req(port, "POST", "/job", validBody).body()) \ "id")
        .values.toString
      assert(req(port, "PATCH", s"/job/$id").statusCode() == 204)
      Thread.sleep(1200) // settle + timeout + any (forbidden) retry window
      assert(attempts.get() == 1, s"expected exactly one relay attempt, got $attempts")
      assert(req(port, "GET", s"/job/$id").statusCode() == 200)
    } finally { svc.stop(); stall.stop(0) }
  }

  test("relay connection-refused and HTTP-500 targets: logged, not retried") {
    // ConnectionError branch: nothing listens on the target port.
    // HttpServer.create BINDS (and so accepts into the kernel backlog
    // even before start()) — to get a genuine refused connection the
    // port must be allocated and then RELEASED before the relay fires.
    val deadPort = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val svcDead = new JobService(new InProcessBackend(_ => ()),
      multiomixUrl = Some(s"http://localhost:$deadPort"),
      sleepTimeMs = 10, relayTimeoutMs = 500)
    val p1 = svcDead.start()
    try {
      val id = (JsonMethods.parse(req(p1, "POST", "/job", validBody).body()) \ "id")
        .values.toString
      assert(req(p1, "PATCH", s"/job/$id").statusCode() == 204)
      Thread.sleep(400)
      assert(req(p1, "GET", s"/job/$id").statusCode() == 200)
    } finally svcDead.stop()
    // HTTPError branch (raise_for_status): target answers 500 — exactly
    // one attempt, no retry
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val failing = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    failing.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      attempts.incrementAndGet()
      ex.sendResponseHeaders(500, -1); ex.close()
    })
    failing.start()
    val svc = new JobService(new InProcessBackend(_ => ()),
      multiomixUrl = Some(s"http://localhost:${failing.getAddress.getPort}"),
      sleepTimeMs = 10, relayTimeoutMs = 500)
    val p2 = svc.start()
    try {
      val id = (JsonMethods.parse(req(p2, "POST", "/job", validBody).body()) \ "id")
        .values.toString
      assert(req(p2, "PATCH", s"/job/$id").statusCode() == 204)
      Thread.sleep(600)
      assert(attempts.get() == 1, s"expected exactly one relay attempt, got $attempts")
      assert(req(p2, "GET", s"/job/$id").statusCode() == 200)
    } finally { svc.stop(); failing.stop(0) }
  }
}
