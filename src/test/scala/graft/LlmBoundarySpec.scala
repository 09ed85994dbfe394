package graft

import org.apache.spark.sql.functions._

import graft.ops.LlmBoundary
import graft.ops.LlmBoundary._

/** The LLM inference boundary: batch shaping, truncation accounting,
  * retry/backoff, JSON-block extraction (SURVEY.md §2.8, §2.10.8 —
  * data-side surface only; the client is a deterministic stub). */
class LlmBoundarySpec extends SparkSpec {

  import spark.implicits._

  test("stub inference: deterministic, one response per request") {
    val reqs = (1L to 20L).map(i => LlmRequest(i, s"analyze event $i")).toDS()
    val out1 = infer(reqs, new StubClient, batchSize = 4).collect().sortBy(_.request_id)
    val out2 = infer(reqs, new StubClient, batchSize = 7).collect().sortBy(_.request_id)
    assert(out1.length === 20)
    // batch size must not change answers
    assert(out1.map(r => (r.request_id, r.response)).toSeq ===
      out2.map(r => (r.request_id, r.response)).toSeq)
    assert(out1.forall(_.attempts === 1))
    assert(out1.forall(!_.truncated))
  }

  test("context cap: over-budget prompts truncated and flagged") {
    val reqs = Seq(
      LlmRequest(1L, "x" * 50),
      LlmRequest(2L, "y" * 500)).toDS()
    val out = infer(reqs, new StubClient, maxPromptChars = 100)
      .collect().sortBy(_.request_id)
    assert(out(0).prompt_chars === 50 && !out(0).truncated)
    assert(out(1).prompt_chars === 100 && out(1).truncated)
  }

  test("retry: transient failures backed off then succeed, attempts recorded") {
    FlakyStubClient.calls.set(0)
    val reqs = Seq(LlmRequest(1L, "p")).toDS().repartition(1)
    val out = infer(reqs, new FlakyStubClient(2), batchSize = 8,
      maxAttempts = 5, baseBackoffMs = 1).collect()
    assert(out.head.attempts === 3)
  }

  test("retry: exhausted attempts surface the failure") {
    FlakyStubClient.calls.set(0)
    val reqs = Seq(LlmRequest(1L, "p")).toDS().repartition(1)
    val e = intercept[Exception] {
      infer(reqs, new FlakyStubClient(Int.MaxValue), maxAttempts = 2,
        baseBackoffMs = 1).collect()
    }
    assert(e.getMessage.contains("after 2 attempts") ||
      Option(e.getCause).exists(_.getMessage.contains("after 2 attempts")))
  }

  test("short response batch fails loudly instead of dropping rows") {
    val shortClient = new LlmClient {
      def complete(prompts: Seq[String]): Seq[String] = prompts.tail.map(_ => "ok")
    }
    val reqs = Seq(LlmRequest(1L, "a"), LlmRequest(2L, "b")).toDS().repartition(1)
    val e = intercept[Exception] {
      infer(reqs, shortClient, maxAttempts = 2, baseBackoffMs = 1).collect()
    }
    assert(e.getMessage.contains("responses") ||
      Option(e.getCause).exists(_.getMessage.contains("responses")))
  }

  test("HTTP client: POST/parse round trip against a local socket stub, retry on 500") {
    // JDK-built-in HttpServer on an ephemeral loopback port — the spec
    // keeps the HTTP boundary honest without any network egress
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/v1/complete", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
      val n = calls.incrementAndGet()
      if (n == 1) {
        // first call fails: infer()'s backoff must retry through it
        exchange.sendResponseHeaders(500, -1)
        exchange.close()
      } else {
        assert(exchange.getRequestHeaders.getFirst("X-Auth") == "secret-token")
        val prompts = LlmBoundary.JsonMini
          .stringArrayField(body, "prompts").get
        // echo transformed prompts, incl. characters that need escaping
        val resp = prompts.map(p => "echo:" + p + "\n\"done\"")
          .map(LlmBoundary.JsonMini.quote)
          .mkString("{\"responses\": [", ", ", "]}")
        val bytes = resp.getBytes("UTF-8")
        exchange.getResponseHeaders.add("Content-Type", "application/json")
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val client = new HttpLlmClient(
        s"http://127.0.0.1:$port/v1/complete",
        headers = Map("X-Auth" -> "secret-token"))
      val reqs = Seq(
        LlmRequest(1L, "first prompt"),
        LlmRequest(2L, "second \"quoted\" prompt\nwith newline"),
        LlmRequest(3L, "third")).toDS().repartition(1)
      val out = infer(reqs, client, batchSize = 3, maxAttempts = 3,
        baseBackoffMs = 10).collect().sortBy(_.request_id)
      assert(out.map(_.response).toSeq == Seq(
        "echo:first prompt\n\"done\"",
        "echo:second \"quoted\" prompt\nwith newline\n\"done\"",
        "echo:third\n\"done\""))
      assert(out.forall(_.attempts == 2), "first 500 must cost one retry")
      assert(calls.get() == 2)
    } finally server.stop(0)
  }

  test("clientFromEnv: stub by default, HTTP only when configured") {
    assert(clientFromEnv(Map.empty).isInstanceOf[StubClient])
    assert(clientFromEnv(Map("GRAFT_LLM_ENDPOINT" -> ""))
      .isInstanceOf[StubClient])
    val http = clientFromEnv(Map(
      "GRAFT_LLM_ENDPOINT" -> "http://127.0.0.1:1/x",
      "GRAFT_LLM_AUTH_HEADER" -> "Authorization: Bearer t"))
    assert(http.isInstanceOf[HttpLlmClient])
  }

  test("JsonMini: escaping round trip and malformed bodies reject") {
    import LlmBoundary.JsonMini
    val tricky = Seq("plain", "with \"quotes\"", "tab\there",
      "back\\slash", "uni \u00e9\u4e2d")
    val body = tricky.map(JsonMini.quote)
      .mkString("{\"responses\": [", ", ", "]}")
    assert(JsonMini.stringArrayField(body, "responses").get == tricky)
    assert(JsonMini.stringArrayField("{}", "responses").isEmpty)
    assert(JsonMini.stringArrayField(
      "{\"responses\": [1, 2]}", "responses").isEmpty)
    assert(JsonMini.stringArrayField(
      "{\"responses\": [\"unterminated", "responses").isEmpty)
  }

  test("json block extraction: fenced block preferred, brace fallback") {
    val df = Seq(
      ("""text ```json {"hypothesis": "a", "confidence": 0.9} ``` end"""),
      ("""no fence {"hypothesis": "b", "confidence": 0.5} trailing"""),
      ("""nothing parseable""")).toDF("response")
    val parsed = LlmBoundary.hypothesis(df).collect()
    assert(parsed(0).getAs[String]("hypothesis") === "a")
    assert(parsed(0).getAs[Double]("confidence") === 0.9)
    assert(parsed(1).getAs[String]("hypothesis") === "b")
    assert(parsed(2).getAs[String]("hypothesis") === null)
  }
}
