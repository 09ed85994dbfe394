package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The LLM inference boundary as distributed plumbing.
  *
  * The reference calls Gemini from its single-process driver with a
  * 120k-char context cap, exponential-backoff retry, and JSON-block
  * extraction (tools/agentic_loop/investigation_agent.py:239,810-860,
  * 820-829). In a Spark engine the same boundary runs per partition:
  * rows are batched, each batch is one client call, failures retry with
  * exponential backoff, and the response's JSON block is extracted
  * relationally.
  *
  * The client is STUBBED (no network egress in this environment):
  * `StubClient` answers deterministically from the prompt hash. The
  * plumbing — batch shaping, truncation accounting, retry loop, result
  * schema — is the real surface; an HTTP client drops into
  * `LlmClient.complete` and nothing else changes. Partition-level calls
  * keep the driver out of the data path (no collect of row payloads),
  * which is what makes the boundary survive a 1000-executor fan-out —
  * rate limiting then belongs in the client, exactly where a quota-aware
  * SDK implements it.
  */
object LlmBoundary {

  /** Reference context budget: 120,000 chars
    * (investigation_agent.py:239). */
  val MaxPromptChars = 120000

  case class LlmRequest(request_id: Long, prompt: String)

  case class LlmResponse(
      request_id: Long,
      response: String,
      attempts: Int,        // client calls made for this row's batch
      prompt_chars: Int,    // chars actually sent
      truncated: Boolean)

  /** One batch in, one response per prompt out. Implementations must be
    * serializable (constructed on the driver, executed per partition) and
    * may throw retryable exceptions (quota, transient transport). */
  trait LlmClient extends Serializable {
    def complete(prompts: Seq[String]): Seq[String]
  }

  /** ==== STUB ==== deterministic "model": echoes a JSON hypothesis block
    * derived from the prompt hash, in the shape the reference's agent
    * parses (```json {hypothesis, confidence} ```). */
  class StubClient extends LlmClient {
    def complete(prompts: Seq[String]): Seq[String] = prompts.map { p =>
      val h = graft.functions.RollingHash.hash(p)
      val conf = (math.abs(h) % 100) / 100.0
      s"""Analysis follows.
         |```json
         |{"hypothesis": "stub-${math.abs(h) % 1000}", "confidence": $conf}
         |```""".stripMargin
    }
  }

  /** A stub that fails the first `failures` calls per executor with a
    * retryable error — exercises the backoff path in tests. */
  class FlakyStubClient(failures: Int) extends StubClient {
    override def complete(prompts: Seq[String]): Seq[String] = {
      val n = FlakyStubClient.calls.incrementAndGet()
      if (n <= failures)
        throw new RuntimeException(s"429 quota exceeded (call $n)")
      super.complete(prompts)
    }
  }
  object FlakyStubClient {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  }

  /** ==== REAL (config-gated) ==== generic JSON-over-HTTP client: POSTs
    * `{"prompts": [...]}` to `endpoint` and expects
    * `{"responses": [...]}` back, one response per prompt, positional.
    * Pure JDK (HttpURLConnection) — no SDK dependency, no egress unless
    * an operator explicitly configures an endpoint. Non-2xx statuses and
    * transport errors throw, which is exactly what `infer`'s
    * exponential-backoff loop treats as retryable; provider-specific
    * adapters (auth headers, body shape) subclass and override
    * `encode`/`decode`. Serializable by construction: only the endpoint
    * string and header map ship to executors; connections are opened
    * per-call on the executor, never on the driver. */
  class HttpLlmClient(endpoint: String,
      headers: Map[String, String] = Map.empty,
      connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 120000) extends LlmClient {

    protected def encode(prompts: Seq[String]): String =
      prompts.map(JsonMini.quote).mkString("{\"prompts\": [", ", ", "]}")

    protected def decode(body: String, expected: Int): Seq[String] = {
      val got = JsonMini.stringArrayField(body, "responses").getOrElse(
        throw new RuntimeException(
          s"LLM endpoint returned no responses array: ${body.take(200)}"))
      require(got.length == expected,
        s"LLM endpoint returned ${got.length} responses for $expected prompts")
      got
    }

    def complete(prompts: Seq[String]): Seq[String] = {
      val conn = java.net.URI.create(endpoint).toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json")
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        conn.setDoOutput(true)
        val payload = encode(prompts).getBytes("UTF-8")
        conn.setFixedLengthStreamingMode(payload.length)
        val os = conn.getOutputStream
        try { os.write(payload); os.flush() } finally os.close()
        val status = conn.getResponseCode
        if (status < 200 || status >= 300)
          throw new RuntimeException(s"LLM endpoint returned HTTP $status")
        val in = conn.getInputStream
        val body =
          try new String(in.readAllBytes(), "UTF-8") finally in.close()
        decode(body, prompts.length)
      } finally conn.disconnect()
    }
  }

  /** The deployment switch: an HTTP client when `GRAFT_LLM_ENDPOINT` is
    * configured (plus optional `GRAFT_LLM_AUTH_HEADER` of the form
    * `Name: value`), the deterministic offline stub otherwise — so the
    * default build never touches the network and the RCA loop's data
    * side stays reproducible in CI. */
  def clientFromEnv(env: Map[String, String] = sys.env): LlmClient =
    env.get("GRAFT_LLM_ENDPOINT") match {
      case Some(url) if url.nonEmpty =>
        val headers = env.get("GRAFT_LLM_AUTH_HEADER")
          .flatMap { h =>
            h.split(":", 2) match {
              case Array(k, v) => Some(k.trim -> v.trim)
              case _ => None
            }
          }.toMap
        new HttpLlmClient(url, headers)
      case _ => new StubClient
    }

  /** Minimal JSON helpers for the generic HTTP contract — a full parser
    * dependency is not warranted for one string-array field. The scanner
    * honors JSON string escaping (quotes, backslashes, \\uXXXX), which
    * is the part naive regex splitting gets wrong. */
  private[graft] object JsonMini {
    def quote(s: String): String = {
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"').toString
    }

    /** Extract `"field": [ "...", ... ]` from a JSON object body. */
    def stringArrayField(body: String, field: String): Option[Seq[String]] = {
      val key = "\"" + field + "\""
      var i = body.indexOf(key)
      if (i < 0) return None
      i = body.indexOf('[', i + key.length)
      if (i < 0) return None
      i += 1
      val out = Seq.newBuilder[String]
      var done = false
      while (!done) {
        while (i < body.length && (body(i).isWhitespace || body(i) == ','))
          i += 1
        if (i >= body.length) return None
        if (body(i) == ']') done = true
        else if (body(i) == '"') {
          val sb = new StringBuilder
          i += 1
          var closed = false
          while (!closed) {
            if (i >= body.length) return None
            body(i) match {
              case '"' => closed = true; i += 1
              case '\\' =>
                if (i + 1 >= body.length) return None
                body(i + 1) match {
                  case '"' => sb.append('"'); i += 2
                  case '\\' => sb.append('\\'); i += 2
                  case '/' => sb.append('/'); i += 2
                  case 'n' => sb.append('\n'); i += 2
                  case 'r' => sb.append('\r'); i += 2
                  case 't' => sb.append('\t'); i += 2
                  case 'b' => sb.append('\b'); i += 2
                  case 'f' => sb.append('\f'); i += 2
                  case 'u' =>
                    if (i + 6 > body.length) return None
                    sb.append(Integer.parseInt(
                      body.substring(i + 2, i + 6), 16).toChar)
                    i += 6
                  case _ => return None
                }
              case c => sb.append(c); i += 1
            }
          }
          out += sb.toString
        } else return None // non-string element: not our contract
      }
      Some(out.result())
    }
  }

  /** Batched partition-local inference with exponential backoff.
    *
    * Mirrors the reference's retry loop (base delay doubling per attempt,
    * bounded attempts, investigation_agent.py:810-860) and its context
    * cap (prompts over `maxPromptChars` are truncated and flagged).
    * `batchSize` bounds request payloads; the iterator never materializes
    * the partition. */
  def infer(ds: Dataset[LlmRequest], client: LlmClient,
      batchSize: Int = 8, maxAttempts: Int = 5, baseBackoffMs: Long = 1000,
      maxPromptChars: Int = MaxPromptChars): Dataset[LlmResponse] = {
    import ds.sparkSession.implicits._
    require(batchSize >= 1 && maxAttempts >= 1)
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val prompts = batch.map(r =>
          if (r.prompt.length > maxPromptChars)
            r.prompt.substring(0, maxPromptChars)
          else r.prompt)
        var attempt = 0
        var out: Seq[String] = null
        while (out == null) {
          attempt += 1
          try {
            val got = client.complete(prompts)
            // a short batch would silently drop/misattribute rows below
            require(got.length == prompts.length,
              s"client returned ${got.length} responses for ${prompts.length} prompts")
            out = got
          }
          catch {
            case e: Exception if attempt < maxAttempts =>
              Thread.sleep(baseBackoffMs * (1L << (attempt - 1)))
            case e: Exception =>
              throw new RuntimeException(
                s"LLM call failed after $attempt attempts", e)
          }
        }
        batch.lazyZip(out).map { (r, resp) =>
          LlmResponse(r.request_id, resp, attempt,
            math.min(r.prompt.length, maxPromptChars),
            r.prompt.length > maxPromptChars)
        }
      }
    }
  }

  /** JSON-block extraction (investigation_agent.py:820-829): the first
    * fenced ```json block, else the first-`{`-to-last-`}` span (the
    * reference's exact fallback rule — greedy on purpose, so nested
    * braces survive) — as a column expression, so parsing model output
    * stays relational. */
  def jsonBlock(response: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(
      nullif(regexp_extract(response, "(?s)```json\\s*(\\{.*?\\})\\s*```", 1), lit("")),
      nullif(regexp_extract(response, "(?s)(\\{.*\\})", 1), lit("")))

  /** Parse extracted hypothesis JSON into (hypothesis, confidence,
    * reasoning) — reasoning is null when the response omits it, matching
    * the reference's `analysis.get("reasoning", "")` default
    * (investigation_agent.py:862). */
  def hypothesis(df: DataFrame, responseCol: String = "response"): DataFrame =
    df.withColumn("__json", jsonBlock(col(responseCol)))
      .withColumn("hypothesis",
        get_json_object(col("__json"), "$.hypothesis"))
      .withColumn("confidence",
        get_json_object(col("__json"), "$.confidence").cast("double"))
      .withColumn("reasoning",
        get_json_object(col("__json"), "$.reasoning"))
      .drop("__json")
}
