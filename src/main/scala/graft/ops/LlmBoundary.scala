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
