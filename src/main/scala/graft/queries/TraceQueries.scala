package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.trace._
import QueryDef._

/** Driver-visible surface of the FDB trace-log engine (SURVEY.md §2.1,
  * §2.4-§2.6, §2.10): these queries run the real ingest → derive → detect
  * pipeline over the reference's own fixture logs (FIXTURES.md §1-2),
  * which ship read-only with the repo. The sfDir argument is ignored —
  * the fixtures ARE the input. Where DuckDB can express the same parse
  * (read_json / regexp over raw lines) the query carries a full value
  * oracle; the rest emit summary rows the driver checks rows-only.
  */
object TraceQueries {

  val XmlFixture =
    "/root/reference/data/log_example/simlogs/trace.172.17.0.3.4500.1763869069.8tVoRN.0.1.xml"
  val JsonFixture = "/root/reference/data/sample_log.json"

  private def xmlEvents(s: SparkSession): DataFrame =
    TraceEvents.load(s, XmlFixture, stableIds = true)
  private def jsonEvents(s: SparkSession): DataFrame =
    TraceEvents.load(s, JsonFixture, stableIds = true)

  /** The 5-detector battery as one summary frame (detector, detected,
    * count, first_ts, last_ts). The three stateless predicate detectors
    * share ONE conditional-aggregation scan (Detectors.predicateSummaries);
    * the two stateful ones (baseline z-scores, recovery loop windows) keep
    * their own subtrees. Ordered by detector name so output is total. */
  private def batterySummaries(ev: DataFrame): DataFrame = {
    val metrics = DerivedTables.eventMetrics(ev)
    val baselines = DerivedTables.metricBaselines(metrics, minCount = 3)
    val stateful = Seq(
      "storage_pressure" ->
        Detectors.storagePressureAnomalies(ev, baselines),
      "recovery_loop" -> Detectors.recoveryLoops(ev),
      "metric_anomalies" -> Detectors.metricAnomalies(ev))
      .map { case (name, d) =>
        Detectors.summary(d).withColumn("detector", lit(name))
          .select("detector", "detected", "count", "first_ts", "last_ts")
      }.reduce(_ unionAll _)
    val fused = Detectors.predicateSummaries(ev, Seq(
      "ratekeeper_throttling" -> Detectors.ratekeeperThrottlingPred,
      "missing_tlogs" -> Detectors.missingTlogsPred,
      "coordination_loss" -> Detectors.coordinationLossPred))
    stateful.unionAll(fused).orderBy("detector")
  }

  val all: Seq[QueryDef] = Seq(

    // ---- S2 ingest + A1 severity report, full oracle ---------------------
    sql("trace_severity_counts",
      s"""SELECT CAST(Severity AS INTEGER) AS severity, COUNT(*) AS n
        |FROM read_json('$JsonFixture', format='newline_delimited',
        |  columns={'Severity':'VARCHAR'})
        |GROUP BY 1 ORDER BY severity DESC""") { (s, _) =>
      GlobalScanner.severityCounts(jsonEvents(s))
    },

    // ---- S1 XML ingest + A2 histogram, full oracle -----------------------
    sql("trace_xml_histogram",
      s"""SELECT regexp_extract(line, 'Type="([^"]*)"', 1) AS event,
        |  COUNT(*) AS n
        |FROM read_csv('$XmlFixture', header=false,
        |  columns={'line':'VARCHAR'}, delim='', quote='')
        |WHERE line LIKE '%<Event %'
        |GROUP BY 1 ORDER BY n DESC, event LIMIT 10""") { (s, _) =>
      GlobalScanner.eventHistogram(xmlEvents(s), 10)
        .orderBy(col("n").desc, col("event"))
    },

    // ---- A3 time span over parsed DateTime, full oracle ------------------
    sql("trace_time_span",
      s"""SELECT COUNT(*) AS n_events,
        |  CAST(date_part('epoch', MIN(strptime(DateTime, '%Y-%m-%dT%H:%M:%SZ'))) AS BIGINT) AS first_sec,
        |  CAST(date_part('epoch', MAX(strptime(DateTime, '%Y-%m-%dT%H:%M:%SZ'))) AS BIGINT) AS last_sec
        |FROM read_json('$JsonFixture', format='newline_delimited',
        |  columns={'DateTime':'VARCHAR'})""") { (s, _) =>
      jsonEvents(s).agg(
        count(lit(1)).as("n_events"),
        unix_timestamp(min(col("ts"))).as("first_sec"),
        unix_timestamp(max(col("ts"))).as("last_sec"))
    },

    // ---- W9 recovery states from the XML stream, full oracle -------------
    sql("trace_recovery_states",
      s"""SELECT CAST(regexp_extract(line, 'StatusCode="([0-9]+)"', 1) AS INTEGER) AS state_code,
        |  COUNT(*) AS n
        |FROM read_csv('$XmlFixture', header=false,
        |  columns={'line':'VARCHAR'}, delim='', quote='')
        |WHERE line LIKE '%<Event %' AND line LIKE '%Type="MasterRecoveryState"%'
        |GROUP BY 1 ORDER BY 1""") { (s, _) =>
      RecoveryDetector.recoveries(xmlEvents(s))
        .groupBy("state_code").agg(count(lit(1)).as("n"))
        .orderBy("state_code")
    },

    // ---- rows-only summaries of the full pipeline ------------------------
    noOracle("trace_rollback_status") { (s, _) =>
      GlobalScanner.rollbackStatus(jsonEvents(s))
    },

    noOracle("trace_recovery_causes") { (s, _) =>
      val ev = xmlEvents(s)
      RecoveryDetector.withCauses(ev, RecoveryDetector.recoveries(ev))
        .select("recovery_id", "state_code", "state_name", "cause")
    },

    noOracle("trace_events_wide_coverage") { (s, _) =>
      val wide = DerivedTables.eventsWide(jsonEvents(s))
      wide.agg(
        count(lit(1)).as("n_events"),
        count(col("grv_latency_ms")).as("n_grv"),
        count(col("txn_volume")).as("n_txn"),
        count(col("queue_bytes")).as("n_queue"),
        count(col("durability_lag_s")).as("n_durability"),
        count(col("disk_queue_bytes")).as("n_disk"),
        count(col("kv_ops")).as("n_kv"))
    },

    noOracle("trace_metric_baselines") { (s, _) =>
      DerivedTables.metricBaselines(
        DerivedTables.eventMetrics(jsonEvents(s)), minCount = 5)
        .drop("updated_at")
        .orderBy(col("count").desc, col("metric_name"), col("role"))
    },

    noOracle("trace_rollups_60s") { (s, _) =>
      DerivedTables.rollups(DerivedTables.eventMetrics(xmlEvents(s)), 60)
        .orderBy("window_start", "role", "metric_name")
    },

    noOracle("trace_anomaly_gate") { (s, _) =>
      val ev = xmlEvents(s)
      AnomalyGate.stats(ev, AnomalyGate.anomalies(ev))
    },

    noOracle("trace_chunks") { (s, _) =>
      Chunker.chunkByMarker(xmlEvents(s))
        .select("chunk_id", "start_event_id", "end_event_id", "n_events",
          "chunk_type")
    },

    noOracle("trace_timeline") { (s, _) =>
      TimelineBuilder.build(xmlEvents(s))
    },

    noOracle("trace_detector_battery") { (s, _) =>
      batterySummaries(xmlEvents(s).cache())
    },

    // ---- §2.10.5 detector #8: per-event z-score gate over the recency
    // window, summarized the way detectors.py:380-394 reports it ----------
    noOracle("trace_metric_anomalies") { (s, _) =>
      Detectors.metricAnomalySummary(xmlEvents(s))
        .withColumn("sample", to_json(col("sample")))
    },

    // ---- §2.10.8 agentic RCA, stubbed at the model call ------------------
    // Phase A evidence (detector battery) → prompt → partition-batched
    // inference (graft.ops.LlmBoundary, deterministic stub client) →
    // JSON-block hypothesis extraction. The reference's loop shape with
    // the network boundary swapped for the stub.
    noOracle("trace_rca_stub") { (s, _) =>
      import s.implicits._
      import graft.ops.LlmBoundary
      val battery = batterySummaries(xmlEvents(s).cache())
      val prompt = battery
        .agg(concat(
          lit("Diagnose the FDB failure. Detector evidence:\n"),
          array_join(array_sort(collect_list(to_json(struct(
            col("detector"), col("detected"), col("count"))))), "\n"))
          .as("prompt"))
        .select(lit(1L).as("request_id"), col("prompt"))
        .as[LlmBoundary.LlmRequest]
      LlmBoundary.hypothesis(
        LlmBoundary.infer(prompt, new LlmBoundary.StubClient).toDF())
        .select("request_id", "hypothesis", "confidence", "attempts",
          "prompt_chars")
    },

    // ---- RAG retrieval, data side (chunk → embed → top-k) ----------------
    // The reference's Vertex retrieve (rag_client.py:74-107) re-expressed
    // as an in-engine index: marker chunks embedded (stub hash encoder)
    // and probed by cosine top-k. Deterministic, rows-only checked.
    noOracle("trace_rag_retrieve") { (s, _) =>
      import graft.ops.Rag
      graft.functions.GraftFunctions.register(s)
      val idx = Rag.index(Chunker.chunkByMarker(xmlEvents(s)))
      val questions = s.createDataFrame(Seq(
        (1L, "storage server durability lag spike"),
        (2L, "master recovery state transition"))).toDF("query_id", "query_text")
      Rag.retrieve(idx, questions, k = 3)
        .select("query_id", "rank", "chunk_id", "cosine")
        .orderBy("query_id", "rank")
    }
  )
}
