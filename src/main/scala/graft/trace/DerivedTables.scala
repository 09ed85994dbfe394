package graft.trace

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PyNum

/** Derived tables of the trace store (SURVEY.md §1.2/§2.4/§2.5).
  * Each is a pure DataFrame → DataFrame function, recompute-and-overwrite
  * in place of the reference's row-at-a-time upserts — at scale each is one
  * distributed pass over `events`, no driver loops.
  */
object DerivedTables {

  private def f(k: String): Column = element_at(col("fields"), k)

  /** `event_metrics` EAV: explode the payload bag, keep float()-castable
    * values (tools/storage.py:128-139 — python float semantics: inf/nan
    * strings ARE numeric). No join needed downstream: derived in the same
    * pass as events. */
  def eventMetrics(events: DataFrame): DataFrame =
    events
      .select(col("event_id"), col("event"), col("role"), col("ts"),
        explode(col("fields")).as(Seq("metric_name", "raw_value")))
      .withColumn("metric_value", PyNum.py_float(col("raw_value")))
      .filter(col("metric_value").isNotNull)
      .drop("raw_value")

  /** `events_wide` curated coalescing projection (tools/storage.py:141-268).
    * Precedence chains and the Mean-falsiness quirk (Mean parses to 0.0 →
    * NULL grv latency, storage.py:183) reproduced exactly. */
  def eventsWide(events: DataFrame): DataFrame = {
    val sf: Column => Column = PyNum.safe_float
    def has(k: String): Column = map_contains_key(col("fields"), k)
    def chain(keys: String*): Column =
      keys.foldRight(lit(null).cast("double")) { (k, rest) =>
        when(has(k), sf(f(k))).otherwise(rest)
      }

    val meanSf = sf(f("Mean"))
    val grv = when(has("Mean") && has("P95"),
        // `x * 1000.0 if safe_float(Mean) else None` — 0.0 and None both
        // collapse to NULL (Python falsiness); NaN is truthy and carries.
        when(meanSf.isNull || meanSf === 0.0, lit(null).cast("double"))
          .otherwise(meanSf * 1000.0))
      .otherwise(chain("GRVLatency", "grvLatency"))

    val durability = when(has("DurableLag"), sf(f("DurableLag")))
      .when(has("DurabilityLag"), sf(f("DurabilityLag")))
      .when(has("WorstStorageServerDurabilityLag"),
        sf(f("WorstStorageServerDurabilityLag")))
      .when(has("DurableVersion") && has("Version"),
        (sf(f("Version")) - sf(f("DurableVersion"))) / 1e5)
      .otherwise(lit(null).cast("double"))

    events.select(
      col("event_id"),
      grv.as("grv_latency_ms"),
      chain("Committed", "Mutations", "TxnCommitIn", "TxnRequestIn")
        .as("txn_volume"),
      chain("BytesInput", "QueueSize", "WorstStorageServerQueue",
        "WorstTLogQueue").as("queue_bytes"),
      durability.as("durability_lag_s"),
      sf(f("InFlightBytes")).as("data_move_in_flight"),
      sf(f("DiskQueue")).as("disk_queue_bytes"),
      sf(f("Ops")).as("kv_ops"))
  }

  /** Process key (tools/storage.py:277-289): Address, with a
    * fields_json["Machine"] fallback that is PROVABLY DEAD in the
    * reference too — Machine is in MANDATORY_FIELDS
    * (event_dto.py:10-14), so it never reaches fields_json; the
    * reference's processes table is keyed on Address alone, and this
    * port preserves exactly that (the fallback is kept verbatim so the
    * decision procedure matches line for line). nullif: the reference's
    * `if event.address:` is Python falsiness, so "" falls through like
    * a missing address. */
  private val processKey: Column =
    coalesce(nullif(col("address"), lit("")),
      nullif(f("Machine"), lit("")))

  /** `processes` registry: first/last seen per process key
    * (tools/storage.py:271-303) — upsert becomes a min/max aggregation. */
  def processes(events: DataFrame): DataFrame =
    events
      .withColumn("process_key", processKey)
      .filter(col("process_key").isNotNull && col("process_key") =!= "")
      .groupBy("process_key")
      .agg(
        min(col("ts")).as("first_seen_ts"),
        max(col("ts")).as("last_seen_ts"))
      .withColumn("address", col("process_key"))

  /** `process_roles`: first time each (process, role) is seen
    * (tools/storage.py:305-325 — insert-or-ignore ≡ min(ts)). */
  def processRoles(events: DataFrame): DataFrame =
    events
      .withColumn("process_key", processKey)
      .filter(col("process_key").isNotNull && col("process_key") =!= "" &&
        col("role").isNotNull && col("role") =!= "")
      .groupBy("process_key", "role")
      .agg(min(col("ts")).as("start_ts"))

  /** Metric names excluded from baselines — identifiers, not metrics
    * (tools/investigation_tools/global_scanner.py:118-122). */
  val ExcludedBaselineMetrics: Set[String] = Set(
    "ThreadID", "ID", "Machine", "Address", "ProcessID", "PID",
    "TraceFile", "TraceFileExtended", "SourceLine")

  /** `metric_baselines`: per (metric, role) mean/stddev/p95/min/max/count
    * over finite values, role NULL → 'ALL', HAVING count >= minCount,
    * top-N by count (global_scanner.py:57-172). One pass — the reference's
    * per-row p95 re-query is folded into the same aggregation. */
  /** Deterministic mean: exact DECIMAL(30,10) accumulation cast to double
    * — order-independent, so the same input produces bit-identical means
    * in any engine or partitioning (a plain double sum carries
    * order-dependent ulps). Groups containing huge sentinels (|v| ≥ 1e18)
    * fall back to AVG, where the result saturates identically anyway. */
  def exactMean(c: Column): Column =
    // the per-row guard matters: both branches of the outer `when` are
    // aggregated over every row, so an unguarded decimal cast would
    // overflow (ANSI) on the sentinel rows even in groups that take the
    // AVG branch. Divisor is count(c) — the null-skipping sum over the
    // non-null count, so nulls in the column can't deflate the mean
    // (matching avg()'s null semantics).
    when(max(abs(c)) < 1e18,
      sum(when(abs(c) < 1e18, c).cast("decimal(30,10)")).cast("double") /
        count(c))
      .otherwise(avg(c))

  /** p95 for the baseline/rollup aggregations. `approxK = 0` (the oracle
    * anchor) is Spark's exact `Percentile` — an UNBOUNDED-state aggregate
    * that buffers every distinct group value, correct at test scale but
    * an executor-OOM risk when a (metric, role) group holds billions of
    * distinct doubles. `approxK > 0` is the 100-TB mode: the
    * deterministic bottom-k sample percentile (PctSampleAgg — state
    * exactly 24·k bytes per group, DKW rank error ≤ √(ln(2/δ)/2k)),
    * keyed on the unique EAV row id so the sample is a uniform
    * engine-reproducible permutation. Same call sites, same schema. */
  private def p95Col(approxK: Int): Column =
    if (approxK <= 0) percentile(col("metric_value"), lit(0.95))
    else element_at(
      graft.functions.PctSampleAgg.pctSample(
        concat(col("event_id").cast("string"), lit(":"), col("metric_name")),
        col("metric_value"), Seq(0.95), approxK), 1)

  def metricBaselines(metrics: DataFrame, minCount: Int = 20,
      topN: Int = 500, perRole: Boolean = true, approxK: Int = 0): DataFrame = {
    val roleCol = if (perRole) coalesce(col("role"), lit("ALL")) else lit("ALL")
    metrics
      .filter(!isnan(col("metric_value")) &&
        !col("metric_value").isin(Double.PositiveInfinity, Double.NegativeInfinity) &&
        abs(col("metric_value")) < 1e308)
      .filter(!col("metric_name").isin(ExcludedBaselineMetrics.toSeq.map(lit): _*))
      .groupBy(col("metric_name"), roleCol.as("role"))
      .agg(
        exactMean(col("metric_value")).as("mean"),
        stddev_samp(col("metric_value")).as("stddev"),
        p95Col(approxK).as("p95"),
        min(col("metric_value")).as("min"),
        max(col("metric_value")).as("max"),
        count(lit(1)).as("count"))
      .filter(col("count") >= minCount)
      .orderBy(col("count").desc, col("metric_name"), col("role"))
      .limit(topN)
      .withColumn("updated_at", current_timestamp())
  }

  /** `rollups_{N}s`: tumbling-window aggregates per (window, role, metric)
    * (tools/storage.py:328-352). `approxK` as in [[metricBaselines]]. */
  def rollups(metrics: DataFrame, intervalSeconds: Int = 60,
      approxK: Int = 0): DataFrame =
    metrics
      .filter(col("ts").isNotNull)
      .groupBy(
        window(col("ts"), s"$intervalSeconds seconds").getField("start")
          .as("window_start"),
        col("role"), col("metric_name"))
      .agg(
        count(lit(1)).as("n"),
        exactMean(col("metric_value")).as("avg"),
        max(col("metric_value")).as("max"),
        p95Col(approxK).as("p95"))
}
