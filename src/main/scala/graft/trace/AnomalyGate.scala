package graft.trace

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PyNum

/** Per-event z-score anomaly gate (tools/anomaly_detector.py:30-229):
  * filter to "interesting" metric events (falling back to all events when
  * none match), compute per-metric mean/stdev over positive payload values
  * (≥3 samples), then flag events whose values exceed z thresholds or
  * static latency/queue limits. Returns one row per flagged event with its
  * sorted reasons array.
  */
object AnomalyGate {

  val InterestingEvents: Seq[String] = Seq(
    "StorageMetrics", "DiskMetrics", "GRVProxyMetrics",
    "UpdateLatencyMetrics", "ReadLatencyMetrics",
    "CommitLatencyMetrics", "GetValueMetrics")

  /** Static operational thresholds (anomaly_detector.py:191-196). */
  val Thresholds: Map[String, Double] =
    Map("Max" -> 1.0, "P99" -> 0.5, "P95" -> 0.3, "QueryQueue" -> 100.0)

  /** event_id → reasons for all anomalous events.
    * zThreshold=1.5 flags ~13% of a normal distribution. */
  def anomalies(events: DataFrame, zThreshold: Double = 1.5): DataFrame = {
    // fallback: if no interesting events exist, gate over all events
    // (anomaly_detector.py:90). The reference probes cardinality driver-
    // side; here the flag rides IN-PLAN as a broadcast 1-row aggregate —
    // the former `interesting0.isEmpty` was a hidden eager action that
    // executed the whole upstream subtree (e.g. the top-500 recency sort)
    // once at frame-CONSTRUCTION time and again at the real action, in
    // every battery/RCA query.
    val isInteresting = col("event").isin(InterestingEvents.map(lit): _*)
    val hasInteresting = events
      .agg((count(when(isInteresting, 1)) > 0).as("__has"))
    val interesting = events
      .crossJoin(broadcast(hasInteresting))
      .filter(!col("__has") || isInteresting)
      .drop("__has")

    val vals = interesting
      .select(col("event_id"), col("ts"), col("event"), col("severity"),
        col("role"), explode(col("fields")).as(Seq("metric", "raw")))
      .withColumn("v", PyNum.parse_numeric(col("raw")))
      .filter(col("v").isNotNull && col("v") > 0)

    val stats = vals.groupBy("metric")
      .agg(avg(col("v")).as("mean"), stddev_samp(col("v")).as("stdev"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 3 && col("stdev").isNotNull)

    val thresholdExpr = Thresholds.foldLeft(lit(false)) {
      case (acc, (m, t)) => acc || (col("metric") === m && col("v") > t)
    }

    vals
      .join(broadcast(stats), Seq("metric"), "left")
      .withColumn("z",
        when(col("stdev").isNotNull && col("stdev") =!= 0.0,
          abs((col("v") - col("mean")) / col("stdev"))))
      .withColumn("reasons", array_compact(array(
        when(col("z") > zThreshold,
          concat(lit("z_score_anomaly_"), col("metric"))),
        when(col("z") > 3.0, concat(lit("extreme_value_"), col("metric"))),
        when(thresholdExpr, concat(lit("threshold_violation_"), col("metric"))))))
      .filter(size(col("reasons")) > 0)
      .groupBy("event_id")
      .agg(
        first(col("ts")).as("ts"), first(col("event")).as("event"),
        first(col("severity")).as("severity"), first(col("role")).as("role"),
        sort_array(flatten(collect_list(col("reasons")))).as("reasons"))
      .orderBy("event_id")
  }

  /** Filter-rate / token-savings accounting
    * (anomaly_detector.py:200-229). */
  def stats(events: DataFrame, flagged: DataFrame,
      avgTokensPerEvent: Int = 200): DataFrame = {
    val total = events.agg(count(lit(1)).as("total_events"))
    val anom = flagged.agg(count(lit(1)).as("anomalies_detected"))
    total.crossJoin(anom)
      .withColumn("filtered_events",
        col("total_events") - col("anomalies_detected"))
      .withColumn("filter_rate",
        when(col("total_events") > 0,
          col("filtered_events").cast("double") / col("total_events"))
          .otherwise(0.0))
      .withColumn("total_tokens_without_filter",
        col("total_events") * avgTokensPerEvent)
      .withColumn("total_tokens_with_filter",
        col("anomalies_detected") * avgTokensPerEvent)
      .withColumn("tokens_saved",
        col("total_tokens_without_filter") - col("total_tokens_with_filter"))
      .withColumn("token_reduction_rate",
        when(col("total_tokens_without_filter") > 0,
          col("tokens_saved").cast("double") /
            col("total_tokens_without_filter")).otherwise(0.0))
  }
}
