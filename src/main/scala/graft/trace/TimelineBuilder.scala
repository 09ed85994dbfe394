package graft.trace

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PyNum

/** Chronological timeline narrative
  * (tools/investigation_tools/timeline_builder.py:18-165): earliest severe
  * event, VersionLag 100k/1M crossings, first recovery activity, and the
  * storage-pressure-precedes-recovery causal hint. Every "first X" is a
  * filtered min-aggregation — no ordered driver scan.
  */
object TimelineBuilder {

  private val LagKeys = Seq("VersionLag", "versionLag", "VersionLagValue",
    "Lag", "lag")

  /** The first present key of LagKeys parsed as float (the reference
    * breaks after the first key found: timeline_builder.py:58-66). */
  private def lagValue: Column =
    PyNum.py_float(coalesce(LagKeys.map(k => element_at(col("fields"), k)): _*))

  /** Single-row timeline summary with relative offsets from the stream
    * start. Offsets are "+X.Xs" strings like the reference renders. */
  def build(events: DataFrame): DataFrame = {
    val e = events.filter(col("ts").isNotNull)
    val start = e.agg(min(col("ts")).as("start_ts"))

    val firstSevere = e.filter(coalesce(col("severity"), lit(0)) >= 30)
      .agg(min(col("ts")).as("first_severe_ts"))
    val lags = e.withColumn("lag_v", lagValue)
      .filter(col("lag_v").isNotNull)
    val lag100k = lags.filter(col("lag_v") > 100000)
      .agg(min(col("ts")).as("first_lag_100k_ts"))
    val lag1m = lags.filter(col("lag_v") > 1000000)
      .agg(min(col("ts")).as("first_lag_1m_ts"))
    val firstRecovery = e.filter(col("event").contains("Recovery"))
      .agg(min(col("ts")).as("first_recovery_ts"))

    def rel(c: Column): Column =
      // format_string, not format_number: no thousands separators — the
      // reference renders f"+{x:.1f}s" (timeline_builder.py:46-48)
      when(c.isNotNull, format_string("+%.1fs",
        (unix_timestamp(c) - unix_timestamp(col("start_ts"))).cast("double")))

    start
      .crossJoin(firstSevere).crossJoin(lag100k).crossJoin(lag1m)
      .crossJoin(firstRecovery)
      .withColumn("root_cause_signal",
        when(col("first_lag_100k_ts").isNotNull &&
          col("first_recovery_ts").isNotNull &&
          col("first_lag_100k_ts") <= col("first_recovery_ts"),
          "storage_pressure_precedes_recovery")
          .when(col("first_recovery_ts").isNotNull,
            "recovery_precedes_storage_pressure"))
      .withColumn("first_severe_rel", rel(col("first_severe_ts")))
      .withColumn("first_lag_100k_rel", rel(col("first_lag_100k_ts")))
      .withColumn("first_lag_1m_rel", rel(col("first_lag_1m_ts")))
      .withColumn("first_recovery_rel", rel(col("first_recovery_ts")))
  }
}
