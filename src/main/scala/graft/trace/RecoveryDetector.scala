package graft.trace

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recovery detection with the 15-state FDB recovery state machine and
  * per-recovery cause lookback (tools/recovery_detector.py:40-242).
  *
  * The reference scans a sorted event list per recovery; here each recovery
  * is range-joined against the 5-second lookback window of events and the
  * best cause candidate picked by (precedence class, recency) row_number —
  * one shuffle on the (few) recoveries instead of O(n·m) driver loops.
  */
object RecoveryDetector {

  val RecoveryStates: Map[Int, String] = Map(
    0 -> "reading_coordinated_state", 1 -> "locking_coordinated_state",
    2 -> "recruiting_proxies", 3 -> "reading_transaction_system_state",
    4 -> "configuration_missing", 5 -> "configuration_never_created",
    6 -> "configuration_invalid", 7 -> "recruiting_transaction_servers",
    8 -> "initializing_transaction_servers", 9 -> "recovery_transaction",
    10 -> "writing_coordinated_state", 11 -> "accepting_commits",
    12 -> "all_logs_recruited", 13 -> "storage_recovered",
    14 -> "fully_recovered")

  val KnownCauses: Seq[String] = Seq(
    "Terminated due to tLog failure",
    "Terminated due to storage server failure",
    "Terminated due to commit proxy failure",
    "Terminated due to GRV proxy failure",
    "Terminated due to resolver failure",
    "Terminated due to master failure",
    "Terminated due to coordinator failure",
    "Configuration change", "Manual recovery", "Network partition",
    "Datacenter failure")

  private def f(k: String): Column = element_at(col("fields"), k)

  private val stateNameCol: Column = {
    val m = map(RecoveryStates.toSeq
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    coalesce(element_at(m, col("state_code")), lit("unknown"))
  }

  /** MasterRecoveryState events with numeric StatusCode → typed state. */
  def recoveries(events: DataFrame,
      includeCodeCoverage: Boolean = true): DataFrame = {
    val base =
      if (includeCodeCoverage) events
      else events.filter(col("event") =!= "CodeCoverage")
    base
      .filter(col("event") === "MasterRecoveryState")
      .withColumn("state_code",
        when(f("StatusCode").rlike("^[+-]?\\d+$"),
          f("StatusCode").cast("int")))
      .filter(col("state_code").isNotNull)
      .withColumn("state_name", stateNameCol)
      .select(col("event_id").as("recovery_id"), col("ts").as("recovery_ts"),
        col("state_code"), col("state_name"))
  }

  /** Cause per recovery: scan the lookBack window before it, preferring
    * (1) CodeCoverage comments matching a known cause, then (2) the most
    * recent failure-named or severity≥40 event
    * (recovery_detector.py:151-207). */
  def withCauses(events: DataFrame, recov: DataFrame,
      lookBackSeconds: Double = 5.0,
      includeCodeCoverage: Boolean = true): DataFrame = {
    val knownCause = KnownCauses
      .map(c => lower(col("c_comment")).contains(c.toLowerCase))
      .reduce(_ || _)
    val candidates = events
      .select(col("ts").as("c_ts"), col("event_id").as("c_id"),
        col("event").as("c_event"), col("severity").as("c_sev"),
        f("Comment").as("c_comment"))
      .join(recov, col("c_ts") >= col("recovery_ts") -
          expr(s"INTERVAL ${lookBackSeconds} SECONDS") &&
        (col("c_ts") < col("recovery_ts") ||
          (col("c_ts") === col("recovery_ts") &&
            col("c_id") < col("recovery_id"))))
      .withColumn("is_cc",
        lit(includeCodeCoverage) && col("c_event") === "CodeCoverage" &&
          col("c_comment").isNotNull && knownCause)
      .withColumn("is_fail_name",
        col("c_event").isNotNull &&
          (lower(col("c_event")).contains("fail") ||
            lower(col("c_event")).contains("error") ||
            lower(col("c_event")).contains("terminated")))
      .withColumn("is_high_sev",
        col("c_sev").isNotNull && col("c_sev") >= 40)
      .withColumn("clazz",
        when(col("is_cc"), 1)
          .when(col("is_fail_name") || col("is_high_sev"), 2))
      .filter(col("clazz").isNotNull)
      .withColumn("cause",
        when(col("is_cc"), col("c_comment"))
          .when(col("is_fail_name"),
            concat(lit("Detected failure event: "), col("c_event")))
          .otherwise(concat(lit("High severity event: "), col("c_event"),
            lit(" (severity "), col("c_sev"), lit(")"))))
    val w = Window.partitionBy("recovery_id")
      .orderBy(col("clazz").asc, col("c_ts").desc, col("c_id").desc)
    val best = candidates
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("recovery_id").as("rid"), col("cause"))
    recov.join(best, col("recovery_id") === col("rid"), "left").drop("rid")
      .orderBy("recovery_ts", "recovery_id")
  }

  /** Related events per recovery: lookback-window events that are severe
    * (≥30) or failure-flavored (recovery_detector.py:209-242). */
  def relatedEvents(events: DataFrame, recov: DataFrame,
      lookBackSeconds: Double = 5.0): DataFrame =
    events
      .select(col("ts").as("c_ts"), col("event_id").as("c_id"),
        col("event").as("c_event"), col("severity").as("c_sev"))
      .join(recov, col("c_ts") >= col("recovery_ts") -
          expr(s"INTERVAL ${lookBackSeconds} SECONDS") &&
        (col("c_ts") < col("recovery_ts") ||
          (col("c_ts") === col("recovery_ts") &&
            col("c_id") < col("recovery_id"))))
      .filter((col("c_sev").isNotNull && col("c_sev") >= 30) ||
        (col("c_event").isNotNull &&
          (lower(col("c_event")).contains("fail") ||
            lower(col("c_event")).contains("error") ||
            lower(col("c_event")).contains("terminated") ||
            lower(col("c_event")).contains("codecoverage"))))
      .select("recovery_id", "recovery_ts", "c_id", "c_ts", "c_event", "c_sev")
      .orderBy("recovery_id", "c_ts", "c_id")
}
