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

  /** Lookback-window join as an EQUI-join: a [T-L, T] window spans at
    * most the two adjacent L-sized time buckets floor(T/L)-1 and
    * floor(T/L), so each recovery explodes to its 2 covering buckets and
    * events join on bucket equality before the exact range refine. A
    * plain theta range join here plans as BroadcastNestedLoopJoin —
    * |events| × |recoveries| comparisons, quadratic as both grow (26× at
    * 10× volume, measured); the bucketed form shuffles (or broadcasts)
    * on the bucket key and only compares co-bucketed rows. Callers
    * pre-filter the event side, so the joined volume is the candidates,
    * not the corpus. */
  private[graft] def lookbackJoin(candidates: DataFrame, recov: DataFrame,
      lookBackSeconds: Double): DataFrame = {
    val lMicros = math.max(1L, math.round(lookBackSeconds * 1e6))
    val ev = candidates
      .withColumn("c_bkt", floor(unix_micros(col("c_ts")) / lMicros))
    val rv = recov
      .withColumn("r_bkt", floor(unix_micros(col("recovery_ts")) / lMicros))
      .withColumn("c_bkt", explode(array(col("r_bkt") - 1, col("r_bkt"))))
      .drop("r_bkt")
    ev.join(rv, Seq("c_bkt"))
      .filter(unix_micros(col("c_ts")) >=
          unix_micros(col("recovery_ts")) - lMicros &&
        (col("c_ts") < col("recovery_ts") ||
          (col("c_ts") === col("recovery_ts") &&
            col("c_id") < col("recovery_id"))))
      .drop("c_bkt")
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
    // candidate classing depends only on event columns — computed and
    // filtered BEFORE the join, so only cause-shaped events reach it
    val classed = events
      .select(col("ts").as("c_ts"), col("event_id").as("c_id"),
        col("event").as("c_event"), col("severity").as("c_sev"),
        f("Comment").as("c_comment"))
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
      .select("c_ts", "c_id", "clazz", "cause")
    val w = Window.partitionBy("recovery_id")
      .orderBy(col("clazz").asc, col("c_ts").desc, col("c_id").desc)
    val best = lookbackJoin(classed, recov, lookBackSeconds)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("recovery_id").as("rid"), col("cause"))
    recov.join(best, col("recovery_id") === col("rid"), "left").drop("rid")
      .orderBy("recovery_ts", "recovery_id")
  }

  /** Related events per recovery: lookback-window events that are severe
    * (≥30) or failure-flavored (recovery_detector.py:209-242). */
  def relatedEvents(events: DataFrame, recov: DataFrame,
      lookBackSeconds: Double = 5.0): DataFrame = {
    // the relatedness predicate reads only event columns — filter first
    val related = events
      .select(col("ts").as("c_ts"), col("event_id").as("c_id"),
        col("event").as("c_event"), col("severity").as("c_sev"))
      .filter((col("c_sev").isNotNull && col("c_sev") >= 30) ||
        (col("c_event").isNotNull &&
          (lower(col("c_event")).contains("fail") ||
            lower(col("c_event")).contains("error") ||
            lower(col("c_event")).contains("terminated") ||
            lower(col("c_event")).contains("codecoverage"))))
    lookbackJoin(related, recov, lookBackSeconds)
      .select("recovery_id", "recovery_ts", "c_id", "c_ts", "c_event", "c_sev")
      .orderBy("recovery_id", "c_ts", "c_id")
  }
}
