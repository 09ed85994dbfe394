package graft.trace

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.ScanOps

/** Cluster-wide scans: stats report, heatmaps, recovery episodes, rollback
  * analysis (tools/investigation_tools/global_scanner.py). Sequential
  * carried-state scans become distributed scans (graft.ops.ScanOps):
  * "previous non-null value" / episode numbering run as range-partitioned
  * windows with boundary carry — one parallel sort per query instead of a
  * driver loop or a single-partition window. */
object GlobalScanner {

  private def f(k: String): Column = element_at(col("fields"), k)

  /** Guarded integral cast: malformed payload values (torn rollover
    * lines) become null instead of aborting the query under Spark 4's
    * ANSI-default CAST. Length-bounded so an overlong digit string can't
    * overflow the cast either (18 digits < Long.MaxValue). */
  private def tryLong(c: Column): Column =
    when(c.rlike("^[+-]?\\d{1,18}$"), c.cast("long"))

  /** Epoch-floored bucket (FLOOR(EXTRACT(EPOCH ...)/N)*N). */
  def bucket(c: Column, seconds: Int): Column =
    (floor(unix_timestamp(c) / seconds) * seconds).cast("long")

  // ---- stats report (A1-A4) ----------------------------------------------

  def severityCounts(events: DataFrame): DataFrame =
    events.groupBy("severity").agg(count(lit(1)).as("n"))
      .orderBy(col("severity").desc)

  def eventHistogram(events: DataFrame, limit: Int = 50): DataFrame =
    events.groupBy("event").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event")).limit(limit)

  def timeSpan(events: DataFrame): DataFrame =
    events.agg(
      min(col("ts")).as("earliest"),
      max(col("ts")).as("latest"),
      (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
        .as("duration_seconds"))

  def topEvents(events: DataFrame, severityMin: Int = 40, limit: Int = 50): DataFrame =
    events.filter(col("severity") >= severityMin)
      .orderBy(col("severity").desc, col("ts").desc, col("event_id"))
      .limit(limit)

  /** Severity×time heatmap buckets ordered by worst severity
    * (global_scanner.py:232-252). */
  def bucketHeatmap(events: DataFrame, bucketSeconds: Int = 300,
      limit: Int = 100): DataFrame =
    events.filter(col("ts").isNotNull)
      .groupBy(bucket(col("ts"), bucketSeconds).as("bucket"))
      .agg(max(col("severity")).as("max_severity"), count(lit(1)).as("n"))
      .orderBy(col("max_severity").desc, col("bucket"))
      .limit(limit)

  // ---- recovery episodes (W5): gaps-and-islands sessionization -----------

  /** Cluster MasterRecoveryState events into episodes split where the gap
    * exceeds gapSeconds; per episode, the max severity of ALL events within
    * ±severityWindow seconds (global_scanner.py:177-219). The severity
    * lookup is a range join of the (few) episodes against events. */
  def recoveryEpisodes(events: DataFrame, gapSeconds: Int = 60,
      severityWindow: Int = 30): DataFrame = {
    val marked = ScanOps.lagK(
      events
        .filter(col("event") === "MasterRecoveryState" && col("ts").isNotNull)
        .select(col("ts"), col("event_id")),
      Seq("ts", "event_id"), "ts", "prev_ts")
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
      .withColumn("is_new", when(col("gap_s") > gapSeconds, 1).otherwise(0))
    val recov = ScanOps.runningSum(marked, Seq("ts", "event_id"),
      col("is_new"), "episode", inclusive = true)
    val episodes = recov.groupBy("episode")
      .agg(min(col("ts")).as("start"), max(col("ts")).as("end"))
      .withColumn("duration_seconds",
        unix_timestamp(col("end")) - unix_timestamp(col("start")))
    // severity lookup as an EQUI-join on fixed-width time buckets: each
    // episode explodes to the bucket range its ±window span covers
    // (sequence()), events carry one bucket, and the exact between()
    // refine runs only on co-bucketed rows. The plain range join planned
    // as BroadcastNestedLoopJoin — |episodes| × |events| comparisons,
    // the same quadratic shape the W9/W10 lookback joins had.
    val winMicros = severityWindow.toLong * 1000000L
    val wMicros = math.max(1L, 2L * severityWindow) * 1000000L
    val epB = episodes
      .withColumn("bkt", explode(sequence(
        floor((unix_micros(col("start")) - winMicros) / wMicros),
        floor((unix_micros(col("end")) + winMicros) / wMicros))))
    val evB = events
      .select(col("ts").as("ets"), col("severity"))
      .withColumn("bkt", floor(unix_micros(col("ets")) / wMicros))
    val sev = epB.join(evB, Seq("bkt"))
      .filter(col("ets").between(
        col("start") - expr(s"INTERVAL $severityWindow SECONDS"),
        col("end") + expr(s"INTERVAL $severityWindow SECONDS")))
      .groupBy("episode")
      .agg(max(col("severity")).as("max_severity_nearby"))
    episodes.join(sev, Seq("episode"), "left")
      .select(col("episode"), col("start"), col("end"),
        col("duration_seconds"), col("max_severity_nearby"))
      .orderBy("episode")
  }

  /** Episode COUNT alone — the gaps-and-islands cardinality (1 + #gaps >
    * gapSeconds, 0 on an empty recovery stream) without materializing the
    * episodes or their severity range join. The RCA loop's Phase A only
    * records this number; computing it this way drops the non-equi join
    * from the hot path entirely. */
  def recoveryEpisodeCount(events: DataFrame, gapSeconds: Int = 60): DataFrame =
    ScanOps.lagK(
      events
        .filter(col("event") === "MasterRecoveryState" && col("ts").isNotNull)
        .select(col("ts"), col("event_id")),
      Seq("ts", "event_id"), "ts", "prev_ts")
      .agg((when(count(lit(1)) === 0, 0L).otherwise(
        count(when(unix_timestamp(col("ts")) -
          unix_timestamp(col("prev_ts")) > gapSeconds, 1)) + 1L))
        .as("n_episodes"))

  // ---- rollback analysis (W1-W4): carried non-null previous value --------

  /** Version drops: current CommittedVersion/DurableVersion below the last
    * non-null one (global_scanner.py:273-323). Emits one row per drop with
    * the same fields the reference reports.
    *
    * The version sequence is cluster-wide, so the carry is over a global ts
    * order — ScanOps.prevNonNull keeps it distributed (range partitions +
    * boundary carry) instead of a single-partition window. */
  def versionDrops(events: DataFrame): DataFrame = {
    val versioned = ScanOps.prevNonNull(
      events
        .withColumn("cv", tryLong(f("CommittedVersion")))
        .withColumn("dv", tryLong(f("DurableVersion")))
        .filter(col("cv").isNotNull || col("dv").isNotNull)
        .select(col("ts"), col("event_id"), col("event"), col("cv"), col("dv")),
      Seq("ts", "event_id"), Seq("cv" -> "prev_cv", "dv" -> "prev_dv"))
    val cvDrops = versioned
      .filter(col("cv").isNotNull && col("prev_cv").isNotNull &&
        col("cv") < col("prev_cv"))
      .select(col("ts"), col("event_id"), col("event"),
        lit("CommittedVersionDrop").as("type"),
        (col("prev_cv") - col("cv")).as("drop_amount"),
        col("prev_cv").as("prev"), col("cv").as("now"))
    val dvDrops = versioned
      .filter(col("dv").isNotNull && col("prev_dv").isNotNull &&
        col("dv") < col("prev_dv"))
      .select(col("ts"), col("event_id"), col("event"),
        lit("DurableVersionDrop").as("type"),
        (col("prev_dv") - col("dv")).as("drop_amount"),
        col("prev_dv").as("prev"), col("dv").as("now"))
    cvDrops.unionAll(dvDrops).orderBy("ts", "event_id", "type")
  }

  /** Version resets: previous > 1M and current < 1M
    * (global_scanner.py:325-354). */
  def versionResets(events: DataFrame): DataFrame =
    ScanOps.prevNonNull(
      events
        .withColumn("cv", tryLong(f("CommittedVersion")))
        .filter(col("cv").isNotNull)
        .select(col("ts"), col("event_id"), col("event"), col("cv")),
      Seq("ts", "event_id"), Seq("cv" -> "prev_cv"))
      .filter(col("prev_cv") > 1000000L && col("cv") < 1000000L)
      .select(col("ts"), col("event_id"), col("event"),
        col("prev_cv").as("prev_version"), col("cv").as("new_version"))

  /** RecoveryVersion regressions on RecoveryState events
    * (global_scanner.py:356-385). */
  def recoveryResets(events: DataFrame): DataFrame =
    ScanOps.prevNonNull(
      events
        .filter(col("event") === "RecoveryState")
        .withColumn("rv", tryLong(f("RecoveryVersion")))
        .filter(col("rv").isNotNull)
        .select(col("ts"), col("event_id"), col("event"), col("rv")),
      Seq("ts", "event_id"), Seq("rv" -> "prev_rv"))
      .filter(col("prev_rv").isNotNull && col("rv") < col("prev_rv"))
      .select(col("ts"), col("event_id"), col("event"),
        col("prev_rv").as("prev_recovery_version"),
        col("rv").as("new_recovery_version"),
        (col("prev_rv") - col("rv")).as("drop_amount"))

  /** Rollback status aggregation (global_scanner.py:388-401).
    *
    * Fused: the three carried-state scans behind W1-W3 share one sorted
    * pass. `prevNonNull` ignores nulls, so computing prev_cv/prev_dv/
    * prev_rv over the union frame (any of the three fields present) yields
    * exactly the per-field carries of the individual scans — one range
    * exchange instead of three full scans of events. */
  def rollbackStatus(events: DataFrame): DataFrame = {
    val versioned = ScanOps.prevNonNull(
      events
        .withColumn("cv", tryLong(f("CommittedVersion")))
        .withColumn("dv", tryLong(f("DurableVersion")))
        .withColumn("rv", when(col("event") === "RecoveryState",
          tryLong(f("RecoveryVersion"))))
        .filter(col("cv").isNotNull || col("dv").isNotNull ||
          col("rv").isNotNull)
        .select(col("ts"), col("event_id"),
          col("cv"), col("dv"), col("rv")),
      Seq("ts", "event_id"),
      Seq("cv" -> "prev_cv", "dv" -> "prev_dv", "rv" -> "prev_rv"))
    val cvDrop = col("cv").isNotNull && col("prev_cv").isNotNull &&
      col("cv") < col("prev_cv")
    val dvDrop = col("dv").isNotNull && col("prev_dv").isNotNull &&
      col("dv") < col("prev_dv")
    val reset = col("cv").isNotNull &&
      col("prev_cv") > 1000000L && col("cv") < 1000000L
    val rvReset = col("rv").isNotNull && col("prev_rv").isNotNull &&
      col("rv") < col("prev_rv")
    versioned.agg(
      (count(when(cvDrop, 1)) + count(when(dvDrop, 1))).as("num_drops"),
      coalesce(greatest(
        max(when(cvDrop, col("prev_cv") - col("cv"))),
        max(when(dvDrop, col("prev_dv") - col("dv")))), lit(0L))
        .as("max_drop"),
      count(when(reset, 1)).as("num_resets"),
      count(when(rvReset, 1)).as("num_recovery_resets"))
      .withColumn("detected",
        col("num_drops") > 0 || col("num_resets") > 0 ||
          col("num_recovery_resets") > 0)
  }
}
