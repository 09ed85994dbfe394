package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel completion — the standard "how far does each user get
  * through signup → view → click → purchase" product-analytics operator,
  * built for the 100 TB shape: each step is ONE equi-join on the key
  * plus ONE map-side-combinable min aggregation (a conditional min over
  * the step's events strictly AFTER the previous step's time), so no
  * per-user event list is ever collected, no window sorts a whole
  * user's history in one task, and a bot key with millions of events
  * costs its events' aggregation, never a straggler materialization.
  * Timestamps ride as epoch MICROS (unix_micros — the engine-wide
  * cross-engine currency for the nanosecond events fixture).
  */
object Funnel {

  /** Per-key funnel times: t1 = earliest `steps(0)` event; tᵢ =
    * earliest `steps(i-1)` event STRICTLY after tᵢ₋₁ (null propagates —
    * a key that never reached step i-1 cannot reach step i). Returns
    * (keyCol, t1_us..tn_us, steps_completed); keys with no step-1
    * event do not appear. */
  def steps(events: DataFrame, stepTypes: Seq[String],
      keyCol: String = "user_id", typeCol: String = "event_type",
      tsCol: Column = col("ts")): DataFrame = {
    require(stepTypes.size >= 2, "a funnel needs at least two steps")
    val base = events
      .filter(col(keyCol).isNotNull)
      // the events fixture reads as TIMESTAMP_NTZ; the cast to ltz is
      // an identity on the underlying micros under the session's UTC
      .select(col(keyCol).as("__k"), col(typeCol).as("__t"),
        unix_micros(tsCol.cast("timestamp")).as("__us"))
    var acc = base.filter(col("__t") === stepTypes.head)
      .groupBy("__k").agg(min(col("__us")).as("t1_us"))
    for (i <- 2 to stepTypes.size) {
      val prior = (1 until i).map(j => s"t${j}_us")
      val stepEv = base.filter(col("__t") === stepTypes(i - 1))
        .select(col("__k"), col("__us"))
      acc = acc
        .join(stepEv, Seq("__k"), "left")
        .groupBy(col("__k") +: prior.map(col): _*)
        .agg(min(when(col("__us") > col(s"t${i - 1}_us"), col("__us")))
          .as(s"t${i}_us"))
    }
    // ascending fold so the HIGHEST completed step's check ends up
    // outermost in the nested conditional
    val stepsDone = (2 to stepTypes.size).foldLeft(lit(1)) {
      (acc2, i) => when(col(s"t${i}_us").isNotNull, lit(i)).otherwise(acc2)
    }
    acc.select(col("__k").as(keyCol) +:
      (1 to stepTypes.size).map(i => col(s"t${i}_us")) :+
      stepsDone.as("steps_completed"): _*)
  }

  /** Weekly cohort RETENTION matrix — the other half of the funnel
    * dashboard: users cohorted by the epoch-week of their first
    * `cohortType` event, and for each (cohort_week, week_offset ≥ 0)
    * the count of cohort members active (ANY event) that week.
    * Weeks are epoch-floor-divided (`us div week_us`), not calendar
    * weeks — deterministic in every engine, no week-start convention.
    * Scale shape: one groupBy for the cohorts, one distinct over
    * (key, week) — both map-side-combinable — then an equi-join on the
    * key and a two-phase count-distinct per matrix cell; the output is
    * |weeks|² rows no matter the corpus. Returns (cohort_week,
    * week_offset, n_active, n_cohort, retention). */
  def retention(events: DataFrame, cohortType: String = "signup",
      keyCol: String = "user_id", typeCol: String = "event_type",
      tsCol: Column = col("ts")): DataFrame = {
    val weekUs = 604800000000L
    val base = events
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"), col(typeCol).as("__t"),
        unix_micros(tsCol.cast("timestamp")).as("__us"))
      // `div`, not `/`: Column./ on longs is a DOUBLE divide; the
      // integral divide is exact and equals DuckDB's `//` on positives
      .withColumn("__wk", expr(s"__us div ${weekUs}L")).drop("__us")
    val cohort = base.filter(col("__t") === cohortType)
      .groupBy("__k").agg(min(col("__wk")).as("__cw"))
    val active = base.select(col("__k"), col("__wk")).distinct()
    val cells = cohort.join(active, Seq("__k"))
      .filter(col("__wk") >= col("__cw"))
      .groupBy(col("__cw"), (col("__wk") - col("__cw")).as("week_offset"))
      .agg(countDistinct(col("__k")).as("n_active"))
    val sizes = cohort.groupBy(col("__cw"))
      .agg(count(lit(1)).as("n_cohort"))
    cells.join(sizes, Seq("__cw"))
      .select(col("__cw").as("cohort_week"), col("week_offset"),
        col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("retention"))
  }

  /** The funnel REPORT: per-step completion counts and conversion rate
    * vs step 1 — |sources|-independent output (one row per step), the
    * dashboard row a 100 TB events table reduces to. */
  def report(events: DataFrame, stepTypes: Seq[String],
      keyCol: String = "user_id", typeCol: String = "event_type",
      tsCol: Column = col("ts")): DataFrame = {
    val s = steps(events, stepTypes, keyCol, typeCol, tsCol)
    val counts = s.agg(
      count(lit(1)).as("n1"),
      (2 to stepTypes.size).map(i =>
        count(col(s"t${i}_us")).as(s"n$i")): _*)
    val rows = stepTypes.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("step"), lit(st).as("event_type"),
        col(s"n${i + 1}").as("n_users"),
        round(col(s"n${i + 1}").cast("double") / col("n1"), 6)
          .as("conversion"))
    }
    counts.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step"), col("r.event_type"), col("r.n_users"),
        col("r.conversion"))
  }

  /** Conversion-LAG statistics per adjacent funnel transition — the
    * other dashboard column: for each step i → i+1, over the keys that
    * completed step i+1, the count, sampled median/p95 and exact mean
    * of tᵢ₊₁ − tᵢ (epoch micros). Percentiles go through
    * `graft_pct_sample` (k=1024 — 24 KB per transition forever; the
    * exact form would buffer every converting user's lag, unbounded at
    * 100 TB), mean is an exact integral SUM / COUNT. Lags are integral
    * micros, so every statistic replays bit-for-bit cross-engine.
    * Returns (step, from_type, to_type, n_users, p50_lag_us,
    * p95_lag_us, mean_lag_us), one row per transition. */
  def stepLatency(events: DataFrame, stepTypes: Seq[String],
      keyCol: String = "user_id", typeCol: String = "event_type",
      tsCol: Column = col("ts"), sampleK: Int = 1024): DataFrame = {
    val s = steps(events, stepTypes, keyCol, typeCol, tsCol)
    val lags = (1 until stepTypes.size).map { i =>
      s.filter(col(s"t${i + 1}_us").isNotNull)
        .select(lit(i).as("step"),
          lit(stepTypes(i - 1)).as("from_type"),
          lit(stepTypes(i)).as("to_type"),
          col(keyCol).as("__k"),
          (col(s"t${i + 1}_us") - col(s"t${i}_us")).as("lag_us"))
    }.reduce(_ unionByName _)
    val ps = graft.functions.PctSampleAgg.pctSample(
      concat(col("__k").cast("string"), lit(":fl")),
      col("lag_us").cast("double"), Seq(0.5, 0.95), sampleK)
    lags.groupBy("step", "from_type", "to_type")
      .agg(count(lit(1)).as("n_users"),
        sum(col("lag_us")).as("__sum"),
        ps.as("__ps"))
      .select(col("step"), col("from_type"), col("to_type"),
        col("n_users"),
        // integral micros: at ~1e11 us the engines' percentile
        // interpolation differs in the last ulp — whole-microsecond
        // rounding absorbs it (sub-us lag precision is meaningless)
        round(element_at(col("__ps"), 1), 0).cast("bigint").as("p50_lag_us"),
        round(element_at(col("__ps"), 2), 0).cast("bigint").as("p95_lag_us"),
        round(col("__sum").cast("double") / col("n_users"), 6)
          .as("mean_lag_us"))
  }

  /** Top session paths: gap-sessionize each key's event stream (the
    * ev_sessionize rule — a new session when consecutive events are
    * > `gapSec` apart), take each session's FIRST `maxSteps` event
    * types in event order joined with '>', and count sessions per
    * path — the "what do users actually do" product-analytics report
    * (the empirical complement of the Markov transition matrix: full
    * observed trajectories, not first-order factorizations).
    *
    * The `maxSteps` cap is the bounded-state contract: per session the
    * aggregation holds at most `maxSteps` (order, type) entries no
    * matter how long a bot session runs (its tail still counts via
    * `n_events`, surfacing as `truncated` in the per-path rollup).
    * Scale shape: one per-key window cascade (lag → running sum →
    * row_number, all bounded by a key's history), one per-session
    * aggregation, one map-side-combinable path count, and a top-k
    * (TakeOrderedAndProject — never a global sort).
    *
    * Returns the `topN` (path, n_sessions, n_truncated) rows by
    * n_sessions DESC, path ASC (a total order — deterministic at the
    * cut). */
  def sessionPaths(events: DataFrame, keyCol: String = "user_id",
      typeCol: String = "event_type", orderCol: String = "event_id",
      tsCol: String = "ts", gapSec: Long = 1800L, maxSteps: Int = 8,
      topN: Int = 50): DataFrame = {
    require(maxSteps >= 1 && topN >= 1,
      s"maxSteps and topN must be >= 1, got $maxSteps/$topN")
    val w = Window.partitionBy(keyCol).orderBy("eid")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol), col(orderCol).as("eid"),
        col(typeCol).as("etype"), unix_timestamp(col(tsCol)).as("sec"))
      .withColumn("is_new",
        when(col("sec") - lag(col("sec"), 1).over(w) > gapSec, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(run))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(keyCol), col("session_id")).orderBy("eid")))
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        // collect_list drops the NULLs the CASE emits past maxSteps, so
        // per-session state is bounded at maxSteps structs
        array_join(expr(s"transform(array_sort(collect_list(" +
          s"CASE WHEN rn <= $maxSteps THEN struct(eid, etype) END)), " +
          "x -> x.etype)"), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") > maxSteps, 1L).otherwise(0L))
          .as("n_truncated"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
  }
}
