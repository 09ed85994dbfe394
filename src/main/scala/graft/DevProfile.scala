package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling main for the RCA loop (not part of the surface). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("profile")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $label ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    if (sys.env.contains("GRAFT_RCA_DEBUG")) {
      graft.queries.Registry.byName("trace_rca_final").run(spark, "")
        .show(truncate = false)
      spark.stop(); return
    }
    val run = graft.queries.Registry.byName("trace_rca_loop").run
    val runFinal = graft.queries.Registry.byName("trace_rca_final").run
    // bench protocol: warm-up pass, then evict every cache so the timed
    // pass pays the query's full standalone cost (what BENCH_r{N} bills)
    def reset(): Unit = {
      spark.catalog.clearCache()
      graft.queries.TraceQueries.evictRcaTraceCache(spark)
      graft.queries.TraceQueries.evictFixtureCache(spark)
    }
    time("rca_loop cold")(run(spark, "").queryExecution.toRdd.count())
    reset()
    time("rca_loop bench-style")(run(spark, "").queryExecution.toRdd.count())
    reset()
    time("rca_final bench-style")(runFinal(spark, "").queryExecution.toRdd.count())
    time("rca_loop warm")(run(spark, "").queryExecution.toRdd.count())
    spark.catalog.clearCache()
    // granular: the subtrees the loop touches
    import graft.trace._
    val ev = time("parse+cache")(
      { val e = TraceEvents.load(spark, graft.queries.TraceQueries.XmlFixture,
          stableIds = true).cache(); e.count(); e })
    val metrics = time("metrics")(
      { val m = DerivedTables.eventMetrics(ev).cache(); m.count(); m })
    val baselines = time("baselines")(
      { val b = DerivedTables.metricBaselines(metrics, minCount = 3).cache(); b.count(); b })
    val battery = time("battery")(
      { val b = Detectors.battery(ev, baselines).cache(); b.collect(); b })
    time("battery recollect")(battery.collect())
    time("battery:storage_pressure")(
      Detectors.storagePressureAnomalies(ev, baselines).count())
    time("battery:recovery_loops")(Detectors.recoveryLoops(ev).count())
    time("battery:metric_anomalies")(Detectors.metricAnomalies(ev).count())
    time("battery:predicate_fused")(Detectors.predicateSummaries(ev, Seq(
      "ratekeeper_throttling" -> Detectors.ratekeeperThrottlingPred,
      "missing_tlogs" -> Detectors.missingTlogsPred,
      "coordination_loss" -> Detectors.coordinationLossPred)).collect())
    time("metrics rowcount")(println("metrics rows = " + metrics.count()))
    time("topEvents")(GlobalScanner.topEvents(ev, 30, 500).limit(100).collect())
    time("severityCounts")(GlobalScanner.severityCounts(ev).collect())
    time("histogram")(GlobalScanner.eventHistogram(ev, 10).collect())
    time("timeSpan")(GlobalScanner.timeSpan(ev).first())
    time("heatmap")(Investigation.highSeverityBuckets(ev, 0, 300, 100).collect())
    time("rollback")(GlobalScanner.rollbackStatus(ev).first())
    time("episodes")(GlobalScanner.recoveryEpisodes(ev).count())
    time("hotspots")(Detectors.zscoreHotspots(ev, 300, 2.0).collect())
    time("timeline")(TimelineBuilder.build(ev).first())
    time("diveCandidates")(Investigation.highSeverityBuckets(ev, 10, 10, Int.MaxValue).collect())
    time("contextWindow")(Investigation.contextWindow(ev,
      new java.sql.Timestamp(0L), 5, 200).collect())
    time("llm 1-row")({
      import spark.implicits._
      import graft.ops.LlmBoundary
      LlmBoundary.hypothesis(LlmBoundary.infer(
        Seq(LlmBoundary.LlmRequest(1L, "x")).toDS(),
        new LlmBoundary.StubClient).toDF()).first()
    })
    spark.stop()
  }
}
