package graft

import graft.trace.RcaLoop

/** 100×-volume probe for the agentic RCA loop (round-9 ask 8): run the
  * SAME `RcaLoop.investigate` configuration the registered
  * `trace_rca_loop` / `trace_rca_final` queries use, but against a
  * generated multi-file trace corpus (dev/gen_scale_logs.py x100 →
  * ~10M events), and MEASURE what the loop's bounded-collect design
  * argues from limits: wall time per phase and driver peak heap. The
  * loop's driver-side state is capped by construction (context slices
  * are LIMIT-ed, evidence summaries are one-line strings, the trace is
  * ≤ maxIterations rows); this main turns that argument into recorded
  * numbers for COVERAGE.md.
  *
  * Usage: runMain graft.RcaScaleProbe [logsDir]
  */
object RcaScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/logs100")
    require(new java.io.File(dir).isDirectory, s"no trace corpus at $dir")
    val spark = GraftSession.build("graft-rca-probe")

    def heapPeakMb: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
        .map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
    }
    def resetPeaks(): Unit = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .foreach(_.resetPeakUsage())
    }
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[rca-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(driver heap peak ${heapPeakMb} MB)")
      r
    }

    resetPeaks()
    val events = timed("ingest + cache") {
      val ev = graft.trace.TraceEvents.load(spark, s"$dir/*.xml").cache()
      val n = ev.count()
      println(s"[rca-probe] $n events from $dir")
      ev
    }
    val trace = timed("RcaLoop.investigate (5 iters, 3 LLM calls)") {
      // shared=None: the loop derives metrics/baselines/battery itself —
      // the full standalone cost, nothing pre-aggregated
      RcaLoop.investigate(events, "Diagnose the FDB failure",
        new graft.ops.LlmBoundary.StubClient,
        RcaLoop.Config(maxIterations = 5, maxLlmCalls = 3))
    }
    val rows = trace.collect()
    val fin = rows.maxBy(_.getAs[Int]("iteration"))
    println(s"[rca-probe] iterations=${rows.length} " +
      s"stop=${fin.getAs[String]("stop_reason")} " +
      s"confidence=${fin.getAs[Double]("confidence")} " +
      s"hypothesis=${fin.getAs[String]("hypothesis")}")
    println(s"[rca-probe] final driver heap peak: ${heapPeakMb} MB")
    spark.stop()
  }
}
