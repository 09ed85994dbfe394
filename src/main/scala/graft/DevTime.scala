package graft

/** Dev-only: bench-protocol timing for named registry queries (warm-up,
  * then N timed passes with full cache eviction between; min reported).
  * Usage: runMain graft.DevTime <sfDir> <name> [<name> ...] */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.build("graft-dev-time")
    def reset(): Unit = {
      spark.catalog.clearCache()
      graft.queries.TraceQueries.evictRcaTraceCache(spark)
      graft.queries.TraceQueries.evictFixtureCache(spark)
    }
    names.foreach { name =>
      val run = queries.Registry.byName(name).run
      run(spark, sfDir).queryExecution.toRdd.count(); reset() // warm-up
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run(spark, sfDir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        reset(); dt
      }
      println(f"[devtime] $name min ${times.min}%.3f s (passes: ${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
