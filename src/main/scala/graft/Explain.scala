package graft

/** Plan auditor: prints the formatted physical plan of registered queries
  * so scan pruning (ReadSchema), filter pushdown (PushedFilters), join
  * strategies (BroadcastHashJoin vs SortMergeJoin) and Exchange counts can
  * be reviewed. Usage: runMain graft.Explain [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.build("graft-explain")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => println(s"failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
