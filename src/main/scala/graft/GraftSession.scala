package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: UTC, AQE on, shuffle partitions matched to
  * local cores (not 200), nanos-as-long so the ns-precision events table
  * is readable (see Tables). */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE re-optimize (and in particular COALESCE tiny shuffle
      // partitions in) plans under .cache()/persist too — off by
      // default, which leaves every cached-frame materialization at the
      // raw spark.sql.shuffle.partitions width no matter how small the
      // data (guide §2.2: fewer, larger partitions). Scale-adaptive by
      // construction: partition sizing still follows AQE's advisory
      // size, not any fixed local count.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
