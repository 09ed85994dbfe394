package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout for the event store at scale.
  *
  * The reference leans on DuckDB indexes over ts/event/severity
  * (tools/database.py:22-24); the Spark equivalent is layout: partition
  * the events table by event date (directory-level pruning for time-range
  * predicates) and sort within partitions by ts so Parquet row-group
  * min/max stats skip pages for narrow windows. Every time-bounded query
  * (context windows, episode analysis, rollups over a day) then touches
  * only the matching partitions.
  */
object Store {

  /** Write events partitioned by event_date, sorted by ts within each
    * file — the 100 TB layout. */
  def writeEvents(events: DataFrame, dir: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      // leading event_date satisfies the partitioned-write's required
      // ordering directly — otherwise Spark inserts its own sort on
      // event_date alone, which need not preserve the ts order
      .repartition(col("event_date"))
      .sortWithinPartitions("event_date", "ts")
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(dir)

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** True iff a time-range filter on this store prunes partitions —
    * checked from the executed plan's partition filters. */
  def prunes(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString()
    plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []")
  }
}
